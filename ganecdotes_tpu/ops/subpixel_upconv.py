"""Sub-pixel (polyphase) form of StyleGAN2's upsampling modulated conv.

The reference's up-branch (models/stylegan2/model.py:341-368 + the Blur that
follows, :293-299) — and round 3's XLA translation of it — runs

    y = conv_transpose(x*s, w, stride=2)   # (B, 2H+1, 2W+1, Cout) in HBM
    y = y * demod
    y = blur(y, k4, pad=(1,1), gain=4)     # 2 more passes over the LARGEST
                                           # tensors in the network

Both stages are linear, so they compose exactly: zero-stuff-2 then
true-convolve with w then with k4 == one transposed conv with the 6x6
composed kernel K = conv_full(flip(w), k4) (demod is per-(batch, out_ch)
and commutes with the spatial blur). On the stride-2 lattice only 9 of
K's 36 taps ever see data per output phase, so the whole thing is FOUR
3x3 convs — stacked on the output-channel axis into ONE MXU conv with
4*Cout outputs — followed by a depth-to-space interleave that XLA fuses
into the consumer. One conv, one HBM write, no 2x-resolution
intermediates; FLOPs identical to the useful work of the transposed conv,
the blur's passes gone entirely.

Exactness vs the conv_transpose+blur path is pinned in tests/test_ops.py
(and through the full generator in the impl-parity test). Adoption is
gated on the measured TPU comparison (scripts/styled_conv_bench.py
--up mode / docs/PERFORMANCE.md) via generator.UP_CONV_IMPL.
"""

import jax
import jax.numpy as jnp

from ganecdotes_tpu.ops.upfirdn2d import make_kernel


def compose_up_kernel(w, blur_kernel=(1, 3, 3, 1)):
    """(3,3,Cin,Cout) forward-HWIO w -> (6,6,Cin,Cout) composed kernel.

    K[t,u] = sum_{p+r=t, q+s=u} flip(w)[p,q] * k4[r,s] — the cross-
    correlation kernel equivalent to corr(corr(u, flip(w)), k4) on the
    zero-stuffed input u (composition of two correlations is correlation
    with their plain convolution). k4 carries the blur's gain=factor².
    """
    k4 = make_kernel(blur_kernel, gain=4.0)  # numpy (4,4) constant
    wf = jnp.flip(w, (0, 1))
    kh, kw = w.shape[0], w.shape[1]
    n = k4.shape[0]
    K = jnp.zeros((kh + n - 1, kw + n - 1) + w.shape[2:], w.dtype)
    for r in range(n):
        for s in range(n):
            K = K.at[r : r + kh, s : s + kw].add(wf * float(k4[r, s]))
    return K


def phase_stack(K):
    """(6,6,Cin,Cout) composed kernel -> (3,3,Cin,4*Cout) phase kernels.

    Output pixel (2y+a, 2x+c) of the composite reads input taps
    m = y+dm, n = x+dn with kernel row t = 2*dm + 3 - a (so rows
    K[(1-a)::2]) and likewise for columns; channel block ph = a*2+c.
    """
    blocks = []
    for a in (0, 1):
        for c in (0, 1):
            blocks.append(K[(1 - a) :: 2, (1 - c) :: 2])
    return jnp.concatenate(blocks, axis=-1)


def phase_stack_major(K):
    """(6,6,Cin,Cout) composed kernel -> (4,3,3,Cin,Cout): the same phase
    kernels as ``phase_stack`` but stacked on a leading phase axis
    (ph = a*2+c) — the layout the Pallas up-kernel holds in VMEM."""
    blocks = []
    for a in (0, 1):
        for c in (0, 1):
            blocks.append(K[(1 - a) :: 2, (1 - c) :: 2])
    return jnp.stack(blocks, axis=0)


def upsampled_conv2x_blur(x, w, blur_kernel=(1, 3, 3, 1)):
    """conv_transpose(x, w, stride=2) then blur(k, pad=(1,1), gain=4),
    as ONE 'same' 3x3 conv with 4*Cout outputs + depth-to-space.

    x (B,H,W,Cin) NHWC; returns (B,2H,2W,Cout).
    """
    b, h, wd, _ = x.shape
    co = w.shape[3]
    ks = phase_stack(compose_up_kernel(w, blur_kernel))
    y = jax.lax.conv_general_dilated(
        x, ks.astype(x.dtype), (1, 1), ((1, 1), (1, 1)),
        dimension_numbers=("NHWC", "HWIO", "NHWC"),
        preferred_element_type=x.dtype,
    )  # (B, H, W, 4*Cout), channel = (a*2+c)*Cout + o
    y = y.reshape(b, h, wd, 2, 2, co)
    y = jnp.transpose(y, (0, 1, 3, 2, 4, 5))  # (B, H, a, W, c, Cout)
    return y.reshape(b, 2 * h, 2 * wd, co)
