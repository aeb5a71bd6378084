"""upfirdn2d — fused upsample → FIR filter → downsample, TPU-native.

This is StyleGAN2's resampling primitive. The reference implements it as a
templated CUDA kernel + pybind11 binding + autograd.Function pair
(lib/gan/optim/upfirdn2d_kernel.cu:53-379, upfirdn2d.cpp:19-38,
upfirdn2d.py:17-206) with a pure-PyTorch fallback
(models/stylegan2/model.py:61-102). Semantics reproduced here:

    1. zero-insertion upsample by ``up``   (each sample followed by up-1 zeros)
    2. zero padding by (pad0, pad1) per spatial dim (negative pad = crop)
    3. 2-D convolution with ``kernel``     (true convolution, i.e. the
       cross-correlation uses the flipped kernel)
    4. subsample by ``down`` starting at index 0

    out_h = (in_h*up + pad0 + pad1 - kh)//down + 1   (same for w)

TPU-first design — three interchangeable implementations:

* ``upfirdn2d_ref``      depthwise ``lax.conv_general_dilated``
                         (lhs_dilation = up, strides = down) — golden
                         reference AND the wide-channel production path.
* ``_upfirdn2d_matmul``  because every kernel used by StyleGAN2 is separable
                         (outer(k, k) from ``make_kernel``), the op factors
                         into two banded resampling matrices
                         out = R_h · x · R_wᵀ — two dense MXU matmuls. Wins
                         for few-channel tensors (to_rgb skips, ADA on RGB).
* Pallas fused kernel    (``ganecdotes_tpu.ops.upfirdn2d_pallas``,
                         ``impl='pallas'``) fuses both separable passes in
                         VMEM with double-buffered HBM DMA for the blur
                         (up=down=1) case — the analog of the reference CUDA
                         kernel's tiled shared-memory specializations.

'auto' policy — measured on v5e, batch 32, fori_loop-chained device timing
(host-side block_until_ready timing through the TPU relay under-reports
small ops by >10× and picked the wrong winner in round 1):

    shape, mode                 fp32  ms (matmul / conv / pallas)   bf16
    66²×512  blur k4            2.18 / 2.07 / 3.37         1.30 / 1.20 / 2.52
    130²×256 blur k4            5.24 / 3.78 / 5.94         2.10 / 2.09 / 3.49
    258²×128 blur k4           13.91 / 7.85 / 10.95        3.79 / 4.09 / 6.24
    64²×512  up2 k4             6.37 / 0.98 / —            2.96 / 0.94 / —
    128²×256 down2 k4           3.88 / 1.46 / —            2.20 / 0.94 / —
    128²×3   up2 k4 (to_rgb)    0.53 / 0.77 / —            0.45 / 0.75 / —
    256²×3   down2 k4 (ADA)     0.52 / 0.69 / —            0.52 / 0.57 / —

The depthwise conv dominates for wide channels (XLA maps it onto efficient
windowed reductions and never materializes the dense banded operands); the
matmul wins only for few-channel tensors whose depthwise conv would idle the
vector lanes. The up2/down2 Pallas specializations of the CUDA kernel
(upfirdn2d_kernel.cu:260-300) were evaluated and rejected: every wide-channel
up/down call site in this framework is beaten by the conv path, and the
remaining up/down sites are C=3 (to_rgb skip, ADA), below any VMEM-tiling
granularity the kernel could exploit. The blur Pallas kernel stays an
explicit opt-in.

All functions are NHWC (TPU-native layout). The reference is NCHW; the
conversion happens only at checkpoint/IO boundaries.
"""

import functools

import jax
import jax.numpy as jnp
import numpy as np


def make_kernel(k, gain=1.0):
    """Normalized FIR kernel from 1-D taps (ref models/stylegan2/model.py:113-121).

    1-D input k -> outer(k, k); normalized to sum 1, then scaled by ``gain``
    (the reference multiplies by factor**2 for upsampling).
    """
    k = np.asarray(k, dtype=np.float32)
    if k.ndim == 1:
        k = np.outer(k, k)
    k = k / k.sum()
    # stays a numpy constant: converting to a device array inside a jit trace
    # would lift it to a tracer and defeat the host-side separability analysis
    return k * gain


def _normalize_args(up, down, pad):
    if not isinstance(up, (tuple, list)):
        up = (up, up)
    if not isinstance(down, (tuple, list)):
        down = (down, down)
    if len(pad) == 2:
        pad = (pad[0], pad[1], pad[0], pad[1])
    # pad order follows the reference: (x0, x1, y0, y1)
    return tuple(up), tuple(down), tuple(pad)


def out_size(n, up, pad0, pad1, k, down):
    return (n * up + pad0 + pad1 - k) // down + 1


# ---------------------------------------------------------------------------
# golden reference: depthwise dilated conv
# ---------------------------------------------------------------------------


def upfirdn2d_ref(x, kernel, up=1, down=1, pad=(0, 0)):
    """Pure-jnp reference implementation (NHWC). Differentiable natively."""
    (up_x, up_y), (down_x, down_y), (pad_x0, pad_x1, pad_y0, pad_y1) = (
        _normalize_args(up, down, pad)
    )
    b, h, w, c = x.shape
    kh, kw = kernel.shape

    # lax lhs_dilation inserts zeros *between* samples; torch's zero-insertion
    # also appends (up-1) trailing zeros, which fold into the high padding.
    pad_h = (pad_y0, pad_y1 + up_y - 1)
    pad_w = (pad_x0, pad_x1 + up_x - 1)

    # true convolution == cross-correlation with the flipped kernel
    k = jnp.flip(kernel, (0, 1)).astype(x.dtype)
    k = jnp.tile(k[:, :, None, None], (1, 1, 1, c))  # HWIO, depthwise

    y = jax.lax.conv_general_dilated(
        x,
        k,
        window_strides=(down_y, down_x),
        padding=(pad_h, pad_w),
        lhs_dilation=(up_y, up_x),
        dimension_numbers=("NHWC", "HWIO", "NHWC"),
        feature_group_count=c,
        precision=jax.lax.Precision.HIGHEST,
    )
    return y


# ---------------------------------------------------------------------------
# production path: separable banded-matrix resampling on the MXU
# ---------------------------------------------------------------------------


@functools.lru_cache(maxsize=None)
def _resample_matrix(n_in, taps, up, down, pad0, pad1):
    """Banded matrix R with R[o, i] = k[kh-1 - (i*up + pad0 - o*down)].

    Row o of the upfirdn output is a linear combination of input samples;
    this materializes those weights so the 1-D pass becomes a dense matmul.
    ``taps`` is a tuple of 1-D kernel taps (already including any gain).
    """
    k = np.asarray(taps, dtype=np.float32)
    kh = k.shape[0]
    n_out = out_size(n_in, up, pad0, pad1, kh, down)
    R = np.zeros((n_out, n_in), dtype=np.float32)
    o = np.arange(n_out)[:, None]
    i = np.arange(n_in)[None, :]
    p = i * up + pad0 - o * down
    valid = (p >= 0) & (p < kh)
    R[valid] = k[kh - 1 - p[valid]]
    return R


def _separable_taps(kernel):
    """Recover 1-D taps (ky, kx) if ``kernel`` is an outer product, else None.

    Kernels from ``make_kernel`` are rank-1 by construction; detected
    numerically so arbitrary kernels still work via the reference path.
    """
    k = np.asarray(kernel, dtype=np.float64)
    if k.ndim != 2:
        return None
    u, s, vt = np.linalg.svd(k)
    if s.shape[0] > 1 and s[1] > 1e-6 * max(s[0], 1e-30):
        return None
    ky = u[:, 0] * np.sqrt(s[0])
    kx = vt[0] * np.sqrt(s[0])
    # fix sign so taps are predominantly positive (blur kernels are)
    if ky.sum() < 0:
        ky, kx = -ky, -kx
    return tuple(ky.tolist()), tuple(kx.tolist())


def _upfirdn2d_matmul(x, taps_y, taps_x, up, down, pad):
    (up_x, up_y), (down_x, down_y), (pad_x0, pad_x1, pad_y0, pad_y1) = (
        _normalize_args(up, down, pad)
    )
    b, h, w, c = x.shape
    Rh = jnp.asarray(_resample_matrix(h, taps_y, up_y, down_y, pad_y0, pad_y1))
    Rw = jnp.asarray(_resample_matrix(w, taps_x, up_x, down_x, pad_x0, pad_x1))
    dt = x.dtype
    # fp32 inputs get exact (HIGHEST) MXU passes so converted torch
    # checkpoints reproduce the same function (default precision drifts
    # ~1e-2 per op and compounds across ~15 resampling ops per forward);
    # bf16 inputs are already an explicit low-precision opt-in
    prec = (
        jax.lax.Precision.HIGHEST if dt == jnp.float32
        else jax.lax.Precision.DEFAULT
    )
    # rows pass: (O,H)·(B,H,W,C) -> (B,O,W,C); cols pass: (P,W)·... -> (B,O,P,C)
    t = jnp.einsum("oh,bhwc->bowc", Rh.astype(dt), x,
                   preferred_element_type=dt, precision=prec)
    y = jnp.einsum("pw,bowc->bopc", Rw.astype(dt), t,
                   preferred_element_type=dt, precision=prec)
    return y


# 'auto' dispatch cutoff: measured on v5e (fori_loop-chained device timing,
# batch 32 — see module docstring table), the depthwise dilated conv beats
# the banded matmul for wide channel counts (up2 C=512: 0.98 vs 6.37 ms
# fp32; down2 C=256: 1.46 vs 3.88; blur 258² C=128: 7.8 vs 13.9) while the
# matmul wins for few channels (to_rgb/ADA C=3: 0.45-0.53 vs 0.57-0.77).
_CONV_CHANNEL_CUTOFF = 64


def upfirdn2d(x, kernel, up=1, down=1, pad=(0, 0), impl="auto"):
    """Fused upsample→FIR→downsample (NHWC).

    ``impl``: 'auto' | 'conv' | 'matmul' | 'pallas' | 'ref'. 'auto' picks the
    depthwise dilated conv for wide tensors and the MXU banded-matmul
    factorization for few-channel ones (measured policy, see
    ``_CONV_CHANNEL_CUTOFF``); 'pallas' opts in to the fused VMEM kernel
    (blur case only, see upfirdn2d_pallas).
    """
    if impl in ("ref", "conv") or (
        impl == "auto" and x.shape[-1] >= _CONV_CHANNEL_CUTOFF
    ):
        return upfirdn2d_ref(x, kernel, up=up, down=down, pad=pad)
    try:
        kernel_np = np.asarray(kernel)
    except Exception:
        # traced (non-constant) kernel: separability can't be decided on host
        if impl in ("matmul", "pallas"):
            raise ValueError(f"upfirdn2d impl={impl!r} requires a constant kernel")
        return upfirdn2d_ref(x, kernel, up=up, down=down, pad=pad)
    taps = _separable_taps(kernel_np)
    if taps is None:
        if impl in ("matmul", "pallas"):
            raise ValueError(f"upfirdn2d impl={impl!r} requires a separable kernel")
        return upfirdn2d_ref(x, kernel, up=up, down=down, pad=pad)
    taps_y, taps_x = taps
    if impl == "pallas":
        from ganecdotes_tpu.ops import upfirdn2d_pallas as ufp

        up_n, down_n, pad_n = _normalize_args(up, down, pad)
        if ufp.fits(x.shape, taps_y, taps_x, up_n, down_n, pad_n):
            return ufp.upfirdn2d_pallas(x, taps_y, taps_x, up_n, down_n, pad_n)
        # shapes/modes outside the kernel's specializations use the matmul
        # path, like the reference's generic `_large` fallback
    return _upfirdn2d_matmul(x, taps_y, taps_x, up, down, pad)


# ---------------------------------------------------------------------------
# StyleGAN2 convenience wrappers (padding algebra from the reference modules)
# ---------------------------------------------------------------------------


def upsample_2d(x, kernel_taps=(1, 3, 3, 1), factor=2, impl="auto"):
    """Upsample module semantics (ref models/stylegan2/model.py:124-142)."""
    k = make_kernel(kernel_taps, gain=factor**2)
    p = k.shape[0] - factor
    pad0 = (p + 1) // 2 + factor - 1
    pad1 = p // 2
    return upfirdn2d(x, k, up=factor, down=1, pad=(pad0, pad1), impl=impl)


def downsample_2d(x, kernel_taps=(1, 3, 3, 1), factor=2, impl="auto"):
    """Downsample module semantics (ref models/stylegan2/model.py:145-163)."""
    k = make_kernel(kernel_taps)
    p = k.shape[0] - factor
    pad0 = (p + 1) // 2
    pad1 = p // 2
    return upfirdn2d(x, k, up=1, down=factor, pad=(pad0, pad1), impl=impl)


def blur_2d(x, kernel_taps=(1, 3, 3, 1), pad=(0, 0), upsample_factor=1, impl="auto"):
    """Blur module semantics (ref models/stylegan2/model.py:166-182)."""
    gain = upsample_factor**2 if upsample_factor > 1 else 1.0
    k = make_kernel(kernel_taps, gain=gain)
    return upfirdn2d(x, k, up=1, down=1, pad=pad, impl=impl)
