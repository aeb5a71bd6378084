"""Scatter-free batched affine image warping (NHWC) for ADA.

The reference applies ADA's composed geometric transform with
``F.grid_sample`` (lib/gan/ada.py:455-517) — a per-pixel 2-D gather whose
backward is a scatter-add. Both are the TPU's weakest ops: measured on a
v5e at (16, 790², 3), the gather forward costs ~253 ms and its scatter
backward ~1.5 s, making ADA training 14× slower than non-ADA
(docs/PERFORMANCE.md). GPU texture units make this cheap; the MXU/VPU do
not have an analog — so a TPU-native warp must avoid per-pixel gathers
entirely.

This module re-architects the warp as a **two-pass separable resample**
built from three TPU-friendly primitives only:

1. per-row/column integer shifts via *bit-decomposed rolls* (log₂ static
   ``jnp.roll`` + elementwise ``where`` — the roll axis is orthogonal to
   the axis the shift amount varies along, so the decomposition is exact);
2. a 3-tap *one-hot matmul* along the resampled axis (rides the MXU;
   0/1 weights make the contraction exact in any dtype);
3. elementwise fractional interpolation.

None of these has a scatter in its VJP (roll↦roll, where↦where,
matmul↦transposed matmul), so ``jax.grad`` through the warp costs the same
as the forward — no custom VJP machinery needed.

Math. The pixel-space sampling map is ``src = M @ (j, i, 1)`` with
``M = [[a, b, tx], [c, d, ty]]``. Factor it into

* pass V (vertical):   ``A[y, x'] = X[δ·y + ε·x' + ζ,  x']``
* pass H (horizontal):  ``out[y, j] = A[y,  a·j + b·y + tx]``

with ``ε = c/a``, ``δ = d − εb``, ``ζ = ty − ε·tx`` — the composition hits
the *exact* source coordinates (both passes evaluate the true affine map).
Each pass is a 1-D bilinear resample ``s = α·u + intercept`` whose integer
part splits as ``floor(intercept) + floor(α·u + frac) ∈ {q, q+1}`` — the
per-row intercept becomes a bit-roll, the per-column ``q = floor(α·u)``
becomes the one-hot matmul, and the leftover ±1 plus the fractional weight
are elementwise.

Accuracy: pass V samples column ``x'`` at its own integer position instead
of the continuous x-coordinate, i.e. the interpolation cell is a
parallelogram sheared by ε instead of a square. Per-image **transpose
conditioning** (warp the transposed image when ``|c| > |a|``) bounds
``|ε| ≤ 1``; the result is exactly 2-D bilinear whenever ε = 0 (any
translation / scale / x-shear / 90° multiple) and within O(ε·∇img) of it
under rotation — indistinguishable after ADA's 2× wavelet supersampling.
Tests assert exact parity with ``grid_sample_bilinear`` for ε = 0 maps and
tight tolerance on smooth images for rotations.
"""

import jax
import jax.numpy as jnp
import numpy as np

from ganecdotes_tpu.ops.grid_sample import grid_sample_bilinear

__all__ = [
    "affine_warp",
    "affine_warp_exact",
    "affine_warp_shear",
    "norm_to_pixel_matrix",
]


def norm_to_pixel_matrix(G_inv, in_hw, out_hw):
    """Convert a normalized-coordinate 3×3 warp matrix (the ADA ``G_inv``
    consumed by ``F.affine_grid(align_corners=False)`` semantics) into the
    pixel-space 2×3 map ``(sx, sy) = M @ (j, i, 1)``.

    in_hw / out_hw: (H, W) of the source image and of the output grid.
    """
    h_in, w_in = in_hw
    h_out, w_out = out_hw
    # output pixel (j, i) -> normalized (x, y): x = (2j + 1)/W - 1
    A_out = jnp.asarray(
        [
            [2.0 / w_out, 0.0, 1.0 / w_out - 1.0],
            [0.0, 2.0 / h_out, 1.0 / h_out - 1.0],
            [0.0, 0.0, 1.0],
        ],
        dtype=jnp.float32,
    )
    # normalized (gx, gy) -> source pixel: sx = ((gx + 1)·W - 1)/2
    A_in = jnp.asarray(
        [
            [w_in / 2.0, 0.0, (w_in - 1.0) / 2.0],
            [0.0, h_in / 2.0, (h_in - 1.0) / 2.0],
            [0.0, 0.0, 1.0],
        ],
        dtype=jnp.float32,
    )
    M = A_in @ G_inv.astype(jnp.float32) @ A_out
    return M[:, :2, :]


def affine_warp_exact(x, M, out_hw=None):
    """Reference semantics: per-pixel bilinear gather (slow on TPU)."""
    b, h, w, _ = x.shape
    out_h, out_w = out_hw or (h, w)
    jj = jnp.arange(out_w, dtype=jnp.float32)
    ii = jnp.arange(out_h, dtype=jnp.float32)
    base = jnp.stack(
        [
            jnp.tile(jj[None, :], (out_h, 1)),
            jnp.tile(ii[:, None], (1, out_w)),
            jnp.ones((out_h, out_w), jnp.float32),
        ],
        axis=-1,
    )  # (Ho, Wo, 3)
    src = jnp.einsum("bij,hwj->bhwi", M.astype(jnp.float32), base)
    # pixel -> grid_sample's normalized coords: gx = (2·sx + 1)/W - 1
    gx = (2.0 * src[..., 0] + 1.0) / w - 1.0
    gy = (2.0 * src[..., 1] + 1.0) / h - 1.0
    return grid_sample_bilinear(x, jnp.stack([gx, gy], axis=-1))


def _per_line_roll(x, amounts, axis):
    """x[..., (u + amounts) mod L, ...] along ``axis`` — exact, scatter-free.

    ``amounts``: int32 in [0, L) (callers pass ``U mod L``; the composition
    with the one-hot matmul is circular, so only the residue matters), with
    a shape that broadcasts against x *without* the rolled axis (it must be
    constant along ``axis``). Decomposed into conditional static rolls of
    each bit — ⌈log₂ L⌉ select sweeps, no gather.

    ``x`` here is (B, C, ·, ·) channels-second (see ``_resample_pass``);
    ``amounts`` is (B, L_other) and is expanded to broadcast (B, 1, …).
    """
    length = x.shape[axis]
    n_bits = max(1, int(np.ceil(np.log2(length))))
    a2 = amounts.astype(jnp.int32)
    out = x
    for k in range(n_bits):
        bit = (a2 >> k) & 1
        # (B, L_other) -> (B, 1, L_other) -> unit dim at the rolled axis
        cond = jnp.expand_dims(jnp.expand_dims(bit == 1, 1), axis)
        out = jnp.where(cond, jnp.roll(out, -(1 << k), axis=axis), out)
    return out


def _resample_pass(x, alpha, intercept, axis, out_len):
    """1-D bilinear resample along ``axis`` (2=H, 3=W) of channels-second
    ``x`` with shape (B, C, H, W).

    Source position for output index u: ``s = alpha·u + intercept`` where
    ``alpha`` is (B,) and ``intercept`` varies along the *other* spatial
    axis, shape (B, L_other). Returns the resampled tensor with ``axis``
    length ``out_len``.

    Layout note: the caller (`affine_warp_shear`) moves channels out of the
    minor dimension before the passes. With NHWC inputs the roll/select
    sweeps and tap lerps ran with C=3 as the lane dimension — 3 of 128
    lanes used, measured 62 GB/s effective on a v5e ((16, 792², 3) bf16
    select sweeps at 2.89 ms each, scripts/ada_profile.py). Channels-second
    puts W on the lanes. The one-hot contractions select exactly one
    nonzero element per output, so results are bit-identical to the NHWC
    form in any dtype — only the memory layout changes.
    """
    b, c, h, w = x.shape
    src_len = x.shape[axis]
    alpha = alpha.astype(jnp.float32)
    intercept = intercept.astype(jnp.float32)

    # split: s = U + q + (r + v);  U = floor(intercept) per line,
    # q = floor(alpha·u) per output index, e = carry of fractions.
    U = jnp.floor(intercept)  # (B, L_other)
    v = intercept - U  # [0, 1)
    u_idx = jnp.arange(out_len, dtype=jnp.float32)
    au = alpha[:, None] * u_idx[None, :]  # (B, out_len)
    q = jnp.floor(au)
    r = au - q  # [0, 1)

    # integer per-line shift of the SOURCE (roll axis ⊥ intercept axis).
    # Roll by the RESIDUE U mod L — intercepts can exceed L (tx grows like
    # (1+|a|+|b|)·W/2 for strong rotations) but the roll∘one-hot composition
    # is circular; the validity mask below uses the exact unwrapped k.
    Ui = U.astype(jnp.int32)  # U is already floor()'d, exact in fp32 range
    roll_amt = jnp.mod(Ui, src_len)
    xr = _per_line_roll(x, roll_amt, axis)

    # 3-tap one-hot matmuls at q, q+1, q+2 along the rolled source axis —
    # one (B, src, out) selection matrix per tap keeps every operand's
    # minor dimension wide (no 3-long tap axis in the lanes)
    qi = q.astype(jnp.int32)  # (B, out_len); may be out of range — masked
    src_iota = jnp.arange(src_len, dtype=jnp.int32)

    def tap(t):
        # wrap to match the circular roll semantics, mask separately below
        tgt = jnp.mod(qi + t, src_len)  # (B, out_len)
        onehot = (
            src_iota[None, :, None] == tgt[:, None, :]
        ).astype(x.dtype)  # (B, src_len, out_len)
        if axis == 3:
            g = jnp.einsum("bchw,bwv->bchv", xr, onehot)
            k = Ui[:, :, None] + qi[:, None, :] + t  # (B, H, V)
        else:
            g = jnp.einsum("bchw,bhv->bcvw", xr, onehot)
            k = (Ui[:, None, :] + qi[:, :, None] + t)  # (B, V, W)
        # validity: k = U + q + t within [0, src_len-1]
        valid = ((k >= 0) & (k <= src_len - 1)).astype(x.dtype)
        return g * valid[:, None]

    g0, g1, g2 = tap(0), tap(1), tap(2)

    if axis == 3:
        e_in = r[:, None, :] + v[:, :, None]  # (B, H, V)
    else:
        e_in = r[:, :, None] + v[:, None, :]  # (B, V, W)

    e = jnp.floor(e_in)  # 0 or 1
    f = (e_in - e)[:, None].astype(x.dtype)  # (B, 1, ·, ·)
    e1 = (e == 1)[:, None]
    lo = jnp.where(e1, g1, g0)
    hi = jnp.where(e1, g2, g1)
    return (1.0 - f) * lo + f * hi


def affine_warp_shear(x, M, out_hw=None, pass_impl="xla"):
    """Two-pass separable warp (see module docstring). x: (B, H, W, C);
    M: (B, 2, 3) pixel-space map. Requires H == W (transpose conditioning
    swaps axes per image).

    ``pass_impl``: 'xla' runs each 1-D resample pass as roll-sweeps +
    one-hot einsums; 'pallas' runs the fused VMEM kernel
    (ops/affine_warp_pallas.py) — one HBM read+write per pass instead of
    ~10 roll+select sweeps, and immune to the layout coupling that makes
    the XLA sweeps ~6× slower inside fused training programs (measured,
    scripts/ada_profile.py). Forward results match to 1 ulp (same
    selection + lerp algebra; only FMA contraction differs); 'pallas'
    returns zero cotangents for the transform matrix (the image VJP —
    the only one training uses — is exact at every order)."""
    b, h, w, c = x.shape
    if h != w:
        raise ValueError("affine_warp_shear requires a square source image")
    out_h, out_w = out_hw or (h, w)
    M = M.astype(jnp.float32)

    # channels-second for the passes: W on the TPU lane dimension instead
    # of C (see the _resample_pass layout note). Bit-identical results.
    x = jnp.moveaxis(x, -1, 1)  # (B, C, H, W)

    # transpose conditioning: bound |eps| = |c/a| by warping the transposed
    # image (source-coordinate swap = row swap of M) when |c| > |a|
    a_, c_ = M[:, 0, 0], M[:, 1, 0]
    swap = jnp.abs(c_) > jnp.abs(a_)  # (B,)
    xt = jnp.transpose(x, (0, 1, 3, 2))
    x_eff = jnp.where(swap[:, None, None, None], xt, x)
    M_sw = M[:, ::-1, :]  # rows swapped
    M_eff = jnp.where(swap[:, None, None], M_sw, M)

    a = M_eff[:, 0, 0]
    b_sh = M_eff[:, 0, 1]
    tx = M_eff[:, 0, 2]
    cc = M_eff[:, 1, 0]
    d = M_eff[:, 1, 1]
    ty = M_eff[:, 1, 2]

    # guard the degenerate |a|≈0 (both |a|,|c| tiny — near-singular map);
    # clamp rather than divide by zero. |eps| ≤ 1 by conditioning.
    a_safe = jnp.where(jnp.abs(a) < 1e-4, jnp.where(a < 0, -1e-4, 1e-4), a)
    eps = cc / a_safe
    delta = d - eps * b_sh
    zeta = ty - eps * tx

    # pass V: A[y, x'] = X[delta·y + eps·x' + zeta, x']
    xp = jnp.arange(w, dtype=jnp.float32)
    intercept_v = eps[:, None] * xp[None, :] + zeta[:, None]  # (B, W)

    # pass H: out[y, j] = A[y, a·j + b·y + tx]
    yy = jnp.arange(out_h, dtype=jnp.float32)
    intercept_h = b_sh[:, None] * yy[None, :] + tx[:, None]  # (B, out_h)

    if pass_impl == "pallas":
        from ganecdotes_tpu.ops.affine_warp_pallas import resample_rows

        A = resample_rows(x_eff, delta, intercept_v, out_h)
        At = jnp.swapaxes(A, 2, 3)  # rows := W for the second pass
        out = resample_rows(At, a, intercept_h, out_w)
        out = jnp.swapaxes(out, 2, 3)
    else:
        A = _resample_pass(x_eff, delta, intercept_v, axis=2, out_len=out_h)
        out = _resample_pass(A, a, intercept_h, axis=3, out_len=out_w)
    return jnp.moveaxis(out, 1, -1)  # back to NHWC


def affine_warp(x, M, out_hw=None, impl="shear"):
    """Batched affine warp. impl='shear' (TPU-fast, scatter-free),
    'shear_pallas' (same math through the fused VMEM resample kernel —
    see ``affine_warp_shear(pass_impl=...)``), or 'exact' (per-pixel
    bilinear gather, the grid_sample oracle)."""
    if impl == "exact":
        return affine_warp_exact(x, M, out_hw)
    if impl == "shear":
        return affine_warp_shear(x, M, out_hw)
    if impl == "shear_pallas":
        return affine_warp_shear(x, M, out_hw, pass_impl="pallas")
    raise ValueError(f"unknown affine_warp impl: {impl!r}")
