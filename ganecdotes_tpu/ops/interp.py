"""Image resizing with torch-compatible semantics (NHWC).

The reference leans on ``F.interpolate(mode='nearest'|'bilinear')`` and
``torchvision.transforms.Resize`` for feature upsampling and label/logit
resizing (e.g. swav_clustering.py:108-130, one_shot_pipeline.py:560-562).
Implemented here as static gather / linear maps so they trace to cheap XLA
gathers/matmuls with fully static shapes.
"""

import functools

import jax
import jax.numpy as jnp
import numpy as np


@functools.lru_cache(maxsize=None)
def _nearest_indices(n_in, n_out):
    # torch F.interpolate nearest: src = floor(dst * n_in / n_out)
    idx = np.floor(np.arange(n_out) * (n_in / n_out)).astype(np.int32)
    return np.minimum(idx, n_in - 1)


def resize_nearest(x, size):
    """NHWC nearest resize matching F.interpolate(mode='nearest').

    Integer upscale factors take a broadcast path (torch nearest with
    out = s·in reduces to pixel repetition: src = floor(dst/s)); broadcasts
    fuse into consumers on TPU where gathers materialize.
    """
    h, w = (size, size) if isinstance(size, int) else size
    b, ih, iw, c = x.shape
    if (ih, iw) == (h, w):
        return x
    if h % ih == 0 and w % iw == 0:
        sh, sw = h // ih, w // iw
        if c >= 64 and jnp.issubdtype(x.dtype, jnp.floating):
            # wide channels: depthwise lhs-dilated conv with an all-ones
            # s×s kernel (upfirdn2d's measured dispatch policy — conv
            # beats data-formatting lowerings for C≥64; the broadcast
            # form below materializes a T(2,128) sublane-padded tensor
            # when its consumer is a conv, profiled ~26 ms vs ~4 ms for
            # a (128,64,64,512)→128² transition). Exact: zero-insertion
            # by s with pad (s-1, s-1) and an s×s ones window selects
            # precisely x[i] for outputs s·i+t, t∈[0,s) — each window
            # covers exactly one populated dilated sample.
            k = jnp.ones((sh, sw, 1, c), dtype=x.dtype)
            return jax.lax.conv_general_dilated(
                x, k, window_strides=(1, 1),
                padding=((sh - 1, sh - 1), (sw - 1, sw - 1)),
                lhs_dilation=(sh, sw),
                dimension_numbers=("NHWC", "HWIO", "NHWC"),
                feature_group_count=c,
            )
        out = jnp.broadcast_to(
            x[:, :, None, :, None, :], (b, ih, sh, iw, sw, c)
        )
        return out.reshape(b, h, w, c)
    ri = jnp.asarray(_nearest_indices(ih, h))
    ci = jnp.asarray(_nearest_indices(iw, w))
    return x[:, ri][:, :, ci]


@functools.lru_cache(maxsize=None)
def _bilinear_matrix(n_in, n_out, align_corners=False):
    """Row-resampling matrix for bilinear interpolation (torch semantics)."""
    R = np.zeros((n_out, n_in), dtype=np.float32)
    for o in range(n_out):
        if align_corners and n_out > 1:
            src = o * (n_in - 1) / (n_out - 1)
        else:
            src = (o + 0.5) * n_in / n_out - 0.5
        src = min(max(src, 0.0), n_in - 1)
        lo = int(np.floor(src))
        hi = min(lo + 1, n_in - 1)
        frac = src - lo
        R[o, lo] += 1.0 - frac
        R[o, hi] += frac
    return R


def resize_bilinear(x, size, align_corners=False):
    """NHWC bilinear resize matching F.interpolate(mode='bilinear').

    Factored into two banded matmuls (MXU-friendly), like upfirdn2d.
    """
    h, w = (size, size) if isinstance(size, int) else size
    b, ih, iw, c = x.shape
    if (ih, iw) == (h, w):
        return x
    Rh = jnp.asarray(_bilinear_matrix(ih, h, align_corners)).astype(x.dtype)
    Rw = jnp.asarray(_bilinear_matrix(iw, w, align_corners)).astype(x.dtype)
    # exact passes for fp32 (torch-parity); bf16 callers opted into speed
    prec = (
        jax.lax.Precision.HIGHEST if x.dtype == jnp.float32
        else jax.lax.Precision.DEFAULT
    )
    t = jnp.einsum("oh,bhwc->bowc", Rh, x, precision=prec)
    return jnp.einsum("pw,bowc->bopc", Rw, t, precision=prec)
