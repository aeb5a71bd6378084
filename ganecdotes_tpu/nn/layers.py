"""Functional NN primitives with StyleGAN2's equalized-lr semantics.

These are the TPU-native counterparts of the reference's EqualLinear /
EqualConv2d / PixelNorm modules (models/stylegan2/model.py:105-269): params
are plain pytrees (dicts of jnp arrays), weights are stored raw and scaled at
use time by the equalized-lr constant, exactly as the reference does, so a
converted torch checkpoint reproduces the same function.

Layout conventions (TPU-native):
  * activations NHWC
  * conv weights HWIO  (torch OIHW -> transpose at checkpoint boundary)
  * linear weights (in, out)  (torch (out, in) -> transpose at boundary)
"""

import math

import jax
import jax.numpy as jnp

from ganecdotes_tpu.ops.fused_act import fused_leaky_relu


def leaky_relu(x, negative_slope=0.2):
    return jnp.where(x >= 0, x, x * negative_slope)


def pixel_norm(x, axis=-1, eps=1e-8):
    """input * rsqrt(mean(input², channel) + 1e-8) (ref model.py:105-110)."""
    return x * jax.lax.rsqrt(jnp.mean(jnp.square(x), axis=axis, keepdims=True) + eps)


# ---------------------------------------------------------------------------
# EqualLinear
# ---------------------------------------------------------------------------


def equal_linear_init(key, in_dim, out_dim, bias=True, bias_init=0.0, lr_mul=1.0):
    """weight ~ N(0,1)/lr_mul, runtime scale (1/sqrt(in))*lr_mul (ref :223-239)."""
    params = {"weight": jax.random.normal(key, (in_dim, out_dim)) / lr_mul}
    if bias:
        # explicit dtype: jnp.full from a python float is WEAK-typed, and
        # a weak param leaf silently retraces+recompiles every jitted
        # program the first time an (optimizer-updated, strong-typed)
        # tree is passed back in — one full duplicate compile of every
        # train/infer program per process, measured at minutes on TPU
        params["bias"] = jnp.full((out_dim,), float(bias_init), jnp.float32)
    return params


def equal_linear_apply(params, x, lr_mul=1.0, activation=None):
    in_dim = params["weight"].shape[0]
    scale = (1.0 / math.sqrt(in_dim)) * lr_mul
    w = params["weight"].astype(x.dtype) * scale
    out = x @ w
    bias = params.get("bias")
    if activation == "fused_lrelu":
        return fused_leaky_relu(out, None if bias is None else bias * lr_mul)
    if bias is not None:
        out = out + (bias * lr_mul).astype(out.dtype)
    return out


# ---------------------------------------------------------------------------
# plain NHWC convs
# ---------------------------------------------------------------------------

_DIMS = ("NHWC", "HWIO", "NHWC")


def conv2d_nhwc(x, w, stride=1, padding=0):
    """Cross-correlation conv (torch F.conv2d semantics), NHWC/HWIO."""
    if isinstance(padding, int):
        padding = ((padding, padding), (padding, padding))
    return jax.lax.conv_general_dilated(
        x,
        w.astype(x.dtype),
        window_strides=(stride, stride),
        padding=padding,
        dimension_numbers=_DIMS,
        preferred_element_type=x.dtype,
    )


def conv2d_dilated_nhwc(x, w, dilation=1, padding=0):
    """Atrous conv for the one-shot FCN heads (torch Conv2d(dilation=d))."""
    if isinstance(padding, int):
        padding = ((padding, padding), (padding, padding))
    return jax.lax.conv_general_dilated(
        x,
        w.astype(x.dtype),
        window_strides=(1, 1),
        padding=padding,
        rhs_dilation=(dilation, dilation),
        dimension_numbers=_DIMS,
        preferred_element_type=x.dtype,
    )


def conv2d_transpose_nhwc(x, w, stride=2):
    """torch F.conv_transpose2d(stride, padding=0) semantics, NHWC.

    ``w`` is in *forward-conv* HWIO layout (kh, kw, in, out) — the same tensor
    a stride-1 conv would use; the spatial flip that torch's transposed conv
    implies is applied here (cf. ModulatedConv2d's weight transpose in the
    reference, model.py:341-349).
    """
    kh, kw = w.shape[0], w.shape[1]
    w_flip = jnp.flip(w, (0, 1)).astype(x.dtype)
    return jax.lax.conv_general_dilated(
        x,
        w_flip,
        window_strides=(1, 1),
        padding=((kh - 1, kh - 1), (kw - 1, kw - 1)),
        lhs_dilation=(stride, stride),
        dimension_numbers=_DIMS,
        preferred_element_type=x.dtype,
    )


# ---------------------------------------------------------------------------
# EqualConv2d
# ---------------------------------------------------------------------------


def equal_conv2d_init(key, in_ch, out_ch, kernel_size, bias=True):
    """weight ~ N(0,1), runtime scale 1/sqrt(in*k²) (ref model.py:185-203)."""
    params = {
        "weight": jax.random.normal(key, (kernel_size, kernel_size, in_ch, out_ch))
    }
    if bias:
        params["bias"] = jnp.zeros((out_ch,))
    return params


def equal_conv2d_apply(params, x, stride=1, padding=0):
    kh, kw, in_ch, _ = params["weight"].shape
    scale = 1.0 / math.sqrt(in_ch * kh * kw)
    out = conv2d_nhwc(x, params["weight"] * scale, stride=stride, padding=padding)
    if "bias" in params:
        out = out + params["bias"].astype(out.dtype)
    return out
