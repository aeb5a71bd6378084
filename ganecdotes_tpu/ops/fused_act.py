"""Fused bias + leaky-ReLU + scale.

The reference implements this as a CUDA elementwise kernel with an
act*10+grad dispatch switch and a double-backward autograd.Function
(lib/gan/optim/fused_bias_act_kernel.cu:18-152, fused_act.py:27-254), plus a
pure-PyTorch inline fallback (models/stylegan2/model.py:32-43).

On TPU the elementwise epilogue fuses into the producing matmul/conv by XLA,
so the default path is plain jnp (that *is* the fused kernel once compiled).
A Pallas kernel with a custom VJP is provided for the standalone case and to
mirror the reference's native-op ledger; both paths are parity-tested.
"""

import functools
import math

import jax
import jax.numpy as jnp


def fused_leaky_relu(x, bias=None, negative_slope=0.2, scale=math.sqrt(2.0)):
    """y = leaky_relu(x + bias) * scale, bias broadcast over the channel dim.

    NHWC: bias has shape (C,) and broadcasts over the trailing axis (the
    reference broadcasts over dim 1 of NCHW; same channels, different layout).
    """
    if bias is not None:
        x = x + bias.astype(x.dtype)
    return jnp.where(x >= 0, x, x * negative_slope) * scale


def _fused_act_pallas_impl(x, bias, negative_slope, scale):
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    def kernel(x_ref, b_ref, o_ref):
        v = x_ref[:] + b_ref[:]
        o_ref[:] = jnp.where(v >= 0, v, v * negative_slope) * scale

    orig_shape = x.shape
    c = orig_shape[-1]
    x2 = x.reshape(-1, c)
    b2 = jnp.broadcast_to(bias.astype(x.dtype), (1, c))

    # tile rows so real activation sizes (e.g. 8×256²×128 ≈ 256 MB) never
    # exceed VMEM; rows are padded up to the tile multiple and cropped after
    rows = x2.shape[0]
    tile = min(rows, max(8, (2 * 1024 * 1024) // max(c * x.dtype.itemsize, 1)))
    pad = -rows % tile
    if pad:
        x2 = jnp.pad(x2, ((0, pad), (0, 0)))

    y = pl.pallas_call(
        kernel,
        out_shape=jax.ShapeDtypeStruct(x2.shape, x.dtype),
        grid=(x2.shape[0] // tile,),
        in_specs=[
            pl.BlockSpec((tile, c), lambda i: (i, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, c), lambda i: (0, 0), memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((tile, c), lambda i: (i, 0),
                               memory_space=pltpu.VMEM),
        # interpreter mode keeps the kernel testable on CPU meshes
        interpret=jax.default_backend() != "tpu",
    )(x2, b2)
    if pad:
        y = y[:rows]
    return y.reshape(orig_shape)


@functools.partial(jax.custom_vjp, nondiff_argnums=(2, 3))
def fused_leaky_relu_pallas(x, bias, negative_slope=0.2, scale=math.sqrt(2.0)):
    """Pallas elementwise kernel variant (standalone, not relying on XLA fusion).

    Custom VJP mirrors the reference's refer-tensor backward: grad flows with
    slope 1 where the forward output was positive, ``negative_slope``
    elsewhere (fused_bias_act_kernel.cu:60-81 act/grad switch).
    """
    return _fused_act_pallas_impl(x, bias, negative_slope, scale)


def _flr_fwd(x, bias, negative_slope, scale):
    y = _fused_act_pallas_impl(x, bias, negative_slope, scale)
    return y, (y >= 0,)


def _flr_bwd(negative_slope, scale, res, g):
    (pos,) = res
    dx = jnp.where(pos, g, g * negative_slope) * scale
    db = dx.sum(axis=tuple(range(dx.ndim - 1)))
    return dx, db


fused_leaky_relu_pallas.defvjp(_flr_fwd, _flr_bwd)
