"""Differentiable bilinear grid sampling (NHWC).

The reference wraps ``aten::grid_sampler_2d_backward`` in a custom
autograd.Function to get double-backward for ADA's differentiable affine
augmentation (lib/gan/ada.py:415-453). In JAX a plain gather + lerp is
arbitrarily differentiable, so no gradfix machinery is needed — this is the
whole component.

Semantics match ``F.grid_sample(align_corners=False, padding_mode='zeros',
mode='bilinear')``: grid coords in [-1, 1], (x, y) order in the last axis.
"""

import jax.numpy as jnp


def grid_sample_bilinear(x, grid):
    """x: (B, H, W, C); grid: (B, Ho, Wo, 2) with (gx, gy) in [-1, 1]."""
    b, h, w, c = x.shape
    gx = grid[..., 0]
    gy = grid[..., 1]

    # unnormalize, align_corners=False: ix = ((gx + 1) * W - 1) / 2
    ix = ((gx + 1.0) * w - 1.0) / 2.0
    iy = ((gy + 1.0) * h - 1.0) / 2.0

    ix0 = jnp.floor(ix)
    iy0 = jnp.floor(iy)
    ix1 = ix0 + 1
    iy1 = iy0 + 1

    wx1 = ix - ix0
    wy1 = iy - iy0
    wx0 = 1.0 - wx1
    wy0 = 1.0 - wy1

    def gather(iy_, ix_):
        valid = (ix_ >= 0) & (ix_ <= w - 1) & (iy_ >= 0) & (iy_ <= h - 1)
        ixc = jnp.clip(ix_, 0, w - 1).astype(jnp.int32)
        iyc = jnp.clip(iy_, 0, h - 1).astype(jnp.int32)
        batch = jnp.arange(b).reshape((b,) + (1,) * (ixc.ndim - 1))
        vals = x[batch, iyc, ixc]  # (B, Ho, Wo, C)
        return vals * valid[..., None].astype(x.dtype)

    out = (
        gather(iy0, ix0) * (wy0 * wx0)[..., None]
        + gather(iy0, ix1) * (wy0 * wx1)[..., None]
        + gather(iy1, ix0) * (wy1 * wx0)[..., None]
        + gather(iy1, ix1) * (wy1 * wx1)[..., None]
    )
    return out
