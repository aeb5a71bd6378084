"""Latent-perturbation augmentor — THE augmentation mechanism for self-supervision.

Re-design of lib/oneshot/image_augmentor.py:8-106: augmented views of a
StyleGAN image are made by lerping the per-layer w⁺ rows toward a fresh
``style(randn)`` sample — ``(1-σ)·w + σ·w_rand`` — and re-synthesizing.

TPU-first form: instead of a python list of per-row tensors with in-place row
replacement, the whole perturbation is one vectorized lerp driven by a
per-row σ vector, so a *traced* random layer choice works inside jit (the
SwAV/SimCLR train steps randomize the perturbed block every iteration,
swav_clustering.py:610-612).
"""

import jax
import jax.numpy as jnp

from ganecdotes_tpu.models.stylegan2.generator import (
    generator_forward,
    mapping_apply,
)


def perturb_latents(gen_params, w_plus, key, row_std):
    """Lerp each w⁺ row toward a fresh style(randn) with per-row strength.

    w_plus: (B, n_latent, D);  row_std: (n_latent,) — entries 0 leave the row
    untouched (covers the reference's perturb_std bookkeeping, where only the
    two rows of the chosen block get a nonzero σ, image_augmentor.py:40-55).
    """
    b, n_latent, d = w_plus.shape
    z = jax.random.normal(key, (b * n_latent, d))
    w_rand = mapping_apply(gen_params, z).reshape(b, n_latent, d)
    sigma = row_std.reshape(1, n_latent, 1).astype(w_plus.dtype)
    return (1.0 - sigma) * w_plus + sigma * w_rand


def block_row_std(layer_no, n_layers, perturb_std, n_latent):
    """σ vector perturbing rows (2l, 2l+1) of block ``layer_no``.

    ``layer_no`` may be a traced scalar (random per step). Rows beyond
    2*n_layers always stay untouched.
    """
    perturb_std = jnp.asarray(perturb_std, dtype=jnp.float32)
    rows = jnp.arange(n_latent)
    sel = (rows // 2 == layer_no) & (rows < 2 * n_layers)
    std_val = perturb_std[jnp.clip(layer_no, 0, len(perturb_std) - 1)]
    return jnp.where(sel, std_val, 0.0)


def group_features_by_block(features, skip_const=False, concat=True):
    """Group raw per-conv features into per-block pairs (NHWC, channel concat).

    [f0, cat(f1,f2), cat(f3,f4), ...]; skip_const drops f0
    (image_augmentor.py:80-90).

    concat=False returns each group as a TUPLE of its parts instead of a
    concatenated array — for consumers that distribute over the channel
    split (kmeans.kmeans_predict_parts / hfc_segment_fcn), so the per-level
    concat copies never reach HBM.
    """
    n_blocks = len(features) // 2
    if concat:
        pairs = [
            jnp.concatenate([features[2 * n + 1], features[2 * n + 2]], axis=-1)
            for n in range(n_blocks)
        ]
    else:
        pairs = [
            (features[2 * n + 1], features[2 * n + 2]) for n in range(n_blocks)
        ]
    return pairs if skip_const else [features[0]] + pairs


def perturbed_features(
    gen_params,
    gen_meta,
    w_plus,
    key,
    layer_no,
    n_layers,
    perturb_std,
    truncation,
    mean_latent_w,
    dtype=None,
):
    """One augmented view: perturb block ``layer_no``, re-synthesize.

    Returns (image, features) with fixed (stored) noise, matching
    create_images_and_features_from_perturbed_latents
    (image_augmentor.py:59-104; truncation applied inside forward).
    """
    row_std = block_row_std(layer_no, n_layers, perturb_std, gen_meta["n_latent"])
    w_new = perturb_latents(gen_params, w_plus, key, row_std)
    img, feats = generator_forward(
        gen_params,
        gen_meta,
        [w_new],
        input_is_latent=True,
        truncation=truncation,
        truncation_latent=mean_latent_w,
        randomize_noise=False,
        dtype=dtype,
    )
    return img, feats


# ---------------------------------------------------------------------------
# feature-space affine augmentation (RandomRotation(10) + RandomHorizontalFlip)
# ---------------------------------------------------------------------------


def rotate_flip_nhwc(x, angle_rad, flip):
    """Nearest-neighbour rotation about the image center + optional h-flip.

    The reference applies torchvision RandomRotation(10)/HorizontalFlip to the
    full-resolution 4864-channel concat tensor (swav_clustering.py:98-102,
    358-359). Here the same (angle, flip) is applied to each pyramid level at
    its native resolution — nearest resampling commutes with the nearest
    upsample used for concatenation, so the effect is equivalent without ever
    materializing the concat tensor. ``angle_rad``/``flip`` may be traced.
    """
    b, h, w, c = x.shape
    cy, cx = (h - 1) / 2.0, (w - 1) / 2.0
    yy = jnp.arange(h, dtype=jnp.float32)[:, None] - cy
    xx = jnp.arange(w, dtype=jnp.float32)[None, :] - cx
    cos, sin = jnp.cos(angle_rad), jnp.sin(angle_rad)
    # inverse mapping: output (y,x) samples input (y', x')
    src_y = yy * cos - xx * sin + cy
    src_x = yy * sin + xx * cos + cx
    iy = jnp.round(src_y).astype(jnp.int32)
    ix = jnp.round(src_x).astype(jnp.int32)
    valid = (iy >= 0) & (iy < h) & (ix >= 0) & (ix < w)
    iyc = jnp.clip(iy, 0, h - 1)
    ixc = jnp.clip(ix, 0, w - 1)
    out = x[:, iyc, ixc, :] * valid[None, :, :, None].astype(x.dtype)
    out = jnp.where(flip, out[:, :, ::-1, :], out)
    return out


def random_rotate_flip_params(key, max_deg=10.0, flip_p=0.5):
    ka, kf = jax.random.split(key)
    angle = jax.random.uniform(
        ka, (), minval=-max_deg, maxval=max_deg
    ) * (jnp.pi / 180.0)
    flip = jax.random.bernoulli(kf, flip_p)
    return angle, flip


def rotate_flip_features(features, angle_rad, flip):
    """Apply the shared (angle, flip) to every pyramid level."""
    return [rotate_flip_nhwc(f, angle_rad, flip) for f in features]
