"""StyleGAN2 discriminator — ResBlock downsample stack + minibatch stddev.

Functional re-design of the reference Discriminator
(models/stylegan2/model.py:651-780): ConvLayer (optional blur+stride-2
downsample, equalized conv, fused leaky-relu), ResBlock with 1/√2-scaled skip,
minibatch-stddev statistic, final conv + 2-layer equalized MLP. NHWC.
"""

import math

import jax
import jax.numpy as jnp

from ganecdotes_tpu.models.stylegan2.generator import channel_map
from ganecdotes_tpu.nn.layers import (
    conv2d_nhwc,
    equal_linear_apply,
    equal_linear_init,
    leaky_relu,
)
from ganecdotes_tpu.ops.fused_act import fused_leaky_relu
from ganecdotes_tpu.ops.upfirdn2d import blur_2d


def _conv_layer_init(key, in_ch, out_ch, kernel_size, bias=True):
    return {
        "weight": jax.random.normal(key, (kernel_size, kernel_size, in_ch, out_ch)),
        **({"bias": jnp.zeros((out_ch,))} if bias else {}),
    }


def _conv_layer_apply(p, x, downsample=False, activate=True,
                      blur_kernel=(1, 3, 3, 1)):
    """ConvLayer semantics (ref model.py:651-697)."""
    kh = p["weight"].shape[0]
    in_ch = p["weight"].shape[2]
    scale = 1.0 / math.sqrt(in_ch * kh * kh)

    if downsample:
        pk = len(blur_kernel) - 2 + (kh - 1)
        pad0 = (pk + 1) // 2
        pad1 = pk // 2
        x = blur_2d(x, blur_kernel, pad=(pad0, pad1))
        out = conv2d_nhwc(x, p["weight"] * scale, stride=2, padding=0)
    else:
        out = conv2d_nhwc(x, p["weight"] * scale, stride=1, padding=kh // 2)

    if activate:
        if "bias" in p:
            out = fused_leaky_relu(out, p["bias"])
        else:
            out = leaky_relu(out) * math.sqrt(2)
    elif "bias" in p:
        out = out + p["bias"].astype(out.dtype)
    return out


def _res_block_init(key, in_ch, out_ch):
    k1, k2, k3 = jax.random.split(key, 3)
    return {
        "conv1": _conv_layer_init(k1, in_ch, in_ch, 3),
        "conv2": _conv_layer_init(k2, in_ch, out_ch, 3),
        "skip": _conv_layer_init(k3, in_ch, out_ch, 1, bias=False),
    }


def _res_block_apply(p, x, blur_kernel=(1, 3, 3, 1)):
    out = _conv_layer_apply(p["conv1"], x, blur_kernel=blur_kernel)
    out = _conv_layer_apply(p["conv2"], out, downsample=True,
                            blur_kernel=blur_kernel)
    skip = _conv_layer_apply(p["skip"], x, downsample=True, activate=False,
                             blur_kernel=blur_kernel)
    return (out + skip) / math.sqrt(2)


def init_discriminator(key, size, channel_multiplier=2, in_channels=3,
                       blur_kernel=(1, 3, 3, 1)):
    channels = channel_map(channel_multiplier)
    log_size = int(math.log2(size))
    keys = iter(jax.random.split(key, 2 * log_size + 8))

    params = {
        "conv_in": _conv_layer_init(next(keys), in_channels, channels[size], 1),
        "blocks": [],
        "final_conv": _conv_layer_init(next(keys), channels[4] + 1, channels[4], 3),
        "final_lin1": equal_linear_init(
            next(keys), channels[4] * 4 * 4, channels[4]
        ),
        "final_lin2": equal_linear_init(next(keys), channels[4], 1),
    }
    in_ch = channels[size]
    for i in range(log_size, 2, -1):
        out_ch = channels[2 ** (i - 1)]
        params["blocks"].append(_res_block_init(next(keys), in_ch, out_ch))
        in_ch = out_ch

    return params, discriminator_meta(size, blur_kernel)


def discriminator_meta(size, blur_kernel=(1, 3, 3, 1)):
    """Static architecture record (no device work)."""
    return {"size": size, "stddev_group": 4, "stddev_feat": 1,
            "blur_kernel": tuple(blur_kernel)}


def minibatch_stddev(x, group_size=4, num_new_features=1):
    """Minibatch standard-deviation statistic (ref model.py:763-772), NHWC."""
    b, h, w, c = x.shape
    group = min(b, group_size)
    y = x.reshape(group, -1, h, w, num_new_features, c // num_new_features)
    # the variance-of-4 statistic cancels catastrophically in low precision;
    # accumulate it in fp32 even when the trainer runs bf16 activations
    # (compute_dtype knob, gan/train.py) — a no-op cast on the fp32 path
    var = y.astype(jnp.float32).var(axis=0)
    stddev = jnp.sqrt(var + 1e-8)
    stddev = stddev.mean(axis=(1, 2, 4), keepdims=True).squeeze(4)  # (b/g,1,1,1)
    stddev = jnp.tile(stddev, (group, h, w, 1)).astype(x.dtype)
    return jnp.concatenate([x, stddev], axis=-1)


def discriminator_forward(params, meta, x):
    """x: (B, H, W, 3) -> logits (B, 1)."""
    bk = meta["blur_kernel"]
    out = _conv_layer_apply(params["conv_in"], x, blur_kernel=bk)
    for blk in params["blocks"]:
        out = _res_block_apply(blk, out, blur_kernel=bk)

    out = minibatch_stddev(out, meta["stddev_group"], meta["stddev_feat"])
    out = _conv_layer_apply(params["final_conv"], out, blur_kernel=bk)

    b = out.shape[0]
    # match torch's NCHW flatten order so converted weights stay valid
    out = out.transpose(0, 3, 1, 2).reshape(b, -1)
    out = equal_linear_apply(params["final_lin1"], out, activation="fused_lrelu")
    out = equal_linear_apply(params["final_lin2"], out)
    return out


# ---------------------------------------------------------------------------
# InfoGAN variant (BagGAN's `with_q` discriminator)
# ---------------------------------------------------------------------------


def init_discriminator_q(key, size, q_layers, n_cat_c, n_classes, n_cont_c,
                         channel_multiplier=2, in_channels=3,
                         blur_kernel=(1, 3, 3, 1)):
    """Discriminator with InfoGAN Q-heads (ref models/baggan/models.py:393-498).

    The trunk's last ``q_layers`` ResBlocks plus the final stddev/conv/MLP
    stack are duplicated per head: adversarial D, categorical code head
    (n_cat_c codes × n_classes, softmax) and continuous code head
    (n_cont_c × 2 for (mu, var), tanh).
    """
    base, meta = init_discriminator(
        key, size, channel_multiplier, in_channels, blur_kernel
    )
    n_blocks = len(base["blocks"])
    q_layers = min(q_layers, n_blocks)
    channels = channel_map(channel_multiplier)
    keys = iter(jax.random.split(jax.random.fold_in(key, 1), 8))

    def tail():
        t = {
            "blocks": [
                jax.tree.map(jnp.copy, b) for b in base["blocks"][n_blocks - q_layers:]
            ],
            "final_conv": jax.tree.map(jnp.copy, base["final_conv"]),
        }
        return t

    params = {
        "conv_in": base["conv_in"],
        "blocks_adv": base["blocks"][: n_blocks - q_layers],
        "d": {**tail(), "lin1": base["final_lin1"], "lin2": base["final_lin2"]},
    }
    if n_cat_c > 0:
        params["q_cat"] = {
            **tail(),
            "lin1": equal_linear_init(next(keys), channels[4] * 16, channels[4]),
            "lin2": equal_linear_init(next(keys), channels[4], n_cat_c * n_classes),
        }
    if n_cont_c > 0:
        params["q_cont"] = {
            **tail(),
            "lin1": equal_linear_init(next(keys), channels[4] * 16, channels[4]),
            "lin2": equal_linear_init(next(keys), channels[4], n_cont_c * 2),
        }
    meta = dict(meta, q_layers=q_layers, n_cat_c=n_cat_c,
                n_classes=n_classes, n_cont_c=n_cont_c)
    return params, meta


def _head_apply(head, meta, x, out_act=None):
    bk = meta["blur_kernel"]
    out = x
    for blk in head["blocks"]:
        out = _res_block_apply(blk, out, blur_kernel=bk)
    out = minibatch_stddev(out, meta["stddev_group"], meta["stddev_feat"])
    out = _conv_layer_apply(head["final_conv"], out, blur_kernel=bk)
    b = out.shape[0]
    out = out.transpose(0, 3, 1, 2).reshape(b, -1)
    out = equal_linear_apply(head["lin1"], out, activation="fused_lrelu")
    out = equal_linear_apply(head["lin2"], out)
    if out_act == "softmax":
        out = jax.nn.softmax(out, axis=-1)
    elif out_act == "tanh":
        out = jnp.tanh(out)
    return out


def discriminator_forward_q(params, meta, x):
    """(B,H,W,C) -> (d_logits, q_cat | None, q_cont | None).

    Mirrors the reference's three-way forward (models.py:500-574): shared
    adversarial trunk, then separate stddev+conv+MLP tails per head.
    """
    bk = meta["blur_kernel"]
    out = _conv_layer_apply(params["conv_in"], x, blur_kernel=bk)
    for blk in params["blocks_adv"]:
        out = _res_block_apply(blk, out, blur_kernel=bk)

    d = _head_apply(params["d"], meta, out)
    q_cat = (
        _head_apply(params["q_cat"], meta, out, out_act="softmax")
        if "q_cat" in params
        else None
    )
    q_cont = (
        _head_apply(params["q_cont"], meta, out, out_act="tanh")
        if "q_cont" in params
        else None
    )
    return d, q_cat, q_cont
