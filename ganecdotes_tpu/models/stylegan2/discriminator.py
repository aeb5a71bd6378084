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

    meta = {"size": size, "stddev_group": 4, "stddev_feat": 1,
            "blur_kernel": tuple(blur_kernel)}
    return params, meta


def minibatch_stddev(x, group_size=4, num_new_features=1):
    """Minibatch standard-deviation statistic (ref model.py:763-772), NHWC."""
    b, h, w, c = x.shape
    group = min(b, group_size)
    y = x.reshape(group, -1, h, w, num_new_features, c // num_new_features)
    var = y.var(axis=0)
    stddev = jnp.sqrt(var + 1e-8)
    stddev = stddev.mean(axis=(1, 2, 4), keepdims=True).squeeze(4)  # (b/g,1,1,1)
    stddev = jnp.tile(stddev, (group, h, w, 1))
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
