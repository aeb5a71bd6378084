"""Checkpoint conversion: reference PyTorch ``g_ema`` state_dicts -> pytrees.

The reference loads rosinality-layout checkpoints via
``Generator.load_state_dict(ckpt['g_ema'])`` (src/one_shot_pipeline.py:140-147).
This module maps that exact key layout onto ``init_generator``'s pytree so
published StyleGAN2 weights run on TPU unchanged (layout transposes only):

  torch OIHW conv weights      -> HWIO
  torch (out,in) linear weights-> (in,out)
  NCHW buffers (const, noises) -> NHWC
"""

import math

import jax.numpy as jnp
import numpy as np


def _t(x):
    return np.asarray(x, dtype=np.float32)


def _linear(sd, prefix):
    p = {"weight": jnp.asarray(_t(sd[prefix + ".weight"]).T)}
    if prefix + ".bias" in sd:
        p["bias"] = jnp.asarray(_t(sd[prefix + ".bias"]))
    return p


def _modconv(sd, prefix):
    # torch weight (1, out, in, kh, kw) -> HWIO (kh, kw, in, out)
    w = _t(sd[prefix + ".weight"])[0]
    return {
        "weight": jnp.asarray(np.transpose(w, (2, 3, 1, 0))),
        "modulation": _linear(sd, prefix + ".modulation"),
    }


def _styled_conv(sd, prefix):
    return {
        "conv": _modconv(sd, prefix + ".conv"),
        "noise_weight": jnp.asarray(_t(sd[prefix + ".noise.weight"]).reshape(())),
        "bias": jnp.asarray(_t(sd[prefix + ".activate.bias"])),
    }


def _to_rgb(sd, prefix):
    return {
        "conv": _modconv(sd, prefix + ".conv"),
        "bias": jnp.asarray(_t(sd[prefix + ".bias"]).reshape(3)),
    }


def convert_torch_generator_state(sd, size, style_dim=512, n_mlp=8,
                                  channel_multiplier=2, blur_kernel=(1, 3, 3, 1)):
    """Map a reference-layout state_dict (tensors or ndarrays) to (params, meta)."""
    sd = {k: (v.detach().cpu().numpy() if hasattr(v, "detach") else v)
          for k, v in sd.items()}

    log_size = int(math.log2(size))
    num_layers = (log_size - 2) * 2 + 1

    params = {
        "style": [_linear(sd, f"style.{i + 1}") for i in range(n_mlp)],
        # const input (1, C, 4, 4) -> (1, 4, 4, C)
        "input": jnp.asarray(np.transpose(_t(sd["input.input"]), (0, 2, 3, 1))),
        "conv1": _styled_conv(sd, "conv1"),
        "to_rgb1": _to_rgb(sd, "to_rgb1"),
        "convs": [
            _styled_conv(sd, f"convs.{i}") for i in range(2 * (log_size - 2))
        ],
        "to_rgbs": [_to_rgb(sd, f"to_rgbs.{i}") for i in range(log_size - 2)],
        "noises": [],
    }

    for layer_idx in range(num_layers):
        k = f"noises.noise_{layer_idx}"
        res = 2 ** ((layer_idx + 5) // 2)
        if k in sd:
            params["noises"].append(
                jnp.asarray(np.transpose(_t(sd[k]), (0, 2, 3, 1)))
            )
        else:
            # checkpoints without noise buffers: deterministic zeros
            params["noises"].append(jnp.zeros((1, res, res, 1)))

    meta = {
        "size": size,
        "style_dim": style_dim,
        "n_mlp": n_mlp,
        "channel_multiplier": channel_multiplier,
        "blur_kernel": tuple(blur_kernel),
        "n_latent": log_size * 2 - 2,
        "num_layers": num_layers,
    }
    return params, meta


def convert_torch_discriminator_state(sd, size, channel_multiplier=2):
    """Map a reference Discriminator state_dict onto init_discriminator's
    pytree (model.py:721-759 layout: convs.0 input ConvLayer, convs.1..N
    ResBlocks, final_conv, final_linear)."""
    sd = {k: (v.detach().cpu().numpy() if hasattr(v, "detach") else v)
          for k, v in sd.items()}

    def conv(prefix, bias_prefix=None):
        p = {"weight": jnp.asarray(np.transpose(_t(sd[prefix + ".weight"]),
                                                (2, 3, 1, 0)))}
        if bias_prefix and bias_prefix + ".bias" in sd:
            p["bias"] = jnp.asarray(_t(sd[bias_prefix + ".bias"]))
        elif prefix + ".bias" in sd:
            p["bias"] = jnp.asarray(_t(sd[prefix + ".bias"]))
        return p

    log_size = int(math.log2(size))
    params = {
        # ConvLayer = Sequential(EqualConv2d, FusedLeakyReLU): weight at .0,
        # activation bias at .1
        "conv_in": conv("convs.0.0", "convs.0.1"),
        "blocks": [],
        "final_conv": conv("final_conv.0", "final_conv.1"),
        "final_lin1": _linear(sd, "final_linear.0"),
        "final_lin2": _linear(sd, "final_linear.1"),
    }
    for i in range(1, log_size - 1):
        params["blocks"].append(
            {
                "conv1": conv(f"convs.{i}.conv1.0", f"convs.{i}.conv1.1"),
                # downsample ConvLayer = Sequential(Blur, EqualConv2d, Act)
                "conv2": conv(f"convs.{i}.conv2.1", f"convs.{i}.conv2.2"),
                "skip": conv(f"convs.{i}.skip.1"),
            }
        )
    meta = {"size": size, "stddev_group": 4, "stddev_feat": 1,
            "blur_kernel": (1, 3, 3, 1)}
    return params, meta


def load_torch_checkpoint(path, size, **kwargs):
    """Load a .pt checkpoint (uses torch for unpickling only)."""
    import torch

    ckpt = torch.load(path, map_location="cpu", weights_only=False)
    sd = ckpt.get("g_ema", ckpt) if isinstance(ckpt, dict) else ckpt
    return convert_torch_generator_state(sd, size, **kwargs)
