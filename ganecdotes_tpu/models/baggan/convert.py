"""BagGAN checkpoint conversion: reference ``%s_net_%s.pth`` -> pytrees.

The reference's BagGAN-HQ stack is a second StyleGAN2 implementation with its
own module naming (models/baggan/models.py:35-378, blocks.py:17-685) and a
*different default channel map* (models.py:25-33: 512 at 4×4 halving from
16×16 up, vs rosinality's 512 through 32×32). GANBaseModel persists each net
as ``'%s_net_%s.pth' % (epoch, name)`` state_dicts
(models/baggan/base_model.py:153-175). This module maps that exact key layout
onto the shared TPU generator pytree (layout transposes only; the forward
math — runtime equalized-lr scaling, mod/demod, FIR blur positions — is
identical, verified by the golden parity test in tests/test_gan.py):

  style.mapper.{i}.weight (out,in)      -> style[i-1].weight (in,out)
  const_input_block.const_block NCHW    -> input NHWC
  conv_init / conv_blks.{j}             -> conv1 / convs[j]
      .style_block.weight (1,o,i,k,k)   ->   .conv.weight HWIO
      .style_block.mod.{weight,bias}    ->   .conv.modulation
      .noise_block.weight (1,)          ->   .noise_weight ()
      .activation.bias                  ->   .bias
  x_to_img_init / x_to_img_blks.{j}     -> to_rgb1 / to_rgbs[j]
  noise_blks.noise_{l} (1,1,H,W)        -> noises[l] (1,H,W,1)
"""

import math

import jax.numpy as jnp
import numpy as np

# models/baggan/models.py:25-33 with DEFAULT_CHL_MULTIPLIER = 2 (:14)
BAGGAN_RES_TO_CHANNEL_MAP = {
    4: 512, 8: 512, 16: 256, 32: 128, 64: 64, 128: 32, 256: 16, 512: 8,
}


def _t(x):
    return np.asarray(x, dtype=np.float32)


def _linear(sd, prefix, bias=True):
    p = {"weight": jnp.asarray(_t(sd[prefix + ".weight"]).T)}
    if bias and prefix + ".bias" in sd:
        p["bias"] = jnp.asarray(_t(sd[prefix + ".bias"]))
    return p


def _modconv(sd, prefix):
    # (1, out, in, kh, kw) -> HWIO (kh, kw, in, out)
    w = _t(sd[prefix + ".weight"])[0]
    return {
        "weight": jnp.asarray(np.transpose(w, (2, 3, 1, 0))),
        "modulation": _linear(sd, prefix + ".mod"),
    }


def _synthesis_block(sd, prefix):
    return {
        "conv": _modconv(sd, prefix + ".style_block"),
        "noise_weight": jnp.asarray(
            _t(sd[prefix + ".noise_block.weight"]).reshape(())
        ),
        "bias": jnp.asarray(_t(sd[prefix + ".activation.bias"])),
    }


def _x_to_img(sd, prefix):
    return {
        "conv": _modconv(sd, prefix + ".conv"),
        "bias": jnp.asarray(_t(sd[prefix + ".bias"]).reshape(-1)),
    }


def convert_baggan_generator_state(sd, img_resolution, style_dim=512,
                                   blur_kernel=(1, 3, 3, 1),
                                   res2chlmap=None):
    """Map a BagGAN StyleGANGenerator state_dict to (params, meta)."""
    sd = {
        k.removeprefix("module."): (
            v.detach().cpu().numpy() if hasattr(v, "detach") else v
        )
        for k, v in sd.items()
    }

    log_size = int(math.log2(img_resolution))
    n_latent = log_size * 2 - 2
    num_layers = (log_size - 2) * 2 + 1
    n_mlp = sum(
        1 for k in sd if k.startswith("style.mapper.") and k.endswith(".weight")
    )

    params = {
        # mapper index 0 is the parameter-free PixelNorm (models.py:68-70)
        "style": [
            _linear(sd, f"style.mapper.{i}") for i in range(1, n_mlp + 1)
        ],
        "input": jnp.asarray(
            np.transpose(_t(sd["const_input_block.const_block"]), (0, 2, 3, 1))
        ),
        "conv1": _synthesis_block(sd, "conv_init"),
        "to_rgb1": _x_to_img(sd, "x_to_img_init"),
        "convs": [
            _synthesis_block(sd, f"conv_blks.{j}")
            for j in range(2 * (log_size - 2))
        ],
        "to_rgbs": [
            _x_to_img(sd, f"x_to_img_blks.{j}") for j in range(log_size - 2)
        ],
        "noises": [
            jnp.asarray(
                np.transpose(_t(sd[f"noise_blks.noise_{l}"]), (0, 2, 3, 1))
            )
            for l in range(num_layers)
        ],
    }

    meta = {
        "size": img_resolution,
        "style_dim": style_dim,
        "n_mlp": n_mlp,
        "channel_multiplier": None,  # BagGAN uses res2chlmap instead
        "res2chlmap": dict(res2chlmap or BAGGAN_RES_TO_CHANNEL_MAP),
        "blur_kernel": tuple(blur_kernel),
        "n_latent": n_latent,
        "num_layers": num_layers,
    }
    return params, meta


def load_baggan_torch_checkpoint(path, img_resolution, **kw):
    """Load a reference ``*_net_G.pth`` state_dict and convert it."""
    import torch

    sd = torch.load(path, map_location="cpu", weights_only=False)
    if hasattr(sd, "state_dict"):
        sd = sd.state_dict()
    return convert_baggan_generator_state(sd, img_resolution, **kw)


# ---------------------------------------------------------------------------
# export: pytree -> reference state_dict (inverse of the importer above)
# ---------------------------------------------------------------------------


def export_baggan_generator_state(params, blur_kernel=(1, 3, 3, 1)):
    """TPU generator pytree -> reference ``StyleGANGenerator`` state_dict
    (numpy values, reference key layout / NCHW shapes) — the inverse of
    ``convert_baggan_generator_state`` so a BagGAN trained here round-trips
    into the reference classes via ``'%s_net_%s.pth'``
    (models/baggan/base_model.py:153-176).

    Beyond the learned tensors, a loadable state_dict also needs the
    reference's registered buffers and dead parameters:

    * FIR kernel buffers — deterministic: outer(k,k)/sum ·scale²
      (blocks.py:232-237, 282-310) on every upsampling SynthesisBlock
      (``conv_blks.{even}.style_block.blur.kernel``) and every skip
      upsampler (``x_to_img_blks.{j}.upsample.kernel``);
    * ``head_m`` — a 4-conv mask head that the reference constructs but
      never calls (models.py:203-207; its only use, :369, is commented
      out). Exported as zeros: shape-complete, functionally dead.
    """

    def lin(p):
        out = {"weight": np.asarray(p["weight"], np.float32).T}
        if "bias" in p:
            out["bias"] = np.asarray(p["bias"], np.float32)
        return out

    def modconv(p):
        # HWIO -> (1, out, in, kh, kw)
        w = np.transpose(np.asarray(p["weight"], np.float32), (3, 2, 0, 1))
        out = {"weight": w[None]}
        for k, v in lin(p["modulation"]).items():
            out["mod." + k] = v
        return out

    def synthesis(p):
        out = {}
        for k, v in modconv(p["conv"]).items():
            out["style_block." + k] = v
        out["noise_block.weight"] = np.asarray(
            p["noise_weight"], np.float32
        ).reshape(1)
        out["activation.bias"] = np.asarray(p["bias"], np.float32)
        return out

    def x_to_img(p):
        out = {}
        for k, v in modconv(p["conv"]).items():
            out["conv." + k] = v
        out["bias"] = np.asarray(p["bias"], np.float32).reshape(1, -1, 1, 1)
        return out

    sd = {}
    for i, layer in enumerate(params["style"]):
        # mapper index 0 is the parameter-free PixelNorm (models.py:68-70)
        for k, v in lin(layer).items():
            sd[f"style.mapper.{i + 1}.{k}"] = v
    sd["const_input_block.const_block"] = np.transpose(
        np.asarray(params["input"], np.float32), (0, 3, 1, 2)
    )
    for k, v in synthesis(params["conv1"]).items():
        sd["conv_init." + k] = v
    for k, v in x_to_img(params["to_rgb1"]).items():
        sd["x_to_img_init." + k] = v
    for j, blk in enumerate(params["convs"]):
        for k, v in synthesis(blk).items():
            sd[f"conv_blks.{j}.{k}"] = v
    for j, blk in enumerate(params["to_rgbs"]):
        for k, v in x_to_img(blk).items():
            sd[f"x_to_img_blks.{j}.{k}"] = v
    for l, n in enumerate(params["noises"]):
        sd[f"noise_blks.noise_{l}"] = np.transpose(
            np.asarray(n, np.float32), (0, 3, 1, 2)
        )

    # FIR kernel buffers (normalized outer product x scale^2 for upsampling,
    # blocks.py:232-237): even conv_blks are the upsample convs
    k = np.asarray(blur_kernel, np.float32)
    k2 = np.outer(k, k)
    k_up = (k2 / k2.sum() * 4.0).astype(np.float32)
    for j in range(len(params["convs"])):
        if j % 2 == 0:
            sd[f"conv_blks.{j}.style_block.blur.kernel"] = k_up
    for j in range(len(params["to_rgbs"])):
        sd[f"x_to_img_blks.{j}.upsample.kernel"] = k_up

    # dead mask head (models.py:203-207, never called): zero-filled
    for i in range(4):
        sd[f"head_m.{i}.weight"] = np.zeros((1, 1, 3, 3), np.float32)
        sd[f"head_m.{i}.bias"] = np.zeros((1,), np.float32)
    return sd


def save_baggan_torch_checkpoint(path, params):
    """Write ``params`` as a reference-loadable ``*_net_G.pth``."""
    import torch

    sd = {
        k: torch.from_numpy(np.ascontiguousarray(v))
        for k, v in export_baggan_generator_state(params).items()
    }
    torch.save(sd, path)
