"""Feature-emitting StyleGAN2 generator, TPU-native.

Functional re-design of the reference generator
(models/stylegan2/model.py:457-648): one pure ``generator_forward`` whose
synthesis pass returns the multi-scale feature pyramid as a first-class
output (the reference appends every StyledConv activation to a python list
inside forward, model.py:624-648 — here the pyramid *is* part of the traced
program, so the whole generate→embed→segment path jits into one XLA program).

TPU-first choices (none of these change the computed function):

* **No per-sample grouped convs.** The reference materializes a
  (batch·out, in, k, k) weight per step and runs a grouped conv
  (model.py:327-368). Because the style modulation scales *input channels*
  and demodulation scales *output channels*, the identical result is
  ``demod ⊙ conv(x ⊙ style, W)`` with a single shared HWIO weight — one big
  batched conv that XLA tiles straight onto the MXU.
* **NHWC activations / HWIO weights** (TPU-native layouts).
* **Static unrolled synthesis** per resolution — shapes are compile-time
  constants, so there is exactly one compilation per (model size, batch).
* Blur/up/down-sampling ride the MXU-factorized ``upfirdn2d``.

Params are a plain pytree; ``convert.py`` maps a reference ``g_ema``
state_dict onto it 1:1.
"""

import collections
import math

import jax
import jax.numpy as jnp
import numpy as np

from ganecdotes_tpu.nn.layers import (
    conv2d_nhwc,
    conv2d_transpose_nhwc,
    equal_linear_apply,
    equal_linear_init,
    pixel_norm,
)
from ganecdotes_tpu.ops.fused_act import fused_leaky_relu
from ganecdotes_tpu.ops.upfirdn2d import blur_2d, upsample_2d

# Non-up StyledConv implementation: 'xla' (conv + XLA epilogue fusions) or
# 'pallas' (ops/modulated_conv_pallas.py — conv as 9 shifted MXU matmuls
# with the demod/noise/bias/lrelu epilogue fused in VMEM, saving the conv
# output's HBM round trip). Default per the measured decision in
# docs/PERFORMANCE.md; override with GANECDOTES_STYLED_CONV_IMPL.
import os as _os

STYLED_CONV_IMPL = _os.environ.get("GANECDOTES_STYLED_CONV_IMPL", "xla")

# Upsampling modulated-conv implementation: 'xla' (conv_transpose + demod +
# 2-pass blur — three passes over the network's largest tensors) or
# 'subpixel' (ops/subpixel_upconv.py — the blur composed into the kernel,
# polyphase-decomposed into ONE 3x3 conv with 4*Cout outputs +
# depth-to-space; exact, pinned in tests). Default per docs/PERFORMANCE.md;
# override with GANECDOTES_UP_CONV_IMPL.
UP_CONV_IMPL = _os.environ.get("GANECDOTES_UP_CONV_IMPL", "xla")


def channel_map(channel_multiplier=2, res2chlmap=None):
    """Resolution -> channel width (ref model.py:484-494).

    ``res2chlmap`` overrides the rosinality map with an explicit dict —
    BagGAN's leaner default (models/baggan/models.py:25-33) halves widths
    from 16×16 up; training a BagGAN from scratch must match it so exported
    checkpoints round-trip into the reference classes.
    """
    if res2chlmap is not None:
        return dict(res2chlmap)
    return {
        4: 512,
        8: 512,
        16: 512,
        32: 512,
        64: 256 * channel_multiplier,
        128: 128 * channel_multiplier,
        256: 64 * channel_multiplier,
        512: 32 * channel_multiplier,
        1024: 16 * channel_multiplier,
    }


def num_feature_layers(size):
    """Number of StyledConv activations emitted: 1 + 2*(log2(size)-2)."""
    return 2 * (int(math.log2(size)) - 2) + 1


# ---------------------------------------------------------------------------
# init
# ---------------------------------------------------------------------------


def _modulated_conv_init(key, in_ch, out_ch, kernel_size, style_dim):
    kw, km = jax.random.split(key)
    return {
        "weight": jax.random.normal(
            kw, (kernel_size, kernel_size, in_ch, out_ch)
        ),
        "modulation": equal_linear_init(km, style_dim, in_ch, bias_init=1.0),
    }


def _styled_conv_init(key, in_ch, out_ch, kernel_size, style_dim):
    return {
        "conv": _modulated_conv_init(key, in_ch, out_ch, kernel_size, style_dim),
        "noise_weight": jnp.zeros(()),
        "bias": jnp.zeros((out_ch,)),
    }


def _to_rgb_init(key, in_ch, style_dim):
    return {
        "conv": _modulated_conv_init(key, in_ch, 3, 1, style_dim),
        "bias": jnp.zeros((3,)),
    }


def generator_meta(size, style_dim=512, n_mlp=8, channel_multiplier=2,
                   blur_kernel=(1, 3, 3, 1), res2chlmap=None):
    """Static architecture record (pure config math, no device work)."""
    log_size = int(math.log2(size))
    meta = {
        "size": size,
        "style_dim": style_dim,
        "n_mlp": n_mlp,
        "channel_multiplier": channel_multiplier,
        "blur_kernel": tuple(blur_kernel),
        "n_latent": log_size * 2 - 2,
        "num_layers": (log_size - 2) * 2 + 1,
    }
    if res2chlmap is not None:
        meta["res2chlmap"] = dict(res2chlmap)
    return meta


def init_generator(
    key, size, style_dim=512, n_mlp=8, channel_multiplier=2,
    blur_kernel=(1, 3, 3, 1), res2chlmap=None,
):
    """Build the parameter pytree (matches ref Generator.__init__ :457-541).

    ~10⁲ eager random ops: call under jit (as ``Generator.__init__`` does)
    when initializing on a real TPU — per-op dispatch through the device
    relay costs ~100 s for the 256² tree, one compiled program ~2 s.
    """
    channels = channel_map(channel_multiplier, res2chlmap)
    log_size = int(math.log2(size))
    n_latent = log_size * 2 - 2
    num_layers = (log_size - 2) * 2 + 1

    keys = iter(jax.random.split(key, 4 * n_mlp + 8 * log_size + 16))

    style = [
        equal_linear_init(next(keys), style_dim, style_dim, lr_mul=0.01)
        for _ in range(n_mlp)
    ]

    params = {
        "style": style,
        "input": jax.random.normal(next(keys), (1, 4, 4, channels[4])),
        "conv1": _styled_conv_init(next(keys), channels[4], channels[4], 3, style_dim),
        "to_rgb1": _to_rgb_init(next(keys), channels[4], style_dim),
        "convs": [],
        "to_rgbs": [],
        "noises": [],
    }

    # fixed per-layer noise buffers (ref model.py:512-515)
    for layer_idx in range(num_layers):
        res = (layer_idx + 5) // 2
        params["noises"].append(
            jax.random.normal(next(keys), (1, 2**res, 2**res, 1))
        )

    in_ch = channels[4]
    for i in range(3, log_size + 1):
        out_ch = channels[2**i]
        params["convs"].append(
            _styled_conv_init(next(keys), in_ch, out_ch, 3, style_dim)
        )
        params["convs"].append(
            _styled_conv_init(next(keys), out_ch, out_ch, 3, style_dim)
        )
        params["to_rgbs"].append(_to_rgb_init(next(keys), out_ch, style_dim))
        in_ch = out_ch

    meta = generator_meta(size, style_dim, n_mlp, channel_multiplier,
                          blur_kernel, res2chlmap)
    return params, meta


# ---------------------------------------------------------------------------
# apply
# ---------------------------------------------------------------------------


def mapping_apply(params, z, dtype=None):
    """z -> w through PixelNorm + n_mlp equalized FC (ref model.py:473-482)."""
    x = z if dtype is None else z.astype(dtype)
    x = pixel_norm(x)
    for layer in params["style"]:
        x = equal_linear_apply(layer, x, lr_mul=0.01, activation="fused_lrelu")
    return x


def _modulated_conv_apply(
    p, x, style_w, demodulate=True, up=False, blur_kernel=(1, 3, 3, 1)
):
    """demod ⊙ conv(x ⊙ style, W): batched equivalent of ref model.py:327-368."""
    kh, kw, in_ch, out_ch = p["weight"].shape
    scale = 1.0 / math.sqrt(in_ch * kh * kw)

    s = equal_linear_apply(p["modulation"], style_w)  # (B, in_ch)

    w = p["weight"] * scale

    if demodulate:
        # demod[b,o] = rsqrt(Σ_khw,i (scale·W·s)² + 1e-8); the spatial sum of
        # W² is style-independent, so precontract it to (in, out).
        w_sq = jnp.sum(jnp.square(w), axis=(0, 1))  # (in, out)
        denom = jnp.square(s) @ w_sq.astype(s.dtype) + 1e-8  # (B, out)
        demod = jax.lax.rsqrt(denom)

    x = x * s[:, None, None, :].astype(x.dtype)

    if up:
        # 'auto': per-layer policy — subpixel only where the post-transpose
        # blur runs with half-empty vector lanes (C_out < 128, i.e. the
        # 512²-and-up pyramid tail). Measured v5e (car-512 serving, batch
        # 128): the 512² blur is the program's worst op (28.8 ms at
        # 333 GB/s — (8,128) tiles half-empty at C=64) and composing it
        # into the polyphase conv wins there, while at the wide levels the
        # depthwise-conv blur beats the composed form (whole-net subpixel
        # measured 403 vs 528 img/s).
        use_subpixel = UP_CONV_IMPL == "subpixel" or (
            UP_CONV_IMPL == "auto" and out_ch < 128
        )
        if use_subpixel and kh == 3 and len(blur_kernel) == 4:
            from ganecdotes_tpu.ops.subpixel_upconv import (
                upsampled_conv2x_blur,
            )

            # blur composed into the kernel; demod commutes with the blur
            # (per-channel scale vs spatial filter) so applying it after
            # the fused conv is exact
            out = upsampled_conv2x_blur(x, w, blur_kernel)
            if demodulate:
                out = out * demod[:, None, None, :].astype(out.dtype)
            return out
        out = conv2d_transpose_nhwc(x, w, stride=2)
        if demodulate:
            out = out * demod[:, None, None, :].astype(out.dtype)
        # blur pad for upsample (ref model.py:293-299): p = (len(k)-2)-(ks-1)
        pk = len(blur_kernel) - 2 - (kh - 1)
        pad0 = (pk + 1) // 2 + 1
        pad1 = pk // 2 + 1
        out = blur_2d(out, blur_kernel, pad=(pad0, pad1), upsample_factor=2)
    else:
        out = conv2d_nhwc(x, w, padding=kh // 2)
        if demodulate:
            out = out * demod[:, None, None, :].astype(out.dtype)
    return out


def _styled_conv_apply(p, x, style_w, noise, up=False, blur_kernel=(1, 3, 3, 1)):
    if STYLED_CONV_IMPL == "pallas" and (not up or len(blur_kernel) == 4):
        from ganecdotes_tpu.ops.modulated_conv_pallas import (
            styled_conv3x3,
            styled_up_conv3x3,
        )

        pc = p["conv"]
        kh, kw, in_ch, _ = pc["weight"].shape
        scale = 1.0 / math.sqrt(in_ch * kh * kw)
        s = equal_linear_apply(pc["modulation"], style_w)
        w = pc["weight"] * scale
        w_sq = jnp.sum(jnp.square(w), axis=(0, 1))
        demod = jax.lax.rsqrt(jnp.square(s) @ w_sq.astype(s.dtype) + 1e-8)
        fn = styled_up_conv3x3 if up else styled_conv3x3
        return fn(
            x, w, s, demod, noise, p["noise_weight"], p["bias"],
            impl="pallas",
        )
    out = _modulated_conv_apply(
        p["conv"], x, style_w, demodulate=True, up=up, blur_kernel=blur_kernel
    )
    out = out + p["noise_weight"].astype(out.dtype) * noise.astype(out.dtype)
    return fused_leaky_relu(out, p["bias"])


def _to_rgb_apply(p, x, style_w, skip=None, blur_kernel=(1, 3, 3, 1)):
    out = _modulated_conv_apply(p["conv"], x, style_w, demodulate=False)
    out = out + p["bias"].astype(out.dtype)
    if skip is not None:
        out = out + upsample_2d(skip, blur_kernel)
    return out


def make_noise(meta, key, batch=1):
    """Random per-layer noise list (ref model.py:543-552), NHWC (B,H,W,1)."""
    noises = []
    keys = jax.random.split(key, meta["num_layers"])
    for layer_idx in range(meta["num_layers"]):
        res = 2 ** ((layer_idx + 5) // 2)
        noises.append(jax.random.normal(keys[layer_idx], (batch, res, res, 1)))
    return noises


def mean_latent(params, key, n_latent_samples, style_dim=512):
    """Mean w over n style(z) samples (ref model.py:554-560)."""
    z = jax.random.normal(key, (n_latent_samples, style_dim))
    return mapping_apply(params, z).mean(axis=0, keepdims=True)


def generator_forward(
    params,
    meta,
    styles,
    input_is_latent=False,
    truncation=1.0,
    truncation_latent=None,
    noise=None,
    randomize_noise=True,
    noise_key=None,
    inject_index=None,
    return_latents=False,
    dtype=None,
):
    """Full forward pass: (image, features) or (image, latents).

    Mirrors ref Generator.forward (model.py:565-648). ``styles`` is a list of
    (B, style_dim) z/w vectors or a single (B, n_latent, style_dim) w-plus.
    ``features`` is the list of all StyledConv activations, NHWC.
    """
    blur_kernel = meta["blur_kernel"]
    n_latent = meta["n_latent"]
    num_layers = meta["num_layers"]

    if not isinstance(styles, (list, tuple)):
        styles = [styles]

    if not input_is_latent:
        mapped = []
        for s in styles:
            if s.ndim == 3:
                b, k, d = s.shape
                mapped.append(mapping_apply(params, s.reshape(b * k, d)).reshape(b, k, d))
            else:
                mapped.append(mapping_apply(params, s))
        styles = mapped

    if noise is None:
        if randomize_noise:
            if noise_key is None:
                raise ValueError(
                    "randomize_noise=True requires noise_key (explicit JAX RNG)"
                )
            batch = styles[0].shape[0]
            noise = make_noise(meta, noise_key, batch=batch)
        else:
            noise = params["noises"]

    if truncation < 1.0:
        styles = [
            truncation_latent + truncation * (s - truncation_latent) for s in styles
        ]

    if len(styles) < 2:
        if styles[0].ndim < 3:
            latent = jnp.repeat(styles[0][:, None, :], n_latent, axis=1)
        else:
            latent = styles[0]
    else:
        if inject_index is None:
            raise ValueError(
                "style mixing requires an explicit inject_index under jit"
            )
        latent = jnp.concatenate(
            [
                jnp.repeat(styles[0][:, None, :], inject_index, axis=1),
                jnp.repeat(styles[1][:, None, :], n_latent - inject_index, axis=1),
            ],
            axis=1,
        )

    if dtype is not None:
        latent = latent.astype(dtype)

    batch = latent.shape[0]
    out = jnp.tile(params["input"], (batch, 1, 1, 1))
    if dtype is not None:
        out = out.astype(dtype)

    out = _styled_conv_apply(
        params["conv1"], out, latent[:, 0], noise[0], blur_kernel=blur_kernel
    )
    features = [out]

    skip = _to_rgb_apply(params["to_rgb1"], out, latent[:, 1], blur_kernel=blur_kernel)

    i = 1
    for li in range(0, len(params["convs"]), 2):
        out = _styled_conv_apply(
            params["convs"][li],
            out,
            latent[:, i],
            noise[1 + li],
            up=True,
            blur_kernel=blur_kernel,
        )
        features.append(out)
        out = _styled_conv_apply(
            params["convs"][li + 1],
            out,
            latent[:, i + 1],
            noise[2 + li],
            blur_kernel=blur_kernel,
        )
        features.append(out)
        skip = _to_rgb_apply(
            params["to_rgbs"][li // 2],
            out,
            latent[:, i + 2],
            skip,
            blur_kernel=blur_kernel,
        )
        i += 2

    image = skip
    assert 1 + len(params["convs"]) == num_layers

    if return_latents == "all":
        # BagGAN generator contract: (image, latent, features)
        # (ref models/baggan/models.py:374-378)
        return image, latent, features
    if return_latents:
        return image, latent
    return image, features


class Generator:
    """Thin stateful wrapper bundling (params, meta) with the pure functions.

    The pipeline layer uses this for ergonomic parity with the reference's
    ``Generator`` module API; all computation stays in the pure functions so
    it remains jit/vmap/pjit-friendly.
    """

    def __init__(self, size, style_dim=512, n_mlp=8, channel_multiplier=2,
                 blur_kernel=(1, 3, 3, 1), lr_mlp=0.01, key=None,
                 res2chlmap=None):
        if key is None:
            key = jax.random.PRNGKey(0)
        r2c = None if res2chlmap is None else tuple(
            sorted(res2chlmap.items())
        )
        # init as ONE compiled program: eager per-op dispatch of the ~100
        # random inits costs ~100 s through a TPU relay
        self.params = jax.jit(
            lambda k: init_generator(
                k, size, style_dim, n_mlp, channel_multiplier,
                tuple(blur_kernel),
                None if r2c is None else dict(r2c),
            )[0]
        )(key)
        self.meta = generator_meta(
            size, style_dim, n_mlp, channel_multiplier, blur_kernel,
            res2chlmap,
        )
        self.size = size
        self.style_dim = style_dim
        self.n_latent = self.meta["n_latent"]
        self.num_layers = self.meta["num_layers"]
        # LRU of jitted closures: one per static (shape, truncation, mode, …)
        # tuple. Bounded so a long-lived GUI session sweeping batch sizes
        # cannot accumulate compiled programs without limit (each holds its
        # executable + device constants).
        self._compiled = collections.OrderedDict()
        self._compiled_max = 16
        # stateful stream for the reference's randomize_noise=True default.
        # Kept as a host numpy RNG producing raw (2,) uint32 key data: a
        # legacy PRNG key is just that array, so fresh per-call keys cost
        # ZERO eager device ops (jax.random.split on the host is itself a
        # compiled dispatch — ~1 s through a TPU relay).
        try:
            key_data = jax.random.key_data(key)
        except Exception:
            key_data = key
        # seed from ALL key words: seeding from one word would replay
        # identical noise streams for distinct keys sharing that word
        # (e.g. PRNGKey(s) vs PRNGKey(s + 2**32))
        self._noise_rng = np.random.RandomState(
            np.random.SeedSequence(
                [int(w) for w in np.asarray(key_data).ravel()]
            ).generate_state(1)
        )

    def _cached(self, cache_key, build):
        """LRU lookup of a jitted closure; evicts the least-recently used
        entry beyond ``_compiled_max``."""
        fn = self._compiled.get(cache_key)
        if fn is None:
            fn = build()
            self._compiled[cache_key] = fn
            while len(self._compiled) > self._compiled_max:
                self._compiled.popitem(last=False)
        else:
            self._compiled.move_to_end(cache_key)
        return fn

    def style(self, z):
        return self._style_jit(self.params, jnp.asarray(z))

    @property
    def _style_jit(self):
        return self._cached("style", lambda: jax.jit(mapping_apply))

    def mean_latent(self, n, key=None):
        key = jax.random.PRNGKey(4096) if key is None else key
        fn = self._cached(
            ("mean_latent", n),
            lambda: jax.jit(
                lambda params, k: mean_latent(params, k, n, self.style_dim)
            ),
        )
        return fn(self.params, key)

    def make_noise(self, key=None, batch=1):
        key = jax.random.PRNGKey(7) if key is None else key
        return make_noise(self.meta, key, batch)

    def __call__(self, styles, **kwargs):
        """Forward through a cached jitted closure (one compile per static
        config + shape; op-by-op dispatch on TPU would be pathological).

        Every path is jitted with ZERO eager device ops per call, including
        the reference's default ``randomize_noise=True`` (fresh noise each
        forward, model.py:614-619): the per-call PRNG key is raw (2,) uint32
        key data drawn from a host numpy RNG and passed as a traced
        argument; the per-layer noise tensors are drawn *inside* the
        compiled program. (An earlier version drew noise eagerly on the
        host — ~num_layers dispatches/call, ~1 s each through a TPU relay.)
        """
        if not isinstance(styles, (list, tuple)):
            styles = [styles]
        styles = [jnp.asarray(s) for s in styles]

        noise = kwargs.get("noise")
        nkey = None
        if noise is not None:
            mode = "explicit"
            noise = tuple(jnp.asarray(x) for x in noise)
        elif kwargs.get("randomize_noise", True):
            mode = "random"
            if kwargs.get("noise_key") is not None:
                nkey = kwargs["noise_key"]
            else:
                nkey = self._noise_rng.randint(
                    0, 2**32, size=(2,), dtype=np.uint32
                )
        else:
            mode = "fixed"  # params['noises'] buffers

        trunc_lat = kwargs.get("truncation_latent")
        static = (
            tuple(s.shape for s in styles),
            kwargs.get("input_is_latent", False),
            float(kwargs.get("truncation", 1.0)),
            trunc_lat is not None,
            mode,
            kwargs.get("inject_index"),
            kwargs.get("return_latents", False),
            kwargs.get("dtype"),
        )
        fn = self._compiled.get(static)
        if fn is None:
            meta = self.meta
            kw = {
                k: kwargs.get(k, d)
                for k, d in [
                    ("input_is_latent", False),
                    ("truncation", 1.0),
                    ("inject_index", None),
                    ("return_latents", False),
                    ("dtype", None),
                ]
            }

            if mode == "explicit":

                def fwd(params, styles, truncation_latent, noise, _nkey):
                    return generator_forward(
                        params, meta, list(styles), noise=list(noise),
                        randomize_noise=False,
                        truncation_latent=truncation_latent, **kw,
                    )

            elif mode == "random":

                def fwd(params, styles, truncation_latent, _noise, nkey):
                    return generator_forward(
                        params, meta, list(styles),
                        randomize_noise=True, noise_key=nkey,
                        truncation_latent=truncation_latent, **kw,
                    )

            else:

                def fwd(params, styles, truncation_latent, _noise, _nkey):
                    return generator_forward(
                        params, meta, list(styles), randomize_noise=False,
                        truncation_latent=truncation_latent, **kw,
                    )

            fn = self._cached(static, lambda: jax.jit(fwd))
        else:
            self._compiled.move_to_end(static)

        return fn(self.params, tuple(styles), trunc_lat, noise, nkey)
