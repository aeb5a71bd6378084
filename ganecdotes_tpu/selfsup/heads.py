"""One-shot segmentor heads (dilated FCN / per-pixel MLP), functional.

Reproduces the duck-typed head family the reference method packages expose:

* ``OneShotSegmentor`` — small dilated-conv FCN with sizes XXS…L and a
  linear ``Lin`` variant (hfc_with_swav/swav_clustering.py:697-758 and the
  per-baseline clones). Faithful quirk: the layer list is built by
  ``zip(dilations, channels[:-1], channels[1:])``, so the conv count equals
  ``len(dilations)`` and for XXS the n_class tail of the channel list is
  never reached — the XXS head outputs 12 channels regardless of n_class
  (argmax over the extra channels is harmless, CE targets stay < n_class).
* ``PixelClassifier`` — DatasetGAN's per-pixel MLP with BatchNorm
  (baseline/datasetgan/segmentor.py:6-73); batch-norm runs in stats-carrying
  functional form (state pytree threaded through apply).

Static architecture info (``size``) is passed as a python argument, never
stored in the param pytree, so heads jit cleanly.
"""

import jax
import jax.numpy as jnp

from ganecdotes_tpu.nn.layers import conv2d_dilated_nhwc, leaky_relu

DILATIONS = {
    "XXS": [1],
    "XS": [1, 2, 1],
    "S": [1, 2, 1, 2, 1],
    "M": [1, 2, 4, 1, 2, 4, 1],
    "L": [1, 2, 4, 8, 1, 2, 4, 8, 1],
}

CHANNELS = {
    "XXS": [12],
    "XS": [16, 8],
    "S": [128, 64, 64, 32],
    "M": [128, 64, 64, 64, 64, 32],
    "L": [128, 64, 64, 64, 64, 64, 64, 32],
}


def _kaiming_uniform_conv(key, kh, kw, cin, cout):
    # torch nn.Conv2d default init: kaiming_uniform(a=sqrt(5)) ->
    # U(-1/sqrt(fan_in), 1/sqrt(fan_in)) on weight, same bound on bias
    fan_in = cin * kh * kw
    bound = 1.0 / jnp.sqrt(fan_in)
    kw_, kb_ = jax.random.split(key)
    w = jax.random.uniform(kw_, (kh, kw, cin, cout), minval=-bound, maxval=bound)
    b = jax.random.uniform(kb_, (cout,), minval=-bound, maxval=bound)
    return {"weight": w, "bias": b}


def _torch_linear_init(key, cin, cout, bias=True):
    bound = 1.0 / jnp.sqrt(cin)
    kw_, kb_ = jax.random.split(key)
    p = {
        "weight": jax.random.uniform(kw_, (cin, cout), minval=-bound, maxval=bound),
    }
    if bias:
        p["bias"] = jax.random.uniform(kb_, (cout,), minval=-bound, maxval=bound)
    return p


def segmentor_out_channels(n_class, size="S"):
    """Actual output channel count (reproduces the zip-truncation quirk)."""
    if size == "Lin":
        return n_class
    channels = [0] + CHANNELS[size] + [n_class]  # in_ch value irrelevant
    n_convs = len(DILATIONS[size])
    return channels[1:][n_convs - 1]


def init_one_shot_segmentor(key, in_ch, n_class, size="S"):
    """Parameter pytree for the FCN head; ``size`` in {XXS,XS,S,M,L,Lin}."""
    if size == "Lin":
        return [_torch_linear_init(key, in_ch, n_class)]

    dilations = DILATIONS[size]
    channels = [in_ch] + CHANNELS[size] + [n_class]
    layers = []
    keys = jax.random.split(key, len(dilations))
    for k, (d, cin, cout) in zip(
        keys, zip(dilations, channels[:-1], channels[1:])
    ):
        layers.append(_kaiming_uniform_conv(k, 3, 3, cin, cout))
    return layers


def one_shot_segmentor_apply(params, x, size="S"):
    """x: (B, H, W, C) -> logits (B, H, W, C_out)."""
    if size == "Lin":
        p = params[0]
        out = x @ p["weight"].astype(x.dtype) + p["bias"].astype(x.dtype)
        # the Lin variant keeps its trailing LeakyReLU (ref :712-714)
        return leaky_relu(out)

    dilations = DILATIONS[size]
    out = x
    for i, (p, d) in enumerate(zip(params, dilations)):
        out = conv2d_dilated_nhwc(out, p["weight"], dilation=d, padding=d)
        out = out + p["bias"].astype(out.dtype)
        if i != len(params) - 1:  # layers[:-1] strips the final activation
            out = leaky_relu(out)
    return out


# ---------------------------------------------------------------------------
# DatasetGAN pixel classifier
# ---------------------------------------------------------------------------


def init_pixel_classifier(key, in_ch, n_class):
    """MLP widths keyed on n_class<32 (ref baseline/datasetgan/segmentor.py:12-36)."""
    widths = [in_ch, 128, 32, n_class] if n_class < 32 else [in_ch, 256, 128, n_class]
    keys = jax.random.split(key, len(widths) - 1)
    layers = [
        _torch_linear_init(k, cin, cout)
        for k, cin, cout in zip(keys, widths[:-1], widths[1:])
    ]
    state = [
        {"mean": jnp.zeros((w,)), "var": jnp.ones((w,)),
         "gamma": jnp.ones((w,)), "beta": jnp.zeros((w,))}
        for w in widths[1:-1]
    ]
    return layers, state


def pixel_classifier_from_first(params, state, v, eps=1e-5):
    """Eval-mode pixel classifier from AFTER the first Linear.

    ``v`` is x @ W1 + b1 (pre-ReLU), any leading shape. Lets the serving
    path fold the first Linear into the feature-level decomposition
    (``embed.project_feature_maps``) so the (B, H, W, Σc) concat tensor
    never materializes — a per-pixel Linear commutes with nearest
    upsampling. Matches ``pixel_classifier_apply(train=False)`` up to fp
    reassociation: eval-mode BN is a per-channel affine sitting between a
    ReLU and the next Linear, so it folds INTO that Linear's weights —
    (u·s + t) @ W + b == u @ (s[:,None]·W) + (t @ W + b). The folded form
    runs the whole tail in ``v.dtype`` as relu→dot→relu→dot: the f32
    affine passes over the (B, H, W, 32/128) hidden maps (the gamma
    multiply promoted the old chain to f32) never exist, and the weight
    folds are (C_in, C_out)-sized host math.
    """
    dt = v.dtype
    out = jnp.maximum(v, 0.0)
    for i in range(len(params) - 1):
        bn = state[i]
        s = bn["gamma"] * jax.lax.rsqrt(bn["var"] + eps)
        t = bn["beta"] - bn["mean"] * s
        p = params[i + 1]
        w = p["weight"] * s[:, None]
        b = p["bias"] + t @ p["weight"]
        out = out @ w.astype(dt) + b.astype(dt)
        if i + 1 < len(params) - 1:
            out = jnp.maximum(out, 0.0)
    return out


def pixel_classifier_apply(params, state, x, train=False, momentum=0.1, eps=1e-5):
    """x: (B, H, W, C) -> (logits (B, H, W, n_class), new_state)."""
    b, h, w, c = x.shape
    v = x.reshape(-1, c)
    new_state = []
    for i, p in enumerate(params[:-1]):
        v = v @ p["weight"].astype(v.dtype) + p["bias"].astype(v.dtype)
        v = jnp.maximum(v, 0.0)  # Linear -> ReLU -> BatchNorm1d (ref order)
        bn = state[i]
        if train:
            mu = v.mean(axis=0)
            var = v.var(axis=0)
            n = v.shape[0]
            unbiased = var * n / max(n - 1, 1)
            new_state.append(
                {
                    "mean": (1 - momentum) * bn["mean"] + momentum * mu,
                    "var": (1 - momentum) * bn["var"] + momentum * unbiased,
                    "gamma": bn["gamma"],
                    "beta": bn["beta"],
                }
            )
        else:
            mu, var = bn["mean"], bn["var"]
            new_state.append(bn)
        v = (v - mu) * jax.lax.rsqrt(var + eps) * bn["gamma"] + bn["beta"]
    p = params[-1]
    v = v @ p["weight"].astype(v.dtype) + p["bias"].astype(v.dtype)
    logits = v.reshape(b, h, w, -1)
    return logits, new_state
