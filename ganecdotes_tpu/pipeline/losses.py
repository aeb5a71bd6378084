"""Loss registry targets (TPU counterparts of configs/mapper.py:57-63).

Each is ``f(logits, target) -> scalar``, NHWC logits (B, H, W, C) with
integer target (B, H, W) for CE, matching torch's class-dim reductions.
"""

import jax
import jax.numpy as jnp
import optax


def cross_entropy(logits, target):
    """nn.CrossEntropyLoss (mean over pixels), NHWC logits, int targets."""
    c = logits.shape[-1]
    flat = logits.reshape(-1, c)
    tgt = target.reshape(-1).astype(jnp.int32)
    return optax.softmax_cross_entropy_with_integer_labels(flat, tgt).mean()


def bce_with_logits(logits, target):
    """nn.BCEWithLogitsLoss (targets same shape, float)."""
    t = target.astype(logits.dtype)
    return optax.sigmoid_binary_cross_entropy(logits, t).mean()


# the reference maps these names to plain activation modules (a quirk of its
# loss registry); kept callable for key parity
def softmax_loss(logits, target):
    del target
    return jax.nn.softmax(logits, axis=-1)


def sigmoid_loss(logits, target):
    del target
    return jax.nn.sigmoid(logits)


def tanh_loss(logits, target):
    del target
    return jnp.tanh(logits)


def log_softmax_loss(logits, target):
    del target
    return jax.nn.log_softmax(logits, axis=-1)
