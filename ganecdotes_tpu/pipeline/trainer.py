"""Supervised one-shot fine-tune — the whole loop as one jitted scan.

Counterpart of the reference's python-level epoch loop
(src/one_shot_pipeline.py:466-581): Adam over the segmentor head, normalized
weighted loss list, per-epoch LR schedule, logits/labels resized to
image_size. The reference re-enters python per epoch; here the epochs compile
into lax.scan chunks, so the 200-epoch ffhq fine-tune is a handful of device
programs (the <60 s north-star budget collapses to milliseconds of device
time).
"""

import functools

import jax
import jax.numpy as jnp
import optax

from ganecdotes_tpu.ops.interp import resize_bilinear, resize_nearest


def make_supervised_finetune(
    apply_fn,
    loss_terms,
    image_size,
    lr,
    betas=(0.9, 0.99),
    lr_sched=None,
    stateful_sched=False,
):
    """Build (optimizer, run_chunk) for the fine-tune loop.

    apply_fn(params, state, features) -> (logits NHWC, new_state); heads
    without mutable state (the dilated FCNs) pass state through unchanged,
    the datasetgan MLP threads its BatchNorm running stats.
    loss_terms: [(alpha, loss_fn)] with normalized alphas (ref :274-292).
    lr_sched: f(epoch)->multiplier (mapper lr_scheduler semantics). When
    ``stateful_sched`` (torch ReduceLROnPlateau semantics) the optimizer is
    built with injected hyperparams so the host can set
    ``opt_state.hyperparams['learning_rate']`` between chunks.
    run_chunk(params, opt_state, state, features, label, start, length) runs
    ``length`` epochs in one scan -> (params, opt_state, state, last_loss).
    """
    if stateful_sched:
        optimizer = optax.inject_hyperparams(optax.adam)(
            learning_rate=lr, b1=betas[0], b2=betas[1]
        )
    else:
        sched = lr_sched if lr_sched is not None else (lambda e: 1.0)
        optimizer = optax.adam(
            learning_rate=lambda step: lr * sched(step),
            b1=betas[0], b2=betas[1],
        )

    def loss_of(params, state, features, label):
        out, new_state = apply_fn(params, state, features)
        out = resize_bilinear(out, image_size)
        lbl = resize_nearest(
            label[..., None].astype(jnp.float32), image_size
        )[..., 0].astype(jnp.int32)
        total = 0.0
        for alpha, lf in loss_terms:
            total = total + alpha * lf(out, lbl)
        return total, new_state

    def one_epoch(carry, _):
        params, opt_state, state, features, label = carry
        (loss, state), grads = jax.value_and_grad(loss_of, has_aux=True)(
            params, state, features, label
        )
        updates, opt_state = optimizer.update(grads, opt_state, params)
        params = optax.apply_updates(params, updates)
        return (params, opt_state, state, features, label), loss

    @functools.partial(jax.jit, static_argnums=(6,))
    def run_chunk(params, opt_state, state, features, label, start, length):
        del start  # epoch counting lives in opt_state's step counter
        (params, opt_state, state, _, _), losses = jax.lax.scan(
            one_epoch,
            (params, opt_state, state, features, label),
            None,
            length=length,
        )
        return params, opt_state, state, losses[-1]

    return optimizer, run_chunk
