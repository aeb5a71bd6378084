"""Supervised one-shot fine-tune — the whole loop as one jitted scan.

Counterpart of the reference's python-level epoch loop
(src/one_shot_pipeline.py:466-581): Adam over the segmentor head, normalized
weighted loss list, per-epoch LR schedule, logits/labels resized to
image_size. The reference re-enters python per epoch; here ``num_epochs``
optimizer steps compile into a single lax.scan, so the 200-epoch ffhq
fine-tune is one device program (the <60 s north-star budget collapses to
milliseconds of device time).
"""

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
    num_epochs=200,
    chunk=None,
):
    """Build (init_opt, run_chunk) for the fine-tune loop.

    apply_fn(params, features) -> logits NHWC.
    loss_terms: [(alpha, loss_fn)] with normalized alphas (ref :274-292).
    lr_sched: f(epoch)->multiplier (mapper lr_scheduler semantics).
    run_chunk(params, opt_state, features, label, start_epoch, n) runs n
    epochs inside one scan and returns (params, opt_state, last_loss).
    """
    sched = lr_sched if lr_sched is not None else (lambda e: 1.0)

    def lr_fn(step):
        return lr * sched(step)

    optimizer = optax.adam(learning_rate=lr_fn, b1=betas[0], b2=betas[1])

    def loss_of(params, features, label):
        out = apply_fn(params, features)
        out = resize_bilinear(out, image_size)
        lbl = resize_nearest(
            label[..., None].astype(jnp.float32), image_size
        )[..., 0].astype(jnp.int32)
        total = 0.0
        for alpha, lf in loss_terms:
            total = total + alpha * lf(out, lbl)
        return total

    def one_epoch(carry, _):
        params, opt_state, features, label = carry
        loss, grads = jax.value_and_grad(loss_of)(params, features, label)
        updates, opt_state = optimizer.update(grads, opt_state, params)
        params = optax.apply_updates(params, updates)
        return (params, opt_state, features, label), loss

    @jax.jit
    def run_chunk(params, opt_state, features, label):
        (params, opt_state, _, _), losses = jax.lax.scan(
            one_epoch,
            (params, opt_state, features, label),
            None,
            length=chunk or num_epochs,
        )
        return params, opt_state, losses[-1]

    return optimizer, run_chunk
