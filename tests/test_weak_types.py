"""No param factory may produce WEAK-typed leaves.

A weak-typed leaf (python-scalar-born: ``jnp.full(shape, 1.0)``,
``jnp.asarray(0.0)``, a raw float in an optimizer state) changes the jit
signature the first time a computed (strong-typed) tree is passed back in,
which silently RETRACES + RECOMPILES every program that takes the tree —
one full duplicate compile of every train/infer program per process,
measured at minutes on the real TPU (see gan/train.py, nn/layers.py).
This test pins every public init factory to strong-typed output.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest


def _weak_leaves(tree, where):
    bad = []
    for path, leaf in jax.tree_util.tree_flatten_with_path(tree)[0]:
        if isinstance(leaf, jax.Array) and jax.typeof(leaf).weak_type:
            bad.append(f"{where}{jax.tree_util.keystr(path)}")
    return bad


def test_no_weak_typed_param_leaves():
    from ganecdotes_tpu.gan.ada import ada_init_state
    from ganecdotes_tpu.models.stylegan2.discriminator import (
        init_discriminator,
        init_discriminator_q,
    )
    from ganecdotes_tpu.models.stylegan2.generator import init_generator
    from ganecdotes_tpu.selfsup.heads import (
        init_one_shot_segmentor,
        init_pixel_classifier,
    )
    from ganecdotes_tpu.selfsup.simclr import init_simclr_params
    from ganecdotes_tpu.selfsup.swav import init_swav_params

    key = jax.random.PRNGKey(0)
    trees = {
        "generator": init_generator(key, 16, style_dim=32, n_mlp=1)[0],
        "discriminator": init_discriminator(key, 16)[0],
        "discriminator_q": init_discriminator_q(
            key, 16, q_layers=1, n_cat_c=1, n_classes=3, n_cont_c=1
        )[0],
        "segmentor_xxs": init_one_shot_segmentor(key, 24, 4, size="XXS"),
        "segmentor_s": init_one_shot_segmentor(key, 24, 4, size="S"),
        "pixel_classifier": init_pixel_classifier(key, 24, 4),
        "swav": init_swav_params(key, 24, 4, 16),
        "swav_2layer": init_swav_params(key, 24, 4, 16, projn_nw="2-layer"),
        "simclr": init_simclr_params(key, 24, 4),
        "ada_state": ada_init_state(),
    }
    bad = []
    for name, tree in trees.items():
        bad += _weak_leaves(tree, name)
    assert not bad, f"weak-typed leaves (will retrace every program): {bad}"


def test_plateau_finetune_lr_update_does_not_retrace():
    """The fine-tune loop's plateau (stateful) scheduler writes
    opt_state.hyperparams['learning_rate'] between scan chunks; the write
    must keep the strong f32 aval inject_hyperparams stored, or the next
    chunk retraces + recompiles the whole multi-epoch scan program (cf.
    one_shot_pipeline.py fine-tune block, gan/train.py LR update)."""
    from ganecdotes_tpu.pipeline.schedulers import plateau_lr
    from ganecdotes_tpu.pipeline.trainer import make_supervised_finetune

    def apply_fn(params, state, features):
        return features @ params["w"], state

    def ce(out, lbl):
        return jnp.mean((out - lbl[..., None].astype(jnp.float32)) ** 2)

    optimizer, run_chunk = make_supervised_finetune(
        apply_fn, [(1.0, ce)], 8, lr=1e-2, stateful_sched=True
    )
    params = {"w": jnp.zeros((2, 2), jnp.float32)}
    opt_state = optimizer.init(params)
    features = jnp.ones((1, 8, 8, 2), jnp.float32)
    label = jnp.zeros((1, 8, 8), jnp.int32)
    sched = plateau_lr(patience=0, factor=0.5)

    for _ in range(3):
        params, opt_state, _st, loss = run_chunk(
            params, opt_state, (), features, label, 0, 2
        )
        mult = sched.step(float(loss))
        # the production write (one_shot_pipeline.py): must stay strong f32
        opt_state.hyperparams["learning_rate"] = jnp.asarray(
            1e-2 * mult, jnp.float32
        )
    assert run_chunk._cache_size() == 1, run_chunk._cache_size()


def test_step_outputs_keep_param_avals():
    """The round-trip guarantee the factories exist for: feeding a
    factory tree through one optimizer update must not change any leaf
    aval (shape, dtype, weak_type)."""
    import optax

    from ganecdotes_tpu.selfsup.heads import init_one_shot_segmentor

    params = init_one_shot_segmentor(jax.random.PRNGKey(0), 8, 3, size="XXS")
    opt = optax.adam(1e-3)
    st = opt.init(params)
    grads = jax.tree.map(jnp.ones_like, params)
    updates, st = opt.update(grads, st, params)
    new = optax.apply_updates(params, updates)
    for (pa, a), (pb, b) in zip(
        jax.tree_util.tree_flatten_with_path(params)[0],
        jax.tree_util.tree_flatten_with_path(new)[0],
    ):
        assert jax.typeof(a) == jax.typeof(b), (
            jax.tree_util.keystr(pa), jax.typeof(a),
            jax.typeof(b),
        )
