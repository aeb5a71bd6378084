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
