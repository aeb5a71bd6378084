"""Checkpoint IO: .npz pytree roundtrip + orbax multi-chip backend.

The reference persists torch state_dicts / whole modules
(base_model.py:153-223, swav_clustering.py:503-505); the TPU build uses
path-keyed .npz for portable single-file checkpoints and orbax for sharded
multi-host ones (SURVEY.md §5 checkpoint/resume).
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from ganecdotes_tpu.utils.serialization import (
    load_pytree,
    save_pytree,
)


def _tree():
    return {
        "style": [
            {"weight": jnp.arange(6.0).reshape(2, 3), "bias": jnp.ones((3,))}
            for _ in range(2)
        ],
        "meta_like": {"empty_tuple_holder": (jnp.zeros((1,)),)},
        "bf16": jnp.asarray([1.5, -2.25], dtype=jnp.bfloat16),
        "scalar": jnp.asarray(3.0),
    }


def _assert_tree_equal(got, want):
    jax.tree.map(
        lambda g, w: np.testing.assert_array_equal(
            np.asarray(g, dtype=np.float32), np.asarray(w, dtype=np.float32)
        ),
        got,
        want,
    )


def test_npz_roundtrip(tmp_path):
    tree = _tree()
    fp = str(tmp_path / "ckpt.npz")
    save_pytree(fp, tree)
    out = load_pytree(fp)
    _assert_tree_equal(out, tree)
    # structure preserved: list stays list, tuple stays tuple, bf16 dtype kept
    assert isinstance(out["style"], list)
    assert isinstance(out["meta_like"]["empty_tuple_holder"], tuple)
    assert out["bf16"].dtype == jnp.bfloat16


def test_orbax_roundtrip(tmp_path):
    pytest.importorskip("orbax.checkpoint")
    from ganecdotes_tpu.utils.serialization import (
        load_pytree_orbax,
        save_pytree_orbax,
    )

    tree = {
        "w": jnp.arange(12.0).reshape(3, 4),
        "nested": {"b": jnp.ones((5,), dtype=jnp.bfloat16)},
    }
    path = str(tmp_path / "orbax_ckpt")
    save_pytree_orbax(path, tree)
    out = load_pytree_orbax(path)
    _assert_tree_equal(out, tree)
    assert out["nested"]["b"].dtype == jnp.bfloat16


def test_orbax_restore_with_target_sharding(tmp_path):
    """A checkpoint restores onto an explicit mesh sharding (the multi-chip
    resume path: save from one topology, restore onto another)."""
    pytest.importorskip("orbax.checkpoint")
    from jax.sharding import NamedSharding, PartitionSpec as P

    from ganecdotes_tpu.parallel.mesh import make_mesh
    from ganecdotes_tpu.utils.serialization import (
        load_pytree_orbax,
        save_pytree_orbax,
    )

    mesh = make_mesh(8)
    tree = {"w": jnp.arange(32.0).reshape(8, 4)}
    path = str(tmp_path / "orbax_sharded")
    save_pytree_orbax(path, tree)

    like = {
        "w": jax.ShapeDtypeStruct(
            (8, 4), jnp.float32, sharding=NamedSharding(mesh, P("data", None))
        )
    }
    out = load_pytree_orbax(path, like=like)
    assert out["w"].sharding.spec == P("data", None)
    np.testing.assert_array_equal(np.asarray(out["w"]), np.asarray(tree["w"]))
