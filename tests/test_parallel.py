"""Multi-chip SPMD validation on the virtual 8-device CPU mesh (SURVEY.md §4):
data-parallel inference parity, psum'd ADA statistics, and the full
dryrun_multichip training step."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from ganecdotes_tpu.parallel.mesh import (
    data_parallel_infer,
    make_mesh,
    replicate,
    shard_batch,
)

pytestmark = pytest.mark.skipif(
    len(jax.devices()) < 8, reason="needs the 8-device CPU mesh"
)


def test_make_mesh_rejects_oversubscription():
    with pytest.raises(ValueError):
        make_mesh(len(jax.devices()) + 1)


def test_data_parallel_infer_matches_single_device():
    mesh = make_mesh(8)
    params = {"w": jnp.asarray(np.random.RandomState(0).randn(16, 4),
                               dtype=jnp.float32)}
    x = jnp.asarray(np.random.RandomState(1).randn(24, 16), jnp.float32)

    def fn(p, v):
        return jnp.tanh(v @ p["w"])

    got = data_parallel_infer(mesh, fn, params, x)
    want = fn(params, x)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want), atol=1e-6)


def test_ada_update_psum_matches_global():
    """Sharded controller with psum == unsharded controller on the full
    batch (the TPU-native form of the reference's all_reduce, ada.py:15-25)."""
    from jax.sharding import PartitionSpec as P
    from jax import shard_map

    from ganecdotes_tpu.gan.ada import ada_init_state, ada_update

    mesh = make_mesh(8)
    preds = jnp.asarray(
        np.random.RandomState(2).randn(32), jnp.float32
    )

    # global (single-device) reference
    st_ref = ada_init_state()
    for _ in range(8):
        st_ref = ada_update(st_ref, preds, 0.6, 64, update_every=8)

    # sharded: each replica sees 4 predictions, statistics psum-reduced
    def sharded_updates(state, preds):
        def body(st, p):
            for _ in range(8):
                st = ada_update(st, p, 0.6, 64, update_every=8,
                                axis_name="data")
            return st

        return shard_map(
            body, mesh=mesh,
            in_specs=(P(), P("data")), out_specs=P(),
            check_vma=False,
        )(state, preds)

    st = sharded_updates(ada_init_state(), preds)
    assert abs(float(st["p"]) - float(st_ref["p"])) < 1e-6
    assert abs(float(st["r_t"]) - float(st_ref["r_t"])) < 1e-6


def test_shard_batch_and_replicate_shardings():
    mesh = make_mesh(8)
    x = shard_batch(mesh, jnp.zeros((16, 4)))
    assert x.sharding.spec == jax.sharding.PartitionSpec("data")
    p = replicate(mesh, {"w": jnp.zeros((3,))})
    assert p["w"].sharding.spec == jax.sharding.PartitionSpec()


def test_dryrun_multichip_full_training_step():
    import __graft_entry__ as ge

    ge.dryrun_multichip(8)


def test_distributed_init_single_process_noop():
    """In a fresh process with no coordinator configured, distributed_init
    returns False (single-process run). In a process whose XLA backend is
    already initialized it must raise loudly — returning False there would
    let a 'multi-host' job run as unsynchronized single hosts (the bug an
    earlier guard-on-process_count() version had)."""
    import subprocess
    import sys

    from ganecdotes_tpu.parallel.mesh import distributed_init

    # backend is initialized in the test process (jax.devices() ran) -> raise
    with pytest.raises(RuntimeError, match="first JAX call"):
        distributed_init()

    # fresh subprocess, no backend touched -> clean False
    code = (
        "import sys;"
        "sys.path[:] = [p for p in sys.path if '.axon_site' not in p];"
        "import os; os.environ['JAX_PLATFORMS']='cpu';"
        "import jax; jax.config.update('jax_platforms','cpu');"
        "from ganecdotes_tpu.parallel.mesh import distributed_init;"
        "assert distributed_init() is False;"
        "print('fresh-ok')"
    )
    out = subprocess.run(
        [sys.executable, "-c", code], capture_output=True, text=True,
        timeout=120,
    )
    assert "fresh-ok" in out.stdout, out.stderr[-500:]
