"""Multi-chip SPMD validation on the virtual 8-device CPU mesh (SURVEY.md §4):
data-parallel inference parity, psum'd ADA statistics, and the full
dryrun_multichip training step."""

import os
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


@pytest.mark.slow
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


@pytest.mark.slow
def test_swav_pretrain_data_parallel_mesh(tmp_path):
    """swav_args['data_parallel']=True shards the real SwAVClustering
    training step over the 8-device mesh (key axis sharded, params
    replicated, grad psum inserted by XLA) — multi-chip SSL pretraining as
    the pipeline's own code path, per SURVEY §2(b)."""
    import os

    from ganecdotes_tpu.models.stylegan2.generator import Generator
    from ganecdotes_tpu.selfsup.swav import SwAVClustering

    class _MC:
        truncation = 0.7
        latent_dim = 512
        image_size = 32
        num_latents_for_mean = 8

    g = Generator(size=32, key=jax.random.PRNGKey(0))
    swav = SwAVClustering(
        model=g, model_config=_MC(),
        perturb_args=dict(truncation=0.7, n_layers=2, n_samples=1,
                          layer_no=None, perturb_std=[1.0, 1.0]),
        swav_args=dict(num_epochs=2, num_samples=1, num_patches=1,
                       sampling_method='random', patch_size=32,
                       hf_interp='nearest', warmup_epochs=1,
                       start_warmup=0.01, use_scheduler=False, base_lr=0.01,
                       final_lr=0.0001, trust_coeff=0.01,
                       freeze_prototype_niters=1,
                       train_args=dict(lr=0.01, momentum=0.9),
                       projn_nw='linear', temperature=0.1, nprototypes=8,
                       nclasses=8, hlen=3584, add_local_loss=False,
                       epoch_print_freq=1, data_parallel=True),
        sinkhorn_args=dict(source_pdf='uniform', niters=2, eps=0.05),
        out_dir=str(tmp_path),
    )
    assert jax.device_count() == 8
    swav.pretrain()
    assert swav.ssl_params is not None
    assert os.path.exists(swav.params_file)
    # params remain replicated and finite after sharded updates
    w = np.asarray(swav.ssl_params["prototype"]["weight"])
    assert np.isfinite(w).all()


def test_swav_batch_step_matches_single_sample():
    """make_swav_train_step(sample_batch=1) reproduces the single-sample
    step bit-for-bit given the same key (the vmap'd restructure is exact)."""
    from ganecdotes_tpu.models.stylegan2.generator import init_generator
    from ganecdotes_tpu.selfsup.swav import (
        init_swav_params,
        make_swav_train_step,
    )

    key = jax.random.PRNGKey(0)
    kg, ks, kstep = jax.random.split(key, 3)
    gen_params, meta = init_generator(kg, 16)
    hlen = 1024
    ssl = init_swav_params(ks, hlen, 8, 16, "linear")

    mc = {"truncation": 0.7, "latent_dim": 512}
    pa = dict(truncation=0.7, n_layers=2, n_samples=1, layer_no=None,
              perturb_std=[1.0, 1.0])
    sa = dict(num_epochs=1, num_samples=1, num_patches=1, patch_size=16,
              hf_interp='nearest', warmup_epochs=1, start_warmup=0.01,
              use_scheduler=False, base_lr=0.01, final_lr=0.0001,
              trust_coeff=0.01, train_args=dict(lr=0.01, momentum=0.9),
              projn_nw='linear', temperature=0.1, nprototypes=16,
              nclasses=8, hlen=hlen, add_local_loss=False)
    sk = dict(source_pdf='uniform', niters=2, eps=0.05)
    mean_w = jnp.zeros((1, 512))

    opt1, step1 = make_swav_train_step(meta, mc, pa, sa, sk, mean_w, (16, 16))
    optb, stepb = make_swav_train_step(meta, mc, pa, sa, sk, mean_w, (16, 16),
                                       sample_batch=1)

    p1, o1, l1 = step1(gen_params, ssl, opt1.init(ssl), kstep, 0)
    pb, ob, lb = stepb(gen_params, ssl, optb.init(ssl), kstep[None], 0)

    np.testing.assert_allclose(float(l1), float(lb), rtol=1e-6)
    jax.tree.map(
        lambda a, b: np.testing.assert_allclose(
            np.asarray(a), np.asarray(b), rtol=1e-5, atol=1e-6
        ),
        p1, pb,
    )


@pytest.mark.slow
def test_distributed_init_two_process_psum(tmp_path):
    """Multi-host path exercised for real: 2 subprocesses, each 4 forced CPU
    devices, joined through distributed_init into ONE 8-device global mesh,
    running a psum across the process boundary (the DCN dimension of
    SURVEY §5's distributed backend).

    Each worker asserts the global device/process counts and that the psum
    result equals the sum over BOTH processes' shards — a process silently
    running single-host would see half the device count or half the sum.
    """
    import subprocess
    import sys
    import textwrap

    worker = textwrap.dedent(
        """
        import os, sys
        sys.path[:] = [p for p in sys.path if ".axon_site" not in p]
        os.environ["PYTHONPATH"] = os.pathsep.join(
            p for p in os.environ.get("PYTHONPATH", "").split(os.pathsep)
            if p and ".axon_site" not in p)
        os.environ["JAX_PLATFORMS"] = "cpu"
        os.environ["XLA_FLAGS"] = (
            "--xla_force_host_platform_device_count=4")
        sys.path.insert(0, {repo!r})

        pid = int(sys.argv[1])
        from ganecdotes_tpu.parallel.mesh import (
            distributed_init, make_mesh, shard_batch)
        ok = distributed_init(coordinator_address="localhost:{port}",
                              num_processes=2, process_id=pid)
        assert ok, "distributed_init returned False under a coordinator"

        import jax, numpy as np
        import jax.numpy as jnp
        from jax.sharding import NamedSharding, PartitionSpec as P

        assert jax.process_count() == 2, jax.process_count()
        assert len(jax.devices()) == 8, len(jax.devices())

        mesh = make_mesh(8)
        # global batch 0..7 split over the mesh; every process materializes
        # only its addressable half
        sharding = NamedSharding(mesh, P("data"))
        flat = list(mesh.devices.flat)
        arrs = [
            jax.device_put(
                np.asarray([float(flat.index(d))], np.float32), d
            )
            for d in mesh.local_devices
        ]
        x = jax.make_array_from_single_device_arrays(
            (8,), sharding, arrs)

        @jax.jit
        def total(v):
            return jnp.sum(v)  # all-reduce over BOTH processes' shards

        got = float(total(x))
        assert got == 28.0, got  # sum(0..7) spans the process boundary
        print(f"proc {{pid}} OK", flush=True)
        """
    ).format(repo=os.getcwd(), port=29511)

    script = tmp_path / "worker.py"
    script.write_text(worker)
    procs = [
        subprocess.Popen(
            [sys.executable, str(script), str(pid)],
            stdout=subprocess.PIPE, stderr=subprocess.STDOUT, text=True,
        )
        for pid in (0, 1)
    ]
    outs = []
    for p in procs:
        out, _ = p.communicate(timeout=300)
        outs.append(out)
    for pid, (p, out) in enumerate(zip(procs, outs)):
        assert p.returncode == 0, f"worker {pid} failed:\n{out}"
        assert f"proc {pid} OK" in out
