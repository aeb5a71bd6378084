"""bench.py program-construction smoke tests.

The driver runs bench.py on real TPU hardware at the end of every round; a
silent breakage there costs the round's headline number. These tests trace
every bench program (jax.eval_shape — no compile, runs in seconds on CPU)
so API drift in the modules bench composes is caught by the fast suite.
"""

import jax
import jax.numpy as jnp
import pytest

import bench


@pytest.mark.parametrize(
    "method,size",
    [
        ("swav", 256),
        ("simclr", 256),
        ("hfc_kmeans", 256),
        ("repurposegan", 256),
        ("datasetgan", 256),
        pytest.param("swav_labels_only", 256, marks=pytest.mark.slow),
        pytest.param("swav512", 512, marks=pytest.mark.slow),
    ],
)
def test_bench_programs_trace(method, size):
    if method == "hfc_kmeans":
        pytest.skip(
            "build() runs a real jitted probe synthesis for the group "
            "shapes — covered by the slow pipeline e2e instead"
        )
    jfn, args = bench.build(2, jnp.bfloat16, method)
    out = jax.eval_shape(jfn, *args)
    leaves = jax.tree.leaves(out)
    assert leaves, "program produced no outputs"
    if method == "swav_labels_only":
        # mask-only serving mode: labels only, no image
        assert len(leaves) == 1
        assert leaves[0].shape == (2, size, size)
    else:
        # generate+segment must emit the image AND the labels (the honesty
        # correction in docs/PERFORMANCE.md) — a labels-only headline
        # program lets XLA DCE half the synthesis
        assert len(leaves) == 2
        img, labels = leaves
        assert img.shape == (2, size, size, 3)
        assert labels.shape == (2, size, size)


@pytest.fixture
def bench_state(tmp_path, monkeypatch):
    """Isolate bench's module-level round state (hints file, deadline
    clock, partial-payload store, relay budget) per test."""
    monkeypatch.setattr(bench, "_HINTS_PATH",
                        str(tmp_path / "bench_hints.json"))
    monkeypatch.setattr(bench, "_T0", bench.time.monotonic())
    monkeypatch.setattr(bench, "_DEADLINE_S", 1500.0)
    monkeypatch.setattr(bench, "_relay_spent", [0.0])
    monkeypatch.setitem(bench._STATE, "payload", None)
    monkeypatch.setitem(bench._STATE, "skipped", [])
    monkeypatch.setitem(bench._STATE, "emitted", False)
    monkeypatch.setitem(bench._STATE, "stage", "test")
    return bench


def _fake_sweep_env(monkeypatch, fake_times):
    calls = []

    def fake_build(b, dtype, method):
        def fn(x):
            return x

        calls.append(b)
        return fn, (jnp.zeros((b,)),)

    monkeypatch.setattr(bench, "build", fake_build)
    monkeypatch.setattr(
        bench, "timed",
        lambda jfn, args, iters=20: fake_times[args[0].shape[0]],
    )
    return calls


def test_bench_sweep_drops_nonbest_executables(bench_state, monkeypatch):
    """sweep() must free EVERY probe's buffers as it goes (HBM-pressure
    regression: retained probes skewed in-driver method sweeps low), and
    only rebuild the winner when keep_best is requested. The second sweep
    is seeded from the first's persisted best-batch hint (VERDICT r4
    task 1d) so it starts at the peak instead of re-running the ladder."""
    # throughputs: 32, 160, 107 img/s -> regression at 128; midpoint 96
    # probes at 137 img/s -> 64 stays the best batch
    fake_times = {32: 1.0, 64: 0.4, 128: 1.2, 96: 0.7}
    calls = _fake_sweep_env(monkeypatch, fake_times)

    best_b, (tput, jfn, args) = bench.sweep("swav")
    assert jfn is None and args is None  # nothing retained by default
    assert calls == [32, 64, 128, 96]
    assert bench._load_hints() == {"swav": 64}

    calls.clear()
    best_b2, (tput2, jfn2, args2) = bench.sweep("swav", keep_best=True)
    assert best_b == best_b2 == 64
    assert tput == tput2
    assert jfn2 is not None and args2 is not None
    # hint-seeded: start at 64, double to 128 (regresses), down-probe 32,
    # midpoint 96, then ONE rebuild of the winner
    assert calls == [64, 128, 32, 96, 64]


def test_sweep_headline_only_does_not_save_hint(bench_state, monkeypatch):
    calls = _fake_sweep_env(monkeypatch, {32: 1.0, 64: 0.4, 128: 1.2,
                                          96: 0.7})
    bench.sweep("swav", save_hint=False)
    assert bench._load_hints() == {}


def test_predict_over_limit_extrapolation():
    """Pre-compile memory gating (VERDICT r4 task 2): candidates whose
    extrapolated AOT memory exceeds HBM are skipped BEFORE their compile."""
    GiB = 1 << 30
    # no observations / no limit -> gating disabled
    assert bench._predict_over_limit(64, {}, 16 * GiB) is None
    assert bench._predict_over_limit(64, {32: GiB}, None) is None
    # one point: fully-linear scaling is an overestimate, so a 1.25x
    # margin is required before skipping
    assert bench._predict_over_limit(64, {32: 7 * GiB}, 16 * GiB) is None
    assert bench._predict_over_limit(128, {32: 7 * GiB}, 16 * GiB)
    # two points: linear fit (fixed 2 GiB + 0.125 GiB/img here)
    obs = {32: 6 * GiB, 64: 10 * GiB}
    assert bench._predict_over_limit(96, obs, 16 * GiB) is None  # 14 GiB
    est = bench._predict_over_limit(128, obs, 16 * GiB)  # 18 GiB > 16
    assert est and est > 16 * GiB


def test_sweep_skips_extrapolated_oom_batches(bench_state, monkeypatch,
                                              capsys):
    """A batch whose extrapolated memory exceeds HBM is skipped with the
    'AOT' log line instead of paying for a doomed compile (the r04 tail)."""
    GiB = 1 << 30
    fake_times = {32: 1.0, 64: 0.4, 96: 0.7}
    calls = _fake_sweep_env(monkeypatch, fake_times)
    mem = {32: 6 * GiB, 64: 10 * GiB}

    orig_timed = bench.timed

    def timed_with_mem(jfn, args, iters=20):
        b = args[0].shape[0]
        bench._LAST_MEM[0] = mem.get(b)
        return fake_times[b]

    monkeypatch.setattr(bench, "timed", timed_with_mem)
    monkeypatch.setattr(bench, "_hbm_limit_bytes", lambda: 16 * GiB)

    best_b, (tput, _, _) = bench.sweep("swav")
    # 128 extrapolates to ~18 GiB > 16 GiB -> skipped without a build
    assert 128 not in calls
    assert best_b == 64
    assert "skipped (AOT extrapolation" in capsys.readouterr().err


def test_stage_gate_skips_past_deadline(bench_state, monkeypatch):
    monkeypatch.setattr(bench, "_DEADLINE_S", 100.0)
    assert bench._gate("early")  # 0s elapsed
    monkeypatch.setattr(bench, "_T0", bench.time.monotonic() - 90)
    assert not bench._gate("late")  # past 80% of 100s
    assert bench._STATE["skipped"] == ["late"]


def test_await_relay_budget_is_cumulative(bench_state, monkeypatch, capsys):
    """await_relay draws from ONE pool across the run — r04 could burn
    240 s per failed stage, which alone blows any driver timeout."""
    sleeps = []
    monkeypatch.setattr(bench, "_RELAY_BUDGET_S", 30.0)

    calls = [0]

    def failing_jit(fn):
        def runner(x):
            calls[0] += 1
            raise RuntimeError("relay down")

        return runner

    monkeypatch.setattr(bench.jax, "jit", failing_jit)
    monkeypatch.setattr(bench.time, "sleep", lambda s: sleeps.append(s))

    t = {"now": 0.0}
    monkeypatch.setattr(bench.time, "monotonic",
                        lambda: t.__setitem__("now", t["now"] + 10)
                        or t["now"])
    assert bench.await_relay(timeout_s=240, interval_s=10) is False
    spent_after_first = bench._relay_spent[0]
    assert spent_after_first >= 30.0  # pool drained
    # second call: budget exhausted, returns immediately without dispatch
    calls[0] = 0
    assert bench.await_relay(timeout_s=240) is False
    assert calls[0] == 0
    assert "budget exhausted" in capsys.readouterr().err


def test_emit_partial_payload(bench_state, capsys):
    """_emit prints the published partial payload once, with skipped
    stages and the partial note — the line the driver parses when the
    run dies early (VERDICT r4 task 1b)."""
    import json

    extra = {"mfu": 0.63}
    payload = {"metric": bench.METRIC, "value": 1100.0,
               "unit": "img/s/chip", "vs_baseline": None, "extra": extra}
    bench._publish(payload)
    bench._record(extra, "finetune_s", 17.0)
    bench._STATE["skipped"].append("datasetgan_img_per_s")
    bench._STATE["stdout"] = __import__("sys").stdout
    bench._emit(note="deadline")
    bench._emit(note="second call must not double-print")
    out = capsys.readouterr().out.strip().splitlines()
    assert len(out) == 1
    rec = json.loads(out[0])
    assert rec["value"] == 1100.0
    assert rec["extra"]["finetune_s"] == 17.0
    assert rec["extra"]["skipped"] == ["datasetgan_img_per_s"]
    assert rec["extra"]["partial"] == "deadline"


def test_deadline_watchdog_emits_json_subprocess(tmp_path):
    """End-to-end deadline drill (VERDICT r4 task 1 'done' criterion):
    bench run with a tiny BENCH_DEADLINE_S against a stuck stage must
    still print one parseable JSON line and exit cleanly."""
    import json
    import os
    import subprocess
    import sys

    repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    script = r"""
import os, sys, time
os.environ["JAX_PLATFORMS"] = "cpu"
sys.path[:] = [p for p in sys.path if ".axon_site" not in p]
import jax
jax.config.update("jax_platforms", "cpu")
import bench

def stuck_sweep(*a, **k):
    time.sleep(300)

bench.sweep = stuck_sweep
bench._arm_guards()
bench.main()
"""
    env = dict(os.environ)
    env["BENCH_DEADLINE_S"] = "5"
    env["JAX_PLATFORMS"] = "cpu"
    env["PYTHONPATH"] = os.pathsep.join(
        [repo] + [p for p in env.get("PYTHONPATH", "").split(os.pathsep)
                  if p and ".axon_site" not in p]
    )
    proc = subprocess.run(
        [sys.executable, "-c", script], env=env, cwd=repo,
        capture_output=True, text=True, timeout=240,
    )
    assert proc.returncode == 0, proc.stderr[-2000:]
    lines = [ln for ln in proc.stdout.strip().splitlines() if ln]
    assert len(lines) == 1, proc.stdout
    rec = json.loads(lines[0])
    assert rec["metric"] == bench.METRIC
    assert rec["unit"] == "img/s/chip"
    # nothing measured before the deadline -> value null but parseable,
    # with the partial marker set
    assert rec["value"] is None
    assert rec["extra"]["partial"] == "deadline"


@pytest.mark.slow
def test_pretrain_steps_per_s_paths_run_tiny():
    """The SSL-pretrain bench path (chained fori threading params/opt state
    through the carry) builds and runs for both methods and for the
    sample_batch variant — tiny shapes so the TPU bench can't crash on a
    code-path error after a long relay wait."""
    import bench

    small = dict(num_patches=2, patch_size=64, nprototypes=32, nclasses=16)
    sps = bench.pretrain_steps_per_s("swav", iters=2, size=32,
                                     overrides=small)
    assert sps > 0
    sps = bench.pretrain_steps_per_s("swav", iters=2, size=32,
                                     overrides=small, sample_batch=2)
    assert sps > 0
    sps = bench.pretrain_steps_per_s(
        "simclr", iters=2, size=32,
        overrides=dict(batch_size=4, patch_size=64, nclasses=16),
    )
    assert sps > 0


@pytest.mark.slow
def test_baggan_step_stats_runs_tiny():
    """The GAN-training bench extra builds and runs at a tiny shape — same
    code path as the TPU measurement (256² batch 16), so a drift in the
    d/g step signatures can't crash the driver bench after its sweep."""
    stats = bench.baggan_step_stats(iters=2, size=16, batch=2, mlp_layers=1)
    assert stats["baggan_img_per_s"] > 0
    assert stats["baggan_d_ms"] > 0 and stats["baggan_g_ms"] > 0
    stats = bench.baggan_step_stats(
        iters=2, size=16, batch=2, mlp_layers=1,
        compute_dtype="bfloat16", key_prefix="baggan_bf16",
    )
    assert stats["baggan_bf16_img_per_s"] > 0


def test_headline_only_mode(capsys, monkeypatch):
    """--headline quick A/B mode prints one JSON line with the impl flags."""
    import json

    def fake_build(b, dtype, method="swav"):
        p = jnp.ones((4, 4))
        return jax.jit(lambda p, lat: (p @ p, lat.sum())), (p, jnp.ones((b, 2)))

    monkeypatch.setattr(bench, "build", fake_build)
    monkeypatch.setattr(bench, "timed",
                        lambda jfn, args, iters=20: 0.5 / args[-1].shape[0])
    monkeypatch.setattr(bench, "flops_of", lambda jfn, args: 1e9)
    monkeypatch.setenv("GANECDOTES_UP_CONV_IMPL", "subpixel")
    bench.headline_only()
    line = capsys.readouterr().out.strip().splitlines()[-1]
    rec = json.loads(line)
    assert rec["unit"] == "img/s/chip" and rec["value"] > 0
    assert rec["up_conv_impl"] == "subpixel"
    assert rec["styled_conv_impl"] == "xla"


def test_main_emits_exactly_one_json_line(bench_state, capsys, monkeypatch):
    """Stages that write to stdout (the BagGAN reference-parity logger
    does) must not break the driver's one-JSON-line contract: main()
    runs everything under redirect_stdout(stderr) and prints only the
    payload to the real stdout."""
    import json

    def fake_run_all():
        print("logger noise that must land on stderr")
        return {"metric": "m", "value": 1.0, "unit": "img/s/chip",
                "vs_baseline": 2.0, "extra": {}}

    monkeypatch.setattr(bench, "_run_all", fake_run_all)
    bench.main()
    cap = capsys.readouterr()
    lines = [ln for ln in cap.out.strip().splitlines() if ln]
    assert len(lines) == 1, cap.out
    assert json.loads(lines[0])["value"] == 1.0
    assert "logger noise" in cap.err


def test_baggan_g_chain_keeps_backward_live():
    """Regression guard for the round-4 timing-harness bug: a chain that
    returns only the loss (value_and_grad's primal) lets XLA DCE the whole
    parameter backward + optimizer update, so the timed program measures
    forward-only cost. The shipped G chain must carry materially more
    FLOPs than the loss-only oracle (backward ≈ 2x forward for convnets).
    Tiny 16p shapes; pure compile + cost analysis, no training."""
    import types

    import numpy as np

    from ganecdotes_tpu.gan.train import BagGANHQ

    cfg = types.SimpleNamespace(
        compute_dtype=None, out_dir="/tmp/ganb_dce",
        checkpoint_dir="/tmp/ganb_dce/ckpt",
        is_train=True, image_size=16, latent_dim=32, num_channels=3,
        batch_size=2, gan_mode="vanilla", use_ppl=False, r1_lambda=10,
        ppl_lambda=2, path_batch_shrink=1, ppl_decay=0.01, d_reg_every=4,
        g_reg_every=4, mixing_prob=0.0, chl_multiplier=1,
        g_reg_ratio=4 / 5, d_reg_ratio=16 / 17, augment=False,
        augment_p=0, ada_target=0.6, ada_length=100, lr=0.002, beta1=0.0,
        lr_policy="linear",
        lr_params=dict(epoch_count=1, n_epochs=2, n_epochs_decay=2),
        generator_params=dict(mlp_layers=1),
        losses_to_print=["g_gan", "d"],
        start_epoch=1, continue_train=False, load_net=False,
    )
    gan = BagGANHQ(cfg)
    gan.setup_gan()
    real = jnp.asarray(
        np.random.RandomState(0).rand(2, 16, 16, 3).astype(np.float32)
        * 2 - 1
    )
    z = jax.random.normal(jax.random.PRNGKey(0), (2, 32))
    key = jax.random.PRNGKey(1)
    inj = jnp.asarray(0)
    chains = bench.baggan_chains(gan, z, key, inj)

    def flops(fn):
        ca = jax.jit(fn).lower(real).compile().cost_analysis()
        if isinstance(ca, (list, tuple)):
            ca = ca[0]
        return float(ca["flops"])

    f_full = flops(chains["g"])
    f_fwd = flops(chains["g_loss_only"])
    assert f_full > 1.5 * f_fwd, (
        f"G chain FLOPs {f_full:.3g} vs forward-only {f_fwd:.3g} — "
        "the generator backward has been DCE'd out of the timed program"
    )
    # the D chain keeps its updated params too
    f_d = flops(chains["d"])
    assert f_d > 1.5 * f_fwd
