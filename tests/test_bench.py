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


def test_bench_sweep_drops_nonbest_executables():
    """sweep() must free EVERY probe's buffers as it goes (HBM-pressure
    regression: retained probes skewed in-driver method sweeps low), and
    only rebuild the winner when keep_best is requested."""
    calls = []

    def fake_build(b, dtype, method):
        def fn(x):
            return x

        calls.append(b)
        return fn, (jnp.zeros((b,)),)

    # throughputs: 32, 160, 107 img/s -> regression at 128; midpoint 96
    # probes at 137 img/s -> 64 stays the best batch
    fake_times = {32: 1.0, 64: 0.4, 128: 1.2, 96: 0.7}

    orig_build, orig_timed = bench.build, bench.timed
    bench.build = fake_build
    bench.timed = lambda jfn, args, iters=20: fake_times[args[0].shape[0]]
    try:
        best_b, (tput, jfn, args) = bench.sweep("swav")
        assert jfn is None and args is None  # nothing retained by default
        best_b2, (tput2, jfn2, args2) = bench.sweep("swav", keep_best=True)
    finally:
        bench.build, bench.timed = orig_build, orig_timed

    assert best_b == best_b2 == 64
    assert tput == tput2
    assert jfn2 is not None and args2 is not None
    # probes in doubling order + midpoint, then ONE rebuild of the winner
    assert calls == [32, 64, 128, 96] * 2 + [64]


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


def test_main_emits_exactly_one_json_line(capsys, monkeypatch):
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
