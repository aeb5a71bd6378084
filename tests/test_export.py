"""AOT serving export (runtime/export.py): round-trip + no-framework load.

The reference has no deployment story (serving = eager torch loop at
MAX_TEST_BATCH=1, src/one_shot_pipeline.py:30,615-668); these tests pin the
TPU-native one: the fused serving program serializes to a single artifact
that reproduces the live pipeline's outputs exactly — including from a
fresh process that imports only jax.
"""

import json
import subprocess
import sys
import textwrap
import zipfile

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from ganecdotes_tpu.runtime.export import export_fn, export_serving, load_exported


def test_export_fn_roundtrip(tmp_path):
    def f(x, y):
        return jnp.tanh(x @ y) * 2.0, jnp.sum(x, axis=-1)

    x = np.random.RandomState(0).randn(4, 8).astype(np.float32)
    y = np.random.RandomState(1).randn(8, 3).astype(np.float32)
    path = str(tmp_path / "f.ganex")
    meta = export_fn(f, (x, y), path, meta={"kind": "unit"})
    assert meta["kind"] == "unit"
    assert meta["in_shapes"] == [[4, 8], [8, 3]]
    assert meta["out_shapes"] == [[4, 3], [4]]

    call, meta2 = load_exported(path)
    assert meta2 == meta
    a, b = call(x, y)
    ea, eb = f(jnp.asarray(x), jnp.asarray(y))
    np.testing.assert_allclose(np.asarray(a), np.asarray(ea), rtol=1e-6)
    np.testing.assert_allclose(np.asarray(b), np.asarray(eb), rtol=1e-6)


def test_export_refuses_newer_format(tmp_path):
    path = str(tmp_path / "bad.ganex")
    with zipfile.ZipFile(path, "w") as z:
        z.writestr("meta.json", json.dumps({"format_version": 999}))
        z.writestr("program.bin", b"")
    try:
        load_exported(path)
    except ValueError as e:
        assert "format_version" in str(e)
    else:
        raise AssertionError("expected ValueError on newer format_version")


def _tiny_pipeline(tmp_path):
    from test_pipeline import TINY_MODEL, TINY_RP, TINY_TRAINER

    from ganecdotes_tpu.pipeline.one_shot_pipeline import OneShotPipeline

    cfg = {}
    for name, body in [("model", TINY_MODEL), ("trainer", TINY_TRAINER),
                       ("rp", TINY_RP)]:
        p = tmp_path / f"{name}_config.py"
        p.write_text(textwrap.dedent(body))
        cfg[name] = str(p)

    pipe = OneShotPipeline(
        out_dir=str(tmp_path / "out"),
        model="ffhq-256",
        segmentor="repurposegan",
        num_test_samples=2,
        custom={"model": cfg["model"], "trainer": cfg["trainer"],
                "seg": cfg["rp"]},
    )
    pipe.run_pipeline()
    return pipe


@pytest.mark.slow
def test_export_serving_matches_live_pipeline(tmp_path):
    pipe = _tiny_pipeline(tmp_path)
    path = str(tmp_path / "serving.ganex")
    meta = export_serving(pipe, path, batch=3)
    assert meta["kind"] == "one_shot_serving"
    assert meta["segmentor"] == "repurposegan"
    assert meta["batch"] == 3
    assert meta["classes"] == ["background", "a", "b", "c"]

    latents = np.asarray(
        jax.random.normal(jax.random.PRNGKey(7), (3, meta["latent_dim"]))
    )
    infer = pipe._make_infer_fn()
    exp_img, exp_pred = infer(
        pipe.model.params, pipe.segmentor_params, jnp.asarray(latents)
    )

    call, _ = load_exported(path)
    img, pred = call(latents)
    np.testing.assert_array_equal(np.asarray(pred), np.asarray(exp_pred))
    # the deserialized StableHLO is a separate XLA compile — fusion order
    # may differ from the live jit, so images agree to fp32 recompile
    # tolerance (argmax labels above must still match exactly)
    np.testing.assert_allclose(
        np.asarray(img), np.asarray(exp_img), rtol=1e-3, atol=1e-4
    )

    # the artifact must run WITHOUT the framework: fresh process, jax only
    np.savez(tmp_path / "io.npz", latents=latents, pred=np.asarray(exp_pred))
    script = textwrap.dedent(
        """
        import sys
        import numpy as np
        assert not any('ganecdotes' in m for m in sys.modules)
        import jax, json, zipfile
        from jax import export as jax_export
        path, io_path = sys.argv[1], sys.argv[2]
        with zipfile.ZipFile(path) as z:
            exported = jax_export.deserialize(bytearray(z.read('program.bin')))
        io = np.load(io_path)
        img, pred = jax.jit(exported.call)(io['latents'])
        np.testing.assert_array_equal(np.asarray(pred), io['pred'])
        assert not any('ganecdotes' in m for m in sys.modules)
        print('SERVE-OK')
        """
    )
    out = subprocess.run(
        [sys.executable, "-c", script, path, str(tmp_path / "io.npz")],
        capture_output=True, text=True, timeout=600,
    )
    assert out.returncode == 0, out.stderr[-2000:]
    assert "SERVE-OK" in out.stdout
