"""Native C++ data-loader runtime: build, decode parity, threading, fallback."""

import os

import numpy as np
import pytest

from ganecdotes_tpu.runtime import (
    PyDataLoader,
    load_native,
    make_loader,
)


def _write_dataset(tmp_path, n=12, h=8, w=8, c=3):
    rng = np.random.RandomState(0)
    paths, arrays = [], []
    for i in range(n):
        if i % 2 == 0:
            a = (rng.rand(h, w, c) * 255).astype(np.uint8)
        else:
            a = rng.randn(h, w, c).astype(np.float32)
        p = str(tmp_path / f"img_{i:03d}.npy")
        np.save(p, a)
        paths.append(p)
        arrays.append(a)
    return paths, arrays


def _expected(a):
    if a.dtype == np.uint8:
        return a.astype(np.float32) / 127.5 - 1.0
    return a


@pytest.mark.parametrize("kind", ["native", "python"])
def test_loader_decodes_all_samples(tmp_path, kind):
    if kind == "native" and load_native() is None:
        pytest.skip("no C++ toolchain")
    paths, arrays = _write_dataset(tmp_path)
    cls = (
        (lambda *a, **k: make_loader(*a, prefer_native=True, **k))
        if kind == "native"
        else PyDataLoader
    )
    loader = cls(paths, 4, 8, 8, 3, n_threads=3, seed=1)
    want = {a.tobytes() for a in map(_expected, arrays)}
    seen = set()
    for _ in range(9):  # 3 epochs worth of batches
        b = loader.next()
        assert b.shape == (4, 8, 8, 3) and b.dtype == np.float32
        for s in b:
            seen.add(np.ascontiguousarray(s).tobytes())
    loader.close()
    assert seen == want  # every sample decoded exactly, nothing else
    assert loader.decode_errors == 0


def test_native_loader_skips_bad_files(tmp_path):
    if load_native() is None:
        pytest.skip("no C++ toolchain")
    paths, _ = _write_dataset(tmp_path, n=4)
    bad = str(tmp_path / "bad.npy")
    with open(bad, "wb") as f:
        f.write(b"not an npy file at all")
    loader = make_loader(paths + [bad], 5, 8, 8, 3, n_threads=1, shuffle=False)
    b = loader.next()
    assert b.shape == (5, 8, 8, 3)
    # the corrupt file decodes to zeros and is counted
    assert loader.decode_errors >= 1
    assert np.allclose(b[4], 0)
    loader.close()


def test_native_loader_epochs_advance(tmp_path):
    if load_native() is None:
        pytest.skip("no C++ toolchain")
    paths, _ = _write_dataset(tmp_path, n=4)
    loader = make_loader(paths, 4, 8, 8, 3, n_threads=2, queue_depth=2)
    for _ in range(6):
        loader.next()
    assert loader.epoch >= 2
    assert loader.batches_produced >= 6
    loader.close()


def test_persistent_compile_cache_helper(tmp_path, monkeypatch):
    """enable_persistent_compilation_cache sets the jax config (and is
    idempotent / env-overridable / never raises)."""
    import jax

    from ganecdotes_tpu.runtime.compile_cache import (
        enable_persistent_compilation_cache,
    )

    from ganecdotes_tpu.runtime.compile_cache import _machine_tag

    # the cache dir is partitioned by a host fingerprint: XLA:CPU stores
    # AOT code for the compiling machine's exact feature set, and loading
    # a foreign host's entries risks SIGILL (observed)
    tag = _machine_tag()
    assert tag and "/" not in tag and tag == _machine_tag()  # stable

    monkeypatch.delenv("GANECDOTES_COMPILE_CACHE", raising=False)
    d = str(tmp_path / "xla_cache")
    expect = os.path.join(d, tag)
    got = enable_persistent_compilation_cache(d)
    assert got == expect and os.path.isdir(expect)
    assert jax.config.jax_compilation_cache_dir == expect
    assert enable_persistent_compilation_cache(d) == expect  # idempotent

    monkeypatch.setenv("GANECDOTES_COMPILE_CACHE", "off")
    assert enable_persistent_compilation_cache(d) is None

    monkeypatch.setenv("GANECDOTES_COMPILE_CACHE", str(tmp_path / "env_dir"))
    assert enable_persistent_compilation_cache() == os.path.join(
        str(tmp_path / "env_dir"), tag
    )
