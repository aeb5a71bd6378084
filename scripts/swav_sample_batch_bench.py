"""Single-chip SwAV sample_batch sweep: does vmapping n samples/update fill
the MXU better than the reference's strictly-sequential 1 sample/step?

Run on the real TPU. For n in (1, 2, 4): build the production ffhq-256
make_swav_train_step(sample_batch=n) program and time it with the chained
fori methodology. Reports steps/s, SAMPLES/s (the honest comparison: n
samples per step), and the keep-or-reject verdict for docs/PERFORMANCE.md.

Note the semantics change: n>1 averages the loss over n independent samples
per LARS update (same as the multi-chip data-parallel path), which alters
the effective optimization trajectory vs the reference's budget — adopt
only as an opt-in (swav_args['sample_batch']), never silently.

Measured on the v5e (2026-08-18): n=1 1.63 samples/s, n=2 0.83 samples/s
(0.51x), n=4 HBM OOM (20.84 GiB of 15.75) — REJECTED for single chip;
see docs/PERFORMANCE.md. sample_batch stays the multi-chip mechanism.
"""

import time

import jax
import jax.numpy as jnp


def main():
    import bench  # repo-root bench.py: reuses its production-config builder

    print(f"device: {jax.devices()[0].device_kind}")
    base = None
    for n in (1, 2, 4):
        jax.clear_caches()
        t0 = time.perf_counter()
        sps = bench.pretrain_steps_per_s(
            "swav", iters=8, sample_batch=(None if n == 1 else n)
        )
        wall = time.perf_counter() - t0
        samples_per_s = sps * n
        if base is None:
            base = samples_per_s
        print(
            f"sample_batch={n}: {sps:.3f} steps/s = {samples_per_s:.3f} "
            f"samples/s ({samples_per_s / base:.2f}x vs n=1; "
            f"incl-compile wall {wall:.0f}s)"
        )


if __name__ == "__main__":
    import os
    import sys

    sys.path.insert(0, os.path.dirname(os.path.dirname(
        os.path.abspath(__file__))))
    from ganecdotes_tpu.runtime.compile_cache import (
        enable_persistent_compilation_cache,
    )

    enable_persistent_compilation_cache()
    main()
