"""Op-level profile of ANY bench serving path (v5e).

Generalizes scripts/car512_profile.py (which found the 256² nearest-up2
and coarse-projection wins): build the bench program for a method,
capture one jax.profiler step trace, rank ops by device time and split
MXU (conv/dot) time from everything else.  First target: hfc_kmeans —
the one serving path still at ~630 img/s (vs repurposegan 712 and the
1191 swav headline) whose non-MXU stages (per-layer label resize
gathers, one-hot, argmin assignment) are suspects.

Usage:  python scripts/method_profile.py METHOD [BATCH]
        METHOD ∈ bench.build's methods (swav, simclr, hfc_kmeans,
        repurposegan, datasetgan, swav512, swav_labels_only)
"""

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from car512_profile import parse_trace  # noqa: E402  (same dir)


def main():
    method = sys.argv[1] if len(sys.argv) > 1 else "hfc_kmeans"
    batch = int(sys.argv[2]) if len(sys.argv) > 2 else 32
    import jax

    from ganecdotes_tpu.runtime.compile_cache import (
        enable_persistent_compilation_cache,
    )

    enable_persistent_compilation_cache()
    import jax.numpy as jnp

    import bench

    print(f"device: {jax.devices()[0].device_kind}  method={method}  "
          f"batch={batch}")
    jfn, args = bench.build(batch, jnp.bfloat16, method)
    out = jfn(*args)
    jax.block_until_ready(out)

    rate = batch / bench.timed(jfn, args, iters=10)
    print(f"rate: {rate:.1f} img/s")

    trace_dir = f"/tmp/{method}_trace"
    os.system(f"rm -rf {trace_dir}")
    with jax.profiler.trace(trace_dir):
        jax.block_until_ready(jfn(*args))

    totals, path = parse_trace(trace_dir)
    total = sum(totals.values())
    mxu = sum(v for k, v in totals.items()
              if "convolution" in k or "dot" in k or "conv" in k)
    print(f"trace: {path}")
    print(f"device total: {total / 1e3:.2f} ms   "
          f"conv/dot share: {100 * mxu / max(total, 1e-9):.1f}%")
    print("top 25 ops by device time:")
    for name, dur in sorted(totals.items(), key=lambda kv: -kv[1])[:25]:
        print(f"  {dur / 1e3:9.3f} ms  {100 * dur / total:5.1f}%  {name}")


if __name__ == "__main__":
    main()
