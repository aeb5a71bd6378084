"""Op-level profile of the car-512 serving path (v5e).

The round-4 recapture attributed car-512 (swav512: 15-level pyramid,
hlen 5376, XS head with the first conv folded) at 398.9 img/s and
**46.5% MFU** vs 63.7% at 256².  docs/PERFORMANCE.md's standing
hypothesis is that 512² sits memory-side: the final-image relayout tax
that costs ~12% at 256² applies to 4x the pixels.  This script tests
that with the same methodology that found the 256² nearest-up2 win:
capture one jax.profiler step trace of the batch-128 program and rank
ops by device time, splitting convolution/matmul (MXU) time from
everything else.

Usage:  python scripts/car512_profile.py [batch]
"""

import glob
import gzip
import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def parse_trace(trace_dir):
    """Rank ops by total device time from the traceviewer JSON."""
    paths = glob.glob(
        os.path.join(trace_dir, "**", "*.trace.json.gz"), recursive=True
    )
    if not paths:
        raise FileNotFoundError(f"no trace json under {trace_dir}")
    path = max(paths, key=os.path.getmtime)
    with gzip.open(path, "rt") as f:
        data = json.load(f)
    # device-lane complete events only (TPU op events carry 'dur' in us)
    pid_names = {}
    for ev in data.get("traceEvents", []):
        if ev.get("ph") == "M" and ev.get("name") == "process_name":
            pid_names[ev["pid"]] = ev["args"].get("name", "")
    totals = {}
    for ev in data.get("traceEvents", []):
        if ev.get("ph") != "X" or "dur" not in ev:
            continue
        lane = pid_names.get(ev.get("pid"), "")
        if "TPU" not in lane and "/device" not in lane.lower():
            continue
        name = ev.get("name", "?")
        totals[name] = totals.get(name, 0.0) + ev["dur"]
    return totals, path


def main():
    batch = int(sys.argv[1]) if len(sys.argv) > 1 else 128
    import jax

    from ganecdotes_tpu.runtime.compile_cache import (
        enable_persistent_compilation_cache,
    )

    enable_persistent_compilation_cache()
    import bench

    print(f"device: {jax.devices()[0].device_kind}  batch={batch}")
    # bf16 like the bench sweep (bench.sweep passes jnp.bfloat16); fp32
    # does not even fit: the (B,256,256,512) coarse-projection temp alone
    # is 16 GiB at batch 128 (compile-time OOM, 28 GiB program)
    import jax.numpy as jnp

    jfn, args = bench.build(batch, jnp.bfloat16, "swav512")
    out = jfn(*args)
    jax.block_until_ready(out)

    rate = batch / bench.timed(jfn, args, iters=10)
    print(f"rate: {rate:.1f} img/s")

    trace_dir = "/tmp/car512_trace"
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
