"""A/B depth-to-space formulations for the polyphase emission (v5e).

The phase-stacked conv in ``embed._polyphase_conv3x3_up`` ends with
(B, r, rw, f, f, C) → (B, f·r, f·rw, C): one 6-D transpose + reshape.
In the fused hfc program XLA executes that copy at ~8× worse than HBM
bandwidth (copy.182: 4.8M estimated cycles for a 256 MB tensor).

Variants measured here (all parity-checked against the reference form):
  a. current: transpose(0,1,3,2,4,5) then reshape
  b. channel order [px, py, co]: width interleave becomes a FREE reshape
     (rw and px are adjacent), then one (0,1,3,2,4) transpose for height
  c. two-step: swap (py,px) locally first, then b's height transpose

OUTCOME (v5e, 2026-08-19): measured-REJECTED. Isolated, b wins — 7.05 →
6.48 ms (−8%) on the hfc lift shape (B=32 r=64 f=4 C=128). End-to-end,
adopting b in ``embed._polyphase_conv3x3_up`` (px-major einsum output +
free width merge) LOSES on the fused hfc_kmeans serving program —
598.3 → 589.6 img/s @ batch 32 (−1.5%, 3 runs each, stash A/B) — and is
within relay noise on the swav headline (1170 → 1183 img/s @ 128, one
pre-run outlier). In context XLA fuses the relayout into neighboring
ops differently than the isolated copy, and the in-context fusion of
the [py, px, co] order is the better one. Keeping variant a.

Usage: python scripts/d2s_bench.py [B r f C iters]
Defaults match the hfc lift: B=32 r=64 f=4 C=128.
"""

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np


def timed(jfn, x, iters=30):
    """Chained on-device loop (relay-honest, bench.py methodology)."""

    @jax.jit
    def prog(x):
        def body(i, s):
            y = jfn(x + i * jnp.bfloat16(1e-8))
            return s + y[0, 0, 0, 0].astype(jnp.float32)

        return jax.lax.fori_loop(0, iters, body, jnp.float32(0.0))

    float(prog(x))  # compile + warm
    t0 = time.perf_counter()
    float(prog(x))
    return (time.perf_counter() - t0) / iters


def main():
    defaults = [32, 64, 4, 128, 30]  # B r f C iters
    args = [int(a) for a in sys.argv[1:6]]
    B, r, f, C, iters = args + defaults[len(args):]

    rw = r
    key = jax.random.PRNGKey(0)
    # variant a input: (B, r, rw, f*f*C) channels ordered [py, px, co]
    x = jax.random.normal(key, (B, r, rw, f * f * C), jnp.bfloat16)

    def d2s_a(x):
        y = x.reshape(B, r, rw, f, f, C)
        return y.transpose(0, 1, 3, 2, 4, 5).reshape(B, f * r, f * rw, C)

    # variant b input channels ordered [px, py, co]
    def d2s_b(x):
        y = x.reshape(B, r, rw, f, f, C)  # (..., px, py, co)
        y = y.reshape(B, r, rw * f, f, C)  # width interleave: free merge
        return y.transpose(0, 1, 3, 2, 4).reshape(B, f * r, f * rw, C)

    # variant c: local (py,px) swap, then b
    def d2s_c(x):
        y = x.reshape(B, r, rw, f, f, C)  # (..., py, px, co)
        y = y.transpose(0, 1, 2, 4, 3, 5)  # -> (..., px, py, co), local
        y = y.reshape(B, r, rw * f, f, C)
        return y.transpose(0, 1, 3, 2, 4).reshape(B, f * r, f * rw, C)

    # parity: b on a [px,py,co]-permuted input equals a
    xa = np.asarray(x, np.float32).reshape(B, r, rw, f, f, C)
    xb = jnp.asarray(
        xa.transpose(0, 1, 2, 4, 3, 5).reshape(B, r, rw, f * f * C)
    ).astype(jnp.bfloat16)
    ya = np.asarray(jax.jit(d2s_a)(x))
    yb = np.asarray(jax.jit(d2s_b)(xb))
    yc = np.asarray(jax.jit(d2s_c)(x))
    np.testing.assert_array_equal(ya, yb)
    np.testing.assert_array_equal(ya, yc)
    print("parity ok")

    nbytes = x.size * 2 * 2  # read + write
    for name, fn, inp in [("a transpose6d", d2s_a, x),
                          ("b px-major   ", d2s_b, xb),
                          ("c local-swap ", d2s_c, x)]:
        dt = timed(jax.jit(fn), inp, iters)
        print(f"{name}: {dt * 1e3:7.3f} ms   {nbytes / dt / 1e9:7.1f} GB/s")


if __name__ == "__main__":
    main()
