"""Stage- and op-level profile of the ADA augment pipeline on the v5e.

The bf16 GAN step A/B (docs/PERFORMANCE.md, 2026-08-20) attributed most
of the remaining adversarial-step time to ADA: two forward augments cost
the D step 63 ms (145.4 -> 82.1 ms without) and one forward+VJP augment
costs the G step 69 ms (95.2 -> 25.8 ms) at 256² batch 16. This script
breaks the forward (and the VJP) into its stages — pad+2×upsample (SYM6
upfirdn), shear warp (XLA passes AND the fused Pallas kernel),
2×downsample, color matmul — and ranks device ops from a trace.

Findings that led to ops/affine_warp_pallas.py (2026-08-20, v5e):
  * fused augment fwd 70.8 ms, dominated by ~10 broadcast_select fusions
    at 2.89 ms (the warp's bit-decomposed roll sweeps) + ~20 × 1.0 ms
    roll-materialization copies;
  * the SAME warp isolated (traced M) runs 9.3 ms — the 6× in-program
    tax is XLA layout assignment propagating the NHWC producer's C-minor
    layout into the sweeps (3/128 lanes); a logical (B,C,H,W) rewrite
    changed nothing end-to-end because XLA re-canonicalizes through it;
  * the Pallas kernel pins the layout at its custom-call boundary and
    does one HBM read+write per pass — GAN training 53.7 -> 71.1 img/s
    fp32 / 61.6 -> 86.1 img/s bf16 end-to-end.
  * NOTE the "augment fwd+VJP" figure is transpose-ONLY: the augment is
    linear in the image, so XLA DCEs the entire forward out of the grad
    program. Don't read fwd+VJP < fwd as an anomaly.

    PYTHONPATH=/root/repo:$PYTHONPATH python scripts/ada_profile.py [dtype]
"""
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np

from ganecdotes_tpu.runtime.compile_cache import (
    enable_persistent_compilation_cache,
)

enable_persistent_compilation_cache()

from car512_profile import parse_trace  # noqa: E402  (same dir)

from ganecdotes_tpu.gan import ada  # noqa: E402
from ganecdotes_tpu.ops.affine_warp import (  # noqa: E402
    affine_warp,
    norm_to_pixel_matrix,
)
from ganecdotes_tpu.ops.upfirdn2d import upfirdn2d  # noqa: E402

DTYPE = jnp.dtype(sys.argv[1] if len(sys.argv) > 1 else "bfloat16")
B, H, W, C = 16, 256, 256, 3
P = 0.6  # representative mid-training augment probability


def timed(fn, *args, iters=8):
    @jax.jit
    def prog(x, *rest):
        def body(i, s):
            o = fn(x + i * jnp.asarray(1e-9, x.dtype), *rest)
            return s + sum(
                v.astype(jnp.float32).mean()
                for v in jax.tree.leaves(o)
                if hasattr(v, "astype")
            )

        return jax.lax.fori_loop(0, iters, body, 0.0)

    float(prog(*args))
    t0 = time.perf_counter()
    float(prog(*args))
    return (time.perf_counter() - t0) / iters


img = jnp.asarray(
    np.random.RandomState(0).rand(B, H, W, C).astype(np.float32) * 2 - 1
).astype(DTYPE)
key = jax.random.PRNGKey(7)
p = jnp.asarray(P, jnp.float32)

# ---- whole augment: forward and forward+VJP --------------------------------
fwd = lambda x: ada.augment(x, p, key)[0]
t_fwd = timed(fwd, img)
print(f"augment fwd            : {t_fwd*1e3:7.2f} ms", flush=True)

vjp_fn = lambda x: jax.grad(lambda y: fwd(y).astype(jnp.float32).sum())(x)
t_vjp = timed(vjp_fn, img)
print(f"augment fwd+VJP        : {t_vjp*1e3:7.2f} ms", flush=True)

# ---- stages (micro-programs; they overlap less than the fused whole) -------
k1, _ = jax.random.split(key)
G = jnp.linalg.inv(ada.sample_affine(k1, p, B, H, W))

k = np.asarray(ada.SYM6, dtype=np.float32)
len_k = len(k)
k_row = jnp.asarray(k)[None, :]
k_col = jnp.asarray(k)[:, None]
k_flip = jnp.asarray(k[::-1])
pad_k = len_k // 4
pad_x = int(round(W * 0.25)) + pad_k * 2
pad_y = int(round(H * 0.25)) + pad_k * 2
up_pad = ((len_k + 1) // 2, (len_k - 2) // 2)


def stage_up(x):
    xp = jnp.pad(
        x, ((0, 0), (pad_y, pad_y), (pad_x, pad_x), (0, 0)), mode="reflect"
    )
    x2 = upfirdn2d(xp, k_row, up=(2, 1), down=1,
                   pad=(up_pad[0], up_pad[1], 0, 0))
    return upfirdn2d(x2, k_col, up=(1, 2), down=1,
                     pad=(0, 0, up_pad[0], up_pad[1]))


img_2x = jax.jit(stage_up)(img)
print(f"  [shape] img_2x = {img_2x.shape}", flush=True)
t_up = timed(stage_up, img)
print(f"  pad + 2x SYM6 up     : {t_up*1e3:7.2f} ms", flush=True)

G_inv = G
G_inv = ada._scale_single(2, 2) @ G_inv @ ada._scale_single(0.5, 0.5)
G_inv = (
    ada._translate_single(-0.5, -0.5) @ G_inv
    @ ada._translate_single(0.5, 0.5)
)
out_h = (H + pad_k * 2) * 2
out_w = (W + pad_k * 2) * 2
G_inv = (
    ada._scale_single(2 / img_2x.shape[2], 2 / img_2x.shape[1])
    @ G_inv
    @ ada._scale_single(1 / (2 / out_w), 1 / (2 / out_h))
)
M_pix = norm_to_pixel_matrix(G_inv, img_2x.shape[1:3], (out_h, out_w))

# M must be a traced argument: a closed-over constant matrix lets XLA
# fold the roll amounts / one-hots at compile time and the micro number
# stops representing training (where M is data-dependent)
warp = lambda x, M: affine_warp(x, M, out_hw=(out_h, out_w), impl="shear")
img_affine = jax.jit(warp)(img_2x, M_pix)
print(f"  [shape] img_affine = {img_affine.shape}", flush=True)
t_warp = timed(warp, img_2x, M_pix)
print(f"  shear warp fwd       : {t_warp*1e3:7.2f} ms", flush=True)

t_warp_vjp = timed(
    lambda x, M: jax.grad(lambda y: warp(y, M).astype(jnp.float32).sum())(x),
    img_2x, M_pix,
)
print(f"  shear warp fwd+VJP   : {t_warp_vjp*1e3:7.2f} ms", flush=True)

warp_pl = lambda x, M: affine_warp(
    x, M, out_hw=(out_h, out_w), impl="shear_pallas"
)
t_warp_pl = timed(warp_pl, img_2x, M_pix)
print(f"  pallas warp fwd      : {t_warp_pl*1e3:7.2f} ms", flush=True)
t_warp_pl_vjp = timed(
    lambda x, M: jax.grad(
        lambda y: warp_pl(y, M).astype(jnp.float32).sum()
    )(x),
    img_2x, M_pix,
)
print(f"  pallas warp transpose: {t_warp_pl_vjp*1e3:7.2f} ms", flush=True)

d_p = -pad_k * 2
down_pad = (d_p + (len_k - 1) // 2, d_p + (len_k - 2) // 2)


def stage_down(x):
    xd = upfirdn2d(x, k_flip[None, :], up=1, down=(2, 1),
                   pad=(down_pad[0], down_pad[1], 0, 0))
    return upfirdn2d(xd, k_flip[:, None], up=1, down=(1, 2),
                     pad=(0, 0, down_pad[0], down_pad[1]))


t_down = timed(stage_down, img_affine)
print(f"  2x SYM6 down         : {t_down*1e3:7.2f} ms", flush=True)

color = lambda x: ada.random_apply_color(x, p, key)[0]
t_color = timed(color, img)
print(f"  color transform      : {t_color*1e3:7.2f} ms", flush=True)

# ---- op-ranked trace of the fused augment forward --------------------------
trace_dir = "/tmp/ada_trace"
os.system(f"rm -rf {trace_dir}")
jfwd = jax.jit(fwd)
jax.block_until_ready(jfwd(img))
with jax.profiler.trace(trace_dir):
    jax.block_until_ready(jfwd(img))
try:
    totals, path = parse_trace(trace_dir)
    print(f"\ntop ops (fwd, one call) from {path}:", flush=True)
    for name, us in sorted(totals.items(), key=lambda kv: -kv[1])[:25]:
        print(f"  {us/1e3:8.3f} ms  {name}", flush=True)
except FileNotFoundError as e:
    print(f"trace parse failed: {e}", flush=True)
