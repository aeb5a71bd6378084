"""Op-level trace of the BagGAN D step (and G step) post-warp-kernel.

After ops/affine_warp_pallas.py moved the ADA shear warp into one fused
kernel per pass (docs/PERFORMANCE.md 2026-08-20: D bf16 144.6 -> 126.8,
G bf16 93.5 -> 48.3 ms at 256² batch 16), the D step dominates the
adversarial iteration (126.8 of 175.1 ms).  This script ranks the D (or
G/R1) step's device ops from a jax.profiler trace so the next target is
measured, not guessed.

    PYTHONPATH=/root/repo python scripts/d_step_profile.py [step] [dtype]

step  ∈ {d, g, r1};  dtype ∈ {fp32, bfloat16} (default bfloat16).
"""
import os
import sys
import types

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from car512_profile import parse_trace  # noqa: E402


def main():
    step = sys.argv[1] if len(sys.argv) > 1 else "d"
    dtype = sys.argv[2] if len(sys.argv) > 2 else "bfloat16"
    if step not in ("d", "g", "r1"):
        raise SystemExit(f"step must be one of d|g|r1, got {step!r}")
    if dtype not in ("fp32", "bfloat16"):
        raise SystemExit(f"dtype must be fp32|bfloat16, got {dtype!r}")
    import jax
    import jax.numpy as jnp
    import numpy as np

    from ganecdotes_tpu.runtime.compile_cache import (
        enable_persistent_compilation_cache,
    )

    enable_persistent_compilation_cache()
    from ganecdotes_tpu.gan.train import BagGANHQ

    cfg = types.SimpleNamespace(
        compute_dtype=None if dtype == "fp32" else dtype,
        out_dir="/tmp/ganb", checkpoint_dir="/tmp/ganb/ckpt",
        is_train=True, image_size=256, latent_dim=512, num_channels=3,
        batch_size=16, gan_mode="vanilla", use_ppl=True, r1_lambda=10,
        ppl_lambda=2, path_batch_shrink=2, ppl_decay=0.01, d_reg_every=16,
        g_reg_every=4, mixing_prob=0.9, chl_multiplier=2,
        g_reg_ratio=4 / 5, d_reg_ratio=16 / 17, augment=True, augment_p=0,
        ada_target=0.6, ada_length=500_000, lr=0.002, beta1=0.0,
        lr_policy="linear",
        lr_params=dict(epoch_count=1, n_epochs=2, n_epochs_decay=2),
        generator_params=dict(mlp_layers=8),
        losses_to_print=["g_gan", "d"],
        start_epoch=1, continue_train=False, load_net=False,
    )
    gan = BagGANHQ(cfg)
    gan.setup_gan()
    real = jnp.asarray(
        np.random.RandomState(0).rand(16, 256, 256, 3).astype(np.float32)
        * 2 - 1
    )
    z = jax.random.normal(jax.random.PRNGKey(0), (16, 512))
    key = jax.random.PRNGKey(1)

    if step == "d":
        fn = gan._d_step
        args = (gan.disc_params, gan.opt_d_state, gan.generator_params,
                real, [z, z], key, gan.ada_state, jnp.asarray(3))
    elif step == "g":
        fn = gan._g_step
        args = (gan.generator_params, gan.opt_g_state, gan.disc_params,
                [z, z], key, gan.ada_state["p"], jnp.asarray(3))
    else:
        fn = gan._r1_step
        args = (gan.disc_params, gan.opt_d_state, real, key,
                gan.ada_state["p"])

    # chained-fori timing (a host dispatch loop under-reports >10x through
    # the TPU relay — see bench.timed's docstring)
    import time

    # every chain keeps the UPDATED params/opt_state in its output: the
    # loss alone is value_and_grad's primal, so returning only it lets XLA
    # DCE the whole parameter backward + optimizer update and the timing
    # degenerates to forward-only (advisor finding, round 4)
    if step == "d":
        chain = lambda r: fn(args[0], args[1], args[2], r, *args[4:])[:4]
    elif step == "g":
        chain = lambda r: fn(args[0], args[1], args[2], args[3], args[4],
                             args[5] + r[0, 0, 0, 0] * 0, args[6])[:3]
    else:
        chain = lambda r: fn(args[0], args[1], r, *args[3:])[:3]

    iters = 8

    @jax.jit
    def prog(r):
        def body(i, s):
            o = chain(r + i * 1e-9)
            return s + sum(x.astype(jnp.float32).mean()
                           for x in jax.tree.leaves(o)
                           if hasattr(x, "astype"))
        return jax.lax.fori_loop(0, iters, body, 0.0)

    float(prog(real))
    t0 = time.perf_counter()
    float(prog(real))
    ms = (time.perf_counter() - t0) / iters * 1e3
    print(f"{step}_step {dtype}: {ms:.1f} ms/call (chained fori, {iters} it)")

    # op-ranked trace — degrade gracefully: the relay intermittently
    # rejects the profiler session (INVALID_ARGUMENT from
    # profiler_controller, observed 2026-08-20); the chained timing above
    # is the trustworthy number either way.
    import shutil

    trace_dir = f"/tmp/{step}step_trace"
    shutil.rmtree(trace_dir, ignore_errors=True)
    try:
        with jax.profiler.trace(trace_dir):
            jax.block_until_ready(fn(*args))
    except Exception as e:  # noqa: BLE001 — relay profiler errors vary
        print(f"profiler unavailable ({type(e).__name__}: {e}); "
              "chained timing above is still valid")
        return

    totals, path = parse_trace(trace_dir)
    total = sum(totals.values())
    print(f"trace: {path}\ntotal device us: {total:.0f}")
    # "convolution"/"dot" explicitly: a bare "conv" substring also matches
    # the numerous "convert" dtype-cast ops under compute_dtype='bfloat16'
    # and inflates the reported MXU share (advisor finding, round 4)
    mxu = sum(v for k, v in totals.items()
              if "convolution" in k.lower()
              or ("dot" in k.lower() and "convert" not in k.lower()))
    print(f"MXU (conv/dot) share: {mxu/max(total,1e-9):.1%}")
    for name, us in sorted(totals.items(), key=lambda kv: -kv[1])[:30]:
        print(f"{us:10.0f} us  {name}")


if __name__ == "__main__":
    main()
