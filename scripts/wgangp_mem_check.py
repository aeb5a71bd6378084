"""AOT memory + timing comparison of the two wgangp remat modes.

Run on the real TPU (one process, nothing else holding the chip). For
wgangp_remat in ('all', 'gp') at the production pidray shape (256², batch
20, ADA on, mixing on — configs/models/baggan/config_pidray_unlabeled.py):

  1. AOT-compile d_step via jit.lower(...).compile() and print
     memory_analysis() peaks — NO execution, so an over-peak candidate
     can't crash the session (the round-3 workflow).
  2. If both fit, time one real optimize_parameters iteration per mode.

Decision rule (VERDICT r3 task 7): adopt 'gp' as the default only if its
peak stays ≤13 GiB AND the iteration gets faster than the ~1.1 s/iter the
blanket remat costs. Results go to docs/PERFORMANCE.md.

Measured on the v5e (2026-08-18): 'all' 11.77 GiB temp (12.22 incl. args),
'gp' 14.40 GiB temp (14.85 incl. args) — over the 13 GiB budget, timing
leg skipped per the rule. 'all' stays the default; see docs/PERFORMANCE.md.
"""

import time
import types

import jax
import jax.numpy as jnp
import numpy as np


def make_cfg(tmp, remat):
    return types.SimpleNamespace(
        out_dir=tmp, checkpoint_dir=tmp, is_train=True,
        image_size=256, latent_dim=512, num_channels=3, batch_size=20,
        gan_mode="wgangp", use_ppl=True, r1_lambda=10, ppl_lambda=2,
        path_batch_shrink=2, ppl_decay=0.01, d_reg_every=16, g_reg_every=4,
        mixing_prob=0.9, chl_multiplier=2, g_reg_ratio=4 / 5,
        d_reg_ratio=16 / 17, augment=True, augment_p=0, ada_target=0.6,
        ada_length=500000, lr=0.002, beta1=0.0, lr_policy="linear",
        lr_params=dict(epoch_count=1, n_epochs=2, n_epochs_decay=2),
        generator_params=dict(mlp_layers=8),
        losses_to_print=["g_gan", "d"],
        start_epoch=1, continue_train=False, load_net=False,
        wgangp_remat=remat,
    )


def main():
    import tempfile

    from ganecdotes_tpu.gan.train import BagGANHQ

    print(f"device: {jax.devices()[0].device_kind}")
    rng = np.random.RandomState(0)
    real_np = rng.rand(20, 256, 256, 3).astype(np.float32) * 2 - 1

    fits = {}
    for remat in ("all", "gp"):
        tmp = tempfile.mkdtemp(prefix=f"wgangp_{remat}_")
        gan = BagGANHQ(make_cfg(tmp, remat), seed=3)
        z = [jnp.zeros((2, 20, 512))[0], jnp.zeros((2, 20, 512))[1]]
        real = jnp.asarray(real_np)
        key = jax.random.PRNGKey(0)
        lowered = gan._d_step.lower(
            gan.disc_params, gan.opt_d_state, gan.generator_params,
            real, z, key, gan.ada_state, jnp.asarray(7),
        )
        mem = lowered.compile().memory_analysis()
        peak = getattr(mem, "temp_size_in_bytes", None)
        args = getattr(mem, "argument_size_in_bytes", 0)
        out = getattr(mem, "output_size_in_bytes", 0)
        total = (peak or 0) + args
        print(
            f"wgangp_remat={remat}: temp {peak/2**30:.2f} GiB, "
            f"args {args/2**30:.2f} GiB, out {out/2**30:.2f} GiB, "
            f"temp+args {total/2**30:.2f} GiB"
        )
        fits[remat] = total <= 13 * 2**30
        del gan, lowered
        jax.clear_caches()

    for remat in ("all", "gp"):
        if not fits[remat]:
            print(f"wgangp_remat={remat}: SKIP timing (over 13 GiB budget)")
            continue
        tmp = tempfile.mkdtemp(prefix=f"wgangp_t_{remat}_")
        gan = BagGANHQ(make_cfg(tmp, remat), seed=3)
        real = jnp.asarray(real_np)
        # warm: two iterations compile d/g (+ lazy reg programs)
        for it in (1, 2, 16, 4):
            gan.set_input(data_sample={"ct": real}, iter_no=it, epoch_no=0)
            gan.optimize_parameters()
        jax.block_until_ready(gan.loss_d)
        t0 = time.perf_counter()
        iters = 10
        for it in range(5, 5 + iters):
            gan.set_input(data_sample={"ct": real}, iter_no=it, epoch_no=0)
            gan.optimize_parameters()
        # force real completion: read a loss VALUE (relay acks dispatch
        # before execution; block_until_ready under-reports)
        _ = float(gan.loss_d)
        dt = (time.perf_counter() - t0) / iters
        # iters 5..14 include the production reg cadence (g_reg every 4)
        print(f"wgangp_remat={remat}: {dt*1e3:.0f} ms/iter "
              f"(production cadence incl. g-reg)")
        del gan
        jax.clear_caches()


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
