"""Attribute the R1 step's cost at 256^2 batch 16: augment off vs the
shear warp vs the exact (grid-sample) warp, with AOT flops/bytes.

Measured on the live v5e (2026-08-20):

    [no-aug] R1:     41.2 ms     8.91 TF    54.45 GB
    [shear ] R1:    266.6 ms     9.39 TF   290.09 GB
    [exact ] R1:   1901.6 ms     8.91 TF  4776.42 GB

Findings: (a) the D double-grad itself is cheap (41 ms); the cost is the
grad-of-grad through ADA's augment. (b) The shear warp's double-grad adds
~236 GB of HBM traffic (the 3-tap one-hot matmuls and their transposes
re-materialize per differentiation level) — 267 ms total, i.e. an
amortized +16.7 ms on the d_reg_every=16 cycle (+6% of the 277 ms D+G
iteration). (c) The exact grid-sample warp's scatter-add double-backward
costs 4.8 TB of traffic — 7.1x the shear step, and would amortize to
+119 ms/iter, which is why ada_warp_impl='shear' is the default
(docs/PERFORMANCE.md round-3 warp section). (d) An earlier one-off
1446.6 ms reading for the fp32 shear R1 (scripts/gan_step_bench.py,
2026-08-20 01:14) did not reproduce — the same program re-measures at
266.6 ms here and 263.7 ms in the compute_dtype='bfloat16' trainer run
(R1 stays fp32 under that knob, so the programs are identical); treat it
as a relay-contention outlier.

    PYTHONPATH=/root/repo:$PYTHONPATH python scripts/r1_profile.py
"""
import time
import types

import jax
import jax.numpy as jnp
import numpy as np

from ganecdotes_tpu.gan.train import BagGANHQ
from ganecdotes_tpu.runtime.compile_cache import (
    enable_persistent_compilation_cache,
)

enable_persistent_compilation_cache()


def build(aug, warp):
    cfg = types.SimpleNamespace(
        out_dir="/tmp/ganb", checkpoint_dir="/tmp/ganb/ckpt",
        is_train=True, image_size=256, latent_dim=512, num_channels=3,
        batch_size=16, gan_mode="vanilla", use_ppl=True, r1_lambda=10,
        ppl_lambda=2, path_batch_shrink=2, ppl_decay=0.01, d_reg_every=16,
        g_reg_every=4, mixing_prob=0.9, chl_multiplier=2,
        g_reg_ratio=4 / 5, d_reg_ratio=16 / 17, augment=aug, augment_p=0,
        ada_target=0.6, ada_length=500_000, lr=0.002, beta1=0.0,
        lr_policy="linear",
        lr_params=dict(epoch_count=1, n_epochs=2, n_epochs_decay=2),
        generator_params=dict(mlp_layers=8),
        losses_to_print=["g_gan", "d"],
        start_epoch=1, continue_train=False, load_net=False,
        ada_warp_impl=warp,
    )
    gan = BagGANHQ(cfg)
    gan.setup_gan()
    return gan


real = jnp.asarray(
    np.random.RandomState(0).rand(16, 256, 256, 3).astype(np.float32) * 2 - 1
)
key = jax.random.PRNGKey(1)


def timed(fn, iters=4):
    @jax.jit
    def prog(r):
        def body(i, s):
            return s + fn(r + i * 1e-9).astype(jnp.float32)

        return jax.lax.fori_loop(0, iters, body, 0.0)

    float(prog(real))
    t0 = time.perf_counter()
    float(prog(real))
    return (time.perf_counter() - t0) / iters


for tag, aug, warp in (
    ("no-aug", False, "shear"),
    ("shear ", True, "shear"),
    ("exact ", True, "exact"),
):
    gan = build(aug, warp)
    args = (gan.disc_params, gan.opt_d_state, real, key, gan.ada_state["p"])
    ca = gan._r1_step.lower(*args).compile().cost_analysis()
    fn = lambda r: gan._r1_step(
        gan.disc_params, gan.opt_d_state, r, key, gan.ada_state["p"]
    )[2]
    t = timed(fn)
    print(
        f"[{tag}] R1: {t*1e3:8.1f} ms   "
        f"{ca.get('flops', 0)/1e12:6.2f} TF  "
        f"{ca.get('bytes accessed', 0)/1e9:7.2f} GB",
        flush=True,
    )
