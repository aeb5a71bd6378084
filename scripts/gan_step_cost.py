"""AOT cost analysis of the BagGAN step programs: FLOPs, bytes, and MFU
attribution at the bench shape (256^2, batch 16, ADA on).

Run on the TPU (or CPU for flops-only):
    PYTHONPATH=/root/repo:$PYTHONPATH python scripts/gan_step_cost.py [compute_dtype]

argv: [compute_dtype] — e.g. `bfloat16` for the mixed-precision trainer
knob (gan/train.py); default fp32.

Pairs with scripts/gan_step_bench.py (chained-device timing): divide its
measured ms by the flops printed here for honest MFU numbers.
"""
import sys, types

import jax
import jax.numpy as jnp
import numpy as np

from ganecdotes_tpu.gan.train import BagGANHQ

cfg = types.SimpleNamespace(
    compute_dtype=sys.argv[1] if len(sys.argv) > 1 else None,
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
    np.random.RandomState(0).rand(16, 256, 256, 3).astype(np.float32) * 2 - 1
)
z = jax.random.normal(jax.random.PRNGKey(0), (16, 512))
key = jax.random.PRNGKey(1)

programs = {
    "d_step": (
        gan._d_step,
        (gan.disc_params, gan.opt_d_state, gan.generator_params, real,
         [z, z], key, gan.ada_state, jnp.asarray(3)),
    ),
    "g_step": (
        gan._g_step,
        (gan.generator_params, gan.opt_g_state, gan.disc_params, [z, z],
         key, gan.ada_state["p"], jnp.asarray(3)),
    ),
    "r1_step": (
        gan._r1_step,
        (gan.disc_params, gan.opt_d_state, real, key, gan.ada_state["p"]),
    ),
    "ppl_step": (
        gan._ppl_step,
        (gan.generator_params, gan.opt_g_state, [z, z], key,
         gan.mean_path_length),
    ),
}

peak = 197e12  # v5e bf16; fp32 convs run the MXU at half rate -> note below
for name, (fn, argv) in programs.items():
    ca = fn.lower(*argv).compile().cost_analysis()
    f, bo = ca.get("flops", 0.0), ca.get("bytes accessed", 0.0)
    print(
        f"{name:9s}: {f/1e12:7.3f} TF  {bo/1e9:7.2f} GB accessed  "
        f"-> ms@100%bf16peak={f/peak*1e3:6.2f}  "
        f"ms@HBM819GBps={bo/819e9*1e3:6.2f}",
        flush=True,
    )
print(
    "NOTE: fp32 conv FLOPs run the v5e MXU at ~half the bf16 rate; an fp32 "
    "program's speed-of-light is ~2x the ms@100%bf16peak column.",
    flush=True,
)
