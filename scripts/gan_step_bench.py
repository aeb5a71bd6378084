"""Chained-device timing of BagGAN D/R1/G steps at 256^2 batch 16, ADA on.

argv: [warp_impl] [compute_dtype] — e.g. `shear bfloat16` for the
mixed-precision trainer knob (gan/train.py).
"""
import sys, time, types
import jax, jax.numpy as jnp, numpy as np
from ganecdotes_tpu.gan.train import BagGANHQ
from ganecdotes_tpu.runtime.compile_cache import (
    enable_persistent_compilation_cache,
)

enable_persistent_compilation_cache()
warp = sys.argv[1] if len(sys.argv) > 1 else "shear"
cdtype = sys.argv[2] if len(sys.argv) > 2 else None
cfg = types.SimpleNamespace(
    out_dir="/tmp/ganb", checkpoint_dir="/tmp/ganb/ckpt",
    is_train=True, image_size=256, latent_dim=512, num_channels=3,
    batch_size=16, gan_mode="vanilla", use_ppl=True, r1_lambda=10,
    ppl_lambda=2, path_batch_shrink=2, ppl_decay=0.01, d_reg_every=16,
    g_reg_every=4, mixing_prob=0.9, chl_multiplier=2,
    g_reg_ratio=4/5, d_reg_ratio=16/17, augment=True, augment_p=0,
    ada_target=0.6, ada_length=500_000, lr=0.002, beta1=0.0,
    lr_policy="linear",
    lr_params=dict(epoch_count=1, n_epochs=2, n_epochs_decay=2),
    generator_params=dict(mlp_layers=8),
    losses_to_print=["g_gan", "d"],
    start_epoch=1, continue_train=False, load_net=False,
    ada_warp_impl=warp, compute_dtype=cdtype,
)
tag = f"{warp}{'' if cdtype is None else '/' + cdtype}"
gan = BagGANHQ(cfg)
gan.setup_gan()
real = jnp.asarray(np.random.RandomState(0).rand(16, 256, 256, 3).astype(np.float32) * 2 - 1)

def timed(fn, iters=8):
    @jax.jit
    def prog(r):
        def body(i, s):
            o = fn(r + i * 1e-9)
            return s + sum(x.astype(jnp.float32).mean() for x in jax.tree.leaves(o) if hasattr(x, 'astype'))
        return jax.lax.fori_loop(0, iters, body, 0.0)
    float(prog(real)); t0 = time.perf_counter(); float(prog(real))
    return (time.perf_counter() - t0) / iters

z = jax.random.normal(jax.random.PRNGKey(0), (16, 512))
key = jax.random.PRNGKey(1)

d_fn = lambda r: gan._d_step(gan.disc_params, gan.opt_d_state, gan.generator_params,
                             r, [z, z], key, gan.ada_state, jnp.asarray(3))[:4]
td = timed(d_fn); print(f"[{tag}] D step : {td*1e3:8.1f} ms", flush=True)
# every chain keeps the UPDATED params/opt_state in its output: the loss
# alone is value_and_grad's primal, so returning only it lets XLA DCE the
# parameter backward + optimizer update and the timing degenerates to
# forward-only (advisor finding, round 4)
r1_fn = lambda r: gan._r1_step(gan.disc_params, gan.opt_d_state, r, key, gan.ada_state["p"])[:3]
tr = timed(r1_fn); print(f"[{tag}] R1 step: {tr*1e3:8.1f} ms", flush=True)
g_fn = lambda r: gan._g_step(gan.generator_params, gan.opt_g_state, gan.disc_params,
                             [z, z], key, gan.ada_state["p"] + r[0,0,0,0]*0, jnp.asarray(3))[:3]
tg = timed(g_fn); print(f"[{tag}] G step : {tg*1e3:8.1f} ms", flush=True)
zp = jax.random.normal(jax.random.PRNGKey(2), (16 // cfg.path_batch_shrink, 512))
ppl_fn = lambda r: gan._ppl_step(gan.generator_params, gan.opt_g_state,
                                 [zp + r[0, 0, 0, 0] * 0], key,
                                 gan.mean_path_length)[:3]
tp = timed(ppl_fn); print(f"[{tag}] PPL step: {tp*1e3:7.1f} ms", flush=True)
print(f"[{tag}] D+G iteration: {(td+tg)*1e3:.1f} ms -> {16/(td+tg):.1f} img/s", flush=True)
# lazy-regularized training: R1 every d_reg_every=16, PPL every g_reg_every=4
teff = td + tg + tr / cfg.d_reg_every + tp / cfg.g_reg_every
print(f"[{tag}] effective iteration (incl. R1/{cfg.d_reg_every} + "
      f"PPL/{cfg.g_reg_every}): {teff*1e3:.1f} ms -> {16/teff:.1f} img/s",
      flush=True)
