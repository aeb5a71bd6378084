"""BagGAN-HQ training engine + base-model scaffolding, TPU-native.

Behavioral twin of models/baggan/bagganhq.py:14-501 and
models/baggan/base_model.py:8-307: full StyleGAN2 GAN training with
non-saturating / LSGAN / WGAN-GP objectives, lazy R1 regularization,
perceptual path-length regularization, adaptive discriminator augmentation,
reg-ratio-scaled Adam pairs, linear/step/plateau/cosine LR policies, and
per-net checkpointing ('%s_net_%s' files, continue-train resume).

TPU re-architecture: the D step, R1 step, and G(+PPL) step are three jitted
programs; R1/PPL are plain ``jax.grad`` compositions (no conv2d_gradfix /
grid-sample gradfix, cf. SURVEY.md native-code ledger).

Reference quirks *not* replicated (each intended-semantics fix is noted):
  * bagganhq.py:388 dead-stores the WGAN-GP weighted loss — here gan_mode
    'wgangp' actually applies the 0.25/0.25/0.5 combination of :380-384;
  * bagganhq.py:459 applies R1 on iterations NOT divisible by d_reg_every
    (inverted lazy-reg test) — here R1 runs every d_reg_every-th iteration;
  * the generator 3-tuple unpack crash (:219) is moot — the TPU generator
    returns (image, latent, features) when asked.
"""

import os
import time

import jax
import jax.numpy as jnp
import numpy as np
import optax

from ganecdotes_tpu.gan.ada import ada_init_state, ada_update, augment
from ganecdotes_tpu.gan.losses import (
    gan_loss,
    gradient_penalty,
    path_length_penalty,
    r1_penalty,
)
from ganecdotes_tpu.models.stylegan2.discriminator import (
    discriminator_forward,
    init_discriminator,
)
from ganecdotes_tpu.models.stylegan2.generator import (
    generator_forward,
    init_generator,
)
from ganecdotes_tpu.utils.serialization import load_pytree, save_pytree
from ganecdotes_tpu.utils.util import get_logger


def initialize_params(params, key, init_type="normal", init_gain=0.02):
    """Re-initialize every conv/linear weight leaf in a params pytree.

    Counterpart of the reference's ``initialize_net`` weight-init switch
    (models/baggan/gan_util.py:129-166): normal / xavier / kaiming /
    orthogonal over weights, zeros over biases. The DataParallel /
    DistributedDataParallel wrapping half of that function has no
    counterpart — replication is a sharding annotation under pjit
    (SURVEY.md §2 parallelism inventory), not a module wrapper.
    """
    leaves, treedef = jax.tree.flatten(params)
    keys = jax.random.split(key, len(leaves))

    def init_leaf(leaf, k):
        if leaf.ndim == 1:  # bias
            return jnp.zeros_like(leaf)
        fan_in = int(np.prod(leaf.shape[:-1]))
        fan_out = int(leaf.shape[-1])
        if init_type == "normal":
            return init_gain * jax.random.normal(k, leaf.shape, leaf.dtype)
        if init_type == "xavier":
            std = init_gain * float(np.sqrt(2.0 / (fan_in + fan_out)))
            return std * jax.random.normal(k, leaf.shape, leaf.dtype)
        if init_type == "kaiming":
            std = float(np.sqrt(2.0 / fan_in))
            return std * jax.random.normal(k, leaf.shape, leaf.dtype)
        if init_type == "orthogonal":
            flat = jax.random.normal(k, (fan_in, fan_out))
            q, r = jnp.linalg.qr(flat if fan_in >= fan_out else flat.T)
            q = q * jnp.sign(jnp.diagonal(r))[None, :]
            if fan_in < fan_out:
                q = q.T
            return (init_gain * q.reshape(leaf.shape)).astype(leaf.dtype)
        raise NotImplementedError(f"init type {init_type} not found")

    return jax.tree.unflatten(
        treedef, [init_leaf(l, k) for l, k in zip(leaves, keys)]
    )


def get_scheduler(lr_policy, epoch_count=None, n_epochs=None,
                  n_epochs_decay=None, lr_decay_iters=None):
    """LR multiplier schedule f(epoch) (ref gan_util.py:72-127)."""
    if lr_policy == "linear":

        def sched(epoch):
            return 1.0 - max(0, epoch + (epoch_count or 1) - (n_epochs or 100)) / float(
                (n_epochs_decay or 100) + 1
            )

    elif lr_policy == "step":

        def sched(epoch):
            return 0.1 ** (epoch // (lr_decay_iters or 50))

    elif lr_policy == "cosine":

        def sched(epoch):
            import math

            return 0.5 * (1 + math.cos(math.pi * epoch / (n_epochs or 100)))

    elif lr_policy == "plateau":
        from ganecdotes_tpu.pipeline.schedulers import plateau_lr

        # ReduceLROnPlateau(mode='min', factor=0.2, threshold=0.01,
        # patience=5) — the reference's exact arguments
        # (models/baggan/gan_util.py:110-115); rel threshold + cooldown=0
        # are torch defaults, honored by plateau_lr
        return plateau_lr(patience=5, factor=0.2, threshold=0.01)
    else:
        raise NotImplementedError(f"lr policy {lr_policy} not found")
    return sched


class GANBaseModel:
    """Checkpoint / scheduler / logging scaffolding (ref base_model.py:8-307)."""

    def __init__(self, config):
        self.config = config
        self.is_train = getattr(config, "is_train", True)
        self.out_dir = getattr(config, "out_dir", ".")
        self.checkpoint_dir = getattr(config, "checkpoint_dir", self.out_dir)
        os.makedirs(self.checkpoint_dir, exist_ok=True)
        self.logger = get_logger(
            getattr(config, "baggan_logger_name", "BagGAN"),
            getattr(config, "training_log_path", None),
        )
        self.model_names = {}
        self.optimizers = []
        self.schedulers = []
        self.loss_names = []
        self.epoch = getattr(config, "start_epoch", 1)
        self._lr_mult = 1.0

    def setup_gan(self):
        """Schedulers + continue-train resume (ref base_model.py:69-101)."""
        if self.is_train:
            self.scheduler = get_scheduler(
                getattr(self.config, "lr_policy", "linear"),
                **getattr(self.config, "lr_params", {}),
            )
        if getattr(self.config, "continue_train", False) or getattr(
            self.config, "load_net", False
        ):
            suffix = getattr(self.config, "load_epoch", None)
            if suffix is not None:
                self.load_networks(suffix)

    def update_learning_rate(self, metric=None):
        """Per-epoch LR policy step (ref base_model.py:118-134)."""
        self.epoch += 1
        if hasattr(self.scheduler, "step"):
            # the reference passes self.metric (default 0) to plateau's
            # step; callers that don't track a metric get the same default
            self._lr_mult = self.scheduler.step(
                0.0 if metric is None else metric
            )
        else:
            self._lr_mult = self.scheduler(self.epoch)
        self.logger.info(f"learning rate mult = {self._lr_mult:.7f}")
        return self._lr_mult

    def get_current_losses(self):
        return {
            name: float(getattr(self, "loss_" + name))
            for name in self.loss_names
            if hasattr(self, "loss_" + name)
        }

    def _net_path(self, suffix, name):
        return os.path.join(self.checkpoint_dir, f"{suffix}_net_{name}.npz")

    def save_networks(self, suffix):
        """Per-net param pytrees, '%s_net_%s' layout (ref :153-176)."""
        for attr, name in self.model_names.items():
            save_pytree(self._net_path(suffix, name), getattr(self, attr + "_params"))
            self.logger.info(f"saved {self._net_path(suffix, name)}")

    def load_networks(self, suffix):
        for attr, name in self.model_names.items():
            path = self._net_path(suffix, name)
            if os.path.exists(path):
                setattr(self, attr + "_params", load_pytree(path))
                self.logger.info(f"loaded {path}")
            else:
                self.logger.warning(f"checkpoint missing: {path}")

    def print_networks(self, verbose=False):
        for attr, name in self.model_names.items():
            params = getattr(self, attr + "_params")
            n = sum(int(np.prod(x.shape)) for x in jax.tree.leaves(params))
            self.logger.info(f"[Network {name}] Total parameters: {n / 1e6:.3f} M")
            if verbose:
                self.logger.info(jax.tree.map(lambda x: x.shape, params))

    def set_requires_grad(self, nets, requires_grad=False):
        """No-op under functional JAX (gradients flow only where requested);
        kept for API parity with ref base_model.py:289-307."""

    def eval(self):
        """No train/eval mode distinction for these nets (API parity)."""


class BagGANHQ(GANBaseModel):
    """StyleGAN2 GAN trainer for baggage imagery (ref bagganhq.py:14-501)."""

    def __init__(self, config, seed=0):
        super().__init__(config)
        if getattr(config, "use_ppl", False):
            # PPL backprops through grad-of-grad of the generator; the
            # opt-in pallas styled-conv kernels are custom_vjp (first-order
            # only) and would die at trace time with a bare AssertionError
            # deep inside JAX — fail here with a pointer to the knob
            from ganecdotes_tpu.models.stylegan2 import generator as _g

            if _g.STYLED_CONV_IMPL == "pallas":
                raise ValueError(
                    "GANECDOTES_STYLED_CONV_IMPL=pallas cannot train with"
                    " use_ppl=True: the path-length regularizer takes"
                    " grad-of-grad through the generator and the pallas"
                    " styled-conv kernels are custom_vjp (second-order"
                    " autodiff unsupported, see"
                    " ops/modulated_conv_pallas.py). Unset the env flag"
                    " or set use_ppl=False."
                )
        self.loss_names = getattr(config, "losses_to_print", ["g_gan", "d"])
        self.model_names = (
            {"generator": "G", "disc": "D"} if self.is_train else {"generator": "G"}
        )

        self.key = jax.random.PRNGKey(seed)
        self._host_rng = np.random.RandomState(seed)
        # per-iteration step keys come from a host stream as raw (2,)
        # uint32 key data (zero eager device ops — every eager
        # jax.random call is a synchronous relay round-trip, ~0.1 s)
        self._host_key_rng = np.random.RandomState(
            np.random.SeedSequence([seed, 0x9E3779B9]).generate_state(4)
        )
        self._draw_latents_cache = {}
        self.key, kg, kd = jax.random.split(self.key, 3)

        size = config.image_size
        cm = getattr(config, "chl_multiplier", 2)
        # resolution->channel map: the reference BagGAN generator defaults
        # to a LEANER map than rosinality's (models/baggan/models.py:25-33
        # — 256ch@16², halving upward); honoring it means a BagGAN trained
        # from scratch here has the reference widths and its export
        # round-trips into the reference StyleGANGenerator. None keeps the
        # rosinality map (back-compat with chl_multiplier configs).
        r2c = getattr(config, "res2chlmap", None)
        if r2c == "baggan":
            from ganecdotes_tpu.models.baggan.convert import (
                BAGGAN_RES_TO_CHANNEL_MAP,
            )

            r2c = BAGGAN_RES_TO_CHANNEL_MAP
        # jit the inits: eager per-op dispatch is ~100x slower on a TPU relay
        self.generator_params = jax.jit(
            lambda k: init_generator(
                k, size, style_dim=config.latent_dim,
                n_mlp=config.generator_params.get("mlp_layers", 8),
                channel_multiplier=cm, res2chlmap=r2c,
            )[0]
        )(kg)
        from ganecdotes_tpu.models.stylegan2.generator import generator_meta

        self.gen_meta = generator_meta(
            size, style_dim=config.latent_dim,
            n_mlp=config.generator_params.get("mlp_layers", 8),
            channel_multiplier=cm, res2chlmap=r2c,
        )
        self.logger.info("Initialized Generator " + "+" * 40)

        self.latent_size = config.latent_dim
        self.mean_path_length = jnp.asarray(0.0, jnp.float32)
        self.ada_state = ada_init_state(getattr(config, "augment_p", 0) or 0.0)
        self.iter_no = 0

        if self.is_train:
            self.disc_params = jax.jit(
                lambda k: init_discriminator(
                    k, size, channel_multiplier=cm,
                    in_channels=getattr(config, "num_channels", 3),
                )[0]
            )(kd)
            from ganecdotes_tpu.models.stylegan2.discriminator import (
                discriminator_meta,
            )

            self.disc_meta = discriminator_meta(size)
            self.logger.info("Initialized Discriminator " + "+" * 40)

            self.adversarial_loss = gan_loss(config.gan_mode)

            g_rr = config.g_reg_ratio
            d_rr = config.d_reg_ratio
            self.optimizer_g = optax.inject_hyperparams(optax.adam)(
                learning_rate=config.lr * g_rr,
                b1=config.beta1, b2=0.99**g_rr,
            )
            self.optimizer_d = optax.inject_hyperparams(optax.adam)(
                learning_rate=config.lr * d_rr,
                b1=config.beta1, b2=0.99**d_rr,
            )
            self.opt_g_state = self.optimizer_g.init(self.generator_params)
            self.opt_d_state = self.optimizer_d.init(self.disc_params)
            self.optimizers = [self.optimizer_g, self.optimizer_d]
            self._base_lrs = (config.lr * g_rr, config.lr * d_rr)

            self._build_steps()

    # ------------------------------------------------------------------

    @property
    def ada_aug_p(self):
        return float(self.ada_state["p"])

    @property
    def r_t_stat(self):
        # read lazily: syncing this per iteration stalls the step pipeline
        return float(self.ada_state["r_t"])

    def _build_steps(self):
        cfg = self.config
        meta = self.gen_meta
        d_meta = self.disc_meta
        adv = self.adversarial_loss
        use_aug = getattr(cfg, "augment", False)
        # ADA warp dispatch (measured policy, docs/PERFORMANCE.md):
        # 'shear' = the scatter-free two-pass warp (ops/affine_warp.py) —
        # 96x faster fwd+bwd than the gather at 256^2 batch 16;
        # 'shear_pallas' = the same passes through the fused VMEM kernel
        # (ops/affine_warp_pallas.py) — bitwise-identical on hardware at
        # both production scales incl. gradients, and another 1.3-1.4x on
        # the full training iteration (R1 265.6->88.6 ms, G 102.9->57.7);
        # 'exact' keeps the grid_sample oracle semantics. The default
        # 'auto' picks the kernel on TPU and the XLA passes elsewhere.
        warp_impl = getattr(cfg, "ada_warp_impl", "auto")
        if warp_impl == "auto":
            warp_impl = (
                "shear_pallas"
                if jax.default_backend() == "tpu"
                else "shear"
            )
        self._ada_warp_impl = warp_impl
        gan_mode = cfg.gan_mode
        # 'all' = checkpoint every D forward under wgangp (lowest peak);
        # 'gp' = checkpoint only the gradient-penalty branch (faster iter,
        # higher peak — see d_loss_fn)
        wgangp_remat = getattr(cfg, "wgangp_remat", "all")
        if wgangp_remat not in ("all", "gp"):
            # a typo ('ALL', 'full', ...) would silently select the
            # higher-peak 'gp' behavior and risk intermittent HBM OOM at
            # the production shape (see d_loss_fn) — fail like
            # get_scheduler does for unknown lr policies
            raise NotImplementedError(
                f"wgangp_remat={wgangp_remat!r}: expected 'all' or 'gp'"
            )
        # compute_dtype='bfloat16' runs the D and G adversarial steps'
        # convs/matmuls in bf16 (full MXU rate on TPU; fp32 convs run at
        # ~half) with fp32 master params, fp32 Adam moments, and fp32
        # losses/ADA statistics. The reference trains fp32 throughout
        # (models/baggan/bagganhq.py); the default (None/'float32') keeps
        # that bit-exact parity path. The lazy regularizer steps (R1, PPL)
        # and the wgangp gradient-penalty branch always stay fp32 — their
        # grad-of-grad norm estimates are what bf16 rounding would bias.
        comp_dtype = getattr(cfg, "compute_dtype", None)
        if isinstance(comp_dtype, str):
            comp_dtype = jnp.dtype(comp_dtype).type
        if comp_dtype is not None and comp_dtype not in (
            jnp.float32, jnp.bfloat16,
        ):
            raise NotImplementedError(
                f"compute_dtype={getattr(cfg, 'compute_dtype', None)!r}: "
                "expected None, 'float32' or 'bfloat16'"
            )
        if comp_dtype == jnp.float32:
            comp_dtype = None  # fp32 IS the default path; avoid no-op casts

        n_latent = meta["n_latent"]

        def synth(g_params, latents, key, inject_index):
            # build the (possibly style-mixed) w+ here with a TRACED
            # inject_index: a where() over a static arange instead of the
            # repeat/concat in generator_forward, whose static index would
            # recompile d_step/g_step on every random mixing draw (~70 s/it)
            from ganecdotes_tpu.models.stylegan2.generator import (
                mapping_apply,
            )

            ws = [mapping_apply(g_params, z) for z in latents]
            if len(ws) == 1:
                lat = jnp.repeat(ws[0][:, None, :], n_latent, axis=1)
            else:
                rows = jnp.arange(n_latent)[None, :, None]
                lat = jnp.where(
                    rows < inject_index, ws[0][:, None, :], ws[1][:, None, :]
                )
            return generator_forward(
                g_params, meta, [lat], input_is_latent=True,
                randomize_noise=True, noise_key=key, return_latents=True,
                dtype=comp_dtype,
            )

        def d_loss_fn(d_params, fake_img, real_img, ada_p, key):
            k1, k2, k3 = jax.random.split(key, 3)
            d_in_fake, d_in_real = fake_img, real_img
            if comp_dtype is not None:
                # fake_img is already comp_dtype (synth); the real batch
                # enters fp32 from the loader. conv2d_nhwc casts weights to
                # the activation dtype, so bf16 inputs make every D conv a
                # full-rate bf16 MXU op with fp32 master params untouched.
                d_in_fake = d_in_fake.astype(comp_dtype)
                d_in_real = d_in_real.astype(comp_dtype)
            if use_aug:
                d_in_fake, _ = augment(d_in_fake, ada_p, k1,
                                       warp_impl=warp_impl)
                d_in_real, _ = augment(d_in_real, ada_p, k2,
                                       warp_impl=warp_impl)
            fwd = discriminator_forward
            if gan_mode == "wgangp" and wgangp_remat == "all":
                # rematerialize every D forward under wgangp: the
                # gradient penalty's grad-of-grad makes XLA keep ALL
                # D residuals live — measured (AOT memory_analysis,
                # 256² batch 20 production config) d_step peaks at
                # 15.57 GiB on a 16 GiB chip without remat, 12.21 GiB
                # with; the un-remat'd form intermittently OOMs when any
                # other program's buffers are resident.
                # wgangp_remat='gp' checkpoints ONLY the penalty branch
                # below (whose grad-of-grad is what pins the residuals)
                # and leaves these two plain forwards unremat'd — buys
                # back the ~13% iter-time remat tax if the selective
                # peak still fits; see docs/PERFORMANCE.md for the
                # AOT-measured peaks of both modes.
                ckpt_fwd = jax.checkpoint(
                    lambda dp, x: discriminator_forward(dp, d_meta, x)
                )
                fwd = lambda dp, _meta, x: ckpt_fwd(dp, x)
            pred_fake = fwd(d_params, d_meta, d_in_fake)
            pred_real = fwd(d_params, d_meta, d_in_real)
            if comp_dtype is not None:
                # losses and the ADA r_t statistic accumulate in fp32
                pred_fake = pred_fake.astype(jnp.float32)
                pred_real = pred_real.astype(jnp.float32)
            loss_d_out = adv(pred_fake, False)
            loss_d_ref = adv(pred_real, True)
            if gan_mode == "wgangp":
                gp, _ = gradient_penalty(
                    jax.checkpoint(
                        lambda x: discriminator_forward(d_params, d_meta, x)
                    ),
                    # the penalty's grad-norm estimate stays fp32 even under
                    # compute_dtype='bfloat16' (see knob comment above)
                    d_in_real.astype(jnp.float32),
                    d_in_fake.astype(jnp.float32),
                    k3,
                )
                loss = (loss_d_out + loss_d_ref) * 0.25 + gp * 0.5
            else:
                loss = loss_d_out + loss_d_ref
            return loss, (loss_d_out, loss_d_ref, pred_real)

        tune_ada = use_aug and (getattr(cfg, "augment_p", 0) or 0) == 0

        def d_step(d_params, opt_state, g_params, real_img, z, key, ada_state,
                   inject_index):
            ada_p = ada_state["p"]
            kz, kd = jax.random.split(key)
            fake_img, _ = synth(g_params, z, kz, inject_index)
            fake_img = jax.lax.stop_gradient(fake_img)
            (loss, aux), grads = jax.value_and_grad(d_loss_fn, has_aux=True)(
                d_params, fake_img, real_img, ada_p, kd
            )
            updates, opt_state = self.optimizer_d.update(grads, opt_state, d_params)
            d_params = optax.apply_updates(d_params, updates)
            if tune_ada:
                # ADA controller folded into the jitted step: a host-side
                # update costs a device round-trip per iteration
                ada_state = ada_update(
                    ada_state, aux[2], cfg.ada_target, cfg.ada_length, 8
                )
            if comp_dtype is not None:
                # callers (snapshots, image pools) expect fp32 images; the
                # chunked scan discards this leaf so XLA DCEs the cast there
                fake_img = fake_img.astype(jnp.float32)
            return d_params, opt_state, loss, aux, fake_img, ada_state

        def r1_step(d_params, opt_state, real_img, key, ada_p):
            def loss_fn(d_params_inner):
                def disc_fn(x):
                    xx = x
                    if use_aug:
                        xx, _ = augment(xx, ada_p, key,
                                        warp_impl=warp_impl)
                    return discriminator_forward(d_params_inner, d_meta, xx)

                penalty, pred = r1_penalty(disc_fn, real_img)
                loss = (
                    cfg.r1_lambda / 2 * penalty * cfg.d_reg_every
                    + 0 * pred[0, 0]
                )
                return loss

            loss, grads = jax.value_and_grad(loss_fn)(d_params)
            updates, opt_state = self.optimizer_d.update(grads, opt_state, d_params)
            return optax.apply_updates(d_params, updates), opt_state, loss

        def g_loss_fn(g_params, d_params, z, key, ada_p, inject_index):
            kz, ka = jax.random.split(key)
            fake_img, _ = synth(g_params, z, kz, inject_index)
            d_in = fake_img
            if use_aug:
                d_in, _ = augment(d_in, ada_p, ka, warp_impl=warp_impl)
            pred_fake = discriminator_forward(d_params, d_meta, d_in)
            if comp_dtype is not None:
                pred_fake = pred_fake.astype(jnp.float32)
            return adv(pred_fake, True)

        def g_step(g_params, opt_state, d_params, z, key, ada_p,
                   inject_index):
            loss, grads = jax.value_and_grad(g_loss_fn)(
                g_params, d_params, z, key, ada_p, inject_index
            )
            updates, opt_state = self.optimizer_g.update(grads, opt_state, g_params)
            return optax.apply_updates(g_params, updates), opt_state, loss

        def ppl_step(g_params, opt_state, z, key, mean_path_length):
            kz, kn = jax.random.split(key)
            size = meta["size"]
            noise_imgs = jax.random.normal(
                kn, (z[0].shape[0], size, size, getattr(cfg, "num_channels", 3))
            ) / float(size)

            def loss_fn(g_params_inner):
                # w+ from the mapping MLP alone — the PPL Jacobian probes
                # the stored-noise synthesis g(w+), so synthesizing a second
                # random-noise image first (as a literal translation of the
                # reference's forward would) only doubles the cost
                from ganecdotes_tpu.models.stylegan2.generator import (
                    mapping_apply,
                )

                w = mapping_apply(g_params_inner, z[0])
                lat = jnp.repeat(w[:, None, :], meta["n_latent"], axis=1)

                # PPL through the synthesis only (w⁺ -> image), as in the
                # reference's autograd.grad wrt returned latents (:254-257)
                def gen_from_lat(l):
                    im, _ = generator_forward(
                        g_params_inner, meta, [l], input_is_latent=True,
                        randomize_noise=False, return_latents=True,
                    )
                    return im

                ppl, new_mean, lengths = path_length_penalty(
                    gen_from_lat, lat, noise_imgs, mean_path_length,
                    decay=cfg.ppl_decay,
                )
                weighted = cfg.ppl_lambda * cfg.g_reg_every * ppl
                return weighted, (new_mean, ppl)

            (loss, (new_mean, raw_ppl)), grads = jax.value_and_grad(
                loss_fn, has_aux=True
            )(g_params)
            updates, opt_state = self.optimizer_g.update(grads, opt_state, g_params)
            return (
                optax.apply_updates(g_params, updates),
                opt_state,
                raw_ppl,
                new_mean,
            )

        # --- fused multi-iteration (D,G) chunk ------------------------
        # Through the TPU relay each jitted dispatch costs ~80 ms of
        # latency, and one GAN iteration is 2-4 dispatches — measured
        # ~0.5 s/iter of pure dispatch overhead on top of 0.35-0.45 s of
        # device work (docs/PERFORMANCE.md). The chunk step runs a RUN of
        # consecutive plain iterations (D step + G step, no lazy reg due)
        # inside one lax.scan under one jit — one dispatch for the whole
        # run. Lazy-reg iterations (R1 every d_reg_every, PPL every
        # g_reg_every — sparse by design) go through the ordinary
        # single-step path. Fusing R1/PPL into the scan as lax.cond
        # branches was tried and rejected with measurements: the
        # double-grad branches inside cond inside scan blow up XLA
        # compile (~6x per construct) AND the union program OOMs 16 GB
        # HBM at the production 256^2/batch-20 shape (XLA starts
        # remat-compressing 320 MB temps); the hybrid keeps per-dispatch
        # memory at single-step scale.
        #
        # Per-iteration host randomness (latent key, mixing coin, inject
        # index, step keys) is staged into the scan xs by
        # optimize_parameters_chunk in EXACTLY the order the single-step
        # path consumes the host streams, so chunked and single-step
        # training follow identical trajectories (tests/test_gan.py
        # chunk-parity test).
        mix_prob = getattr(cfg, "mixing_prob", 0.0)
        lat_dim = cfg.latent_dim

        def dg_body(carry, x):
            g_params, opt_g, d_params, opt_d, ada_state, losses = carry
            ada_p_pre = ada_state["p"]
            bsize = x["real"].shape[0]
            z = jax.random.normal(x["kz"], (2, bsize, lat_dim))
            # mixing handled via the traced inject index: host stages
            # n_latent for unmixed draws, so where(rows < n_latent, w0, w1)
            # reduces exactly to the single-latent repeat
            z_list = [z[0], z[1]] if mix_prob > 0 else [z[0]]

            d_params, opt_d, loss_d, aux, _fake, ada_state = d_step(
                d_params, opt_d, g_params, x["real"], z_list, x["kd"],
                ada_state, x["inject"],
            )
            g_params, opt_g, loss_g = g_step(
                g_params, opt_g, d_params, z_list, x["kg"], ada_p_pre,
                x["inject"],
            )
            losses = {
                "d": loss_d, "d_out": aux[0], "d_ref": aux[1],
                "g_gan": loss_g,
            }
            # stable carry avals across iterations
            losses = {k: jnp.asarray(v, jnp.float32)
                      for k, v in losses.items()}
            return (g_params, opt_g, d_params, opt_d, ada_state,
                    losses), None

        def run_dg_chunk(carry, xs):
            carry, _ = jax.lax.scan(dg_body, carry, xs)
            return carry


        # inject_index is traced (see synth): one compiled variant per
        # latent-list structure, no per-draw recompiles
        if getattr(cfg, "data_parallel", False) and jax.device_count() > 1:
            # data-parallel SPMD over the device mesh: params/opt-states/ADA
            # replicated, image+latent batches sharded on 'data'. The batch-
            # mean losses make XLA insert the gradient psum over ICI — the
            # TPU-native form of the reference's DDP wrap + guarded
            # all_reduce (gan_util.py:154-160, lib/gan/ada.py:15-25).
            # Batch size must be a multiple of the device count.
            from ganecdotes_tpu.parallel.mesh import batch_shardings, make_mesh

            mesh = make_mesh()
            repl, bsh = batch_shardings(mesh)
            self.mesh = mesh
            self._d_step = jax.jit(
                d_step, donate_argnums=(0, 1),
                in_shardings=(repl, repl, repl, bsh, bsh, repl, repl, repl),
            )
            self._r1_step = jax.jit(
                r1_step, donate_argnums=(0, 1),
                in_shardings=(repl, repl, bsh, repl, repl),
            )
            self._g_step = jax.jit(
                g_step, donate_argnums=(0, 1),
                in_shardings=(repl, repl, repl, bsh, repl, repl, repl),
            )
            self._ppl_step = jax.jit(
                ppl_step, donate_argnums=(0, 1),
                in_shardings=(repl, repl, bsh, repl, repl),
            )
            from jax.sharding import NamedSharding, PartitionSpec as _P

            bsh2 = NamedSharding(mesh, _P(None, "data"))
            xs_sh = {
                "real": bsh2, "kz": repl, "kd": repl, "kg": repl,
                "inject": repl,
            }
            self._chunk_step = jax.jit(
                run_dg_chunk, donate_argnums=(0,),
                in_shardings=(repl, xs_sh),
            )
        else:
            self.mesh = None
            # (params, opt_state) are donated: the updated tree aliases the
            # old one's buffers in place of a fresh allocation, and Adam's
            # m/v update writes in place — at 512^2 this trims the live set
            # by ~3x the net's param bytes exactly at the backward-pass peak
            # (the wgangp GP grad-of-grad is what pushes 16 GiB HBM,
            # docs/PERFORMANCE.md). Callers reassign both from the step's
            # returns; ada_state is NOT donated because optimize_parameters
            # reads ada_state["p"] before the d_step and feeds it to the
            # r1/g steps of the same iteration.
            self._d_step = jax.jit(d_step, donate_argnums=(0, 1))
            self._r1_step = jax.jit(r1_step, donate_argnums=(0, 1))
            self._g_step = jax.jit(g_step, donate_argnums=(0, 1))
            self._ppl_step = jax.jit(ppl_step, donate_argnums=(0, 1))
            self._chunk_step = jax.jit(run_dg_chunk, donate_argnums=(0,))

    # ------------------------------------------------------------------

    def _next_raw_key(self):
        """Fresh (2,) uint32 legacy-PRNG key data from the host stream."""
        return self._host_key_rng.randint(0, 2**32, size=(2,), dtype=np.uint32)

    def _draw_latents_jit(self, raw_key, n):
        """(2, n, latent) normal draw as ONE jitted (async) dispatch."""
        fn = self._draw_latents_cache.get(n)
        if fn is None:
            lat = self.latent_size
            fn = jax.jit(lambda k: jax.random.normal(k, (2, n, lat)))
            self._draw_latents_cache[n] = fn
        return fn(jnp.asarray(raw_key))

    def set_input(self, data_sample=None, iter_no=None, epoch_no=None,
                  latent=None, disentangled=False, gen_args=None):
        """Stage a training batch (ref bagganhq.py:155-205)."""
        self.iter_no = iter_no if iter_no is not None else self.iter_no
        self.epoch_no = epoch_no
        cfg = self.config

        if data_sample is not None:
            img = data_sample["ct"] if isinstance(data_sample, dict) else data_sample
            self.ref_image = jnp.asarray(img)
            self.bsize = self.ref_image.shape[0]
        else:
            self.bsize = cfg.batch_size
            self.ref_image = jnp.zeros(
                (self.bsize, cfg.image_size, cfg.image_size,
                 getattr(cfg, "num_channels", 3))
            )

        if latent is None:
            mix = getattr(cfg, "mixing_prob", 0.0)
            # mixing coin + inject index drawn on the HOST: a per-iteration
            # device scalar readback stalls the step pipeline. The latent
            # draw itself runs under ONE jitted dispatch (async through the
            # relay): every EAGER jax.random op is a synchronous relay
            # round-trip (~0.1 s each, measured), and six of them per
            # iteration dominated the real CLI loop (1.1 s/iter vs 0.35 s
            # of device work).
            kz = self._next_raw_key()
            z = self._draw_latents_jit(kz, self.bsize)
            if mix > 0 and self._host_rng.uniform() < mix:
                self.input_latent = [z[0], z[1]]
                # ref random.randint(1, n_latent-1) is INCLUSIVE of both ends
                self.inject_index = int(
                    self._host_rng.randint(1, self.gen_meta["n_latent"])
                )
            else:
                self.input_latent = [z[0]]
                self.inject_index = None
        else:
            self.input_latent = latent
            self.inject_index = None
        self.gen_args = gen_args

    def forward(self):
        """(image, latent, features) forward pass (ref :207-223)."""
        kn = self._next_raw_key()
        img, lat, feats = generator_forward(
            self.generator_params, self.gen_meta, self.input_latent,
            input_is_latent=False, randomize_noise=True, noise_key=kn,
            inject_index=self.inject_index, return_latents="all",
            **(self.gen_args or {}),
        )
        self.out_image, self.out_latent, self.features = img, lat, feats
        return self.out_image

    def optimize_parameters(self):
        """One full GAN iteration: D, lazy R1, ADA tune, G, lazy PPL
        (ref bagganhq.py:432-483)."""
        cfg = self.config
        # per-step keys as raw host uint32 key data: zero eager device ops
        # (each eager split is a synchronous relay round-trip)
        kd, kr, kg, kp = (self._next_raw_key() for _ in range(4))
        ada_p = self.ada_state["p"]

        (self.disc_params, self.opt_d_state, self.loss_d,
         (self.loss_d_out, self.loss_d_ref, pred_real), fake_img,
         self.ada_state) = self._d_step(
            self.disc_params, self.opt_d_state, self.generator_params,
            self.ref_image, self.input_latent, kd, self.ada_state,
            jnp.asarray(self.inject_index or 0, jnp.int32),
        )

        if self.iter_no % cfg.d_reg_every == 0:
            self.disc_params, self.opt_d_state, self.loss_d_r1 = self._r1_step(
                self.disc_params, self.opt_d_state, self.ref_image, kr, ada_p
            )

        self.generator_params, self.opt_g_state, self.loss_g_gan = self._g_step(
            self.generator_params, self.opt_g_state, self.disc_params,
            self.input_latent, kg, ada_p,
            jnp.asarray(self.inject_index or 0, jnp.int32),
        )
        self.loss_g = self.loss_g_gan

        if getattr(cfg, "use_ppl", False) and self.iter_no % cfg.g_reg_every == 0:
            shrink = getattr(cfg, "path_batch_shrink", 2)
            pb = max(1, self.bsize // shrink)
            z = [self._draw_latents_jit(self._next_raw_key(), pb)[0]]
            (self.generator_params, self.opt_g_state, self.loss_g_ppl,
             self.mean_path_length) = self._ppl_step(
                self.generator_params, self.opt_g_state, z, kp,
                self.mean_path_length,
            )

        self.iter_no += 1

    def _run_dg_chunk(self, real_run, kz, kd, kg, inject):
        """Dispatch one fused run of plain (D,G) iterations."""
        xs = {
            "real": np.stack(real_run), "kz": np.stack(kz),
            "kd": np.stack(kd), "kg": np.stack(kg),
            "inject": np.asarray(inject, np.int32),
        }
        # distinct zero buffers: donation rejects the same buffer twice
        losses = {name: jnp.zeros((), jnp.float32)
                  for name in ("d", "d_out", "d_ref", "g_gan")}
        carry = (
            self.generator_params, self.opt_g_state, self.disc_params,
            self.opt_d_state, self.ada_state, losses,
        )
        (self.generator_params, self.opt_g_state, self.disc_params,
         self.opt_d_state, self.ada_state, losses) = self._chunk_step(
            carry, xs
        )
        # attribute views for get_current_losses / loss_names (device
        # scalars; only float()'d when actually printed)
        self.loss_d = losses["d"]
        self.loss_d_out = losses["d_out"]
        self.loss_d_ref = losses["d_ref"]
        self.loss_g_gan = losses["g_gan"]
        self.loss_g = losses["g_gan"]

    def optimize_parameters_chunk(self, real_batches):
        """Run ``len(real_batches)`` full GAN iterations with runs of
        consecutive PLAIN iterations (no lazy reg due) fused into single
        ``lax.scan`` dispatches.

        Through the TPU relay every dispatch costs ~80 ms of latency and
        the single-step path pays 2-4 of them per iteration; fusing the
        plain runs cuts dispatches ~6x at the production cadence
        (d_reg_every=16, g_reg_every=4 -> 17 dispatches per 16 iterations
        instead of ~96). Lazy-reg iterations delegate to set_input +
        optimize_parameters — literally the single-step code. Host
        randomness is consumed from the same streams in the same order as
        the single-step path, so a chunked run follows the exact
        trajectory a single-stepped run with the same seed would
        (parity-tested in tests/test_gan.py).

        real_batches: sequence of (B,H,W,C) arrays (or {'ct': array}
        samples, matching ``set_input``).

        Note: the ``set_input``-style attributes (``ref_image``,
        ``input_latent``, ``inject_index``, ``epoch_no``) are only
        refreshed by the delegated lazy-reg iterations — the fused plain
        iterations stage their inputs internally. Call ``set_input``
        before ``forward()``/``test()`` after a chunk.
        """
        cfg = self.config
        n_latent = self.gen_meta["n_latent"]
        mix = getattr(cfg, "mixing_prob", 0.0)
        use_ppl = getattr(cfg, "use_ppl", False)

        run = {"real": [], "kz": [], "kd": [], "kg": [], "inject": []}

        def flush():
            if run["real"]:
                self._run_dg_chunk(run["real"], run["kz"], run["kd"],
                                   run["kg"], run["inject"])
                self.iter_no += len(run["real"])
                for v in run.values():
                    v.clear()

        for b in real_batches:
            it = self.iter_no + len(run["real"])
            is_reg = (it % cfg.d_reg_every == 0) or (
                use_ppl and it % cfg.g_reg_every == 0
            )
            if is_reg:
                flush()
                self.set_input(data_sample=b, iter_no=self.iter_no)
                self.optimize_parameters()
                continue
            # stage a plain iteration, consuming the host streams in the
            # EXACT single-step order: latent key, mixing coin (+ inject
            # draw), then the 4 step keys (kr/kp drawn and discarded —
            # the single path draws them unconditionally)
            run["real"].append(
                np.asarray(b["ct"] if isinstance(b, dict) else b)
            )
            run["kz"].append(self._next_raw_key())
            if mix > 0 and self._host_rng.uniform() < mix:
                run["inject"].append(int(self._host_rng.randint(1, n_latent)))
            else:
                run["inject"].append(n_latent)
            kd, _kr, kg, _kp = (self._next_raw_key() for _ in range(4))
            run["kd"].append(kd)
            run["kg"].append(kg)
        flush()

    def update_learning_rate(self, metric=None):
        mult = super().update_learning_rate(metric)
        # keep the hyperparam leaf avals IDENTICAL to what
        # inject_hyperparams stored (strong f32 scalars): assigning a raw
        # python float changes the jit signature (weak type) at the second
        # epoch, silently RETRACING + RECOMPILING every step program —
        # ~12 min of duplicate compiles on TPU, and the stale epoch-1
        # executables stay cached, which pushed HBM over the edge with the
        # fused chunk program resident (observed RESOURCE_EXHAUSTED)
        self.opt_g_state.hyperparams["learning_rate"] = jnp.asarray(
            self._base_lrs[0] * mult, jnp.float32
        )
        self.opt_d_state.hyperparams["learning_rate"] = jnp.asarray(
            self._base_lrs[1] * mult, jnp.float32
        )
        return mult

    def test(self):
        """No-grad forward for sampling (ref :486-501)."""
        return self.forward()
