"""SimCLR hidden-feature clustering baseline.

Re-design of baseline/hfc_with_simclr/simclr_clustering.py:14-404: NT-Xent
contrastive loss over pixel pairs from two latent-perturbed views. The
reference builds its 40×40 similarity and loss matrices with O(B²) python
loops (:236-258); here the whole loss is one vectorized log-softmax.

Deliberate divergence (bug not replicated): the reference sums positive-pair
losses at interleaved indices (2k-1, 2k) (:261-263), which pairs view-t of
pixel k-1 with view-s of pixel k (and wraps to (39, 0) at k=0) — mismatched
positives. The intended NT-Xent positives (2k, 2k+1) are used here.
"""

import math
import os

import jax
import jax.numpy as jnp
import optax

from ganecdotes_tpu.models.stylegan2.generator import mapping_apply
from ganecdotes_tpu.selfsup.augmentor import (
    perturbed_features,
    random_rotate_flip_params,
    rotate_flip_features,
)
from ganecdotes_tpu.selfsup.embed import (
    pixel_feature_gather,
    project_feature_maps,
)
from ganecdotes_tpu.selfsup.swav import feature_norm_map
from ganecdotes_tpu.utils.serialization import load_pytree, save_pytree


def init_simclr_params(key, hlen, nclasses):
    """Linear(hlen→ncls, no bias) → BN → LeakyReLU → Linear(ncls→ncls, no bias)
    (simclr_clustering.py:147-158)."""
    k1, k2 = jax.random.split(key)
    b1 = 1.0 / math.sqrt(hlen)
    b2 = 1.0 / math.sqrt(nclasses)
    return {
        "lin1": {"weight": jax.random.uniform(k1, (hlen, nclasses), minval=-b1, maxval=b1)},
        "bn": {"gamma": jnp.ones((nclasses,)), "beta": jnp.zeros((nclasses,)),
               "mean": jnp.zeros((nclasses,)), "var": jnp.ones((nclasses,))},
        "lin2": {"weight": jax.random.uniform(k2, (nclasses, nclasses), minval=-b2, maxval=b2)},
    }


def import_torch_simclr_projection(path):
    """Reference ``projection.pt`` -> params pytree.

    The reference persists the WHOLE projection module via
    ``torch.save(self.projection)`` (simclr_clustering.py:62,280):
    Sequential(Linear(hlen, ncls, bias=False), BatchNorm1d, LeakyReLU,
    Linear(ncls, ncls, bias=False)). Accepts the pickled module or a bare
    state_dict; torch (out, in) Linear weights transpose to (in, out)."""
    import numpy as _np

    import torch

    obj = torch.load(path, map_location="cpu", weights_only=False)
    sd = obj.state_dict() if hasattr(obj, "state_dict") else obj
    sd = {k: _np.asarray(v.detach().cpu(), dtype=_np.float32)
          for k, v in sd.items()}
    prefix = "0." if "0.weight" in sd else ""
    bn = "1." if prefix else "bn."
    lin2 = "3." if prefix else "lin2."
    return {
        "lin1": {"weight": jnp.asarray(sd[f"{prefix}weight"].T)},
        "bn": {
            "gamma": jnp.asarray(sd[f"{bn}weight"]),
            "beta": jnp.asarray(sd[f"{bn}bias"]),
            "mean": jnp.asarray(sd[f"{bn}running_mean"]),
            "var": jnp.asarray(sd[f"{bn}running_var"]),
        },
        "lin2": {"weight": jnp.asarray(sd[f"{lin2}weight"].T)},
    }


def simclr_projection(params, z, train=True, eps=1e-5):
    """Post-first-linear tail. z: (N, nclasses) (first matmul already applied).

    The reference never puts the projection in eval mode, so BN uses batch
    stats in both train and predict; same here.
    """
    del train
    mu, var = z.mean(axis=0), z.var(axis=0)
    h = (z - mu) * jax.lax.rsqrt(var + eps) * params["bn"]["gamma"] + params["bn"]["beta"]
    h = jnp.where(h >= 0, h, 0.01 * h)  # nn.LeakyReLU default slope
    return h @ params["lin2"]["weight"]


def nt_xent_loss(scores_s, scores_t, temperature):
    """Vectorized NT-Xent over interleaved (s, t) pixel pairs.

    scores_*: (B, D). Builds the 2B×2B cosine-similarity matrix; positives
    are (2k, 2k+1)/(2k+1, 2k); the denominator excludes self-similarity.
    """
    b = scores_s.shape[0]
    z = jnp.stack([scores_s, scores_t], axis=1).reshape(2 * b, -1)  # interleave
    z = z / jnp.maximum(jnp.linalg.norm(z, axis=1, keepdims=True), 1e-12)
    sim = (z @ z.T) / temperature  # (2B, 2B)
    mask = jnp.eye(2 * b, dtype=bool)
    neg_inf = jnp.finfo(sim.dtype).min
    logits = jnp.where(mask, neg_inf, sim)
    log_den = jax.nn.logsumexp(logits, axis=1)  # excludes self
    idx = jnp.arange(2 * b)
    pos_idx = jnp.where(idx % 2 == 0, idx + 1, idx - 1)
    pos = sim[idx, pos_idx]
    loss = -(pos - log_den)
    return loss.sum() / (2 * b)


def make_simclr_train_step(gen_meta, model_config, perturb_args, simclr_args,
                           mean_latent_w, image_hw):
    h, w = image_hw
    npix = h * w
    batch = simclr_args["batch_size"]
    n_layers = perturb_args["n_layers"]
    perturb_std = tuple(perturb_args["perturb_std"])
    truncation = model_config["truncation"]
    latent_dim = model_config["latent_dim"]
    hlen = simclr_args["hlen"]
    temperature = simclr_args["temperature"]
    fixed_layer = perturb_args.get("layer_no")

    optimizer = optax.lars(
        learning_rate=simclr_args["train_args"]["lr"],
        momentum=simclr_args["train_args"].get("momentum", 0.9),
        trust_coefficient=simclr_args["trust_coeff"],
    )

    def view(gen_params, key, w_plus, layer_no, k_aug):
        _, feats = perturbed_features(
            gen_params, gen_meta, w_plus, key, layer_no, n_layers,
            perturb_std, truncation, mean_latent_w,
        )
        ang, flip = random_rotate_flip_params(k_aug)
        return rotate_flip_features(feats, ang, flip)

    def scores_of(params, feats, picks):
        # per-pixel F.normalize precedes the projection (ref :191, :203)
        x = pixel_feature_gather(feats, picks, (h, w), hlen=hlen)[0]  # (B, hlen)
        x = x / jnp.maximum(jnp.linalg.norm(x, axis=1, keepdims=True), 1e-12)
        z = x @ params["lin1"]["weight"]
        return simclr_projection(params, z)

    def loss_fn(params, feats_s, feats_t, picks):
        s = scores_of(params, feats_s, picks)
        t = scores_of(params, feats_t, picks)
        return nt_xent_loss(s, t, temperature)

    def step(gen_params, params, opt_state, key):
        k_lat, k_layer, k_vs, k_vt, k_as, k_at, k_pick = jax.random.split(key, 7)
        z = jax.random.normal(k_lat, (1, latent_dim))
        w_lat = mapping_apply(gen_params, z)
        w_tr = mean_latent_w + truncation * (w_lat - mean_latent_w)
        w_plus = jnp.repeat(w_tr[:, None, :], gen_meta["n_latent"], axis=1)

        if fixed_layer is None:
            # drawn independently per view, as in the reference
            # (simclr_clustering.py perturbs each view with its own choice)
            k_ls, k_lt = jax.random.split(k_layer)
            layer_s = jax.random.randint(k_ls, (), 0, n_layers)
            layer_t = jax.random.randint(k_lt, (), 0, n_layers)
        else:
            layer_s = layer_t = jnp.asarray(fixed_layer)

        feats_s = view(gen_params, k_vs, w_plus, layer_s, k_as)
        feats_t = view(gen_params, k_vt, w_plus, layer_t, k_at)
        picks = jax.random.permutation(k_pick, npix)[:batch]

        loss, grads = jax.value_and_grad(loss_fn)(params, feats_s, feats_t, picks)
        updates, opt_state = optimizer.update(grads, opt_state, params)
        params = optax.apply_updates(params, updates)
        return params, opt_state, loss

    return optimizer, jax.jit(step)


def fold_linear_into_head(seg_params, linear_weight):
    """Compose a per-pixel linear map into the head's FIRST layer — exact.

    The SimCLR projection tail ends in ``lin2`` (512→512, per-pixel linear),
    immediately consumed by the segmentor head whose first layer is also
    linear (a conv or a Linear). Composing them removes the full-resolution
    512-wide ``lin2`` output from HBM entirely: measured at 256² batch 96
    this takes the inference program 225 → 143 ms (427 → 672 img/s).

    ``conv(h @ L, W) == conv(h, W')`` with ``W'[kh,kw,i,o] = Σ_j L[i,j]
    W[kh,kw,j,o]`` — dilation/stride-independent, so it works for every
    FCN head size; for the 'Lin' head it is a plain matmul compose.
    """
    first = seg_params[0]
    w = first["weight"]
    if w.ndim == 4:
        folded = jnp.einsum("ij,hwjo->hwio", linear_weight, w)
    else:
        folded = linear_weight @ w
    return [dict(first, weight=folded)] + list(seg_params[1:])


def simclr_predict_segment(ssl_params, features, seg_params, seg_size, hlen,
                           interp="nearest"):
    """Batched codes→head logits, fused (the fast inference path).

    Per-image BatchNorm statistics (the reference's MAX_TEST_BATCH=1
    semantics) computed as per-image axis reductions — no vmap — with
    ``lin2`` folded into the head's first layer (see fold_linear_into_head)
    so the second full-resolution 512-wide tensor never exists. Exact
    w.r.t. the per-image vmapped form up to fp reassociation. Returns
    logits (B, H, W, n_class); callers wanting the display cluster map run
    ``simclr_predict_from_features`` on a 1-sample slice."""
    z = project_feature_maps(
        features, ssl_params["lin1"]["weight"], hlen=hlen, interp=interp
    )
    norms = feature_norm_map(features, hlen)[..., None]
    z = z * (1.0 / jnp.maximum(norms, 1e-12))
    # one-pass batch stats: jnp.mean + jnp.var chain two sequential full
    # reads of the (B, H, W, 512) z tensor (var needs mean first — ~28 ms
    # of the 167 ms batch-128 program, trace-ranked); E[z²]−E[z]² makes
    # the two reductions independent siblings over the same operand, which
    # XLA fuses into a single streamed pass. f32 accumulation; post-
    # normalize z is unit-scale so the cancellation loses ~1e-6 relative —
    # far inside the bf16 path's tolerance (cross-framework IoU pinned).
    zf = z.astype(jnp.float32)
    n_px = z.shape[1] * z.shape[2]
    mu_f = jnp.sum(zf, axis=(1, 2), keepdims=True) / n_px
    var_f = (jnp.sum(jnp.square(zf), axis=(1, 2), keepdims=True) / n_px
             - mu_f * mu_f)
    # stats cast back to z.dtype — the mean/var path's output dtypes —
    # so every downstream op keeps its previous precision/layout
    mu = mu_f.astype(z.dtype)
    var = var_f.astype(z.dtype)
    h = (
        (z - mu) * jax.lax.rsqrt(var + 1e-5)
        * ssl_params["bn"]["gamma"] + ssl_params["bn"]["beta"]
    )
    h = jnp.where(h >= 0, h, 0.01 * h)
    from ganecdotes_tpu.selfsup.heads import one_shot_segmentor_apply

    folded = fold_linear_into_head(seg_params, ssl_params["lin2"]["weight"])
    return one_shot_segmentor_apply(folded, h, seg_size)


def simclr_predict_from_features(params, features, hlen, interp="nearest"):
    """Projection scores at full resolution (ref simclr_clustering.py:365-404).

    Per-pixel normalize → projection; level-decomposed: the first matmul
    commutes with nearest upsample, the per-pixel norm is reconstructed
    from the level-wise squared-norm maps. Returns (B, H, W, ncls) NHWC.
    """
    z = project_feature_maps(
        features, params["lin1"]["weight"], hlen=hlen, interp=interp
    )
    norms = feature_norm_map(features, hlen)[..., None]
    z = z / jnp.maximum(norms, 1e-12)
    b, h, w, c = z.shape
    return simclr_projection(params, z.reshape(-1, c)).reshape(b, h, w, -1)


class SimCLRClustering:
    """Reference-API preprocessor (simclr_clustering.py:14-129)."""

    def __init__(self, model, model_config, perturb_args, simclr_args,
                 logger=None, train=True, out_dir=None, device=None, tb=None,
                 layer_hf_dim=None, seed=42):
        del device
        self.model = model
        self.model_config = model_config
        self.perturb_args = perturb_args
        self.simclr_args = simclr_args
        self.logger = logger
        # opt-in per-iter loss trace (device sync per append; used by tests)
        self.record_loss_history = False
        self.loss_history = []
        self.train = train
        self.out_dir = out_dir
        self.writer = tb
        self.layer_hf_dim = layer_hf_dim
        self.key = jax.random.PRNGKey(seed)
        self.nclasses = simclr_args["nclasses"]

        if out_dir is not None:
            os.makedirs(os.path.join(out_dir, "simclr"), exist_ok=True)
            self.params_file = os.path.join(out_dir, "simclr_params.npz")
        else:
            self.params_file = None

        self.key, km = jax.random.split(self.key)
        self.mean_latent = model.mean_latent(
            getattr(model_config, "num_latents_for_mean", 4096), key=km
        )
        self.truncation = model_config.truncation

        self.params = None
        if not self.train and self.params_file and os.path.exists(self.params_file):
            self.params = load_pytree(self.params_file)
        elif not self.train and out_dir is not None and os.path.exists(
            os.path.join(out_dir, "projection.pt")
        ):
            # reference artifact layout (simclr_clustering.py:62-67)
            self.params = import_torch_simclr_projection(
                os.path.join(out_dir, "projection.pt")
            )
            if self.logger:
                self.logger.info("Imported reference projection.pt")
        elif not self.train and self.logger:
            self.logger.info("Projection File not found - pretraining ...")

        self._image_hw = (model_config.image_size, model_config.image_size)

    def preprocess(self, input_latent):
        if self.train or self.params is None:
            self.pretrain(input_latent)

    def pretrain(self, input_latent=None):
        del input_latent
        sa = self.simclr_args
        self.key, k_init = jax.random.split(self.key)
        self.params = init_simclr_params(k_init, sa["hlen"], sa["nclasses"])

        optimizer, step = make_simclr_train_step(
            self.model.meta,
            {"truncation": self.truncation,
             "latent_dim": self.model_config.latent_dim},
            self.perturb_args, sa, self.mean_latent, self._image_hw,
        )
        opt_state = optimizer.init(self.params)

        import time as _time

        t0 = _time.time()
        for e in range(sa["num_iters"]):
            self.key, ks = jax.random.split(self.key)
            self.params, opt_state, loss = step(
                self.model.params, self.params, opt_state, ks
            )
            if self.record_loss_history:
                self.loss_history.append(float(loss))
            # float(loss) is a device sync — gate the TB scalar with the
            # print cadence so the steady-state loop stays sync-free
            if e % sa.get("epoch_print_freq", 5) == 0:
                if self.logger:
                    self.logger.info(
                        f" (Iter:{e}):\tLoss: {float(loss):.03f},"
                        f"\tTime: {_time.time() - t0:.03f}"
                    )
                if self.writer is not None:
                    self.writer.add_scalar("simclr/loss", float(loss), e)
        if self.params_file:
            save_pytree(self.params_file, self.params)

    def predict_simclr_codes(self, input_latent, input_is_latent=True):
        """(scores (B, H, W, ncls) NHWC, labels) — ref :365-404."""
        if input_latent.ndim == 1:
            input_latent = input_latent[None]
        _, feats = self.model(
            [jnp.asarray(input_latent)],
            truncation=self.truncation,
            truncation_latent=self.mean_latent,
            input_is_latent=input_is_latent,
            randomize_noise=False,
        )
        scores = simclr_predict_from_features(
            self.params, feats, self.simclr_args["hlen"],
            interp=self.simclr_args.get("hf_interp", "nearest"),
        )
        labels = jnp.argmax(scores, axis=-1)
        return scores, labels
