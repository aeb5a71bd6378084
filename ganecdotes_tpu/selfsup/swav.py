"""SwAV hidden-feature clustering — the primary self-supervised learner.

Re-design of hfc_with_swav/swav_clustering.py:28-693 as jitted pure
functions: per step, two latent-perturbed views are synthesized, a random
20k-pixel batch is embedded through the level-decomposed projection
(ganecdotes_tpu.selfsup.embed — the 1.3 GB concat tensor never exists),
Sinkhorn-Knopp codes are computed under stop_gradient, and the swapped
prediction loss updates projection+prototypes with optax LARS (replacing
apex LARC, swav_clustering.py:286-292).

Numerical note: the reference computes ``Q = exp(scores/ε)`` with ε=0.005
(swav_clustering.py:519), which overflows fp32 once score magnitudes grow;
here the global max is subtracted before the exp — mathematically identical
(the very next line renormalizes Q by its total) and overflow-proof.

Whole-loop jit: the reference's epoch loop re-enters python per sample; here
one compiled step runs per (epoch, sample) iteration, and everything from the
mapping MLP to the LARS update is a single XLA program.
"""

import math
import os

import jax
import jax.numpy as jnp
import numpy as np
import optax

from ganecdotes_tpu.models.stylegan2.generator import mapping_apply
from ganecdotes_tpu.ops.interp import resize_nearest
from ganecdotes_tpu.selfsup.augmentor import (
    perturbed_features,
    random_rotate_flip_params,
    rotate_flip_features,
)
from ganecdotes_tpu.selfsup.embed import (
    pixel_feature_maps,
    project_feature_maps,
    project_gathered,
)
from ganecdotes_tpu.utils.serialization import load_pytree, save_pytree


# ---------------------------------------------------------------------------
# params
# ---------------------------------------------------------------------------


from ganecdotes_tpu.selfsup.heads import _torch_linear_init


def init_swav_params(key, hlen, nclasses, nprototypes, projn_nw="linear"):
    """Projection (linear | 1-layer | 2-layer, swav_clustering.py:244-269)
    + prototype Linear(nclasses, nprototypes) (:270-271)."""
    k1, k2, k3 = jax.random.split(key, 3)
    if projn_nw in ("linear", "1-layer"):
        projection = [_torch_linear_init(k1, hlen, nclasses, bias=False)]
    elif projn_nw == "2-layer":
        projection = [
            _torch_linear_init(k1, hlen, nclasses, bias=False),
            {"gamma": jnp.ones((nclasses,)), "beta": jnp.zeros((nclasses,)),
             "mean": jnp.zeros((nclasses,)), "var": jnp.ones((nclasses,))},
            _torch_linear_init(k3, nclasses, nclasses, bias=False),
            {"gamma": jnp.ones((nclasses,)), "beta": jnp.zeros((nclasses,)),
             "mean": jnp.zeros((nclasses,)), "var": jnp.ones((nclasses,))},
        ]
    else:
        raise ValueError(f"unknown projn_nw {projn_nw}")
    prototype = _torch_linear_init(k2, nclasses, nprototypes, bias=True)
    return {"projection": projection, "prototype": prototype}


def import_torch_swav_modules(prototypes_path, projection_path, projn_nw):
    """Reference SwAV checkpoints -> ssl_params pytree.

    The reference persists whole ``nn`` modules via
    ``torch.save(self.prototype/self.projection)`` as ``prototypes.pt`` /
    ``projection.pt`` (swav_clustering.py:79-89,503-505). Accepts either the
    pickled modules or bare state_dicts; torch Linear (out,in) weights are
    transposed to (in,out)."""
    import torch

    def _sd(path):
        obj = torch.load(path, map_location="cpu", weights_only=False)
        sd = obj.state_dict() if hasattr(obj, "state_dict") else obj
        return {k: np.asarray(v.detach().cpu(), dtype=np.float32)
                for k, v in sd.items()}

    proj_sd = _sd(projection_path)
    proto_sd = _sd(prototypes_path)

    def _lin(sd, prefix, bias):
        p = {"weight": jnp.asarray(sd[f"{prefix}weight"].T)}
        if bias:
            p["bias"] = jnp.asarray(sd[f"{prefix}bias"])
        return p

    def _bn(sd, prefix):
        return {
            "gamma": jnp.asarray(sd[f"{prefix}weight"]),
            "beta": jnp.asarray(sd[f"{prefix}bias"]),
            "mean": jnp.asarray(sd[f"{prefix}running_mean"]),
            "var": jnp.asarray(sd[f"{prefix}running_var"]),
        }

    if projn_nw in ("linear", "1-layer"):
        # bare-Linear saves have no Sequential index prefix
        prefix = "0." if "0.weight" in proj_sd else ""
        projection = [_lin(proj_sd, prefix, bias=False)]
    elif projn_nw == "2-layer":
        projection = [
            _lin(proj_sd, "0.", bias=False),
            _bn(proj_sd, "1."),
            _lin(proj_sd, "3.", bias=False),
            _bn(proj_sd, "4."),
        ]
    else:
        raise ValueError(f"unknown projn_nw {projn_nw}")

    prototype = _lin(proto_sd, "", bias="bias" in proto_sd)
    return {"projection": projection, "prototype": prototype}


def projection_tail(params, z, projn_nw, train=True, eps=1e-5):
    """Everything after the (level-decomposed) first linear layer.

    z: (..., nclasses) output of the first matmul. nn.LeakyReLU default
    slope is 0.01 (not the 0.2 used elsewhere). 2-layer BN uses batch stats
    in train mode (stat updates are irrelevant: the reference never runs the
    2-layer head in eval mode before re-training).
    """
    if projn_nw == "linear":
        return z
    if projn_nw == "1-layer":
        return jnp.where(z >= 0, z, 0.01 * z)
    # 2-layer
    bn1, lin2, bn2 = params["projection"][1], params["projection"][2], params["projection"][3]
    flat = z.reshape(-1, z.shape[-1])
    if train:
        mu, var = flat.mean(0), flat.var(0)
    else:
        mu, var = bn1["mean"], bn1["var"]
    h = (flat - mu) * jax.lax.rsqrt(var + eps) * bn1["gamma"] + bn1["beta"]
    h = jnp.where(h >= 0, h, 0.01 * h)
    h = h @ lin2["weight"]
    if train:
        mu2, var2 = h.mean(0), h.var(0)
    else:
        mu2, var2 = bn2["mean"], bn2["var"]
    h = (h - mu2) * jax.lax.rsqrt(var2 + eps) * bn2["gamma"] + bn2["beta"]
    h = jnp.tanh(h)
    return h.reshape(z.shape)


def normalize_prototypes(params):
    """Row-L2 renorm of the prototype matrix before each step (:328-331)."""
    w = params["prototype"]["weight"]  # (nclasses, nproto); torch rows == our cols
    norm = jnp.linalg.norm(w, axis=0, keepdims=True)
    w = w / jnp.maximum(norm, 1e-12)
    new_proto = dict(params["prototype"], weight=w)
    return dict(params, prototype=new_proto)


# ---------------------------------------------------------------------------
# sinkhorn + loss
# ---------------------------------------------------------------------------


def sinkhorn_knopp(scores, niters, eps, r, c):
    """Double normalization (swav_clustering.py:509-544), in log space.

    scores: (B, K); r: (K,) prototype marginal; c: (B,) pixel marginal.
    Returns codes (B, K). The reference iterates on Q = exp(scores/ε)
    directly, which overflows/underflows fp32 at the shipped ε=0.005; the
    log-domain iteration computes the identical fixed point exactly.

    Iterated in POTENTIALS form: with lqₖ = base + uₖ⊕vₖ the row update
    lq += (log_r − lse(lq, 1)) is u' = log_r − lse(base + v, 1) (u factors
    out of its own row-lse), and likewise v' = log_c − lse(base + u', 0).
    Identical fixed point and per-iteration trajectory (up to float
    reassociation), but the fori carry is (K,)+(B,) potentials instead of
    the (K, B) plan — at the production 20000×5000 that removes two 400 MB
    log_q writes per iteration (measured HBM-bound on v5e; the remaining
    cost is the two read passes per lse, the reduction's max+sum).

    On TPU, large matrices dispatch to the streaming Pallas kernel
    (ops/sinkhorn_pallas.py; fused one-pass-PER-ITERATION where
    whole-row tiles fit VMEM, else one pass per update) — identical
    fixed point, parity-tested; GANECDOTES_SINKHORN_IMPL=jnp|pallas
    overrides.
    """
    from ganecdotes_tpu.ops.sinkhorn_pallas import (
        sinkhorn_impl_flag,
        sinkhorn_knopp_pallas,
        sinkhorn_supported,
    )

    flag = sinkhorn_impl_flag()
    if flag not in ("auto", "jnp", "pallas"):
        # an unrecognized value silently selecting the jnp path would be a
        # 2.9x silent slowdown of the production pretrain step — fail loud
        raise ValueError(
            f"GANECDOTES_SINKHORN_IMPL={flag!r}: expected 'auto', 'jnp' or"
            " 'pallas' (the kernel variant is picked automatically; there"
            " is no 'fused'/'twopass' env value)"
        )
    use_pallas = flag == "pallas" or (
        flag == "auto"
        and jax.default_backend() == "tpu"
        and scores.size >= (1 << 22)
        and sinkhorn_supported(*scores.shape) is not None
    )
    if use_pallas:
        # codes are a CONSTANT assignment target in SwAV — both call sites
        # wrap this in stop_gradient (as the reference detaches, swav_
        # clustering.py:418-421). Detach the inputs too: the streaming
        # kernel has no JVP rule, and linearization would otherwise reach
        # it with nonzero tangents before the caller's stop_gradient cuts
        # them. (The jnp path below stays fully differentiable.)
        return sinkhorn_knopp_pallas(
            jax.lax.stop_gradient(scores), niters, eps,
            jax.lax.stop_gradient(r), jax.lax.stop_gradient(c),
        )

    from jax.scipy.special import logsumexp

    base = (scores / eps).T  # (K, B)
    base = base - logsumexp(base)
    log_r = jnp.log(r)
    log_c = jnp.log(c)

    def body(_, uv):
        u, v = uv
        u = log_r - logsumexp(base + v[None, :], axis=1)
        v = log_c - logsumexp(base + u[:, None], axis=0)
        return (u, v)

    u, v = jax.lax.fori_loop(
        0, niters,
        body,
        (jnp.zeros(scores.shape[1], base.dtype),
         jnp.zeros(scores.shape[0], base.dtype)),
    )
    log_q = base + u[:, None] + v[None, :]
    return jnp.exp(log_q - logsumexp(log_q, axis=0, keepdims=True)).T


def _histogram_pdf(values, nbins):
    """torch.histc-style pdf with the ref's hist[0]=hist[1] fixup (:523-535)."""
    hist, _ = jnp.histogram(values, bins=nbins)
    hist = hist.astype(jnp.float32) + 1e-9
    hist = hist.at[0].set(hist[1])
    return hist / hist.sum()


def sinkhorn_marginals(scores_shape, source_pdf, img_vals=None):
    b, k = scores_shape
    if source_pdf == "image":
        r = _histogram_pdf(img_vals, k)
        c = _histogram_pdf(img_vals, b)
    else:
        r = jnp.ones((k,)) / k
        c = jnp.ones((b,)) / b
    return r, c


def swapped_prediction_loss(p_s, p_t, q_s, q_t):
    """-½(⟨q_s, logsoftmax p_t⟩ + ⟨q_t, logsoftmax p_s⟩) (:547-570)."""
    lst = jnp.mean(jnp.sum(q_s * jax.nn.log_softmax(p_t, axis=1), axis=1))
    lts = jnp.mean(jnp.sum(q_t * jax.nn.log_softmax(p_s, axis=1), axis=1))
    return -0.5 * (lst + lts)


def feature_norm_map(features, hlen=None):
    """Per-pixel L2 norm over the (virtual) concat channels, level-decomposed.

    Used as the 'image' source pdf for Sinkhorn (ref img = ||hfeat||₂ over
    channels, swav_clustering.py:361-362). Exact for nearest interp.
    """
    h = max(f.shape[1] for f in features)
    w = max(f.shape[2] for f in features)
    total = hlen if hlen is not None else sum(f.shape[-1] for f in features)
    acc = None
    off = 0
    for f in features:
        c = f.shape[-1]
        use = max(0, min(c, total - off))
        off += c
        if use == 0:
            continue
        sq = jnp.sum(jnp.square(f[..., :use]), axis=-1, keepdims=True)
        sq = resize_nearest(sq, (h, w))
        acc = sq if acc is None else acc + sq
    return jnp.sqrt(acc[..., 0])


# ---------------------------------------------------------------------------
# train step
# ---------------------------------------------------------------------------


def make_pick_fn(sampling_method, h, w, patch):
    """Pixel sampling per patch iteration (ref swav_clustering.py:150-167,
    379-391).

    'random': ``patch`` pixels from a fresh permutation of the image.
    'patch': ONE offset p ~ U[0, h - patch) — the reference's
    ``np.random.choice(h - patch_size)``, exclusive upper bound reproduced —
    and the contiguous ``patch×patch`` block at (p, p): the SAME offset on
    both axes, patch² pixels, as a traced window gather (flat row-major
    indices, matching ``project_gathered``'s ``picks // w, picks % w``).
    ``patch >= h`` means the whole image in either mode (ref :379-381).
    """
    npix = h * w
    if sampling_method == "patch" and patch < h:
        def draw_picks(key):
            p = jax.random.randint(key, (), 0, h - patch)
            rows = (p + jnp.arange(patch)) * w
            cols = p + jnp.arange(patch)
            return (rows[:, None] + cols[None, :]).reshape(-1)
    elif sampling_method == "patch":
        def draw_picks(key):
            del key
            return jnp.arange(npix)
    else:
        def draw_picks(key):
            return jax.random.permutation(key, npix)[:patch]
    return draw_picks


def make_lr_schedule(swav_args, num_samples):
    """Warmup linspace + cosine (swav_clustering.py:303-317)."""
    if not swav_args.get("use_scheduler", False):
        return lambda step: swav_args["train_args"]["lr"]
    warmup_iters = num_samples * swav_args["warmup_epochs"]
    base, final = swav_args["base_lr"], swav_args["final_lr"]
    start = swav_args["start_warmup"]
    span = swav_args["num_epochs"] - swav_args["warmup_epochs"]

    def sched(step):
        warm = start + (base - start) * jnp.minimum(step, warmup_iters - 1) / max(
            warmup_iters - 1, 1
        )
        t = (step - warmup_iters) / max(span, 1)
        cos = final + 0.5 * (base - final) * (1 + jnp.cos(jnp.pi * t))
        return jnp.where(step < warmup_iters, warm, cos)

    return sched


def make_swav_train_step(gen_meta, model_config, perturb_args, swav_args,
                         sinkhorn_args, mean_latent_w, image_hw,
                         sample_batch=None):
    """Build the jitted SwAV step. Returns (optimizer, step_fn).

    step_fn(gen_params, ssl_params, opt_state, key, it) -> (params, opt, loss)

    With ``sample_batch=n`` the step instead takes a (n,)-leading key array
    and processes n independent samples per update (loss = mean over
    samples) — the data-parallel SPMD form: shard the key axis over the
    mesh's 'data' axis with replicated params and XLA inserts the gradient
    psum over ICI (SURVEY §2(b); the reference's nearest knob is the unused
    DDP wrap, gan_util.py:154-160).
    """
    h, w = image_hw
    npix = h * w
    patch = swav_args["patch_size"] or npix
    n_layers = perturb_args["n_layers"]
    perturb_std = tuple(perturb_args["perturb_std"])
    truncation = model_config["truncation"]
    latent_dim = model_config["latent_dim"]
    hlen = swav_args["hlen"]
    projn_nw = swav_args["projn_nw"]
    temperature = swav_args["temperature"]
    num_patches = swav_args["num_patches"]
    add_local = swav_args.get("add_local_loss", False)
    niters, eps = sinkhorn_args["niters"], sinkhorn_args["eps"]
    source_pdf = sinkhorn_args.get("source_pdf", "uniform")
    fixed_layer = perturb_args.get("layer_no")

    lr_sched = make_lr_schedule(swav_args, swav_args["num_samples"])
    optimizer = optax.lars(
        learning_rate=lr_sched,
        momentum=swav_args["train_args"].get("momentum", 0.9),
        trust_coefficient=swav_args["trust_coeff"],
    )

    def scores_fn(ssl_params, feats, picks, train_flag=True):
        z = project_gathered(
            feats, picks, (h, w), ssl_params["projection"][0]["weight"], hlen=hlen
        )[0]  # (N, nclasses); batch is 1 in the SSL loop
        z = projection_tail(ssl_params, z, projn_nw, train=train_flag)
        z = z / jnp.maximum(jnp.linalg.norm(z, axis=1, keepdims=True), 1e-12)
        proto = ssl_params["prototype"]
        return z @ proto["weight"] + proto["bias"]

    def view_features(gen_params, key, w_plus, layer_no):
        _, feats = perturbed_features(
            gen_params, gen_meta, w_plus, key, layer_no,
            n_layers, perturb_std, truncation, mean_latent_w,
        )
        return feats

    draw_picks = make_pick_fn(
        swav_args.get("sampling_method", "random"), h, w, patch
    )

    def loss_fn(ssl_params, feats_s, feats_t, img_s, img_t, pick_keys,
                layer_s, layer_t):
        def patch_loss(key):
            picks = draw_picks(key)
            s_s = scores_fn(ssl_params, feats_s, picks)
            s_t = scores_fn(ssl_params, feats_t, picks)
            r_s, c_s = sinkhorn_marginals(s_s.shape, source_pdf, img_s)
            r_t, c_t = sinkhorn_marginals(s_t.shape, source_pdf, img_t)
            q_s = jax.lax.stop_gradient(sinkhorn_knopp(s_s, niters, eps, r_s, c_s))
            q_t = jax.lax.stop_gradient(sinkhorn_knopp(s_t, niters, eps, r_t, c_t))
            loss = swapped_prediction_loss(
                s_s / temperature, s_t / temperature, q_s, q_t
            )
            if add_local:
                # intended semantics of the (broken) channel-masking local
                # loss (:420-451): zero the perturbed block's feature group.
                # block_row_std perturbs w rows (2l, 2l+1), which style
                # features f_{2l}, f_{2l+1} -> group_of(level) = level // 2
                def group_of(level):
                    return level // 2

                def mask(feats, layer):
                    return [
                        jnp.where(group_of(i) == layer, 0.0, 1.0) * f
                        for i, f in enumerate(feats)
                    ]

                ms = scores_fn(ssl_params, mask(feats_s, layer_s), picks)
                mt = scores_fn(ssl_params, mask(feats_t, layer_t), picks)
                mq_s = jax.lax.stop_gradient(
                    sinkhorn_knopp(ms, niters, eps, r_s, c_s)
                )
                mq_t = jax.lax.stop_gradient(
                    sinkhorn_knopp(mt, niters, eps, r_t, c_t)
                )
                loss = loss + swapped_prediction_loss(
                    ms / temperature, mt / temperature, mq_s, mq_t
                )
            return loss

        total = 0.0
        for i in range(num_patches):
            total = total + patch_loss(pick_keys[i])
        return total / num_patches

    def sample_inputs(gen_params, key):
        """Everything that does not depend on ssl_params: draw a fresh
        sample, synthesize the two perturbed views, augment."""
        (k_lat, k_layer, k_vs, k_vt, k_as, k_at, k_picks) = jax.random.split(key, 7)

        # fresh training sample: w = style(randn) (swav_clustering.py:323-326)
        z = jax.random.normal(k_lat, (1, latent_dim))
        w_lat = mapping_apply(gen_params, z)
        # the reference derives w⁺ via a forward with truncation; the latent it
        # returns is trunc(w) repeated n_latent times — computed directly here
        w_tr = mean_latent_w + truncation * (w_lat - mean_latent_w)
        w_plus = jnp.repeat(w_tr[:, None, :], gen_meta["n_latent"], axis=1)

        if fixed_layer is None:
            # the reference draws the perturbed block independently per view
            # (np.random.choice inside each create_hidden_features call,
            # swav_clustering.py:610-611)
            k_ls, k_lt = jax.random.split(k_layer)
            layer_s = jax.random.randint(k_ls, (), 0, n_layers)
            layer_t = jax.random.randint(k_lt, (), 0, n_layers)
        else:
            layer_s = layer_t = jnp.asarray(fixed_layer)

        feats_s = view_features(gen_params, k_vs, w_plus, layer_s)
        feats_t = view_features(gen_params, k_vt, w_plus, layer_t)

        ang_s, flip_s = random_rotate_flip_params(k_as)
        ang_t, flip_t = random_rotate_flip_params(k_at)
        feats_s = rotate_flip_features(feats_s, ang_s, flip_s)
        feats_t = rotate_flip_features(feats_t, ang_t, flip_t)

        if source_pdf == "image":
            img_s = feature_norm_map(feats_s, hlen)
            img_t = feature_norm_map(feats_t, hlen)
        else:
            img_s = img_t = jnp.zeros(())  # vmap needs an array placeholder

        pick_keys = jax.random.split(k_picks, num_patches)
        return feats_s, feats_t, img_s, img_t, pick_keys, layer_s, layer_t

    def apply_update(ssl_params, opt_state, loss, grads):
        updates, opt_state = optimizer.update(grads, opt_state, ssl_params)
        return optax.apply_updates(ssl_params, updates), opt_state, loss

    # the (zeros) img placeholder is ignored by sinkhorn_marginals unless
    # source_pdf == 'image', so both steps pass it through unconditionally

    def step(gen_params, ssl_params, opt_state, key, it):
        del it
        ssl_params = normalize_prototypes(ssl_params)
        inp = sample_inputs(gen_params, key)
        loss, grads = jax.value_and_grad(loss_fn)(ssl_params, *inp)
        return apply_update(ssl_params, opt_state, loss, grads)

    if sample_batch is None:
        return optimizer, jax.jit(step)

    def batch_step(gen_params, ssl_params, opt_state, keys, it):
        del it
        ssl_params = normalize_prototypes(ssl_params)
        inputs = jax.vmap(lambda k: sample_inputs(gen_params, k))(keys)

        def total_loss(ssl_params):
            return jax.vmap(lambda inp: loss_fn(ssl_params, *inp))(
                inputs
            ).mean()

        loss, grads = jax.value_and_grad(total_loss)(ssl_params)
        return apply_update(ssl_params, opt_state, loss, grads)

    return optimizer, jax.jit(batch_step)


# ---------------------------------------------------------------------------
# inference
# ---------------------------------------------------------------------------


def swav_predict_from_features(ssl_params, features, hlen, nclasses,
                               projn_nw="linear", interp="nearest"):
    """Raw projection scores at full resolution (predict path :659-693).

    Inference applies ONLY the projection (no normalize, no prototype,
    get_swav_codes train=False branch :171-177). Returns (B, H, W, nclasses)
    NHWC scores; labels = argmax(-1).
    """
    z = project_feature_maps(
        features, ssl_params["projection"][0]["weight"], hlen=hlen, interp=interp
    )
    # the reference never calls .eval() on the projection head, so its
    # BatchNorm keeps using batch statistics at predict time; the stored
    # running stats are never trained, so train=False would normalize with
    # the init (0, 1) stats and mis-scale the 1/2-layer heads
    z = projection_tail(ssl_params, z, projn_nw, train=True)
    return z


# ---------------------------------------------------------------------------
# orchestrating class (reference-API-compatible preprocessor)
# ---------------------------------------------------------------------------


class _SimulatedPreemption(RuntimeError):
    """Raised by the test-only fault-injection hook (_abort_after_epoch)."""


class SwAVClustering:
    """Duck-typed 'preprocessor' with the reference's API surface
    (hfc_with_swav/swav_clustering.py:28-203): preprocess / pretrain /
    predict_swav_codes, presaved-checkpoint loading, out_dir layout."""

    def __init__(self, model, model_config, perturb_args, swav_args,
                 sinkhorn_args, logger=None, train=True, out_dir=None,
                 device=None, tb=None, layer_hf_dim=None, seed=42,
                 num_test_samples=5):
        del device
        self.num_test_samples = num_test_samples
        # fault-injection hook: raise _SimulatedPreemption after this many
        # epochs (tests the elastic-resume path; None = never)
        self._abort_after_epoch = None
        # opt-in per-epoch loss trace (each append is a device sync; tests
        # use it to assert the loss actually decreases)
        self.record_loss_history = False
        self.loss_history = []
        # how many times pretrain() ran in this process — lets callers (and
        # the warm-start test) assert a presaved checkpoint was LOADED
        # rather than silently retrained
        self.pretrain_count = 0
        self.model = model
        self.model_config = model_config
        self.perturb_args = perturb_args
        self.swav_args = swav_args
        self.sinkhorn_args = sinkhorn_args
        self.logger = logger
        self.train = train
        self.out_dir = out_dir
        self.writer = tb
        self.layer_hf_dim = layer_hf_dim
        self.key = jax.random.PRNGKey(seed)

        self.nclasses = swav_args["nclasses"]
        self.nprototypes = swav_args["nprototypes"]

        if out_dir is not None:
            os.makedirs(os.path.join(out_dir, "swav"), exist_ok=True)
            self.params_file = os.path.join(out_dir, "swav_params.npz")
        else:
            self.params_file = None

        self.key, km = jax.random.split(self.key)
        self.mean_latent = model.mean_latent(
            getattr(model_config, "num_latents_for_mean", 4096), key=km
        )
        self.truncation = model_config.truncation

        self.ssl_params = None
        if not self.train and self.params_file and os.path.exists(self.params_file):
            self.ssl_params = load_pytree(self.params_file)
        elif not self.train and out_dir is not None and all(
            os.path.exists(os.path.join(out_dir, f))
            for f in ("prototypes.pt", "projection.pt")
        ):
            # reference-format artifacts (torch.save'd modules, ref :79-89)
            self.ssl_params = import_torch_swav_modules(
                os.path.join(out_dir, "prototypes.pt"),
                os.path.join(out_dir, "projection.pt"),
                swav_args["projn_nw"],
            )
            if self.logger:
                self.logger.info(
                    "Imported reference SwAV modules (prototypes.pt/"
                    "projection.pt)"
                )
        elif not self.train and self.logger:
            self.logger.info("SwAV params not found - pretraining ...")

        self._image_hw = (model_config.image_size, model_config.image_size)

    def _model_config_dict(self):
        return {
            "truncation": self.truncation,
            "latent_dim": self.model_config.latent_dim,
        }

    def preprocess(self, input_latent):
        """Train (or lazily load) the SSL embedding (ref :186-203)."""
        if self.train or self.ssl_params is None:
            self.pretrain(input_latent)

    def pretrain(self, input_latent=None):
        del input_latent  # placeholder in the reference too
        self.pretrain_count += 1
        sa = self.swav_args
        self.key, k_init = jax.random.split(self.key)
        self.ssl_params = init_swav_params(
            k_init, sa["hlen"], sa["nclasses"], sa["nprototypes"], sa["projn_nw"]
        )

        # multi-chip: process device_count independent samples per update,
        # key axis sharded over the mesh, params replicated (grad psum over
        # ICI). Opt-in (changes the effective sample batch vs the reference's
        # strictly-sequential 1 sample/step budget).
        n_par = 1
        if sa.get("data_parallel", False) and jax.device_count() > 1:
            n_par = jax.device_count()

        optimizer, step = make_swav_train_step(
            self.model.meta,
            self._model_config_dict(),
            self.perturb_args,
            sa,
            self.sinkhorn_args,
            self.mean_latent,
            self._image_hw,
            sample_batch=n_par if n_par > 1 else None,
        )
        opt_state = optimizer.init(self.ssl_params)

        if n_par > 1:
            from ganecdotes_tpu.parallel.mesh import batch_shardings, make_mesh

            mesh = make_mesh()
            repl, shard = batch_shardings(mesh)
            step = jax.jit(
                step, in_shardings=(repl, repl, repl, shard, None)
            )
            if self.logger:
                self.logger.info(
                    f"SwAV pretraining data-parallel over {n_par} devices"
                )

        import time as _time

        plot = bool(sa.get("plot_test_images", False))
        if plot:
            # fixed test latents plotted each epoch (ref :224-240; the
            # reference's plotting block crashes on an undefined `grid` at
            # :488 — intended semantics implemented here)
            self.key, kt = jax.random.split(self.key)
            test_z = jax.random.normal(
                kt, (self.num_test_samples, self.model_config.latent_dim)
            )
            test_imgs, _ = self.model(
                [test_z], truncation=self.truncation,
                truncation_latent=self.mean_latent, randomize_noise=False,
            )
            test_imgs = np.clip(np.asarray(test_imgs) * 0.5 + 0.5, 0, 1)

        t0 = _time.time()
        num_epochs, num_samples = sa["num_epochs"], sa["num_samples"]

        # elastic resume: restart from the last periodic snapshot (params +
        # optimizer state + epoch + RNG key). The reference persists only the
        # final modules (swav_clustering.py:503-505) — a preempted 100-epoch
        # run there restarts from scratch. Opt-in via swav_args
        # ['checkpoint_every'] (epochs). A successful run deletes its
        # snapshot (it is a crash-recovery artifact; the result lives in
        # swav_params.npz).
        ckpt_every = int(sa.get("checkpoint_every", 0) or 0)
        ckpt_file = (
            os.path.join(self.out_dir, "swav_pretrain_state.npz")
            if self.out_dir else None
        )
        # config fingerprint: a snapshot from a different architecture or
        # schedule must not silently resume (wrong-shaped params would be
        # written, or zero steps would run)
        fp = repr((
            sa["hlen"], sa["nclasses"], sa["nprototypes"], sa["projn_nw"],
            num_epochs, num_samples, n_par,
        ))
        start_epoch = 0
        if ckpt_every and ckpt_file and os.path.exists(ckpt_file):
            try:
                state = load_pytree(ckpt_file)
                if state.get("fingerprint_chars") is not None:
                    saved_fp = "".join(
                        chr(c) for c in np.asarray(state["fingerprint_chars"])
                    )
                else:
                    saved_fp = None
                if saved_fp != fp:
                    raise ValueError(
                        f"snapshot config {saved_fp!r} != current {fp!r}"
                    )
                # parse the WHOLE snapshot into locals before mutating any
                # state: a snapshot missing a field (truncated schema) must
                # not leave self.ssl_params half-restored when the blanket
                # except below falls back to epoch 0
                new_ssl_params = state["ssl_params"]
                new_opt_state = jax.tree.unflatten(
                    jax.tree.structure(opt_state),
                    jax.tree.leaves(state["opt"]),
                )
                new_epoch = int(state["epoch"])
                new_key = state["key"]
                self.ssl_params = new_ssl_params
                opt_state = new_opt_state
                start_epoch = new_epoch
                self.key = new_key
                if self.logger:
                    self.logger.info(
                        f"Resuming SwAV pretraining from epoch {start_epoch}"
                    )
            except Exception as e:
                # truncated write (preempted mid-save) or config change:
                # start fresh rather than crash-loop on a bad snapshot
                start_epoch = 0
                if self.logger:
                    self.logger.warning(
                        f"Ignoring unusable pretrain snapshot ({e}) - "
                        "starting from epoch 0"
                    )

        it = start_epoch * num_samples
        for e in range(start_epoch, num_epochs):
            for _ in range(num_samples):
                self.key, k_step = jax.random.split(self.key)
                if n_par > 1:
                    k_step = jax.random.split(k_step, n_par)
                self.ssl_params, opt_state, loss = step(
                    self.model.params, self.ssl_params, opt_state, k_step, it
                )
                it += 1
            if ckpt_every and ckpt_file and (e + 1) % ckpt_every == 0:
                # atomic: write-to-temp + rename, so the preemption this
                # feature exists for cannot leave a truncated snapshot
                tmp = ckpt_file[:-4] + "_tmp.npz"  # np.savez appends .npz
                save_pytree(tmp, {
                    "ssl_params": self.ssl_params,
                    "opt": jax.tree.leaves(opt_state),
                    "epoch": jnp.asarray(e + 1),
                    "key": self.key,
                    "fingerprint_chars": jnp.asarray(
                        [ord(c) for c in fp], jnp.int32
                    ),
                })
                os.replace(tmp, ckpt_file)
            if self._abort_after_epoch is not None and (
                e + 1
            ) >= self._abort_after_epoch:
                raise _SimulatedPreemption(f"aborted after epoch {e + 1}")
            if self.record_loss_history:
                self.loss_history.append(float(loss))
            # float(loss) is a device sync — gate BOTH consumers behind
            # epoch_print_freq so the steady-state loop has zero per-epoch
            # readbacks (an unconditional TB scalar was silently adding a
            # ~0.45 s sync every epoch when a writer was attached)
            if e % sa.get("epoch_print_freq", 5) == 0:
                if self.logger:
                    self.logger.info(
                        f" E:{e}\t|\tLoss: {float(loss):.03f} \t|"
                        f"\tT: {_time.time() - t0:.03f}"
                    )
                if self.writer is not None:
                    self.writer.add_scalar("swav/loss", float(loss), e)
            if plot:
                self._plot_epoch_predictions(test_z, test_imgs, e)

        if self.logger:
            self.logger.info("Finished pretraining - Saving swav params")
        if self.params_file:
            save_pytree(self.params_file, self.ssl_params)
        if ckpt_file and os.path.exists(ckpt_file):
            # crash-recovery artifact only — a stale snapshot would make a
            # later intentional re-pretrain in the same out_dir a silent
            # no-op
            os.remove(ckpt_file)

    def _plot_epoch_predictions(self, test_z, test_imgs, e):
        """Per-epoch prediction grid (intended semantics of ref :467-501):
        one column per test sample; rows = image, hard-label map, then the
        first max_masks per-class score maps."""
        import matplotlib

        matplotlib.use("Agg", force=False)
        import matplotlib.pyplot as plt

        from ganecdotes_tpu.utils.visualization import quick_imshow

        sa = self.swav_args
        np_masks = min(self.nclasses, int(sa.get("max_masks", 4)))
        preds, labels = self.predict_swav_codes(test_z, input_is_latent=False)
        preds = np.asarray(preds)
        labels = np.asarray(labels, dtype=np.float32)
        labels = labels / max(float(labels.max()), 1.0)

        n = test_z.shape[0]
        ims = [test_imgs[i] for i in range(n)]
        ims += [labels[i] for i in range(n)]
        for m in range(np_masks):
            ims += [preds[i, :, :, m] for i in range(n)]

        fig = quick_imshow(
            np_masks + 2, n, ims, colorbar=False, colormap="gray",
            fname=os.path.join(self.out_dir, "swav", f"test_epoch_{e}.png"),
        )
        plt.close(fig)
        if self.writer is not None:
            lab0 = np.asarray(labels[0], dtype=np.float32)
            self.writer.add_image(
                "swav/test_image", lab0 / max(float(lab0.max()), 1.0),
                e, dataformats="HW",
            )

    def predict_swav_codes(self, input_latent, input_is_latent=True):
        """(out_preds NHWC scores, out_labels) for a latent (ref :659-693)."""
        if input_latent.ndim == 1:
            input_latent = input_latent[None]
        _, feats = self.model(
            [jnp.asarray(input_latent)],
            truncation=self.truncation,
            truncation_latent=self.mean_latent,
            input_is_latent=input_is_latent,
            randomize_noise=False,
        )
        preds = swav_predict_from_features(
            self.ssl_params, feats, self.swav_args["hlen"], self.nclasses,
            self.swav_args["projn_nw"], self.swav_args.get("hf_interp", "nearest"),
        )
        labels = jnp.argmax(preds, axis=-1)
        return preds, labels
