"""Hidden-feature k-means clustering (flat / hierarchical) + belief encoding.

TPU-native re-design of baseline/hfc_kmeans/hfc_kmeans_clustering.py:11-545
and baseline/hfc_kmeans/segmentor.py:11-230: the reference round-trips every
layer's features through sklearn on the host; here Lloyd's iterations are
jitted matmul/argmin programs (kmeans++ init, best-of-n_init restarts by
inertia), so fit and predict stay on device. Belief-matrix hierarchical label
encoding replaces skimage.regionprops with direct per-label-value histograms
(regionprops on a cluster map degenerates to exactly that; label 0 ignored).

Checkpoint layout mirrors the reference: per-layer clusterer files +
model_stats.npz + beliefs.npz in out_dir.
"""

import functools
import os

import jax
import jax.numpy as jnp
import numpy as np

from ganecdotes_tpu.ops.interp import _nearest_indices, resize_nearest
from ganecdotes_tpu.selfsup.augmentor import (
    block_row_std,
    group_features_by_block,
    perturb_latents,
)


# ---------------------------------------------------------------------------
# jitted Lloyd's algorithm
# ---------------------------------------------------------------------------


def _dist2(x, x_sq, centers):
    # ||x||² - 2 x·c + ||c||², (N, K), MXU matmul dominates
    return (
        x_sq
        - 2.0 * (x @ centers.T)
        + jnp.sum(centers * centers, axis=1)[None, :]
    )


@functools.partial(jax.jit, static_argnames=("max_iter",))
def _lloyd_refine(x, centers, max_iter=300):
    """Lloyd iterations from given centers -> (centers, assignments, inertia).

    Empty clusters keep their previous center.
    """
    k = centers.shape[0]
    x_sq = jnp.sum(x * x, axis=1, keepdims=True)

    def lloyd(_, c):
        a = jnp.argmin(_dist2(x, x_sq, c), axis=1)
        onehot = jax.nn.one_hot(a, k, dtype=x.dtype)  # (N, K)
        counts = onehot.sum(axis=0)
        new = (onehot.T @ x) / jnp.maximum(counts[:, None], 1.0)
        return jnp.where(counts[:, None] > 0, new, c)

    centers = jax.lax.fori_loop(0, max_iter, lloyd, centers)
    d2 = _dist2(x, x_sq, centers)
    return centers, jnp.argmin(d2, axis=1), jnp.sum(jnp.min(d2, axis=1))


@functools.partial(jax.jit, static_argnames=("k", "max_iter"))
def _kmeans_single(x, key, k, max_iter=300):
    """One kmeans run: ++ init, fixed-iteration Lloyd. x: (N, D)."""
    n, d = x.shape

    # kmeans++ seeding
    def pp_body(i, carry):
        centers, key = carry
        key, kc = jax.random.split(key)
        d2 = jnp.min(
            jnp.sum((x[:, None, :] - centers[None, :, :]) ** 2, axis=-1)
            + jnp.where(jnp.arange(k)[None, :] < i, 0.0, jnp.inf),
            axis=1,
        )
        probs = d2 / jnp.maximum(d2.sum(), 1e-12)
        idx = jax.random.choice(kc, n, p=probs)
        return centers.at[i].set(x[idx]), key

    key, k0 = jax.random.split(key)
    first = x[jax.random.randint(k0, (), 0, n)]
    centers = jnp.zeros((k, d), x.dtype).at[0].set(first)
    centers, key = jax.lax.fori_loop(1, k, pp_body, (centers, key))

    return _lloyd_refine(x, centers, max_iter)


def kmeans_fit(x, k, key, n_init=10, max_iter=300, init_centers=None):
    """Best-of-n_init k-means (sklearn-default semantics). Returns centers."""
    x = jnp.asarray(x)
    if init_centers is not None:
        # refine provided centers with Lloyd only
        centers, _, _ = _lloyd_refine(x, jnp.asarray(init_centers)[:k], max_iter)
        return centers

    best_centers, best_inertia = None, np.inf
    for i in range(n_init):
        centers, _, inertia = _kmeans_single(
            x, jax.random.fold_in(key, i), k, max_iter
        )
        if float(inertia) < best_inertia:
            best_inertia = float(inertia)
            best_centers = centers
    return best_centers


def _resize_labels(labels, out_size):
    """Nearest-resize an int (B, h, w) label map.

    Integer upscale factors (every hfc layer: 4/8/16/32/64 → 256) take the
    broadcast-repetition path — pure reshape/broadcast that fuses into the
    consumer, where the general path's row/col gathers materialize
    (ops/interp.resize_nearest applies the same policy to float maps).
    """
    b, h, w = labels.shape
    if (h, w) == (out_size, out_size):
        return labels
    if out_size % h == 0 and out_size % w == 0:
        sh, sw = out_size // h, out_size // w
        out = jnp.broadcast_to(
            labels[:, :, None, :, None], (b, h, sh, w, sw)
        )
        return out.reshape(b, out_size, out_size)
    ri = jnp.asarray(_nearest_indices(h, out_size))
    ci = jnp.asarray(_nearest_indices(w, out_size))
    return labels[:, ri][:, :, ci]


def import_sklearn_clusterer(path):
    """Reference ``clusterer_layer_{n}.sav`` (pickled sklearn KMeans,
    ref hfc_kmeans_clustering.py:121-123) -> (k, d) cluster centers.

    Prediction parity is exact: sklearn's ``predict`` is the same
    argmin-of-squared-distance as ``kmeans_predict`` over these centers.

    Trust note: ``.sav`` files are pickles — loading one EXECUTES code from
    the file, so only point this at artifacts you produced or trust (the
    same assumption the reference makes by pickling its clusterers).
    Unpickling also needs sklearn importable (the pickle references its
    classes); we surface that as a clear error instead of an opaque
    ``ModuleNotFoundError`` from deep inside pickle."""
    import pickle

    with open(path, "rb") as f:
        try:
            obj = pickle.load(f)
        except ModuleNotFoundError as e:
            raise ImportError(
                f"importing {path!r} requires scikit-learn (the reference "
                "pickled an sklearn KMeans object); install sklearn or "
                f"provide a cluster_centers.npz instead: {e}"
            ) from e
    return jnp.asarray(np.asarray(obj.cluster_centers_, dtype=np.float32))


def load_belief_file(path):
    """beliefs.npz -> list of (k_prev, k_curr) float32 belief matrices.

    Accepts both this repo's layout (one entry per matrix, arr_0..arr_N)
    and the reference's (ONE positional entry holding the whole python list,
    ``np.savez_compressed(belief_file, self.trained_beliefs)``,
    ref segmentor.py:163 — an object array when layer shapes differ)."""
    data = np.load(path, allow_pickle=True)
    files = sorted(data.files, key=lambda s: (len(s), s))  # arr_2 < arr_10
    if len(files) == 1:
        arr = data[files[0]]
        if arr.dtype == object or arr.ndim == 3:
            return [jnp.asarray(np.asarray(b, dtype=np.float32)) for b in arr]
    return [jnp.asarray(np.asarray(data[f], dtype=np.float32)) for f in files]


@functools.partial(jax.jit, static_argnames=())
def kmeans_predict(x, centers):
    # argmin_k ||x - c_k||² == argmin_k (||c_k||² - 2 x·c_k): the per-row
    # ||x||² is constant under the argmin, and dropping it skips a full
    # read-reduce of x (x is the (N, 512..1024) feature tensor — the reduce
    # was ~12 ms of the 392 ms hfc serving batch at 256, trace-ranked).
    score = jnp.sum(centers * centers, axis=1)[None, :] - 2.0 * (x @ centers.T)
    return jnp.argmin(score, axis=1)


@jax.jit
def kmeans_predict_parts(parts, centers):
    """``kmeans_predict`` over a channel-split input, without the concat.

    parts: sequence of (N, c_i) matrices whose channel concat is the
    clustered feature (Σc_i == centers.shape[1]). The score matmul
    distributes over the channel split — ``x @ cᵀ = Σ_i x_i @ c_iᵀ`` — so
    the (N, Σc) concatenated tensor (a pure HBM copy the hfc serving
    program pays per level, per batch) never materializes. Same argmin as
    ``kmeans_predict(concat(parts), centers)`` up to fp summation order.
    """
    if sum(p.shape[-1] for p in parts) != centers.shape[1]:
        raise ValueError(
            f"parts widths {[p.shape[-1] for p in parts]} do not sum to "
            f"the centers' feature dim {centers.shape[1]}"
        )
    score = jnp.sum(centers * centers, axis=1)[None, :]
    off = 0
    for p in parts:
        c = p.shape[-1]
        score = score - 2.0 * (p @ centers[:, off:off + c].T)
        off += c
    return jnp.argmin(score, axis=1)


# ---------------------------------------------------------------------------
# HFC models (flat / hierarchical) — reference class API
# ---------------------------------------------------------------------------


class BaseHFCModel:
    """Per-layer clusterer collection with the reference's checkpoint layout
    (hfc_kmeans_clustering.py:11-124)."""

    def __init__(self, out_dir, n_layers=6, clusters_per_layer=(), out_size=128,
                 presaved=False, logger=None, seed=42):
        self.out_dir = out_dir
        os.makedirs(self.out_dir, exist_ok=True)
        self.n_layer = n_layers
        self.clusters_per_layer = list(clusters_per_layer)
        self.out_size = out_size
        self.presaved = presaved
        self.logger = logger
        self.key = jax.random.PRNGKey(seed)

        self.model_fpaths = [
            os.path.join(self.out_dir, f"clusterer_layer_{n}.npz")
            for n in range(self.n_layer)
        ]
        # reference-format sklearn pickles (hfc_kmeans_clustering.py:42-43)
        self.sav_fpaths = [
            os.path.join(self.out_dir, f"clusterer_layer_{n}.sav")
            for n in range(self.n_layer)
        ]
        self.stats_file = os.path.join(self.out_dir, "model_stats.npz")

        self.means = [None] * len(self.clusters_per_layer)
        self.stds = [None] * len(self.clusters_per_layer)
        self.centers = [None] * self.n_layer

        if self.presaved:
            self.ensure_centers()

    def _log(self, msg):
        (self.logger.info if self.logger else print)(msg)

    def _features_to_matrix(self, feat):
        # NHWC (B, h, w, C) -> (B*h*w, C) pixel-sample matrix
        return jnp.asarray(feat).reshape(-1, feat.shape[-1])

    def fit(self, hidden_feat):
        assert len(hidden_feat) == self.n_layer
        for n in range(self.n_layer):
            self.centers[n] = self._layerwise_fit(hidden_feat[n], n)
            np.savez_compressed(
                self.model_fpaths[n], centers=np.asarray(self.centers[n])
            )
            self._log(f"Fitted model for Layer {n}")
        # per-layer means/stds have different channel widths -> object array
        # (the reference saves the same ragged lists, loading with
        # allow_pickle=True, hfc_kmeans_clustering.py:48-52,87-91)
        means = np.empty(len(self.means), dtype=object)
        stds = np.empty(len(self.stds), dtype=object)
        for i, (m, s) in enumerate(zip(self.means, self.stds)):
            means[i] = np.asarray(m if m is not None else 0)
            stds[i] = np.asarray(s if s is not None else 0)
        np.savez_compressed(self.stats_file, means=means, stds=stds)

    def ensure_centers(self):
        """Lazy-load presaved clusterers (friendlier than the reference,
        which requires presaved=True at construction).

        Per layer, prefers this repo's ``clusterer_layer_{n}.npz`` and falls
        back to the reference's pickled-sklearn ``clusterer_layer_{n}.sav``
        (ref :42-63), so reference-trained artifacts load directly."""
        if not any(c is None for c in self.centers):
            return
        centers = []
        for npz_fp, sav_fp in zip(self.model_fpaths, self.sav_fpaths):
            if os.path.exists(npz_fp):
                centers.append(jnp.asarray(np.load(npz_fp)["centers"]))
            elif os.path.exists(sav_fp):
                centers.append(import_sklearn_clusterer(sav_fp))
            else:
                raise FileNotFoundError(
                    "Models not found - use BaseHFCModel.fit() to create "
                    "model first!"
                )
        self.centers = centers

    def predict(self, hidden_feat):
        """-> (cluster one-hot maps (B, out, out, Σk), per-layer label maps)."""
        assert len(hidden_feat) == self.n_layer
        self.ensure_centers()
        cluster_maps, cluster_labels = [], []
        for n in range(self.n_layer):
            labels, maps = self._layerwise_predict(hidden_feat[n], n)
            cluster_maps.append(maps)
            cluster_labels.append(labels)
        return jnp.concatenate(cluster_maps, axis=-1), cluster_labels

    def _layerwise_fit(self, feat, n):
        x = self._features_to_matrix(feat)
        self.means[n] = np.asarray(x.mean(axis=0))
        self.stds[n] = np.asarray(x.std(axis=0))
        self.key, kf = jax.random.split(self.key)
        return kmeans_fit(x, self.clusters_per_layer[n], kf)

    def _layerwise_predict(self, feat, n):
        b, h, w, c = feat.shape
        labels = kmeans_predict(self._features_to_matrix(feat), self.centers[n])
        labels = labels.reshape(b, h, w)
        k = self.clusters_per_layer[n]
        # label-map gather resize, then one-hot (see hfc_predict_from_features)
        lab_up = _resize_labels(labels, self.out_size)
        onehot = jax.nn.one_hot(lab_up, k)  # (B, out, out, k)
        return labels[:, None, :, :], onehot  # labels kept (B,1,h,w)-shaped


class FlatKMeansHFC(BaseHFCModel):
    def __init__(self, kmeans_args, base_args):
        self.kmeans_args = dict(kmeans_args)
        super().__init__(**base_args)


class HierarchicalKMeansHFC(BaseHFCModel):
    """Cluster-center propagation between resolutions (ref :212-390)."""

    def __init__(self, kmeans_args, base_args):
        self.kmeans_args = dict(kmeans_args)
        super().__init__(**base_args)
        self._cluster_centers = None

    def hierarchical_fit(self, hidden_feat):
        assert len(hidden_feat) == self.n_layer
        self._cluster_centers = None
        for n in range(self.n_layer):
            x = self._features_to_matrix(hidden_feat[n])
            self.key, kf = jax.random.split(self.key)
            self.centers[n] = kmeans_fit(
                x,
                self.clusters_per_layer[n],
                kf,
                init_centers=self._cluster_centers,
            )
            if n != self.n_layer - 1:
                labels = kmeans_predict(x, self.centers[n])
                self._cluster_centers = self.calculate_cluster_centers(
                    hidden_feat[n], hidden_feat[n + 1], labels, n + 1
                )
            np.savez_compressed(
                self.model_fpaths[n], centers=np.asarray(self.centers[n])
            )
            self._log(f"Fitted model for Layer {n}")

    def calculate_cluster_centers(self, feat_old, feat_new, labels, n):
        b, h, w, c = feat_old.shape
        labels = labels.reshape(b, h, w)[..., None]
        bn, hn, wn, cn = feat_new.shape
        labels = resize_nearest(labels.astype(jnp.float32), (hn, wn)).astype(
            jnp.int32
        )[..., 0]
        ffeat = feat_new.reshape(-1, cn)
        flab = labels.reshape(-1)
        k_prev = self.clusters_per_layer[n - 1]
        onehot = jax.nn.one_hot(flab, k_prev)
        counts = onehot.sum(axis=0)
        # ref takes the scalar mean of each label's feature block (:383)
        sums = onehot.T @ ffeat
        centers = jnp.where(
            counts[:, None] > 0,
            (sums.sum(axis=1) / jnp.maximum(counts * cn, 1.0))[:, None]
            * jnp.ones((1, cn)),
            0.0,
        )
        return np.repeat(np.asarray(centers), 2, axis=0)


class LegacyHierarchicalKMeansHFC(BaseHFCModel):
    """Older top-down hierarchical variant (ref hfc_hier_kmeans_clustering.py:
    18-181): layers are clustered fine→coarse; each coarser layer's features
    are nearest-resized to the child resolution and concatenated with the
    child's one-hot prediction maps before clustering. ``hierarchical_predict``
    returns the per-layer label maps and the channel-concat of all one-hot
    maps at out_size, in layer order."""

    def __init__(self, kmeans_args, base_args):
        self.kmeans_args = dict(kmeans_args)
        super().__init__(**base_args)

    def _concat_child(self, feat, child_maps):
        if child_maps is None:
            return feat
        ch, cw = child_maps.shape[1], child_maps.shape[2]
        feat = resize_nearest(feat, (ch, cw))
        return jnp.concatenate([feat, child_maps], axis=-1)

    def _onehot_maps(self, labels, n, h, w):
        b = labels.shape[0]
        lab_up = _resize_labels(labels.reshape(b, h, w), self.out_size)
        return jax.nn.one_hot(lab_up, self.clusters_per_layer[n])

    def fit(self, hidden_feat):
        assert len(hidden_feat) == self.n_layer
        child_maps = None
        for n in range(self.n_layer - 1, -1, -1):
            feat = self._concat_child(jnp.asarray(hidden_feat[n]), child_maps)
            b, h, w, c = feat.shape
            x = feat.reshape(-1, c)
            self.key, kf = jax.random.split(self.key)
            self.centers[n] = kmeans_fit(x, self.clusters_per_layer[n], kf)
            labels = kmeans_predict(x, self.centers[n]).reshape(b, h, w)
            child_maps = self._onehot_maps(labels.reshape(b, -1), n, h, w)
            np.savez_compressed(
                self.model_fpaths[n], centers=np.asarray(self.centers[n])
            )
            self._log(f"Fitted model for Layer {n}")

    def hierarchical_predict(self, hidden_feat):
        assert len(hidden_feat) == self.n_layer
        cluster_maps, cluster_labels = [], []
        child_maps = None
        for n in range(self.n_layer - 1, -1, -1):
            feat = self._concat_child(jnp.asarray(hidden_feat[n]), child_maps)
            b, h, w, c = feat.shape
            labels = kmeans_predict(feat.reshape(-1, c), self.centers[n])
            labels = labels.reshape(b, h, w)
            child_maps = self._onehot_maps(labels.reshape(b, -1), n, h, w)
            lab_rs = resize_nearest(
                labels[..., None].astype(jnp.float32),
                (self.out_size, self.out_size),
            ).astype(jnp.int32)[..., 0]
            cluster_maps.append(child_maps)
            cluster_labels.append(lab_rs[:, None])
        cluster_maps = jnp.concatenate(cluster_maps[::-1], axis=-1)
        cluster_labels = jnp.concatenate(cluster_labels[::-1], axis=1)
        return cluster_labels, cluster_maps


# ---------------------------------------------------------------------------
# bayesian hierarchical label encoding
# ---------------------------------------------------------------------------


def _region_beliefs(curr_map, prev_map, shape):
    """Belief matrix from per-label-value co-occurrence (ref :394-446).

    regionprops-equivalent: regions are the nonzero label values of curr_map
    (label 0 ignored, as skimage does)."""
    belief = np.zeros(shape)
    curr = np.asarray(curr_map).astype(np.int64)
    prev = np.asarray(prev_map).astype(np.int64)
    for lbl in np.unique(curr):
        if lbl == 0:
            continue
        sel = curr == lbl
        area = sel.sum()
        vals, freq = np.unique(prev[sel], return_counts=True)
        for v, f in zip(vals, freq):
            belief[v, lbl] = f / area
    return belief


def region_beliefs_device(curr_map, prev_map, shape):
    """Jittable ``_region_beliefs``: co-occurrence as one-hot MXU matmuls.

    belief[v, l] = |{prev==v and curr==l}| / |{curr==l}| with column 0
    (label 0, skimage-skipped) and absent-label columns zero — exactly the
    host loop's output (pinned in tests), but traceable, so the pipeline's
    beliefs-untrained fallback stays one device program."""
    kp, kc = shape
    c1 = jax.nn.one_hot(jnp.asarray(curr_map).reshape(-1).astype(jnp.int32),
                        kc, dtype=jnp.float32)
    p1 = jax.nn.one_hot(jnp.asarray(prev_map).reshape(-1).astype(jnp.int32),
                        kp, dtype=jnp.float32)
    counts = p1.T @ c1  # (Kp, Kc) co-occurrence
    area = c1.sum(axis=0)  # (Kc,)
    belief = jnp.where(area > 0, counts / jnp.maximum(area, 1.0), 0.0)
    return belief.at[:, 0].set(0.0)


def hierarchical_label_encoding(im_labels, one_hot_label, clusters_per_layer,
                                beliefs=None):
    """Propagate label scores down the pyramid via belief matmuls (ref :394-478).

    im_labels: per-layer label maps (B,1,h,w)-shaped jnp arrays;
    one_hot_label: (B, H, W, K_last) NHWC scores of the finest layer.
    """
    num_layers = len(im_labels)

    if beliefs is None:
        # estimate from this sample alone, in-graph (region_beliefs_device
        # == the host _region_beliefs loop, pinned in tests) so callers can
        # stay inside one jitted program
        beliefs = []
        for k in range(num_layers - 2, -1, -1):
            prev = im_labels[k + 1]
            h, w = prev.shape[-2:]
            curr = resize_nearest(
                jnp.asarray(im_labels[k]).astype(jnp.float32).transpose(0, 2, 3, 1),
                (h, w),
            )[..., 0]
            beliefs.append(
                region_beliefs_device(
                    curr, prev,
                    (clusters_per_layer[k + 1], clusters_per_layer[k]),
                )
            )

    ob, oh, ow, oc = one_hot_label.shape
    pred_vect = one_hot_label.reshape(-1, oc)  # (B*H*W, K)

    out_labels = [im_labels[-1]]
    out_preds = [one_hot_label]

    for k in range(num_layers - 1):
        pred_vect = pred_vect @ beliefs[k]  # (N, K_next)
        oc = pred_vect.shape[-1]
        out_pred_im = pred_vect.reshape(ob, oh, ow, oc)
        out_label_im = jnp.argmax(out_pred_im, axis=-1)
        pred_vect = jax.nn.one_hot(out_label_im.reshape(-1), oc)
        out_labels.append(out_label_im)
        out_preds.append(out_pred_im)

    return out_labels, out_preds, beliefs


def hfc_predict_from_features(groups, centers, clusters_per_layer, out_size,
                              hier_encode=True, beliefs=None):
    """Pure jittable HFC inference: grouped features -> (features, labels).

    Functional core of the reference's predict_hfc_vectors
    (baseline/hfc_kmeans/segmentor.py:169-230): per-layer kmeans assignment,
    one-hot cluster maps resized to out_size, optional belief-matrix
    hierarchical encoding. With ``centers`` and ``beliefs`` passed as arrays
    this composes under jit, so the pipeline's generate→embed→segment program
    stays one device program for hfc_kmeans too.
    """
    cluster_maps, cluster_labels = [], []
    first = groups[0]
    dt = (first[0] if isinstance(first, (tuple, list)) else first).dtype
    for n, (feat, c) in enumerate(zip(groups, centers)):
        # tuple entries = channel parts (group_features_by_block concat=False):
        # assignment distributes over the split, the concat never exists
        parts = feat if isinstance(feat, (tuple, list)) else (feat,)
        b, h, w, _ = parts[0].shape
        labels = kmeans_predict_parts(
            [p.reshape(-1, p.shape[-1]) for p in parts], c
        )
        labels = labels.reshape(b, h, w)
        # resize the integer label map, THEN one-hot: identical result
        # (nearest resize commutes with per-pixel one-hot) but the resize is
        # a channel-free gather — resizing the one-hot materializes tiny-
        # channel f32 maps that XLA's (8,128) tiling pads up to 32×
        # (measured: OOM at batch 96 on a 16 GB chip; this form reaches 128+)
        lab_up = _resize_labels(labels, out_size)
        cluster_maps.append(jax.nn.one_hot(lab_up, clusters_per_layer[n],
                                           dtype=dt))
        cluster_labels.append(labels[:, None, :, :])
    out_preds = jnp.concatenate(cluster_maps, axis=-1)

    if hier_encode:
        # beliefs=None estimates them from this batch in-graph
        # (region_beliefs_device) — the train-mode fallback, same math as
        # the reference's per-sample path (segmentor.py:169-230)
        k_last = clusters_per_layer[len(groups) - 1]
        hier_labels, hier_preds, _ = hierarchical_label_encoding(
            cluster_labels, out_preds[..., -k_last:], clusters_per_layer,
            beliefs,
        )
        return jnp.concatenate(hier_preds[::-1], axis=-1) * 2 - 1, hier_labels

    return out_preds * 2 - 1, cluster_labels


def hfc_segment_fcn(groups, centers, clusters_per_layer, out_size,
                    seg_params, size):
    """Fused flat-HFC serving: cluster-assign → segment without the full-
    resolution one-hot concat.

    Exactly equals ``one_shot_segmentor_apply(seg_params,
    hfc_predict_from_features(..., hier_encode=False)[0], size)``: the
    per-layer features are affine one-hot maps (2·onehot−1) nearest-
    upsampled to out_size, nearest-up commutes with the per-pixel affine,
    and the head's first conv distributes over the concat's channel
    slices — so each layer feeds ``embed.concat_segment_fcn``'s polyphase
    machinery at its NATIVE resolution (4²…64²). The (B, out², Σk)
    one-hot concat and the per-layer label upsamples — ~2/3 of the
    unfused program's device time at 256² batch 32 (op-ranked trace,
    scripts/method_profile.py) — never materialize.

    Returns (logits, per-layer native-resolution label maps) — the same
    labels hfc_predict_from_features yields.

    Each ``groups`` entry may be a tuple/list of channel parts instead of
    one concatenated array (``group_features_by_block(..., concat=False)``):
    the assignment then runs as per-part matmuls (kmeans_predict_parts) and
    the per-level channel-concat copies — ~32 ms of the 392 ms batch-256
    serving program (copy/pad ops, trace-ranked) — never exist.
    """
    from ganecdotes_tpu.selfsup.embed import concat_segment_fcn
    from ganecdotes_tpu.selfsup.heads import one_shot_segmentor_apply

    maps, cluster_labels, all_labels = [], [], []
    first = groups[0]
    dt = (first[0] if isinstance(first, (tuple, list)) else first).dtype
    for n, (feat, c) in enumerate(zip(groups, centers)):
        parts = feat if isinstance(feat, (tuple, list)) else (feat,)
        b, h, w, _ = parts[0].shape
        labels = kmeans_predict_parts(
            [p.reshape(-1, p.shape[-1]) for p in parts], c
        )
        labels = labels.reshape(b, h, w)
        cluster_labels.append(labels[:, None, :, :])
        all_labels.append(labels)

    from ganecdotes_tpu.selfsup.embed import narrow_first_conv

    total = sum(clusters_per_layer[: len(groups)])
    w0 = seg_params[0]["weight"]
    # the multi-hot fast path builds z with exactly sum(cpl) channels, so
    # it additionally requires the head's first conv to expect that width
    # (the fallback tolerates head/feature skew via per-level slicing)
    if (w0.ndim == 4 and w0.shape[2] == total
            and narrow_first_conv(total, w0.shape[-1])):
        # Narrow-concat case (embed.concat_segment_fcn's traffic policy):
        # the affine one-hot concat is a MULTI-HOT of offset label maps —
        # concat[p, c] = 2·Σ_l [lab_l[p] + off_l == c] − 1 with disjoint
        # channel slices — so build it as ONE fused elementwise write over
        # broadcast-upsampled label maps. A per-level one_hot + channel
        # concatenate writes the same 4.2 GB tensor through misaligned
        # lane offsets (4/12/28/60): the batch-256 concatenate ran at
        # ~124 GB/s, 34 ms of the 329 ms program (trace-ranked).
        ch = jnp.arange(total, dtype=jnp.int32)
        acc = None
        off = 0
        for n, labels in enumerate(all_labels):
            lu = _resize_labels(labels.astype(jnp.int32), out_size)
            ind = lu[..., None] == (ch - off)
            acc = ind if acc is None else acc | ind
            off += clusters_per_layer[n]
        z = (2 * acc.astype(dt) - 1)
        return one_shot_segmentor_apply(seg_params, z, size), cluster_labels

    for n, labels in enumerate(all_labels):
        maps.append(
            jax.nn.one_hot(labels, clusters_per_layer[n], dtype=dt) * 2 - 1
        )
    logits = concat_segment_fcn(
        maps, seg_params, size, out_hw=(out_size, out_size)
    )
    return logits, cluster_labels


# ---------------------------------------------------------------------------
# preprocessor (reference-API-compatible)
# ---------------------------------------------------------------------------


class HFCPreprocessor:
    """K-means preprocessing front-end (baseline/hfc_kmeans/segmentor.py:11-231)."""

    def __init__(self, model, model_config, perturb_args, hfc_args,
                 hfc_algo="hfc_kmeans", hier_encode=True, hle_samples=500,
                 train=True, out_dir=None, logger=None, seed=42):
        self.model = model
        self.model_config = model_config
        self.perturb_config = perturb_args
        self.hfc_args = hfc_args
        self.hier_encode = hier_encode
        self.hfc_algo = hfc_algo
        self.out_dir = out_dir
        self.train = train
        self.logger = logger
        self.hle_samples = hle_samples
        self.key = jax.random.PRNGKey(seed)

        assert self.hfc_algo in ["hfc_kmeans", "hfc_kmeans_hier"]
        hfc_args = dict(hfc_args)
        hfc_args["base_args"] = dict(hfc_args["base_args"])
        hfc_args["base_args"]["out_dir"] = self.out_dir
        hfc_args["base_args"]["logger"] = self.logger

        cls = FlatKMeansHFC if self.hfc_algo == "hfc_kmeans" else HierarchicalKMeansHFC
        self.hfc_model = cls(**hfc_args)

        self.belief_file = os.path.join(self.out_dir, "beliefs.npz")
        self.trained_beliefs = None

        self.key, km = jax.random.split(self.key)
        self.mean_latent = model.mean_latent(
            getattr(model_config, "num_latents_for_mean", 4096), key=km
        )

    def _w_plus(self, input_latent):
        lat = jnp.asarray(input_latent)
        if lat.ndim == 1:
            lat = lat[None]
        trunc = self.perturb_config["truncation"]
        w = self.mean_latent + trunc * (lat - self.mean_latent)
        return jnp.repeat(w[:, None, :], self.model.meta["n_latent"], axis=1)

    def _grouped_features(self, w_plus):
        _, feats = self.model(
            [w_plus], input_is_latent=True,
            truncation=self.perturb_config["truncation"],
            truncation_latent=self.mean_latent, randomize_noise=False,
        )
        return group_features_by_block(feats, skip_const=True)

    def train_hfc_model(self, input_latent, return_aug=False):
        """Fit per-layer clusterers on layer-perturbed augmentations
        (ref segmentor.py:68-167)."""
        n_layers = self.perturb_config["n_layers"]
        n_samples = self.perturb_config["n_samples"]
        stds = self.perturb_config["perturb_std"]
        w_plus = self._w_plus(input_latent)

        hidden_features = []
        for k in range(n_layers):
            self.key, kp = jax.random.split(self.key)
            row_std = block_row_std(
                jnp.asarray(k), n_layers, stds, self.model.meta["n_latent"]
            )
            w_rep = jnp.repeat(w_plus, n_samples, axis=0)
            w_new = perturb_latents(self.model.params, w_rep, kp, row_std)
            groups = self._grouped_features(w_new)
            hidden_features.append(groups[k])
            self._log(f"Generated features for Layer: {k}")

        if self.hfc_algo == "hfc_kmeans_hier":
            self.hfc_model.hierarchical_fit(hidden_features)
        else:
            self.hfc_model.fit(hidden_features)

        if self.hier_encode:
            self.trained_beliefs = self.multi_sample_hierarchical_encoding(
                self.hle_samples, n_layers
            )
            np.savez_compressed(
                self.belief_file, *[np.asarray(b) for b in self.trained_beliefs]
            )
        if return_aug:
            return hidden_features

    def _log(self, msg):
        (self.logger.info if self.logger else print)(msg)

    def ensure_loaded(self):
        """Materialize centers + beliefs so inference is pure array math."""
        self.hfc_model.ensure_centers()
        if self.hier_encode and self.trained_beliefs is None and not self.train:
            self.trained_beliefs = load_belief_file(self.belief_file)

    def predict_hfc_vectors(self, input_latent):
        """(features (B, out, out, C) in [-1, 1], labels) — ref :169-230."""
        w_plus = self._w_plus(input_latent)
        groups = self._grouped_features(w_plus)
        n_layers = self.perturb_config["n_layers"]
        self.ensure_loaded()

        if self.hier_encode and self.trained_beliefs is None:
            # train-mode fallback: estimate beliefs from this sample alone
            # (host-side regionprops-equivalent path)
            out_preds, out_labels = self.hfc_model.predict(groups[:n_layers])
            k_last = self.hfc_model.clusters_per_layer[-1]
            hier_labels, hier_preds, _ = hierarchical_label_encoding(
                out_labels,
                out_preds[..., -k_last:],
                self.hfc_model.clusters_per_layer,
                None,
            )
            return (
                jnp.concatenate(hier_preds[::-1], axis=-1) * 2 - 1,
                hier_labels,
            )

        return hfc_predict_from_features(
            groups[:n_layers],
            self.hfc_model.centers[:n_layers],
            self.hfc_model.clusters_per_layer,
            self.hfc_model.out_size,
            self.hier_encode,
            self.trained_beliefs,
        )

    def multi_sample_hierarchical_encoding(self, n_samples, n_layers):
        """Belief matrices averaged over unlabeled samples (ref :482-545)."""
        beliefs = None
        for _ in range(n_samples):
            self.key, kz = jax.random.split(self.key)
            z = jax.random.normal(kz, (1, self.model_config.latent_dim))
            w = self.model.style(z)
            groups = self._grouped_features(self._w_plus(w))
            out_preds, out_labels = self.hfc_model.predict(groups[:n_layers])
            k_last = self.hfc_model.clusters_per_layer[-1]
            _, _, new_belief = hierarchical_label_encoding(
                out_labels,
                out_preds[..., -k_last:],
                self.hfc_model.clusters_per_layer,
                beliefs=None,
            )
            if beliefs is None:
                beliefs = new_belief
            else:
                beliefs = [0.5 * (a + b) for a, b in zip(beliefs, new_belief)]
        return beliefs
