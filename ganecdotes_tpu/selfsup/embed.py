"""Per-pixel feature embedding — the fused "pixel-embedding kernel".

The reference builds a (1, 4864, 256, 256) tensor by nearest-upsampling all 13
feature maps to full resolution and concatenating channels
(swav_clustering.py:108-130, ``create_pixel_feature_vectors``), then pushes
pixels through a linear projection. That tensor is ~1.3 GB in fp32 and the
concat/projection round-trips HBM.

TPU-first redesign — the upsample+concat+project pipeline is algebraically
restructured so the big tensor never exists:

* The projection's first linear layer splits by pyramid level:
  ``z(p) = Σ_l W_l · f_l(src_l(p))``. Both nearest and bilinear interpolation
  are linear maps that commute with the channel-wise matmul, so each term is
  computed at its **native** resolution (tiny MXU matmuls) and only the
  nclasses-wide result is upsampled and summed (``project_feature_maps``).
* For training's random-pixel subsets, pixels are gathered per level straight
  from the native maps (``pixel_feature_gather`` / ``project_gathered``) —
  nearest upsampling of pixel p is just an index map, so no upsampling
  happens at all.

``pixel_feature_maps`` keeps the explicit concat form for parity tests and
for the RepurposeGAN/DatasetGAN baselines that genuinely need raw concat
features (baseline/*/segmentor.py concat_features).
"""

import jax
import jax.numpy as jnp
import numpy as np

from ganecdotes_tpu.ops.interp import (
    _nearest_indices,
    resize_bilinear,
    resize_nearest,
)


def layer_channel_dims(features):
    return [int(f.shape[-1]) for f in features]


def pixel_feature_maps(features, hlen=None, interp="nearest", n_layers=None):
    """Explicit upsample+concat (B, H, W, Σc)[..., :hlen] — parity/baseline path.

    Matches create_pixel_feature_vectors / concat_features semantics
    (channel-first slice in the reference == trailing-axis slice here).
    """
    if n_layers is not None:
        features = features[:n_layers]
    h = max(f.shape[1] for f in features)
    w = max(f.shape[2] for f in features)
    resize = resize_nearest if interp == "nearest" else resize_bilinear
    out = jnp.concatenate([resize(f, (h, w)) for f in features], axis=-1)
    if hlen is not None:
        out = out[..., :hlen]
    return out


def _split_weight_by_layer(weight, channel_dims, hlen=None):
    """Split the (hlen, out) first-layer weight into per-level chunks.

    ``hlen`` may truncate the concat mid-level (reference slices channels
    [:hlen]); levels past the cut get zero usable channels.
    """
    total = weight.shape[0] if hlen is None else hlen
    chunks = []
    off = 0
    for c in channel_dims:
        use = max(0, min(c, total - off))
        chunks.append((off, use))
        off += c
    return chunks


def project_feature_maps(features, weight, hlen=None, interp="nearest"):
    """First-linear projection of the virtual concat tensor, level-decomposed.

    features: list of (B, h, w, c) NHWC maps; weight: (Σc or hlen, out).
    Returns (B, H, W, out) == pixel_feature_maps(...) @ weight, exactly.
    """
    h = max(f.shape[1] for f in features)
    w = max(f.shape[2] for f in features)
    dims = layer_channel_dims(features)
    chunks = _split_weight_by_layer(weight, dims, hlen)

    if interp == "nearest":
        # Progressive coarse→fine accumulation: integer-factor nearest
        # upsampling composes exactly (floor(dst/s1·s2) = iterated floors),
        # so the accumulator is upsampled ×2 per resolution step instead of
        # upsampling every level straight to full res — one full-res
        # temporary instead of len(features), and the broadcasts fuse.
        acc = None
        for f, (off, use) in zip(features, chunks):
            if use == 0:
                continue
            w_l = weight[off : off + use].astype(f.dtype)
            z = f[..., :use] @ w_l  # native-resolution matmul
            if acc is None:
                acc = z
            else:
                ah, aw = acc.shape[1], acc.shape[2]
                fh, fw = z.shape[1], z.shape[2]
                if (fh, fw) != (ah, aw):
                    if fh % ah == 0 and fw % aw == 0:
                        acc = resize_nearest(acc, (fh, fw))
                    else:  # non-nested pyramid: fall back to direct upsample
                        acc = resize_nearest(acc, (h, w))
                        z = resize_nearest(z, (h, w))
                acc = acc + z
        return resize_nearest(acc, (h, w))

    out = None
    for f, (off, use) in zip(features, chunks):
        if use == 0:
            continue
        w_l = weight[off : off + use].astype(f.dtype)
        z = f[..., :use] @ w_l  # native-resolution matmul
        z = resize_bilinear(z, (h, w))
        out = z if out is None else out + z
    return out


def project_segment_single_conv(features, weight, head_w, head_b, hlen=None):
    """Logits of a single-3×3-conv head over the level-decomposed embedding,
    without ever materializing the (B, H, W, nclasses) embedding.

    Exact refactoring for nearest interpolation and a linear head (the XXS
    one-shot segmentor is one Conv2d, ref swav_clustering.py:716-717,731):
    the conv distributes over the level sum, commutes with the per-pixel
    projection matmuls, and composes with nearest up-f sampling into
    polyphase convs (``_polyphase_conv3x3_up``):

        conv3x3(Σ_l U_fl(f_l · P_l), W)
          = Σ_{full-res l} conv3x3(f_l, P_l · W)
          + Σ_{coarse res r} polyphase_up_{H/r}(Σ_{l at r} f_l · P_l, W)

    with the coarse accumulation stopped at H/4 (cheap transitions) and the
    H/4 and H/2 groups emitted through their own polyphase convs. vs the
    unfused form this cuts the head's HBM traffic from ~27 GB to ~4 GB per
    96-image batch at 256² — the (B, H, W, nclasses) embedding never exists,
    and neither does the up2 of the (B, H/2, W/2, nclasses) accumulator
    (profiled at ~16 ms/step, batch 128, before the polyphase-per-resolution
    form).

    ``weight``: (hlen, nclasses) projection; ``head_w``: (3, 3, nclasses,
    C_out) HWIO; ``head_b``: (C_out,). Returns (B, H, W, C_out) logits.
    """

    h = max(f.shape[1] for f in features)
    w = max(f.shape[2] for f in features)
    dims = layer_channel_dims(features)
    chunks = _split_weight_by_layer(weight, dims, hlen)

    full, coarse = [], []
    for f, (off, use) in zip(features, chunks):
        if use == 0:
            continue
        (full if f.shape[1] == h and f.shape[2] == w else coarse).append(
            (f, off, use)
        )

    dt = features[0].dtype
    out = None

    # full-resolution levels: fold the projection into the conv weights
    for f, off, use in full:
        w_l = weight[off : off + use]  # (use, nclasses)
        wc = jnp.einsum(
            "cd,tsdo->tsco", w_l, head_w,
            preferred_element_type=jnp.float32,
        ).astype(dt)
        y = jax.lax.conv_general_dilated(
            f[..., :use], wc, window_strides=(1, 1),
            padding=((1, 1), (1, 1)),
            dimension_numbers=("NHWC", "HWIO", "NHWC"),
            preferred_element_type=dt,
        )
        out = y if out is None else out + y

    # coarse contributions: conv3x3∘nearest-up_f as ONE polyphase conv per
    # source resolution (see _polyphase_conv3x3_up). The accumulation stops
    # at h/4: materializing the up2 of the (B, h/2, w/2, 512) accumulator
    # was the single most expensive non-conv op in the headline program
    # (profiled: ~16 ms/step at batch 128, a T(2,128)-padded broadcast),
    # while emitting the h/4 and h/2 groups through their own polyphase
    # convs adds only ~2 GF/img of full-lane MXU work.
    # Above-cutoff groups (r = h/2): compose the projection INTO the
    # polyphase conv weights per level instead of materializing the
    # D-wide projected tensor. conv is linear, so
    #   polyphase(Σ_l f_l·P_l, W) = Σ_l polyphase(f_l, P_l·W)
    # and the (B, r, rw, D) temp — 8 GiB bf16 for car-512's 256²-res
    # group at batch 128, a write+read HBM round trip — never exists;
    # each conv reads the feature at its NATIVE channel width. Static
    # FLOP guard: fold only when Σ_l 9·use_l·f²·co ≤ Σ_l use_l·D +
    # 9·D·f²·co (true for every production head, where f²·co ≪ D; a
    # hypothetical very-wide-output head keeps the projected form).
    # Merge target h/4, as profiled at 256². A 64² cap (routing the h/4
    # group through its own composed polyphase convs) was measured at
    # 512² batch 128 and is a wash: polyphase FLOPs are invariant to the
    # emission resolution (r²·f² ≡ h²), so the extra per-level emission
    # convs (~5 TF, at ~98% MFU) cost exactly what the skipped h/8→h/4
    # accumulator transition saved (490.6 vs 485.5 img/s).
    cutoff = h // 4
    d_proj = head_w.shape[2]
    co = head_w.shape[3]
    groups = {}  # source resolution -> summed (B, r, rw, C) tensor
    hi = {}  # source resolution -> [(feature slab, projection chunk)]
    for f, off, use in coarse:
        r = f.shape[1]
        if r > cutoff:
            hi.setdefault(r, []).append((f, off, use))
            continue
        z = f[..., :use] @ weight[off : off + use].astype(f.dtype)
        if r in groups:
            groups[r] = groups[r] + z
        else:
            groups[r] = z
    for r, levels in list(hi.items()):
        f_up = h // r
        fold = sum(9 * use * f_up * f_up * co for _, _, use in levels)
        proj = (sum(use * d_proj for _, _, use in levels)
                + 9 * d_proj * f_up * f_up * co)
        if fold > proj:  # wide-output head: projected form is cheaper
            del hi[r]
            for f, off, use in levels:
                z = f[..., :use] @ weight[off : off + use].astype(f.dtype)
                groups[r] = groups[r] + z if r in groups else z
    if groups:
        res_sorted = sorted(groups)
        acc = None
        for r in res_sorted:
            if r > cutoff:
                break
            z = groups.pop(r)
            if acc is not None:
                if acc.shape[1] != r:
                    acc = resize_nearest(acc, (r, z.shape[2]))
                acc = acc + z
            else:
                acc = z
        if acc is not None:
            # acc only ever holds resolutions <= cutoff (the loop breaks at
            # the first r > cutoff) and any cutoff-resolution group was
            # popped into it, so this insertion never collides
            if acc.shape[1] != cutoff:
                acc = resize_nearest(acc, (cutoff, cutoff * w // h))
            groups[cutoff] = acc
        for r, z in groups.items():
            y = _polyphase_conv3x3_up(z, head_w, h // r, dt)
            out = y if out is None else out + y

    for r in sorted(hi):
        for f, off, use in hi[r]:
            wc = jnp.einsum(
                "cd,tsdo->tsco", weight[off : off + use],
                head_w.astype(jnp.float32),
                preferred_element_type=jnp.float32,
            )  # (3, 3, use, C_out): projection folded into the conv
            y = _polyphase_conv3x3_up(f[..., :use], wc, h // r, dt)
            out = y if out is None else out + y

    return out + head_b.astype(dt)


def _polyphase_conv3x3_up(z, head_w, f, dt):
    """conv3x3(nearest_up_f(z), head_w) without materializing the upsample.

    Exact polyphase decomposition: fine output (f·i+dy, f·j+dx) reads fine
    taps f·i+d+t-1 (t∈0..2) which live in the coarse window (i-1, i, i+1)
    at offsets floor((d+t-1)/f) — phase 0 reaches i-1 via tap 0, phase f-1
    reaches i+1 via tap 2, every other (phase, tap) lands on i. All f²
    phases stack into one conv with f²·C_out output channels (full MXU
    lanes) followed by a depth-to-space reshape. f=1 degenerates to the
    plain conv.
    """
    b_, r, rw, c_in = z.shape
    c_out = head_w.shape[-1]
    if f == 1:
        return jax.lax.conv_general_dilated(
            z, head_w.astype(dt), window_strides=(1, 1),
            padding=((1, 1), (1, 1)),
            dimension_numbers=("NHWC", "HWIO", "NHWC"),
            preferred_element_type=dt,
        )
    # E[d, pos, tap] embeds fine tap t of phase d at coarse window position
    # pos ∈ {i-1, i, i+1}
    E = np.zeros((f, 3, 3), dtype=np.float32)
    E[:, 1, :] = 1.0  # default: every tap lands on i
    E[0, 1, 0] = 0.0
    E[0, 0, 0] = 1.0  # phase 0, tap 0 -> i-1
    E[f - 1, 1, 2] = 0.0
    E[f - 1, 2, 2] = 1.0  # phase f-1, tap 2 -> i+1
    E = jnp.asarray(E)
    wp = jnp.einsum(
        "yvt,xws,tsdo->vwdyxo", E, E, head_w.astype(jnp.float32),
        preferred_element_type=jnp.float32,
    )  # (3, 3, C_in, f, f, C_out)
    wp = wp.reshape(3, 3, c_in, f * f * c_out).astype(dt)
    yc = jax.lax.conv_general_dilated(
        z, wp, window_strides=(1, 1), padding=((1, 1), (1, 1)),
        dimension_numbers=("NHWC", "HWIO", "NHWC"),
        preferred_element_type=dt,
    )  # (B, r, rw, f*f*C_out)
    yc = yc.reshape(b_, r, rw, f, f, c_out)
    return yc.transpose(0, 1, 3, 2, 4, 5).reshape(b_, f * r, f * rw, c_out)


def narrow_first_conv(total_in, c_out):
    """Traffic policy: materialized nearest-up concat vs polyphase lift.

    The polyphase form exists to keep a WIDE (B, H, W, Σc) concat out of
    HBM (Σc≈4.9k for repurposegan — ~600 MB/img bf16), but its f²·C_out
    phase tensors + depth-to-space cost 2·H²·C_out of extra HBM round trip
    per lifted group. When the input concat is NARROWER than that
    (Σc ≤ 2·C_out), the direct form moves less data. Measured on v5e
    (hfc_kmeans, Σc=124, C_out=128): 701 → 803 img/s @ batch 256 (+14.5%).
    Conv FLOPs are identical either way. Shared by concat_segment_fcn and
    kmeans.hfc_segment_fcn so both sides of the same program agree.
    """
    return total_in <= 2 * c_out


def concat_segment_fcn(features, seg_params, size, hlen=None, n_layers=None,
                       out_hw=None):
    """FCN-head logits over the raw upsample+concat features, first conv
    fused into the level pyramid (the RepurposeGAN serving path,
    ref baseline/repurposegan/segmentor.py + one_shot_pipeline.py:615).

    ``out_hw`` overrides the emission resolution (default: the finest
    feature's). The hfc_kmeans fused path emits at the config's out_size
    (256) from one-hot maps whose finest native resolution is 64.

    A conv's input-channel slices are independent, so for the concat of
    nearest-upsampled levels

        conv3x3(concat_l up_f(f_l), W) = Σ_l conv3x3(up_f(f_l), W[:, :, s_l])

    where ``s_l`` is level l's channel slice of the first conv weight.
    Full-res levels convolve directly; levels above the merge cutoff go
    through per-level polyphase convs (``_polyphase_conv3x3_up``); levels
    at/below the cutoff are lifted to the cutoff resolution in concat
    space (small: cutoff ≤ 64) and share ONE phase-stacked conv. Total
    conv FLOPs equal the monolithic head conv's exactly (each channel
    contributes 9·C_out MACs per output pixel either way) — what
    disappears is the (B, H, W, Σc) concat tensor (~600 MB/img bf16 at
    the repurposegan-256 config) and its HBM round trip. The remaining
    dilated convs run unchanged.
    """
    from ganecdotes_tpu.nn.layers import conv2d_dilated_nhwc, leaky_relu
    from ganecdotes_tpu.selfsup.heads import DILATIONS

    if n_layers is not None:
        features = features[:n_layers]
    if out_hw is not None:
        h, w = out_hw
    else:
        h = max(f.shape[1] for f in features)
        w = max(f.shape[2] for f in features)
    w0 = seg_params[0]["weight"]  # (3, 3, Σc[:hlen], C1) HWIO
    b0 = seg_params[0]["bias"]
    total = hlen if hlen is not None else w0.shape[2]
    dt = features[0].dtype
    cutoff = min(h // 4, 64)

    if narrow_first_conv(total, w0.shape[3]):
        # Narrow-input policy (see narrow_first_conv): materialize the
        # nearest-up concat and run the plain first conv — the integer-
        # factor resizes are broadcasts that fuse into the concat, and the
        # polyphase d2s relayouts (2 × 4.3 GB copies in the batch-256 hfc
        # program, trace-ranked) disappear.
        ups, ups_w, off = [], [], 0
        for f in features:
            c = f.shape[-1]
            use = max(0, min(c, total - off))
            w_sl = w0[:, :, off : off + use, :]
            off += c
            if use == 0:
                continue
            ups.append(resize_nearest(f[..., :use], (h, w)))
            ups_w.append(w_sl)
        out = conv2d_dilated_nhwc(
            jnp.concatenate(ups, axis=-1),
            jnp.concatenate(ups_w, axis=2).astype(dt),
            dilation=1, padding=1,
        )
    else:
        out = None
        lift, lift_w = [], []  # levels merged at the cutoff resolution
        off = 0
        for f in features:
            c = f.shape[-1]
            use = max(0, min(c, total - off))
            w_sl = w0[:, :, off : off + use, :]
            off += c
            if use == 0:
                continue
            r = f.shape[1]
            if r == h and f.shape[2] == w:
                y = conv2d_dilated_nhwc(f[..., :use], w_sl.astype(dt),
                                        dilation=1, padding=1)
            elif r > cutoff:
                y = _polyphase_conv3x3_up(f[..., :use], w_sl, h // r, dt)
            else:
                lift.append(
                    resize_nearest(f[..., :use], (cutoff, cutoff * w // h))
                )
                lift_w.append(w_sl)
                continue
            out = y if out is None else out + y
        if lift:
            zc = jnp.concatenate(lift, axis=-1)
            wc = jnp.concatenate(lift_w, axis=2)
            y = _polyphase_conv3x3_up(zc, wc, h // cutoff, dt)
            out = y if out is None else out + y

    out = out + b0.astype(dt)
    dilations = DILATIONS[size]
    for p, d in zip(seg_params[1:], dilations[1:]):
        out = leaky_relu(out)
        out = conv2d_dilated_nhwc(out, p["weight"], dilation=d, padding=d)
        out = out + p["bias"].astype(out.dtype)
    return out


def pixel_feature_gather(features, picks, out_hw, hlen=None):
    """Gather full concat feature vectors for a pixel subset, per level.

    picks: (N,) flat indices into the (H, W) full-resolution grid (row-major,
    matching torch ``flatten(1)`` of CHW). Returns (B, N, Σc[:hlen]).
    Nearest-interp only (the training configs all use hf_interp='nearest').
    """
    h, w = out_hw
    ys = picks // w
    xs = picks % w
    cols = []
    total = hlen if hlen is not None else sum(layer_channel_dims(features))
    off = 0
    for f in features:
        c = f.shape[-1]
        use = max(0, min(c, total - off))
        off += c
        if use == 0:
            continue
        fh, fw = f.shape[1], f.shape[2]
        ri = jnp.asarray(_nearest_indices(fh, h))
        ci = jnp.asarray(_nearest_indices(fw, w))
        cols.append(f[:, ri[ys], ci[xs], :use])  # (B, N, use)
    return jnp.concatenate(cols, axis=-1)


def project_gathered(features, picks, out_hw, weight, hlen=None):
    """Σ_l gather_l(picks) @ W_l — projection of a pixel subset, level-split.

    Equals pixel_feature_gather(...) @ weight without materializing the
    (N, hlen) matrix per level boundary. Returns (B, N, out).

    Measured-REJECTED alternative (v5e, production SwAV step): per level
    the two associations of gather∘project are algebraically identical,
    and project-then-gather costs H_l·W_l·c_l·out FLOPs vs N·c_l·out —
    a ~7× forward FLOP cut at N=20000 picks vs ≤128² levels. On
    hardware it trimmed the forward micro-stage only 7.7 → 6.3 ms but
    REGRESSED the full train step 216 → 235 ms (repeatable): the
    gather's vjp becomes a 20000-row scatter-add into each level's
    (H·W, out) projection — TPU scatter with colliding indices costs
    more than the saved matmul FLOPs. Gather-then-project keeps the
    vjp a dense matmul (g^T @ dz). Forward-only callers gather few
    pixels (GUI paths), so no split dispatch is warranted.
    """
    h, w = out_hw
    ys = picks // w
    xs = picks % w
    dims = layer_channel_dims(features)
    chunks = _split_weight_by_layer(weight, dims, hlen)
    out = None
    for f, (off, use) in zip(features, chunks):
        if use == 0:
            continue
        fh, fw = f.shape[1], f.shape[2]
        ri = jnp.asarray(_nearest_indices(fh, h))
        ci = jnp.asarray(_nearest_indices(fw, w))
        g = f[:, ri[ys], ci[xs], :use]  # (B, N, use)
        z = g @ weight[off : off + use].astype(g.dtype)
        out = z if out is None else out + z
    return out


def project_segment_fcn(features, weight, seg_params, size, hlen=None):
    """Logits of a multi-conv FCN head over the level-decomposed embedding.

    Generalizes ``project_segment_single_conv`` to every OneShotSegmentor
    size: the FIRST conv (always dilation 1) is linear in the embedding, so
    it folds into the per-level polyphase decomposition — the (B, H, W,
    nclasses) embedding never materializes; only the much narrower first
    conv output does (XS: 512 -> 16 channels at full res). The remaining
    dilated convs run on that intermediate exactly as
    ``one_shot_segmentor_apply`` would.
    """
    from ganecdotes_tpu.nn.layers import conv2d_dilated_nhwc, leaky_relu
    from ganecdotes_tpu.selfsup.heads import DILATIONS

    out = project_segment_single_conv(
        features, weight, seg_params[0]["weight"], seg_params[0]["bias"],
        hlen=hlen,
    )
    dilations = DILATIONS[size]
    for p, d in zip(seg_params[1:], dilations[1:]):
        out = leaky_relu(out)
        out = conv2d_dilated_nhwc(out, p["weight"], dilation=d, padding=d)
        out = out + p["bias"].astype(out.dtype)
    return out
