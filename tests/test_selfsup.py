"""Tests for the self-supervised layer: embedding decomposition, Sinkhorn,
SwAV step, augmentor, segmentor heads (torch parity where meaningful)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from ganecdotes_tpu.selfsup.augmentor import (
    block_row_std,
    group_features_by_block,
    rotate_flip_nhwc,
)
from ganecdotes_tpu.selfsup.embed import (
    pixel_feature_gather,
    pixel_feature_maps,
    project_feature_maps,
    project_gathered,
)
from ganecdotes_tpu.selfsup.heads import (
    init_one_shot_segmentor,
    one_shot_segmentor_apply,
    segmentor_out_channels,
)
from ganecdotes_tpu.selfsup.swav import (
    init_swav_params,
    normalize_prototypes,
    sinkhorn_knopp,
    swapped_prediction_loss,
)


def _fake_pyramid(key, b=1, sizes=((4, 8), (8, 16), (16, 12))):
    keys = jax.random.split(key, len(sizes))
    return [
        jax.random.normal(k, (b, s, s, c)) for k, (s, c) in zip(keys, sizes)
    ]


def test_project_feature_maps_equals_concat_projection():
    key = jax.random.PRNGKey(0)
    feats = _fake_pyramid(key, b=2)
    total_c = sum(f.shape[-1] for f in feats)
    W = jax.random.normal(jax.random.PRNGKey(1), (total_c, 7))

    full = pixel_feature_maps(feats, interp="nearest")
    want = full @ W
    got = project_feature_maps(feats, W, interp="nearest")
    np.testing.assert_allclose(np.asarray(got), np.asarray(want), atol=1e-4)

    # bilinear also commutes (linear map)
    fullb = pixel_feature_maps(feats, interp="bilinear")
    np.testing.assert_allclose(
        np.asarray(project_feature_maps(feats, W, interp="bilinear")),
        np.asarray(fullb @ W),
        atol=1e-4,
    )


def test_project_feature_maps_respects_hlen_truncation():
    key = jax.random.PRNGKey(2)
    feats = _fake_pyramid(key)
    hlen = 15  # cuts into the second level (8 + 16 channels)
    W = jax.random.normal(jax.random.PRNGKey(3), (hlen, 5))
    want = pixel_feature_maps(feats, hlen=hlen) @ W
    got = project_feature_maps(feats, W, hlen=hlen)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want), atol=1e-4)


def test_pixel_gather_matches_full_maps():
    key = jax.random.PRNGKey(4)
    feats = _fake_pyramid(key)
    full = pixel_feature_maps(feats)  # (1, 16, 16, C)
    picks = jax.random.permutation(jax.random.PRNGKey(5), 16 * 16)[:50]
    got = pixel_feature_gather(feats, picks, (16, 16))
    ys, xs = picks // 16, picks % 16
    want = full[:, ys, xs, :]
    np.testing.assert_allclose(np.asarray(got), np.asarray(want), atol=1e-6)

    W = jax.random.normal(jax.random.PRNGKey(6), (full.shape[-1], 9))
    got_p = project_gathered(feats, picks, (16, 16), W)
    np.testing.assert_allclose(np.asarray(got_p), np.asarray(want @ W), atol=1e-4)

    # N > every level's cell count drives the project-first branch on all
    # levels (the production regime: 20k picks vs <=128^2-cell levels);
    # repeated picks included deliberately
    many = jax.random.randint(jax.random.PRNGKey(8), (600,), 0, 16 * 16)
    want_many = full[:, many // 16, many % 16, :] @ W
    got_many = project_gathered(feats, many, (16, 16), W)
    np.testing.assert_allclose(
        np.asarray(got_many), np.asarray(want_many), atol=1e-4
    )
    # and the grad wrt W survives the scatter-add transpose of the gather
    gfn = jax.grad(
        lambda W: project_gathered(feats, many, (16, 16), W).sum()
    )
    gref = jax.grad(
        lambda W: (pixel_feature_gather(feats, many, (16, 16)) @ W).sum()
    )
    np.testing.assert_allclose(
        np.asarray(gfn(W)), np.asarray(gref(W)), atol=1e-3, rtol=1e-4
    )


def test_sinkhorn_marginals_converge():
    key = jax.random.PRNGKey(7)
    scores = jax.random.normal(key, (64, 16))
    r = jnp.ones((16,)) / 16
    c = jnp.ones((64,)) / 64
    q = sinkhorn_knopp(scores, niters=50, eps=0.5, r=r, c=c)
    # columns of Q^T (rows of q over prototypes... q is (B, K)); after the
    # final renorm each pixel's code sums to 1/K-normalized columns: check
    # the pre-transpose invariant instead: row sums approach r after iters
    np.testing.assert_allclose(np.asarray(q.sum(axis=1)), 1.0, atol=1e-3)
    assert np.all(np.asarray(q) >= 0)


def test_sinkhorn_impl_flag_rejects_unknown_values(monkeypatch):
    """GANECDOTES_SINKHORN_IMPL typos ('fused', 'Pallas', ...) must fail
    loud, not silently select the 2.9x-slower jnp path."""
    import pytest

    scores = jnp.zeros((8, 4))
    r = jnp.ones((4,)) / 4
    c = jnp.ones((8,)) / 8
    monkeypatch.setenv("GANECDOTES_SINKHORN_IMPL", "fused")
    with pytest.raises(ValueError, match="GANECDOTES_SINKHORN_IMPL"):
        sinkhorn_knopp(scores, 1, 0.5, r, c)
    monkeypatch.setenv("GANECDOTES_SINKHORN_IMPL", "jnp")
    assert np.isfinite(np.asarray(sinkhorn_knopp(scores, 1, 0.5, r, c))).all()


def test_sinkhorn_extreme_scores_no_overflow():
    # eps=0.005 with O(1) scores overflows a naive exp(score/eps) in fp32;
    # the stabilized form must stay finite (swav config sinkhorn eps=0.005)
    scores = jnp.asarray(np.random.RandomState(0).randn(100, 50) * 1.0)
    q = sinkhorn_knopp(scores, 10, 0.005,
                       jnp.ones((50,)) / 50, jnp.ones((100,)) / 100)
    assert np.isfinite(np.asarray(q)).all()


def test_sinkhorn_potentials_match_direct_iteration():
    # the shipped sinkhorn iterates (u, v) potentials; pin it against the
    # plain log_q array iteration it replaced (identical trajectory up to
    # float reassociation — see sinkhorn_knopp docstring)
    from jax.scipy.special import logsumexp

    rs = np.random.RandomState(3)
    scores = jnp.asarray(rs.randn(40, 24) * 1.0)
    r = jnp.asarray(np.abs(rs.rand(24)) + 0.1)
    r = r / r.sum()
    c = jnp.ones((40,)) / 40
    for niters, eps in ((1, 0.5), (3, 0.05), (10, 0.005)):
        log_q = (scores / eps).T
        log_q = log_q - logsumexp(log_q)
        for _ in range(niters):
            log_q = log_q + (jnp.log(r) - logsumexp(log_q, axis=1))[:, None]
            log_q = log_q + (jnp.log(c) - logsumexp(log_q, axis=0))[None, :]
        want = jnp.exp(log_q - logsumexp(log_q, axis=0, keepdims=True)).T
        got = sinkhorn_knopp(scores, niters, eps, r, c)
        # eps=0.005 puts logits at +-200/eps scale where f32 reassociation
        # between the two (algebraically identical) forms is visible in the
        # near-one-hot codes — 1e-4 on q in [0, 1] is the honest tolerance
        np.testing.assert_allclose(
            np.asarray(got), np.asarray(want), atol=1e-4, rtol=1e-4,
            err_msg=f"niters={niters} eps={eps}",
        )


def test_sinkhorn_pallas_parity():
    # the TPU streaming kernel (interpret mode here) must match the jnp
    # potentials iteration, incl. the production-extreme eps=0.005 and a
    # K that needs lane padding (136 -> 256)
    from ganecdotes_tpu.ops.sinkhorn_pallas import (
        sinkhorn_knopp_pallas,
        sinkhorn_supported,
    )

    rs = np.random.RandomState(11)
    for b, k, niters, eps in ((160, 136, 3, 0.05), (64, 128, 10, 0.005)):
        assert sinkhorn_supported(b, k) is not None
        scores = jnp.asarray(rs.randn(b, k).astype(np.float32))
        r = jnp.asarray(np.abs(rs.rand(k)).astype(np.float32) + 0.1)
        r = r / r.sum()
        c = jnp.ones((b,), jnp.float32) / b
        want = sinkhorn_knopp(scores, niters, eps, r, c)
        for variant in ("fused", "twopass"):
            got = sinkhorn_knopp_pallas(scores, niters, eps, r, c,
                                        variant=variant)
            assert np.isfinite(np.asarray(got)).all()
            # online-max vs two-pass logsumexp reassociation at eps=0.005
            # logit scale: 1e-4 on codes in [0, 1] (observed max 3.1e-5)
            np.testing.assert_allclose(
                np.asarray(got), np.asarray(want), atol=1e-4, rtol=1e-3,
                err_msg=f"b={b} k={k} eps={eps} variant={variant}",
            )


def test_sinkhorn_tiling_mosaic_legal():
    # Mosaic requires block dims divisible by (8, 128) (or full-array);
    # interpret mode does NOT check this — the real v5e rejected tb=50
    # at the production K=8000 (range(cap, 7, -8) from a non-multiple-of-8
    # cap yields no multiples of 8). Pin legality over the config space:
    # every shipped segmentor config's (patch_size, nprototypes) plus a
    # divisor-hostile sweep.
    from ganecdotes_tpu.ops.sinkhorn_pallas import sinkhorn_supported

    shapes = [(20000, 8000), (20000, 5000), (20000, 4000),
              (16384, 3000), (24000, 10000), (4096, 512), (1 << 22, 128)]
    for b, k in shapes:
        tiles = sinkhorn_supported(b, k)
        assert tiles is not None, (b, k)
        tb, tk, kp = tiles
        assert kp >= k and b % tb == 0 and kp % tk == 0
        assert tb % 8 == 0, (b, k, tiles)
        # lane legality: 128-multiple OR equal-to-array-dim (the unpadded
        # whole-row escape hatch Mosaic grants)
        assert tk % 128 == 0 or (tk == kp == k), (b, k, tiles)
        kphys = -(-tk // 128) * 128  # what Mosaic physically allocates
        assert 2 * tb * kphys * 4 <= 9 * 2**20, (b, k, tiles)


@pytest.mark.slow
def test_sinkhorn_pallas_fuzz():
    # seeded sweep over shapes (incl. lane-unaligned K, the unpadded
    # whole-row escape), iteration counts (incl. the niters=0 edge:
    # codes = renormalized exp(scores/eps)), eps extremes, and
    # non-uniform marginals — fused vs the jnp potentials oracle
    from ganecdotes_tpu.ops.sinkhorn_pallas import (
        sinkhorn_knopp_pallas,
        sinkhorn_supported,
    )

    rs = np.random.RandomState(99)
    cases = [
        (8, 8, 0, 0.5), (16, 200, 1, 0.1), (40, 136, 5, 0.02),
        (64, 384, 3, 0.005), (96, 72, 7, 1.0), (128, 128, 2, 0.05),
    ]
    for b, k, niters, eps in cases:
        assert sinkhorn_supported(b, k) is not None, (b, k)
        scores = jnp.asarray(rs.randn(b, k).astype(np.float32))
        r = jnp.asarray(rs.rand(k).astype(np.float32) + 0.05)
        r = r / r.sum()
        c = jnp.asarray(rs.rand(b).astype(np.float32) + 0.05)
        c = c / c.sum()
        want = np.asarray(sinkhorn_knopp(scores, niters, eps, r, c))
        got = np.asarray(
            sinkhorn_knopp_pallas(scores, niters, eps, r, c)
        )
        assert np.isfinite(got).all(), (b, k, niters, eps)
        np.testing.assert_allclose(
            got, want, atol=1e-4, rtol=1e-3,
            err_msg=f"b={b} k={k} niters={niters} eps={eps}",
        )


def test_sinkhorn_pallas_vmap_parity():
    # the sample_batch path vmaps sinkhorn over samples; the kernel must
    # batch correctly (pallas prepends a grid dim — program_id use inside
    # the kernel must stay on the logical grid)
    from ganecdotes_tpu.ops.sinkhorn_pallas import sinkhorn_knopp_pallas

    rs = np.random.RandomState(12)
    scores = jnp.asarray(rs.randn(3, 64, 128).astype(np.float32))
    r = jnp.ones((128,), jnp.float32) / 128
    c = jnp.ones((64,), jnp.float32) / 64
    want = jnp.stack([sinkhorn_knopp_pallas(s, 4, 0.05, r, c)
                      for s in scores])
    got = jax.vmap(lambda s: sinkhorn_knopp_pallas(s, 4, 0.05, r, c))(scores)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want), atol=1e-5)


def test_swapped_loss_matches_torch_formula():
    torch = pytest.importorskip("torch")
    import torch.nn.functional as F

    rng = np.random.RandomState(8)
    p_s, p_t = rng.randn(20, 10).astype(np.float32), rng.randn(20, 10).astype(
        np.float32
    )
    q_s, q_t = np.abs(rng.randn(20, 10)).astype(np.float32), np.abs(
        rng.randn(20, 10)
    ).astype(np.float32)

    lst = torch.mean(
        torch.sum(torch.from_numpy(q_s) * F.log_softmax(torch.from_numpy(p_t), 1), 1)
    )
    lts = torch.mean(
        torch.sum(torch.from_numpy(q_t) * F.log_softmax(torch.from_numpy(p_s), 1), 1)
    )
    want = float(-0.5 * (lst + lts))
    got = float(
        swapped_prediction_loss(
            jnp.asarray(p_s), jnp.asarray(p_t), jnp.asarray(q_s), jnp.asarray(q_t)
        )
    )
    # fp32 log-softmax accumulation order differs between backends; the
    # magnitude of the loss here is ~20, so compare relatively.
    assert abs(got - want) < 1e-5 * max(1.0, abs(want))


def test_prototype_renorm_unit_rows():
    params = init_swav_params(jax.random.PRNGKey(9), 32, 8, 20)
    params = normalize_prototypes(params)
    norms = jnp.linalg.norm(params["prototype"]["weight"], axis=0)
    np.testing.assert_allclose(np.asarray(norms), 1.0, atol=1e-6)


def test_block_row_std_selects_pair():
    std = block_row_std(jnp.asarray(2), n_layers=6, perturb_std=[1.0] * 6,
                        n_latent=14)
    want = np.zeros(14)
    want[4] = want[5] = 1.0
    np.testing.assert_allclose(np.asarray(std), want)


def test_group_features_by_block():
    feats = [jnp.zeros((1, 4, 4, 2 + i)) for i in range(7)]
    groups = group_features_by_block(feats)
    assert len(groups) == 4
    assert groups[0].shape[-1] == 2
    assert groups[1].shape[-1] == 3 + 4
    groups_nc = group_features_by_block(feats, skip_const=True)
    assert len(groups_nc) == 3


def test_rotate_flip_identity():
    x = jax.random.normal(jax.random.PRNGKey(10), (1, 8, 8, 3))
    y = rotate_flip_nhwc(x, jnp.asarray(0.0), jnp.asarray(False))
    np.testing.assert_allclose(np.asarray(y), np.asarray(x), atol=1e-6)
    y = rotate_flip_nhwc(x, jnp.asarray(0.0), jnp.asarray(True))
    np.testing.assert_allclose(np.asarray(y), np.asarray(x[:, :, ::-1, :]), atol=1e-6)


def test_one_shot_segmentor_matches_torch():
    torch = pytest.importorskip("torch")
    import torch.nn as nn

    # rebuild the reference head structure in torch and compare (size S)
    in_ch, n_class = 16, 8
    params = init_one_shot_segmentor(jax.random.PRNGKey(11), in_ch, n_class, "S")

    dil = [1, 2, 1, 2, 1]
    chans = [in_ch, 128, 64, 64, 32, n_class]
    layers = []
    for d, ci, co in zip(dil, chans[:-1], chans[1:]):
        layers += [nn.Conv2d(ci, co, 3, padding=d, dilation=d), nn.LeakyReLU(0.2)]
    tmodel = nn.Sequential(*layers[:-1])
    with torch.no_grad():
        for i, p in enumerate(params):
            tmodel[2 * i].weight.copy_(
                torch.from_numpy(np.asarray(p["weight"]).transpose(3, 2, 0, 1))
            )
            tmodel[2 * i].bias.copy_(torch.from_numpy(np.asarray(p["bias"])))

    x = np.random.RandomState(12).randn(1, 12, 12, in_ch).astype(np.float32)
    with torch.no_grad():
        want = (
            tmodel(torch.from_numpy(x).permute(0, 3, 1, 2))
            .permute(0, 2, 3, 1)
            .numpy()
        )
    got = one_shot_segmentor_apply(params, jnp.asarray(x), "S")
    np.testing.assert_allclose(np.asarray(got), want, atol=1e-4)


def test_xxs_zip_truncation_quirk():
    params = init_one_shot_segmentor(jax.random.PRNGKey(13), 512, 8, "XXS")
    assert len(params) == 1
    out = one_shot_segmentor_apply(params, jnp.zeros((1, 6, 6, 512)), "XXS")
    assert out.shape[-1] == 12  # NOT n_class — reproduces the reference quirk
    assert segmentor_out_channels(8, "XXS") == 12
    assert segmentor_out_channels(8, "S") == 8


def test_import_torch_swav_modules(tmp_path):
    """SwAV artifact importer parity: build the torch modules exactly as
    the reference does (swav_clustering.py:244-271), torch.save them the
    reference's way (:503-505), import, and check prediction math."""
    import os

    torch = pytest.importorskip("torch")
    from ganecdotes_tpu.selfsup.swav import (
        import_torch_swav_modules,
        projection_tail,
    )

    hlen, ncls, nproto = 24, 8, 16
    torch.manual_seed(0)

    for projn_nw in ("linear", "2-layer"):
        if projn_nw == "linear":
            projection = torch.nn.Sequential(
                torch.nn.Linear(hlen, ncls, bias=False)
            )
        else:
            projection = torch.nn.Sequential(
                torch.nn.Linear(hlen, ncls, bias=False),
                torch.nn.BatchNorm1d(ncls),
                torch.nn.LeakyReLU(inplace=True),
                torch.nn.Linear(ncls, ncls, bias=False),
                torch.nn.BatchNorm1d(ncls),
                torch.nn.Tanh(),
            )
        prototype = torch.nn.Linear(ncls, nproto)
        projection.eval()
        prototype.eval()

        pf = os.path.join(str(tmp_path), "prototypes.pt")
        jf = os.path.join(str(tmp_path), "projection.pt")
        torch.save(prototype, pf)
        torch.save(projection, jf)

        params = import_torch_swav_modules(pf, jf, projn_nw)

        x = np.random.RandomState(1).randn(5, hlen).astype(np.float32)
        with torch.no_grad():
            z_t = projection(torch.from_numpy(x)).numpy()
            s_t = prototype(torch.from_numpy(z_t)).numpy()

        z_j = jnp.asarray(x) @ params["projection"][0]["weight"]
        z_j = projection_tail(params, z_j, projn_nw, train=False)
        s_j = (
            z_j @ params["prototype"]["weight"] + params["prototype"]["bias"]
        )
        np.testing.assert_allclose(np.asarray(z_j), z_t, atol=1e-5)
        np.testing.assert_allclose(np.asarray(s_j), s_t, atol=1e-5)


def test_project_segment_single_conv_matches_unfused():
    """The fused XXS head (projection folded into per-level convs + one
    lhs-dilated conv for the coarse accumulation) must match
    conv3x3(project_feature_maps(...)) exactly up to fp tolerance."""
    import jax

    from ganecdotes_tpu.selfsup.embed import (
        project_feature_maps,
        project_segment_single_conv,
    )
    from ganecdotes_tpu.selfsup.heads import (
        init_one_shot_segmentor,
        one_shot_segmentor_apply,
    )

    rng = np.random.RandomState(0)
    # StyleGAN-shaped pyramid: pairs per resolution, 32² finest
    shapes = [(1, 4, 4, 24), (1, 8, 8, 24), (1, 8, 8, 24),
              (1, 16, 16, 12), (1, 16, 16, 12),
              (1, 32, 32, 6), (1, 32, 32, 6)]
    feats = [jnp.asarray(rng.randn(*s).astype(np.float32)) for s in shapes]
    total = sum(s[-1] for s in shapes)

    for hlen in (total, total - 9):  # exact and mid-level-truncated
        nclasses = 16
        weight = jnp.asarray(rng.randn(hlen, nclasses).astype(np.float32))
        seg = init_one_shot_segmentor(jax.random.PRNGKey(1), nclasses, 5,
                                      "XXS")

        z = project_feature_maps(feats, weight, hlen=hlen)
        want = one_shot_segmentor_apply(seg, z, "XXS")
        got = project_segment_single_conv(
            feats, weight, seg[0]["weight"], seg[0]["bias"], hlen=hlen
        )
        np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                                   atol=2e-4, rtol=1e-4)


def test_swav_clustering_loads_reference_artifacts(tmp_path):
    """evaluate-mode SwAVClustering picks up reference prototypes.pt/
    projection.pt automatically (swav_clustering.py:79-89 semantics)."""
    import os

    import jax

    torch = pytest.importorskip("torch")
    from ganecdotes_tpu.models.stylegan2.generator import Generator
    from ganecdotes_tpu.selfsup.swav import SwAVClustering

    hlen, ncls, nproto = 3584, 8, 16
    torch.manual_seed(0)
    torch.save(torch.nn.Linear(ncls, nproto),
               os.path.join(str(tmp_path), "prototypes.pt"))
    torch.save(torch.nn.Sequential(torch.nn.Linear(hlen, ncls, bias=False)),
               os.path.join(str(tmp_path), "projection.pt"))

    class _MC:
        truncation = 0.7
        latent_dim = 512
        image_size = 32
        num_latents_for_mean = 8

    swav = SwAVClustering(
        model=Generator(size=32, key=jax.random.PRNGKey(0)),
        model_config=_MC(),
        perturb_args=dict(truncation=0.7, n_layers=2, n_samples=1,
                          layer_no=None, perturb_std=[1.0, 1.0]),
        swav_args=dict(projn_nw="linear", nclasses=ncls, nprototypes=nproto,
                       hlen=hlen, hf_interp="nearest"),
        sinkhorn_args=dict(source_pdf="uniform", niters=2, eps=0.05),
        out_dir=str(tmp_path), train=False,
    )
    assert swav.ssl_params is not None
    assert swav.ssl_params["projection"][0]["weight"].shape == (hlen, ncls)
    # and predictions run end-to-end off the imported params
    preds, labels = swav.predict_swav_codes(
        jax.random.normal(jax.random.PRNGKey(1), (1, 512)),
        input_is_latent=False,
    )
    assert preds.shape == (1, 32, 32, ncls)
    assert labels.shape == (1, 32, 32)


def test_import_sklearn_sav_clusterers(tmp_path):
    """Reference-format clusterer_layer_{n}.sav pickles load with exact
    prediction parity (hfc_kmeans_clustering.py:42-63,121-123 layout)."""
    import os
    import pickle

    import jax

    sklearn_cluster = pytest.importorskip("sklearn.cluster")
    from ganecdotes_tpu.selfsup.kmeans import BaseHFCModel, kmeans_predict

    rng = np.random.RandomState(0)
    ks = [3, 5]
    feats, skls = [], []
    for n, k in enumerate(ks):
        x = rng.randn(200, 8).astype(np.float32)
        m = sklearn_cluster.KMeans(n_clusters=k, n_init=3, random_state=0).fit(x)
        with open(os.path.join(str(tmp_path), f"clusterer_layer_{n}.sav"),
                  "wb") as f:
            pickle.dump(m, f)
        feats.append(x)
        skls.append(m)

    model = BaseHFCModel(out_dir=str(tmp_path), n_layers=2,
                         clusters_per_layer=ks, out_size=16, presaved=True)
    for n, (x, m) in enumerate(zip(feats, skls)):
        got = np.asarray(kmeans_predict(jnp.asarray(x), model.centers[n]))
        np.testing.assert_array_equal(got, m.predict(x))


def test_load_belief_file_both_formats(tmp_path):
    """beliefs.npz loads from the repo layout (one entry per matrix) AND the
    reference's single-object-array layout (segmentor.py:163)."""
    import os

    from ganecdotes_tpu.selfsup.kmeans import load_belief_file

    rng = np.random.RandomState(1)
    mats = [rng.rand(3, 4).astype(np.float32),
            rng.rand(4, 6).astype(np.float32)]

    repo_fp = os.path.join(str(tmp_path), "beliefs_repo.npz")
    np.savez_compressed(repo_fp, *mats)
    ref_fp = os.path.join(str(tmp_path), "beliefs_ref.npz")
    np.savez_compressed(ref_fp, np.asarray(mats, dtype=object))

    for fp in (repo_fp, ref_fp):
        out = load_belief_file(fp)
        assert len(out) == 2
        for got, want in zip(out, mats):
            np.testing.assert_allclose(np.asarray(got), want, rtol=1e-6)


def test_hfc_fit_ragged_layer_dims(tmp_path):
    """fit() persists model_stats.npz when layers have different channel
    widths (the real ffhq config; np.asarray on ragged lists raises in
    modern numpy — caught live by the pretrain CLI)."""
    import os

    from ganecdotes_tpu.selfsup.kmeans import BaseHFCModel

    rng = np.random.RandomState(0)
    model = BaseHFCModel(out_dir=str(tmp_path), n_layers=2,
                         clusters_per_layer=[2, 3], out_size=8)
    feats = [jnp.asarray(rng.rand(1, 4, 4, 6).astype(np.float32)),
             jnp.asarray(rng.rand(1, 8, 8, 10).astype(np.float32))]
    model.fit(feats)

    stats = np.load(os.path.join(str(tmp_path), "model_stats.npz"),
                    allow_pickle=True)
    assert stats["means"][0].shape == (6,)
    assert stats["means"][1].shape == (10,)
    preds, labels = model.predict(feats)
    assert preds.shape == (1, 8, 8, 5)


@pytest.mark.slow
def test_swav_pretrain_checkpoint_resume(tmp_path):
    """Mid-run preemption resumes from the last snapshot, NOT from scratch.

    Non-vacuity: the resumed instance is constructed with a DIFFERENT seed —
    its weights can only match the uninterrupted run's if the snapshot's
    params/opt-state/RNG key were actually restored (a silent
    retrain-from-scratch would follow the new seed's stream and diverge).
    Also checks: a completed run deletes its snapshot, and a snapshot from a
    different config is ignored rather than resumed."""
    import os

    import jax

    from ganecdotes_tpu.models.stylegan2.generator import Generator
    from ganecdotes_tpu.selfsup.swav import (
        SwAVClustering,
        _SimulatedPreemption,
    )

    class _MC:
        truncation = 0.7
        latent_dim = 512
        image_size = 16
        num_latents_for_mean = 4

    def make(out, seed=7, nprototypes=8):
        return SwAVClustering(
            model=Generator(size=16, key=jax.random.PRNGKey(0)),
            model_config=_MC(),
            perturb_args=dict(truncation=0.7, n_layers=2, n_samples=1,
                              layer_no=None, perturb_std=[1.0, 1.0]),
            swav_args=dict(num_epochs=3, num_samples=1, num_patches=1,
                           patch_size=16, hf_interp='nearest',
                           warmup_epochs=1, start_warmup=0.01,
                           use_scheduler=False, base_lr=0.01,
                           final_lr=0.0001, trust_coeff=0.01,
                           train_args=dict(lr=0.01, momentum=0.9),
                           projn_nw='linear', temperature=0.1,
                           nprototypes=nprototypes, nclasses=8, hlen=1024,
                           add_local_loss=False, checkpoint_every=1,
                           epoch_print_freq=10),
            sinkhorn_args=dict(source_pdf='uniform', niters=2, eps=0.05),
            out_dir=out, seed=seed,
        )

    # uninterrupted reference run: snapshot removed on successful completion
    out_a = str(tmp_path / "a")
    swav = make(out_a)
    swav.pretrain()
    full = np.asarray(swav.ssl_params["prototype"]["weight"])
    assert not os.path.exists(
        os.path.join(out_a, "swav_pretrain_state.npz")
    )

    # preempted run: abort after epoch 2 via the fault-injection hook
    out_b = str(tmp_path / "b")
    swav_b = make(out_b)
    swav_b._abort_after_epoch = 2
    with pytest.raises(_SimulatedPreemption):
        swav_b.pretrain()
    assert os.path.exists(os.path.join(out_b, "swav_pretrain_state.npz"))

    # resume with a DIFFERENT construction seed: only true state restoration
    # can reproduce the uninterrupted run's weights (a silent restart would
    # train from the seed-99 init and key stream). mean_latent is seed-
    # derived at construction and is not part of the snapshot, so pin it.
    swav_b2 = make(out_b, seed=99)
    swav_b2.mean_latent = swav_b.mean_latent
    swav_b2.pretrain()
    np.testing.assert_allclose(
        np.asarray(swav_b2.ssl_params["prototype"]["weight"]), full,
        rtol=1e-6,
    )

    # a snapshot from a different config must be ignored, not resumed
    out_c = str(tmp_path / "c")
    swav_c = make(out_c)
    swav_c._abort_after_epoch = 2
    with pytest.raises(_SimulatedPreemption):
        swav_c.pretrain()
    swav_c2 = make(out_c, nprototypes=16)  # config changed
    swav_c2.pretrain()  # starts fresh; would crash if it tried to resume
    assert swav_c2.ssl_params["prototype"]["weight"].shape[1] == 16


def test_project_segment_fcn_matches_unfused():
    """First-conv folding generalizes to multi-conv heads: the fused XS/S
    paths must match one_shot_segmentor_apply(project_feature_maps(...))."""
    import jax

    from ganecdotes_tpu.selfsup.embed import (
        project_feature_maps,
        project_segment_fcn,
    )
    from ganecdotes_tpu.selfsup.heads import (
        init_one_shot_segmentor,
        one_shot_segmentor_apply,
    )

    rng = np.random.RandomState(3)
    shapes = [(1, 4, 4, 24), (1, 8, 8, 24), (1, 8, 8, 24),
              (1, 16, 16, 12), (1, 16, 16, 12),
              (1, 32, 32, 6), (1, 32, 32, 6)]
    feats = [jnp.asarray(rng.randn(*s).astype(np.float32)) for s in shapes]
    total = sum(s[-1] for s in shapes)

    for size in ("XS", "S"):
        for hlen in (total, total - 9):
            nclasses = 16
            weight = jnp.asarray(
                rng.randn(hlen, nclasses).astype(np.float32)
            )
            seg = init_one_shot_segmentor(
                jax.random.PRNGKey(2), nclasses, 5, size
            )
            z = project_feature_maps(feats, weight, hlen=hlen)
            want = one_shot_segmentor_apply(seg, z, size)
            got = project_segment_fcn(feats, weight, seg, size, hlen=hlen)
            np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                                       atol=3e-4, rtol=1e-4)

def test_concat_segment_fcn_matches_unfused():
    """RepurposeGAN serving fusion: the channel-slice-decomposed first
    conv must match one_shot_segmentor_apply(pixel_feature_maps(...))
    for both n_layers and mid-level hlen truncation."""
    import jax

    from ganecdotes_tpu.selfsup.embed import (
        concat_segment_fcn,
        pixel_feature_maps,
    )
    from ganecdotes_tpu.selfsup.heads import (
        init_one_shot_segmentor,
        one_shot_segmentor_apply,
    )

    rng = np.random.RandomState(7)
    shapes = [(2, 4, 4, 24), (2, 8, 8, 24), (2, 8, 8, 24),
              (2, 16, 16, 12), (2, 16, 16, 12),
              (2, 32, 32, 6), (2, 32, 32, 6)]
    feats = [jnp.asarray(rng.randn(*s).astype(np.float32)) for s in shapes]
    total = sum(s[-1] for s in shapes)

    for size in ("XS", "S"):
        for kwargs in ({"n_layers": len(feats)}, {"n_layers": 5},
                       {"hlen": total - 9}):
            n_l = kwargs.get("n_layers")
            hlen = kwargs.get("hlen")
            in_ch = (sum(s[-1] for s in shapes[:n_l]) if n_l is not None
                     else hlen)
            seg = init_one_shot_segmentor(jax.random.PRNGKey(4), in_ch, 5,
                                          size)
            z = pixel_feature_maps(feats, hlen=hlen, n_layers=n_l)
            want = one_shot_segmentor_apply(seg, z, size)
            got = concat_segment_fcn(feats, seg, size, **kwargs)
            np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                                       atol=3e-4, rtol=1e-4)


def test_pixel_classifier_from_first_matches_apply():
    """DatasetGAN serving fusion: first Linear folded through
    project_feature_maps + the from-first tail must equal the eval-mode
    pixel_classifier_apply on the explicit concat."""
    import jax

    from ganecdotes_tpu.selfsup.embed import (
        pixel_feature_maps,
        project_feature_maps,
    )
    from ganecdotes_tpu.selfsup.heads import (
        init_pixel_classifier,
        pixel_classifier_apply,
        pixel_classifier_from_first,
    )

    rng = np.random.RandomState(8)
    shapes = [(2, 4, 4, 24), (2, 8, 8, 24), (2, 16, 16, 12),
              (2, 32, 32, 6)]
    feats = [jnp.asarray(rng.randn(*s).astype(np.float32)) for s in shapes]
    in_ch = sum(s[-1] for s in shapes)
    params, state = init_pixel_classifier(jax.random.PRNGKey(5), in_ch, 5)
    # non-trivial BN stats (fresh init is mean 0 / var 1, which would let a
    # stats-ordering bug pass)
    state = [
        {"mean": s["mean"] + 0.3, "var": s["var"] * 1.7,
         "gamma": s["gamma"] * 0.9, "beta": s["beta"] + 0.1}
        for s in state
    ]

    x = pixel_feature_maps(feats)
    want, _ = pixel_classifier_apply(params, state, x, train=False)

    v1 = project_feature_maps(feats, params[0]["weight"])
    v1 = v1 + params[0]["bias"].astype(v1.dtype)
    got = pixel_classifier_from_first(params, state, v1)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                               atol=2e-4, rtol=1e-4)


def test_swav_patch_sampling_method():
    """'patch' picks one contiguous square block at the same offset on both
    axes with patch_size**2 pixels (ref swav_clustering.py:150-159,383-386),
    and a short patch-mode pretrain actually trains."""
    import jax

    from ganecdotes_tpu.selfsup.swav import make_pick_fn

    h = w = 16
    draw = make_pick_fn("patch", h, w, 4)
    picks = np.asarray(draw(jax.random.PRNGKey(0)))
    assert picks.shape == (16,)
    ys, xs = picks // w, picks % w
    # contiguous 4x4 window at (p, p)
    p = ys.min()
    assert ys.max() - p == 3 and xs.min() == p and xs.max() - p == 3
    assert len(np.unique(picks)) == 16
    # offset within the reference's EXCLUSIVE bound: p in [0, h - ps)
    offs = {
        int(np.asarray(draw(jax.random.PRNGKey(s))).min() // w)
        for s in range(40)
    }
    assert max(offs) < h - 4 and min(offs) >= 0 and len(offs) > 3

    # patch_size >= h degrades to the whole image (ref :379-381)
    full = np.asarray(make_pick_fn("patch", h, w, 16)(jax.random.PRNGKey(1)))
    np.testing.assert_array_equal(full, np.arange(h * w))

    # 'random' still draws patch_size distinct pixels
    rnd = np.asarray(make_pick_fn("random", h, w, 7)(jax.random.PRNGKey(2)))
    assert rnd.shape == (7,) and len(np.unique(rnd)) == 7


def test_swav_patch_mode_step_trains(tmp_path):
    """A patch-mode step runs jitted and moves the prototypes."""
    import jax

    from ganecdotes_tpu.models.stylegan2.generator import Generator
    from ganecdotes_tpu.selfsup.swav import SwAVClustering

    class _MC:
        truncation = 0.7
        latent_dim = 512
        image_size = 16
        num_latents_for_mean = 4

    swav = SwAVClustering(
        model=Generator(size=16, key=jax.random.PRNGKey(0)),
        model_config=_MC(),
        perturb_args=dict(truncation=0.7, n_layers=2, n_samples=1,
                          layer_no=None, perturb_std=[1.0, 1.0]),
        swav_args=dict(num_epochs=2, num_samples=1, num_patches=1,
                       patch_size=6, sampling_method='patch',
                       hf_interp='nearest', warmup_epochs=1,
                       start_warmup=0.01, use_scheduler=False, base_lr=0.01,
                       final_lr=0.0001, trust_coeff=0.01,
                       train_args=dict(lr=0.01, momentum=0.9),
                       projn_nw='linear', temperature=0.1, nprototypes=8,
                       nclasses=8, hlen=1024, add_local_loss=False,
                       epoch_print_freq=10),
        sinkhorn_args=dict(source_pdf='uniform', niters=2, eps=0.05),
        out_dir=str(tmp_path), seed=3,
    )
    swav.pretrain()
    w1 = np.asarray(swav.ssl_params["prototype"]["weight"])
    assert np.isfinite(w1).all()
    # trained prototypes are row-normalized + updated, not the raw init
    assert w1.shape == (8, 8)


def test_swav_pretrain_loss_decreases(tmp_path):
    """The SSL objective must actually optimize: over a short run the
    epoch-loss trend is downward (non-vacuous learning check)."""
    import jax

    from ganecdotes_tpu.models.stylegan2.generator import Generator
    from ganecdotes_tpu.selfsup.swav import SwAVClustering

    class _MC:
        truncation = 0.7
        latent_dim = 512
        image_size = 16
        num_latents_for_mean = 4

    swav = SwAVClustering(
        model=Generator(size=16, key=jax.random.PRNGKey(0)),
        model_config=_MC(),
        perturb_args=dict(truncation=0.7, n_layers=2, n_samples=1,
                          layer_no=0, perturb_std=[1.0, 1.0]),
        swav_args=dict(num_epochs=24, num_samples=1, num_patches=1,
                       patch_size=128, hf_interp='nearest', warmup_epochs=1,
                       start_warmup=0.01, use_scheduler=False, base_lr=0.01,
                       final_lr=0.0001, trust_coeff=0.01,
                       train_args=dict(lr=0.03, momentum=0.9),
                       projn_nw='linear', temperature=0.1, nprototypes=8,
                       nclasses=8, hlen=1024, add_local_loss=False,
                       epoch_print_freq=100),
        sinkhorn_args=dict(source_pdf='uniform', niters=3, eps=0.05),
        out_dir=str(tmp_path), seed=3,
    )
    swav.record_loss_history = True
    swav.pretrain()
    hist = np.asarray(swav.loss_history)
    assert hist.shape[0] == 24 and np.isfinite(hist).all()
    # per-epoch loss is bimodal in the random rotate/flip draw, so compare
    # block means (both modes shrink as training progresses)
    assert hist[-8:].mean() < hist[:8].mean(), f"no downward trend: {hist}"


def test_simclr_pretrain_loss_decreases(tmp_path):
    import jax

    from ganecdotes_tpu.models.stylegan2.generator import Generator
    from ganecdotes_tpu.selfsup.simclr import SimCLRClustering

    class _MC:
        truncation = 0.7
        latent_dim = 512
        image_size = 16
        num_latents_for_mean = 4

    sim = SimCLRClustering(
        model=Generator(size=16, key=jax.random.PRNGKey(0)),
        model_config=_MC(),
        perturb_args=dict(truncation=0.7, n_layers=2, n_samples=1,
                          layer_no=None, perturb_std=[1.0, 1.0]),
        simclr_args=dict(num_iters=10, batch_size=8, patch_size=32,
                         hf_interp='nearest', trust_coeff=0.01,
                         train_args=dict(lr=0.1, momentum=0.9),
                         temperature=1.0, nclasses=8, hlen=1024,
                         epoch_print_freq=100),
        out_dir=str(tmp_path), seed=3,
    )
    sim.record_loss_history = True
    sim.pretrain()
    hist = np.asarray(sim.loss_history)
    assert hist.shape[0] == 10 and np.isfinite(hist).all()
    assert hist[-1] < hist[0], f"no improvement: {hist}"
    assert hist[-3:].mean() < hist[:3].mean(), f"no downward trend: {hist}"


def test_simclr_fused_segment_matches_vmapped_form():
    """simclr_predict_segment (per-image-axis BN + lin2 folded into the
    head's first conv) is exact vs the per-image vmapped reference form."""
    import jax

    from ganecdotes_tpu.selfsup.heads import (
        init_one_shot_segmentor,
        one_shot_segmentor_apply,
    )
    from ganecdotes_tpu.selfsup.simclr import (
        init_simclr_params,
        simclr_predict_from_features,
        simclr_predict_segment,
    )

    hlen, ncls = 96, 16
    ssl = init_simclr_params(jax.random.PRNGKey(0), hlen, ncls)
    seg = init_one_shot_segmentor(jax.random.PRNGKey(1), ncls, 5, "XS")
    k = jax.random.PRNGKey(2)
    feats = [
        jax.random.normal(jax.random.fold_in(k, i), (3, r, r, c))
        for i, (r, c) in enumerate([(4, 32), (8, 32), (8, 32)])
    ]

    logits = simclr_predict_segment(ssl, feats, seg, "XS", hlen)

    def one(fs):
        return simclr_predict_from_features(ssl, [f[None] for f in fs], hlen)[0]

    z = jax.vmap(one)(feats)
    want = one_shot_segmentor_apply(seg, z, "XS")
    np.testing.assert_allclose(
        np.asarray(logits), np.asarray(want), atol=2e-4
    )


def test_fold_linear_into_head_exact():
    import jax
    import jax.numpy as jnp

    from ganecdotes_tpu.selfsup.heads import (
        init_one_shot_segmentor,
        one_shot_segmentor_apply,
    )
    from ganecdotes_tpu.selfsup.simclr import fold_linear_into_head

    for size in ("XS", "Lin"):
        seg = init_one_shot_segmentor(jax.random.PRNGKey(3), 24, 6, size)
        L = jax.random.normal(jax.random.PRNGKey(4), (24, 24)) * 0.3
        x = jax.random.normal(jax.random.PRNGKey(5), (2, 9, 9, 24))
        want = one_shot_segmentor_apply(seg, x @ L, size)
        got = one_shot_segmentor_apply(
            fold_linear_into_head(seg, L), x, size
        )
        np.testing.assert_allclose(
            np.asarray(got), np.asarray(want), atol=1e-4
        )


def test_region_beliefs_device_matches_host_loop():
    """region_beliefs_device (one-hot matmuls, jittable) == _region_beliefs
    (the host unique/loop version) exactly, including the skipped label-0
    column and absent-label columns."""
    import jax

    from ganecdotes_tpu.selfsup.kmeans import (
        _region_beliefs,
        region_beliefs_device,
    )

    rng = np.random.RandomState(3)
    for kp, kc in [(4, 7), (8, 3), (5, 5)]:
        curr = rng.randint(0, kc, size=(2, 16, 16)).astype(np.uint8)
        prev = rng.randint(0, kp, size=(2, 16, 16)).astype(np.uint8)
        # force an absent label so its column stays zero
        curr[curr == kc - 1] = 1
        host = _region_beliefs(curr, prev, (kp, kc))
        dev = jax.jit(
            lambda c, p: region_beliefs_device(c, p, (kp, kc))
        )(curr.astype(np.int32), prev.astype(np.int32))
        np.testing.assert_allclose(np.asarray(dev), host, atol=1e-6)
        assert np.asarray(dev)[:, 0].sum() == 0


def test_hfc_predict_beliefs_none_jits_and_matches_trained_estimate():
    """hier_encode with beliefs=None estimates the belief matrices from the
    batch IN-GRAPH — the whole predict composes under jit (the pipeline's
    train-mode fallback no longer drops to host orchestration), and feeding
    the estimated matrices back as trained beliefs reproduces the output."""
    import jax
    import jax.numpy as jnp

    from ganecdotes_tpu.ops.interp import resize_nearest
    from ganecdotes_tpu.selfsup.kmeans import (
        hfc_predict_from_features,
        kmeans_predict,
        region_beliefs_device,
    )

    rng = np.random.RandomState(0)
    cpl = [3, 5]
    groups = [
        jnp.asarray(rng.randn(2, 8, 8, 6).astype(np.float32)),
        jnp.asarray(rng.randn(2, 16, 16, 4).astype(np.float32)),
    ]
    centers = [
        jnp.asarray(rng.randn(cpl[0], 6).astype(np.float32)),
        jnp.asarray(rng.randn(cpl[1], 4).astype(np.float32)),
    ]

    feats_auto, labels_auto = jax.jit(
        lambda g, c: hfc_predict_from_features(g, c, cpl, 16, True, None)
    )(groups, centers)

    # manual: estimate beliefs exactly as the in-graph path does, then run
    # the trained-beliefs path with them
    lab0 = kmeans_predict(groups[0].reshape(-1, 6), centers[0]).reshape(2, 8, 8)
    lab1 = kmeans_predict(groups[1].reshape(-1, 4), centers[1]).reshape(2, 16, 16)
    curr = resize_nearest(
        lab0[:, :, :, None].astype(jnp.float32), (16, 16)
    )[..., 0]
    beliefs = [region_beliefs_device(curr, lab1, (cpl[1], cpl[0]))]
    feats_tr, labels_tr = hfc_predict_from_features(
        groups, centers, cpl, 16, True, beliefs
    )
    np.testing.assert_allclose(np.asarray(feats_auto), np.asarray(feats_tr),
                               atol=1e-6)
    for a, b in zip(labels_auto, labels_tr):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))


def test_resize_labels_broadcast_matches_gather():
    """Integer-factor label upscale (the broadcast fast path) must agree
    with the general gather path — and non-integer factors still work."""
    import jax.numpy as jnp

    from ganecdotes_tpu.selfsup.kmeans import _nearest_indices, _resize_labels

    rng = np.random.RandomState(3)
    for h, w, out in [(4, 4, 256), (8, 8, 16), (64, 64, 256), (5, 5, 16),
                      (16, 16, 16)]:
        labels = jnp.asarray(rng.randint(0, 7, size=(2, h, w)))
        got = np.asarray(_resize_labels(labels, out))
        ri = np.asarray(_nearest_indices(h, out))
        ci = np.asarray(_nearest_indices(w, out))
        exp = np.asarray(labels)[:, ri][:, :, ci]
        np.testing.assert_array_equal(got, exp)
        assert got.dtype == np.asarray(labels).dtype


def test_hfc_segment_fcn_matches_unfused_flat_path():
    """Fused flat-HFC serving (native-res one-hot maps through the
    polyphase first conv) equals the unfused predict→head composition —
    logits and per-layer labels — at a 512-model-like mixed pyramid too."""
    import jax
    import jax.numpy as jnp

    from ganecdotes_tpu.selfsup.heads import (
        init_one_shot_segmentor,
        one_shot_segmentor_apply,
    )
    from ganecdotes_tpu.selfsup.kmeans import (
        hfc_predict_from_features,
        hfc_segment_fcn,
    )

    rng = np.random.RandomState(0)
    for out_size, size in [(32, "S"), (64, "XS")]:
        cpl = [3, 5, 7]
        groups = [
            jnp.asarray(rng.randn(2, 4, 4, 6).astype(np.float32)),
            jnp.asarray(rng.randn(2, 8, 8, 5).astype(np.float32)),
            jnp.asarray(rng.randn(2, 16, 16, 4).astype(np.float32)),
        ]
        centers = [
            jnp.asarray(rng.randn(k, g.shape[-1]).astype(np.float32))
            for k, g in zip(cpl, groups)
        ]
        seg = init_one_shot_segmentor(
            jax.random.PRNGKey(1), sum(cpl), 4, size
        )

        z, labels_ref = hfc_predict_from_features(
            groups, centers, cpl, out_size, hier_encode=False
        )
        exp = one_shot_segmentor_apply(seg, z, size)

        got, labels = jax.jit(
            lambda g, c, s: hfc_segment_fcn(g, c, cpl, out_size, s, size)
        )(groups, centers, seg)
        np.testing.assert_allclose(
            np.asarray(got), np.asarray(exp), rtol=2e-4, atol=2e-4
        )
        for a, b in zip(labels, labels_ref):
            np.testing.assert_array_equal(np.asarray(a), np.asarray(b))


def test_kmeans_predict_parts_matches_concat():
    """Channel-split assignment (kmeans_predict_parts) gives the same labels
    as kmeans_predict over the concatenated features — incl. through
    group_features_by_block(concat=False) tuples in hfc_segment_fcn and
    hfc_predict_from_features, so the serving paths that skip the group
    concats are label- and logit-identical."""
    import jax
    import jax.numpy as jnp

    from ganecdotes_tpu.selfsup.heads import init_one_shot_segmentor
    from ganecdotes_tpu.selfsup.kmeans import (
        hfc_predict_from_features,
        hfc_segment_fcn,
        kmeans_predict,
        kmeans_predict_parts,
    )

    rng = np.random.RandomState(7)
    x1 = jnp.asarray(rng.randn(300, 6).astype(np.float32))
    x2 = jnp.asarray(rng.randn(300, 5).astype(np.float32))
    c = jnp.asarray(rng.randn(4, 11).astype(np.float32))
    got = np.asarray(jax.jit(kmeans_predict_parts)([x1, x2], c))
    exp = np.asarray(kmeans_predict(jnp.concatenate([x1, x2], axis=-1), c))
    np.testing.assert_array_equal(got, exp)

    # parts-tuples through the fused and unfused hfc paths
    cpl = [3, 5]
    parts = [
        (jnp.asarray(rng.randn(2, 4, 4, 4).astype(np.float32)),
         jnp.asarray(rng.randn(2, 4, 4, 2).astype(np.float32))),
        (jnp.asarray(rng.randn(2, 8, 8, 3).astype(np.float32)),
         jnp.asarray(rng.randn(2, 8, 8, 2).astype(np.float32))),
    ]
    groups = [jnp.concatenate(p, axis=-1) for p in parts]
    centers = [
        jnp.asarray(rng.randn(k, g.shape[-1]).astype(np.float32))
        for k, g in zip(cpl, groups)
    ]
    seg = init_one_shot_segmentor(jax.random.PRNGKey(2), sum(cpl), 4, "XS")

    got_l, got_lab = jax.jit(
        lambda g, c_, s: hfc_segment_fcn(g, c_, cpl, 16, s, "XS")
    )(parts, centers, seg)
    exp_l, exp_lab = hfc_segment_fcn(groups, centers, cpl, 16, seg, "XS")
    np.testing.assert_allclose(np.asarray(got_l), np.asarray(exp_l),
                               rtol=1e-5, atol=1e-5)
    for a, b in zip(got_lab, exp_lab):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))

    got_z, got_lab = jax.jit(
        lambda g, c_: hfc_predict_from_features(g, c_, cpl, 16, True, None)
    )(parts, centers)
    exp_z, exp_lab = hfc_predict_from_features(groups, centers, cpl, 16,
                                               True, None)
    np.testing.assert_allclose(np.asarray(got_z), np.asarray(exp_z),
                               rtol=1e-5, atol=1e-5)
    for a, b in zip(got_lab, exp_lab):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))


def test_pixel_classifier_from_first_bf16_serving_dtype():
    """The serving path feeds bf16 v1 (bench.py datasetgan); the folded
    from-first tail runs entirely in v.dtype now, so pin the bf16 path:
    logits stay bf16 end-to-end and argmax labels agree with the f32
    eval-mode oracle on ≥99% of pixels (residual = bf16 rounding flipping
    genuine near-ties)."""
    import jax

    from ganecdotes_tpu.selfsup.embed import (
        pixel_feature_maps,
        project_feature_maps,
    )
    from ganecdotes_tpu.selfsup.heads import (
        init_pixel_classifier,
        pixel_classifier_apply,
        pixel_classifier_from_first,
    )

    rng = np.random.RandomState(11)
    shapes = [(2, 4, 4, 24), (2, 8, 8, 24), (2, 16, 16, 12)]
    feats32 = [jnp.asarray(rng.randn(*s).astype(np.float32)) for s in shapes]
    in_ch = sum(s[-1] for s in shapes)
    params, state = init_pixel_classifier(jax.random.PRNGKey(6), in_ch, 5)
    state = [
        {"mean": s["mean"] + 0.2, "var": s["var"] * 1.3,
         "gamma": s["gamma"] * 1.1, "beta": s["beta"] - 0.05}
        for s in state
    ]

    x = pixel_feature_maps(feats32)
    want, _ = pixel_classifier_apply(params, state, x, train=False)

    feats16 = [f.astype(jnp.bfloat16) for f in feats32]
    v1 = project_feature_maps(feats16, params[0]["weight"])
    v1 = v1 + params[0]["bias"].astype(v1.dtype)
    got = pixel_classifier_from_first(params, state, v1)
    assert got.dtype == jnp.bfloat16
    agree = (np.asarray(got, np.float32).argmax(-1)
             == np.asarray(want).argmax(-1)).mean()
    assert agree >= 0.99, agree


def test_hfc_segment_fcn_wide_path_matches_unfused():
    """sum(cpl) > 2*C_out forces the POLYPHASE fallback (per-level one-hot
    maps through concat_segment_fcn) — the branch every wide config serves
    through; pin it against the unfused predict→head composition (the
    narrow multi-hot branch is covered by the other two parity tests)."""
    import jax

    from ganecdotes_tpu.selfsup.embed import narrow_first_conv
    from ganecdotes_tpu.selfsup.heads import (
        init_one_shot_segmentor,
        one_shot_segmentor_apply,
    )
    from ganecdotes_tpu.selfsup.kmeans import (
        hfc_predict_from_features,
        hfc_segment_fcn,
    )

    rng = np.random.RandomState(4)
    cpl = [9, 9, 9]  # total 27 > 2*12 (XXS head) -> wide fallback
    groups = [
        jnp.asarray(rng.randn(2, 4, 4, 6).astype(np.float32)),
        jnp.asarray(rng.randn(2, 8, 8, 5).astype(np.float32)),
        jnp.asarray(rng.randn(2, 16, 16, 4).astype(np.float32)),
    ]
    centers = [
        jnp.asarray(rng.randn(k, g.shape[-1]).astype(np.float32))
        for k, g in zip(cpl, groups)
    ]
    seg = init_one_shot_segmentor(jax.random.PRNGKey(3), sum(cpl), 4, "XXS")
    assert not narrow_first_conv(sum(cpl), seg[0]["weight"].shape[-1])

    z, labels_ref = hfc_predict_from_features(
        groups, centers, cpl, 32, hier_encode=False
    )
    exp = one_shot_segmentor_apply(seg, z, "XXS")

    got, labels = jax.jit(
        lambda g, c, s: hfc_segment_fcn(g, c, cpl, 32, s, "XXS")
    )(groups, centers, seg)
    np.testing.assert_allclose(
        np.asarray(got), np.asarray(exp), rtol=2e-4, atol=2e-4
    )
    for a, b in zip(labels, labels_ref):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))
