"""End-to-end pipeline tests on a tiny (32²) generator, all five methods.

Exercises the full setup→train→test flow the way evaluate.py/pretrain.py do,
with synthesized pseudo-labelled samples (no checkpoints ship). CPU-runnable:
this is BASELINE.json config #1's "CPU-runnable" requirement generalized.
"""

import os
import textwrap

import numpy as np
import pytest

TINY_MODEL = """
model_path = None
num_latents_for_mean = 64
truncation = 0.7
image_size = 32
latent_dim = 512
gen_args = dict(size=32, style_dim=512, n_mlp=2)
is_baggan = False
sample_latents = '/nonexistent/latents.pt'
sample_labels = '/nonexistent/labels.pt'
sample_images = '/nonexistent/images/'
one_shot_ind = 0
classes = ['background', 'a', 'b', 'c']
"""

TINY_TRAINER = """
lr = 0.001
beta1, beta2 = 0.9, 0.99
weight_decay = 0.0
losses = ['cross_entropy']
lambdas = [1.]
scheduler_type = 'step'
scheduler_args = dict(step_size=500, gamma=0.1)
num_epochs = 6
print_freq = 3
"""

TINY_SWAV = """
n_layers = 7
n_hfc_layers = 3
train_hfc = True
layer_hf_dim = [512, 1024, 1024, 1024]
hlen = sum(layer_hf_dim)  # 3584 == all 7 levels at size 32
nclasses = 16
hfc_prep_args = dict(
    perturb_args=dict(truncation=0.7, n_layers=n_hfc_layers, n_samples=1,
                      layer_no=None, perturb_std=[1.0]*n_hfc_layers),
    swav_args=dict(num_epochs=2, num_samples=1, num_patches=2,
                   sampling_method='random', patch_size=64,
                   hf_interp='nearest', warmup_epochs=1, start_warmup=0.01,
                   use_scheduler=False, base_lr=0.01, final_lr=0.0001,
                   trust_coeff=0.01, freeze_prototype_niters=1,
                   train_args=dict(lr=0.01, momentum=0.9),
                   projn_nw='linear', temperature=0.01, nprototypes=32,
                   nclasses=nclasses, hlen=hlen, add_local_loss=False,
                   plot_test_images=False, epoch_print_freq=1, max_masks=4),
    sinkhorn_args=dict(source_pdf='uniform', niters=3, eps=0.05),
    train=train_hfc,
    layer_hf_dim=layer_hf_dim,
)
seg_args = dict(size='XXS', in_ch=nclasses)
"""

TINY_SIMCLR = """
n_layers = 7
n_hfc_layers = 3
train_hfc = True
layer_hf_dim = [512, 1024, 1024, 1024]
hlen = sum(layer_hf_dim)
nclasses = 16
hfc_prep_args = dict(
    perturb_args=dict(truncation=0.7, n_layers=n_hfc_layers, n_samples=1,
                      layer_no=None, perturb_std=[1.0]*n_hfc_layers),
    simclr_args=dict(num_iters=2, batch_size=8, patch_size=64,
                     hf_interp='nearest', trust_coeff=0.01,
                     train_args=dict(lr=0.01, momentum=0.9),
                     temperature=1.0, nclasses=nclasses, hlen=hlen,
                     epoch_print_freq=1, max_masks=4),
    train=train_hfc,
    layer_hf_dim=layer_hf_dim,
)
seg_args = dict(size='XS', in_ch=nclasses)
"""

TINY_KMEANS = """
n_layers = 7
n_hfc_layers = 2
clusters_per_layer = [4, 8]
train_hfc = True
hfc_prep_args = dict(
    perturb_args=dict(truncation=0.7, n_layers=n_hfc_layers, n_samples=2,
                      perturb_std=[1.0]*n_hfc_layers),
    hfc_algo='hfc_kmeans',
    hfc_args=dict(
        kmeans_args=dict(verbose=0),
        base_args=dict(out_dir=None, n_layers=n_hfc_layers,
                       clusters_per_layer=clusters_per_layer, out_size=32,
                       presaved=False)),
    hier_encode=False,
    hle_samples=2,
    train=train_hfc,
)
seg_args = dict(size='S', in_ch=sum(clusters_per_layer))
"""

TINY_RP = "seg_args = dict(size='XS')\nn_layers = 7\n"
TINY_DG = "seg_args = dict(size='S')\nn_layers = 7\n"


@pytest.fixture()
def tiny_configs(tmp_path):
    cfg = {}
    for name, body in [
        ("model", TINY_MODEL),
        ("trainer", TINY_TRAINER),
        ("swav", TINY_SWAV),
        ("simclr", TINY_SIMCLR),
        ("kmeans", TINY_KMEANS),
        ("rp", TINY_RP),
        ("dg", TINY_DG),
    ]:
        p = tmp_path / f"{name}_config.py"
        p.write_text(textwrap.dedent(body))
        cfg[name] = str(p)
    return cfg


def _run(tmp_path, tiny_configs, method, seg_key):
    from ganecdotes_tpu.pipeline.one_shot_pipeline import OneShotPipeline

    out = str(tmp_path / f"out_{method}")
    pipe = OneShotPipeline(
        out_dir=out,
        model="ffhq-256",
        segmentor=method,
        num_test_samples=3,
        custom={
            "model": tiny_configs["model"],
            "trainer": tiny_configs["trainer"],
            "seg": tiny_configs[seg_key],
        },
    )
    pipe.run_pipeline()
    assert os.path.exists(os.path.join(out, "tests", "results.npz"))
    assert os.path.exists(os.path.join(out, "tests", "mask_iou_results.csv"))
    # the one-shot head must LEARN, not merely terminate: beat the best
    # constant predictor (majority class of the one-shot label) under the
    # pipeline's own mean-mask-IoU metric on the same test labels
    preds = np.load(os.path.join(out, "tests", "label_predictions.npy"))
    assert preds.shape[0] == 3
    baseline = _majority_class_mean_iou(pipe)
    assert pipe.mean_mask_iou > baseline, (
        f"head did not beat the majority-class baseline: "
        f"{pipe.mean_mask_iou:.4f} <= {baseline:.4f}"
    )
    return pipe


def _majority_class_mean_iou(pipe):
    """Mean mask IoU of the constant majority-class predictor, computed with
    the pipeline's own metric over the same resized test labels."""
    from ganecdotes_tpu.metrics.segmentation import get_mask_iou
    from ganecdotes_tpu.ops.interp import resize_nearest
    import jax.numpy as jnp

    labels = np.asarray(pipe.test_labels)[: pipe.num_test_samples]
    size = pipe.model_config.image_size
    if labels.shape[-1] != size:
        labels = np.asarray(resize_nearest(jnp.asarray(labels)[..., None],
                                           size))[..., 0]
    one_shot = np.asarray(pipe.one_shot_label).ravel().astype(np.int64)
    maj = int(np.bincount(one_shot).argmax())
    n_class = len(pipe.model_config.classes)
    const = np.full_like(labels[0], maj)
    ious = [
        np.mean([get_mask_iou(l, const, c) for c in range(n_class)])
        for l in labels
    ]
    return float(np.mean(ious))


@pytest.mark.slow
def test_pipeline_repurposegan(tmp_path, tiny_configs):
    _run(tmp_path, tiny_configs, "repurposegan", "rp")


@pytest.mark.slow
def test_pipeline_datasetgan(tmp_path, tiny_configs):
    _run(tmp_path, tiny_configs, "datasetgan", "dg")


@pytest.mark.slow
def test_pipeline_hfc_kmeans(tmp_path, tiny_configs):
    pipe = _run(tmp_path, tiny_configs, "hfc_kmeans", "kmeans")
    # clusterer checkpoints persisted in the reference layout
    assert os.path.exists(os.path.join(pipe.out_dir, "clusterer_layer_0.npz"))


@pytest.mark.slow
def test_pipeline_hfc_with_swav(tmp_path, tiny_configs):
    pipe = _run(tmp_path, tiny_configs, "hfc_with_swav", "swav")
    assert os.path.exists(os.path.join(pipe.out_dir, "swav_params.npz"))


@pytest.mark.slow
def test_pipeline_hfc_with_simclr(tmp_path, tiny_configs):
    pipe = _run(tmp_path, tiny_configs, "hfc_with_simclr", "simclr")
    assert os.path.exists(os.path.join(pipe.out_dir, "simclr_params.npz"))


@pytest.mark.slow
def test_swav_presaved_reload(tmp_path, tiny_configs):
    """evaluate.py semantics: train once, reload without retraining."""
    from ganecdotes_tpu.pipeline.one_shot_pipeline import OneShotPipeline

    out = str(tmp_path / "out_reload")
    pipe = OneShotPipeline(
        out_dir=out, model="ffhq-256", segmentor="hfc_with_swav",
        num_test_samples=2,
        custom={"model": tiny_configs["model"],
                "trainer": tiny_configs["trainer"],
                "seg": tiny_configs["swav"]},
    )
    pipe.run_pipeline(blocks_to_run=("setup", "train"))

    pipe2 = OneShotPipeline(
        out_dir=out, model="ffhq-256", segmentor="hfc_with_swav",
        num_test_samples=2,
        custom={"model": tiny_configs["model"],
                "trainer": tiny_configs["trainer"],
                "seg": tiny_configs["swav"]},
    )
    pipe2.seg_config.train_hfc = False
    pipe2.seg_config.hfc_prep_args["train"] = False
    params_path = os.path.join(out, "swav_params.npz")
    mtime_before = os.path.getmtime(params_path)
    pipe2.run_pipeline()
    # warm start means LOADED, not retrained: pretrain() never ran in the
    # second pipeline and the checkpoint on disk was not rewritten
    assert pipe2.preprocessor.pretrain_count == 0
    assert os.path.getmtime(params_path) == mtime_before
    # and the reloaded embedding still supports a head that learns
    assert pipe2.mean_mask_iou > _majority_class_mean_iou(pipe2), (
        f"warm-started head did not beat majority baseline: "
        f"{pipe2.mean_mask_iou:.4f}"
    )


def test_fits_roundtrip(tmp_path):
    from ganecdotes_tpu.utils.fits import read_fits_data, save_fits_data

    rng = np.random.RandomState(0)
    for arr in (
        rng.randn(16, 16).astype(np.float32),
        (rng.rand(4, 8, 8) * 255).astype(np.int16),
    ):
        p = str(tmp_path / "t.fits")
        save_fits_data(p, arr)
        back = read_fits_data(p, field=0)
        np.testing.assert_array_equal(back, arr)


def test_legacy_hierarchical_kmeans(tmp_path):
    import jax.numpy as jnp

    from ganecdotes_tpu.selfsup.kmeans import LegacyHierarchicalKMeansHFC

    rng = np.random.RandomState(1)
    feats = [
        jnp.asarray(rng.rand(1, 8, 8, 6).astype(np.float32)),
        jnp.asarray(rng.rand(1, 16, 16, 4).astype(np.float32)),
    ]
    m = LegacyHierarchicalKMeansHFC(
        {}, dict(out_dir=str(tmp_path), n_layers=2, clusters_per_layer=[3, 4],
                 out_size=16),
    )
    m.fit(feats)
    labels, maps = m.hierarchical_predict(feats)
    assert labels.shape == (1, 2, 16, 16)
    assert maps.shape == (1, 16, 16, 7)  # 3 + 4 one-hot channels
    s = np.asarray(maps).reshape(-1, 7)
    np.testing.assert_allclose(s[:, :3].sum(-1), 1.0)  # one-hot per layer
    np.testing.assert_allclose(s[:, 3:].sum(-1), 1.0)


@pytest.mark.slow
def test_tester_iou_vs_pd_and_demo(tmp_path, tiny_configs):
    """Branch parity for tester strings the reference dead-ends
    (src/one_shot_pipeline.py:808,834)."""
    from ganecdotes_tpu.pipeline.one_shot_pipeline import OneShotPipeline

    out = str(tmp_path / "out_testers")
    pipe = OneShotPipeline(
        out_dir=out, model="ffhq-256", segmentor="repurposegan",
        tester="iou_vs_pd", num_test_samples=2,
        custom={"model": tiny_configs["model"],
                "trainer": tiny_configs["trainer"],
                "seg": tiny_configs["rp"]},
    )
    pipe.run_pipeline()
    # iou_vs_pd: curve + PD scores, but no iou CSV tables
    assert os.path.exists(os.path.join(out, "tests", "iou_vs_pd_curve.png"))
    res = np.load(os.path.join(out, "tests", "results.npz"),
                  allow_pickle=True)
    assert "pd" in res.files and "iou_pd_curve" in res.files
    assert not os.path.exists(
        os.path.join(out, "tests", "mask_iou_results.csv")
    )
    # predictions logged to the TB shim each batch
    assert "one_shot/predictions" in pipe.summary_writer.records

    pipe.test_str = "demo"
    pipe.run_tests()
    assert os.path.exists(os.path.join(out, "tests", "demo.png"))


@pytest.mark.slow
def test_swav_plot_test_images(tmp_path):
    """plot_test_images renders a per-epoch prediction grid (intended
    semantics of ref swav_clustering.py:467-501, which crashes there)."""
    import jax

    from ganecdotes_tpu.models.stylegan2.generator import Generator
    from ganecdotes_tpu.selfsup.swav import SwAVClustering

    class _MC:
        truncation = 0.7
        latent_dim = 512
        image_size = 32
        num_latents_for_mean = 8

    g = Generator(size=32, key=jax.random.PRNGKey(0))
    swav = SwAVClustering(
        model=g, model_config=_MC(),
        perturb_args=dict(truncation=0.7, n_layers=2, n_samples=1,
                          layer_no=None, perturb_std=[1.0, 1.0]),
        swav_args=dict(num_epochs=1, num_samples=1, num_patches=1,
                       sampling_method='random', patch_size=32,
                       hf_interp='nearest', warmup_epochs=1,
                       start_warmup=0.01, use_scheduler=False, base_lr=0.01,
                       final_lr=0.0001, trust_coeff=0.01,
                       freeze_prototype_niters=1,
                       train_args=dict(lr=0.01, momentum=0.9),
                       projn_nw='linear', temperature=0.1, nprototypes=8,
                       nclasses=8, hlen=3584, add_local_loss=False,
                       plot_test_images=True, epoch_print_freq=1,
                       max_masks=2),
        sinkhorn_args=dict(source_pdf='uniform', niters=2, eps=0.05),
        out_dir=str(tmp_path), num_test_samples=2,
    )
    swav.pretrain()
    assert os.path.exists(os.path.join(str(tmp_path), "swav",
                                       "test_epoch_0.png"))


@pytest.mark.slow
def test_pipeline_inference_dtype_bf16(tmp_path, tiny_configs):
    """model_config.inference_dtype='bfloat16' runs the whole test block in
    bf16 (the benched MXU configuration) end-to-end, and its per-pixel
    predictions agree with the fp32 run's (same seeds, same configs) —
    bf16 is a serving dtype, not a different model."""
    from ganecdotes_tpu.pipeline.one_shot_pipeline import OneShotPipeline

    def run(tag, extra_cfg):
        model_cfg = tmp_path / f"model_{tag}_config.py"
        model_cfg.write_text(open(tiny_configs["model"]).read() + extra_cfg)
        out = str(tmp_path / f"out_{tag}")
        pipe = OneShotPipeline(
            out_dir=out, model="ffhq-256", segmentor="hfc_with_swav",
            num_test_samples=2,
            custom={"model": str(model_cfg),
                    "trainer": tiny_configs["trainer"],
                    "seg": tiny_configs["swav"]},
        )
        pipe.run_pipeline()
        return np.load(os.path.join(out, "tests", "label_predictions.npy"))

    preds32 = run("fp32ref", "")
    preds16 = run("bf16", "\ninference_dtype = 'bfloat16'\n")
    assert preds16.shape == preds32.shape
    agreement = float((preds16 == preds32).mean())
    assert agreement >= 0.95, (
        f"bf16 predictions drifted from fp32: only {agreement:.3%} of "
        f"pixels agree"
    )


def test_online_input_noises_shape_synthesis(tmp_path, tiny_configs):
    """Online mode honors fed per-layer noise (verdict: the reference
    assigns one_shot_noise but never feeds it — here different input_noises
    must produce a different one-shot synthesis)."""
    import jax
    import jax.numpy as jnp

    from ganecdotes_tpu.pipeline.one_shot_pipeline import OneShotPipeline

    def build(tag):
        pipe = OneShotPipeline(
            out_dir=str(tmp_path / f"noise_{tag}"),
            model="ffhq-256", segmentor="repurposegan", mode="online",
            num_test_samples=2,
            custom={"model": tiny_configs["model"],
                    "trainer": tiny_configs["trainer"],
                    "seg": tiny_configs["rp"]},
        )
        # StyleGAN2 inits noise-injection weights to 0; make noise visible
        pipe.model.params["conv1"]["noise_weight"] = jnp.ones(())
        for c in pipe.model.params["convs"]:
            c["noise_weight"] = jnp.ones(())
        return pipe

    lat = jax.random.normal(jax.random.PRNGKey(0), (512,))
    pipe = build("a")
    n1 = pipe.model.make_noise(jax.random.PRNGKey(1))
    n2 = pipe.model.make_noise(jax.random.PRNGKey(2))

    pipe.run_pipeline(input_latent=lat, input_noises=n1,
                      blocks_to_run=("setup",))
    img1 = np.asarray(pipe.one_shot_img)
    assert [tuple(n.shape) for n in pipe.one_shot_noise] == [
        tuple(n.shape) for n in n1
    ]

    pipe2 = build("b")
    pipe2.run_pipeline(input_latent=lat, input_noises=n2,
                       blocks_to_run=("setup",))
    img2 = np.asarray(pipe2.one_shot_img)
    assert img1.shape == img2.shape
    assert not np.allclose(img1, img2), "fed noises must shape the synthesis"

    # same noises => identical synthesis (deterministic path)
    pipe3 = build("c")
    pipe3.run_pipeline(input_latent=lat, input_noises=n1,
                       blocks_to_run=("setup",))
    np.testing.assert_allclose(np.asarray(pipe3.one_shot_img), img1,
                               atol=1e-5)


def test_sample_noises_config_branch(tmp_path, tiny_configs):
    """A model config with ``sample_noises`` loads per-layer noises from the
    path and skips truncation in the setup forward (ref
    one_shot_pipeline.py:356,395-399,426-430)."""
    import textwrap as _tw

    import jax
    import jax.numpy as jnp

    from ganecdotes_tpu.pipeline.one_shot_pipeline import OneShotPipeline

    noise_dir = tmp_path / "noises"
    noise_dir.mkdir()
    rng = np.random.RandomState(0)
    # size-32 generator: 7 noise layers at 4,8,8,16,16,32,32
    for i, s in enumerate([4, 8, 8, 16, 16, 32, 32]):
        np.save(noise_dir / f"noise_{i}.npy",
                rng.randn(1, s, s, 1).astype(np.float32))

    model_cfg = tmp_path / "model_noises_config.py"
    model_cfg.write_text(
        open(tiny_configs["model"]).read()
        + _tw.dedent(f"""
        sample_noises = {str(noise_dir)!r}
        """)
    )

    def build(cfg_path, tag):
        pipe = OneShotPipeline(
            out_dir=str(tmp_path / f"sn_{tag}"),
            model="ffhq-256", segmentor="repurposegan",
            num_test_samples=2,
            custom={"model": cfg_path,
                    "trainer": tiny_configs["trainer"],
                    "seg": tiny_configs["rp"]},
        )
        pipe.model.params["conv1"]["noise_weight"] = jnp.ones(())
        for c in pipe.model.params["convs"]:
            c["noise_weight"] = jnp.ones(())
        return pipe

    pipe = build(str(model_cfg), "with")
    pipe.run_pipeline(blocks_to_run=("setup",))
    assert pipe.one_shot_noise is not None and len(pipe.one_shot_noise) == 7
    img_noises = np.asarray(pipe.one_shot_img)

    pipe0 = build(tiny_configs["model"], "without")
    pipe0.run_pipeline(blocks_to_run=("setup",))
    assert pipe0.one_shot_noise is None
    # different noise source (loaded vs fixed buffers) + truncation skip
    # => different synthesis
    assert not np.allclose(img_noises, np.asarray(pipe0.one_shot_img))
