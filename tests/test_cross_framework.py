"""Cross-framework e2e mIoU parity: the reference torch pipeline vs ours.

The north-star measurement BASELINE.md asks for: run the ACTUAL reference
``OneShotPipeline`` (CPU, under the stubs in ref_harness.py) and the TPU
pipeline on the SAME artifacts — one tiny torch ``g_ema`` checkpoint, the
same W latents and labels, and the same torch-initialized head weights —
and require that the predicted masks and metric tables agree.

What can and cannot match exactly:

* synthesis / features: identical up to fp32 tolerance (golden-parity
  tested per component elsewhere);
* fine-tune: same init, same features, same labels, same lr/epochs/loss —
  but torch Adam vs optax Adam accumulate independent fp noise, so trained
  heads differ at the margin. The parity bar is therefore inter-framework
  mask IoU of the PREDICTED masks (>= 0.95 averaged over samples x classes
  present), plus metric-table agreement.
"""

import os
import sys

import numpy as np
import pytest

pytestmark = pytest.mark.slow

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def _setup():
    torch = pytest.importorskip("torch")
    sys.path.insert(0, os.path.join(REPO, "tests"))
    from ref_harness import setup_reference_pipeline

    try:
        torch, RefPipeline = setup_reference_pipeline()
    except ImportError as e:
        pytest.skip(str(e))
    return torch, RefPipeline


def _head_sd_to_pytree(sd):
    """torch OneShotSegmentor state_dict -> our FCN head params list.

    Reference head (baseline/repurposegan/segmentor.py): Sequential of
    Conv2d(+LeakyReLU) layers named layers.{2i}; conv weight (co,ci,kh,kw)
    -> HWIO."""
    import jax.numpy as jnp

    idx = sorted(
        {int(k.split(".")[1]) for k in sd if k.endswith(".weight")}
    )
    params = []
    for i in idx:
        w = np.asarray(sd[f"layers.{i}.weight"].detach().cpu())
        b = np.asarray(sd[f"layers.{i}.bias"].detach().cpu())
        params.append(
            {"weight": jnp.asarray(w.transpose(2, 3, 1, 0)),
             "bias": jnp.asarray(b)}
        )
    return params


def _interframework_miou(pred_a, pred_b, n_class):
    """Mean IoU between two frameworks' predicted label maps, over the
    classes either framework predicts (IoU of an absent-in-both class is
    skipped rather than counted as a free 0/0)."""
    ious = []
    for a, b in zip(pred_a, pred_b):
        for c in range(n_class):
            ga, gb = (a == c), (b == c)
            union = np.count_nonzero(ga | gb)
            if union == 0:
                continue
            ious.append(np.count_nonzero(ga & gb) / union)
    return float(np.mean(ious))


def test_cross_framework_repurposegan_miou_parity(tmp_path):
    torch, RefPipeline = _setup()
    from ref_harness import CLASSES, build_tiny_artifacts

    art = build_tiny_artifacts(torch, str(tmp_path / "artifacts"))

    seg_cfg = tmp_path / "seg_config.py"
    seg_cfg.write_text("seg_args = dict(size='XS')\nn_layers = 7\n")

    # ---- reference run (capture the head's torch init) --------------------
    ref_out = str(tmp_path / "ref_out")
    ref_pipe = RefPipeline(
        out_dir=ref_out, model="ffhq-256", segmentor="repurposegan",
        custom={
            "model": art["model_cfg"],
            "seg": str(seg_cfg),
            "trainer": art["trainer_cfg"],
        },
        device="cpu", num_test_samples=3,
    )
    captured = {}
    orig_cls = ref_pipe.segmentor

    def capturing(*a, **k):
        import copy

        m = orig_cls(*a, **k)
        captured["sd"] = copy.deepcopy(m.state_dict())
        return m

    ref_pipe.segmentor = capturing
    # pin the truncation target to the shared artifact (mean_latent is
    # otherwise drawn from each framework's own RNG)
    ref_pipe.mean_latent = torch.from_numpy(np.load(art["mean_latent"]))
    torch.manual_seed(7)
    ref_pipe.run_pipeline()

    ref_pred = torch.load(
        os.path.join(ref_out, "tests", "label_predictions.pt"),
        map_location="cpu", weights_only=False,
    ).numpy()

    # ---- TPU pipeline on the SAME artifacts + head init -------------------
    from ganecdotes_tpu.pipeline.one_shot_pipeline import OneShotPipeline

    our_out = str(tmp_path / "tpu_out")
    pipe = OneShotPipeline(
        out_dir=our_out, model="ffhq-256", segmentor="repurposegan",
        num_test_samples=3,
        custom={
            "model": art["model_cfg"],
            "seg": str(seg_cfg),
            "trainer": art["trainer_cfg"],
        },
    )
    import jax.numpy as jnp

    pipe.mean_latent = jnp.asarray(np.load(art["mean_latent"]))
    pipe.segmentor_init_params = _head_sd_to_pytree(captured["sd"])
    pipe.run_pipeline()

    our_pred = np.load(os.path.join(our_out, "tests", "label_predictions.npy"))

    # ---- masks agree across frameworks ------------------------------------
    assert ref_pred.shape == our_pred.shape
    miou = _interframework_miou(ref_pred, our_pred, len(CLASSES))
    print(f"\ninter-framework mask IoU (repurposegan): {miou:.4f}")
    assert miou >= 0.95, f"inter-framework mask IoU {miou:.4f} < 0.95"

    # ---- metric tables agree ----------------------------------------------
    import pandas as pd

    ref_tab = pd.read_csv(
        os.path.join(ref_out, "tests", "mask_iou_results.csv"), index_col=0
    )
    our_tab = pd.read_csv(
        os.path.join(our_out, "tests", "mask_iou_results.csv"), index_col=0
    )
    assert list(ref_tab.columns) == list(our_tab.columns)
    diff = np.abs(ref_tab.to_numpy() - our_tab.to_numpy())
    print(f"mask-IoU table max |diff|: {diff.max():.4f}")
    assert diff.max() < 0.05
    # headline means agree
    assert abs(
        float(ref_tab.mean(axis=0).mean()) - float(our_tab.mean(axis=0).mean())
    ) < 0.02


def test_cross_framework_hfc_kmeans_miou_parity(tmp_path):
    """Second deterministic method: the reference trains its sklearn
    clusterers, we IMPORT the saved .sav models (exact argmin parity).

    Unlike repurposegan (continuous features -> masks match exactly even
    after 60 independent Adam runs), kmeans features are BLOCK-CONSTANT
    ±1 one-hot maps: all 16 pixels of an upsampled block share identical
    logits, so the tiniest optimizer fp drift flips whole blocks' argmax
    together and the two independently-trained heads diverge at block
    granularity. The parity design therefore splits the claim:

    1. inference-path parity: copy the reference's TRAINED head across and
       fine-tune with lr=0 — generate->cluster-assign->head->argmax must
       then agree >= 0.95 (it's the whole deterministic path);
    2. training-quality parity: each framework trains from the same init;
       their GT mean-mask-IoU tables must agree closely."""
    import shutil

    torch, RefPipeline = _setup()
    from ref_harness import CLASSES, build_tiny_artifacts

    art = build_tiny_artifacts(torch, str(tmp_path / "artifacts"))

    def seg_cfg_text(presaved):
        return f"""
n_layers = 7
n_hfc_layers = 2
clusters_per_layer = [4, 8]
train_hfc = {not presaved}
hfc_prep_args = dict(
    perturb_args=dict(truncation=0.7, n_layers=n_hfc_layers, n_samples=2,
                      perturb_std=[1.0]*n_hfc_layers),
    hfc_algo='hfc_kmeans',
    hfc_args=dict(
        kmeans_args=dict(verbose=0),
        base_args=dict(out_dir=None, n_layers=n_hfc_layers,
                       clusters_per_layer=clusters_per_layer, out_size=32,
                       presaved={presaved})),
    hier_encode=False,
    hle_samples=2,
    train={not presaved},
)
seg_args = dict(size='S', in_ch=sum(clusters_per_layer))
"""

    ref_seg = tmp_path / "ref_seg_config.py"
    ref_seg.write_text(seg_cfg_text(presaved=False))
    our_seg = tmp_path / "our_seg_config.py"
    our_seg.write_text(seg_cfg_text(presaved=True))

    pinned_ml = np.load(art["mean_latent"])

    # ---- reference run: trains + saves clusterer_layer_{n}.sav ------------
    ref_out = str(tmp_path / "ref_out")
    ref_pipe = RefPipeline(
        out_dir=ref_out, model="ffhq-256", segmentor="hfc_kmeans",
        custom={
            "model": art["model_cfg"],
            "seg": str(ref_seg),
            "trainer": art["trainer_cfg"],
        },
        device="cpu", num_test_samples=3,
    )
    # pin the truncation target everywhere (predict_hfc_vectors re-draws
    # mean_latent per call, baseline/hfc_kmeans/segmentor.py:182)
    ref_pipe.mean_latent = torch.from_numpy(pinned_ml)
    ref_pipe.model.mean_latent = lambda n: torch.from_numpy(pinned_ml)

    captured = {}
    orig_cls = ref_pipe.segmentor

    def capturing(*a, **k):
        import copy

        m = orig_cls(*a, **k)
        captured["sd"] = copy.deepcopy(m.state_dict())
        return m

    ref_pipe.segmentor = capturing
    torch.manual_seed(7)
    ref_pipe.run_pipeline()
    trained_sd = {
        k: v.detach().clone() for k, v in ref_pipe.segmentor.state_dict().items()
    }

    ref_pred = torch.load(
        os.path.join(ref_out, "tests", "label_predictions.pt"),
        map_location="cpu", weights_only=False,
    ).numpy()
    import pandas as pd

    ref_tab = pd.read_csv(
        os.path.join(ref_out, "tests", "mask_iou_results.csv"), index_col=0
    )

    # ---- TPU pipeline: import the reference clusterers --------------------
    import jax.numpy as jnp

    from ganecdotes_tpu.pipeline.one_shot_pipeline import OneShotPipeline

    frozen_trainer = tmp_path / "trainer_frozen_config.py"
    frozen_trainer.write_text(
        open(art["trainer_cfg"]).read().replace("lr = 0.001", "lr = 0.0")
    )

    def run_ours(tag, trainer_cfg, head_params):
        our_out = str(tmp_path / f"tpu_out_{tag}")
        os.makedirs(our_out, exist_ok=True)
        for f in os.listdir(ref_out):
            if f.startswith("clusterer_layer_") or f == "model_stats.npz":
                shutil.copy(os.path.join(ref_out, f),
                            os.path.join(our_out, f))
        pipe = OneShotPipeline(
            out_dir=our_out, model="ffhq-256", segmentor="hfc_kmeans",
            num_test_samples=3,
            custom={
                "model": art["model_cfg"],
                "seg": str(our_seg),
                "trainer": trainer_cfg,
            },
        )
        pipe.mean_latent = jnp.asarray(pinned_ml)
        pipe.preprocessor.mean_latent = jnp.asarray(pinned_ml)
        pipe.segmentor_init_params = head_params
        pipe.run_pipeline()
        pred = np.load(
            os.path.join(our_out, "tests", "label_predictions.npy")
        )
        tab = pd.read_csv(
            os.path.join(our_out, "tests", "mask_iou_results.csv"),
            index_col=0,
        )
        return pred, tab

    # 1) inference parity: the reference's trained head, lr=0
    our_pred, _ = run_ours(
        "frozen", str(frozen_trainer), _head_sd_to_pytree(trained_sd)
    )
    assert ref_pred.shape == our_pred.shape
    miou = _interframework_miou(ref_pred, our_pred, len(CLASSES))
    print(f"\ninter-framework mask IoU (hfc_kmeans, shared head): {miou:.4f}")
    assert miou >= 0.95, f"inter-framework mask IoU {miou:.4f} < 0.95"

    # 2) training-quality parity: same init, independent training
    _, our_tab = run_ours(
        "trained", art["trainer_cfg"], _head_sd_to_pytree(captured["sd"])
    )
    ref_mean = float(ref_tab.mean(axis=0).mean())
    our_mean = float(our_tab.mean(axis=0).mean())
    print(f"gt mean-mask-IoU: ref {ref_mean:.4f} vs ours {our_mean:.4f}")
    assert abs(ref_mean - our_mean) < 0.05


def test_cross_framework_swav_miou_parity(tmp_path):
    """Third method: SwAV inference with IMPORTED reference modules
    (prototypes.pt / projection.pt saved exactly as swav_clustering.py
    :503-505 does). Codes are continuous projections, so same-init
    independent fine-tunes converge to matching masks like repurposegan."""
    import shutil

    torch, RefPipeline = _setup()
    from ref_harness import CLASSES, build_tiny_artifacts

    art = build_tiny_artifacts(torch, str(tmp_path / "artifacts"))
    pinned_ml = np.load(art["mean_latent"])

    # reference-format SSL modules: whole torch modules, torch.save'd
    hlen, ncls, nproto = 1024, 16, 32
    torch.manual_seed(11)
    projection = torch.nn.Sequential(
        torch.nn.Linear(hlen, ncls, bias=False)
    )
    prototype = torch.nn.Linear(ncls, nproto)

    seg_cfg = tmp_path / "swav_seg_config.py"
    seg_cfg.write_text(f"""
n_layers = 7
n_hfc_layers = 3
train_hfc = False
layer_hf_dim = [512, 1024, 1024, 1024]
hlen = {hlen}
nclasses = {ncls}
hfc_prep_args = dict(
    device='cpu',  # the reference SwAVClustering defaults to 'cuda'
    perturb_args=dict(truncation=0.7, n_layers=n_hfc_layers, n_samples=1,
                      layer_no=None, perturb_std=[1.0]*n_hfc_layers),
    swav_args=dict(num_epochs=2, num_samples=1, num_patches=1,
                   sampling_method='random', patch_size=64,
                   hf_interp='nearest', warmup_epochs=1, start_warmup=0.01,
                   use_scheduler=False, base_lr=0.01, final_lr=0.0001,
                   trust_coeff=0.01, freeze_prototype_niters=1,
                   train_args=dict(lr=0.01, momentum=0.9),
                   projn_nw='linear', temperature=0.1,
                   nprototypes={nproto}, nclasses={ncls}, hlen={hlen},
                   add_local_loss=False, plot_test_images=False,
                   epoch_print_freq=10, max_masks=4),
    sinkhorn_args=dict(source_pdf='uniform', niters=2, eps=0.05),
    train=train_hfc,
    layer_hf_dim=layer_hf_dim,
)
seg_args = dict(size='XS', in_ch=nclasses)
""")

    # ---- reference run ----------------------------------------------------
    ref_out = str(tmp_path / "ref_out")
    os.makedirs(ref_out, exist_ok=True)
    torch.save(prototype, os.path.join(ref_out, "prototypes.pt"))
    torch.save(projection, os.path.join(ref_out, "projection.pt"))

    ref_pipe = RefPipeline(
        out_dir=ref_out, model="ffhq-256", segmentor="hfc_with_swav",
        custom={
            "model": art["model_cfg"],
            "seg": str(seg_cfg),
            "trainer": art["trainer_cfg"],
        },
        device="cpu", num_test_samples=3,
    )
    ref_pipe.mean_latent = torch.from_numpy(pinned_ml)
    ref_pipe.model.mean_latent = lambda n: torch.from_numpy(pinned_ml)

    captured = {}
    orig_cls = ref_pipe.segmentor

    def capturing(*a, **k):
        import copy

        m = orig_cls(*a, **k)
        captured.setdefault("sd", copy.deepcopy(m.state_dict()))
        return m

    ref_pipe.segmentor = capturing
    torch.manual_seed(7)
    ref_pipe.run_pipeline()

    ref_pred = torch.load(
        os.path.join(ref_out, "tests", "label_predictions.pt"),
        map_location="cpu", weights_only=False,
    ).numpy()

    # ---- TPU pipeline -----------------------------------------------------
    import jax.numpy as jnp

    from ganecdotes_tpu.pipeline.one_shot_pipeline import OneShotPipeline

    our_out = str(tmp_path / "tpu_out")
    os.makedirs(our_out, exist_ok=True)
    for f in ("prototypes.pt", "projection.pt"):
        shutil.copy(os.path.join(ref_out, f), os.path.join(our_out, f))

    pipe = OneShotPipeline(
        out_dir=our_out, model="ffhq-256", segmentor="hfc_with_swav",
        num_test_samples=3,
        custom={
            "model": art["model_cfg"],
            "seg": str(seg_cfg),
            "trainer": art["trainer_cfg"],
        },
    )
    pipe.mean_latent = jnp.asarray(pinned_ml)
    # the SSL preprocessor (constructed lazily in run_trainer) estimates its
    # OWN mean latent from the model; pin it to the shared artifact exactly
    # as the reference side's model.mean_latent patch does
    pipe.model.mean_latent = lambda n, key=None: jnp.asarray(pinned_ml)
    pipe.segmentor_init_params = _head_sd_to_pytree(captured["sd"])
    pipe.run_pipeline()
    assert pipe.preprocessor is not None

    our_pred = np.load(os.path.join(our_out, "tests", "label_predictions.npy"))

    assert ref_pred.shape == our_pred.shape
    miou = _interframework_miou(ref_pred, our_pred, len(CLASSES))
    print(f"\ninter-framework mask IoU (hfc_with_swav): {miou:.4f}")
    assert miou >= 0.95, f"inter-framework mask IoU {miou:.4f} < 0.95"


def _mlp_sd_to_pytree(sd):
    """torch PixelClassifier state_dict -> (params, state) for our
    pixel_classifier_apply. Linear layers at layers.{0,3,6}; BN1d buffers
    at layers.{2,5}."""
    import jax.numpy as jnp

    lin_idx = sorted(
        int(k.split(".")[1]) for k in sd
        if k.endswith(".weight") and f"layers.{k.split('.')[1]}.running_mean"
        not in sd
    )
    bn_idx = sorted(
        int(k.split(".")[1]) for k in sd if k.endswith(".running_mean")
    )
    params = [
        {
            "weight": jnp.asarray(
                np.asarray(sd[f"layers.{i}.weight"].detach().cpu()).T
            ),
            "bias": jnp.asarray(
                np.asarray(sd[f"layers.{i}.bias"].detach().cpu())
            ),
        }
        for i in lin_idx
    ]
    state = [
        {
            "gamma": jnp.asarray(np.asarray(sd[f"layers.{i}.weight"].detach().cpu())),
            "beta": jnp.asarray(np.asarray(sd[f"layers.{i}.bias"].detach().cpu())),
            "mean": jnp.asarray(np.asarray(sd[f"layers.{i}.running_mean"].detach().cpu())),
            "var": jnp.asarray(np.asarray(sd[f"layers.{i}.running_var"].detach().cpu())),
        }
        for i in bn_idx
    ]
    return params, state


def test_cross_framework_datasetgan_miou_parity(tmp_path):
    """Fourth method: the DatasetGAN per-pixel MLP (Linear/ReLU/BN1d stack).

    Per-pixel MLP decisions flip independently under optimizer fp drift
    (measured: ~0.80 inter-IoU after 60 independent same-init Adam+BN
    runs), so like hfc_kmeans the claim splits: (1) inference parity with
    the reference's TRAINED weights+BN buffers copied across (deterministic
    path, >= 0.95); (2) training quality via GT mean-mask-IoU closeness."""
    torch, RefPipeline = _setup()
    from ref_harness import CLASSES, build_tiny_artifacts

    art = build_tiny_artifacts(torch, str(tmp_path / "artifacts"))
    pinned_ml = np.load(art["mean_latent"])

    seg_cfg = tmp_path / "dg_seg_config.py"
    seg_cfg.write_text("seg_args = dict(size='S')\nn_layers = 7\n")

    ref_out = str(tmp_path / "ref_out")
    ref_pipe = RefPipeline(
        out_dir=ref_out, model="ffhq-256", segmentor="datasetgan",
        custom={
            "model": art["model_cfg"],
            "seg": str(seg_cfg),
            "trainer": art["trainer_cfg"],
        },
        device="cpu", num_test_samples=3,
    )
    ref_pipe.mean_latent = torch.from_numpy(pinned_ml)

    captured = {}
    orig_cls = ref_pipe.segmentor

    def capturing(*a, **k):
        import copy

        m = orig_cls(*a, **k)
        captured.setdefault("sd", copy.deepcopy(m.state_dict()))
        return m

    ref_pipe.segmentor = capturing
    torch.manual_seed(7)
    ref_pipe.run_pipeline()
    trained_sd = {
        k: v.detach().clone()
        for k, v in ref_pipe.segmentor.state_dict().items()
    }

    ref_pred = torch.load(
        os.path.join(ref_out, "tests", "label_predictions.pt"),
        map_location="cpu", weights_only=False,
    ).numpy()
    import pandas as pd

    ref_tab = pd.read_csv(
        os.path.join(ref_out, "tests", "mask_iou_results.csv"), index_col=0
    )

    import jax.numpy as jnp

    from ganecdotes_tpu.pipeline.one_shot_pipeline import OneShotPipeline

    frozen_trainer = tmp_path / "dg_trainer_frozen.py"
    frozen_trainer.write_text(
        open(art["trainer_cfg"]).read().replace("lr = 0.001", "lr = 0.0")
    )

    def run_ours(tag, trainer_cfg, sd):
        our_out = str(tmp_path / f"tpu_out_{tag}")
        pipe = OneShotPipeline(
            out_dir=our_out, model="ffhq-256", segmentor="datasetgan",
            num_test_samples=3,
            custom={
                "model": art["model_cfg"],
                "seg": str(seg_cfg),
                "trainer": trainer_cfg,
            },
        )
        pipe.mean_latent = jnp.asarray(pinned_ml)
        params, state = _mlp_sd_to_pytree(sd)
        pipe.segmentor_init_params = params
        pipe.segmentor_init_state = state
        pipe.run_pipeline()
        pred = np.load(
            os.path.join(our_out, "tests", "label_predictions.npy")
        )
        tab = pd.read_csv(
            os.path.join(our_out, "tests", "mask_iou_results.csv"),
            index_col=0,
        )
        return pred, tab

    # 1) inference parity: trained weights + BN buffers, lr=0
    our_pred, _ = run_ours("frozen", str(frozen_trainer), trained_sd)
    assert ref_pred.shape == our_pred.shape
    miou = _interframework_miou(ref_pred, our_pred, len(CLASSES))
    print(f"\ninter-framework mask IoU (datasetgan, shared head): {miou:.4f}")
    assert miou >= 0.95, f"inter-framework mask IoU {miou:.4f} < 0.95"

    # 2) training-quality parity: same init, independent training
    _, our_tab = run_ours("trained", art["trainer_cfg"], captured["sd"])
    ref_mean = float(ref_tab.mean(axis=0).mean())
    our_mean = float(our_tab.mean(axis=0).mean())
    print(f"gt mean-mask-IoU: ref {ref_mean:.4f} vs ours {our_mean:.4f}")
    assert abs(ref_mean - our_mean) < 0.05


def test_cross_framework_simclr_miou_parity(tmp_path):
    """Fifth method: SimCLR inference with the IMPORTED reference
    projection module (Linear→BN1d→LeakyReLU→Linear saved whole, exactly as
    simclr_clustering.py:280 does) — completing cross-framework coverage of
    every pipeline method."""
    import shutil

    torch, RefPipeline = _setup()
    from ref_harness import CLASSES, build_tiny_artifacts

    art = build_tiny_artifacts(torch, str(tmp_path / "artifacts"))
    pinned_ml = np.load(art["mean_latent"])

    hlen, ncls = 1024, 16
    torch.manual_seed(13)
    projection = torch.nn.Sequential(
        torch.nn.Linear(hlen, ncls, bias=False),
        torch.nn.BatchNorm1d(ncls),
        torch.nn.LeakyReLU(inplace=True),
        torch.nn.Linear(ncls, ncls, bias=False),
    )

    seg_cfg = tmp_path / "simclr_seg_config.py"
    seg_cfg.write_text(f"""
n_layers = 7
n_hfc_layers = 3
train_hfc = False
layer_hf_dim = [512, 1024, 1024, 1024]
hlen = {hlen}
nclasses = {ncls}
hfc_prep_args = dict(
    device='cpu',
    perturb_args=dict(truncation=0.7, n_layers=n_hfc_layers, n_samples=1,
                      layer_no=None, perturb_std=[1.0]*n_hfc_layers),
    simclr_args=dict(num_iters=2, batch_size=8, patch_size=32,
                     hf_interp='nearest', trust_coeff=0.01,
                     train_args=dict(lr=0.01, momentum=0.9),
                     temperature=1.0, nclasses={ncls}, hlen={hlen},
                     epoch_print_freq=10, max_masks=4),
    train=train_hfc,
    layer_hf_dim=layer_hf_dim,
)
seg_args = dict(size='XS', in_ch=nclasses)
""")

    ref_out = str(tmp_path / "ref_out")
    os.makedirs(ref_out, exist_ok=True)
    torch.save(projection, os.path.join(ref_out, "projection.pt"))

    ref_pipe = RefPipeline(
        out_dir=ref_out, model="ffhq-256", segmentor="hfc_with_simclr",
        custom={
            "model": art["model_cfg"],
            "seg": str(seg_cfg),
            "trainer": art["trainer_cfg"],
        },
        device="cpu", num_test_samples=3,
    )
    ref_pipe.mean_latent = torch.from_numpy(pinned_ml)
    ref_pipe.model.mean_latent = lambda n: torch.from_numpy(pinned_ml)

    captured = {}
    orig_cls = ref_pipe.segmentor

    def capturing(*a, **k):
        import copy

        m = orig_cls(*a, **k)
        captured.setdefault("sd", copy.deepcopy(m.state_dict()))
        return m

    ref_pipe.segmentor = capturing
    torch.manual_seed(7)
    ref_pipe.run_pipeline()

    ref_pred = torch.load(
        os.path.join(ref_out, "tests", "label_predictions.pt"),
        map_location="cpu", weights_only=False,
    ).numpy()

    import jax.numpy as jnp

    from ganecdotes_tpu.pipeline.one_shot_pipeline import OneShotPipeline

    our_out = str(tmp_path / "tpu_out")
    os.makedirs(our_out, exist_ok=True)
    shutil.copy(os.path.join(ref_out, "projection.pt"),
                os.path.join(our_out, "projection.pt"))

    pipe = OneShotPipeline(
        out_dir=our_out, model="ffhq-256", segmentor="hfc_with_simclr",
        num_test_samples=3,
        custom={
            "model": art["model_cfg"],
            "seg": str(seg_cfg),
            "trainer": art["trainer_cfg"],
        },
    )
    pipe.mean_latent = jnp.asarray(pinned_ml)
    pipe.model.mean_latent = lambda n, key=None: jnp.asarray(pinned_ml)
    pipe.segmentor_init_params = _head_sd_to_pytree(captured["sd"])
    pipe.run_pipeline()

    our_pred = np.load(os.path.join(our_out, "tests", "label_predictions.npy"))
    assert ref_pred.shape == our_pred.shape
    miou = _interframework_miou(ref_pred, our_pred, len(CLASSES))
    print(f"\ninter-framework mask IoU (hfc_with_simclr): {miou:.4f}")
    assert miou >= 0.95, f"inter-framework mask IoU {miou:.4f} < 0.95"
