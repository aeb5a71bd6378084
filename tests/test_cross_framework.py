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
