"""Interactive GUI for on-the-fly one-shot segmentation.

CLI-compatible with the reference's run_on_the_fly_segmentor_gui.py:1-79
(labelling tools lineage: github.com/bryandlee/repurpose-gan).
"""

import argparse

from ganecdotes_tpu.runtime.compile_cache import (
    enable_persistent_compilation_cache,
)

enable_persistent_compilation_cache()

from ganecdotes_tpu.gui.interactive_labeller import InteractiveLabellerGUI
from ganecdotes_tpu.pipeline.one_shot_pipeline import OneShotPipeline

parser = argparse.ArgumentParser(
    description="Script to run an interactive GUI for on-the-fly one-shot "
                "segmentation. The GUI allows labelling StyleGAN images and "
                "synthesizes new annotated images on-the-fly."
)

parser.add_argument(
    "--model",
    default="ffhq-256",
    choices=["ffhq-256", "cat-256", "afhq-256", "horse-256", "car-512",
             "pidray-256", "pidray-pliers-256", "pidray-hammer-256",
             "pidray-powerbank-256", "pidray-wrench-256",
             "pidray-handcuffs-256"],
    type=str,
)
parser.add_argument("--out_dir", default="data/gui_demo/",
                    help="Expt. directory with saved model + output")
parser.add_argument("--expt_desc",
                    default="Interactive GUI for On-the-fly Segmentation")

args = parser.parse_args()

# NOTE: like the reference (:54-61 vs :66), the resolved per-model alias is
# not forwarded — the generic 'hfc_with_swav' segmentor config is used
one_shot_pipeline = OneShotPipeline(
    out_dir=args.out_dir,
    exp_name=args.expt_desc,
    model=args.model,
    segmentor="hfc_with_swav",
    num_test_samples=8,
)

one_shot_pipeline.seg_config.train_hfc = False
one_shot_pipeline.seg_config.hfc_prep_args["train"] = False

# fewer fine-tune epochs keep the labelling loop responsive
one_shot_pipeline.trainer_config.num_epochs = 100

one_shot_pipeline.run_pipeline(blocks_to_run=["setup"])

labeller = InteractiveLabellerGUI(one_shot_learner=one_shot_pipeline, cmap="jet")
