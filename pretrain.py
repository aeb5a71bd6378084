"""Pre-train the self-supervised clustering model for one-shot segmentation.

CLI-compatible with the reference's pretrain.py:1-95 (same flags, same
model/method choices, same alias rules), running the TPU-native pipeline.
"""

import argparse

import matplotlib

# headless CLI: metric/collage plots must never grab a display
matplotlib.use("Agg")

from ganecdotes_tpu.runtime.compile_cache import (
    enable_persistent_compilation_cache,
)

enable_persistent_compilation_cache()
from ganecdotes_tpu.configs.mapper import resolve_method_alias
from ganecdotes_tpu.pipeline.one_shot_pipeline import OneShotPipeline

parser = argparse.ArgumentParser(
    description="Script to pre-train self-supervised clustering model "
                "for one-shot segmentation. User must specify the "
                "StyleGAN model/ds for pre-training "
                "{ffhq-256 | cat-256 | afhq-256 | horse-256 | car-512 | "
                " pidray-256 | pidray-pliers-256 | pidray-hammer-256 | "
                " pidray-powerbank-256 | pidray-wrench-256 | "
                " pidray-handcuffs-256} and method "
                "{hfc_with_swav | hfc_with_simclr | hfc_kmeans}. "
                "Training parameters are specified in config files saved as "
                "ganecdotes_tpu/configs/segmentors/*_config.py."
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
parser.add_argument(
    "--method",
    default="hfc_with_swav",
    choices=["hfc_with_swav", "hfc_with_simclr", "hfc_kmeans"],
    type=str,
)
parser.add_argument("--out_dir", default="results/pretrain_default_ffhq/")
parser.add_argument("--expt_desc", default="Testing Clustering Model")
parser.add_argument("--num_test_samples", default=10, type=int)

args = parser.parse_args()
args.method = resolve_method_alias(args.method, args.model)

one_shot_pipeline = OneShotPipeline(
    out_dir=args.out_dir,
    exp_name=args.expt_desc,
    model=args.model,
    segmentor=args.method,
    num_test_samples=args.num_test_samples,
)

one_shot_pipeline.seg_config.train_hfc = True
one_shot_pipeline.seg_config.hfc_prep_args["train"] = True

if args.method == "hfc_kmeans":
    one_shot_pipeline.seg_config.hfc_prep_args["hfc_args"]["base_args"][
        "presaved"
    ] = False

one_shot_pipeline.run_pipeline()
