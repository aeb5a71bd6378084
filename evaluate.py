"""Evaluate a saved self-supervised clustering model for one-shot segmentation.

CLI-compatible with the reference's evaluate.py:1-100.
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
    description="Script to evaluate saved self-supervised clustering model "
                "for one-shot segmentation."
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
    choices=["hfc_with_swav", "hfc_with_simclr", "hfc_kmeans",
             "repurposegan", "datasetgan"],
    type=str,
)
parser.add_argument("--out_dir", default="results/evaluate_default/")
parser.add_argument("--expt_desc", default="Testing Clustering Model")
parser.add_argument("--num_test_samples", default=10, type=int)
parser.add_argument(
    "--export_serving",
    default=None,
    metavar="PATH.ganex",
    help="after evaluation, export the trained fused generate->embed->"
         "segment program (weights baked in) to a one-file jax.export "
         "serving artifact runnable with jax alone (TPU-native extension; "
         "the reference has no serving/deployment story)",
)

args = parser.parse_args()
args.method = resolve_method_alias(args.method, args.model)

one_shot_pipeline = OneShotPipeline(
    out_dir=args.out_dir,
    exp_name=args.expt_desc,
    model=args.model,
    segmentor=args.method,
    num_test_samples=args.num_test_samples,
)

if args.method not in ["datasetgan", "repurposegan"]:
    one_shot_pipeline.seg_config.train_hfc = False
    one_shot_pipeline.seg_config.hfc_prep_args["train"] = False

if args.method == "hfc_kmeans":
    one_shot_pipeline.seg_config.hfc_prep_args["hfc_args"]["base_args"][
        "presaved"
    ] = True

one_shot_pipeline.run_pipeline()

if args.export_serving:
    from ganecdotes_tpu.runtime.export import export_serving

    meta = export_serving(one_shot_pipeline, args.export_serving)
    one_shot_pipeline.logger.info(
        "Exported serving artifact to %s (batch %d, platforms %s)",
        args.export_serving, meta["batch"], meta["platforms"],
    )
