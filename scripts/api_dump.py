"""Regenerate the raw public-API listing that docs/API.md curates.

Usage:  JAX_PLATFORMS=cpu python scripts/api_dump.py > /tmp/api_dump.md

Lists every public function/class defined in each module (skips re-exports)
with its signature and first docstring line, so docs/API.md can be diffed
against reality when the surface changes.
"""

import importlib
import inspect

MODS = [
    "ganecdotes_tpu.ops.upfirdn2d", "ganecdotes_tpu.ops.upfirdn2d_pallas",
    "ganecdotes_tpu.ops.fused_act", "ganecdotes_tpu.ops.interp",
    "ganecdotes_tpu.ops.grid_sample", "ganecdotes_tpu.ops.affine_warp",
    "ganecdotes_tpu.ops.sinkhorn_pallas",
    "ganecdotes_tpu.ops.modulated_conv_pallas",
    "ganecdotes_tpu.ops.subpixel_upconv",
    "ganecdotes_tpu.nn.layers",
    "ganecdotes_tpu.models.stylegan2.generator",
    "ganecdotes_tpu.models.stylegan2.discriminator",
    "ganecdotes_tpu.models.stylegan2.convert",
    "ganecdotes_tpu.models.baggan.convert",
    "ganecdotes_tpu.selfsup.embed", "ganecdotes_tpu.selfsup.augmentor",
    "ganecdotes_tpu.selfsup.heads", "ganecdotes_tpu.selfsup.swav",
    "ganecdotes_tpu.selfsup.simclr", "ganecdotes_tpu.selfsup.kmeans",
    "ganecdotes_tpu.gan.train", "ganecdotes_tpu.gan.losses",
    "ganecdotes_tpu.gan.ada", "ganecdotes_tpu.gan.image_pool",
    "ganecdotes_tpu.pipeline.one_shot_pipeline",
    "ganecdotes_tpu.pipeline.trainer",
    "ganecdotes_tpu.pipeline.schedulers", "ganecdotes_tpu.pipeline.losses",
    "ganecdotes_tpu.parallel.mesh",
    "ganecdotes_tpu.metrics.segmentation",
    "ganecdotes_tpu.configs.mapper",
    "ganecdotes_tpu.utils.util", "ganecdotes_tpu.utils.serialization",
    "ganecdotes_tpu.utils.visualization", "ganecdotes_tpu.utils.fits",
    "ganecdotes_tpu.runtime", "ganecdotes_tpu.runtime.compile_cache",
    "ganecdotes_tpu.gui.labeller", "ganecdotes_tpu.gui.interactive_labeller",
]


def main():
    for name in MODS:
        try:
            m = importlib.import_module(name)
        except Exception as e:  # pragma: no cover - report and continue
            print(f"## {name}\n(import failed: {e})\n")
            continue
        print(f"## {name}")
        for nm, obj in sorted(vars(m).items()):
            if nm.startswith("_"):
                continue
            if getattr(obj, "__module__", None) != name:
                continue
            if not (inspect.isfunction(obj) or inspect.isclass(obj)):
                continue
            try:
                sig = str(inspect.signature(obj))
            except Exception:
                sig = "(...)"
            doc = (inspect.getdoc(obj) or "").split("\n")[0]
            kind = "class" if inspect.isclass(obj) else "def"
            print(f"- `{kind} {nm}{sig}` — {doc}")
        print()


if __name__ == "__main__":
    main()
