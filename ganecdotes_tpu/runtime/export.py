"""AOT serving export: serialize the fused generate→embed→segment program.

A deployment story the reference lacks entirely — its serving path is a
Python loop at ``MAX_TEST_BATCH = 1`` re-dispatching eager torch ops per
image (``/root/reference/src/one_shot_pipeline.py:30,615-668``). Here the
whole trained pipeline (generator synthesis + SSL projection + segmentor
head, already fused into ONE jitted program by
``OneShotPipeline._make_infer_fn``) is exported with :mod:`jax.export` to a
single versioned artifact:

* **self-contained** — the trained weights are closure constants, baked
  into the StableHLO, so the serving host needs the artifact + jax only
  (no framework code, no checkpoints, no Python model definitions);
* **no retrace** — deserialization skips tracing/lowering; only XLA's
  backend compile runs on the serving host (and that hits the persistent
  compile cache);
* **cross-platform** — ``platforms=("tpu", "cpu")`` lowers once for both,
  so a CPU CI host can produce TPU serving artifacts;
* **forward-compatible** — jax.export's serialization carries StableHLO
  version metadata and enforces its compatibility window on load.

Artifact format (``.ganex``): a zip with ``program.bin`` (the serialized
``jax.export.Exported``) and ``meta.json`` (method, batch/latent shapes,
output tree structure, jax version) — the metadata a serving fleet needs
for routing without deserializing the program.
"""

import json
import zipfile

import jax
import jax.numpy as jnp
from jax import export as jax_export

_FORMAT_VERSION = 1


def export_fn(fn, example_args, path, platforms=None, meta=None):
    """Export jitted ``fn`` at ``example_args``'s shapes to ``path``.

    ``example_args`` is a tuple of arrays or ShapeDtypeStructs (a pytree per
    argument). Returns the metadata dict written alongside the program.
    """
    specs = jax.tree.map(
        lambda a: jax.ShapeDtypeStruct(jnp.shape(a), a.dtype), example_args
    )
    exported = jax_export.export(
        jax.jit(fn), platforms=tuple(platforms) if platforms else None
    )(*specs)
    payload = bytes(exported.serialize())

    out_meta = {
        "format_version": _FORMAT_VERSION,
        "jax_version": jax.__version__,
        "platforms": list(exported.platforms),
        "in_shapes": [list(s.shape) for s in jax.tree.leaves(specs)],
        "in_dtypes": [str(s.dtype) for s in jax.tree.leaves(specs)],
        "out_shapes": [list(s.shape) for s in exported.out_avals],
        "out_dtypes": [str(s.dtype) for s in exported.out_avals],
    }
    out_meta.update(meta or {})

    with zipfile.ZipFile(path, "w", zipfile.ZIP_DEFLATED) as z:
        z.writestr("meta.json", json.dumps(out_meta, indent=1))
        z.writestr("program.bin", payload)
    return out_meta


def load_exported(path):
    """Load a ``.ganex`` artifact → (jitted callable, metadata dict).

    The callable takes the exported function's original arguments and runs
    the deserialized program — no framework model code involved.
    """
    with zipfile.ZipFile(path, "r") as z:
        meta = json.loads(z.read("meta.json"))
        if meta.get("format_version", 0) > _FORMAT_VERSION:
            raise ValueError(
                f"artifact {path} has format_version "
                f"{meta['format_version']} > supported {_FORMAT_VERSION}"
            )
        exported = jax_export.deserialize(bytearray(z.read("program.bin")))
    return jax.jit(exported.call), meta


def export_serving(pipeline, path, batch=None, platforms=("tpu", "cpu")):
    """Export a trained ``OneShotPipeline``'s serving program.

    The exported function maps ``latents (batch, latent_dim)`` → the
    pipeline's infer outputs (image, labels[, cluster map]); the trained
    generator + segmentor weights are baked in as constants. ``batch``
    defaults to the pipeline's test batch. Call after ``run_pipeline()``
    (or after loading trained artifacts) so the weights are final.

    ``platforms`` defaults to ``("tpu", "cpu")`` — a serving artifact built
    on a CPU CI host must run on TPU serving hosts and vice versa;
    jax.export refuses to run an artifact on a platform it wasn't lowered
    for, so single-platform exports are an explicit opt-in.
    """
    from ganecdotes_tpu.pipeline.one_shot_pipeline import MAX_TEST_BATCH

    infer = pipeline._make_infer_fn()
    gen_params = pipeline.model.params
    seg_params = pipeline.segmentor_params
    if batch is None:
        batch = MAX_TEST_BATCH
    latent_dim = int(pipeline.model.meta["style_dim"])

    def serve(latents):
        return infer(gen_params, seg_params, latents)

    example = (jax.ShapeDtypeStruct((batch, latent_dim), jnp.float32),)
    return export_fn(
        serve,
        example,
        path,
        platforms=platforms,
        meta={
            "kind": "one_shot_serving",
            "segmentor": pipeline.seg_str,
            "batch": int(batch),
            "latent_dim": latent_dim,
            "classes": list(getattr(pipeline.model_config, "classes", [])),
        },
    )
