"""Checkpoint IO: flat-key .npz serialization for arbitrary param pytrees.

TPU-native counterpart of the reference's torch.save whole-module pickles
(swav_clustering.py:503-505, base_model.py:153-223): pytrees are flattened to
path-keyed arrays, so files are portable, inspectable, and framework-free.
"""

import jax
import jax.numpy as jnp
import numpy as np


def _flatten(tree):
    flat = {}

    def rec(node, path):
        if isinstance(node, dict):
            for k in sorted(node):
                rec(node[k], f"{path}/{k}" if path else str(k))
        elif isinstance(node, (list, tuple)):
            flat[f"__len__{path}"] = np.asarray(
                [len(node), int(isinstance(node, tuple))]
            )
            for i, v in enumerate(node):
                rec(v, f"{path}#{i}")
        else:
            arr = np.asarray(node)
            # numpy has no bfloat16: store the raw bits as uint16 with a
            # dtype marker (a plain astype-to-void write would be unreadable)
            if arr.dtype == jnp.bfloat16:
                flat[f"__bf16__leaf:{path}"] = np.asarray([1])
                arr = arr.view(np.uint16)
            flat[f"leaf:{path}"] = arr

    rec(tree, "")
    return flat


def save_pytree(path, tree):
    np.savez_compressed(path, **_flatten(tree))


# ---------------------------------------------------------------------------
# orbax backend — multi-host / sharded checkpoints
# ---------------------------------------------------------------------------
#
# The .npz format above is the portable single-file default. For multi-chip /
# multi-host runs (params sharded over a Mesh), orbax writes each shard from
# its owning host and restores with the target sharding — the TPU-native
# equivalent of the reference's torch.save state_dicts (SURVEY.md §5
# checkpoint/resume). Directory-per-step layout, async-safe, atomic.


def save_pytree_orbax(path, tree):
    """Save a pytree (possibly sharded jax.Arrays) to an orbax directory."""
    import orbax.checkpoint as ocp

    with ocp.StandardCheckpointer() as ckptr:
        ckptr.save(_abs(path), tree, force=True)


def load_pytree_orbax(path, like=None):
    """Restore from an orbax directory.

    ``like``: optional pytree of jax.ShapeDtypeStruct / arrays carrying the
    target shardings, so a checkpoint written on one mesh restores onto
    another (e.g. single-chip eval of a multi-chip training run)."""
    import orbax.checkpoint as ocp

    with ocp.StandardCheckpointer() as ckptr:
        if like is not None:
            like = jax.tree.map(
                lambda x: x
                if isinstance(x, jax.ShapeDtypeStruct)
                else jax.ShapeDtypeStruct(
                    jnp.shape(x), jnp.result_type(x),
                    sharding=getattr(x, "sharding", None),
                ),
                like,
            )
            return ckptr.restore(_abs(path), target=like)
        return ckptr.restore(_abs(path))


def _abs(path):
    import os

    return os.path.abspath(str(path))


def load_pytree(path):
    data = dict(np.load(path, allow_pickle=False))

    def rec(path_):
        len_key = f"__len__{path_}"
        leaf_key = f"leaf:{path_}"
        if leaf_key in data:
            arr = data[leaf_key]
            if f"__bf16__{leaf_key}" in data:
                arr = arr.view(jnp.bfloat16)
            return jnp.asarray(arr)
        if len_key in data:
            n, is_tuple = int(data[len_key][0]), bool(data[len_key][1])
            items = [rec(f"{path_}#{i}") for i in range(n)]
            return tuple(items) if is_tuple else items
        # dict: collect child keys one level down
        prefix = f"{path_}/" if path_ else ""
        children = set()
        for k in data:
            if k.startswith("__bf16__"):
                continue
            body = k.split(":", 1)[1] if k.startswith("leaf:") else k[len("__len__"):]
            if body.startswith(prefix) and len(body) > len(prefix):
                rest = body[len(prefix):]
                name = rest.split("/")[0].split("#")[0]
                children.add(name)
        if not children:
            raise KeyError(f"no entries under '{path_}' in {path}")
        return {c: rec(f"{prefix}{c}") for c in children}

    return rec("")
