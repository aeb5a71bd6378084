"""SPMD mesh helpers — data-parallel scaling over ICI.

The reference's only distributed machinery is an (unused) DataParallel/DDP
wrap and one guarded all_reduce (models/baggan/gan_util.py:154-160,
lib/gan/ada.py:15-25). The TPU-native equivalents (per SURVEY.md §2's
parallelism inventory):

* batched generate+segment inference: batch sharded over the mesh's 'data'
  axis with replicated params — XLA partitions the whole jitted program,
  collectives ride ICI;
* SSL/GAN training: replicated-parameter SPMD; gradient reduction is the
  psum XLA inserts when the loss averages over the sharded batch axis.

These helpers centralize mesh construction so every entry point (pipeline,
bench, dryrun) shards the same way.
"""

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P


def distributed_init(coordinator_address=None, num_processes=None,
                     process_id=None):
    """Initialize multi-host JAX (TPU pod slices / multi-process CPU).

    The TPU-native replacement for the reference's
    ``torch.distributed.init_process_group`` path implied by its DDP branch
    (models/baggan/gan_util.py:154-160) and ``local_rank`` config stub.
    On Cloud TPU pods all three arguments are auto-detected from the
    environment; pass them explicitly for other launchers. Safe to call
    when already initialized (no-op) or on a single process with no
    coordinator configured (returns False).

    After this, ``jax.devices()`` spans every host's chips, so ``make_mesh``
    builds a global mesh: DCN links processes, ICI links chips within a
    host — shardings over the 'data' axis keep the heavy collectives on ICI.

    MUST run before any other JAX call: even ``jax.process_count()`` or
    ``jax.devices()`` initializes the XLA backend, after which
    ``jax.distributed.initialize`` refuses to run (verified live — an
    earlier version of this helper guarded on process_count() and thereby
    could never initialize anything).
    """
    kw = {}
    if coordinator_address is not None:
        kw["coordinator_address"] = coordinator_address
    if num_processes is not None:
        kw["num_processes"] = int(num_processes)
    if process_id is not None:
        kw["process_id"] = int(process_id)
    try:
        jax.distributed.initialize(**kw)
        return True
    except ValueError:
        # no coordinator configured/detectable: single-process run
        return False
    except RuntimeError as e:
        msg = str(e)
        if "once" in msg or "already" in msg:
            return True  # a prior distributed_init already brought it up
        # backend already initialized — a silent False here would let a
        # "multi-host" job run as unsynchronized single hosts
        raise RuntimeError(
            "distributed_init must be the first JAX call in the process "
            "(the XLA backend is already initialized)"
        ) from e


def make_mesh(n_devices=None, axis="data"):
    devices = jax.devices()
    if n_devices is not None:
        if n_devices > len(devices):
            raise ValueError(
                f"make_mesh: {n_devices} devices requested but only "
                f"{len(devices)} available — silently truncating would "
                "report a multi-chip validation that never ran"
            )
        devices = devices[:n_devices]
    return Mesh(np.asarray(devices), (axis,))


def batch_shardings(mesh, axis="data"):
    """(replicated, batch-sharded) NamedSharding pair for jit annotations.

    The one recipe every data-parallel call site uses: params/opt-state/RNG
    replicated, leading batch axis split over ``axis``."""
    return NamedSharding(mesh, P()), NamedSharding(mesh, P(axis))


def shard_batch(mesh, x, axis="data"):
    """Place a batched array with its leading dim split over the mesh."""
    return jax.device_put(x, NamedSharding(mesh, P(axis)))


def replicate(mesh, tree):
    """Replicate a param pytree across the mesh."""
    sharding = NamedSharding(mesh, P())
    return jax.device_put(tree, sharding)


def data_parallel_infer(mesh, infer_fn, params_tree, latents, axis="data"):
    """Run a jitted (params, latents)->outputs program data-parallel.

    The batch must be a multiple of the mesh size; params are replicated,
    the batch is split along the leading axis, outputs come back sharded.
    """
    params_tree = replicate(mesh, params_tree)
    latents = shard_batch(mesh, latents, axis)
    fn = jax.jit(
        infer_fn,
        in_shardings=(
            jax.tree.map(lambda _: NamedSharding(mesh, P()), params_tree),
            NamedSharding(mesh, P(axis)),
        ),
        out_shardings=NamedSharding(mesh, P(axis)),
    )
    return fn(params_tree, latents)
