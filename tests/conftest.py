"""Test harness: run everything on a virtual 8-device CPU mesh.

Multi-chip sharding tests follow the survey's recommendation
(SURVEY.md §4): all collectives are psum-style, so an
xla_force_host_platform_device_count=8 CPU mesh validates them without TPUs.
"""

import os
import sys

# force CPU regardless of the ambient platform (the shell presets
# JAX_PLATFORMS=axon to reach the real TPU; tests must not depend on it)
os.environ["JAX_PLATFORMS"] = "cpu"
# Drop the axon TPU plugin from the path entirely: even under
# JAX_PLATFORMS=cpu jax initialises discovered plugins, and a wedged
# remote TPU service then hangs every computation (observed live).
sys.path[:] = [p for p in sys.path if ".axon_site" not in p]
os.environ["PYTHONPATH"] = os.pathsep.join(
    p for p in os.environ.get("PYTHONPATH", "").split(os.pathsep)
    if p and ".axon_site" not in p
)
flags = os.environ.get("XLA_FLAGS", "")
if "host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8"
    ).strip()

import jax  # noqa: E402

# The axon sitecustomize registers the TPU plugin and forces
# jax_platforms="axon,cpu" at the *config* level, which outranks the env
# var — override at the same level so tests really run on the CPU mesh.
jax.config.update("jax_platforms", "cpu")
try:
    from jax.extend.backend import clear_backends

    clear_backends()
except Exception:
    pass

jax.config.update("jax_enable_x64", False)
# exact fp32 matmuls so golden-parity tolerances are meaningful
jax.config.update("jax_default_matmul_precision", "highest")
