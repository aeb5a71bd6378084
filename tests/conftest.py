"""Test harness: run everything on a virtual 8-device CPU mesh.

Multi-chip sharding tests follow the survey's recommendation
(SURVEY.md §4): all collectives are psum-style, so an
xla_force_host_platform_device_count=8 CPU mesh validates them without TPUs.
"""

import os

# force CPU regardless of the ambient platform (the shell presets
# JAX_PLATFORMS=axon to reach the real TPU; tests must not depend on it)
os.environ["JAX_PLATFORMS"] = "cpu"
flags = os.environ.get("XLA_FLAGS", "")
if "host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8"
    ).strip()

import jax  # noqa: E402

jax.config.update("jax_enable_x64", False)
# exact fp32 matmuls so golden-parity tolerances are meaningful
jax.config.update("jax_default_matmul_precision", "highest")
