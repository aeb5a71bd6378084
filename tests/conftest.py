"""Test harness: run everything on a virtual 8-device CPU mesh.

Multi-chip sharding tests follow the survey's recommendation
(SURVEY.md §4): all collectives are psum-style, so an
xla_force_host_platform_device_count=8 CPU mesh validates them without TPUs.
"""

import os

os.environ.setdefault("JAX_PLATFORMS", "cpu")
flags = os.environ.get("XLA_FLAGS", "")
if "host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8"
    ).strip()

import jax  # noqa: E402

jax.config.update("jax_enable_x64", False)
