"""Import FIRST in ad-hoc scripts to force CPU (mirrors tests/conftest.py)."""
import os, sys
os.environ["JAX_PLATFORMS"] = "cpu"
sys.path[:] = [p for p in sys.path if ".axon_site" not in p]
os.environ["PYTHONPATH"] = os.pathsep.join(
    p for p in os.environ.get("PYTHONPATH", "").split(os.pathsep)
    if p and ".axon_site" not in p)
flags = os.environ.get("XLA_FLAGS", "")
if "host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (flags + " --xla_force_host_platform_device_count=8").strip()
import jax
jax.config.update("jax_platforms", "cpu")
try:
    from jax.extend.backend import clear_backends
    clear_backends()
except Exception:
    pass
jax.config.update("jax_default_matmul_precision", "highest")
