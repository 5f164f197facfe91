"""Test environment: CPU backend with 8 virtual devices.

Must set env vars before jax is imported anywhere (task requirement: test
multi-chip sharding on a virtual CPU mesh; the same code path runs on TPU).
"""

import os

# Hard-set (the ambient environment pins JAX_PLATFORMS to the TPU tunnel and
# a sitecustomize imports jax at interpreter startup; tests always run on the
# virtual CPU mesh).  XLA_FLAGS is read at CPU-backend init, which hasn't
# happened yet; the platform choice must go through jax.config because jax is
# already imported.
os.environ["JAX_PLATFORMS"] = "cpu"
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8").strip()

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_default_matmul_precision", "highest")

from summersph_tpu.utils.cache import enable_compile_cache  # noqa: E402

enable_compile_cache()
# Double precision for validation math (engine defaults to f32; tests that
# pass float64 inputs get float64 compute on CPU).
jax.config.update("jax_enable_x64", True)
