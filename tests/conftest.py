"""Test configuration: run everything on a virtual 8-device CPU mesh.

Multi-chip TPU hardware is not available in CI; sharding logic is validated
against XLA's host-platform device virtualization instead (the same GSPMD
partitioner runs either way).
"""
import os

os.environ["JAX_PLATFORMS"] = "cpu"
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8"
    ).strip()

import jax  # noqa: E402

# The axon sitecustomize pins jax_platforms; override it for tests.
jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_default_matmul_precision", "highest")
# The sitecustomize also enables the persistent compilation cache;
# serializing XLA:CPU executables for Pallas custom-vjp programs segfaults
# on this host (machine-feature mismatch in the AOT path) — keep the cache
# TPU-only.
try:
    jax.config.update("jax_enable_compilation_cache", False)
except Exception:  # noqa: BLE001 — older jax without the flag
    pass
