"""Test harness: run everything on a virtual 8-device CPU platform so that
sharding/collective paths are exercised without TPU hardware
(jax docs pattern: --xla_force_host_platform_device_count)."""
import os

os.environ["JAX_PLATFORMS"] = "cpu"
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8").strip()

import jax  # noqa: E402

jax.config.update("jax_threefry_partitionable", True)
