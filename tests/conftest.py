"""Test harness: force a virtual 8-device CPU platform so sharding /
collective paths are exercised without multi-chip TPU hardware
(jax docs pattern: --xla_force_host_platform_device_count).

Note: this environment's sitecustomize registers a TPU PJRT plugin at
interpreter startup, so env vars alone are too late; we also flip
``jax_platforms`` after import (the CPU client is created lazily, so the
XLA flag still takes effect).
"""
import os

flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8").strip()

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_threefry_partitionable", True)
