"""Persistent XLA compilation cache.

The flagship methanation step program (8-chunk lanes-major BDF march under
an MH while_loop) takes minutes to compile on TPU; the compiled executable
is deterministic for a given config, so a disk cache turns every repeat
CLI run from ~7 min into ~2 min wall. The reference has no analog — its
"compile" is numba JIT, re-done per process (methanation_set_likelihood.py:44).

Opt-out with SMC_TPU_CACHE=0; override the location with SMC_TPU_CACHE=<dir>.
Enabled by the CLI entry point, NOT at package import (importing smc_tpu
must stay free of device/config side effects — driver contract).
"""
from __future__ import annotations

import os


def enable_persistent_cache(path: str | None = None) -> str | None:
    """Point JAX's compilation cache at a durable directory.

    Returns the cache dir in use, or None if disabled (SMC_TPU_CACHE=0 or
    an unwritable location).
    """
    env = os.environ.get("SMC_TPU_CACHE")
    if env == "0":
        return None
    cache = path or env or os.path.join(
        os.path.expanduser("~"), ".cache", "smc_tpu", "xla")
    try:
        os.makedirs(cache, exist_ok=True)
        import jax
        jax.config.update("jax_compilation_cache_dir", cache)
        # Cache every compile that took >1s (default 60s skips mid-size
        # programs like the per-chunk DAE march).
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
    except (OSError, AttributeError):
        return None
    return cache
