"""Multi-host (pod) initialization helpers.

On a multi-host TPU pod each host runs the same program (multi-controller
SPMD); ``jax.distributed.initialize`` wires the hosts together and
``jax.devices()`` then spans the whole pod, so ``make_mesh()`` builds a
global mesh and the SMC step shards across it unchanged — particle-axis
collectives ride ICI within a slice and DCN across slices.

This module is a thin, import-safe wrapper: on a single host it is a no-op,
so the same entry script runs everywhere (the reference is single-node only;
README:4 tells users to rewrite the parallelization themselves).
"""
from __future__ import annotations

from typing import Optional

import jax


def initialize_distributed(coordinator_address: Optional[str] = None,
                           num_processes: Optional[int] = None,
                           process_id: Optional[int] = None) -> int:
    """Initialize multi-host JAX if needed; returns the global device count.

    With no arguments, relies on the TPU environment's auto-detection
    (GKE/Cloud TPU metadata); safe to call on a single host (no-op on
    failure).
    """
    try:
        jax.distributed.initialize(coordinator_address=coordinator_address,
                                   num_processes=num_processes,
                                   process_id=process_id)
    except Exception:
        pass  # single-process / already initialized
    return len(jax.devices())


def is_primary_host() -> bool:
    """True on the process that should own host-side IO (artifacts, logs)."""
    return jax.process_index() == 0
