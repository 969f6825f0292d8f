"""Multi-host (pod) initialization helpers.

On a multi-host TPU pod each host runs the same program (multi-controller
SPMD); ``jax.distributed.initialize`` wires the hosts together and
``jax.devices()`` then spans the whole pod, so ``make_mesh()`` builds a
global mesh and the SMC step shards across it unchanged — particle-axis
collectives ride ICI within a slice and DCN across slices.

This module is a thin, import-safe wrapper: on a single host it is a no-op,
so the same entry script runs everywhere (the reference is single-node only;
README:4 tells users to rewrite the parallelization themselves).

Failure semantics (deliberately narrow — a real pod-init failure must NOT
silently degrade to a single-process run that then proceeds sharded
wrong-size):

- no cluster environment detected and no explicit arguments: benign —
  single-process run (jax raises ``ValueError('coordinator_address should
  be defined.')`` from auto-detection);
- ``initialize`` already called in this process: benign — idempotent
  (jax raises ``RuntimeError('...should only be called once.')``);
- anything else (bad coordinator address, port clash, barrier timeout,
  malformed explicit arguments): **raised** to the caller.
"""
from __future__ import annotations

from typing import Optional

import jax

_AUTODETECT_MISS = "coordinator_address should be defined"
_ALREADY_INIT = "should only be called once"


def initialize_distributed(coordinator_address: Optional[str] = None,
                           num_processes: Optional[int] = None,
                           process_id: Optional[int] = None) -> int:
    """Initialize multi-host JAX if needed; returns the global device count.

    With no arguments, relies on the TPU environment's auto-detection
    (GKE/Cloud TPU metadata); if no cluster environment is present this is
    a single-host no-op. With explicit arguments, ANY failure raises — the
    caller asked for a pod and must not get a silent single-process run.
    """
    explicit = (coordinator_address is not None
                or num_processes is not None or process_id is not None)
    try:
        jax.distributed.initialize(coordinator_address=coordinator_address,
                                   num_processes=num_processes,
                                   process_id=process_id)
    except RuntimeError as e:
        if _ALREADY_INIT in str(e):
            pass  # idempotent re-call
        else:
            raise  # real init failure (coordinator unreachable, ...)
    except ValueError as e:
        if not explicit and _AUTODETECT_MISS in str(e):
            pass  # no cluster env: plain single-process run
        else:
            raise  # malformed explicit args / partial autodetection
    return len(jax.devices())


def is_primary_host() -> bool:
    """True on the process that should own host-side IO (artifacts, logs)."""
    return jax.process_index() == 0
