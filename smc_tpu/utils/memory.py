"""Device-memory reporting.

The reference polls host RAM with psutil and restarts its Ray pool above
80% (methanation_functions.py:73-78). On TPU there are no worker processes
to restart; the analog is HBM telemetry for sizing particle counts and
chunk sizes.
"""
from __future__ import annotations

from typing import List, Optional

import jax


def device_memory_report() -> List[dict]:
    """Per-device memory stats (bytes); fields depend on the backend.

    Returns [] when the platform exposes no memory_stats (e.g. CPU).
    """
    out = []
    for d in jax.local_devices():
        try:
            stats = d.memory_stats() or {}
        except Exception:
            stats = {}
        if stats:
            out.append({"device": str(d), **stats})
    return out


def hbm_utilization() -> Optional[float]:
    """Max bytes_in_use / bytes_limit across devices, or None if unknown."""
    worst = None
    for rec in device_memory_report():
        used = rec.get("bytes_in_use")
        lim = rec.get("bytes_limit") or rec.get("bytes_reservable_limit")
        if used is not None and lim:
            frac = used / lim
            worst = frac if worst is None else max(worst, frac)
    return worst
