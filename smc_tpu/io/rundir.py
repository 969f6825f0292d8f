"""Run-directory management and config archival.

Rebuilds C24 (SMC_methanation_main.py:35-44: timestamped run dir with
pred/, tubular_Histgram_Progress/, parityplot_boxplot/, parityplot_mean/
subtrees; SMC_methanation.py:67-70: copies the config .py into
Initdata_<ts>.txt). Here the config archive is a JSON snapshot of the
SMCConfig + model metadata instead of a source-file copy."""
from __future__ import annotations

import dataclasses
import datetime
import json
import os
from typing import Optional


class RunDir:
    SUBDIRS = ("pred", "hist_progress", "parity_box", "parity_mean",
               "checkpoints")

    def __init__(self, root: str = "runs", tag: Optional[str] = None,
                 timestamp: Optional[str] = None):
        ts = timestamp or datetime.datetime.now().strftime("%Y%m%d_%H%M%S")
        name = f"{ts}_{tag}" if tag else ts
        self.path = os.path.join(root, name)
        os.makedirs(self.path, exist_ok=True)
        for s in self.SUBDIRS:
            os.makedirs(os.path.join(self.path, s), exist_ok=True)

    def sub(self, name: str) -> str:
        return os.path.join(self.path, name)

    def file(self, *parts: str) -> str:
        return os.path.join(self.path, *parts)

    def archive_config(self, cfg, model=None, extra: Optional[dict] = None):
        """JSON config snapshot (the reference's Initdata_<ts>.txt)."""
        doc = {"config": dataclasses.asdict(cfg)}
        doc["config"]["dtype"] = str(doc["config"].get("dtype"))
        if model is not None:
            doc["model"] = {
                "class": type(model).__name__,
                "param_names": list(getattr(model, "param_names", ())),
            }
        if extra:
            doc["extra"] = extra
        with open(self.file("config.json"), "w") as f:
            json.dump(doc, f, indent=2, default=str)
