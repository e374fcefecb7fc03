"""Checkpoint management for training runs.

Capability parity with /root/reference/extraction/checkpoints.py (save/load
keyed by output dims, latest/best tracking) using Orbax under the hood, and
with the Tensorpack ModelSaver flow of the AEC trainers
(minutiae_AEC.py:775-790): periodic saves + restore-latest.
"""
from __future__ import annotations

import json
import os
import shutil
from typing import Any, Optional


class CheckpointManager:
    def __init__(self, directory: str, keep: int = 3):
        self.directory = os.path.abspath(directory)
        self.keep = keep
        os.makedirs(self.directory, exist_ok=True)
        self._meta_path = os.path.join(self.directory, "meta.json")

    def _meta(self) -> dict:
        if os.path.exists(self._meta_path):
            with open(self._meta_path) as f:
                return json.load(f)
        return {"steps": [], "best": None, "best_metric": None}

    def _write_meta(self, meta: dict) -> None:
        with open(self._meta_path, "w") as f:
            json.dump(meta, f)

    def save(self, step: int, variables: Any,
             metric: Optional[float] = None) -> str:
        import orbax.checkpoint as ocp
        path = os.path.join(self.directory, f"step_{step:08d}")
        ckptr = ocp.StandardCheckpointer()
        ckptr.save(path, variables, force=True)
        ckptr.wait_until_finished()
        meta = self._meta()
        meta["steps"].append(step)
        if metric is not None and (meta["best_metric"] is None
                                   or metric < meta["best_metric"]):
            meta["best"] = step
            meta["best_metric"] = metric
        # prune old checkpoints (keep best + last `keep`)
        keepers = set(meta["steps"][-self.keep:])
        if meta["best"] is not None:
            keepers.add(meta["best"])
        for s in list(meta["steps"]):
            if s not in keepers:
                p = os.path.join(self.directory, f"step_{s:08d}")
                shutil.rmtree(p, ignore_errors=True)
                meta["steps"].remove(s)
        self._write_meta(meta)
        return path

    def latest_step(self) -> Optional[int]:
        meta = self._meta()
        return meta["steps"][-1] if meta["steps"] else None

    def restore(self, target: Any, step: Optional[int] = None) -> Any:
        import orbax.checkpoint as ocp
        step = step if step is not None else self.latest_step()
        if step is None:
            return target
        path = os.path.join(self.directory, f"step_{step:08d}")
        return ocp.StandardCheckpointer().restore(path, target)

    def restore_best(self, target: Any) -> Any:
        meta = self._meta()
        if meta["best"] is None:
            return self.restore(target)
        return self.restore(target, meta["best"])
