"""Metric logging: JSONL stream always, WandB when available and requested.

Role parity with the reference's WandbLogger + per-step log_dict calls
(config.yaml:24-28; tricolo_net.py:70,76,94-97). The JSONL file is the
source of truth (works in air-gapped environments); WandB attaches
opportunistically when the package is importable and backend != "jsonl".
"""

from __future__ import annotations

import json
import os
import time
from typing import Mapping


class MetricsLogger:
    def __init__(self, cfg):
        log_cfg = cfg.logger
        self.save_dir = log_cfg.save_dir
        os.makedirs(self.save_dir, exist_ok=True)
        self._file = open(os.path.join(self.save_dir, "metrics.jsonl"), "a")
        self._wandb = None
        backend = log_cfg.get("backend", "auto")
        if backend in ("auto", "wandb"):
            try:
                import wandb

                self._wandb = wandb.init(
                    project=log_cfg.project,
                    name=log_cfg.name,
                    dir=self.save_dir,
                    config=cfg.to_dict(),
                )
            except Exception:
                if backend == "wandb":
                    raise
                self._wandb = None

    def log(self, metrics: Mapping[str, float], step: int, epoch: int | None = None):
        row = {"step": int(step), "time": time.time()}
        if epoch is not None:
            row["epoch"] = int(epoch)
        row.update({k: float(v) for k, v in metrics.items()})
        self._file.write(json.dumps(row) + "\n")
        self._file.flush()
        if self._wandb is not None:
            self._wandb.log(dict(metrics), step=step)

    def close(self):
        self._file.close()
        if self._wandb is not None:
            self._wandb.finish()
