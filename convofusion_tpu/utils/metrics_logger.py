"""Experiment metric logging.

Reference: WandB + TensorBoard loggers (train.py:64-82) with epoch-end
log_dict (base.py:45-67).  This environment has neither service, so the
primary sink is an append-only JSONL metrics file per experiment (easily
plotted/joined); WandB and TensorBoard attach automatically when their
packages import.
"""
from __future__ import annotations

import json
import os
import time
from typing import Dict, Optional


def loss2logname(loss: str, split: str) -> str:
    """Reference metric naming (losses/diffvae.py:223-229)."""
    if loss == "total":
        return f"{loss}/{split}"
    loss_type, name = loss.split("_", 1)
    return f"{loss_type}/{name}/{split}"


def aggregate_terms(term_dicts, split: str) -> Dict[str, float]:
    """Mean every loss term over an epoch, skipping NaN steps like the
    reference's epoch-end collection (base.py:54-55: ``if not
    torch.isnan(value)``)."""
    import numpy as np

    if not term_dicts:
        return {}
    keys = term_dicts[0].keys()
    out = {}
    for k in keys:
        vals = np.asarray([float(d[k]) for d in term_dicts])
        finite = vals[np.isfinite(vals)]
        out[loss2logname(k, split)] = float(
            finite.mean() if finite.size else float("nan"))
    return out


class MetricsLogger:
    def __init__(self, exp_dir: str, name: str = "metrics",
                 enable_wandb: bool = False, wandb_project=None,
                 wandb_resume_id=None):
        os.makedirs(exp_dir, exist_ok=True)
        self.path = os.path.join(exp_dir, f"{name}.jsonl")
        self._wandb = None
        if enable_wandb:
            try:
                import wandb

                self._wandb = wandb.init(
                    project=wandb_project, dir=exp_dir,
                    resume="allow", id=wandb_resume_id)
            except Exception:
                self._wandb = None
        self._tb = None
        try:
            from torch.utils.tensorboard import SummaryWriter

            self._tb = SummaryWriter(os.path.join(exp_dir, "tb"))
        except Exception:
            self._tb = None

    def log(self, metrics: Dict[str, float], step: Optional[int] = None):
        row = {"ts": time.time(), "step": step,
               **{k: float(v) for k, v in metrics.items()}}
        with open(self.path, "a") as f:
            f.write(json.dumps(row) + "\n")
        if self._wandb is not None:
            self._wandb.log(metrics, step=step)
        if self._tb is not None:
            for k, v in metrics.items():
                self._tb.add_scalar(k, float(v), step)

    def close(self):
        if self._wandb is not None:
            self._wandb.finish()
        if self._tb is not None:
            self._tb.close()
