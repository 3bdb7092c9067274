"""Experiment folder + logging setup.

Reference: convofusion/utils/logger.py:10-71 (per-experiment folder under
FOLDER/<model_type>/<NAME>, config snapshot, file+console logging).
"""
from __future__ import annotations

import logging
import time
from pathlib import Path


def create_logger(cfg, phase: str = "train"):
    root_dir = Path(cfg.FOLDER) / str(cfg.model.model_type) / str(cfg.NAME)
    root_dir.mkdir(parents=True, exist_ok=True)
    cfg.TIME = time.strftime("%Y-%m-%d-%H-%M-%S")
    cfg.FOLDER_EXP = str(root_dir)

    # config snapshot
    from convofusion_tpu.config.omega import OmegaConf

    OmegaConf.save(cfg, root_dir / f"config_{phase}_{cfg.TIME}.yaml")

    logger = logging.getLogger("convofusion_tpu")
    logger.setLevel(logging.INFO)
    logger.handlers.clear()
    fmt = logging.Formatter("%(asctime)s %(levelname)s %(message)s")
    fh = logging.FileHandler(root_dir / f"{phase}_{cfg.TIME}.log")
    fh.setFormatter(fmt)
    sh = logging.StreamHandler()
    sh.setFormatter(fmt)
    logger.addHandler(fh)
    logger.addHandler(sh)
    logger.propagate = False
    return logger
