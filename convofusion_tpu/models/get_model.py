"""Model-type dispatch facade (reference: convofusion/models/get_model.py)."""
from __future__ import annotations

from convofusion_tpu.models.convofusion import Convofusion


def get_model(cfg, datamodule=None, phase: str = "train"):
    modeltype = str(cfg.model.model_type)
    if modeltype == "convofusion":
        model = Convofusion(cfg)
        model.datamodule = datamodule
        return model
    raise ValueError(f"Invalid model type {modeltype}.")
