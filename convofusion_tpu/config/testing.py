"""Tiny configs for smoke tests / fast iteration (the reference's DEBUG
mode analogue, config.py:100-104)."""
from __future__ import annotations

import os

from convofusion_tpu.config import DEFAULTS_DIR, load_config


def tiny_config(stage: str = "diffusion", latent_dim: int = 32,
                text_dim: int = 64, num_layers: int = 3,
                text_pad_len: int = 16):
    """Small-dimension config with the production topology."""
    cfg_file = ("config_cf_beatdnd.yaml" if stage != "vae"
                else "config_vae_beatdnd.yaml")
    cfg = load_config(os.path.join(DEFAULTS_DIR, cfg_file))
    cfg.TRAIN.STAGE = stage
    cfg.DEBUG = False
    cfg.model.latent_dim = [1, latent_dim]
    cfg.DATASET.NFEATS = 189
    cfg.DATASET.NJOINTS = 63
    cfg.model.motion_vae.params.num_layers = num_layers
    cfg.model.motion_vae.params.ff_size = 64
    cfg.model.motion_vae.params.dropout = 0.0
    cfg.model.denoiser.params.num_layers = num_layers
    cfg.model.denoiser.params.ff_size = 64
    cfg.model.denoiser.params.dropout = 0.0
    cfg.model.denoiser.params.text_encoded_dim = text_dim
    cfg.model.denoiser.params.audio_encoded_dim = text_dim
    cfg.model.text_encoder.params.latent_dim = text_dim
    cfg.model.audio_encoder.params.latent_dim = text_dim
    for k, v in dict(d_model=32, d_ff=64, num_layers=2, num_heads=4,
                     d_kv=8, vocab_size=1000).items():
        cfg.model.text_encoder.params[k] = v
    cfg.TPU.TEXT_PAD_LEN = text_pad_len
    return cfg
