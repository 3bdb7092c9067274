"""Config system tests: merge order, interpolation, instantiation — and the
reference's own YAML files loading unchanged."""
import os

from convofusion_tpu.config import (
    DEFAULTS_DIR,
    instantiate_from_config,
    load_config,
)
from convofusion_tpu.config.omega import OmegaConf


def test_merge_and_interpolation():
    a = OmegaConf.create({"model": {"latent_dim": [1, 128]}, "x": 1})
    b = OmegaConf.create(
        {"mod": {"params": {"latent_dim": "${model.latent_dim}"}}, "x": 2})
    cfg = OmegaConf.merge(a, b)
    assert cfg.x == 2
    assert cfg.mod.params.latent_dim == [1, 128]


def test_dotlist_overrides():
    cfg = OmegaConf.merge(
        OmegaConf.create({"TRAIN": {"BATCH_SIZE": 4}}),
        OmegaConf.from_dotlist(["TRAIN.BATCH_SIZE=16", "NEW.KEY=hello"]),
    )
    assert cfg.TRAIN.BATCH_SIZE == 16
    assert cfg.NEW.KEY == "hello"


def test_load_default_diffusion_config_and_instantiate():
    cfg = load_config(
        os.path.join(DEFAULTS_DIR, "config_cf_beatdnd.yaml"))
    assert cfg.TRAIN.STAGE == "diffusion"
    assert cfg.model.latent_dim == [1, 128]
    assert cfg.model.denoiser.params.latent_dim == [1, 128]

    den = instantiate_from_config(cfg.model.denoiser)
    assert den.num_layers == 9
    assert den.text_encoded_dim == 512

    vae = instantiate_from_config(cfg.model.motion_vae)
    assert vae.num_layers == 5 and vae.latent_dim == 128

    sched = instantiate_from_config(cfg.model.scheduler)
    assert sched.num_train_timesteps == 1000
    assert sched.clip_sample


def test_reference_yamls_load_unchanged(reference_path):
    """The reference's own configs must drive this framework."""
    ref_cfg_dir = os.path.join(reference_path, "configs")
    cfg = load_config(
        os.path.join(ref_cfg_dir, "config_cf_beatdnd.yaml"),
        assets_path=os.path.join(ref_cfg_dir, "assets.yaml"),
        modules_dir=os.path.join(ref_cfg_dir, "modules"),
        base_path=os.path.join(ref_cfg_dir, "base.yaml"),
    )
    assert cfg.model.guidance_scale == 7.5
    assert cfg.model.denoiser.params.num_layers == 9
    # NFEATS/NJOINTS are injected at runtime by the data layer
    # (reference get_data.py:71-72) before instantiation
    cfg.DATASET.NFEATS = 189
    cfg.DATASET.NJOINTS = 63
    # targets are reference class paths; aliases route to our factories
    den = instantiate_from_config(cfg.model.denoiser)
    assert den.num_layers == 9
    sched = instantiate_from_config(cfg.model.scheduler)
    assert sched.beta_schedule == "scaled_linear"
