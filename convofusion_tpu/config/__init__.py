"""Config system (reference: convofusion/config.py).

Same 4-way merge order — base.yaml <- experiment yaml <- all modules/*.yaml
<- assets.yaml — plus dotlist CLI overrides and ``target``/``params`` class
instantiation, so reference experiment YAMLs work unchanged (module targets
are rewritten to ``convofusion_tpu.*`` via TARGET_ALIASES).
"""
from __future__ import annotations

import importlib
import os
from argparse import ArgumentParser

from convofusion_tpu.config.omega import DictConfig, OmegaConf

DEFAULTS_DIR = os.path.join(os.path.dirname(__file__), "defaults")

# reference class paths -> TPU-native equivalents, so unmodified reference
# configs instantiate our modules
TARGET_ALIASES = {
    "convofusion.models.architectures.vae.ConvoFusionVae":
        "convofusion_tpu.models.factory.build_vae",
    "convofusion_tpu.models.vae.ConvoFusionVae":
        "convofusion_tpu.models.factory.build_vae",
    "convofusion.models.architectures.denoiser.Denoiser":
        "convofusion_tpu.models.factory.build_denoiser",
    "convofusion_tpu.models.denoiser.Denoiser":
        "convofusion_tpu.models.factory.build_denoiser",
    "convofusion.models.architectures.t5.T5TextEncoder":
        "convofusion_tpu.models.factory.build_text_encoder",
    "convofusion_tpu.models.t5.T5TextEncoder":
        "convofusion_tpu.models.factory.build_text_encoder",
    "convofusion.models.architectures.audioenc.AudioConvEncoder":
        "convofusion_tpu.models.factory.build_audio_encoder",
    "convofusion_tpu.models.audioenc.AudioConvEncoder":
        "convofusion_tpu.models.factory.build_audio_encoder",
    "diffusers.DDPMScheduler":
        "convofusion_tpu.models.factory.build_scheduler",
    "convofusion_tpu.diffusion.schedulers.DiffusionScheduler":
        "convofusion_tpu.models.factory.build_scheduler",
}


def ablation_flag(cfg, key: str, default: str = "no") -> str:
    """Read a TRAIN.ABLATION string flag, normalizing the YAML-1.1 footgun.

    The flags' most natural spelling is the bare word ``no``, which YAML 1.1
    parses as boolean False; ``str(False)`` is ``"False"``, which silently
    flips `== "no"` gates the wrong way. Map False back to ``"no"`` (and
    True to ``"yes"`` for symmetry) before stringifying.
    """
    try:
        v = cfg.TRAIN.ABLATION.get(key, default)
    except (KeyError, AttributeError):
        v = default
    if v is False:
        return "no"
    if v is True:
        return "yes"
    return str(v)


def get_obj_from_str(string: str):
    string = TARGET_ALIASES.get(string, string)
    module, cls = string.rsplit(".", 1)
    return getattr(importlib.import_module(module), cls)


def instantiate_from_config(config, **extra_kwargs):
    if "target" not in config:
        if config in ("__is_first_stage__", "__is_unconditional__"):
            return None
        raise KeyError("Expected key `target` to instantiate.")
    params = config.get("params", {})
    if isinstance(params, DictConfig):
        params = params.to_container()
    return get_obj_from_str(config["target"])(**params, **extra_kwargs)


def get_module_config(cfg_model, modules_dir: str) -> DictConfig:
    for fname in sorted(os.listdir(modules_dir)):
        if fname.endswith(".yaml"):
            cfg_model.merge_with(
                OmegaConf.load(os.path.join(modules_dir, fname)))
    return cfg_model


def load_config(
    cfg_path: str,
    assets_path: str | None = None,
    modules_dir: str | None = None,
    base_path: str | None = None,
    overrides: list[str] | None = None,
    phase: str = "train",
) -> DictConfig:
    """4-way merge mirroring parse_args (config.py:76-97)."""
    base_path = base_path or os.path.join(DEFAULTS_DIR, "base.yaml")
    assets_path = assets_path or os.path.join(DEFAULTS_DIR, "assets.yaml")
    modules_dir = modules_dir or os.path.join(DEFAULTS_DIR, "modules")

    cfg_exp = OmegaConf.merge(
        OmegaConf.load(base_path), OmegaConf.load(cfg_path))
    cfg_model = get_module_config(cfg_exp.model, modules_dir)
    cfg = OmegaConf.merge(cfg_exp, cfg_model, OmegaConf.load(assets_path))
    if overrides:
        cfg = OmegaConf.merge(cfg, OmegaConf.from_dotlist(overrides))

    if phase == "test":
        cfg.DEBUG = False
        cfg.DEVICE = [0]
    if cfg.get("DEBUG"):
        cfg.NAME = "debug--" + str(cfg.NAME)
        cfg.LOGGER.VAL_EVERY_STEPS = 1
    return cfg


def parse_args(phase: str = "train", argv=None) -> DictConfig:
    parser = ArgumentParser()
    parser.add_argument("--cfg", type=str,
                        default=os.path.join(DEFAULTS_DIR,
                                             "config_cf_beatdnd.yaml"))
    parser.add_argument("--cfg_assets", type=str, default=None)
    parser.add_argument("--batch_size", type=int, default=None)
    parser.add_argument("--nodebug", action="store_true")
    parser.add_argument("--dir", type=str, default=None)
    parser.add_argument("overrides", nargs="*",
                        help="dotlist overrides key=value")
    params = parser.parse_args(argv)

    cfg = load_config(params.cfg, params.cfg_assets,
                      overrides=params.overrides, phase=phase)
    if params.batch_size:
        cfg.TRAIN.BATCH_SIZE = params.batch_size
    if params.nodebug:
        cfg.DEBUG = False
    if params.dir:
        cfg.TEST.TEST_DIR = params.dir
    return cfg
