"""CLI end-to-end: train both stages on on-disk fixtures, transplant the
stage-1 VAE into stage-2, then generate + dump the result layout."""
import os

import numpy as np
import pytest

pytestmark = pytest.mark.slow  # compile/oracle heavy (see pyproject addopts)
import yaml

from convofusion_tpu.config import DEFAULTS_DIR
from convofusion_tpu.data.fixture import make_beat_fixture, make_dnd_fixture


@pytest.fixture(scope="module")
def workdir(tmp_path_factory):
    root = tmp_path_factory.mktemp("cli")
    beat = os.path.join(root, "beat")
    dnd = os.path.join(root, "dnd")
    os.makedirs(beat)
    os.makedirs(dnd)
    make_beat_fixture(beat, speakers=("2_scott",), seconds=6.0)
    make_dnd_fixture(dnd, n_sets=1)
    return str(root), beat, dnd


def _write_cfg(root, beat, dnd, stage, name, extra=None):
    """Tiny experiment yaml on top of the packaged defaults."""
    cfg = {
        "NAME": name,
        "DEBUG": False,
        "FOLDER": os.path.join(root, "experiments"),
        "TRAIN": {
            "STAGE": stage,
            "BATCH_SIZE": 2,
            "END_EPOCH": 1,
            "OPTIM": {"TYPE": "AdamW", "LR": 1e-3},
        },
        "TEST": {"BATCH_SIZE": 2, "SAVE_PREDICTIONS": True,
                 "FOLDER": os.path.join(root, "results")},
        "DATASET": {
            "BEATDND": {"ROOT": [beat, dnd], "SPLIT_ROOT": [beat, dnd]},
        },
        "LOGGER": {"SACE_CHECKPOINT_EPOCH": 1},
        "model": {
            "latent_dim": [1, 32],
            "motion_vae": {"params": {
                "num_layers": 3, "ff_size": 64, "dropout": 0.0}},
            "denoiser": {"params": {
                "num_layers": 3, "ff_size": 64, "dropout": 0.0,
                "text_encoded_dim": 64, "audio_encoded_dim": 64}},
            "text_encoder": {"params": {
                "latent_dim": 64, "d_model": 32, "d_ff": 64,
                "num_layers": 2, "num_heads": 4, "d_kv": 8,
                "vocab_size": 1000}},
            "audio_encoder": {"params": {"latent_dim": 64}},
        },
        "TPU": {"TEXT_PAD_LEN": 16},
    }
    if extra:
        def merge(a, b):
            for k, v in b.items():
                if isinstance(v, dict) and isinstance(a.get(k), dict):
                    merge(a[k], v)
                else:
                    a[k] = v
        merge(cfg, extra)
    path = os.path.join(root, f"cfg_{name}.yaml")
    with open(path, "w") as f:
        yaml.safe_dump(cfg, f)
    # assets merge LAST (reference config.py:82), so data roots must be
    # overridden there, not in the experiment yaml
    assets_path = os.path.join(root, f"assets_{name}.yaml")
    with open(os.path.join(DEFAULTS_DIR, "assets.yaml")) as f:
        assets = yaml.safe_load(f)
    assets["DATASET"]["BEATDND"]["ROOT"] = [beat, dnd]
    assets["DATASET"]["BEATDND"]["SPLIT_ROOT"] = [beat, dnd]
    assets["FOLDER"] = os.path.join(root, "experiments")
    assets["TEST"] = {"FOLDER": os.path.join(root, "results")}
    # module yamls merge AFTER the experiment yaml (reference
    # config.py:80-82), so scheduler overrides must ride the assets file
    assets["model"]["scheduler"] = {"variant": "ddim",
                                    "num_inference_timesteps": 3}
    with open(assets_path, "w") as f:
        yaml.safe_dump(assets, f)
    return path, assets_path


def _read_metrics(exp_dir):
    """Union of keys logged to the experiment's metrics JSONL."""
    import glob as _glob
    import json

    keys = set()
    for p in _glob.glob(os.path.join(exp_dir, "*.jsonl")):
        with open(p) as f:
            for line in f:
                keys |= set(json.loads(line))
    return keys


def test_train_vae_then_diffusion_then_generate(workdir):
    root, beat, dnd = workdir
    from convofusion_tpu.cli.test import main as test_main
    from convofusion_tpu.cli.train import main as train_main

    # stage 1
    cfg1, assets1 = _write_cfg(root, beat, dnd, "vae", "vae_exp")
    train_main(["--cfg", cfg1, "--cfg_assets", assets1])
    vae_ckpt = os.path.join(root, "experiments", "convofusion", "vae_exp",
                            "checkpoints", "epoch=0")
    assert os.path.isdir(vae_ckpt)

    # per-term metrics in the reference's {type}/{name}/{split} naming
    # (losses/diffvae.py:223-229, base.py:45-67)
    import json

    vae_metrics = _read_metrics(os.path.join(
        root, "experiments", "convofusion", "vae_exp"))
    # (bonelen/feature appears only when LAMBDA_BL != 0 and the dataset
    # defines BONES, matching the reference's conditional loss registry)
    for key in ("total/train", "recons/feature/train", "kl/motion/train",
                "recons/laplace/train"):
        assert key in vae_metrics, (key, sorted(vae_metrics))

    # stage 2 with VAE transplant
    cfg2, assets2 = _write_cfg(root, beat, dnd, "diffusion", "diff_exp",
                      {"TRAIN": {"PRETRAINED_VAE": vae_ckpt}})
    train_main(["--cfg", cfg2, "--cfg_assets", assets2])
    diff_ckpt = os.path.join(root, "experiments", "convofusion",
                             "diff_exp", "checkpoints", "epoch=0")
    assert os.path.isdir(diff_ckpt)
    diff_metrics = _read_metrics(os.path.join(
        root, "experiments", "convofusion", "diff_exp"))
    assert "inst/loss/train" in diff_metrics, sorted(diff_metrics)
    assert "total/train" in diff_metrics

    # generation with the trained checkpoint, WEG random
    cfg3, assets3 = _write_cfg(root, beat, dnd, "diffusion", "gen_exp", {
        "TEST": {"CHECKPOINTS": diff_ckpt},
        "TRAIN": {"ABLATION": {"WEG_TYPE": "random"}},
    })
    out_dir = test_main(["--cfg", cfg3, "--cfg_assets", assets3])

    sample_dirs = [d for d, _, files in os.walk(out_dir)
                   if "pred.npy" in files]
    assert sample_dirs, f"no result dirs under {out_dir}"
    d = sample_dirs[0]
    pred = np.load(os.path.join(d, "pred.npy"))
    assert pred.shape == (128, 63, 3)
    assert np.isfinite(pred).all()
    for fname in ("gt.npy", "lsn_text.txt", "spk_text.txt", "meta.txt",
                  "lsn_audio.wav"):
        assert os.path.exists(os.path.join(d, fname)), fname
    # attention dumps
    assert os.path.isdir(os.path.join(d, "att_tlsn"))

    # close the loop (driver milestone #4): the cli/test.py dump feeds
    # the offline eval driver unchanged, config -> dump -> metrics JSON
    import warnings

    from convofusion_tpu.eval.run import evaluate_results

    with warnings.catch_warnings():
        # random-init FID features warn by design (no released ckpt here)
        warnings.simplefilter("ignore")
        metrics = evaluate_results(out_dir, "dyadic", fidnet_path=None)
    assert metrics["n_samples"] == len(sample_dirs)
    assert np.isfinite(metrics["jitter"]) and metrics["jitter"] > 0
    assert np.isfinite(metrics["l1div"])
    assert np.isfinite(metrics["fid_random_init_features"])
