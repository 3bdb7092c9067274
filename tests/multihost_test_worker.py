"""Worker for tests/test_multihost.py::test_two_process_generation_dump:
one process of an N-process job driving the REAL ``cli/test.main``
(generation + result dump) — the dump path's multihost branches:
every host samples identical motions from the replicated params, only
process 0 writes artifacts, and the end-of-run sync holds hosts until
the writes land.  (Ref equivalent surface: test.py:107-113, which
forces a single device; we keep its semantics across hosts.)

Usage: python multihost_test_worker.py <pid> <nprocs> <port> <workdir>
With nprocs=1 the cluster init is skipped: the same config/seed run
single-process, used by the parent to assert bit-identical motions.
"""
import os
import random
import sys

PID = int(sys.argv[1])
NPROCS = int(sys.argv[2])
PORT = sys.argv[3]
WORKDIR = sys.argv[4]

os.environ["XLA_FLAGS"] = "--xla_force_host_platform_device_count=1"
REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")
if NPROCS > 1:
    jax.distributed.initialize(coordinator_address=f"localhost:{PORT}",
                               num_processes=NPROCS, process_id=PID)
    assert jax.process_count() == NPROCS

import numpy as np  # noqa: E402
import yaml  # noqa: E402

# the dataset's listener pick (data/dataset.py randrange) and silence-mel
# jitter use module-level RNGs; seed them so the single- and multi-
# process runs draw identical conditions
random.seed(0)
np.random.seed(0)

beat = os.path.join(WORKDIR, "beat")
dnd = os.path.join(WORKDIR, "dnd")
name = os.environ.get("MH_NAME", f"mh_test_n{NPROCS}")
cfg = {
    "NAME": name,
    "DEBUG": False,
    "SEED_VALUE": 1234,
    "FOLDER": os.path.join(WORKDIR, "experiments"),
    "TRAIN": {"STAGE": "diffusion",
              "ABLATION": {"WEG_TYPE": "no"}},
    "TEST": {"BATCH_SIZE": 2, "SAVE_PREDICTIONS": True,
             "CHECKPOINTS": "",
             "FOLDER": os.path.join(WORKDIR, "results", name)},
    "DATASET": {
        "BEATDND": {"ROOT": [beat, dnd], "SPLIT_ROOT": [beat, dnd]},
    },
    "model": {
        "latent_dim": [1, 32],
        "scheduler": {"variant": "ddim", "num_inference_timesteps": 3},
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
cfg_path = os.path.join(WORKDIR, f"test_cfg_{NPROCS}_{PID}.yaml")
with open(cfg_path, "w") as f:
    yaml.safe_dump(cfg, f)
# start from the PACKAGED defaults (not {}): the text-encoder module
# yaml interpolates ${model.t5_path}, which only assets.yaml defines
# (same recipe as train/overfit.py::write_cfg)
from convofusion_tpu.config import DEFAULTS_DIR  # noqa: E402

with open(os.path.join(DEFAULTS_DIR, "assets.yaml")) as f:
    assets = yaml.safe_load(f)
assets["DATASET"]["BEATDND"]["ROOT"] = [beat, dnd]
assets["DATASET"]["BEATDND"]["SPLIT_ROOT"] = [beat, dnd]
assets["FOLDER"] = os.path.join(WORKDIR, "experiments")
assets["TEST"] = {"FOLDER": os.path.join(WORKDIR, "results", name)}
# module yamls merge AFTER the experiment yaml; scheduler override must
# ride the assets file (reference config.py:80-82)
assets.setdefault("model", {})["scheduler"] = {
    "variant": "ddim", "num_inference_timesteps": 3}
assets_path = os.path.join(WORKDIR, f"test_assets_{NPROCS}.yaml")
with open(assets_path, "w") as f:
    yaml.safe_dump(assets, f)

from convofusion_tpu.cli.test import main  # noqa: E402

out_dir = main(["--cfg", cfg_path, "--cfg_assets", assets_path])
with open(os.path.join(WORKDIR, f"test_out_{NPROCS}_{PID}.txt"), "w") as f:
    f.write(out_dir)
print(f"test worker {PID}/{NPROCS} done: {out_dir}")
