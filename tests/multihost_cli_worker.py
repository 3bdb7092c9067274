"""Worker for tests/test_multihost.py::test_two_process_cli_train: one
process of a 2-process job driving the REAL ``cli/train.main`` over an
on-disk fixture — the branches the trainer-level worker does not reach:
process-0-gated side outputs (metrics logger, checkpoint device_get +
save), the host-sharded epoch loader inside the epoch loop, and the
multihost prepare/prefetch staging.

Usage: python multihost_cli_worker.py <pid> <nprocs> <port> <workdir>
(<workdir> must already contain beat/ + dnd/ fixtures and exp/ for
outputs — built by the parent test so both processes see one shared
experiment dir, as on a shared filesystem.)
"""
import os
import sys

PID = int(sys.argv[1])
NPROCS = int(sys.argv[2])
PORT = sys.argv[3]
WORKDIR = sys.argv[4]

os.environ["XLA_FLAGS"] = "--xla_force_host_platform_device_count=2"
REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")
# the test initializes the cluster itself; cli/train's TPU.MULTIHOST
# flag therefore stays False (it would double-initialize), and the
# process_count()-gated branches trigger off the live cluster
jax.distributed.initialize(coordinator_address=f"localhost:{PORT}",
                           num_processes=NPROCS, process_id=PID)
assert jax.process_count() == NPROCS

import numpy as np  # noqa: E402
import yaml  # noqa: E402

beat = os.path.join(WORKDIR, "beat")
dnd = os.path.join(WORKDIR, "dnd")
cfg = {
    "NAME": os.environ.get("MH_NAME", "mh_cli"),
    "DEBUG": False,
    "FOLDER": os.path.join(WORKDIR, "experiments"),
    "TRAIN": {
        "STAGE": "vae",
        # per-host loader batch; must divide the 2 local devices
        "BATCH_SIZE": 2,
        "END_EPOCH": int(os.environ.get("MH_END_EPOCH", "1")),
        "OPTIM": {"TYPE": "AdamW", "LR": 1e-3},
    },
    "EVAL": {"BATCH_SIZE": 2},
    "DATASET": {
        "BEATDND": {"ROOT": [beat, dnd], "SPLIT_ROOT": [beat, dnd]},
    },
    # VAL_EVERY_STEPS=1 (default): also execute the multihost validation
    # branch (host-sharded drop_last val loader + global val arrays)
    "LOGGER": {
        "SACE_CHECKPOINT_EPOCH": int(os.environ.get("MH_SACE", "1")),
        "VAL_EVERY_STEPS": int(os.environ.get("MH_VAL_EVERY", "1")),
    },
    "model": {
        "latent_dim": [1, 32],
        "motion_vae": {"params": {
            "num_layers": 3, "ff_size": 64, "dropout": 0.0}},
    },
}
cfg_path = os.path.join(WORKDIR, f"cfg_{PID}.yaml")
with open(cfg_path, "w") as f:
    yaml.safe_dump(cfg, f)
assets_path = os.path.join(WORKDIR, "assets.yaml")
if not os.path.exists(assets_path):
    with open(assets_path, "w") as f:
        yaml.safe_dump({}, f)

from convofusion_tpu.cli.train import main  # noqa: E402

params = main(["--cfg", cfg_path, "--cfg_assets", assets_path])

leaves = jax.tree_util.tree_leaves(jax.device_get(params))
flat = np.concatenate([np.asarray(x, np.float64).ravel() for x in leaves])
np.savez(os.path.join(WORKDIR, f"cli_worker_{PID}.npz"), params=flat)
print(f"cli worker {PID} done")
