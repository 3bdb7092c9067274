"""Worker for tests/test_multihost.py: one process of a 2-process CPU
SPMD job driving real cli/train-style steps.

Executes the branches that only run when ``jax.process_count() > 1``:
``jax.distributed.initialize`` (cli/train.py), the DataLoader's per-host
epoch sharding (data/datamodule.py shard=), and the global-array
assembly via ``make_array_from_process_local_data``
(train/trainer.py:117-126) — the TPU-native equivalent of the
reference's Lightning DDP spawn (train.py:115-127).

Usage: python multihost_worker.py <pid> <nprocs> <port> <outdir>
"""
import os
import sys

PID = int(sys.argv[1])
NPROCS = int(sys.argv[2])
PORT = sys.argv[3]
OUTDIR = sys.argv[4]

os.environ["XLA_FLAGS"] = "--xla_force_host_platform_device_count=2"
REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")
jax.distributed.initialize(coordinator_address=f"localhost:{PORT}",
                           num_processes=NPROCS, process_id=PID)
assert jax.process_count() == NPROCS
assert jax.local_device_count() == 2
assert len(jax.devices()) == 2 * NPROCS

import numpy as np  # noqa: E402

from convofusion_tpu.config.testing import tiny_config  # noqa: E402
from convofusion_tpu.data.datamodule import DataLoader  # noqa: E402
from convofusion_tpu.models.convofusion import Convofusion  # noqa: E402
from convofusion_tpu.parallel.mesh import create_mesh  # noqa: E402
from convofusion_tpu.train.trainer import Trainer  # noqa: E402

PER_HOST_BATCH = 2
N_ITEMS = 8


class SynthMotion:
    """Deterministic per-index motion items — each host materializes the
    same dataset, the loader's shard stride picks disjoint halves."""

    def __len__(self):
        return N_ITEMS

    def __getitem__(self, i):
        rng = np.random.default_rng(1000 + i)
        return (rng.standard_normal((128, 189)).astype(np.float32) * 0.1,
                128, f"item{i}")


def collate(items):
    return {"motion": np.stack([m for m, _, _ in items])}


cfg = tiny_config("vae")
cfg.TRAIN.BATCH_SIZE = PER_HOST_BATCH * NPROCS  # global batch
model = Convofusion(cfg)
mesh = create_mesh()  # over the 4 GLOBAL devices
trainer = Trainer(model, cfg, mesh=mesh)
params, opt_state = trainer.init_state(jax.random.PRNGKey(0))

loader = DataLoader(SynthMotion(), batch_size=PER_HOST_BATCH,
                    collate_fn=collate, shuffle=True, seed=0,
                    shard=(PID, NPROCS))
assert len(loader) == N_ITEMS // NPROCS // PER_HOST_BATCH

step = trainer.make_train_step()
key = jax.random.PRNGKey(1)
losses = []
global_batch_sizes = []
for batch in loader:
    gb = trainer.shard_batch(batch)
    # the global array assembled from per-process shards
    global_batch_sizes.append(int(gb["motion"].shape[0]))
    key, k = jax.random.split(key)
    params, opt_state, loss, _ = step(params, opt_state, gb, k)
    # loss is replicated -> every host can read it
    losses.append(float(jax.device_get(loss)))

assert all(b == PER_HOST_BATCH * NPROCS for b in global_batch_sizes), \
    global_batch_sizes

leaves = jax.tree_util.tree_leaves(jax.device_get(params))
flat = np.concatenate([np.asarray(x, np.float64).ravel() for x in leaves])
np.savez(os.path.join(OUTDIR, f"worker_{PID}.npz"),
         params=flat, losses=np.asarray(losses),
         global_batch=np.asarray(global_batch_sizes))
print(f"worker {PID} done: losses={losses}")
