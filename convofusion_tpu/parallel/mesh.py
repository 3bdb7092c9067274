"""Device mesh + sharding helpers.

The reference scales via Lightning DDP only (train.py:115-127; SURVEY.md
§2.4) — the TPU-native equivalent is a ('data', 'model') mesh with the
batch sharded over 'data' and params replicated; XLA inserts the gradient
all-reduce over ICI.  The 'model' axis is headroom for tensor-parallel
layouts (unused by the ~30 M-param production model, but the helpers
accept it so larger variants shard without code changes).
"""
from __future__ import annotations

from typing import Optional

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P


def create_mesh(n_data: int = -1, n_model: int = 1,
                devices=None) -> Mesh:
    devices = devices if devices is not None else jax.devices()
    n = len(devices)
    if n_data == -1:
        n_data = n // n_model
    assert n_data * n_model == n, (
        f"{n} devices cannot form a ({n_data}, {n_model}) mesh")
    arr = np.asarray(devices).reshape(n_data, n_model)
    return Mesh(arr, axis_names=("data", "model"))


def batch_sharding(mesh: Mesh) -> NamedSharding:
    """Leading-axis (batch) sharding over the data axis."""
    return NamedSharding(mesh, P("data"))


def replicated(mesh: Mesh) -> NamedSharding:
    return NamedSharding(mesh, P())


def shard_batch(batch, mesh: Mesh):
    """Place every array in the batch with its leading axis on 'data'."""
    sh = batch_sharding(mesh)
    return jax.tree_util.tree_map(
        lambda x: jax.device_put(x, sh), batch)


def replicate(tree, mesh: Mesh):
    """Replicate a pytree (params / opt state) across the mesh."""
    sh = replicated(mesh)
    return jax.tree_util.tree_map(lambda x: jax.device_put(x, sh), tree)


def make_data_parallel_step(step_fn, mesh: Mesh, donate_argnums=()):
    """jit a (params, opt_state, batch, key) -> ... step with DP shardings.

    The step must compute a *mean* loss over the batch; XLA lowers the
    gradient reduction to a psum over ICI automatically since params are
    replicated and the batch is sharded.
    """
    rep = replicated(mesh)
    data = batch_sharding(mesh)

    def batch_spec(batch):
        return jax.tree_util.tree_map(lambda _: data, batch)

    def wrapped(params, opt_state, batch, key):
        return step_fn(params, opt_state, batch, key)

    return jax.jit(
        wrapped,
        in_shardings=(rep, rep, None, rep),
        out_shardings=None,
        donate_argnums=donate_argnums,
    ), batch_spec


def process_barrier(name: str, timeout_ms: int = 1_800_000) -> None:
    """Block until every process reaches this barrier.

    Goes through the coordination service (gRPC) — NOT a device
    collective — so it is safe to cross while other hosts are still
    compiling.  ``name`` must be unique per barrier crossing and equal
    across processes.  No-op single-process.
    """
    from jax._src import distributed

    client = distributed.global_state.client
    if client is not None and jax.process_count() > 1:
        client.wait_at_barrier(name, timeout_in_ms=timeout_ms)


def compile_synced(jitted, args, name: str,
                   timeout_ms: int = 1_800_000):
    """AOT-compile a collective program on this host, then barrier.

    XLA:CPU's gloo rendezvous gives a collective context ~30 s for all
    ranks to connect.  Compile skew routinely exceeds that: a host that
    hits the persistent compile cache dispatches immediately while a
    cache-missing host is still compiling (60-100 s observed on the CPU
    backend), and the fast host's context init times out, killing the
    job.  Compiling first (pure host work, no comm) and crossing a
    coordination barrier bounds the execution skew to milliseconds.

    Returns the AOT ``Compiled`` — call it exactly like the jit fn, but
    note it is specialized to these arg shapes/dtypes/shardings (fixed
    in training: drop_last loaders + static pad lengths).
    """
    compiled = jitted.lower(*args).compile()
    process_barrier(f"compile/{name}", timeout_ms)
    return compiled


def local_device_count(mesh: Optional[Mesh] = None) -> int:
    return len(mesh.devices.flatten()) if mesh is not None else \
        jax.local_device_count()


def local_data_parallel(params, batch_size: int):
    """Single-host data-parallel setup over all *local* chips.

    The shared inference-CLI pattern (cli/test.py, cli/unbounded.py):
    shard the batch over a 1-D 'data' mesh and replicate ``params``
    when the configured batch size divides the local device count.
    The mesh is built over ``jax.local_devices()`` — NOT the global
    ``jax.devices()`` — so per-process (multi-host) entry points don't
    try to address other hosts' chips.

    Returns ``(data_sharding | None, params, n_local_devices)``;
    sharding is None when data parallelism doesn't apply (single
    device, or batch size not divisible).
    """
    devices = jax.local_devices()
    n_dev = len(devices)
    if n_dev <= 1 or batch_size % n_dev != 0:
        return None, params, n_dev
    mesh = create_mesh(n_data=n_dev, n_model=1, devices=devices)
    return batch_sharding(mesh), replicate(params, mesh), n_dev
