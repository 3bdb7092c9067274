"""Training loop: optax optimizer + pjit data-parallel step.

Replaces the reference's PyTorch-Lightning Trainer + DDP
(train.py:115-138).  The step functions are pure; the loop is a thin host
driver.  Sharding: params/opt-state replicated, batch over the 'data'
mesh axis — XLA emits the gradient all-reduce (SURVEY.md §2.4).
"""
from __future__ import annotations

import time
from typing import Callable, Dict, Optional, Tuple

import jax
import jax.numpy as jnp
import optax
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from convofusion_tpu.models.convofusion import Convofusion


def _param_labels(params, stage):
    """'frozen' for subtrees the reference never optimizes, else
    'trainable'.

    torch optimizers skip params whose .grad is None, so the reference's
    frozen modules — the T5 trunk (t5.py:35-37, every stage) and the VAE
    in the diffusion stage (convofusion.py:78-82) — are never updated
    *or weight-decayed*.  optax.adamw would decay zero-grad params, so
    they must be masked out of the transform entirely.
    """
    frozen = [("text_encoder", "text_model")]
    if stage == "diffusion":
        frozen.append(("vae",))

    def label(path, _):
        keys = tuple(getattr(p, "key", None) for p in path)
        return "frozen" if any(
            keys[:len(f)] == f for f in frozen) else "trainable"

    return jax.tree_util.tree_map_with_path(label, params)


def make_optimizer(cfg, stage=None) -> optax.GradientTransformation:
    if str(cfg.TRAIN.OPTIM.TYPE).lower() != "adamw":
        raise NotImplementedError(
            "Do not support other optimizer for now.")  # convofusion.py:111
    # torch.optim.AdamW defaults (the reference passes only lr,
    # convofusion.py:112-113): betas (0.9, 0.999), eps 1e-8, wd 1e-2.
    # Beyond parity: TRAIN.OPTIM.SCHEDULE (constant | cosine with
    # WARMUP_STEPS / DECAY_STEPS / END_LR_FACTOR) and
    # TRAIN.OPTIM.GRAD_CLIP (global-norm, 0 = off) — schedule-free
    # constant LR remains the reference-parity default.
    optim = cfg.TRAIN.OPTIM
    lr = float(optim.LR)
    sched = str(optim.get("SCHEDULE", "constant")).lower()
    if sched == "constant":
        lr_s = lr
    elif sched == "cosine":
        warm = int(optim.get("WARMUP_STEPS", 0))
        decay = int(optim.get("DECAY_STEPS", 10_000))
        lr_s = optax.warmup_cosine_decay_schedule(
            init_value=0.0 if warm else lr, peak_value=lr,
            warmup_steps=warm, decay_steps=decay,
            end_value=lr * float(optim.get("END_LR_FACTOR", 0.0)))
    else:
        raise NotImplementedError(
            f"TRAIN.OPTIM.SCHEDULE={sched!r} (constant | cosine)")
    adamw = optax.adamw(
        lr_s, weight_decay=float(optim.get("WEIGHT_DECAY", 1e-2)))
    clip = float(optim.get("GRAD_CLIP", 0.0))
    if clip:
        adamw = optax.chain(optax.clip_by_global_norm(clip), adamw)
    if stage is None:
        return adamw
    return optax.multi_transform(
        {"trainable": adamw, "frozen": optax.set_to_zero()},
        param_labels=lambda params: _param_labels(params, stage))


class Trainer:
    """Stage-aware trainer driving jitted, mesh-sharded steps."""

    def __init__(self, model: Convofusion, cfg, mesh: Optional[Mesh] = None):
        self.model = model
        self.cfg = cfg
        self.mesh = mesh
        self.stage = cfg.TRAIN.STAGE
        self.optimizer = make_optimizer(cfg, stage=self.stage)

    def loss_fn(self) -> Callable:
        if self.stage == "vae":
            return self.model.train_vae_loss
        if self.stage == "vae_diffusion":
            return self.model.train_vae_diffusion_loss
        return self.model.train_diffusion_loss

    def init_state(self, key):
        params = self.model.init_params(key)
        opt_state = self.optimizer.init(params)
        if self.mesh is not None:
            rep = NamedSharding(self.mesh, P())
            params = jax.device_put(params, rep)
            opt_state = jax.device_put(opt_state, rep)
        return params, opt_state

    def make_train_step(self):
        loss_fn = self.loss_fn()
        optimizer = self.optimizer

        def step(params, opt_state, batch, key):
            (loss, metrics), grads = jax.value_and_grad(
                loss_fn, has_aux=True)(params, batch, key)
            updates, opt_state = optimizer.update(grads, opt_state, params)
            params = optax.apply_updates(params, updates)
            return params, opt_state, loss, metrics

        if self.mesh is None:
            return jax.jit(step, donate_argnums=(0, 1))
        rep = NamedSharding(self.mesh, P())
        data = NamedSharding(self.mesh, P("data"))
        return jax.jit(
            step,
            in_shardings=(rep, rep, data, rep),
            donate_argnums=(0, 1),
        )

    def shard_batch(self, batch):
        if self.mesh is None:
            return batch
        data = NamedSharding(self.mesh, P("data"))
        rep = NamedSharding(self.mesh, P())

        def spec(x):
            # leading-dim-1 leaves are broadcastable constants (e.g. the
            # cached uncond trunk row) — replicate instead of sharding
            return rep if getattr(x, "shape", ())[:1] == (1,) else data

        if jax.process_count() > 1:
            # multi-host SPMD: each process holds its own per-host batch
            # (the DataLoader's shard= stride); assemble the global array
            # from the process-local shards — device_put of a "global"
            # array is only valid single-controller
            import numpy as np

            return jax.tree_util.tree_map(
                lambda x: jax.make_array_from_process_local_data(
                    spec(x), np.asarray(x)), batch)
        return jax.tree_util.tree_map(
            lambda x: jax.device_put(jnp.asarray(x), spec(x)), batch)

    def fit_steps(self, params, opt_state, batches, key,
                  log_every: int = 10) -> Tuple[Dict, Dict, list]:
        """Drive a sequence of prepared array batches; returns final state
        + loss history."""
        step = self.make_train_step()
        history = []
        t0 = time.time()
        for i, batch in enumerate(batches):
            key, k = jax.random.split(key)
            params, opt_state, loss, _ = step(
                params, opt_state, self.shard_batch(batch), k)
            if (i + 1) % log_every == 0:
                history.append(float(loss))
        jax.block_until_ready(params)
        self.last_wall = time.time() - t0
        return params, opt_state, history
