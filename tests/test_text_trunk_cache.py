"""Cached-trunk training path: precomputing the frozen T5 trunk
activations out of the train step must not change the math.

The trunk is frozen and runs in eval mode (reference t5.py:35-37), so
its output is a pure function of the text; caching it removes ~3/4 of
the train-step FLOPs.  The trainable projection stays in-graph."""
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


def _trunk_batch(model, params, batch):
    """Augment an id batch with precomputed trunk activations."""
    trunk = jax.jit(model.encode_text_trunk)
    out = dict(batch)
    out["spk_trunk"] = trunk(params, batch["spk_ids"], batch["spk_tmask"])
    out["lsn_trunk"] = trunk(params, batch["lsn_ids"], batch["lsn_tmask"])
    out["uncond_trunk"] = trunk(params, batch["uncond_ids"],
                                batch["uncond_tmask"])
    return out


@pytest.mark.slow
def test_precomputed_trunk_loss_and_grads_match_ids_path():
    cfg = tiny_config("diffusion")
    model = Convofusion(cfg)
    params = model.init_params(jax.random.PRNGKey(0))
    raw = synthetic_raw_batch(3, 4)
    batch, _, _ = prepare_arrays(model, raw)
    key = jax.random.PRNGKey(7)

    def loss_of(b):
        return lambda p: model.train_diffusion_loss(p, b, key)[0]

    l_ids, g_ids = jax.jit(jax.value_and_grad(loss_of(batch)))(params)
    b2 = _trunk_batch(model, params, batch)
    l_pre, g_pre = jax.jit(jax.value_and_grad(loss_of(b2)))(params)

    np.testing.assert_allclose(float(l_ids), float(l_pre),
                               rtol=1e-6, atol=1e-6)
    for sub in ("denoiser", "audio_encoder", "condition_fuser"):
        for a, b in zip(jax.tree_util.tree_leaves(g_ids[sub]),
                        jax.tree_util.tree_leaves(g_pre[sub])):
            np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                       rtol=1e-5, atol=1e-6)
    # the trainable projection head gets identical gradients too
    for a, b in zip(
            jax.tree_util.tree_leaves(g_ids["text_encoder"]["projection_1"]),
            jax.tree_util.tree_leaves(
                g_pre["text_encoder"]["projection_1"])):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   rtol=1e-5, atol=1e-6)
    # and the frozen trunk gets none in either path
    assert sum(float(jnp.abs(x).sum()) for x in jax.tree_util.tree_leaves(
        g_pre["text_encoder"]["text_model"])) == 0.0


@pytest.mark.slow
def test_trainer_step_accepts_production_trunk_layout():
    """The cli/train.py steady-state layout: no id arrays at all, the
    uncond trunk/mask as single broadcastable (1, ...) rows."""
    cfg = tiny_config("diffusion")
    model = Convofusion(cfg)
    trainer = Trainer(model, cfg, mesh=None)
    params, opt_state = trainer.init_state(jax.random.PRNGKey(0))
    raw = synthetic_raw_batch(5, 4)
    batch, _, _ = prepare_arrays(model, raw)
    batch = _trunk_batch(model, params, batch)
    batch["uncond_trunk"] = batch["uncond_trunk"][:1]
    batch["uncond_tmask"] = batch["uncond_tmask"][:1]
    for k in ("spk_ids", "lsn_ids", "uncond_ids"):
        del batch[k]
    step = trainer.make_train_step()
    params, opt_state, loss, _ = step(params, opt_state, batch,
                                      jax.random.PRNGKey(1))
    assert np.isfinite(float(loss))


@pytest.mark.slow
def test_one_row_uncond_matches_full_rows():
    """The (1, T, D) uncond row must give the same loss as B tiled rows
    (it broadcasts inside the modality-dropout where)."""
    cfg = tiny_config("diffusion")
    model = Convofusion(cfg)
    params = model.init_params(jax.random.PRNGKey(0))
    raw = synthetic_raw_batch(9, 4)
    batch, _, _ = prepare_arrays(model, raw)
    full = _trunk_batch(model, params, batch)
    key = jax.random.PRNGKey(11)
    l_full = float(model.train_diffusion_loss(params, full, key)[0])

    slim = dict(full)
    slim["uncond_trunk"] = slim["uncond_trunk"][:1]
    slim["uncond_tmask"] = slim["uncond_tmask"][:1]
    for k in ("spk_ids", "lsn_ids", "uncond_ids"):
        del slim[k]
    l_slim = float(model.train_diffusion_loss(params, slim, key)[0])
    np.testing.assert_allclose(l_full, l_slim, rtol=1e-6, atol=1e-6)
