"""Cached-VAE-posterior training path: precomputing the frozen VAE's
(mu, logvar) out of the stage-2 step must not change the math.

The VAE is frozen during diffusion training (reference convofusion.py:
78-82) and its encoder runs in eval mode, so the posterior is a pure
function of the motion; only the reparameterization noise must stay
in-step (drawn with the same key/shape/dtype as vae.encode would —
models/vae.py:177-179, models/convofusion.py train_diffusion_loss)."""
import numpy as np
import pytest

import jax
import jax.numpy as jnp

from convofusion_tpu.config.testing import tiny_config
from convofusion_tpu.data.synthetic import (
    prepare_arrays,
    synthetic_raw_batch,
)
from convofusion_tpu.models.convofusion import Convofusion
from convofusion_tpu.train.trainer import Trainer


def _posterior_batch(model, params, batch):
    mu, lv = jax.jit(model.encode_vae_posterior)(
        params, batch["motion_lsn"])
    out = dict(batch)
    out["vae_mu"], out["vae_logvar"] = mu, lv
    del out["motion_lsn"]
    return out


def test_posterior_layout_is_batch_leading():
    cfg = tiny_config("diffusion")
    model = Convofusion(cfg)
    params = model.init_params(jax.random.PRNGKey(0))
    raw = synthetic_raw_batch(2, 3)
    batch, _, _ = prepare_arrays(model, raw)
    mu, lv = model.encode_vae_posterior(params, batch["motion_lsn"])
    assert mu.shape == (3, 2, model.n_chunks, model.latent_dim)
    assert lv.shape == mu.shape
    # round-trips to the vae_encode layout
    latent, (mu_ref, lv_ref), _ = model.vae_encode(
        params, batch["motion_lsn"])
    np.testing.assert_array_equal(
        np.asarray(jnp.transpose(mu, (1, 0, 2, 3))), np.asarray(mu_ref))


@pytest.mark.slow
def test_cached_posterior_loss_and_grads_match_motion_path():
    cfg = tiny_config("diffusion")
    model = Convofusion(cfg)
    params = model.init_params(jax.random.PRNGKey(0))
    raw = synthetic_raw_batch(3, 4)
    batch, _, _ = prepare_arrays(model, raw)
    key = jax.random.PRNGKey(7)

    def loss_of(b):
        return lambda p: model.train_diffusion_loss(p, b, key)[0]

    l_mot, g_mot = jax.jit(jax.value_and_grad(loss_of(batch)))(params)
    b2 = _posterior_batch(model, params, batch)
    l_pre, g_pre = jax.jit(jax.value_and_grad(loss_of(b2)))(params)

    np.testing.assert_allclose(float(l_mot), float(l_pre),
                               rtol=1e-6, atol=1e-6)
    for sub in ("denoiser", "audio_encoder", "condition_fuser"):
        for a, b in zip(jax.tree_util.tree_leaves(g_mot[sub]),
                        jax.tree_util.tree_leaves(g_pre[sub])):
            np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                       rtol=1e-5, atol=1e-6)
    # the frozen VAE gets no gradient in either path
    assert sum(float(jnp.abs(x).sum()) for x in jax.tree_util.tree_leaves(
        g_pre["vae"])) == 0.0


def test_trainer_step_accepts_posterior_layout():
    """cli/train.py steady state: no motion array at all (and combined
    with the cached-trunk layout, like the production default)."""
    cfg = tiny_config("diffusion")
    model = Convofusion(cfg)
    trainer = Trainer(model, cfg, mesh=None)
    params, opt_state = trainer.init_state(jax.random.PRNGKey(0))
    raw = synthetic_raw_batch(5, 4)
    batch, _, _ = prepare_arrays(model, raw)
    batch = _posterior_batch(model, params, batch)
    trunk = jax.jit(model.encode_text_trunk)
    batch["spk_trunk"] = trunk(params, batch["spk_ids"],
                               batch["spk_tmask"])
    batch["lsn_trunk"] = trunk(params, batch["lsn_ids"],
                               batch["lsn_tmask"])
    batch["uncond_trunk"] = trunk(params, batch["uncond_ids"][:1],
                                  batch["uncond_tmask"][:1])
    batch["uncond_tmask"] = batch["uncond_tmask"][:1]
    for k in ("spk_ids", "lsn_ids", "uncond_ids"):
        del batch[k]
    step = trainer.make_train_step()
    params, opt_state, loss, _ = step(params, opt_state, batch,
                                      jax.random.PRNGKey(1))
    assert np.isfinite(float(loss))
