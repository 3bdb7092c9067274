"""vae_type 'no' ablation: diffusion directly on motion features.

Reference convofusion.py:66-72 derives vae_type; with 'no' the latent
space is the identity — z = motion (B, max_len, nfeats) in training
(:723-727), sampling draws (bsz, max(lengths), NFEATS) latents
(:403-420) and decode is a transpose-only no-op (:258-260)."""
import numpy as np
import pytest

import jax

from convofusion_tpu.config.testing import tiny_config
from convofusion_tpu.data.synthetic import (
    prepare_arrays,
    synthetic_raw_batch,
)
from convofusion_tpu.models.convofusion import Convofusion


def _no_vae_model():
    cfg = tiny_config("diffusion")
    cfg.model["vae_type"] = "no"
    # the reference expects the user to size the denoiser for raw
    # features in this ablation (latent_dim == NFEATS)
    cfg.model["latent_dim"] = [1, 189]
    cfg.model.scheduler["num_inference_timesteps"] = 2
    return Convofusion(cfg)


def test_no_vae_geometry_and_params():
    model = _no_vae_model()
    assert model.vae is None
    assert model.latent_tokens == 128 and model.latent_dim == 189
    params = model.init_params(jax.random.PRNGKey(0))
    assert "vae" not in params
    assert "denoiser" in params


def test_no_vae_train_loss_and_sample():
    model = _no_vae_model()
    params = model.init_params(jax.random.PRNGKey(0))
    raw = synthetic_raw_batch(1, 2)
    batch, _, _ = prepare_arrays(model, raw)

    loss, terms = jax.jit(model.train_diffusion_loss)(
        params, batch, jax.random.PRNGKey(1))
    assert np.isfinite(float(loss))

    # gradient flows into the denoiser over the raw-feature latents
    g = jax.grad(lambda p: model.train_diffusion_loss(
        p, batch, jax.random.PRNGKey(1))[0])(params)
    gsum = sum(float(abs(np.asarray(x)).sum())
               for x in jax.tree_util.tree_leaves(g["denoiser"]))
    assert gsum > 0

    motion, latents, _ = model.sample(
        params, batch, jax.random.PRNGKey(2), num_inference_steps=2)
    assert motion.shape == (2, 128, 189)
    # identity decode: motion IS the final latent state
    np.testing.assert_array_equal(np.asarray(motion),
                                  np.asarray(latents))
    assert np.isfinite(np.asarray(motion)).all()


def test_vae_stage_rejects_no_vae():
    cfg = tiny_config("vae")
    cfg.model["vae_type"] = "no"
    cfg.model["latent_dim"] = [1, 189]
    model = Convofusion(cfg)
    with pytest.raises(TypeError):
        model.train_vae_loss({}, {"motion": np.zeros((2, 128, 189))},
                             jax.random.PRNGKey(0))


def test_schema_key_and_yaml_bool_normalization():
    """TRAIN.ABLATION.VAE_TYPE is the schema's spelling (base.yaml), and
    YAML 1.1 parses an unquoted `no` as False — both must activate the
    ablation; the default 'convofusion' must keep the VAE."""
    cfg = tiny_config("diffusion")
    cfg.model["latent_dim"] = [1, 189]
    cfg.TRAIN.ABLATION["VAE_TYPE"] = False  # yaml `VAE_TYPE: no`
    model = Convofusion(cfg)
    assert model.vae_type == "no" and model.vae is None

    cfg2 = tiny_config("diffusion")
    cfg2.model["latent_dim"] = [1, 189]
    cfg2.TRAIN.ABLATION["VAE_TYPE"] = "no"
    model2 = Convofusion(cfg2)
    assert model2.vae_type == "no" and model2.vae is None

    cfg3 = tiny_config("diffusion")
    model3 = Convofusion(cfg3)
    assert model3.vae_type == "convofusion" and model3.vae is not None
