"""End-to-end pipeline smoke tests on tiny configs + synthetic data:
stage-1 train loss/grad, stage-2 train loss/grad, guided sampling (DDPM and
50-step DDIM), WEG-enabled sampling."""
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
from convofusion_tpu.models.tokenizer import focus_word_indices

B = 2


@pytest.fixture(scope="module")
def diff_model():
    cfg = tiny_config("diffusion")
    model = Convofusion(cfg)
    params = model.init_params(jax.random.PRNGKey(0))
    raw = synthetic_raw_batch(0, B)
    batch, tb_spk, tb_lsn = prepare_arrays(model, raw)
    return model, params, raw, batch, tb_lsn


def test_vae_train_loss_and_grads():
    cfg = tiny_config("vae")
    model = Convofusion(cfg)
    params = model.init_params(jax.random.PRNGKey(0))
    raw = synthetic_raw_batch(1, B)
    batch = {"motion": jnp.asarray(raw["motion_lsn"])}

    loss_fn = jax.jit(
        lambda p, b, k: model.train_vae_loss(p, b, k)[0])
    grads = jax.grad(loss_fn)(params, batch, jax.random.PRNGKey(1))
    loss, losses = model.train_vae_loss(params, batch,
                                        jax.random.PRNGKey(1))
    assert np.isfinite(float(loss))
    assert set(losses) >= {"recons_feature", "kl_motion", "recons_laplace",
                           "bonelen_feature", "total"}
    gnorm = jax.tree_util.tree_reduce(
        lambda a, x: a + float(jnp.sum(jnp.abs(x))), grads["vae"], 0.0)
    assert np.isfinite(gnorm) and gnorm > 0


def test_vae_roundtrip_shapes():
    cfg = tiny_config("vae")
    model = Convofusion(cfg)
    params = model.init_params(jax.random.PRNGKey(0))
    motion = jnp.asarray(synthetic_raw_batch(2, B)["motion_lsn"])
    latent, (mu, logvar), feats = model.vae_encode(params, motion)
    assert latent.shape == (2, B, 8, 32)
    assert feats.shape == motion.shape
    recon = model.vae_decode(params, latent)
    assert recon.shape == motion.shape


@pytest.mark.slow
def test_diffusion_train_loss_and_grads(diff_model):
    model, params, raw, batch, _ = diff_model
    loss, losses = jax.jit(model.train_diffusion_loss)(
        params, batch, jax.random.PRNGKey(3))
    assert np.isfinite(float(loss))
    assert "inst_loss" in losses

    grads = jax.grad(lambda p: model.train_diffusion_loss(
        p, batch, jax.random.PRNGKey(3))[0])(params)
    # frozen VAE must receive zero gradient (stop_gradient)
    vae_g = jax.tree_util.tree_reduce(
        lambda a, x: a + float(jnp.sum(jnp.abs(x))), grads["vae"], 0.0)
    assert vae_g == 0.0
    den_g = jax.tree_util.tree_reduce(
        lambda a, x: a + float(jnp.sum(jnp.abs(x))), grads["denoiser"], 0.0)
    assert den_g > 0


def test_modality_dropout_groups(diff_model):
    model, params, raw, batch, _ = diff_model
    big = {k: (jnp.tile(v, (10,) + (1,) * (v.ndim - 1))
               if hasattr(v, "ndim") else v)
           for k, v in batch.items()}
    out = model.apply_modality_dropout(jax.random.PRNGKey(0), big)
    # with B=20 and uncondp=0.1 -> 2 samples per group, 12 modified rows
    changed_apb = np.sum(np.any(
        np.asarray(out["active_passive_lsn"]) !=
        np.asarray(big["active_passive_lsn"]), axis=1))
    assert changed_apb == 10  # 5 groups drop apb x 2 samples each
    dropped_ids = np.sum(np.asarray(out["lsn_id"]) == 0)
    assert dropped_ids >= 10


def test_guided_sampling_ddpm(diff_model):
    model, params, raw, batch, _ = diff_model
    motion, latents, _ = jax.jit(
        lambda p, b, k: model.sample(p, b, k, num_inference_steps=5))(
        params, batch, jax.random.PRNGKey(4))
    assert motion.shape == (B, 128, 189)
    assert latents.shape == (B, 16, 32)
    assert np.isfinite(np.asarray(motion)).all()


@pytest.mark.slow
def test_guided_sampling_ddim_50():
    cfg = tiny_config("diffusion")
    cfg.model.scheduler["variant"] = "ddim"
    cfg.model.scheduler["num_inference_timesteps"] = 50
    model = Convofusion(cfg)
    params = model.init_params(jax.random.PRNGKey(0))
    raw = synthetic_raw_batch(5, B)
    batch, _, _ = prepare_arrays(model, raw)
    motion, _, _ = jax.jit(
        lambda p, b, k: model.sample(p, b, k))(
        params, batch, jax.random.PRNGKey(5))
    assert motion.shape == (B, 128, 189)
    assert np.isfinite(np.asarray(motion)).all()


@pytest.mark.slow
def test_weg_sampling(diff_model):
    model, params, raw, batch, tb_lsn = diff_model
    wrapped = model.tokenizer.wrapped_texts(raw["text_lsn"])
    word_maps = tb_lsn.word_map(wrapped)
    focus_words = [[t.split()[1]] for t in wrapped]  # first content word
    fi, fv = focus_word_indices(word_maps, focus_words, max_indices=4)
    assert fv.any()
    motion, _, _ = model.sample(
        params, batch, jax.random.PRNGKey(6), num_inference_steps=3,
        focus={"focus_idx": fi, "focus_valid": fv})
    assert np.isfinite(np.asarray(motion)).all()


def test_attention_capture(diff_model):
    model, params, raw, batch, _ = diff_model
    _, _, att_seq = model.sample(
        params, batch, jax.random.PRNGKey(7), num_inference_steps=3,
        capture_attention="all")
    assert att_seq is not None
    # (steps, B, layers, 16, Tk) per stream
    assert att_seq["tlsn"].shape[:2] == (3, B)
    assert att_seq["tlsn"].shape[3] == 16


@pytest.mark.slow
def test_vae_diffusion_joint_stage(diff_model):
    model, params, raw, batch, _ = diff_model
    model_vd = model  # same modules; stage string only affects dispatch
    loss, losses = jax.jit(model_vd.train_vae_diffusion_loss)(
        params, batch, jax.random.PRNGKey(11))
    assert np.isfinite(float(loss))
    assert "vae_recons_feature" in losses and "inst_loss" in losses
    grads = jax.grad(lambda p: model_vd.train_vae_diffusion_loss(
        p, batch, jax.random.PRNGKey(11))[0])(params)
    # joint stage trains the VAE (through the vae loss branch)
    vae_g = jax.tree_util.tree_reduce(
        lambda a, x: a + float(jnp.sum(jnp.abs(x))), grads["vae"], 0.0)
    assert vae_g > 0


def test_dpmpp_sampling():
    cfg = tiny_config("diffusion")
    cfg.model.scheduler["variant"] = "dpmpp_2m"
    cfg.model.scheduler["num_inference_timesteps"] = 8
    model = Convofusion(cfg)
    params = model.init_params(jax.random.PRNGKey(0))
    raw = synthetic_raw_batch(7, B)
    batch, _, _ = prepare_arrays(model, raw)
    motion, _, _ = model.sample(params, batch, jax.random.PRNGKey(8))
    assert motion.shape == (B, 128, 189)
    assert np.isfinite(np.asarray(motion)).all()


def test_sample_with_uncond_cache_is_identical():
    """encode_uncond + uncond_cache must be a pure hoist: outputs equal
    the uncached path bitwise (same key, same batch)."""
    import jax

    from convofusion_tpu.config.testing import tiny_config
    from convofusion_tpu.data.synthetic import (
        prepare_arrays,
        synthetic_raw_batch,
    )
    from convofusion_tpu.models.convofusion import Convofusion

    model = Convofusion(tiny_config("diffusion"))
    params = model.init_params(jax.random.PRNGKey(0))
    batch, _, _ = prepare_arrays(model, synthetic_raw_batch(0, 2))
    key = jax.random.PRNGKey(7)

    motion_a, lat_a, _ = model.sample(params, batch, key,
                                      num_inference_steps=3)
    cache = model.encode_uncond(params, batch)
    motion_b, lat_b, _ = model.sample(params, batch, key,
                                      num_inference_steps=3,
                                      uncond_cache=cache)
    np.testing.assert_array_equal(np.asarray(motion_a),
                                  np.asarray(motion_b))
    np.testing.assert_array_equal(np.asarray(lat_a), np.asarray(lat_b))
