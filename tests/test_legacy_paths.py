"""Legacy ablation paths from the inventory: all_encoder VAE, MLP_DIST,
trans_enc denoiser (text / action / text+audio), EmbedAction, spk-ta
controller."""
import numpy as np
import jax
import jax.numpy as jnp

from convofusion_tpu.models.audioenc import TextAudioController
from convofusion_tpu.models.denoiser import Denoiser, EmbedAction
from convofusion_tpu.models.vae import ConvoFusionVae
from convofusion_tpu.ops.transformer import COND_STREAMS

D = 32


def test_vae_all_encoder_roundtrip():
    vae = ConvoFusionVae(latent_dim=D, ff_size=64, num_layers=3,
                         num_heads=2, dropout=0.0, arch="all_encoder")
    motion = jax.random.normal(jax.random.PRNGKey(0), (2, 128, 189))
    params = vae.init({"params": jax.random.PRNGKey(1)}, motion)["params"]
    recon, latent, (mu, logvar) = vae.apply({"params": params}, motion)
    assert recon.shape == (2, 128, 189)
    assert latent.shape == (2, 2, 8, D)
    assert np.isfinite(np.asarray(recon)).all()


def test_vae_mlp_dist():
    vae = ConvoFusionVae(latent_dim=D, ff_size=64, num_layers=3,
                         num_heads=2, dropout=0.0, mlp_dist=True)
    motion = jax.random.normal(jax.random.PRNGKey(0), (2, 128, 189))
    params = vae.init({"params": jax.random.PRNGKey(1)}, motion)["params"]
    assert "body_dist_layer" in params
    recon, latent, _ = vae.apply({"params": params}, motion)
    assert latent.shape == (2, 2, 8, D)
    assert np.isfinite(np.asarray(recon)).all()


def test_trans_enc_text_condition():
    den = Denoiser(latent_dim=D, ff_size=64, num_layers=3, num_heads=4,
                   dropout=0.0, arch="trans_enc", condition="text",
                   text_encoded_dim=64)
    sample = jax.random.normal(jax.random.PRNGKey(0), (2, 16, D))
    text = jax.random.normal(jax.random.PRNGKey(1), (2, 11, 64))
    params = den.init({"params": jax.random.PRNGKey(2)}, sample,
                      jnp.asarray(100), text)["params"]
    out, att = den.apply({"params": params}, sample, jnp.asarray(100),
                         text)
    assert out.shape == (2, 16, D)
    assert np.isfinite(np.asarray(out)).all()


def test_trans_enc_action_condition():
    den = Denoiser(latent_dim=D, ff_size=64, num_layers=3, num_heads=4,
                   dropout=0.0, arch="trans_enc", condition="action",
                   text_encoded_dim=64, nclasses=10)
    sample = jax.random.normal(jax.random.PRNGKey(0), (4, 16, D))
    action = jnp.asarray([[1], [2], [3], [0]], jnp.int32)
    params = den.init({"params": jax.random.PRNGKey(2)}, sample,
                      jnp.asarray(100), action)["params"]
    out, _ = den.apply({"params": params}, sample, jnp.asarray(100),
                       action)
    assert out.shape == (4, 16, D)
    # training-mode bernoulli uncond dropout requires a dropout rng
    out_t, _ = den.apply({"params": params}, sample, jnp.asarray(100),
                         action, deterministic=False,
                         rngs={"dropout": jax.random.PRNGKey(5)})
    assert np.isfinite(np.asarray(out_t)).all()


def test_trans_enc_textaudio_condition():
    den = Denoiser(latent_dim=D, ff_size=64, num_layers=3, num_heads=4,
                   dropout=0.0, arch="trans_enc", condition="text+audio",
                   text_encoded_dim=64)
    sample = jax.random.normal(jax.random.PRNGKey(0), (2, 16, D))
    sizes = dict(spkemb=9, alsn=12, tlsn=7, apb=8, lsnemb=1)
    cond = {s: jax.random.normal(jax.random.PRNGKey(i), (2, sizes[s], 64))
            for i, s in enumerate(COND_STREAMS)}
    params = den.init({"params": jax.random.PRNGKey(2)}, sample,
                      jnp.asarray(100), cond)["params"]
    out, _ = den.apply({"params": params}, sample, jnp.asarray(100), cond)
    assert out.shape == (2, 16, D)


def test_embed_action_guided_inference_zeroes_first_half():
    ea = EmbedAction(num_actions=5, latent_dim=D, guidance_scale=7.5)
    action = jnp.asarray([[1], [2], [1], [2]], jnp.int32)
    params = ea.init({"params": jax.random.PRNGKey(0)}, action)["params"]
    out = ea.apply({"params": params}, action)
    assert out.shape == (4, 1, D)
    np.testing.assert_allclose(np.asarray(out[:2]), 0.0)
    assert np.abs(np.asarray(out[2:])).sum() > 0


def test_controller_spk_ta_mode():
    ctrl = TextAudioController(out_dim=D, text_max_length=20,
                               audio_max_length=161)
    text_emb = jax.random.normal(jax.random.PRNGKey(0), (2, 9, D))
    text_mask = jnp.ones((2, 9), bool).at[1, 6:].set(False)
    mel = jax.random.normal(jax.random.PRNGKey(1), (2, 161, 80))
    params = ctrl.init({"params": jax.random.PRNGKey(2)}, text_emb,
                       text_mask, mel, "spk-ta")["params"]
    a, t, am, pad, fused = ctrl.apply({"params": params}, text_emb,
                                      text_mask, mel, "spk-ta")
    assert a.shape == (2, 161, D)
    assert fused.shape == (2, D, D)
    assert pad.dtype == jnp.bool_ and bool(pad[1, 7])
    # non-spk-ta mode returns no fused signal
    _, _, _, _, none_fused = ctrl.apply({"params": params}, text_emb,
                                        text_mask, mel, "lsn")
    assert none_fused is None
