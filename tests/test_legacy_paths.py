"""Legacy ablation paths from the inventory: all_encoder VAE, MLP_DIST,
trans_enc denoiser (text / action / text+audio), EmbedAction, spk-ta
controller.

Numeric goldens vs torch are included for every legacy path the
reference can actually execute (mlp_dist encode, EmbedAction).  The rest
is DEAD CODE in the shipped reference — proven here by running it:
  * arch='trans_enc' crashes for EVERY condition: 'text'/'action' hit a
    NameError on spk_emb (denoiser.py:288 uses text+audio stream vars
    unconditionally) and 'text+audio' hits aspk/tspk (commented out at
    :246-249, used at :288);
  * arch='all_encoder' decode crashes on the renamed-away `zb`
    (vae.py:300).
Our implementations of those paths are therefore covered by
shape/finiteness tests only, as the strongest oracle available.
"""
from types import SimpleNamespace

import numpy as np
import pytest
import jax
import jax.numpy as jnp

from convofusion_tpu.models.audioenc import TextAudioController
from convofusion_tpu.models.denoiser import Denoiser, EmbedAction
from convofusion_tpu.models.vae import ConvoFusionVae
from convofusion_tpu.ops.transformer import COND_STREAMS

D = 32
ABL_MLP = SimpleNamespace(
    MLP_DIST=True, PE_TYPE="convofusion", SKIP_CONNECT=False,
    VAE_TYPE="convofusion", DIFF_PE_TYPE="convofusion", CAUSAL_ATTN=False)
ABL_STD = SimpleNamespace(
    MLP_DIST=False, PE_TYPE="convofusion", SKIP_CONNECT=False,
    VAE_TYPE="convofusion", DIFF_PE_TYPE="convofusion", CAUSAL_ATTN=False)


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


def test_vae_mlp_dist_encode_matches_torch(reference_path):
    """MLP_DIST encode golden: body/hands_dist_layer mu/logvar vs torch
    (vae.py:135-141,241-249)."""
    torch = pytest.importorskip("torch")
    from convofusion.models.architectures.vae import (
        ConvoFusionVae as TorchVae,
    )

    from convofusion_tpu.compat import torch_loader as tl

    torch.manual_seed(20)
    m = TorchVae(
        ablation=ABL_MLP, nfeats=189, latent_dim=[1, D], ff_size=64,
        num_layers=3, num_heads=2, dropout=0.0, arch="encoder_decoder",
        normalize_before=True, activation="gelu",
        position_embedding="sine")
    m.eval()
    bs, frames = 2, 128
    feats = torch.randn(bs, frames, 189)
    with torch.no_grad():
        _, dist_t, _ = m.encode(feats.clone(), [frames] * bs)

    ours = ConvoFusionVae(
        nfeats=189, latent_dim=D, ff_size=64, num_layers=3, num_heads=2,
        dropout=0.0, normalize_before=True, activation="gelu",
        position_embedding="sine", mlp_dist=True)
    sd = tl.to_numpy_state_dict(m)
    params = tl.vae_params(sd, D, 3)
    params["body_dist_layer"] = tl.linear(sd, "body_dist_layer")
    params["hands_dist_layer"] = tl.linear(sd, "hands_dist_layer")

    _, (mu_j, logvar_j), _ = ours.apply(
        {"params": params}, jnp.asarray(feats.numpy()),
        method=ours.encode)
    np.testing.assert_allclose(
        np.asarray(mu_j).reshape(2, bs * 8, D), dist_t.loc.numpy(),
        rtol=2e-3, atol=2e-3)
    np.testing.assert_allclose(
        np.asarray(jnp.exp(0.5 * logvar_j)).reshape(2, bs * 8, D),
        dist_t.scale.numpy(), rtol=2e-3, atol=2e-3)


def test_embed_action_matches_torch(reference_path):
    """EmbedAction golden incl. guided first-half zeroing
    (denoiser.py:389-437)."""
    torch = pytest.importorskip("torch")
    from convofusion.models.architectures.denoiser import (
        EmbedAction as TorchEA,
    )

    torch.manual_seed(21)
    m = TorchEA(5, D, guidance_scale=7.5)
    m.eval()
    action = torch.tensor([[1], [2], [3], [4]])
    with torch.no_grad():
        out_t = m(action)          # (1, B, D): uncond half zeroed

    ours = EmbedAction(num_actions=5, latent_dim=D, guidance_scale=7.5)
    params = {"action_embedding": m.action_embedding.detach().numpy()}
    out_j = ours.apply({"params": params},
                       jnp.asarray(action.numpy(), jnp.int32))
    # ours is (B, 1, D); torch is (1, B, D)
    np.testing.assert_allclose(
        np.asarray(out_j)[:, 0], out_t[0].numpy(), rtol=1e-5, atol=1e-6)


def test_reference_trans_enc_is_dead_code(reference_path):
    """The shipped reference cannot run arch='trans_enc' for any
    condition (NameError on spk_emb / aspk, denoiser.py:288)."""
    torch = pytest.importorskip("torch")
    from convofusion.models.architectures.denoiser import (
        Denoiser as TorchDenoiser,
    )

    def build(condition):
        return TorchDenoiser(
            ablation=ABL_STD, nfeats=189, condition=condition,
            latent_dim=[1, D], ff_size=64, num_layers=3, num_heads=4,
            dropout=0.0, normalize_before=True, activation="gelu",
            flip_sin_to_cos=True, return_intermediate_dec=False,
            position_embedding="sine", arch="trans_enc", freq_shift=0,
            text_encoded_dim=64, audio_encoded_dim=64).eval()

    sample = torch.randn(2, 16, D)
    t = torch.tensor(100)
    with pytest.raises(NameError):
        build("text")(sample, t, torch.randn(2, 11, 64))
    with pytest.raises(NameError):
        cond = [torch.randn(2, n, 64) for n in (9, 12, 7, 8, 1)]
        build("text+audio")(sample, t, cond)


def test_reference_all_encoder_decode_is_dead_code(reference_path):
    """all_encoder decode crashes on the renamed `zb` (vae.py:300)."""
    torch = pytest.importorskip("torch")
    from convofusion.models.architectures.vae import (
        ConvoFusionVae as TorchVae,
    )

    m = TorchVae(
        ablation=ABL_STD, nfeats=189, latent_dim=[1, D], ff_size=64,
        num_layers=3, num_heads=2, dropout=0.0, arch="all_encoder",
        normalize_before=True, activation="gelu",
        position_embedding="sine").eval()
    z = torch.randn(2, 2, 8, D)
    with pytest.raises(NameError):
        m.decode(z, [128, 128])


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


def test_causal_attn_knob_rejected():
    """ABLATION.CAUSAL_ATTN is a broken reference knob: is_causal=True
    without attn_mask on its cross-attentions raises in torch
    (cross_attention.py:597-622), so this framework rejects it loudly
    instead of inventing semantics."""
    import pytest as _pytest

    from convofusion_tpu.models.factory import build_denoiser

    with _pytest.raises(ValueError, match="CAUSAL_ATTN"):
        build_denoiser(ablation={"CAUSAL_ATTN": True})
    # default-off constructs fine
    build_denoiser(ablation={"CAUSAL_ATTN": False})
