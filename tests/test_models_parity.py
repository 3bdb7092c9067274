"""Model-level parity: VAE, denoiser, audio encoder, T5 stack vs torch."""
from types import SimpleNamespace

import numpy as np
import pytest
import jax
import jax.numpy as jnp

torch = pytest.importorskip("torch")

from convofusion_tpu.compat import torch_loader as tl
from convofusion_tpu.models.vae import ConvoFusionVae
from convofusion_tpu.models.denoiser import Denoiser
from convofusion_tpu.models.audioenc import AudioConvEncoder, audio_num_frames
from convofusion_tpu.ops.transformer import COND_STREAMS

D = 64
ABL = SimpleNamespace(
    MLP_DIST=False, PE_TYPE="convofusion", SKIP_CONNECT=False,
    VAE_TYPE="convofusion", DIFF_PE_TYPE="convofusion", CAUSAL_ATTN=False)


@pytest.fixture(scope="module")
def ref_vae(reference_path):
    torch.manual_seed(10)
    from convofusion.models.architectures.vae import (
        ConvoFusionVae as TorchVae,
    )

    m = TorchVae(
        ablation=ABL, nfeats=189, latent_dim=[1, D], ff_size=128,
        num_layers=5, num_heads=2, dropout=0.0, arch="encoder_decoder",
        normalize_before=True, activation="gelu", position_embedding="sine")
    m.eval()
    return m


def test_vae_encode_decode_matches_torch(ref_vae):
    torch.manual_seed(11)
    bs, frames = 2, 128
    feats = torch.randn(bs, frames, 189)
    lengths = [frames] * bs
    with torch.no_grad():
        latent_t, dist_t, mfeats_t = ref_vae.encode(feats.clone(), lengths)
        recon_t = ref_vae.decode(latent_t.clone(), lengths)

    ours = ConvoFusionVae(
        nfeats=189, latent_dim=D, ff_size=128, num_layers=5, num_heads=2,
        dropout=0.0, normalize_before=True, activation="gelu",
        position_embedding="sine")
    sd = tl.to_numpy_state_dict(ref_vae)
    params = {"params": tl.vae_params(sd, D, 5)}

    latent_j, (mu_j, logvar_j), mfeats_j = ours.apply(
        params, jnp.asarray(feats.numpy()), method=ours.encode)

    # torch latent is a random sample; compare the deterministic mean +
    # chunk-normalized features instead
    mu_t = dist_t.loc  # (2, bs*8, D)
    np.testing.assert_allclose(
        np.asarray(mu_j).reshape(2, bs * 8, D), mu_t.numpy(),
        rtol=2e-3, atol=2e-3)
    np.testing.assert_allclose(
        np.asarray(mfeats_j), mfeats_t.numpy(), rtol=1e-4, atol=1e-4)

    # decode parity on the same latent
    lat = jnp.asarray(latent_t.numpy())  # (2, bs, 8, D)
    recon_j = ours.apply(params, lat, frames, method=ours.decode)
    np.testing.assert_allclose(
        np.asarray(recon_j), recon_t.numpy(), rtol=2e-3, atol=2e-3)


def test_denoiser_matches_torch(reference_path):
    torch.manual_seed(12)
    from convofusion.models.architectures.denoiser import (
        Denoiser as TorchDenoiser,
    )

    m = TorchDenoiser(
        ablation=ABL, nfeats=189, condition="text+audio", latent_dim=[1, 32],
        ff_size=128, num_layers=3, num_heads=4, dropout=0.0,
        normalize_before=True, activation="gelu", flip_sin_to_cos=True,
        return_intermediate_dec=False, position_embedding="sine",
        arch="trans_dec", freq_shift=0, text_encoded_dim=D,
        audio_encoded_dim=D)
    m.eval()

    bs = 2
    sample = torch.randn(bs, 16, 32)
    t = torch.tensor(500)
    cond = {
        "spkemb": torch.randn(bs, 9, D),
        "alsn": torch.randn(bs, 12, D),
        "tlsn": torch.randn(bs, 7, D),
        "apb": torch.randn(bs, 8, D),
        "lsnemb": torch.randn(bs, 1, D),
    }
    tlsn_pad = torch.zeros(bs, 7, dtype=torch.bool)
    tlsn_pad[0, 5:] = True
    masks = {"tlsn": tlsn_pad}
    with torch.no_grad():
        out_t, att_t = m(
            sample.clone(), t, [cond[s] for s in COND_STREAMS],
            lengths=None, mem_mask_dict=masks)

    ours = Denoiser(
        nfeats=189, latent_dim=32, ff_size=128, num_layers=3, num_heads=4,
        dropout=0.0, normalize_before=True, activation="gelu",
        text_encoded_dim=D, audio_encoded_dim=D)
    sd = tl.to_numpy_state_dict(m)
    params = {"params": tl.denoiser_params(sd, D, 3)}
    out_j, att_j = ours.apply(
        params,
        jnp.asarray(sample.numpy()),
        jnp.asarray(500),
        {k: jnp.asarray(v.numpy()) for k, v in cond.items()},
        {"tlsn": jnp.asarray(tlsn_pad.numpy())},
    )
    np.testing.assert_allclose(
        np.asarray(out_j), out_t.numpy(), rtol=2e-3, atol=2e-3)
    for i, s in enumerate(COND_STREAMS):
        np.testing.assert_allclose(
            np.asarray(att_j[s]), att_t[i].numpy(), rtol=2e-3, atol=2e-3)


def test_audio_encoder_matches_torch(reference_path):
    torch.manual_seed(13)
    from convofusion.models.architectures.audioenc import (
        AudioConvEncoder as TorchAE,
    )

    m = TorchAE(80, 32, D, max_seq_len=128, fps=25, sample_rate=16000,
                hop_length=512)
    m.eval()
    assert m.audio_max_length == audio_num_frames(128, 25, 16000, 512) == 161
    x = torch.randn(2, 161, 80)
    with torch.no_grad():
        out_t = m(x)
    sd = tl.to_numpy_state_dict(m)
    params = {"params": {
        "main_0": {"kernel": sd["main.0.weight"].T, "bias": sd["main.0.bias"]},
        "main_3": {"kernel": sd["main.3.weight"].T, "bias": sd["main.3.bias"]},
        "out_net": tl.linear(sd, "out_net"),
    }}
    ours = AudioConvEncoder(80, 32, D, dropout=0.0)
    out_j = ours.apply(params, jnp.asarray(x.numpy()))
    np.testing.assert_allclose(
        np.asarray(out_j), out_t.numpy(), rtol=1e-4, atol=1e-4)


def test_t5_stack_matches_transformers():
    """Our native T5 encoder vs a randomly initialized HF torch T5."""
    from transformers import T5Config, T5EncoderModel

    from convofusion_tpu.models.t5 import T5EncoderStack, t5_params_from_torch

    torch.manual_seed(14)
    cfg = T5Config(
        vocab_size=100, d_model=32, d_kv=8, d_ff=64, num_layers=3,
        num_heads=4, feed_forward_proj="relu", dropout_rate=0.0)
    m = T5EncoderModel(cfg)
    m.eval()
    ids = torch.randint(0, 100, (2, 11))
    mask = torch.ones(2, 11, dtype=torch.long)
    mask[1, 8:] = 0
    with torch.no_grad():
        out_t = m(input_ids=ids, attention_mask=mask).last_hidden_state

    ours = T5EncoderStack(
        vocab_size=100, d_model=32, d_ff=64, num_layers=3, num_heads=4,
        d_kv=8, dropout=0.0)
    params = {"params": t5_params_from_torch(
        tl.to_numpy_state_dict(m), num_layers=3)}
    out_j = ours.apply(
        params, jnp.asarray(ids.numpy()),
        jnp.asarray(mask.numpy().astype(bool)))
    np.testing.assert_allclose(
        np.asarray(out_j), out_t.numpy(), rtol=2e-3, atol=2e-3)
