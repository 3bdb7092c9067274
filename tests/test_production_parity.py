"""Production-topology parity: torch-vs-JAX goldens at the REAL config
geometry, closing the fidelity chain that test_models_parity.py proves
only at toy dims (VERDICT r2 "missing" #2).

Geometries pinned here, straight from the reference configs:
- Denoiser: 9 layers x 512-d x 4 heads, ff 1024, latent 128, with the
  full 5-stream condition geometry (spk text 202, mel 161, lsn text 202,
  apb 8, lsn id 1) — configs/modules/denoiser.yaml +
  configs/config_cf_beatdnd.yaml:119 (latent_dim [1,128])
- VAE: 5 layers x 128-d x 2 heads, ff 1024 at (B,128,189) —
  configs/modules/motion_vae.yaml
- T5: t5-base geometry (768/3072, 12 layers, 12 heads, d_kv 64) over
  96-token text so relative-position distances leave the exact-bucket
  regime (>8 uses the logarithmic buckets,
  convofusion/models/architectures/t5.py via transformers T5) — weights
  random but transplanted, which pins the MATH at production shape
- AudioConvEncoder at its real 80 -> 256 -> 512 MLP dims
  (audioenc.py:13-21)

A dim- or bucket-regime-dependent bug passes the toy suite but fails
here. All tests are `slow` (CPU batch-2 forward passes, a few seconds
each; the t5-base transplant dominates).
"""
from types import SimpleNamespace

import numpy as np
import pytest
import jax.numpy as jnp

torch = pytest.importorskip("torch")

from convofusion_tpu.compat import torch_loader as tl
from convofusion_tpu.models.audioenc import AudioConvEncoder
from convofusion_tpu.models.denoiser import Denoiser
from convofusion_tpu.models.vae import ConvoFusionVae
from convofusion_tpu.ops.transformer import COND_STREAMS

pytestmark = pytest.mark.slow

ABL = SimpleNamespace(
    MLP_DIST=False, PE_TYPE="convofusion", SKIP_CONNECT=False,
    VAE_TYPE="convofusion", DIFF_PE_TYPE="convofusion", CAUSAL_ATTN=False)

LAT_D = 128     # model.latent_dim [1, 128]
TXT_D = 512     # denoiser.yaml text/audio_encoded_dim
FF = 1024


def test_vae_production_geometry(reference_path):
    """5-layer / 128-d / ff-1024 VAE over (2,128,189) clips."""
    torch.manual_seed(30)
    from convofusion.models.architectures.vae import (
        ConvoFusionVae as TorchVae,
    )

    m = TorchVae(
        ablation=ABL, nfeats=189, latent_dim=[1, LAT_D], ff_size=FF,
        num_layers=5, num_heads=2, dropout=0.0, arch="encoder_decoder",
        normalize_before=True, activation="gelu",
        position_embedding="sine")
    m.eval()

    torch.manual_seed(31)
    bs, frames = 2, 128
    feats = torch.randn(bs, frames, 189)
    lengths = [frames] * bs
    with torch.no_grad():
        latent_t, dist_t, mfeats_t = m.encode(feats.clone(), lengths)
        recon_t = m.decode(latent_t.clone(), lengths)

    ours = ConvoFusionVae(
        nfeats=189, latent_dim=LAT_D, ff_size=FF, num_layers=5,
        num_heads=2, dropout=0.0, normalize_before=True,
        activation="gelu", position_embedding="sine")
    params = {"params": tl.vae_params(tl.to_numpy_state_dict(m), LAT_D, 5)}

    latent_j, (mu_j, logvar_j), mfeats_j = ours.apply(
        params, jnp.asarray(feats.numpy()), method=ours.encode)
    np.testing.assert_allclose(
        np.asarray(mu_j).reshape(2, bs * 8, LAT_D), dist_t.loc.numpy(),
        rtol=2e-3, atol=2e-3)
    np.testing.assert_allclose(
        np.asarray(mfeats_j), mfeats_t.numpy(), rtol=1e-4, atol=1e-4)

    recon_j = ours.apply(params, jnp.asarray(latent_t.numpy()), frames,
                         method=ours.decode)
    np.testing.assert_allclose(
        np.asarray(recon_j), recon_t.numpy(), rtol=2e-3, atol=2e-3)


def test_denoiser_production_geometry(reference_path):
    """9x512x4-head denoiser, latent 128, real 5-stream condition
    lengths (202/161/202/8/1) with padded text streams."""
    torch.manual_seed(32)
    from convofusion.models.architectures.denoiser import (
        Denoiser as TorchDenoiser,
    )

    m = TorchDenoiser(
        ablation=ABL, nfeats=189, condition="text+audio",
        latent_dim=[1, LAT_D], ff_size=FF, num_layers=9, num_heads=4,
        dropout=0.0, normalize_before=True, activation="gelu",
        flip_sin_to_cos=True, return_intermediate_dec=False,
        position_embedding="sine", arch="trans_dec", freq_shift=0,
        text_encoded_dim=TXT_D, audio_encoded_dim=TXT_D)
    m.eval()

    torch.manual_seed(33)
    bs = 2
    sample = torch.randn(bs, 16, LAT_D)
    t = torch.tensor(777)
    lens = {"spkemb": 202, "alsn": 161, "tlsn": 202, "apb": 8,
            "lsnemb": 1}
    cond = {k: torch.randn(bs, n, TXT_D) for k, n in lens.items()}
    # realistic ragged text: row 0 long, row 1 short
    masks = {}
    for s, used in (("spkemb", (180, 44)), ("tlsn", (202, 9))):
        pad = torch.zeros(bs, lens[s], dtype=torch.bool)
        pad[0, used[0]:] = True
        pad[1, used[1]:] = True
        masks[s] = pad
    with torch.no_grad():
        out_t, att_t = m(
            sample.clone(), t, [cond[s] for s in COND_STREAMS],
            lengths=None, mem_mask_dict=masks)

    ours = Denoiser(
        nfeats=189, latent_dim=LAT_D, ff_size=FF, num_layers=9,
        num_heads=4, dropout=0.0, normalize_before=True,
        activation="gelu", text_encoded_dim=TXT_D, audio_encoded_dim=TXT_D)
    params = {"params": tl.denoiser_params(
        tl.to_numpy_state_dict(m), TXT_D, 9)}
    out_j, att_j = ours.apply(
        params, jnp.asarray(sample.numpy()), jnp.asarray(777),
        {k: jnp.asarray(v.numpy()) for k, v in cond.items()},
        {k: jnp.asarray(v.numpy()) for k, v in masks.items()})
    np.testing.assert_allclose(
        np.asarray(out_j), out_t.numpy(), rtol=2e-3, atol=2e-3)
    for i, s in enumerate(COND_STREAMS):
        np.testing.assert_allclose(
            np.asarray(att_j[s]), att_t[i].numpy(), rtol=2e-3, atol=2e-3)


def test_t5_base_geometry_long_text():
    """t5-base-geometry stack (768/3072, 12L, 12H, d_kv 64) over 96
    tokens: relative distances up to 95 exercise the logarithmic
    position buckets (exact buckets only cover |d| < 8)."""
    from transformers import T5Config, T5EncoderModel

    from convofusion_tpu.models.t5 import T5EncoderStack, t5_params_from_torch

    torch.manual_seed(34)
    cfg = T5Config(
        vocab_size=4096, d_model=768, d_kv=64, d_ff=3072, num_layers=12,
        num_heads=12, feed_forward_proj="relu", dropout_rate=0.0)
    m = T5EncoderModel(cfg)
    m.eval()
    ids = torch.randint(0, 4096, (2, 96))
    mask = torch.ones(2, 96, dtype=torch.long)
    mask[1, 70:] = 0
    with torch.no_grad():
        out_t = m(input_ids=ids, attention_mask=mask).last_hidden_state

    ours = T5EncoderStack(
        vocab_size=4096, d_model=768, d_ff=3072, num_layers=12,
        num_heads=12, d_kv=64, dropout=0.0)
    params = {"params": t5_params_from_torch(
        tl.to_numpy_state_dict(m), num_layers=12)}
    out_j = ours.apply(
        params, jnp.asarray(ids.numpy()),
        jnp.asarray(mask.numpy().astype(bool)))
    np.testing.assert_allclose(
        np.asarray(out_j), out_t.numpy(), rtol=2e-3, atol=2e-3)


def test_audio_encoder_production_dims(reference_path):
    """The real 80 -> 256 -> 512 audio MLP (audioenc.py:13-21)."""
    torch.manual_seed(35)
    from convofusion.models.architectures.audioenc import (
        AudioConvEncoder as TorchAE,
    )

    m = TorchAE(80, 256, TXT_D, max_seq_len=128, fps=25,
                sample_rate=16000, hop_length=512)
    m.eval()
    x = torch.randn(2, 161, 80)
    with torch.no_grad():
        out_t = m(x)
    sd = tl.to_numpy_state_dict(m)
    params = {"params": {
        "main_0": {"kernel": sd["main.0.weight"].T,
                   "bias": sd["main.0.bias"]},
        "main_3": {"kernel": sd["main.3.weight"].T,
                   "bias": sd["main.3.bias"]},
        "out_net": tl.linear(sd, "out_net"),
    }}
    ours = AudioConvEncoder(80, 256, TXT_D, dropout=0.0)
    out_j = ours.apply(params, jnp.asarray(x.numpy()))
    np.testing.assert_allclose(
        np.asarray(out_j), out_t.numpy(), rtol=1e-4, atol=1e-4)
