"""Golden-value parity tests: our JAX ops vs the reference torch modules.

The reference (read-only at /root/reference) is imported as an *oracle*: we
instantiate its torch modules, convert their state dicts through
``convofusion_tpu.compat.torch_loader`` and assert the fp32 outputs match.
"""
import numpy as np
import pytest

import jax
import jax.numpy as jnp

torch = pytest.importorskip("torch")

from convofusion_tpu.compat import torch_loader as tl
from convofusion_tpu.ops import (
    MultiheadAttention,
    PositionEmbeddingSine1D,
    PositionEmbeddingSineBH,
    SkipTransformerDecoder,
    SkipTransformerEncoder,
    TimeBlock,
    Timesteps,
    TimestepEmbedding,
    TransformerDecoderLayer2Att,
    DenoiserDecoder,
)
from convofusion_tpu.ops.transformer import COND_STREAMS

D = 64
RTOL = 2e-4
ATOL = 2e-4


def _np(x):
    return np.asarray(x)


@pytest.fixture(scope="module")
def ref(reference_path):
    torch.manual_seed(0)
    from convofusion.models.operator import cross_attention as ca
    from convofusion.models.operator import position_encoding as pe
    from convofusion.models.architectures.tools import embeddings as emb

    return ca, pe, emb


def test_mha_matches_torch(ref):
    ca, _, _ = ref
    torch.manual_seed(1)
    m = torch.nn.MultiheadAttention(D, 4, dropout=0.0, batch_first=False)
    m.eval()
    q = torch.randn(7, 2, D)
    k = torch.randn(11, 2, D)
    pad = torch.zeros(2, 11, dtype=torch.bool)
    pad[0, 8:] = True
    with torch.no_grad():
        out_t, w_t = m(q, k, k, key_padding_mask=pad)

    ours = MultiheadAttention(D, 4, dropout=0.0)
    sd = tl.to_numpy_state_dict(m)
    params = {"params": {
        "q_proj": {"kernel": sd["in_proj_weight"][:D].T,
                   "bias": sd["in_proj_bias"][:D]},
        "k_proj": {"kernel": sd["in_proj_weight"][D:2 * D].T,
                   "bias": sd["in_proj_bias"][D:2 * D]},
        "v_proj": {"kernel": sd["in_proj_weight"][2 * D:].T,
                   "bias": sd["in_proj_bias"][2 * D:]},
        "out_proj": {"kernel": sd["out_proj.weight"].T,
                     "bias": sd["out_proj.bias"]},
    }}
    out_j, w_j = ours.apply(
        params,
        jnp.asarray(q.numpy().transpose(1, 0, 2)),
        jnp.asarray(k.numpy().transpose(1, 0, 2)),
        jnp.asarray(k.numpy().transpose(1, 0, 2)),
        key_padding_mask=jnp.asarray(pad.numpy()),
    )
    np.testing.assert_allclose(
        _np(out_j), out_t.numpy().transpose(1, 0, 2), rtol=RTOL, atol=ATOL
    )
    np.testing.assert_allclose(_np(w_j), w_t.numpy(), rtol=RTOL, atol=ATOL)


def test_sine_pe_matches_torch(ref):
    _, pe, _ = ref
    mod = pe.PositionEmbeddingSine1D(D, max_len=64)
    x = torch.randn(10, 3, D)
    with torch.no_grad():
        out_t = mod(x.clone())
    ours = PositionEmbeddingSine1D(D, max_len=64)
    out_j = ours.apply({"params": {}},
                       jnp.asarray(x.numpy().transpose(1, 0, 2)))
    np.testing.assert_allclose(
        _np(out_j), out_t.numpy().transpose(1, 0, 2), rtol=1e-5, atol=1e-5
    )


def test_sine_bh_pe_matches_torch(ref):
    _, pe, _ = ref
    mod = pe.PositionEmbeddingSineBH(D, max_len=64)
    x = torch.randn(16, 3, D)
    with torch.no_grad():
        out_t = mod(x.clone())
    ours = PositionEmbeddingSineBH(D, max_len=64)
    out_j = ours.apply({"params": {}},
                       jnp.asarray(x.numpy().transpose(1, 0, 2)))
    np.testing.assert_allclose(
        _np(out_j), out_t.numpy().transpose(1, 0, 2), rtol=1e-5, atol=1e-5
    )


def test_timestep_embedding_matches_torch(ref):
    _, _, emb = ref
    torch.manual_seed(2)
    ts_mod = emb.Timesteps(D, flip_sin_to_cos=True, downscale_freq_shift=0)
    te_mod = emb.TimestepEmbedding(D, D)
    t = torch.tensor([0, 1, 17, 999])
    with torch.no_grad():
        sin_t = ts_mod(t)
        out_t = te_mod(sin_t)
    sin_j = Timesteps(D, True, 0.0).apply({"params": {}}, jnp.asarray(t.numpy()))
    np.testing.assert_allclose(_np(sin_j), sin_t.numpy(), rtol=1e-5, atol=1e-5)

    sd = tl.to_numpy_state_dict(te_mod)
    params = {"params": {
        "linear_1": {"kernel": sd["linear_1.weight"].T,
                     "bias": sd["linear_1.bias"]},
        "linear_2": {"kernel": sd["linear_2.weight"].T,
                     "bias": sd["linear_2.bias"]},
    }}
    out_j = TimestepEmbedding(D).apply(params, sin_j)
    np.testing.assert_allclose(_np(out_j), out_t.numpy(), rtol=RTOL, atol=ATOL)


def test_skip_encoder_matches_torch(ref):
    ca, _, _ = ref
    torch.manual_seed(3)
    layer = ca.TransformerEncoderLayer(D, 4, 128, 0.0, "gelu", True)
    norm = torch.nn.LayerNorm(D)
    enc = ca.SkipTransformerEncoder(layer, 5, norm)
    enc.eval()
    x = torch.randn(18, 2, D)
    pad = torch.zeros(2, 18, dtype=torch.bool)
    pad[1, 15:] = True
    with torch.no_grad():
        out_t = enc(x, src_key_padding_mask=pad)

    ours = SkipTransformerEncoder(D, 5, 4, 128, 0.0, "gelu", True)
    sd = {f"m.{k}": v for k, v in tl.to_numpy_state_dict(enc).items()}
    params = {"params": tl.skip_encoder(sd, "m", D, 5)}
    out_j = ours.apply(
        params,
        jnp.asarray(x.numpy().transpose(1, 0, 2)),
        src_key_padding_mask=jnp.asarray(pad.numpy()),
    )
    np.testing.assert_allclose(
        _np(out_j), out_t.numpy().transpose(1, 0, 2), rtol=1e-3, atol=1e-3
    )


def test_skip_decoder_matches_torch(ref):
    ca, _, _ = ref
    torch.manual_seed(4)
    layer = ca.TransformerDecoderLayer(D, 4, 128, 0.0, "gelu", True)
    norm = torch.nn.LayerNorm(D)
    dec = ca.SkipTransformerDecoder(layer, 5, norm)
    dec.eval()
    tgt = torch.randn(32, 2, D)
    mem = torch.randn(8, 2, D)
    with torch.no_grad():
        out_t = dec(tgt, mem)

    ours = SkipTransformerDecoder(D, 5, 4, 128, 0.0, "gelu", True)
    sd = {f"m.{k}": v for k, v in tl.to_numpy_state_dict(dec).items()}
    params = {"params": tl.skip_decoder(sd, "m", D, 5)}
    out_j = ours.apply(
        params,
        jnp.asarray(tgt.numpy().transpose(1, 0, 2)),
        jnp.asarray(mem.numpy().transpose(1, 0, 2)),
    )
    np.testing.assert_allclose(
        _np(out_j), out_t.numpy().transpose(1, 0, 2), rtol=1e-3, atol=1e-3
    )


def test_decoder_layer_2att_matches_torch(ref):
    ca, _, _ = ref
    torch.manual_seed(5)
    layer = ca.TransformerDecoderLayer2Att(D, 4, 128, 0.0, "gelu", True)
    layer.eval()
    bs = 2
    tgt = torch.randn(16, bs, D)
    time_embed = torch.randn(1, bs, D)
    mems = {
        "spkemb": torch.randn(9, bs, D),
        "alsn": torch.randn(12, bs, D),
        "tlsn": torch.randn(7, bs, D),
        "apb": torch.randn(8, bs, D),
        "lsnemb": torch.randn(1, bs, D),
    }
    tlsn_pad = torch.zeros(bs, 7, dtype=torch.bool)
    tlsn_pad[0, 5:] = True
    mask_dict = {"tlsn": tlsn_pad, "spkemb": None, "alsn": None,
                 "apb": None, "lsnemb": None}
    with torch.no_grad():
        out_t, att_t = layer(
            tgt, [mems[s] for s in COND_STREAMS], None, time_embed,
            memory_key_padding_mask=mask_dict,
        )

    ours = TransformerDecoderLayer2Att(D, 4, 128, 0.0, "gelu", True)
    sd = {f"m.{k}": v for k, v in tl.to_numpy_state_dict(layer).items()}
    params = {"params": tl.decoder_layer_2att(sd, "m", D)}
    mem_j = {s: jnp.asarray(mems[s].numpy().transpose(1, 0, 2))
             for s in COND_STREAMS}
    out_j, att_j = ours.apply(
        params,
        jnp.asarray(tgt.numpy().transpose(1, 0, 2)),
        mem_j,
        jnp.asarray(time_embed.numpy().transpose(1, 0, 2)),
        {"tlsn": jnp.asarray(tlsn_pad.numpy())},
    )
    np.testing.assert_allclose(
        _np(out_j), out_t.numpy().transpose(1, 0, 2), rtol=1e-3, atol=1e-3
    )
    for i, s in enumerate(COND_STREAMS):
        np.testing.assert_allclose(
            _np(att_j[s]), att_t[i].numpy(), rtol=1e-3, atol=1e-3
        )


def test_denoiser_decoder_stack_matches_torch(ref):
    ca, _, _ = ref
    torch.manual_seed(6)
    layer = ca.TransformerDecoderLayer2Att(D, 4, 128, 0.0, "gelu", True)
    norm = torch.nn.LayerNorm(D)
    dec = ca.TransformerDecoder(layer, 3, norm)
    dec.eval()
    bs = 2
    tgt = torch.randn(16, bs, D)
    time_embed = torch.randn(1, bs, D)
    mems = {s: torch.randn(n, bs, D) for s, n in
            zip(COND_STREAMS, [9, 12, 7, 8, 1])}
    with torch.no_grad():
        out_t, att_t = dec(
            tgt, [mems[s] for s in COND_STREAMS], None, time_embed,
            memory_key_padding_mask={s: None for s in COND_STREAMS},
        )

    ours = DenoiserDecoder(D, 3, 4, 128, 0.0, "gelu", True)
    sd = {f"m.{k}": v for k, v in tl.to_numpy_state_dict(dec).items()}
    params = {"params": tl.denoiser_decoder(sd, "m", D, 3)}
    mem_j = {s: jnp.asarray(mems[s].numpy().transpose(1, 0, 2))
             for s in COND_STREAMS}
    out_j, att_j = ours.apply(
        params,
        jnp.asarray(tgt.numpy().transpose(1, 0, 2)),
        mem_j,
        jnp.asarray(time_embed.numpy().transpose(1, 0, 2)),
    )
    # torch returns output with a leading singleton dim (unsqueeze(0))
    np.testing.assert_allclose(
        _np(out_j), out_t.numpy()[0].transpose(1, 0, 2), rtol=1e-3, atol=1e-3
    )
    # att mats: (bs, layers, tq, tk)
    for i, s in enumerate(COND_STREAMS):
        np.testing.assert_allclose(
            _np(att_j[s]), att_t[i].numpy(), rtol=1e-3, atol=1e-3
        )
