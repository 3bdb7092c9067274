"""Fused 5-stream cross-attention must match the unfused reference path
exactly (same params through the converters)."""
import pytest
import numpy as np
import jax
import jax.numpy as jnp

from convofusion_tpu.models.denoiser import Denoiser
from convofusion_tpu.ops.fused_streams import fuse_denoiser_params
from convofusion_tpu.ops.transformer import COND_STREAMS

D = 64


def _cond(key, bs):
    ks = jax.random.split(key, 5)
    sizes = dict(spkemb=9, alsn=12, tlsn=7, apb=8, lsnemb=1)
    return {s: jax.random.normal(k, (bs, sizes[s], D))
            for s, k in zip(COND_STREAMS, ks)}


@pytest.mark.slow
def test_fused_denoiser_matches_unfused():
    bs = 2
    unfused = Denoiser(nfeats=189, latent_dim=32, ff_size=128,
                       num_layers=3, num_heads=4, dropout=0.0,
                       text_encoded_dim=D, audio_encoded_dim=D,
                       fuse_streams=False)
    fused = Denoiser(nfeats=189, latent_dim=32, ff_size=128,
                     num_layers=3, num_heads=4, dropout=0.0,
                     text_encoded_dim=D, audio_encoded_dim=D,
                     fuse_streams=True)

    sample = jax.random.normal(jax.random.PRNGKey(0), (bs, 16, 32))
    cond = _cond(jax.random.PRNGKey(1), bs)
    tlsn_pad = jnp.zeros((bs, 7), bool).at[0, 5:].set(True)
    masks = {"tlsn": tlsn_pad}

    params_u = unfused.init({"params": jax.random.PRNGKey(2)}, sample,
                            jnp.asarray(500), cond, masks)["params"]
    out_u, att_u = unfused.apply({"params": params_u}, sample,
                                 jnp.asarray(500), cond, masks)

    params_f = fuse_denoiser_params(params_u)
    out_f, att_f = fused.apply({"params": params_f}, sample,
                               jnp.asarray(500), cond, masks)

    np.testing.assert_allclose(np.asarray(out_f), np.asarray(out_u),
                               rtol=2e-4, atol=2e-4)
    for s in COND_STREAMS:
        np.testing.assert_allclose(
            np.asarray(att_f[s]), np.asarray(att_u[s]),
            rtol=2e-4, atol=2e-4)
