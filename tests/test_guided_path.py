"""The guidance-aware denoiser path must exactly match tiling the batch 7x
with per-branch assembled conditions (the reference's formulation)."""
import pytest
import numpy as np
import jax
import jax.numpy as jnp

from convofusion_tpu.models.denoiser import Denoiser
from convofusion_tpu.ops.transformer import (
    COND_STREAMS,
    GUIDANCE_BRANCHES,
    NUM_BRANCHES,
)

D = 64


def _cond(key, bs):
    ks = jax.random.split(key, 5)
    sizes = dict(spkemb=9, alsn=12, tlsn=7, apb=8, lsnemb=1)
    return {s: jax.random.normal(k, (bs, sizes[s], D))
            for s, k in zip(COND_STREAMS, ks)}


@pytest.mark.slow
def test_guided_matches_tiled_assembly():
    bs = 2
    den = Denoiser(nfeats=189, latent_dim=32, ff_size=128, num_layers=3,
                   num_heads=4, dropout=0.0, text_encoded_dim=D,
                   audio_encoded_dim=D)
    sample = jax.random.normal(jax.random.PRNGKey(0), (bs, 16, 32))
    cond_real = _cond(jax.random.PRNGKey(1), bs)
    cond_unc = _cond(jax.random.PRNGKey(2), bs)
    masks_real = {
        "tlsn": jnp.zeros((bs, 7), bool).at[0, 5:].set(True),
        "spkemb": jnp.zeros((bs, 9), bool).at[1, 6:].set(True),
    }
    masks_unc = {
        "tlsn": jnp.zeros((bs, 7), bool).at[:, 1:].set(True),
        "spkemb": jnp.zeros((bs, 9), bool).at[:, 1:].set(True),
    }
    params = den.init({"params": jax.random.PRNGKey(3)}, sample,
                      jnp.asarray(500), cond_real, masks_real)["params"]

    # reference formulation: tile sample, assemble per-branch memories
    cond7 = {
        s: jnp.concatenate(
            [cond_real[s] if s in GUIDANCE_BRANCHES[g] else cond_unc[s]
             for g in range(NUM_BRANCHES)], axis=0)
        for s in COND_STREAMS
    }
    masks7 = {
        s: jnp.concatenate(
            [masks_real[s] if s in GUIDANCE_BRANCHES[g] else masks_unc[s]
             for g in range(NUM_BRANCHES)], axis=0)
        for s in masks_real
    }
    tiled = jnp.tile(sample, (NUM_BRANCHES, 1, 1))
    out_ref, att_ref = den.apply({"params": params}, tiled,
                                 jnp.asarray(500), cond7, masks7)
    out_ref = out_ref.reshape(NUM_BRANCHES, bs, 16, 32)

    out_g, att_g = den.apply(
        {"params": params}, sample, jnp.asarray(500), cond_real, cond_unc,
        masks_real, masks_unc, method=den.guided)

    np.testing.assert_allclose(np.asarray(out_g), np.asarray(out_ref),
                               rtol=2e-4, atol=2e-4)
    # full-condition branch attention maps must match chunk(-1)
    for s in COND_STREAMS:
        np.testing.assert_allclose(
            np.asarray(att_g[s]), np.asarray(att_ref[s][-bs:]),
            rtol=2e-4, atol=2e-4)


@pytest.mark.slow
def test_single_row_uncond_matches_tiled_uncond():
    """encode_uncond now returns (1, ...) broadcastable rows; the guided
    sampler must produce the same latents as with the rows tiled to B
    (shared-KV case in ops/attention.grouped_attend)."""
    import jax
    import jax.numpy as jnp
    import numpy as np

    from convofusion_tpu.config.testing import tiny_config
    from convofusion_tpu.data.synthetic import (
        prepare_arrays,
        synthetic_raw_batch,
    )
    from convofusion_tpu.models.convofusion import Convofusion

    cfg = tiny_config("diffusion")
    cfg.model.scheduler["num_inference_timesteps"] = 4
    model = Convofusion(cfg)
    params = model.init_params(jax.random.PRNGKey(0))
    raw = synthetic_raw_batch(2, 4)
    batch, _, _ = prepare_arrays(model, raw)
    b = batch["lsn_ids"].shape[0]

    cond_real, masks_real = model.encode_conditions(
        params, batch["spk_ids"], batch["spk_tmask"], batch["lsn_ids"],
        batch["lsn_tmask"], batch["melspec_lsn"],
        batch["active_passive_lsn"], batch["lsn_id"])
    cond_unc1, masks_unc1 = model.encode_uncond(params, batch)
    assert all(v.shape[0] == 1 for v in cond_unc1.values())

    tile = lambda t: jax.tree_util.tree_map(  # noqa: E731
        lambda x: jnp.broadcast_to(x, (b,) + x.shape[1:]), t)

    key = jax.random.PRNGKey(5)
    lat1, _ = model.diffusion_reverse(
        params, cond_real, masks_real, cond_unc1, masks_unc1, key, b,
        num_inference_steps=4)
    latB, _ = model.diffusion_reverse(
        params, cond_real, masks_real, tile(cond_unc1),
        tile(masks_unc1), key, b, num_inference_steps=4)
    # same math, different contraction order (the shared-KV einsum drops
    # the broadcast batch dim) — fp32 noise amplified by the reverse
    # process's 1/sqrt(alpha) scalings across steps
    np.testing.assert_allclose(np.asarray(lat1), np.asarray(latB),
                               rtol=1e-3, atol=1e-3)


@pytest.mark.slow
def test_precomputed_kv_matches_direct_paths():
    """Per-step memory K/V sharing: (a) forward_kv with the text-only
    variant selection == __call__ over the assembled branch-1 condition;
    (b) guided(kvs=precompute_step_kv(...)) == guided without kvs."""
    bs = 2
    den = Denoiser(nfeats=189, latent_dim=32, ff_size=128, num_layers=3,
                   num_heads=4, dropout=0.0, text_encoded_dim=D,
                   audio_encoded_dim=D)
    sample = jax.random.normal(jax.random.PRNGKey(10), (bs, 16, 32))
    t = jnp.asarray(414)
    cond_real = _cond(jax.random.PRNGKey(11), bs)
    # single-row uncond (encode_uncond layout)
    cond_unc = _cond(jax.random.PRNGKey(12), 1)
    masks_real = {
        "tlsn": jnp.zeros((bs, 7), bool).at[0, 5:].set(True),
        "spkemb": jnp.zeros((bs, 9), bool).at[1, 6:].set(True),
    }
    masks_unc = {
        "tlsn": jnp.zeros((1, 7), bool).at[:, 3:].set(True),
        "spkemb": jnp.zeros((1, 9), bool).at[:, 2:].set(True),
    }
    params = den.init(jax.random.PRNGKey(13), sample, t, cond_real)

    kvs = den.apply(params, t, cond_real, cond_unc,
                    method=den.precompute_step_kv)

    # (a) text-only pass: tlsn real, all other streams uncond (branch 1)
    select = {s: ("real" if s == "tlsn" else "unc") for s in COND_STREAMS}
    out_kv, att_kv = den.apply(
        params, sample, t, kvs,
        {s: (masks_real[s] if s == "tlsn" else masks_unc[s])
         for s in ("tlsn", "spkemb")},
        select, method=den.forward_kv)
    cond_text = {s: (cond_real[s] if s == "tlsn" else
                     jnp.broadcast_to(cond_unc[s],
                                      (bs,) + cond_unc[s].shape[1:]))
                 for s in COND_STREAMS}
    masks_text = {s: (masks_real[s] if s == "tlsn" else
                      jnp.broadcast_to(masks_unc[s],
                                       (bs,) + masks_unc[s].shape[1:]))
                  for s in ("tlsn", "spkemb")}
    out_ref, att_ref = den.apply(params, sample, t, cond_text, masks_text)
    np.testing.assert_allclose(np.asarray(out_kv), np.asarray(out_ref),
                               rtol=1e-5, atol=1e-6)
    for s in COND_STREAMS:
        np.testing.assert_allclose(
            np.asarray(att_kv[s]), np.asarray(att_ref[s]),
            rtol=1e-5, atol=1e-6)

    # (b) guided with precomputed kvs == guided computing its own
    g_kv, ga_kv = den.apply(params, sample, t, cond_real, cond_unc,
                            masks_real, masks_unc, method=den.guided,
                            kvs=kvs)
    g_ref, ga_ref = den.apply(params, sample, t, cond_real, cond_unc,
                              masks_real, masks_unc, method=den.guided)
    np.testing.assert_allclose(np.asarray(g_kv), np.asarray(g_ref),
                               rtol=1e-6, atol=1e-7)
    for s in COND_STREAMS:
        np.testing.assert_allclose(
            np.asarray(ga_kv[s]), np.asarray(ga_ref[s]),
            rtol=1e-6, atol=1e-7)


@pytest.mark.slow
def test_text_only_shared_rows_matches_broadcast():
    """Denoiser.text_only with single-row uncond streams must equal the
    standard __call__ over the broadcast-to-B condition."""
    bs = 3
    den = Denoiser(nfeats=189, latent_dim=32, ff_size=128, num_layers=3,
                   num_heads=4, dropout=0.0, text_encoded_dim=D,
                   audio_encoded_dim=D)
    sample = jax.random.normal(jax.random.PRNGKey(20), (bs, 16, 32))
    t = jnp.asarray(123)
    cond_real = _cond(jax.random.PRNGKey(21), bs)
    cond_unc = _cond(jax.random.PRNGKey(22), 1)
    cond_text = {s: (cond_real[s] if s == "tlsn" else cond_unc[s])
                 for s in COND_STREAMS}
    masks_text = {
        "tlsn": jnp.zeros((bs, 7), bool).at[1, 4:].set(True),
        "spkemb": jnp.zeros((1, 9), bool).at[:, 3:].set(True),
    }
    params = den.init(jax.random.PRNGKey(23), sample, t, cond_real)

    out_s, att_s = den.apply(params, sample, t, cond_text, masks_text,
                             method=den.text_only)
    bcast = {s: jnp.broadcast_to(v, (bs,) + v.shape[1:])
             for s, v in cond_text.items()}
    bmasks = {s: jnp.broadcast_to(v, (bs,) + v.shape[1:])
              for s, v in masks_text.items()}
    out_b, att_b = den.apply(params, sample, t, bcast, bmasks)
    np.testing.assert_allclose(np.asarray(out_s), np.asarray(out_b),
                               rtol=1e-5, atol=1e-6)
    for s in COND_STREAMS:
        np.testing.assert_allclose(
            np.asarray(att_s[s]), np.asarray(att_b[s]),
            rtol=1e-5, atol=1e-6)

    # gradients w.r.t. the latents (the WEG use) agree too
    def loss_shared(x):
        _, att = den.apply(params, x, t, cond_text, masks_text,
                           method=den.text_only)
        return jnp.sum(att["tlsn"] ** 2)

    def loss_bcast(x):
        _, att = den.apply(params, x, t, bcast, bmasks)
        return jnp.sum(att["tlsn"] ** 2)

    g_s = jax.grad(loss_shared)(sample)
    g_b = jax.grad(loss_bcast)(sample)
    np.testing.assert_allclose(np.asarray(g_s), np.asarray(g_b),
                               rtol=1e-4, atol=1e-6)
