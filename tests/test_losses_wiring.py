"""prior_loss + guided-attention loss wiring (reference diffvae.py:152-163).

These terms default to 0.0 in every production config; the tests switch
them on and check the terms appear, gradients flow, and the math matches
the reference semantics.
"""
import numpy as np
import pytest

import jax
import jax.numpy as jnp

from convofusion_tpu.config.testing import tiny_config
from convofusion_tpu.data.synthetic import prepare_arrays, synthetic_raw_batch
from convofusion_tpu.losses.diffvae import (
    diffusion_losses,
    guided_attention_loss,
)
from convofusion_tpu.models.convofusion import Convofusion


def _model_and_batch(n=8, **loss_overrides):
    cfg = tiny_config("diffusion")
    for k, v in loss_overrides.items():
        cfg.LOSS[k] = v
    model = Convofusion(cfg)
    params = model.init_params(jax.random.PRNGKey(0))
    batch, _, _ = prepare_arrays(model, synthetic_raw_batch(0, n))
    return model, params, batch


@pytest.mark.slow
def test_prior_loss_term_and_gradients():
    model, params, batch = _model_and_batch(LAMBDA_PRIOR=0.5)
    loss, terms = jax.jit(model.train_diffusion_loss)(
        params, batch, jax.random.PRNGKey(1))
    assert "prior_loss" in terms and "inst_loss" in terms
    assert np.isfinite(float(loss))
    np.testing.assert_allclose(
        float(loss),
        float(terms["inst_loss"]) + 0.5 * float(terms["prior_loss"]),
        rtol=1e-6)

    grads = jax.grad(lambda p: model.train_diffusion_loss(
        p, batch, jax.random.PRNGKey(1))[0])(params)
    gnorm = jax.tree_util.tree_reduce(
        lambda a, x: a + float(jnp.abs(x).sum()), grads["denoiser"], 0.0)
    assert np.isfinite(gnorm) and gnorm > 0


def test_prior_loss_chunks_batch():
    """inst on the first half, prior on the second (convofusion.py:590-593)."""
    rng = np.random.default_rng(0)
    noise_pred = rng.standard_normal((8, 4, 6)).astype(np.float32)
    noise = rng.standard_normal((8, 4, 6)).astype(np.float32)
    np_m, np_p = np.split(noise_pred, 2)
    n_m, n_p = np.split(noise, 2)
    out = diffusion_losses(
        jnp.asarray(np_m), jnp.asarray(n_m), True,
        noise_pred_prior=jnp.asarray(np_p), noise_prior=jnp.asarray(n_p),
        lambda_prior=0.25)
    np.testing.assert_allclose(
        float(out["inst_loss"]), np.mean((np_m - n_m) ** 2), rtol=1e-6)
    np.testing.assert_allclose(
        float(out["prior_loss"]), np.mean((np_p - n_p) ** 2), rtol=1e-6)
    np.testing.assert_allclose(
        float(out["total"]),
        float(out["inst_loss"]) + 0.25 * float(out["prior_loss"]), rtol=1e-6)


@pytest.mark.slow
def test_prior_loss_rejects_x_prediction():
    cfg = tiny_config("diffusion")
    cfg.LOSS["LAMBDA_PRIOR"] = 0.5
    cfg.TRAIN.ABLATION.PREDICT_EPSILON = False
    model = Convofusion(cfg)
    params = model.init_params(jax.random.PRNGKey(0))
    batch, _, _ = prepare_arrays(model, synthetic_raw_batch(0, 4))
    with pytest.raises(ValueError, match="LAMBDA_PRIOR"):
        model.train_diffusion_loss(params, batch, jax.random.PRNGKey(1))


@pytest.mark.slow
def test_guided_attention_term_and_gradients():
    model, params, batch = _model_and_batch(
        n=4, LAMBDA_GUIDED_ATTENTION=0.1)
    loss, terms = jax.jit(model.train_diffusion_loss)(
        params, batch, jax.random.PRNGKey(1))
    assert "guidedattention_loss" in terms
    assert np.isfinite(float(loss))
    np.testing.assert_allclose(
        float(loss),
        float(terms["inst_loss"]) +
        0.1 * float(terms["guidedattention_loss"]), rtol=1e-5)

    grads = jax.grad(lambda p: model.train_diffusion_loss(
        p, batch, jax.random.PRNGKey(1))[0])(params)
    gnorm = jax.tree_util.tree_reduce(
        lambda a, x: a + float(jnp.abs(x).sum()), grads["denoiser"], 0.0)
    assert np.isfinite(gnorm) and gnorm > 0


def test_guided_attention_golden_vs_torch(reference_path):
    """Our guided_attention_loss vs the reference GuidedAttentionLoss on
    the same maps (diffvae.py:257-287: att_ws[1:-2] keeps alsn/tlsn)."""
    torch = pytest.importorskip("torch")
    # the reference module imports torchmetrics (absent here) only for its
    # Losses MetricCollection base; GuidedAttentionLoss doesn't need it
    from ref_shims import install_torchmetrics

    install_torchmetrics()
    from convofusion.models.losses.diffvae import GuidedAttentionLoss

    rng = np.random.default_rng(0)
    # stream order in the reference list: [spkemb, alsn, tlsn, apb, lsnemb]
    shapes = {"spkemb": (2, 3, 16, 10), "alsn": (2, 3, 16, 161),
              "tlsn": (2, 3, 16, 10), "apb": (2, 3, 16, 8),
              "lsnemb": (2, 3, 16, 1)}
    atts = {k: rng.standard_normal(v).astype(np.float32)
            for k, v in shapes.items()}

    ref_loss = GuidedAttentionLoss()(
        [torch.from_numpy(atts[k])
         for k in ("spkemb", "alsn", "tlsn", "apb", "lsnemb")], None)
    ours = guided_attention_loss(
        {k: jnp.asarray(v) for k, v in atts.items()})
    np.testing.assert_allclose(float(ours), float(ref_loss), rtol=1e-5)


@pytest.mark.slow
def test_prior_loss_odd_batch_chunks_like_torch():
    """torch.chunk gives the first half the extra row (convofusion.py:592)."""
    model, params, batch = _model_and_batch(n=5, LAMBDA_PRIOR=0.5)
    loss, terms = model.train_diffusion_loss(
        params, batch, jax.random.PRNGKey(1))
    assert "prior_loss" in terms and np.isfinite(float(loss))


@pytest.mark.slow
def test_prior_plus_latent_restricts_latent_to_main_chunk():
    """With BOTH lambdas nonzero the latent term must cover the main
    (conditional) chunk only — the prior half is already consumed by
    prior_loss.  (The reference crashes on this combination, so the
    disjoint-chunks semantics is this framework's documented choice.)"""
    model, params, batch = _model_and_batch(LAMBDA_PRIOR=0.5,
                                            LAMBDA_LATENT=0.1)
    key = jax.random.PRNGKey(3)
    _, t1 = jax.jit(model.train_diffusion_loss)(params, batch, key)
    assert {"inst_loss", "prior_loss", "latent_loss"} <= set(t1)
    np.testing.assert_allclose(
        float(t1["total"]),
        float(t1["inst_loss"]) + 0.5 * float(t1["prior_loss"])
        + 0.1 * float(t1["latent_loss"]), rtol=1e-5)

    # perturbing ONLY the prior half's motion must leave the latent term
    # untouched (it would change under full-batch latent accounting)
    batch2 = dict(batch)
    m = np.array(batch["motion_lsn"])
    m[4:] += 1.0
    batch2["motion_lsn"] = m
    _, t2 = jax.jit(model.train_diffusion_loss)(params, batch2, key)
    np.testing.assert_allclose(float(t1["latent_loss"]),
                               float(t2["latent_loss"]), rtol=1e-6)
    assert not np.isclose(float(t1["prior_loss"]),
                          float(t2["prior_loss"]), rtol=1e-4)
