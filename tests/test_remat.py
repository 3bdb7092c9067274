"""TPU.REMAT numerics: per-layer rematerialization must be a pure
memory/FLOPs trade — forward and gradients identical to the unremat
denoiser, for both the standard and fused decoder stacks.

Also regression-guards the nn.remat static_argnums contract: flax
counts call args with self excluded, so the deterministic bool is
arg 6 — marking only (5,) left it traced and crashed nn.Dropout with
TracerBoolConversionError on any model built with TPU.REMAT=true.
The dropout-active grad step below exercises exactly that path.
"""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from convofusion_tpu.models.denoiser import Denoiser
from convofusion_tpu.ops.transformer import COND_STREAMS

D = 64


def _cond(key, bs):
    ks = jax.random.split(key, 5)
    sizes = dict(spkemb=9, alsn=12, tlsn=7, apb=8, lsnemb=1)
    return {s: jax.random.normal(k, (bs, sizes[s], D))
            for s, k in zip(COND_STREAMS, ks)}


def _build(remat, fuse, dropout=0.0):
    return Denoiser(nfeats=189, latent_dim=32, ff_size=128,
                    num_layers=2, num_heads=4, dropout=dropout,
                    text_encoded_dim=D, audio_encoded_dim=D,
                    fuse_streams=fuse, remat=remat)


@pytest.mark.parametrize("fuse", [False, True], ids=["standard", "fused"])
def test_remat_forward_and_grad_match(fuse):
    bs = 2
    base = _build(False, fuse)
    rmt = _build(True, fuse)

    sample = jax.random.normal(jax.random.PRNGKey(0), (bs, 16, 32))
    cond = _cond(jax.random.PRNGKey(1), bs)
    masks = {"tlsn": jnp.zeros((bs, 7), bool).at[0, 5:].set(True)}
    t = jnp.asarray(500)

    params = base.init({"params": jax.random.PRNGKey(2)},
                       sample, t, cond, masks)["params"]
    # remat wraps the layer class only — identical param pytree
    params_r = rmt.init({"params": jax.random.PRNGKey(2)},
                        sample, t, cond, masks)["params"]
    chex_equal = jax.tree_util.tree_all(jax.tree.map(
        lambda a, b: a.shape == b.shape, params, params_r))
    assert chex_equal

    out_b, _ = base.apply({"params": params}, sample, t, cond, masks)
    out_r, _ = rmt.apply({"params": params}, sample, t, cond, masks)
    np.testing.assert_allclose(np.asarray(out_r), np.asarray(out_b),
                               rtol=1e-6, atol=1e-6)

    def loss(mod):
        def f(p):
            out, _ = mod.apply({"params": p}, sample, t, cond, masks)
            return jnp.sum(out ** 2)
        return jax.grad(f)(params)

    g_b, g_r = loss(base), loss(rmt)
    jax.tree.map(lambda a, b: np.testing.assert_allclose(
        np.asarray(b), np.asarray(a), rtol=1e-5, atol=1e-6), g_b, g_r)


@pytest.mark.parametrize("fuse", [False, True], ids=["standard", "fused"])
def test_remat_grad_step_with_dropout(fuse):
    """deterministic=False with dropout>0 under remat: the static_argnums
    off-by-one crashed here (traced bool reaching nn.Dropout)."""
    bs = 2
    mod = _build(True, fuse, dropout=0.1)
    sample = jax.random.normal(jax.random.PRNGKey(0), (bs, 16, 32))
    cond = _cond(jax.random.PRNGKey(1), bs)
    masks = {"tlsn": jnp.zeros((bs, 7), bool)}
    t = jnp.asarray(100)
    params = mod.init({"params": jax.random.PRNGKey(2)},
                      sample, t, cond, masks)["params"]

    @jax.jit
    def gstep(p, key):
        def f(pp):
            out, _ = mod.apply({"params": pp}, sample, t, cond, masks,
                               deterministic=False,
                               rngs={"dropout": key})
            return jnp.mean(out ** 2)
        return jax.value_and_grad(f)(pp := p)

    val, grads = gstep(params, jax.random.PRNGKey(3))
    assert np.isfinite(float(val))
    gnorm = float(jax.tree_util.tree_reduce(
        lambda a, x: a + jnp.sum(x ** 2), grads, 0.0) ** 0.5)
    assert np.isfinite(gnorm) and gnorm > 0.0
