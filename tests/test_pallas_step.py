"""Fused pallas guidance+scheduler step vs the unfused sampler math."""
import numpy as np
import jax
import jax.numpy as jnp

from convofusion_tpu.diffusion.schedulers import DiffusionScheduler
from convofusion_tpu.ops.pallas_step import (
    fused_guided_step,
    reference_guided_step,
)


def _data(key, b=2, t=16, d=128):
    ks = jax.random.split(key, 3)
    return (jax.random.normal(ks[0], (7, b, t, d)),
            jax.random.normal(ks[1], (b, t, d)),
            jax.random.normal(ks[2], (b, t, d)))


def test_fused_step_matches_reference_math_ddpm():
    np7, lat, noise = _data(jax.random.PRNGKey(0))
    args = (np7, lat, noise, jnp.float32(0.61), jnp.float32(0.73),
            jnp.float32(7.5), jnp.float32(1.0), jnp.float32(1.0),
            jnp.float32(1.0))
    out = fused_guided_step(*args, interpret=True)
    ref = reference_guided_step(*args)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                               rtol=1e-5, atol=1e-5)


def test_fused_step_matches_scheduler_step():
    """reference_guided_step must itself match DiffusionScheduler.step on
    the combined epsilon (ties the kernel to the production scheduler)."""
    s_ddpm = DiffusionScheduler(variant="ddpm", clip_sample=True)
    s_ddim = DiffusionScheduler(variant="ddim", clip_sample=True)
    np7, lat, noise = _data(jax.random.PRNGKey(1))
    t, pt = 500, 480
    acp = s_ddpm.alphas_cumprod

    # guidance combine
    eps = np7[0] + 7.5 * (jnp.sum(np7[1:6], axis=0) - 5.0 * np7[0])

    for sched, is_ddpm in ((s_ddpm, 1.0), (s_ddim, 0.0)):
        want, _ = sched.step(eps, t, pt, lat, noise=noise)
        got = fused_guided_step(
            np7, lat, noise, jnp.float32(acp[t]), jnp.float32(acp[pt]),
            jnp.float32(7.5), jnp.float32(is_ddpm), jnp.float32(1.0),
            jnp.float32(1.0), interpret=True)
        np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                                   rtol=2e-5, atol=2e-5)

    # final step: prev_t < 0 -> alpha_prev = 1
    want, _ = s_ddpm.step(eps, 0, -1, lat, noise=noise)
    got = fused_guided_step(
        np7, lat, noise, jnp.float32(acp[0]), jnp.float32(1.0),
        jnp.float32(7.5), jnp.float32(1.0), jnp.float32(0.0),
        jnp.float32(1.0), interpret=True)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                               rtol=2e-5, atol=2e-5)
