"""Scheduler semantics tests (diffusers DDPM/DDIM contract, no diffusers dep)."""
import numpy as np
import jax
import jax.numpy as jnp

from convofusion_tpu.diffusion import DiffusionScheduler, make_beta_schedule


def test_scaled_linear_betas_endpoints():
    betas = make_beta_schedule(1000, 0.00085, 0.012, "scaled_linear")
    assert np.isclose(betas[0], 0.00085)
    assert np.isclose(betas[-1], 0.012)
    assert np.all(np.diff(betas) > 0)


def test_add_noise_closed_form():
    s = DiffusionScheduler()
    x = jnp.ones((2, 4, 8))
    n = jnp.full((2, 4, 8), 0.5)
    t = jnp.array([0, 999])
    out = s.add_noise(x, n, t)
    acp = s.alphas_cumprod
    expect0 = np.sqrt(acp[0]) * 1.0 + np.sqrt(1 - acp[0]) * 0.5
    expect999 = np.sqrt(acp[999]) * 1.0 + np.sqrt(1 - acp[999]) * 0.5
    np.testing.assert_allclose(np.asarray(out[0]), expect0, rtol=1e-6)
    np.testing.assert_allclose(np.asarray(out[1]), expect999, rtol=1e-6)


def test_ddpm_final_step_returns_clipped_x0():
    s = DiffusionScheduler(clip_sample=True)
    key = jax.random.PRNGKey(0)
    sample = jax.random.normal(key, (3, 5)) * 2.0
    eps = jnp.zeros_like(sample)
    prev, x0 = s.step(eps, 0, -1, sample, noise=jnp.zeros_like(sample))
    # at t=0 with prev_t<0: alpha_prod_prev=1 -> prev == x0 (clipped)
    np.testing.assert_allclose(np.asarray(prev), np.asarray(x0), atol=1e-6)
    assert np.abs(np.asarray(x0)).max() <= 1.0 + 1e-6


def test_ddpm_posterior_matches_manual():
    s = DiffusionScheduler(clip_sample=False)
    t, prev_t = 500, 499
    rng = np.random.default_rng(0)
    sample = jnp.asarray(rng.normal(size=(2, 3)).astype(np.float32))
    eps = jnp.asarray(rng.normal(size=(2, 3)).astype(np.float32))
    z = jnp.asarray(rng.normal(size=(2, 3)).astype(np.float32))
    prev, x0 = s.step(eps, t, prev_t, sample, noise=z)

    acp = s.alphas_cumprod
    a_t, a_prev = acp[t], acp[prev_t]
    b_t, b_prev = 1 - a_t, 1 - a_prev
    cur_a = a_t / a_prev
    cur_b = 1 - cur_a
    x0_m = (np.asarray(sample) - np.sqrt(b_t) * np.asarray(eps)) / np.sqrt(a_t)
    mean = (np.sqrt(a_prev) * cur_b / b_t) * x0_m + (
        np.sqrt(cur_a) * b_prev / b_t
    ) * np.asarray(sample)
    var = b_prev / b_t * cur_b
    expect = mean + np.sqrt(var) * np.asarray(z)
    np.testing.assert_allclose(np.asarray(prev), expect, rtol=1e-5, atol=1e-5)
    np.testing.assert_allclose(np.asarray(x0), x0_m, rtol=1e-5, atol=1e-5)


def test_ddim_deterministic_roundtrip_recovers_x0():
    """With an oracle epsilon model, 50-step DDIM must reconstruct x0."""
    s = DiffusionScheduler(variant="ddim", clip_sample=True)
    rng = np.random.default_rng(1)
    x0 = jnp.asarray(rng.uniform(-0.8, 0.8, size=(2, 6)).astype(np.float32))
    eps = jnp.asarray(rng.normal(size=(2, 6)).astype(np.float32))
    ts = s.timesteps(50)
    prev_ts = s.prev_timesteps(50)
    sample = s.add_noise(x0, eps, jnp.full((2,), int(ts[0])))

    acp = s.alphas_cumprod
    for t, pt in zip(ts, prev_ts):
        # oracle epsilon for the current sample given true x0
        cur_eps = (sample - np.sqrt(acp[t]) * x0) / np.sqrt(1 - acp[t])
        sample, _ = s.step(cur_eps, int(t), int(pt), sample)
    np.testing.assert_allclose(np.asarray(sample), np.asarray(x0), atol=1e-3)


def test_timesteps_leading_spacing():
    s = DiffusionScheduler()
    ts = s.timesteps(50)
    assert ts[0] == 980 and ts[-1] == 0 and len(ts) == 50
    ts_full = s.timesteps(1000)
    assert ts_full[0] == 999 and ts_full[-1] == 0


def test_step_is_jittable_scan_body():
    s = DiffusionScheduler(variant="ddpm")
    ts = jnp.asarray(s.timesteps(10))
    prev_ts = jnp.asarray(s.prev_timesteps(10))

    def body(carry, inp):
        t, pt, noise = inp
        prev, _ = s.step(jnp.zeros((2, 4)), t, pt, carry, noise=noise)
        return prev, None

    noises = jax.random.normal(jax.random.PRNGKey(0), (10, 2, 4))
    out, _ = jax.lax.scan(body, jnp.ones((2, 4)), (ts, prev_ts, noises))
    assert out.shape == (2, 4)
    assert np.isfinite(np.asarray(out)).all()


def test_dpmpp_2m_oracle_recovers_x0():
    """20-step DPM-Solver++ 2M with an oracle epsilon model must
    reconstruct x0 at least as well as 20-step DDIM."""
    s = DiffusionScheduler(variant="dpmpp_2m", clip_sample=True)
    rng = np.random.default_rng(2)
    x0 = jnp.asarray(rng.uniform(-0.8, 0.8, size=(2, 6)).astype(np.float32))
    eps0 = jnp.asarray(rng.normal(size=(2, 6)).astype(np.float32))
    acp = s.alphas_cumprod

    def run(n):
        ts, pts = s.timesteps(n), s.prev_timesteps(n)
        sample = s.add_noise(x0, eps0, jnp.full((2,), int(ts[0])))
        prev_d = jnp.zeros_like(sample)
        prev_lam = jnp.float32(0.0)
        for i, (t, pt) in enumerate(zip(ts, pts)):
            cur_eps = (sample - np.sqrt(acp[t]) * x0) / np.sqrt(
                1 - acp[t])
            sample, _, prev_d, prev_lam = s.dpmpp_2m_step(
                cur_eps, int(t), int(pt), sample, prev_d, prev_lam,
                i == 0)
        return np.abs(np.asarray(sample) - np.asarray(x0)).max()

    err = run(20)
    assert err < 5e-3
