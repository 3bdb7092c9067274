"""Unbounded-rollout golden: the JAX preseq-inpainting reverse process vs
the torch reference's ``diffusion_reverse_forecast`` executed verbatim
(unbounded_synthesis.py:28-187).

This pins the long-form synthesis mechanism — per-step re-noising of the
previous half-window latent with the SAME initial noise
(unbounded_synthesis.py:70-76), overwrite of the overlap tokens BEFORE the
denoiser call, 7-way guidance combine, scheduler update — to the reference
numerically.  Together with tests/test_e2e_sampler_golden.py this covers
every composed sampling path the reference ships.

The oracle is the real module: ``unbounded_synthesis`` is imported with
shims for the packages this image lacks (and for the reference's own
latent import bug: ``from convofusion.models.tools import weg`` with an
empty ``models/tools/__init__.py`` — we alias the canonical
``word_excitation_guidance`` module onto the package, the fix the
reference itself needs to run).
"""
import contextlib

import numpy as np
import pytest

pytestmark = pytest.mark.slow  # compile/oracle heavy (see pyproject addopts)

import jax.numpy as jnp
import jax

torch = pytest.importorskip("torch")

from ref_shims import install_all
from test_e2e_sampler_golden import (
    _jax_noise_sequence,
    _rand_conditions,
    _ref_host,
    B,
    LAT_D,
    NSTEPS,
    REF_KEEP,
    TorchSchedulerShim,
    twins,  # noqa: F401  (module-scoped fixture, reused by import)
)

from convofusion_tpu.config.testing import tiny_config
from convofusion_tpu.models.convofusion import Convofusion
from convofusion_tpu.ops.transformer import COND_STREAMS

PRESEQ_LEN = 8  # half of the 16 latent tokens, as in the rollout


def _install_unbounded_shims():
    """The full shim surface ``unbounded_synthesis``'s import chain needs
    (pl callbacks/datamodule/rank_zero, librosa, textgrid) plus the
    tools.weg alias."""
    install_all()

    # the reference's own import bug: models/tools/__init__.py is empty
    # but unbounded_synthesis.py:21 does `from convofusion.models.tools
    # import weg` (SURVEY.md §2.3) — alias the canonical module
    import convofusion.models.tools as tools_pkg
    if not hasattr(tools_pkg, "weg"):
        from convofusion.models.tools import (
            word_excitation_guidance as weg_mod,
        )
        tools_pkg.weg = weg_mod


@pytest.fixture(scope="module")
def unbounded(reference_path):
    _install_unbounded_shims()
    import unbounded_synthesis
    return unbounded_synthesis


class ForecastSchedulerShim(TorchSchedulerShim):
    """The forecast also drives the TRAINING scheduler's ``add_noise``
    (q(x_t | x_0)) to re-noise the preseq each step."""

    def add_noise(self, sample, noise, t):
        acp = self.acp[int(t)]
        return acp.sqrt() * sample + (1.0 - acp).sqrt() * noise


def _torch_forecast(unbounded, refmod, cfg, den_t, variant, cond_real,
                    cond_unc, masks_real, masks_unc, init_noise,
                    step_noises, preseq, monkeypatch, *,
                    batch=B, focus_indices=(), no_grad=True):
    """Run the REAL reference diffusion_reverse_forecast with injected
    noise (7-way guidance assembly as unbounded_synthesis.py:367-394).
    ``no_grad=False`` for WEG runs, which need torch autograd."""
    shim = ForecastSchedulerShim(variant, noise_queue=list(step_noises))
    host = _ref_host(refmod, cfg, den_t, shim,
                     float(cfg.model.guidance_scale))
    host.noise_scheduler = shim

    enc = [torch.from_numpy(np.concatenate(
        [cond_real[s] if g in REF_KEEP[s] else cond_unc[s]
         for g in range(7)], axis=0)) for s in COND_STREAMS]
    cond_masks = {
        s: torch.from_numpy(np.concatenate(
            [masks_real[s] if g in REF_KEEP[s] else masks_unc[s]
             for g in range(7)], axis=0))
        for s in ("spkemb", "tlsn")}

    calls = []

    def fake_randn(*shape, **kw):
        calls.append(shape)
        return torch.from_numpy(init_noise.copy())

    monkeypatch.setattr(torch, "randn", fake_randn)
    try:
        with torch.no_grad() if no_grad else contextlib.nullcontext():
            z, att = unbounded.diffusion_reverse_forecast(
                host, enc, lengths=[128] * batch,
                preseq=torch.from_numpy(preseq),
                cond_masks=cond_masks,
                focus_indices=list(focus_indices))
    finally:
        monkeypatch.undo()
    assert len(calls) == 1 and calls[0][0] == (batch, 16, LAT_D)
    return z, att


@pytest.mark.parametrize("variant,pallas", [
    ("ddpm", False),
    ("ddpm", True),
    ("ddim", True),
])
def test_forecast_latents_match_torch(twins, unbounded, monkeypatch,
                                      variant, pallas):
    den_t, _, _, _, params = twins
    import convofusion.models.modeltype.convofusion as refmod

    cfg = tiny_config("diffusion")
    cfg.model.scheduler["variant"] = variant
    cfg.model.scheduler["num_inference_timesteps"] = NSTEPS
    cfg.TPU.PALLAS_STEP = pallas
    model = Convofusion(cfg)

    cond_real, cond_unc, masks_real, masks_unc = _rand_conditions(17)
    rng = np.random.default_rng(23)
    preseq = rng.standard_normal(
        (B, PRESEQ_LEN, LAT_D)).astype(np.float32) * 0.3

    key = jax.random.PRNGKey(29)
    latents, _ = model.diffusion_reverse(
        params,
        {k: jnp.asarray(v) for k, v in cond_real.items()},
        {k: jnp.asarray(v) for k, v in masks_real.items()},
        {k: jnp.asarray(v) for k, v in cond_unc.items()},
        {k: jnp.asarray(v) for k, v in masks_unc.items()},
        key, B, num_inference_steps=NSTEPS,
        preseq=jnp.asarray(preseq))
    latents = np.asarray(latents)

    init_noise, step_noises = _jax_noise_sequence(
        key, NSTEPS, (B, 16, LAT_D))
    z_t, _ = _torch_forecast(
        unbounded, refmod, cfg, den_t, variant, cond_real, cond_unc,
        masks_real, masks_unc, init_noise, step_noises, preseq,
        monkeypatch)

    # reference returns latents.permute(1, 0, 2) -> (16, B, D)
    np.testing.assert_allclose(
        latents, z_t.numpy().transpose(1, 0, 2), rtol=5e-3, atol=5e-3)


def test_forecast_differs_from_plain_reverse(twins):
    """The inpainting must actually change the outcome: with a preseq the
    overlap tokens' trajectory is anchored, without it they are free."""
    _, _, _, _, params = twins
    cfg = tiny_config("diffusion")
    cfg.model.scheduler["num_inference_timesteps"] = NSTEPS
    cfg.TPU.PALLAS_STEP = False
    model = Convofusion(cfg)

    cond_real, cond_unc, masks_real, masks_unc = _rand_conditions(31)
    args = (
        params,
        {k: jnp.asarray(v) for k, v in cond_real.items()},
        {k: jnp.asarray(v) for k, v in masks_real.items()},
        {k: jnp.asarray(v) for k, v in cond_unc.items()},
        {k: jnp.asarray(v) for k, v in masks_unc.items()},
        jax.random.PRNGKey(37), B)
    preseq = jnp.asarray(np.random.default_rng(41).standard_normal(
        (B, PRESEQ_LEN, LAT_D)).astype(np.float32) * 0.3)

    plain, _ = model.diffusion_reverse(
        *args, num_inference_steps=NSTEPS)
    inpainted, _ = model.diffusion_reverse(
        *args, num_inference_steps=NSTEPS, preseq=preseq)

    assert not np.allclose(np.asarray(plain), np.asarray(inpainted),
                           atol=1e-4)
    # the free (second-half) tokens must also feel the anchored context
    # through attention — not just the overwritten ones
    assert not np.allclose(np.asarray(plain)[:, PRESEQ_LEN:],
                           np.asarray(inpainted)[:, PRESEQ_LEN:],
                           atol=1e-4)


def test_forecast_weg_matches_torch(twins, unbounded, monkeypatch):
    """WEG inside the rollout: the forecast hardcodes its own constants
    (scale_factor 100, thresholds {0,200,400,600}, max_refinement 300)
    and — unlike the regular sampler — re-creates scale_range INSIDE the
    step loop, so step sizes follow the true linspace decay
    (unbounded_synthesis.py:83-88).  Pins cli/unbounded's
    ROLLOUT_WEG_PARAMETERS override end-to-end: text-only pass,
    eot-normalized attention, in-loop latent updates, preseq inpainting,
    all against the reference forecast executed with gradients."""
    den_t, _, _, _, params = twins
    import convofusion.models.modeltype.convofusion as refmod
    from convofusion_tpu.cli.unbounded import ROLLOUT_WEG_PARAMETERS

    cfg = tiny_config("diffusion")
    cfg.model.scheduler["variant"] = "ddpm"
    cfg.model.scheduler["num_inference_timesteps"] = NSTEPS
    cfg.TPU.PALLAS_STEP = False
    model = Convofusion(cfg)

    b, t_txt = 1, 10
    rng = np.random.default_rng(43)
    shapes = {"spkemb": (b, 9, 64), "alsn": (b, 12, 64),
              "tlsn": (b, t_txt, 64), "apb": (b, 8, 64),
              "lsnemb": (b, 1, 64)}
    cond_real = {k: rng.standard_normal(v).astype(np.float32) * 0.5
                 for k, v in shapes.items()}
    cond_unc = {k: rng.standard_normal(v).astype(np.float32) * 0.5
                for k, v in shapes.items()}
    pad_txt = np.zeros((b, t_txt), bool)
    pad_txt[:, 8:] = True                  # first pad 8 -> eot 7
    pad_spk = np.zeros((b, 9), bool)
    masks_real = {"spkemb": pad_spk, "tlsn": pad_txt}
    masks_unc = {"spkemb": pad_spk, "tlsn": np.zeros((b, t_txt), bool)}
    preseq = rng.standard_normal(
        (b, PRESEQ_LEN, LAT_D)).astype(np.float32) * 0.3

    focus = [2, 4]                         # interior: smoothing agrees
    cond_text = {s: (cond_real[s] if s == "tlsn" else cond_unc[s])
                 for s in COND_STREAMS}
    masks_text = {s: (masks_real[s] if s == "tlsn" else masks_unc[s])
                  for s in ("spkemb", "tlsn")}
    weg = dict(
        cond_text={k: jnp.asarray(v) for k, v in cond_text.items()},
        masks_text={k: jnp.asarray(v) for k, v in masks_text.items()},
        focus_idx=jnp.asarray([focus], jnp.int32),
        focus_valid=jnp.asarray([[1.0, 1.0]], jnp.float32),
        eot_idx=jnp.asarray([7]))

    key = jax.random.PRNGKey(47)
    latents, _ = model.diffusion_reverse(
        params,
        {k: jnp.asarray(v) for k, v in cond_real.items()},
        {k: jnp.asarray(v) for k, v in masks_real.items()},
        {k: jnp.asarray(v) for k, v in cond_unc.items()},
        {k: jnp.asarray(v) for k, v in masks_unc.items()},
        key, b, num_inference_steps=NSTEPS, weg=weg,
        preseq=jnp.asarray(preseq),
        weg_params=ROLLOUT_WEG_PARAMETERS)

    init_noise, step_noises = _jax_noise_sequence(
        key, NSTEPS, (b, 16, LAT_D))
    # WEG needs gradients: no_grad=False
    z_t, _ = _torch_forecast(
        unbounded, refmod, cfg, den_t, "ddpm", cond_real, cond_unc,
        masks_real, masks_unc, init_noise, step_noises, preseq,
        monkeypatch, batch=b, focus_indices=[focus], no_grad=False)

    np.testing.assert_allclose(
        np.asarray(latents), z_t.detach().numpy().transpose(1, 0, 2),
        rtol=1e-2, atol=1e-2)
