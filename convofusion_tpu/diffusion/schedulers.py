"""DDPM / DDIM schedulers with diffusers-compatible semantics, designed to
run inside ``lax.scan`` sampling loops.

The reference instantiates two ``diffusers.DDPMScheduler`` objects from
configs/modules/scheduler.yaml (1000 train steps, scaled_linear betas
0.00085 -> 0.012, fixed_small variance, clip_sample=true) and drives them via
``add_noise`` / ``step`` (convofusion/models/modeltype/convofusion.py:
104-106, 544-545, 552-645).  This module re-implements those exact update
rules as pure jnp functions over precomputed tables: every quantity the
``step`` needs is an O(T) fp32 table indexed by a traced timestep, so the
whole reverse process compiles to one fused scan body.

A DDIM variant (eta-parameterized) is included for the 50-step fast-sampling
mode targeted by BASELINE.md.
"""
from __future__ import annotations

import dataclasses
from typing import Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np


def make_beta_schedule(
    num_train_timesteps: int = 1000,
    beta_start: float = 0.00085,
    beta_end: float = 0.012,
    beta_schedule: str = "scaled_linear",
) -> np.ndarray:
    if beta_schedule == "linear":
        return np.linspace(beta_start, beta_end, num_train_timesteps,
                           dtype=np.float64)
    if beta_schedule == "scaled_linear":
        return (
            np.linspace(beta_start**0.5, beta_end**0.5, num_train_timesteps,
                        dtype=np.float64) ** 2
        )
    if beta_schedule == "squaredcos_cap_v2":
        t = np.arange(num_train_timesteps, dtype=np.float64)
        f = np.cos((t / num_train_timesteps + 0.008) / 1.008 * np.pi / 2) ** 2
        f_next = np.cos(
            ((t + 1) / num_train_timesteps + 0.008) / 1.008 * np.pi / 2
        ) ** 2
        return np.clip(1.0 - f_next / f, 0.0, 0.999)
    raise ValueError(f"unknown beta schedule {beta_schedule}")


@dataclasses.dataclass(frozen=True)
class DiffusionScheduler:
    """Stateless scheduler; all tables are numpy, converted lazily to jnp.

    ``variant`` selects the reverse-process update: 'ddpm' mirrors
    diffusers.DDPMScheduler.step (fixed_small variance), 'ddim' mirrors
    diffusers.DDIMScheduler.step with eta.
    """

    num_train_timesteps: int = 1000
    beta_start: float = 0.00085
    beta_end: float = 0.012
    beta_schedule: str = "scaled_linear"
    clip_sample: bool = True
    clip_sample_range: float = 1.0
    prediction_type: str = "epsilon"  # or "sample"
    variant: str = "ddpm"
    eta: float = 0.0

    def __post_init__(self):
        betas = make_beta_schedule(
            self.num_train_timesteps, self.beta_start, self.beta_end,
            self.beta_schedule,
        )
        alphas_cumprod = np.cumprod(1.0 - betas, axis=0)
        object.__setattr__(self, "betas", betas.astype(np.float32))
        object.__setattr__(
            self, "alphas_cumprod", alphas_cumprod.astype(np.float32)
        )

    # --- noising (training) -------------------------------------------------
    @property
    def init_noise_sigma(self) -> float:
        return 1.0

    def add_noise(self, samples, noise, timesteps):
        """q(x_t | x_0): timesteps (B,) int; samples/noise (B, ...)."""
        acp = jnp.asarray(self.alphas_cumprod)[timesteps]
        shape = (-1,) + (1,) * (samples.ndim - 1)
        sqrt_acp = jnp.sqrt(acp).reshape(shape)
        sqrt_1macp = jnp.sqrt(1.0 - acp).reshape(shape)
        return sqrt_acp * samples + sqrt_1macp * noise

    def velocity(self, samples, noise, timesteps):
        acp = jnp.asarray(self.alphas_cumprod)[timesteps]
        shape = (-1,) + (1,) * (samples.ndim - 1)
        sqrt_acp = jnp.sqrt(acp).reshape(shape)
        sqrt_1macp = jnp.sqrt(1.0 - acp).reshape(shape)
        return sqrt_acp * noise - sqrt_1macp * samples

    # --- reverse process ----------------------------------------------------
    def timesteps(self, num_inference_steps: int) -> np.ndarray:
        """Descending inference timesteps ('leading' spacing, diffusers)."""
        step_ratio = self.num_train_timesteps // num_inference_steps
        return (
            (np.arange(num_inference_steps) * step_ratio)
            .round()[::-1]
            .astype(np.int32)
            .copy()
        )

    def prev_timesteps(self, num_inference_steps: int) -> np.ndarray:
        step_ratio = self.num_train_timesteps // num_inference_steps
        return self.timesteps(num_inference_steps) - step_ratio

    def _pred_x0_eps(self, model_output, sample, alpha_prod_t, beta_prod_t):
        if self.prediction_type == "epsilon":
            x0 = (sample - jnp.sqrt(beta_prod_t) * model_output) / jnp.sqrt(
                alpha_prod_t
            )
            eps = model_output
        elif self.prediction_type == "sample":
            x0 = model_output
            eps = (sample - jnp.sqrt(alpha_prod_t) * x0) / jnp.sqrt(beta_prod_t)
        else:
            raise ValueError(self.prediction_type)
        if self.clip_sample:
            x0 = jnp.clip(x0, -self.clip_sample_range, self.clip_sample_range)
            # re-derive epsilon from the clipped x0 (diffusers does this for
            # DDIM; for DDPM only x0 enters the posterior mean)
            eps = (sample - jnp.sqrt(alpha_prod_t) * x0) / jnp.sqrt(beta_prod_t)
        return x0, eps

    def step(
        self,
        model_output,
        t,
        prev_t,
        sample,
        noise: Optional[jnp.ndarray] = None,
    ) -> Tuple[jnp.ndarray, jnp.ndarray]:
        """One reverse update; returns (prev_sample, pred_original_sample).

        ``t``/``prev_t`` may be traced int32 scalars (scan carries) or python
        ints.  ``noise`` must be provided for the stochastic variants
        (DDPM always; DDIM when eta > 0) — pass fresh N(0,1) of sample shape.
        """
        acp = jnp.asarray(self.alphas_cumprod)
        alpha_prod_t = acp[t]
        alpha_prod_prev = jnp.where(
            prev_t >= 0, acp[jnp.clip(prev_t, 0)], jnp.float32(1.0)
        )
        beta_prod_t = 1.0 - alpha_prod_t
        beta_prod_prev = 1.0 - alpha_prod_prev

        x0, eps = self._pred_x0_eps(
            model_output, sample, alpha_prod_t, beta_prod_t
        )

        if self.variant == "ddpm":
            current_alpha = alpha_prod_t / alpha_prod_prev
            current_beta = 1.0 - current_alpha
            coef_x0 = jnp.sqrt(alpha_prod_prev) * current_beta / beta_prod_t
            coef_xt = jnp.sqrt(current_alpha) * beta_prod_prev / beta_prod_t
            mean = coef_x0 * x0 + coef_xt * sample
            variance = jnp.clip(
                beta_prod_prev / beta_prod_t * current_beta, 1e-20
            )
            if noise is None:
                raise ValueError("DDPM step requires noise")
            prev = mean + jnp.where(
                t > 0, jnp.sqrt(variance), jnp.float32(0.0)
            ) * noise
            return prev, x0

        if self.variant == "ddim":
            variance = (beta_prod_prev / beta_prod_t) * (
                1.0 - alpha_prod_t / alpha_prod_prev
            )
            std = self.eta * jnp.sqrt(variance)
            direction = jnp.sqrt(
                jnp.clip(1.0 - alpha_prod_prev - std**2, 0.0)
            ) * eps
            prev = jnp.sqrt(alpha_prod_prev) * x0 + direction
            if self.eta > 0.0:
                if noise is None:
                    raise ValueError("eta>0 DDIM step requires noise")
                prev = prev + jnp.where(
                    t > 0, std, jnp.float32(0.0)
                ) * noise
            return prev, x0

        raise ValueError(f"unknown scheduler variant {self.variant}")

    # --- DPM-Solver++ (2M), data-prediction multistep ---------------------
    def _lambda(self, acp_t):
        alpha = jnp.sqrt(acp_t)
        sigma = jnp.sqrt(1.0 - acp_t)
        return jnp.log(jnp.maximum(alpha, 1e-20)) - jnp.log(
            jnp.maximum(sigma, 1e-20))

    def dpmpp_2m_step(self, model_output, t, prev_t, sample,
                      prev_d, prev_lambda, is_first):
        """One DPM-Solver++ 2M update (beyond-parity fast sampler).

        Carries (prev_d, prev_lambda) across steps; ``is_first`` marks the
        first iteration (falls back to the 1st-order DPM-Solver++ update).
        Returns (prev_sample, x0, new_prev_d, new_lambda).
        """
        acp = jnp.asarray(self.alphas_cumprod)
        acp_t = acp[t]
        acp_prev = jnp.where(prev_t >= 0, acp[jnp.clip(prev_t, 0)],
                             jnp.float32(1.0))
        x0, _ = self._pred_x0_eps(model_output, sample, acp_t, 1.0 - acp_t)

        lam_t = self._lambda(acp_t)
        lam_prev = self._lambda(acp_prev)
        h = lam_prev - lam_t
        sigma_t = jnp.sqrt(1.0 - acp_t)
        sigma_prev = jnp.sqrt(1.0 - acp_prev)
        alpha_prev = jnp.sqrt(acp_prev)

        # 2nd-order combined data prediction
        h_last = lam_t - prev_lambda
        r = h_last / jnp.where(h == 0, 1.0, h)
        d2 = (1.0 + 1.0 / (2.0 * jnp.maximum(r, 1e-8))) * x0 \
            - (1.0 / (2.0 * jnp.maximum(r, 1e-8))) * prev_d
        d = jnp.where(is_first, x0, d2)

        update = (sigma_prev / jnp.maximum(sigma_t, 1e-20)) * sample \
            - alpha_prev * (jnp.exp(-h) - 1.0) * d
        # final step (prev_t < 0): sigma_prev = 0 -> return x0 exactly
        prev_sample = jnp.where(prev_t >= 0, update, x0)
        return prev_sample, x0, x0, lam_t

    def pred_original_sample(self, model_output, t, sample):
        """x0 prediction only (used by the latent loss, convofusion.py:619)."""
        acp = jnp.asarray(self.alphas_cumprod)
        alpha_prod_t = acp[t]
        x0, _ = self._pred_x0_eps(
            model_output, sample, alpha_prod_t, 1.0 - alpha_prod_t
        )
        return x0


def scheduler_from_config(params: dict, num_inference_timesteps: int = 1000,
                          eta: float = 0.0, variant: Optional[str] = None
                          ) -> DiffusionScheduler:
    """Build from the reference's scheduler.yaml ``params`` block."""
    return DiffusionScheduler(
        num_train_timesteps=int(params.get("num_train_timesteps", 1000)),
        beta_start=float(params.get("beta_start", 0.00085)),
        beta_end=float(params.get("beta_end", 0.012)),
        beta_schedule=str(params.get("beta_schedule", "scaled_linear")),
        clip_sample=bool(params.get("clip_sample", True)),
        prediction_type=str(params.get("prediction_type", "epsilon")),
        variant=variant or str(params.get("variant", "ddpm")),
        eta=eta,
    )
