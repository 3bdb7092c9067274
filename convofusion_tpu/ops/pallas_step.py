"""Pallas TPU kernel: fused modality-guidance combine + scheduler step.

Per reverse-diffusion step the sampler chains ~10 elementwise ops over the
latents — the 7-branch guidance combination (convofusion.py:527-541)
followed by the DDPM/DDIM update (diffusion/schedulers.py:step).  XLA fuses
most of it, but each scan iteration still round-trips several (B, 16, 128)
intermediates through HBM.  This kernel does the whole chain in one VMEM
pass: branch reduce, epsilon/x0 extraction, clipping, posterior mean +
variance noise (DDPM) or the deterministic DDIM update.

Latents are viewed as (R, 128) rows (R = B * 16) — naturally tiled for the
8x128 VPU.  Per-step scalars (alpha-prods, guidance scale, flags) arrive
via scalar prefetch in SMEM, so one compiled kernel serves every timestep.

Falls back to interpret mode off-TPU (tests run it on CPU).
"""
from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl

try:
    from jax.experimental.pallas import tpu as pltpu

    _HAS_PLTPU = True
except Exception:  # pragma: no cover
    pltpu = None
    _HAS_PLTPU = False

NUM_BRANCHES = 7


def _kernel(scalars_ref, np7_ref, lat_ref, noise_ref, out_ref):
    """scalars: [alpha_t, alpha_prev, gs, is_ddpm, add_noise, clip]
    np7 (7, R, 128); lat/noise/out (R, 128)."""
    alpha_t = scalars_ref[0]
    alpha_prev = scalars_ref[1]
    gs = scalars_ref[2]
    is_ddpm = scalars_ref[3]
    add_noise = scalars_ref[4]
    clip = scalars_ref[5]

    # guidance combine: uncond + gs * (sum(single) - 5 * uncond);
    # full-cond branch (6) has weight 0
    uncond = np7_ref[0]
    single = (np7_ref[1] + np7_ref[2] + np7_ref[3] + np7_ref[4]
              + np7_ref[5])
    eps = uncond + gs * (single - 5.0 * uncond)

    lat = lat_ref[...]
    beta_t = 1.0 - alpha_t
    beta_prev = 1.0 - alpha_prev
    sqrt_at = jnp.sqrt(alpha_t)
    sqrt_bt = jnp.sqrt(beta_t)

    x0 = (lat - sqrt_bt * eps) / sqrt_at
    x0 = jnp.where(clip > 0, jnp.clip(x0, -1.0, 1.0), x0)
    # re-derived epsilon from the (possibly clipped) x0
    eps2 = (lat - sqrt_at * x0) / sqrt_bt

    # DDPM posterior (fixed_small variance)
    current_alpha = alpha_t / alpha_prev
    current_beta = 1.0 - current_alpha
    coef_x0 = jnp.sqrt(alpha_prev) * current_beta / beta_t
    coef_xt = jnp.sqrt(current_alpha) * beta_prev / beta_t
    variance = jnp.maximum(beta_prev / beta_t * current_beta, 1e-20)
    ddpm = (coef_x0 * x0 + coef_xt * lat
            + add_noise * jnp.sqrt(variance) * noise_ref[...])

    # DDIM (eta = 0)
    ddim = (jnp.sqrt(alpha_prev) * x0
            + jnp.sqrt(jnp.maximum(beta_prev, 0.0)) * eps2)

    out_ref[...] = jnp.where(is_ddpm > 0, ddpm, ddim)


@functools.partial(jax.jit, static_argnames=("interpret",))
def fused_guided_step(
    noise_pred7,  # (7, B, T, D)
    latents,      # (B, T, D)
    noise,        # (B, T, D)
    alpha_prod_t,
    alpha_prod_prev,
    guidance_scale,
    is_ddpm,
    add_noise,
    clip_sample,
    interpret: bool = False,
):
    """Returns the next latents; exact match of guidance_combine_branches +
    DiffusionScheduler.step for epsilon prediction."""
    b, t, d = latents.shape
    r = b * t
    np7 = noise_pred7.reshape(NUM_BRANCHES, r, d).astype(jnp.float32)
    lat = latents.reshape(r, d).astype(jnp.float32)
    nz = noise.reshape(r, d).astype(jnp.float32)
    scalars = jnp.stack([
        alpha_prod_t, alpha_prod_prev, guidance_scale, is_ddpm,
        add_noise, clip_sample,
    ]).astype(jnp.float32)

    if _HAS_PLTPU and not interpret:
        grid_spec = pltpu.PrefetchScalarGridSpec(
            num_scalar_prefetch=1,
            grid=(1,),
            in_specs=[
                # index maps receive (grid_idx, *scalar_refs) under
                # scalar prefetch
                pl.BlockSpec((NUM_BRANCHES, r, d),
                             lambda i, *_: (0, 0, 0),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((r, d), lambda i, *_: (0, 0),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((r, d), lambda i, *_: (0, 0),
                             memory_space=pltpu.VMEM),
            ],
            out_specs=pl.BlockSpec((r, d), lambda i, *_: (0, 0),
                                   memory_space=pltpu.VMEM),
        )
        out = pl.pallas_call(
            _kernel,
            grid_spec=grid_spec,
            out_shape=jax.ShapeDtypeStruct((r, d), jnp.float32),
        )(scalars, np7, lat, nz)
    else:
        out = pl.pallas_call(
            _kernel,
            grid=(1,),
            in_specs=[
                pl.BlockSpec((6,), lambda i: (0,)),
                pl.BlockSpec((NUM_BRANCHES, r, d), lambda i: (0, 0, 0)),
                pl.BlockSpec((r, d), lambda i: (0, 0)),
                pl.BlockSpec((r, d), lambda i: (0, 0)),
            ],
            out_shape=jax.ShapeDtypeStruct((r, d), jnp.float32),
            interpret=True,
        )(scalars, np7, lat, nz)
    return out.reshape(b, t, d).astype(latents.dtype)


def reference_guided_step(noise_pred7, latents, noise, alpha_prod_t,
                          alpha_prod_prev, guidance_scale, is_ddpm,
                          add_noise, clip_sample):
    """Pure-jnp mirror for testing (same math, unfused)."""
    uncond = noise_pred7[0]
    single = jnp.sum(noise_pred7[1:6], axis=0)
    eps = uncond + guidance_scale * (single - 5.0 * uncond)
    beta_t = 1.0 - alpha_prod_t
    beta_prev = 1.0 - alpha_prod_prev
    x0 = (latents - jnp.sqrt(beta_t) * eps) / jnp.sqrt(alpha_prod_t)
    x0 = jnp.where(clip_sample > 0, jnp.clip(x0, -1, 1), x0)
    eps2 = (latents - jnp.sqrt(alpha_prod_t) * x0) / jnp.sqrt(beta_t)
    cur_a = alpha_prod_t / alpha_prod_prev
    cur_b = 1 - cur_a
    coef_x0 = jnp.sqrt(alpha_prod_prev) * cur_b / beta_t
    coef_xt = jnp.sqrt(cur_a) * beta_prev / beta_t
    var = jnp.maximum(beta_prev / beta_t * cur_b, 1e-20)
    ddpm = coef_x0 * x0 + coef_xt * latents + \
        add_noise * jnp.sqrt(var) * noise
    ddim = jnp.sqrt(alpha_prod_prev) * x0 + \
        jnp.sqrt(jnp.maximum(beta_prev, 0.0)) * eps2
    return jnp.where(is_ddpm > 0, ddpm, ddim)
