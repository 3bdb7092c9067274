"""Diffusion timestep embeddings.

Reference: convofusion/models/architectures/tools/embeddings.py:245-322
(get_timestep_embedding / TimestepEmbedding / Timesteps).
"""
from __future__ import annotations

import math

import flax.linen as nn
import jax.numpy as jnp


def get_timestep_embedding(
    timesteps,
    embedding_dim: int,
    flip_sin_to_cos: bool = False,
    downscale_freq_shift: float = 1.0,
    scale: float = 1.0,
    max_period: int = 10000,
):
    """Sinusoidal timestep embedding, (N,) -> (N, embedding_dim)."""
    half_dim = embedding_dim // 2
    exponent = -math.log(max_period) * jnp.arange(half_dim, dtype=jnp.float32)
    exponent = exponent / (half_dim - downscale_freq_shift)
    emb = timesteps.astype(jnp.float32)[:, None] * jnp.exp(exponent)[None, :]
    emb = scale * emb
    emb = jnp.concatenate([jnp.sin(emb), jnp.cos(emb)], axis=-1)
    if flip_sin_to_cos:
        emb = jnp.concatenate([emb[:, half_dim:], emb[:, :half_dim]], axis=-1)
    if embedding_dim % 2 == 1:
        emb = jnp.pad(emb, ((0, 0), (0, 1)))
    return emb


class Timesteps(nn.Module):
    num_channels: int
    flip_sin_to_cos: bool = True
    downscale_freq_shift: float = 0.0

    def __call__(self, timesteps):
        return get_timestep_embedding(
            timesteps,
            self.num_channels,
            flip_sin_to_cos=self.flip_sin_to_cos,
            downscale_freq_shift=self.downscale_freq_shift,
        )


class TimestepEmbedding(nn.Module):
    """Two-layer SiLU MLP over the sinusoid embedding."""

    time_embed_dim: int

    @nn.compact
    def __call__(self, sample):
        sample = nn.Dense(self.time_embed_dim, name="linear_1")(sample)
        sample = nn.silu(sample)
        sample = nn.Dense(self.time_embed_dim, name="linear_2")(sample)
        return sample
