"""Positional encodings (reference: convofusion/models/operator/position_encoding.py).

Batch-first layout (B, T, D) throughout — the reference's torch modules are
seq-first; the TPU build keeps batch leading so XLA sees one contiguous
(B*T, D) matmul operand per layer.
"""
from __future__ import annotations

import flax.linen as nn
import jax.numpy as jnp
import numpy as np


def sinusoid_table(max_len: int, d_model: int) -> np.ndarray:
    """Classic transformer sine/cos table, shape (max_len, d_model).

    Matches PositionEmbeddingSine1D's buffer (position_encoding.py:113-127).
    """
    pe = np.zeros((max_len, d_model), dtype=np.float32)
    position = np.arange(max_len, dtype=np.float32)[:, None]
    div_term = np.exp(
        np.arange(0, d_model, 2, dtype=np.float32) * (-np.log(10000.0) / d_model)
    )
    pe[:, 0::2] = np.sin(position * div_term)
    pe[:, 1::2] = np.cos(position * div_term)
    return pe


class PositionEmbeddingSine1D(nn.Module):
    """x + sine PE along the sequence axis (position_encoding.py:113-136)."""

    d_model: int
    max_len: int = 1024

    @nn.compact
    def __call__(self, x):
        pe = jnp.asarray(sinusoid_table(self.max_len, self.d_model), dtype=x.dtype)
        return x + pe[None, : x.shape[1], :]


class PositionEmbeddingSineBH(nn.Module):
    """Body/hands interleaved sine PE (position_encoding.py:138-163).

    Token 2i (body) and 2i+1 (hands) both receive PE of position i, so the
    denoiser's 16-token latent sequence carries 8 chunk positions twice.
    Implemented as a repeat instead of strided writes.
    """

    d_model: int
    max_len: int = 1024

    @nn.compact
    def __call__(self, x):
        t = x.shape[1]
        pe = jnp.asarray(sinusoid_table(self.max_len, self.d_model), dtype=x.dtype)
        pe_bh = jnp.repeat(pe[: (t + 1) // 2], 2, axis=0)[:t]
        return x + pe_bh[None, :, :]


class PositionEmbeddingLearned1D(nn.Module):
    """x + learned PE (position_encoding.py:166-188); init U(0,1) as torch."""

    d_model: int
    max_len: int = 1024

    @nn.compact
    def __call__(self, x):
        pe = self.param(
            "pe",
            nn.initializers.uniform(scale=1.0),
            (self.max_len, self.d_model),
        )
        return x + pe[None, : x.shape[1], :].astype(x.dtype)


def build_position_encoding(d_model: int, position_embedding: str = "sine",
                            max_len: int = 1024, name: str | None = None):
    """Factory matching position_encoding.py:191-216 (1D variants)."""
    if position_embedding in ("v2", "sine"):
        return PositionEmbeddingSine1D(d_model, max_len, name=name)
    if position_embedding == "sine_bh":
        return PositionEmbeddingSineBH(d_model, max_len, name=name)
    if position_embedding in ("v3", "learned"):
        return PositionEmbeddingLearned1D(d_model, max_len, name=name)
    raise ValueError(f"not supported {position_embedding}")


class PositionalEncoding(nn.Module):
    """Sine PE + dropout (reference:
    convofusion/models/operator/position_encoding_layer.py, exported via
    operator/__init__.py; kept for API completeness)."""

    d_model: int
    dropout: float = 0.1
    max_len: int = 5000

    @nn.compact
    def __call__(self, x, deterministic: bool = True):
        pe = jnp.asarray(sinusoid_table(self.max_len, self.d_model),
                         dtype=x.dtype)
        x = x + pe[None, : x.shape[1], :]
        return nn.Dropout(self.dropout)(x, deterministic=deterministic)
