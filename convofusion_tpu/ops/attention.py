"""Multi-head attention that also returns head-averaged attention weights.

The reference leans on torch ``nn.MultiheadAttention`` everywhere
(convofusion/models/operator/cross_attention.py) and consumes the returned
attention matrices for word-excitation guidance and result dumps.  This JAX
version keeps the same contract: ``(out, weights)`` with weights averaged
over heads, shape (B, Tq, Tk).

Layout is batch-first; the matmuls are shaped so XLA maps them straight onto
the MXU ((B*Tq, D) x (D, D) projections and batched (Tq, Tk) logits).

The module is setup-style so the q/k/v/out projections are individually
addressable — the guidance-aware sampler path projects the two distinct
condition variants once and reuses them across the seven guidance branches
(see ops/transformer.py TransformerDecoderLayer2Att.guided).
"""
from __future__ import annotations

from typing import Optional

import flax.linen as nn
import jax.numpy as jnp

_BIG_NEG = -1e9

xavier_uniform = nn.initializers.xavier_uniform()


class MultiheadAttention(nn.Module):
    d_model: int
    num_heads: int
    dropout: float = 0.0
    dtype: jnp.dtype = jnp.float32

    def setup(self):
        d = self.d_model
        self.q_proj = nn.Dense(d, kernel_init=xavier_uniform,
                               dtype=self.dtype, name="q_proj")
        self.k_proj = nn.Dense(d, kernel_init=xavier_uniform,
                               dtype=self.dtype, name="k_proj")
        self.v_proj = nn.Dense(d, kernel_init=xavier_uniform,
                               dtype=self.dtype, name="v_proj")
        self.out_proj = nn.Dense(d, kernel_init=xavier_uniform,
                                 dtype=self.dtype, name="out_proj")
        self.attn_dropout = nn.Dropout(self.dropout)

    def __call__(
        self,
        query,
        key,
        value,
        key_padding_mask: Optional[jnp.ndarray] = None,
        attn_mask: Optional[jnp.ndarray] = None,
        deterministic: bool = True,
    ):
        """query (B, Tq, D); key/value (B, Tk, D).

        key_padding_mask: (B, Tk) bool, True = PAD (torch convention).
        attn_mask: (Tq, Tk) additive or bool mask, True = disallowed.
        """
        d, h = self.d_model, self.num_heads
        head_dim = d // h
        assert head_dim * h == d

        q = self.q_proj(query)
        k = self.k_proj(key)
        v = self.v_proj(value)

        b, tq, _ = q.shape
        tk = k.shape[1]
        q = q.reshape(b, tq, h, head_dim)
        k = k.reshape(b, tk, h, head_dim)
        v = v.reshape(b, tk, h, head_dim)

        logits = jnp.einsum("bqhd,bkhd->bhqk", q, k) / jnp.sqrt(
            jnp.asarray(head_dim, q.dtype)
        )
        if key_padding_mask is not None:
            logits = jnp.where(
                key_padding_mask[:, None, None, :], _BIG_NEG, logits
            )
        if attn_mask is not None:
            if attn_mask.dtype == jnp.bool_:
                logits = jnp.where(attn_mask[None, None], _BIG_NEG, logits)
            else:
                logits = logits + attn_mask[None, None].astype(logits.dtype)

        weights = nn.softmax(logits.astype(jnp.float32), axis=-1).astype(
            self.dtype
        )
        if self.dropout > 0.0:
            weights_d = self.attn_dropout(weights,
                                          deterministic=deterministic)
        else:
            weights_d = weights
        out = jnp.einsum("bhqk,bkhd->bqhd", weights_d, v).reshape(b, tq, d)
        out = self.out_proj(out)
        return out, weights.mean(axis=1)

    # ---- grouped single-head helpers for the guidance-aware fast path
    def project_kv(self, memory):
        """(B, Tk, D) -> (k, v), no head split (single-head use)."""
        return self.k_proj(memory), self.v_proj(memory)

    def grouped_attend(self, q_group, k, v,
                       key_padding_mask=None):
        """q_group (G, B, Tq, D) — G guidance branches sharing (B, Tk, D)
        keys/values.  Single-head.  Returns (out (G,B,Tq,D),
        weights (G,B,Tq,Tk)).

        ``k``/``v`` may be single shared rows (1, Tk, D) — the uncond
        variant's rows are identical across the batch, so its
        projections run at batch 1 and broadcast here."""
        assert self.num_heads == 1
        scale = jnp.sqrt(jnp.asarray(self.d_model, q_group.dtype))
        shared_kv = k.shape[0] == 1 and q_group.shape[1] != 1
        if shared_kv:
            logits = jnp.einsum("gbqd,kd->gbqk", q_group, k[0]) / scale
        else:
            logits = jnp.einsum("gbqd,bkd->gbqk", q_group, k) / scale
        if key_padding_mask is not None:
            logits = jnp.where(
                key_padding_mask[None, :, None, :], _BIG_NEG, logits)
        weights = nn.softmax(logits.astype(jnp.float32), axis=-1).astype(
            self.dtype)
        if shared_kv:
            out = jnp.einsum("gbqk,kd->gbqd", weights, v[0])
        else:
            out = jnp.einsum("gbqk,bkd->gbqd", weights, v)
        return out, weights
