"""Native JAX T5 encoder + projection head.

Reference: convofusion/models/architectures/t5.py (frozen HF ``t5-base``
encoder with a ReLU+Linear 768->512 projection, <bos>/<eos> wrapping and a
max text length of 200).

The TPU build implements the T5 encoder stack natively in flax (RMSNorm,
relative position buckets, unscaled attention, ReLU FF — the t5-base
recipe) so the framework has no network dependency; released HF/torch
weights load through ``convofusion_tpu.compat.torch_loader`` /
``t5_params_from_torch`` below.  Tokenization is host-side preprocessing
(see convofusion_tpu/models/tokenizer.py).
"""
from __future__ import annotations

import flax.linen as nn
import jax
import jax.numpy as jnp
import numpy as np


class T5LayerNorm(nn.Module):
    """RMS norm without mean subtraction or bias (T5 style)."""

    epsilon: float = 1e-6

    @nn.compact
    def __call__(self, x):
        scale = self.param(
            "weight", nn.initializers.ones, (x.shape[-1],))
        dtype = x.dtype
        x = x.astype(jnp.float32)
        var = jnp.mean(jnp.square(x), axis=-1, keepdims=True)
        x = x * (var + self.epsilon) ** -0.5
        return (scale * x).astype(dtype)


def relative_position_bucket(relative_position, num_buckets=32,
                             max_distance=128):
    """Bidirectional T5 bucket function (HF semantics)."""
    num_buckets //= 2
    ret = (relative_position > 0).astype(np.int32) * num_buckets
    n = np.abs(relative_position)
    max_exact = num_buckets // 2
    is_small = n < max_exact
    val_if_large = max_exact + (
        np.log(np.maximum(n, 1) / max_exact)
        / np.log(max_distance / max_exact)
        * (num_buckets - max_exact)
    ).astype(np.int32)
    val_if_large = np.minimum(val_if_large, num_buckets - 1)
    return ret + np.where(is_small, n, val_if_large)


class T5SelfAttention(nn.Module):
    d_model: int
    num_heads: int
    d_kv: int
    has_relative_bias: bool = False
    num_buckets: int = 32
    max_distance: int = 128
    dropout: float = 0.0
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x, attention_mask=None, position_bias=None,
                 deterministic: bool = True):
        inner = self.num_heads * self.d_kv
        dense = lambda name: nn.Dense(  # noqa: E731
            inner, use_bias=False, dtype=self.dtype, name=name)
        b, t, _ = x.shape
        q = dense("q")(x).reshape(b, t, self.num_heads, self.d_kv)
        k = dense("k")(x).reshape(b, t, self.num_heads, self.d_kv)
        v = dense("v")(x).reshape(b, t, self.num_heads, self.d_kv)

        # T5 uses *unscaled* dot-product attention
        scores = jnp.einsum("bqhd,bkhd->bhqk", q, k)

        if self.has_relative_bias:
            buckets = relative_position_bucket(
                np.arange(t)[None, :] - np.arange(t)[:, None],
                self.num_buckets, self.max_distance)
            bias_table = nn.Embed(
                self.num_buckets, self.num_heads, dtype=self.dtype,
                name="relative_attention_bias")
            position_bias = jnp.transpose(
                bias_table(jnp.asarray(buckets)), (2, 0, 1))[None]
        if position_bias is not None:
            scores = scores + position_bias
        if attention_mask is not None:
            scores = jnp.where(
                attention_mask[:, None, None, :], scores, -1e9)

        weights = nn.softmax(scores.astype(jnp.float32), axis=-1).astype(
            self.dtype)
        weights = nn.Dropout(self.dropout)(weights,
                                           deterministic=deterministic)
        out = jnp.einsum("bhqk,bkhd->bqhd", weights, v).reshape(b, t, inner)
        out = nn.Dense(self.d_model, use_bias=False, dtype=self.dtype,
                       name="o")(out)
        return out, position_bias


class T5Block(nn.Module):
    d_model: int
    d_ff: int
    num_heads: int
    d_kv: int
    has_relative_bias: bool = False
    dropout: float = 0.0
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x, attention_mask=None, position_bias=None,
                 deterministic: bool = True):
        attn = T5SelfAttention(
            self.d_model, self.num_heads, self.d_kv,
            has_relative_bias=self.has_relative_bias, dropout=self.dropout,
            dtype=self.dtype, name="attention")
        h, position_bias = attn(
            T5LayerNorm(name="attn_norm")(x), attention_mask, position_bias,
            deterministic)
        x = x + nn.Dropout(self.dropout)(h, deterministic=deterministic)

        h = T5LayerNorm(name="ff_norm")(x)
        h = nn.Dense(self.d_ff, use_bias=False, dtype=self.dtype,
                     name="wi")(h)
        h = nn.relu(h)
        h = nn.Dropout(self.dropout)(h, deterministic=deterministic)
        h = nn.Dense(self.d_model, use_bias=False, dtype=self.dtype,
                     name="wo")(h)
        x = x + nn.Dropout(self.dropout)(h, deterministic=deterministic)
        return x, position_bias


class T5EncoderStack(nn.Module):
    vocab_size: int = 32128
    d_model: int = 768
    d_ff: int = 3072
    num_layers: int = 12
    num_heads: int = 12
    d_kv: int = 64
    dropout: float = 0.0
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, input_ids, attention_mask=None,
                 deterministic: bool = True):
        x = nn.Embed(self.vocab_size, self.d_model, dtype=self.dtype,
                     name="embed_tokens")(input_ids)
        x = nn.Dropout(self.dropout)(x, deterministic=deterministic)
        position_bias = None
        for i in range(self.num_layers):
            x, position_bias = T5Block(
                self.d_model, self.d_ff, self.num_heads, self.d_kv,
                has_relative_bias=(i == 0), dropout=self.dropout,
                dtype=self.dtype, name=f"block_{i}")(
                    x, attention_mask, position_bias, deterministic)
        x = T5LayerNorm(name="final_layer_norm")(x)
        return nn.Dropout(self.dropout)(x, deterministic=deterministic)


class T5TextEncoder(nn.Module):
    """T5 encoder + ReLU/Linear projection to the condition dim
    (t5.py:48-59)."""

    latent_dim: int = 512
    vocab_size: int = 32128
    d_model: int = 768
    d_ff: int = 3072
    num_layers: int = 12
    num_heads: int = 12
    d_kv: int = 64
    dropout: float = 0.0
    text_max_length: int = 200
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, input_ids, attention_mask=None,
                 deterministic: bool = True):
        """input_ids (B, T) int32; attention_mask (B, T) bool True=valid.

        Returns (text_emb (B, T, latent_dim), mask)."""
        hidden = T5EncoderStack(
            self.vocab_size, self.d_model, self.d_ff, self.num_layers,
            self.num_heads, self.d_kv, self.dropout, dtype=self.dtype,
            name="text_model")(input_ids, attention_mask, deterministic)
        # the trunk is frozen (t5.py:35-37 sets requires_grad=False on
        # every text_model param); stopping the gradient here both
        # enforces that and lets XLA drop the trunk's backward residuals
        # — without it a train step differentiates 12 T5 layers x 2
        # (spk+lsn) for gradients the optimizer must discard
        hidden = jax.lax.stop_gradient(hidden)
        emb = nn.Dense(self.latent_dim, dtype=self.dtype,
                       name="projection_1")(nn.relu(hidden))
        return emb, attention_mask


def t5_params_from_torch(sd, num_layers: int = 12):
    """HF torch T5EncoderModel state dict -> T5EncoderStack param tree."""
    import numpy as np  # noqa: F811

    def g(k):
        return np.asarray(sd[k])

    params = {
        "embed_tokens": {"embedding": g("encoder.embed_tokens.weight")
                         if "encoder.embed_tokens.weight" in sd
                         else g("shared.weight")},
        "final_layer_norm": {"weight": g("encoder.final_layer_norm.weight")},
    }
    for i in range(num_layers):
        p = f"encoder.block.{i}.layer"
        blk = {
            "attention": {
                "q": {"kernel": g(f"{p}.0.SelfAttention.q.weight").T},
                "k": {"kernel": g(f"{p}.0.SelfAttention.k.weight").T},
                "v": {"kernel": g(f"{p}.0.SelfAttention.v.weight").T},
                "o": {"kernel": g(f"{p}.0.SelfAttention.o.weight").T},
            },
            "attn_norm": {"weight": g(f"{p}.0.layer_norm.weight")},
            "ff_norm": {"weight": g(f"{p}.1.layer_norm.weight")},
            "wi": {"kernel": g(f"{p}.1.DenseReluDense.wi.weight").T},
            "wo": {"kernel": g(f"{p}.1.DenseReluDense.wo.weight").T},
        }
        if i == 0:
            blk["attention"]["relative_attention_bias"] = {
                "embedding": g(
                    f"{p}.0.SelfAttention.relative_attention_bias.weight")
            }
        params[f"block_{i}"] = blk
    return params
