"""Transformer blocks: DETR-style skip encoder/decoder and the five-stream
conditional decoder layer at the heart of the denoiser.

Reference: convofusion/models/operator/cross_attention.py
  - SkipTransformerEncoder/Decoder          :18-125  (U-Net skips over layers)
  - TransformerEncoder/DecoderLayer         :250-395 (pre/post-norm)
  - TimeBlock (AdaLN-style scale/shift)     :411-439
  - TransformerDecoderLayer2Att             :442-681 (self-attn -> TimeBlock ->
      5 parallel single-head cross-attentions -> fuser -> TimeBlock -> FFN)
  - TransformerDecoder (att-mat collecting) :195-247

All modules are batch-first (B, T, D).  Masks follow the torch convention:
``key_padding_mask`` True = PAD.
"""
from __future__ import annotations

from typing import Dict, Optional

import flax.linen as nn
import jax.numpy as jnp

from convofusion_tpu.ops.attention import MultiheadAttention, xavier_uniform

# the five conditioning streams, in fuser concat order
# (cross_attention.py:579,629)
COND_STREAMS = ("spkemb", "alsn", "tlsn", "apb", "lsnemb")


def _activation(name: str):
    if name == "relu":
        return nn.relu
    if name == "gelu":
        # torch F.gelu is the exact erf formulation
        return lambda x: nn.gelu(x, approximate=False)
    raise ValueError(f"activation should be relu/gelu, not {name}")


class _FFN(nn.Module):
    d_model: int
    dim_feedforward: int
    dropout: float
    activation: str = "gelu"
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x, deterministic: bool = True):
        act = _activation(self.activation)
        x = nn.Dense(self.dim_feedforward, kernel_init=xavier_uniform,
                     dtype=self.dtype, name="linear1")(x)
        x = nn.Dropout(self.dropout)(act(x), deterministic=deterministic)
        x = nn.Dense(self.d_model, kernel_init=xavier_uniform,
                     dtype=self.dtype, name="linear2")(x)
        return x


def _with_pos(x, pos):
    return x if pos is None else x + pos


class TransformerEncoderLayer(nn.Module):
    d_model: int
    nhead: int
    dim_feedforward: int = 2048
    dropout: float = 0.1
    activation: str = "gelu"
    normalize_before: bool = False
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, src, src_key_padding_mask=None, pos=None,
                 deterministic: bool = True):
        attn = MultiheadAttention(self.d_model, self.nhead, self.dropout,
                                  dtype=self.dtype, name="self_attn")
        ffn = _FFN(self.d_model, self.dim_feedforward, self.dropout,
                   self.activation, dtype=self.dtype, name="ffn")
        norm1 = nn.LayerNorm(epsilon=1e-5, name="norm1")
        norm2 = nn.LayerNorm(epsilon=1e-5, name="norm2")
        drop = nn.Dropout(self.dropout)

        if self.normalize_before:
            src2 = norm1(src)
            q = k = _with_pos(src2, pos)
            src2, _ = attn(q, k, src2, key_padding_mask=src_key_padding_mask,
                           deterministic=deterministic)
            src = src + drop(src2, deterministic=deterministic)
            src2 = ffn(norm2(src), deterministic=deterministic)
            return src + drop(src2, deterministic=deterministic)
        q = k = _with_pos(src, pos)
        src2, _ = attn(q, k, src, key_padding_mask=src_key_padding_mask,
                       deterministic=deterministic)
        src = norm1(src + drop(src2, deterministic=deterministic))
        src2 = ffn(src, deterministic=deterministic)
        return norm2(src + drop(src2, deterministic=deterministic))


class TransformerDecoderLayer(nn.Module):
    d_model: int
    nhead: int
    dim_feedforward: int = 2048
    dropout: float = 0.1
    activation: str = "gelu"
    normalize_before: bool = False
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, tgt, memory, tgt_key_padding_mask=None,
                 memory_key_padding_mask=None, pos=None, query_pos=None,
                 deterministic: bool = True):
        self_attn = MultiheadAttention(self.d_model, self.nhead, self.dropout,
                                       dtype=self.dtype, name="self_attn")
        cross_attn = MultiheadAttention(self.d_model, self.nhead, self.dropout,
                                        dtype=self.dtype, name="multihead_attn")
        ffn = _FFN(self.d_model, self.dim_feedforward, self.dropout,
                   self.activation, dtype=self.dtype, name="ffn")
        norm1 = nn.LayerNorm(epsilon=1e-5, name="norm1")
        norm2 = nn.LayerNorm(epsilon=1e-5, name="norm2")
        norm3 = nn.LayerNorm(epsilon=1e-5, name="norm3")
        drop = nn.Dropout(self.dropout)

        if self.normalize_before:
            tgt2 = norm1(tgt)
            q = k = _with_pos(tgt2, query_pos)
            tgt2, _ = self_attn(q, k, tgt2,
                                key_padding_mask=tgt_key_padding_mask,
                                deterministic=deterministic)
            tgt = tgt + drop(tgt2, deterministic=deterministic)
            tgt2 = norm2(tgt)
            tgt2, _ = cross_attn(_with_pos(tgt2, query_pos),
                                 _with_pos(memory, pos), memory,
                                 key_padding_mask=memory_key_padding_mask,
                                 deterministic=deterministic)
            tgt = tgt + drop(tgt2, deterministic=deterministic)
            tgt2 = ffn(norm3(tgt), deterministic=deterministic)
            return tgt + drop(tgt2, deterministic=deterministic)
        q = k = _with_pos(tgt, query_pos)
        tgt2, _ = self_attn(q, k, tgt, key_padding_mask=tgt_key_padding_mask,
                            deterministic=deterministic)
        tgt = norm1(tgt + drop(tgt2, deterministic=deterministic))
        tgt2, _ = cross_attn(_with_pos(tgt, query_pos),
                             _with_pos(memory, pos), memory,
                             key_padding_mask=memory_key_padding_mask,
                             deterministic=deterministic)
        tgt = norm2(tgt + drop(tgt2, deterministic=deterministic))
        tgt2 = ffn(tgt, deterministic=deterministic)
        return norm3(tgt + drop(tgt2, deterministic=deterministic))


class SkipTransformerEncoder(nn.Module):
    """U-Net-style layer stack: (n-1)/2 in-blocks, middle, (n-1)/2 out-blocks
    with Linear(2d->d) skip merges (cross_attention.py:18-64)."""

    d_model: int
    num_layers: int
    nhead: int
    dim_feedforward: int = 2048
    dropout: float = 0.1
    activation: str = "gelu"
    normalize_before: bool = False
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, src, src_key_padding_mask=None, pos=None,
                 deterministic: bool = True):
        assert self.num_layers % 2 == 1
        num_block = (self.num_layers - 1) // 2

        def layer(name):
            return TransformerEncoderLayer(
                self.d_model, self.nhead, self.dim_feedforward, self.dropout,
                self.activation, self.normalize_before, dtype=self.dtype,
                name=name)

        x = src
        xs = []
        for i in range(num_block):
            x = layer(f"input_blocks_{i}")(
                x, src_key_padding_mask, pos, deterministic)
            xs.append(x)
        x = layer("middle_block")(x, src_key_padding_mask, pos, deterministic)
        for i in range(num_block):
            x = jnp.concatenate([x, xs.pop()], axis=-1)
            x = nn.Dense(self.d_model, kernel_init=xavier_uniform,
                         dtype=self.dtype, name=f"linear_blocks_{i}")(x)
            x = layer(f"output_blocks_{i}")(
                x, src_key_padding_mask, pos, deterministic)
        return nn.LayerNorm(epsilon=1e-5, name="norm")(x)


class SkipTransformerDecoder(nn.Module):
    """Skip-connected decoder stack (cross_attention.py:66-125)."""

    d_model: int
    num_layers: int
    nhead: int
    dim_feedforward: int = 2048
    dropout: float = 0.1
    activation: str = "gelu"
    normalize_before: bool = False
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, tgt, memory, tgt_key_padding_mask=None,
                 memory_key_padding_mask=None, pos=None, query_pos=None,
                 deterministic: bool = True):
        assert self.num_layers % 2 == 1
        num_block = (self.num_layers - 1) // 2

        def layer(name):
            return TransformerDecoderLayer(
                self.d_model, self.nhead, self.dim_feedforward, self.dropout,
                self.activation, self.normalize_before, dtype=self.dtype,
                name=name)

        x = tgt
        xs = []
        for i in range(num_block):
            x = layer(f"input_blocks_{i}")(
                x, memory, tgt_key_padding_mask, memory_key_padding_mask,
                pos, query_pos, deterministic)
            xs.append(x)
        x = layer("middle_block")(
            x, memory, tgt_key_padding_mask, memory_key_padding_mask,
            pos, query_pos, deterministic)
        for i in range(num_block):
            x = jnp.concatenate([x, xs.pop()], axis=-1)
            x = nn.Dense(self.d_model, kernel_init=xavier_uniform,
                         dtype=self.dtype, name=f"linear_blocks_{i}")(x)
            x = layer(f"output_blocks_{i}")(
                x, memory, tgt_key_padding_mask, memory_key_padding_mask,
                pos, query_pos, deterministic)
        return nn.LayerNorm(epsilon=1e-5, name="norm")(x)


class TimeBlock(nn.Module):
    """AdaLN-style timestep modulation (cross_attention.py:411-439).

    h: (B, T, D); emb: (B, 1, D).  Returns the residual *delta* (caller adds).
    """

    latent_dim: int
    dropout: float = 0.1
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, h, emb, deterministic: bool = True):
        emb_out = nn.Dense(2 * self.latent_dim, dtype=self.dtype,
                           name="emb_layers_1")(nn.silu(emb))
        scale, shift = jnp.split(emb_out, 2, axis=-1)
        h = nn.LayerNorm(epsilon=1e-5, name="norm")(h) * (1 + scale) + shift
        h = nn.Dropout(self.dropout)(nn.silu(h), deterministic=deterministic)
        h = nn.Dense(self.latent_dim, dtype=self.dtype, name="out_layers_2")(h)
        return h


class TransformerDecoderLayer2Att(nn.Module):
    """Denoiser layer: self-attn, TimeBlock, five parallel single-head
    cross-attentions over the condition streams, linear fuser, second
    TimeBlock, FFN (cross_attention.py:442-681).

    ``memory`` is a dict keyed by COND_STREAMS: each (B, Tk_i, D).
    ``mem_masks`` optional dict of (B, Tk_i) bool pad masks (True = pad).
    Returns (tgt, att) where att[stream] is (B, Tq, Tk_i).
    """

    d_model: int
    nhead: int
    dim_feedforward: int = 2048
    dropout: float = 0.1
    activation: str = "gelu"
    normalize_before: bool = True
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, tgt, memory: Dict[str, jnp.ndarray], time_embed,
                 mem_masks: Optional[Dict[str, jnp.ndarray]] = None,
                 query_pos=None, deterministic: bool = True):
        assert self.normalize_before, (
            "production config uses pre-norm (configs/modules/denoiser.yaml)")
        mem_masks = mem_masks or {}

        self_attn = MultiheadAttention(self.d_model, self.nhead, self.dropout,
                                       dtype=self.dtype, name="self_attn")
        drop = nn.Dropout(self.dropout)

        # 1. self attention over the 16 latent tokens
        tgt2 = nn.LayerNorm(epsilon=1e-5, name="norm1")(tgt)
        q = k = _with_pos(tgt2, query_pos)
        tgt2, _ = self_attn(q, k, tgt2, deterministic=deterministic)
        tgt = tgt + drop(tgt2, deterministic=deterministic)

        # 2. first timestep modulation block
        tgt = tgt + TimeBlock(self.d_model, self.dropout, dtype=self.dtype,
                              name="time_block1")(tgt, time_embed,
                                                  deterministic)

        # 3. five parallel single-head cross attentions, each with its own
        #    memory LayerNorm and pad mask
        tgt2 = nn.LayerNorm(epsilon=1e-5, name="norm2")(tgt)
        q_cond = _with_pos(tgt2, query_pos)
        branch_outs = []
        att = {}
        for stream in COND_STREAMS:
            mem = nn.LayerNorm(epsilon=1e-5, name=f"{stream}_norm")(
                memory[stream])
            out, w = MultiheadAttention(
                self.d_model, 1, self.dropout, dtype=self.dtype,
                name=f"multihead_attn_{stream}")(
                    q_cond, mem, mem,
                    key_padding_mask=mem_masks.get(stream),
                    deterministic=deterministic)
            branch_outs.append(out)
            att[stream] = w
        tgt2 = nn.Dense(self.d_model, kernel_init=xavier_uniform,
                        dtype=self.dtype, name="att_fuser")(
            jnp.concatenate(branch_outs, axis=-1))
        tgt = tgt + drop(tgt2, deterministic=deterministic)

        # 4. second timestep modulation block
        tgt = tgt + TimeBlock(self.d_model, self.dropout, dtype=self.dtype,
                              name="time_block2")(tgt, time_embed,
                                                  deterministic)

        # 5. FFN
        tgt2 = _FFN(self.d_model, self.dim_feedforward, self.dropout,
                    self.activation, dtype=self.dtype, name="ffn")(
            nn.LayerNorm(epsilon=1e-5, name="norm3")(tgt),
            deterministic=deterministic)
        tgt = tgt + drop(tgt2, deterministic=deterministic)
        return tgt, att


class DenoiserDecoder(nn.Module):
    """Stack of TransformerDecoderLayer2Att collecting per-layer attention
    maps (cross_attention.py:195-247).  att[stream]: (B, L, Tq, Tk)."""

    d_model: int
    num_layers: int
    nhead: int
    dim_feedforward: int = 2048
    dropout: float = 0.1
    activation: str = "gelu"
    normalize_before: bool = True
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, tgt, memory, time_embed, mem_masks=None,
                 query_pos=None, deterministic: bool = True):
        att_per_layer = {s: [] for s in COND_STREAMS}
        out = tgt
        for i in range(self.num_layers):
            out, att = TransformerDecoderLayer2Att(
                self.d_model, self.nhead, self.dim_feedforward, self.dropout,
                self.activation, self.normalize_before, dtype=self.dtype,
                name=f"layers_{i}")(
                    out, memory, time_embed, mem_masks, query_pos,
                    deterministic)
            for s in COND_STREAMS:
                att_per_layer[s].append(att[s])
        att_mats = {
            s: jnp.stack(v, axis=1) for s, v in att_per_layer.items()
        }
        out = nn.LayerNorm(epsilon=1e-5, name="norm")(out)
        return out, att_mats
