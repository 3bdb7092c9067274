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

    Besides the standard ``__call__``, ``guided`` runs the
    guidance-aware fast path: the seven classifier-free-guidance branches
    share identical latent queries at entry and each condition stream has
    only two distinct variants (real / uncond), so the memory-side
    LayerNorm + K/V projections — the dominant per-step FLOPs — run on B
    rows per variant instead of 7B (exact same math as tiling the batch,
    convofusion.py:499-541).
    """

    d_model: int
    nhead: int
    dim_feedforward: int = 2048
    dropout: float = 0.1
    activation: str = "gelu"
    normalize_before: bool = True
    dtype: jnp.dtype = jnp.float32

    def setup(self):
        assert self.normalize_before, (
            "production config uses pre-norm (configs/modules/denoiser.yaml)")
        d = self.d_model
        self.self_attn = MultiheadAttention(
            d, self.nhead, self.dropout, dtype=self.dtype, name="self_attn")
        self.time_block1 = TimeBlock(d, self.dropout, dtype=self.dtype,
                                     name="time_block1")
        self.time_block2 = TimeBlock(d, self.dropout, dtype=self.dtype,
                                     name="time_block2")
        self.norm1 = nn.LayerNorm(epsilon=1e-5, name="norm1")
        self.norm2 = nn.LayerNorm(epsilon=1e-5, name="norm2")
        self.norm3 = nn.LayerNorm(epsilon=1e-5, name="norm3")
        self.cross = {
            s: MultiheadAttention(d, 1, self.dropout, dtype=self.dtype,
                                  name=f"multihead_attn_{s}")
            for s in COND_STREAMS
        }
        self.stream_norms = {
            s: nn.LayerNorm(epsilon=1e-5, name=f"{s}_norm")
            for s in COND_STREAMS
        }
        self.att_fuser = nn.Dense(d, kernel_init=xavier_uniform,
                                  dtype=self.dtype, name="att_fuser")
        self.ffn = _FFN(d, self.dim_feedforward, self.dropout,
                        self.activation, dtype=self.dtype, name="ffn")
        self.drop = nn.Dropout(self.dropout)

    def __call__(self, tgt, memory: Dict[str, jnp.ndarray], time_embed,
                 mem_masks: Optional[Dict[str, jnp.ndarray]] = None,
                 query_pos=None, deterministic: bool = True):
        mem_masks = mem_masks or {}
        drop = lambda x: self.drop(x, deterministic=deterministic)  # noqa

        # 1. self attention over the latent tokens
        tgt2 = self.norm1(tgt)
        q = k = _with_pos(tgt2, query_pos)
        tgt2, _ = self.self_attn(q, k, tgt2, deterministic=deterministic)
        tgt = tgt + drop(tgt2)

        # 2. first timestep modulation block
        tgt = tgt + self.time_block1(tgt, time_embed, deterministic)

        # 3. five parallel single-head cross attentions, each with its own
        #    memory LayerNorm and pad mask
        tgt2 = self.norm2(tgt)
        q_cond = _with_pos(tgt2, query_pos)
        branch_outs = []
        att = {}
        for stream in COND_STREAMS:
            mem = self.stream_norms[stream](memory[stream])
            out, w = self.cross[stream](
                q_cond, mem, mem,
                key_padding_mask=mem_masks.get(stream),
                deterministic=deterministic)
            branch_outs.append(out)
            att[stream] = w
        tgt2 = self.att_fuser(jnp.concatenate(branch_outs, axis=-1))
        tgt = tgt + drop(tgt2)

        # 4. second timestep modulation block
        tgt = tgt + self.time_block2(tgt, time_embed, deterministic)

        # 5. FFN
        tgt2 = self.ffn(self.norm3(tgt), deterministic=deterministic)
        tgt = tgt + drop(tgt2)
        return tgt, att

    def cross_kv(self, mem_real, mem_unc):
        """Per-stream LayerNorm + K/V projections for both guidance
        variants — every part of the cross-attention that does not
        depend on the latent queries.  With a scalar scan timestep this
        is computable ONCE per (step, layer) and shared by
        :meth:`guided` and :meth:`forward_kv` (the WEG text-only
        gradient passes), instead of re-running per denoiser call.

        Returns {stream: ((k_r, v_r), (k_u, v_u))}."""
        kv = {}
        for stream in COND_STREAMS:
            mod = self.cross[stream]
            mem_r = self.stream_norms[stream](mem_real[stream])
            mem_u = self.stream_norms[stream](mem_unc[stream])
            kv[stream] = (mod.project_kv(mem_r), mod.project_kv(mem_u))
        return kv

    def forward_kv(self, tgt, kv, select, time_embed, mem_masks=None,
                   query_pos=None, deterministic: bool = True):
        """Standard forward (:meth:`__call__`) with the memory-side
        LN + K/V replaced by the precomputed projections of
        :meth:`cross_kv`.  ``select[stream]`` picks the variant ('real'
        or 'unc'); shared (1, Tk, D) uncond rows broadcast against the
        batch (grouped_attend)."""
        mem_masks = mem_masks or {}
        drop = lambda x: self.drop(x, deterministic=deterministic)  # noqa

        tgt2 = self.norm1(tgt)
        q = k = _with_pos(tgt2, query_pos)
        sa, _ = self.self_attn(q, k, tgt2, deterministic=deterministic)
        tgt = tgt + drop(sa)
        tgt = tgt + self.time_block1(tgt, time_embed, deterministic)

        tgt2 = self.norm2(tgt)
        q_cond = _with_pos(tgt2, query_pos)
        branch_outs = []
        att = {}
        for stream in COND_STREAMS:
            mod = self.cross[stream]
            (k_r, v_r), (k_u, v_u) = kv[stream]
            kk, vv = ((k_r, v_r) if select[stream] == "real"
                      else (k_u, v_u))
            o, w = mod.grouped_attend(
                mod.q_proj(q_cond)[None], kk, vv,
                mem_masks.get(stream))
            branch_outs.append(mod.out_proj(o[0]))
            att[stream] = w[0]
        tgt2 = self.att_fuser(jnp.concatenate(branch_outs, axis=-1))
        tgt = tgt + drop(tgt2)

        tgt = tgt + self.time_block2(tgt, time_embed, deterministic)
        tgt2 = self.ffn(self.norm3(tgt), deterministic=deterministic)
        tgt = tgt + drop(tgt2)
        return tgt, att

    def forward_mem(self, tgt, memory: Dict[str, jnp.ndarray], time_embed,
                    mem_masks: Optional[Dict[str, jnp.ndarray]] = None,
                    query_pos=None, deterministic: bool = True):
        """:meth:`__call__` semantics with per-stream memories of MIXED
        batch size: streams whose rows are shared across the batch (the
        single-row uncond conditions of encode_uncond) stay at batch 1
        through LayerNorm + K/V and broadcast inside grouped_attend —
        the guided path's shared-row trick applied to a plain forward
        (used by the WEG text-only gradient pass, where 4 of 5 streams
        are the uncond variant).  K/V is computed inside the layer, so
        no cross-layer liveness is added."""
        mem_masks = mem_masks or {}
        drop = lambda x: self.drop(x, deterministic=deterministic)  # noqa

        tgt2 = self.norm1(tgt)
        q = k = _with_pos(tgt2, query_pos)
        sa, _ = self.self_attn(q, k, tgt2, deterministic=deterministic)
        tgt = tgt + drop(sa)
        tgt = tgt + self.time_block1(tgt, time_embed, deterministic)

        tgt2 = self.norm2(tgt)
        q_cond = _with_pos(tgt2, query_pos)
        branch_outs = []
        att = {}
        for stream in COND_STREAMS:
            mod = self.cross[stream]
            mem = self.stream_norms[stream](memory[stream])
            kk, vv = mod.project_kv(mem)
            o, w = mod.grouped_attend(
                mod.q_proj(q_cond)[None], kk, vv,
                mem_masks.get(stream))
            branch_outs.append(mod.out_proj(o[0]))
            att[stream] = w[0]
        tgt2 = self.att_fuser(jnp.concatenate(branch_outs, axis=-1))
        tgt = tgt + drop(tgt2)

        tgt = tgt + self.time_block2(tgt, time_embed, deterministic)
        tgt2 = self.ffn(self.norm3(tgt), deterministic=deterministic)
        tgt = tgt + drop(tgt2)
        return tgt, att

    def guided(self, tgt7, mem_real, mem_unc, time_embed,
               masks_real=None, masks_unc=None,
               real_branches=None, deterministic: bool = True,
               kv=None):
        """tgt7 (G, B, Tq, D) guidance-branch-major latents; mem_real /
        mem_unc (B, Tk_s, D) per stream; time_embed (B, 1, D);
        ``real_branches[s]`` = sorted tuple of branch indices where the
        stream is real (all others use the uncond variant).
        ``kv`` (optional): precomputed :meth:`cross_kv` output — skips
        the memory-side LN + K/V work entirely.

        Returns (tgt7, att) with att[stream] = (B, Tq, Tk_s) of the LAST
        real branch (the full-condition branch the samplers keep,
        convofusion.py:517-519)."""
        masks_real = masks_real or {}
        masks_unc = masks_unc or {}
        g, b, tq, d = tgt7.shape
        drop = lambda x: self.drop(x, deterministic=deterministic)  # noqa

        # 1. self attention (flatten branches into the batch)
        tgt2 = self.norm1(tgt7)
        flat = tgt2.reshape(g * b, tq, d)
        sa, _ = self.self_attn(flat, flat, flat,
                               deterministic=deterministic)
        tgt7 = tgt7 + drop(sa.reshape(g, b, tq, d))

        # 2. first time block (broadcast over branches)
        tgt7 = tgt7 + self.time_block1(tgt7, time_embed[None],
                                       deterministic)

        # 3. grouped cross attentions: project K/V once per variant
        tgt2 = self.norm2(tgt7)
        branch_outs = []
        att = {}
        for stream in COND_STREAMS:
            mod = self.cross[stream]
            r_idx = list(real_branches[stream])
            u_idx = [i for i in range(g) if i not in real_branches[stream]]
            if kv is not None:
                (k_r, v_r), (k_u, v_u) = kv[stream]
            else:
                mem_r = self.stream_norms[stream](mem_real[stream])
                mem_u = self.stream_norms[stream](mem_unc[stream])
                k_r, v_r = mod.project_kv(mem_r)
                k_u, v_u = mod.project_kv(mem_u)
            q_all = mod.q_proj(tgt2)  # (G, B, Tq, D)
            o_r, w_r = mod.grouped_attend(
                q_all[jnp.asarray(r_idx)], k_r, v_r,
                masks_real.get(stream))
            o_u, _ = mod.grouped_attend(
                q_all[jnp.asarray(u_idx)], k_u, v_u,
                masks_unc.get(stream))
            out = jnp.zeros_like(q_all)
            out = out.at[jnp.asarray(r_idx)].set(o_r)
            out = out.at[jnp.asarray(u_idx)].set(o_u)
            branch_outs.append(mod.out_proj(out))
            att[stream] = w_r[-1]  # last real branch = full condition
        tgt2 = self.att_fuser(jnp.concatenate(branch_outs, axis=-1))
        tgt7 = tgt7 + drop(tgt2)

        # 4. second time block + 5. FFN
        tgt7 = tgt7 + self.time_block2(tgt7, time_embed[None],
                                       deterministic)
        tgt2 = self.ffn(self.norm3(tgt7), deterministic=deterministic)
        tgt7 = tgt7 + drop(tgt2)
        return tgt7, att


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
    remat: bool = False

    def setup(self):
        layer_cls = TransformerDecoderLayer2Att
        if self.remat:
            # rematerialize each layer's internals in the backward pass
            # (TPU.REMAT): only the (B, Tq, D) layer inputs are saved and
            # the layer body is recomputed during backprop — trades ~1/3
            # extra forward FLOPs for the residual-activation HBM round
            # trips the train-step roofline shows the step is bound by
            # (docs/BENCHMARKS.md "Roofline").  Numerics are identical;
            # only __call__ (the training forward) is transformed — the
            # sampling paths (guided/forward_kv) never differentiate.
            # static_argnums counts call args with self excluded as -1:
            # (5, 6) = query_pos (may be None) and the deterministic bool
            # (a traced bool would crash nn.Dropout).
            layer_cls = nn.remat(
                TransformerDecoderLayer2Att, static_argnums=(5, 6))
        self.layers = [
            layer_cls(
                self.d_model, self.nhead, self.dim_feedforward,
                self.dropout, self.activation, self.normalize_before,
                dtype=self.dtype, name=f"layers_{i}")
            for i in range(self.num_layers)
        ]
        self.final_norm = nn.LayerNorm(epsilon=1e-5, name="norm")

    def __call__(self, tgt, memory, time_embed, mem_masks=None,
                 query_pos=None, deterministic: bool = True):
        att_per_layer = {s: [] for s in COND_STREAMS}
        out = tgt
        for layer in self.layers:
            out, att = layer(out, memory, time_embed, mem_masks,
                             query_pos, deterministic)
            for s in COND_STREAMS:
                att_per_layer[s].append(att[s])
        att_mats = {
            s: jnp.stack(v, axis=1) for s, v in att_per_layer.items()
        }
        out = self.final_norm(out)
        return out, att_mats

    def precompute_kv(self, mem_real, mem_unc):
        """Per-layer :meth:`TransformerDecoderLayer2Att.cross_kv` — the
        latent-independent memory-side work of the whole stack."""
        return [layer.cross_kv(mem_real, mem_unc)
                for layer in self.layers]

    def forward_mem(self, tgt, memory, time_embed, mem_masks=None,
                    query_pos=None, deterministic: bool = True):
        """Mixed-batch-memory stack forward (layer.forward_mem);
        att[stream]: (B, L, Tq, Tk)."""
        att_per_layer = {s: [] for s in COND_STREAMS}
        out = tgt
        for layer in self.layers:
            out, att = layer.forward_mem(out, memory, time_embed,
                                         mem_masks, query_pos,
                                         deterministic)
            for s in COND_STREAMS:
                att_per_layer[s].append(att[s])
        att_mats = {
            s: jnp.stack(v, axis=1) for s, v in att_per_layer.items()
        }
        out = self.final_norm(out)
        return out, att_mats

    def forward_kv(self, tgt, kvs, select, time_embed, mem_masks=None,
                   query_pos=None, deterministic: bool = True):
        """Standard stack forward over precomputed per-layer K/V
        (:meth:`precompute_kv`); att[stream]: (B, L, Tq, Tk)."""
        att_per_layer = {s: [] for s in COND_STREAMS}
        out = tgt
        for layer, kv in zip(self.layers, kvs):
            out, att = layer.forward_kv(out, kv, select, time_embed,
                                        mem_masks, query_pos,
                                        deterministic)
            for s in COND_STREAMS:
                att_per_layer[s].append(att[s])
        att_mats = {
            s: jnp.stack(v, axis=1) for s, v in att_per_layer.items()
        }
        out = self.final_norm(out)
        return out, att_mats

    def guided(self, tgt7, mem_real, mem_unc, time_embed,
               masks_real=None, masks_unc=None, real_branches=None,
               deterministic: bool = True, kvs=None):
        """Guidance-aware stack; att[stream] is the full-cond branch's
        (B, L, Tq, Tk).  ``kvs``: optional precompute_kv output."""
        att_per_layer = {s: [] for s in COND_STREAMS}
        out = tgt7
        for i, layer in enumerate(self.layers):
            out, att = layer.guided(
                out, mem_real, mem_unc, time_embed, masks_real,
                masks_unc, real_branches, deterministic,
                kv=None if kvs is None else kvs[i])
            for s in COND_STREAMS:
                att_per_layer[s].append(att[s])
        att_mats = {
            s: jnp.stack(v, axis=1) for s, v in att_per_layer.items()
        }
        out = self.final_norm(out)
        return out, att_mats


class FusedTransformerDecoderLayer2Att(nn.Module):
    """TransformerDecoderLayer2Att with the five cross-attention streams
    batched into one padded attention (see ops/fused_streams.py).

    Mathematically identical to the unfused layer; params for the cross
    section live under 'cross_streams' (converters in fused_streams.py).
    """

    d_model: int
    nhead: int
    dim_feedforward: int = 2048
    dropout: float = 0.1
    activation: str = "gelu"
    normalize_before: bool = True
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, tgt, mem_stack, pad_stack, time_embed,
                 query_pos=None, deterministic: bool = True):
        from convofusion_tpu.ops.fused_streams import FusedCrossStreams

        assert self.normalize_before
        self_attn = MultiheadAttention(self.d_model, self.nhead,
                                       self.dropout, dtype=self.dtype,
                                       name="self_attn")
        drop = nn.Dropout(self.dropout)

        tgt2 = nn.LayerNorm(epsilon=1e-5, name="norm1")(tgt)
        q = k = _with_pos(tgt2, query_pos)
        tgt2, _ = self_attn(q, k, tgt2, deterministic=deterministic)
        tgt = tgt + drop(tgt2, deterministic=deterministic)

        tgt = tgt + TimeBlock(self.d_model, self.dropout, dtype=self.dtype,
                              name="time_block1")(tgt, time_embed,
                                                  deterministic)

        tgt2 = nn.LayerNorm(epsilon=1e-5, name="norm2")(tgt)
        q_cond = _with_pos(tgt2, query_pos)
        cat, weights = FusedCrossStreams(
            self.d_model, self.dropout, dtype=self.dtype,
            name="cross_streams")(q_cond, mem_stack, pad_stack,
                                  deterministic)
        tgt2 = nn.Dense(self.d_model, kernel_init=xavier_uniform,
                        dtype=self.dtype, name="att_fuser")(cat)
        tgt = tgt + drop(tgt2, deterministic=deterministic)

        tgt = tgt + TimeBlock(self.d_model, self.dropout, dtype=self.dtype,
                              name="time_block2")(tgt, time_embed,
                                                  deterministic)

        tgt2 = _FFN(self.d_model, self.dim_feedforward, self.dropout,
                    self.activation, dtype=self.dtype, name="ffn")(
            nn.LayerNorm(epsilon=1e-5, name="norm3")(tgt),
            deterministic=deterministic)
        tgt = tgt + drop(tgt2, deterministic=deterministic)
        return tgt, weights


class FusedDenoiserDecoder(nn.Module):
    """DenoiserDecoder over fused layers; returns the same per-stream att
    dict (trimmed to each stream's true length)."""

    d_model: int
    num_layers: int
    nhead: int
    dim_feedforward: int = 2048
    dropout: float = 0.1
    activation: str = "gelu"
    normalize_before: bool = True
    dtype: jnp.dtype = jnp.float32
    remat: bool = False

    @nn.compact
    def __call__(self, tgt, memory, time_embed, mem_masks=None,
                 query_pos=None, deterministic: bool = True):
        from convofusion_tpu.ops.fused_streams import pad_stream_stack

        # same remat contract as DenoiserDecoder: (5, 6) = query_pos +
        # the deterministic bool, counted with self excluded as -1
        layer_cls = (nn.remat(FusedTransformerDecoderLayer2Att,
                              static_argnums=(5, 6))
                     if self.remat else FusedTransformerDecoderLayer2Att)
        mem_stack, pad_stack, lengths = pad_stream_stack(memory, mem_masks)
        out = tgt
        per_layer = []
        for i in range(self.num_layers):
            out, w = layer_cls(
                self.d_model, self.nhead, self.dim_feedforward,
                self.dropout, self.activation, self.normalize_before,
                dtype=self.dtype, name=f"layers_{i}")(
                    out, mem_stack, pad_stack, time_embed, query_pos,
                    deterministic)
            per_layer.append(w)  # (S, B, Tq, Tmax)
        stacked = jnp.stack(per_layer, axis=2)  # (S, B, L, Tq, Tmax)
        att_mats = {
            s: stacked[i, :, :, :, : lengths[s]]
            for i, s in enumerate(COND_STREAMS)
        }
        out = nn.LayerNorm(epsilon=1e-5, name="norm")(out)
        return out, att_mats


# guidance branch -> condition streams kept real (convofusion.py:528-541):
# [all_drop, text, audio, spk, apb, lsnid, full]
GUIDANCE_BRANCHES = (
    (),
    ("tlsn",),
    ("alsn",),
    ("spkemb",),
    ("apb",),
    ("lsnemb",),
    ("spkemb", "alsn", "tlsn", "apb", "lsnemb"),
)
NUM_BRANCHES = len(GUIDANCE_BRANCHES)
# per stream: sorted branch indices using the REAL variant (the rest use
# uncond); the full-condition branch (6) is always last
REAL_BRANCHES = {
    s: tuple(b for b, streams in enumerate(GUIDANCE_BRANCHES)
             if s in streams)
    for s in COND_STREAMS
}
