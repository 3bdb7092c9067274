"""Fused five-stream cross-attention.

The reference's denoiser layer runs 5 separate single-head cross
attentions per layer (cross_attention.py:593-626) — 30 tiny matmuls per
layer that leave the MXU idle.  This module computes the SAME math as one
batched attention over a (streams, B, Tmax, D) padded memory stack:
per-stream memory LayerNorm, q/k/v/out projections and separate softmaxes
(via the pad mask), with the stream axis batched into the matmuls.

Parameters are stacked along a leading stream axis; ``fuse_layer_params``
converts the unfused per-stream module tree (the torch-checkpoint layout)
into this layout, so released weights and parity tests share one source
of truth.
"""
from __future__ import annotations

from typing import Dict, Tuple

import flax.linen as nn
import jax
import jax.numpy as jnp
import numpy as np

from convofusion_tpu.ops.transformer import COND_STREAMS

_BIG_NEG = -1e9

stacked_xavier = nn.initializers.variance_scaling(
    1.0, "fan_avg", "uniform", in_axis=-2, out_axis=-1, batch_axis=(0,))


def pad_stream_stack(memory: Dict[str, jnp.ndarray],
                     masks: Dict[str, jnp.ndarray] | None
                     ) -> Tuple[jnp.ndarray, jnp.ndarray, Dict[str, int]]:
    """Pad each stream's memory to the max length and stack.

    Returns (mem (S,B,Tmax,D), pad (S,B,Tmax) True=pad, lengths per
    stream).  Done ONCE per denoiser call and shared by all layers.
    """
    masks = masks or {}
    lengths = {s: memory[s].shape[1] for s in COND_STREAMS}
    t_max = max(lengths.values())
    b = memory[COND_STREAMS[0]].shape[0]
    mems, pads = [], []
    for s in COND_STREAMS:
        m = memory[s]
        t = m.shape[1]
        pad_t = t_max - t
        mems.append(jnp.pad(m, ((0, 0), (0, pad_t), (0, 0))))
        base = masks.get(s)
        if base is None:
            base = jnp.zeros((b, t), bool)
        pads.append(jnp.pad(base, ((0, 0), (0, pad_t)),
                            constant_values=True))
    return jnp.stack(mems), jnp.stack(pads), lengths


class FusedCrossStreams(nn.Module):
    """Batched per-stream LN + single-head cross-attention + out proj."""

    d_model: int
    dropout: float = 0.1
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, q_in, mem_stack, pad_stack,
                 deterministic: bool = True):
        """q_in (B,Tq,D); mem_stack (S,B,Tk,D); pad_stack (S,B,Tk).

        Returns (concat (B,Tq,S*D) in stream order, weights (S,B,Tq,Tk)).
        """
        s = len(COND_STREAMS)
        d = self.d_model

        ln_scale = self.param("ln_scale", nn.initializers.ones, (s, d))
        ln_bias = self.param("ln_bias", nn.initializers.zeros, (s, d))

        def proj_params(name):
            kern = self.param(f"{name}_kernel", stacked_xavier, (s, d, d))
            bias = self.param(f"{name}_bias", nn.initializers.zeros,
                              (s, d))
            return kern, bias

        qk, qb = proj_params("q")
        kk, kb = proj_params("k")
        vk, vb = proj_params("v")
        ok, ob = proj_params("o")

        # per-stream memory LayerNorm (eps matches torch 1e-5)
        mu = jnp.mean(mem_stack, axis=-1, keepdims=True)
        var = jnp.var(mem_stack, axis=-1, keepdims=True)
        mem_n = (mem_stack - mu) * jax.lax.rsqrt(var + 1e-5)
        mem_n = mem_n * ln_scale[:, None, None, :] + \
            ln_bias[:, None, None, :]

        q = jnp.einsum("btd,sde->sbte", q_in, qk) + qb[:, None, None, :]
        k = jnp.einsum("sbtd,sde->sbte", mem_n, kk) + kb[:, None, None, :]
        v = jnp.einsum("sbtd,sde->sbte", mem_n, vk) + vb[:, None, None, :]

        logits = jnp.einsum("sbqd,sbkd->sbqk", q, k) / jnp.sqrt(
            jnp.asarray(d, q.dtype))
        logits = jnp.where(pad_stack[:, :, None, :], _BIG_NEG, logits)
        weights = nn.softmax(logits.astype(jnp.float32), axis=-1).astype(
            self.dtype)
        if self.dropout > 0.0:
            weights_d = nn.Dropout(self.dropout)(
                weights, deterministic=deterministic)
        else:
            weights_d = weights
        out = jnp.einsum("sbqk,sbkd->sbqd", weights_d, v)
        out = jnp.einsum("sbqd,sde->sbqe", out, ok) + ob[:, None, None, :]
        # concat in stream order -> (B, Tq, S*D)
        cat = jnp.transpose(out, (1, 2, 0, 3)).reshape(
            out.shape[1], out.shape[2], -1)
        return cat, weights



def fuse_layer_params(layer_params: Dict) -> Dict:
    """Unfused TransformerDecoderLayer2Att cross-section params -> fused.

    Input: the layer tree with ``multihead_attn_<s>`` and ``<s>_norm``
    entries; output: the FusedCrossStreams tree.
    """

    def stack(fn):
        return np.stack([np.asarray(fn(s)) for s in COND_STREAMS])

    p = layer_params
    return {
        "ln_scale": stack(lambda s: p[f"{s}_norm"]["scale"]),
        "ln_bias": stack(lambda s: p[f"{s}_norm"]["bias"]),
        "q_kernel": stack(
            lambda s: p[f"multihead_attn_{s}"]["q_proj"]["kernel"]),
        "q_bias": stack(
            lambda s: p[f"multihead_attn_{s}"]["q_proj"]["bias"]),
        "k_kernel": stack(
            lambda s: p[f"multihead_attn_{s}"]["k_proj"]["kernel"]),
        "k_bias": stack(
            lambda s: p[f"multihead_attn_{s}"]["k_proj"]["bias"]),
        "v_kernel": stack(
            lambda s: p[f"multihead_attn_{s}"]["v_proj"]["kernel"]),
        "v_bias": stack(
            lambda s: p[f"multihead_attn_{s}"]["v_proj"]["bias"]),
        "o_kernel": stack(
            lambda s: p[f"multihead_attn_{s}"]["out_proj"]["kernel"]),
        "o_bias": stack(
            lambda s: p[f"multihead_attn_{s}"]["out_proj"]["bias"]),
    }


def fuse_decoder_layer_params(layer_params: Dict) -> Dict:
    """Full unfused layer tree -> fused layer tree (cross section replaced
    by 'cross_streams', everything else passed through)."""
    out = {
        k: v for k, v in layer_params.items()
        if not any(k.startswith(f"multihead_attn_{s}")
                   or k == f"{s}_norm" for s in COND_STREAMS)
    }
    out["cross_streams"] = fuse_layer_params(layer_params)
    return out


def fuse_denoiser_decoder_params(decoder_params: Dict) -> Dict:
    out = {}
    for k, v in decoder_params.items():
        if k.startswith("layers_"):
            out[k] = fuse_decoder_layer_params(v)
        else:
            out[k] = v
    return out


def fuse_denoiser_params(denoiser_params: Dict) -> Dict:
    out = dict(denoiser_params)
    out["decoder"] = fuse_denoiser_decoder_params(
        denoiser_params["decoder"])
    return out
