"""Chunked body/hands motion VAE.

Reference: convofusion/models/architectures/vae.py (ConvoFusionVae).
Production configuration (configs/modules/motion_vae.yaml): arch
``encoder_decoder``, 5 layers, 2 heads, pre-norm, sine PEs, latent [1, 128].

TPU-first design notes:
  * batch-first (B, T, D) throughout; the chunking reshape
    (B, 128, 189) -> (B*8, 16, 189) turns the encoder into one large batched
    MXU workload — no python loop over chunks (vae.py:176-187 does the same
    reshape in torch).
  * all shapes static: 128 frames, 8 chunks of 16, so padding masks are
    constant and omitted (MAX_LEN == MIN_LEN == 128 in the reference configs).
  * encode returns (latent, (mu, logvar), chunk_normalized_feats); decode maps
    (2, B, 8, D) chunk latents + 128 zero queries through skip decoders.
"""
from __future__ import annotations

from typing import Optional, Tuple

import flax.linen as nn
import jax
import jax.numpy as jnp

from convofusion_tpu.ops.positional import build_position_encoding
from convofusion_tpu.ops.transformer import (
    SkipTransformerDecoder,
    SkipTransformerEncoder,
)

BODY_NFEATS = 23 * 3
HANDS_NFEATS = 40 * 3


class ConvoFusionVae(nn.Module):
    nfeats: int = BODY_NFEATS + HANDS_NFEATS
    latent_size: int = 1
    latent_dim: int = 128
    ff_size: int = 1024
    num_layers: int = 5
    num_heads: int = 2
    dropout: float = 0.1
    arch: str = "encoder_decoder"
    mlp_dist: bool = False
    normalize_before: bool = True
    activation: str = "gelu"
    position_embedding: str = "sine"
    chunk_len: int = 16
    dtype: jnp.dtype = jnp.float32

    def setup(self):
        d = self.latent_dim
        kw = dict(
            d_model=d,
            num_layers=self.num_layers,
            nhead=self.num_heads,
            dim_feedforward=self.ff_size,
            dropout=self.dropout,
            activation=self.activation,
            normalize_before=self.normalize_before,
            dtype=self.dtype,
        )
        self.query_pos_encoder = build_position_encoding(
            d, self.position_embedding, name="query_pos_encoder")
        self.query_pos_decoder = build_position_encoding(
            d, self.position_embedding, name="query_pos_decoder")
        self.mem_pos_decoder = build_position_encoding(
            d, self.position_embedding, name="mem_pos_decoder")

        self.body_encoder = SkipTransformerEncoder(**kw, name="body_encoder")
        self.hands_encoder = SkipTransformerEncoder(**kw, name="hands_encoder")
        if self.arch == "encoder_decoder":
            # production arch (configs/modules/motion_vae.yaml)
            self.body_decoder = SkipTransformerDecoder(
                **kw, name="body_decoder")
            self.hands_decoder = SkipTransformerDecoder(
                **kw, name="hands_decoder")
        elif self.arch == "all_encoder":
            # legacy ablation: decode via encoder-only stacks over
            # [latent tokens; queries] (vae.py:94-100, 296-317)
            self.body_decoder = SkipTransformerEncoder(
                **kw, name="body_decoder")
            self.hands_decoder = SkipTransformerEncoder(
                **kw, name="hands_decoder")
        else:
            raise ValueError("Not support architecture!")

        # distribution heads: MLP_DIST=False in production uses 2 learnable
        # tokens (mu, logvar); MLP_DIST=True uses latent_size tokens + a
        # Linear d -> 2d head (vae.py:134-145)
        init = nn.initializers.normal(stddev=1.0)
        n_tok = self.latent_size if self.mlp_dist else self.latent_size * 2
        self.body_global_motion_token = self.param(
            "body_global_motion_token", init, (n_tok, d))
        self.hands_global_motion_token = self.param(
            "hands_global_motion_token", init, (n_tok, d))
        if self.mlp_dist:
            self.body_dist_layer = nn.Dense(
                2 * d, dtype=self.dtype, name="body_dist_layer")
            self.hands_dist_layer = nn.Dense(
                2 * d, dtype=self.dtype, name="hands_dist_layer")

        self.body_skel_embedding = nn.Dense(
            d, dtype=self.dtype, name="body_skel_embedding")
        self.hands_skel_embedding = nn.Dense(
            d, dtype=self.dtype, name="hands_skel_embedding")
        self.body_final_layer = nn.Dense(
            BODY_NFEATS, dtype=self.dtype, name="body_final_layer")
        self.hands_final_layer = nn.Dense(
            HANDS_NFEATS, dtype=self.dtype, name="hands_final_layer")

    # ------------------------------------------------------------------ encode
    def encode(
        self,
        features: jnp.ndarray,
        sample_key: Optional[jax.Array] = None,
        deterministic: bool = True,
    ) -> Tuple[jnp.ndarray, Tuple[jnp.ndarray, jnp.ndarray], jnp.ndarray]:
        """features (B, nframes, nfeats) -> latent (2, B, n_chunks, D).

        If ``sample_key`` is None the posterior mean is returned (no
        reparameterized sample).
        """
        b, nframes, _ = features.shape
        n_chunks = nframes // self.chunk_len
        x = features.reshape(b * n_chunks, self.chunk_len, -1)

        # per-chunk root xz-normalization (vae.py:182-184): subtract frame-0
        # root x/z from the root position channel of every frame in the chunk
        root_xz = x[:, :1, :3] * jnp.asarray([1.0, 0.0, 1.0], x.dtype)
        x = jnp.concatenate([x[:, :, :3] - root_xz, x[:, :, 3:]], axis=-1)
        motion_feats = x

        xb = self.body_skel_embedding(x[:, :, :BODY_NFEATS])
        xh = self.hands_skel_embedding(x[:, :, BODY_NFEATS:])

        bs = b * n_chunks
        dist_b = jnp.tile(self.body_global_motion_token[None], (bs, 1, 1))
        dist_h = jnp.tile(self.hands_global_motion_token[None], (bs, 1, 1))

        xseq_b = self.query_pos_encoder(
            jnp.concatenate([dist_b, xb], axis=1))
        xseq_h = self.query_pos_encoder(
            jnp.concatenate([dist_h, xh], axis=1))

        n_tok = (self.latent_size if self.mlp_dist
                 else 2 * self.latent_size)
        tok_b = self.body_encoder(
            xseq_b, deterministic=deterministic)[:, :n_tok]
        tok_h = self.hands_encoder(
            xseq_h, deterministic=deterministic)[:, :n_tok]

        if self.mlp_dist:
            # Linear d -> 2d head splits mu/logvar (vae.py:241-248)
            db = self.body_dist_layer(tok_b)
            dh = self.hands_dist_layer(tok_h)
            b_mu, b_logvar = (db[..., : self.latent_dim],
                              db[..., self.latent_dim:])
            h_mu, h_logvar = (dh[..., : self.latent_dim],
                              dh[..., self.latent_dim:])
        else:
            b_mu, b_logvar = (
                tok_b[:, : self.latent_size], tok_b[:, self.latent_size:])
            h_mu, h_logvar = (
                tok_h[:, : self.latent_size], tok_h[:, self.latent_size:])

        # (2, B, n_chunks, D): index 0 = body, 1 = hands
        mu = jnp.stack([b_mu, h_mu], axis=0).reshape(2, b, n_chunks, -1)
        logvar = jnp.stack([b_logvar, h_logvar], axis=0).reshape(
            2, b, n_chunks, -1)

        if sample_key is None:
            latent = mu
        else:
            # NB reference quirk: std = exp(logvar)**0.5 would be the usual
            # rule, and vae.py:260 indeed uses logvar.exp().pow(0.5)
            std = jnp.exp(0.5 * logvar)
            latent = mu + std * jax.random.normal(
                sample_key, mu.shape, mu.dtype)

        return latent, (mu, logvar), motion_feats.reshape(b, nframes, -1)

    # ------------------------------------------------------------------ decode
    def decode(self, z: jnp.ndarray, nframes: int = 128,
               deterministic: bool = True) -> jnp.ndarray:
        """z (2, B, n_chunks, D) -> motion (B, nframes, nfeats).

        The full clip's zero queries cross-attend to the 8 chunk latents
        (vae.py:268-338) — chunks are *jointly* decoded.
        """
        _, b, n_chunks, d = z.shape
        if self.arch == "encoder_decoder":
            queries = self.query_pos_decoder(
                jnp.zeros((b, nframes, d), z.dtype))
            z_b = self.mem_pos_decoder(z[0])
            z_h = self.mem_pos_decoder(z[1])
            out_b = self.body_decoder(
                queries, z_b, deterministic=deterministic)
            out_h = self.hands_decoder(
                queries, z_h, deterministic=deterministic)
        else:
            # all_encoder ablation: encoder over [latents; zero queries],
            # keep the query suffix (vae.py:296-317)
            queries = jnp.zeros((b, nframes, d), z.dtype)
            xseq_b = self.query_pos_decoder(
                jnp.concatenate([z[0], queries], axis=1))
            xseq_h = self.query_pos_decoder(
                jnp.concatenate([z[1], queries], axis=1))
            out_b = self.body_decoder(
                xseq_b, deterministic=deterministic)[:, n_chunks:]
            out_h = self.hands_decoder(
                xseq_h, deterministic=deterministic)[:, n_chunks:]

        out = jnp.concatenate(
            [self.body_final_layer(out_b), self.hands_final_layer(out_h)],
            axis=-1,
        )
        return out

    def __call__(self, features, sample_key=None, deterministic=True):
        latent, dist, _ = self.encode(features, sample_key, deterministic)
        recon = self.decode(latent, features.shape[1], deterministic)
        return recon, latent, dist
