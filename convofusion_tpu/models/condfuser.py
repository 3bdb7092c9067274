"""Condition fuser: assembles the five-stream condition dict.

Reference: convofusion/models/architectures/condfuser.py
(TextAudioMotionFuser): passes speaker-text / listener-audio / listener-text
embeddings through, embeds the per-chunk active/passive bit (vocab 3:
0/1/2-uncond) and the listener identity (vocab 36 = 5 DnD + 1 uncond + 30
BEAT speakers, condfuser.py:20-21).
"""
from __future__ import annotations

from typing import Dict

import flax.linen as nn
import jax.numpy as jnp

NUM_APB_CLASSES = 3
NUM_LISTENER_IDS = 5 + 1 + 30


class TextAudioMotionFuser(nn.Module):
    out_dim: int = 512
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, spkemb, alsn, tlsn, active_passive_bit, lsn_id
                 ) -> Dict[str, jnp.ndarray]:
        """spkemb (B, Ts, D); alsn (B, Ta, D); tlsn (B, Tt, D);
        active_passive_bit (B, n_chunks) int; lsn_id (B,) int."""
        apb = nn.Embed(NUM_APB_CLASSES, self.out_dim, dtype=self.dtype,
                       name="active_passive_emb")(
            active_passive_bit.astype(jnp.int32))
        lsnemb = nn.Embed(NUM_LISTENER_IDS, self.out_dim, dtype=self.dtype,
                          name="lsn_id_emb")(
            lsn_id.astype(jnp.int32))[:, None, :]
        return {
            "spkemb": spkemb,
            "alsn": alsn,
            "tlsn": tlsn,
            "apb": apb,
            "lsnemb": lsnemb,
        }
