"""Mask helpers (reference: convofusion/utils/temos_utils.py:11-29).

All functions are jit-friendly: lengths may be a traced int array and
``max_len`` must be static.
"""
from __future__ import annotations

import jax.numpy as jnp
import numpy as np


def lengths_to_mask(lengths, max_len: int) -> jnp.ndarray:
    """(bs,) int lengths -> (bs, max_len) bool mask, True = valid frame."""
    lengths = jnp.asarray(lengths)
    return jnp.arange(max_len)[None, :] < lengths[:, None]


def remove_padding(tensors, lengths):
    """Host-side: trim a batch of arrays to their true lengths (returns list)."""
    return [np.asarray(t)[: int(l)] for t, l in zip(tensors, lengths)]
