"""Quaternion math (JAX, wxyz convention).

TPU-native re-implementation of the quaternion toolkit the reference data
pipeline relies on (reference: convofusion/data/beat_dnd/utils/quaternion.py:
qrot:54, qmul, qinv, qnormalize, qbetween:387, qfix:149).  All functions are
pure jnp and vmap/jit friendly; ``*_np`` wrappers operate on host numpy for
the offline preprocessing path.
"""
from __future__ import annotations

import jax.numpy as jnp
import numpy as np


def qnormalize(q):
    return q / jnp.linalg.norm(q, axis=-1, keepdims=True)


def qinv(q):
    """Inverse of unit quaternion(s): conjugate."""
    return q * jnp.asarray([1.0, -1.0, -1.0, -1.0], dtype=q.dtype)


def qmul(q, r):
    """Hamilton product of quaternions q*r, shapes (*, 4)."""
    w1, x1, y1, z1 = jnp.moveaxis(q, -1, 0)
    w2, x2, y2, z2 = jnp.moveaxis(r, -1, 0)
    return jnp.stack(
        [
            w1 * w2 - x1 * x2 - y1 * y2 - z1 * z2,
            w1 * x2 + x1 * w2 + y1 * z2 - z1 * y2,
            w1 * y2 - x1 * z2 + y1 * w2 + z1 * x2,
            w1 * z2 + x1 * y2 - y1 * x2 + z1 * w2,
        ],
        axis=-1,
    )


def qrot(q, v):
    """Rotate vector(s) v by quaternion(s) q; shapes broadcast over (*, 4)/(*, 3)."""
    qvec = q[..., 1:]
    uv = jnp.cross(qvec, v)
    uuv = jnp.cross(qvec, uv)
    return v + 2.0 * (q[..., :1] * uv + uuv)


def qbetween(v0, v1):
    """Quaternion rotating v0 onto v1 (shortest arc)."""
    v = jnp.cross(v0, v1)
    w = jnp.sqrt(
        (v0**2).sum(axis=-1, keepdims=True) * (v1**2).sum(axis=-1, keepdims=True)
    ) + (v0 * v1).sum(axis=-1, keepdims=True)
    return qnormalize(jnp.concatenate([w, v], axis=-1))


def qfix_np(q: np.ndarray) -> np.ndarray:
    """Enforce sign continuity along the time axis of (L, J, 4) quaternions."""
    result = q.copy()
    dots = np.sum(q[1:] * q[:-1], axis=-1)
    flip = (np.cumsum(dots < 0, axis=0) % 2).astype(bool)
    result[1:][flip] *= -1
    return result


def qrot_np(q, v):
    """Pure-numpy qrot — host-side preprocessing must not touch a device
    backend (the data/eval paths call this per sample)."""
    q = np.asarray(q, np.float32)
    v = np.asarray(v, np.float32)
    qvec = q[..., 1:]
    uv = np.cross(qvec, v)
    uuv = np.cross(qvec, uv)
    return v + 2.0 * (q[..., :1] * uv + uuv)


def qbetween_np(v0, v1):
    v0 = np.asarray(v0, np.float32)
    v1 = np.asarray(v1, np.float32)
    v = np.cross(v0, v1)
    w = np.sqrt(
        (v0**2).sum(axis=-1, keepdims=True)
        * (v1**2).sum(axis=-1, keepdims=True)
    ) + (v0 * v1).sum(axis=-1, keepdims=True)
    q = np.concatenate([w, v], axis=-1)
    return q / np.linalg.norm(q, axis=-1, keepdims=True)
