"""Numeric golden tests for Word-Excitation Guidance vs the torch reference.

Oracle: convofusion/models/tools/word_excitation_guidance.py (aggregate,
max-attention gather, focus loss).  Smoothing is the reference's sliced
reflect-pad Gaussian reproduced exactly (weg.sliced_reflect_smooth), so
interior AND boundary focus columns must match to fp32.
"""
import numpy as np
import pytest

import jax.numpy as jnp

from convofusion_tpu.models import weg

torch = pytest.importorskip("torch")


@pytest.fixture(scope="module")
def ref_weg(reference_path):
    from convofusion.models.tools import word_excitation_guidance as ref
    return ref


def _torch_chain(ref, att, batch_idxs, smooth, eot):
    """Reference pipeline on a (B, L, Tq, Tk) attention stack."""
    a = ref.aggregate_attentions(torch.from_numpy(att))
    maxes = ref.get_max_attention_at_indices(
        a, batch_idxs, smooth_attentions=smooth,
        normalize_eot=eot is not None,
        eot_indices=[eot] if eot is not None else [])
    return maxes


def _ours_chain(att, focus_idx, focus_valid, eot_idx, smooth):
    a = weg.aggregate_attentions(jnp.asarray(att))
    max_att, valid = weg.max_attention_at_indices(
        a, jnp.asarray(focus_idx), jnp.asarray(focus_valid, jnp.float32),
        jnp.asarray(eot_idx), smooth=smooth)
    return np.asarray(max_att), np.asarray(valid)


def _rand_att(rng, b=2, l=3, tq=16, tk=12):
    return rng.standard_normal((b, l, tq, tk)).astype(np.float32)


def test_max_attention_no_smoothing_exact(ref_weg):
    """smooth=False: ours == torch to fp32 tolerance (weg.py vs
    word_excitation_guidance.py:16-51, last_idx=-1 convention)."""
    rng = np.random.default_rng(0)
    att = _rand_att(rng)
    b, _, _, tk = att.shape
    batch_idxs = [[2, 4, 7], [3, 5]]           # token indices incl. bos shift
    maxes_t = _torch_chain(ref_weg, att, batch_idxs, smooth=False, eot=None)

    # reference slices [:, :, 1:-1] => our eot_idx = Tk - 1
    k = 3
    focus_idx = np.zeros((b, k), np.int32)
    focus_valid = np.zeros((b, k), bool)
    for i, idxs in enumerate(batch_idxs):
        focus_idx[i, :len(idxs)] = idxs
        focus_valid[i, :len(idxs)] = True
    ours, _ = _ours_chain(att, focus_idx, focus_valid,
                          np.full((b,), tk - 1), smooth=False)

    for i, idxs in enumerate(batch_idxs):
        for j in range(len(idxs)):
            np.testing.assert_allclose(
                ours[i, j], float(maxes_t[i][j]), rtol=2e-5, atol=2e-6)


def test_max_attention_smoothing_interior_exact(ref_weg):
    """smooth=True: interior focus columns (2 <= i <= eot-2) match torch
    exactly; the 3x3 kernel only sees identical inputs there."""
    rng = np.random.default_rng(1)
    att = _rand_att(rng, tk=14)
    b, _, _, tk = att.shape
    interior = [[3, 6, 9], [4, 8, 11]]         # all in [2, tk-3]
    maxes_t = _torch_chain(ref_weg, att, interior, smooth=True, eot=None)

    focus_idx = np.asarray(interior, np.int32)
    focus_valid = np.ones_like(focus_idx, bool)
    ours, _ = _ours_chain(att, focus_idx, focus_valid,
                          np.full((b,), tk - 1), smooth=True)
    for i in range(b):
        for j in range(3):
            np.testing.assert_allclose(
                ours[i, j], float(maxes_t[i][j]), rtol=2e-5, atol=2e-6)


def test_max_attention_smoothing_boundary_exact(ref_weg):
    """Boundary columns (i=1, i=eot-1): the sliced reflect-pad smoothing
    (weg.sliced_reflect_smooth) matches torch to fp32 — the r2 boundary
    deviation is gone."""
    rng = np.random.default_rng(2)
    att = _rand_att(rng, tk=14)
    b, _, _, tk = att.shape
    boundary = [[1, tk - 2], [1, tk - 2]]
    maxes_t = _torch_chain(ref_weg, att, boundary, smooth=True, eot=None)

    focus_idx = np.asarray(boundary, np.int32)
    focus_valid = np.ones_like(focus_idx, bool)
    ours, _ = _ours_chain(att, focus_idx, focus_valid,
                          np.full((b,), tk - 1), smooth=True)
    for i in range(b):
        for j in range(2):
            np.testing.assert_allclose(
                ours[i, j], float(maxes_t[i][j]), rtol=2e-5, atol=2e-6)


def test_max_attention_smoothing_eot_boundary_exact(ref_weg):
    """Same exactness on the normalize_eot path (dynamic slice end):
    focus at both edges of a [1, eot) region with eot < Tk - 1."""
    rng = np.random.default_rng(5)
    att = _rand_att(rng, b=1, tk=12)
    eot = 8
    batch_idxs = [[1, 3, eot - 1]]
    maxes_t = _torch_chain(ref_weg, att, batch_idxs, smooth=True, eot=eot)
    ours, _ = _ours_chain(att, np.asarray(batch_idxs, np.int32),
                          np.ones((1, 3), bool), np.asarray([eot]),
                          smooth=True)
    for j in range(3):
        np.testing.assert_allclose(
            ours[0, j], float(maxes_t[0][j]), rtol=2e-5, atol=2e-6)


def test_max_attention_eot_normalized(ref_weg):
    """normalize_eot path (test-time, batch 1): slice [1:eot)."""
    rng = np.random.default_rng(3)
    att = _rand_att(rng, b=1, tk=12)
    eot = 8
    batch_idxs = [[2, 5]]
    maxes_t = _torch_chain(ref_weg, att, batch_idxs, smooth=False, eot=eot)
    ours, _ = _ours_chain(att, np.asarray(batch_idxs, np.int32),
                          np.ones((1, 2), bool), np.asarray([eot]),
                          smooth=False)
    for j in range(2):
        np.testing.assert_allclose(
            ours[0, j], float(maxes_t[0][j]), rtol=2e-5, atol=2e-6)


def test_focus_loss_golden(ref_weg):
    """attention_focus_loss vs compute_attention_focus_loss on the same
    max values (word_excitation_guidance.py:64-82)."""
    rng = np.random.default_rng(4)
    vals = rng.uniform(0, 1.4, size=(3, 4)).astype(np.float32)
    valid = np.array([[1, 1, 1, 0], [1, 1, 0, 0], [1, 1, 1, 1]], bool)

    # torch oracle wants ragged lists of 0-d tensors
    ragged = [[torch.tensor(vals[i, j]) for j in range(4) if valid[i, j]]
              for i in range(3)]
    # reference uses .cuda() for empty samples — keep all samples non-empty
    loss_t, _ = ref_weg.compute_attention_focus_loss(ragged)

    ours = weg.attention_focus_loss(
        jnp.asarray(vals), jnp.asarray(valid, jnp.float32))
    np.testing.assert_allclose(float(ours), float(loss_t),
                               rtol=1e-6, atol=1e-7)


def test_focus_loss_empty_sample_contributes_zero():
    vals = np.ones((2, 3), np.float32) * 0.25
    valid = np.array([[1, 1, 0], [0, 0, 0]], np.float32)
    ours = float(weg.attention_focus_loss(jnp.asarray(vals),
                                          jnp.asarray(valid)))
    assert ours == pytest.approx(0.75 / 2)
