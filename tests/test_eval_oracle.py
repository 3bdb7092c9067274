"""Eval-metric oracle: our quant metrics vs the REFERENCE quant_eval
functions executed verbatim on the same random inputs.

Complements test_eval_metrics.py (FID-net golden + property tests) by
pinning the metric FORMULAS — SRGR semantic-weighted PCK, L1div,
diversity, pairwise avg distance, jitter, the eval-side motion
canonicalization, the wrist-velocity beat extraction and the GAHR
alignment math — to quant_eval/metric_eval.py and jitter_metric.py.
Only pure-numpy reference paths are exercised (the librosa onset chain
has its own tests in test_eval_metrics.py; the shim below only needs to
satisfy metric_eval's module-level imports).
"""
import os
import sys

import numpy as np
import pytest

pytestmark = pytest.mark.slow  # compile/oracle heavy (see pyproject addopts)

torch = pytest.importorskip("torch")


def _import_ref_metric_eval(reference_path):
    qdir = os.path.join(reference_path, "quant_eval")
    if qdir not in sys.path:
        sys.path.insert(0, qdir)
    from ref_shims import install_librosa, install_numpy_aliases

    install_librosa()
    # quant_eval/quaternion.py:13 uses the np.float alias removed in
    # numpy>=1.24
    install_numpy_aliases()
    import metric_eval
    import jitter_metric
    return metric_eval, jitter_metric


@pytest.fixture(scope="module")
def refme(reference_path):
    return _import_ref_metric_eval(reference_path)


def test_srgr_matches_reference(refme):
    from convofusion_tpu.eval.metrics import SRGR

    me, _ = refme
    rng = np.random.default_rng(7)
    ours, ref = SRGR(0.3, 63), me.SRGR(0.3, 63)
    for seed in range(3):
        r = rng.normal(size=(128, 189)).astype(np.float32)
        t = r + rng.normal(scale=0.2, size=r.shape).astype(np.float32)
        sem = rng.uniform(0, 1, size=(128,)).astype(np.float32)
        np.testing.assert_allclose(
            ours.run(r, t, sem), ref.run(r, t, sem), rtol=1e-6)
    np.testing.assert_allclose(ours.avg(), ref.avg(), rtol=1e-6)


def test_l1div_matches_reference(refme):
    from convofusion_tpu.eval.metrics import L1div

    me, _ = refme
    rng = np.random.default_rng(11)
    ours, ref = L1div(), me.L1div()
    for _ in range(3):
        x = rng.normal(size=(32, 189)).astype(np.float32)
        ours.run(x), ref.run(x)
    np.testing.assert_allclose(ours.avg(), ref.avg(), rtol=1e-6)


def test_diversity_and_avg_distance_match_reference(refme):
    from convofusion_tpu.eval.metrics import (
        calc_diversity,
        calculate_avg_distance,
    )

    me, _ = refme
    rng = np.random.default_rng(13)
    feats = rng.normal(size=(10, 300)).astype(np.float32)
    np.testing.assert_allclose(
        calc_diversity(feats), me.calc_diversity(feats), rtol=1e-6)
    flist = [rng.normal(size=(300,)).astype(np.float32) for _ in range(6)]
    np.testing.assert_allclose(
        calculate_avg_distance(flist), me.calculate_avg_distance(flist),
        rtol=1e-6)
    mean = rng.normal(size=(300,)).astype(np.float32)
    std = rng.uniform(0.5, 2.0, size=(300,)).astype(np.float32)
    np.testing.assert_allclose(
        calculate_avg_distance(flist, mean, std),
        me.calculate_avg_distance(flist, mean, std), rtol=1e-5)


def test_jitter_matches_reference(refme):
    from convofusion_tpu.eval.metrics import calculate_jitter

    _, jm = refme
    rng = np.random.default_rng(17)
    pred = rng.normal(size=(128, 63, 3)).astype(np.float32)
    gt = rng.normal(size=(128, 63, 3)).astype(np.float32)
    np.testing.assert_allclose(
        calculate_jitter(pred, gt), jm.calculate_jitter(pred, gt),
        rtol=1e-6)


def test_eval_process_motion_matches_reference(refme):
    from convofusion_tpu.eval.metrics import eval_process_motion

    me, _ = refme
    rng = np.random.default_rng(19)
    # plausible un-normalized pose: root near origin, joints spread
    motion = rng.normal(scale=0.5, size=(64, 63, 3)).astype(np.float64)
    motion[:, :, 1] += 1.0
    ours = eval_process_motion(motion.copy())
    ref = me.process_motion(motion.copy())  # mutates in place
    np.testing.assert_allclose(ours, ref, rtol=1e-6, atol=1e-6)


def test_pose_beats_and_gahr_match_reference(refme):
    from convofusion_tpu.eval.metrics import Alignment

    me, _ = refme
    rng = np.random.default_rng(23)
    pose = np.cumsum(
        rng.normal(size=(128, 189)), axis=0).astype(np.float32)

    ours = Alignment(sigma=0.3, order=10)
    ref = me.Alignment(sigma=0.3, order=10)

    beats = ours.pose_beats(pose)
    (r_arm, r_sh, r_wr, l_arm, l_sh, l_wr) = ref.load_pose(
        pose, 0, 5.12, 25)
    for ours_b, ref_b in [
        (beats["right_arm"], r_arm), (beats["right_shoulder"], r_sh),
        (beats["right_wrist"], r_wr), (beats["left_arm"], l_arm),
        (beats["left_shoulder"], l_sh), (beats["left_wrist"], l_wr),
    ]:
        np.testing.assert_array_equal(ours_b[0], ref_b[0])

    # GAHR formula + calculate_align (incl. the frames_to_time sr=22050
    # quirk: metric_eval.py:274 calls librosa.frames_to_time with default
    # sr even though audio is 16 kHz)
    a = np.sort(rng.uniform(0, 5.12, size=(14,)))
    b = np.sort(rng.uniform(0, 5.12, size=(9,)))
    np.testing.assert_allclose(
        ours.gahr(a, b, 0.3), ref.GAHR(a, b, 0.3), rtol=1e-9)

    onset_bt_rms = np.sort(rng.integers(0, 160, size=(12,)))
    np.testing.assert_allclose(
        ours.calculate_align(onset_bt_rms, beats),
        ref.calculate_align(None, None, onset_bt_rms,
                            r_arm, r_sh, r_wr, l_arm, l_sh, l_wr),
        rtol=1e-9)
