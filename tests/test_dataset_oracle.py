"""Data-path oracle: run the REFERENCE BEATAugReactionDataset on the same
on-disk fixture and diff every item field-by-field against ours.

The reference dataset (convofusion/data/beat_dnd/dataset.py) imports
librosa / textgrid / soundfile, none of which exist in this image; the
shims below back librosa with our native DSP (convofusion_tpu/data/audio.py
— itself invariant-tested in test_data_pipeline) so the oracle covers the
ITEM-ASSEMBLY logic: chunking, canonicalization ordering, text/sem windows,
apb bits, naming, lsn ids, seg parsing, other_mlsns and the NaN guard.

Known reference defect worked around here: DnD entries are built without a
'sem_info' key (dataset.py:307-318 vs :598), so the shipped reference
crashes with KeyError on every DnD item — we inject the key before reading.
"""
import os

import numpy as np
import pytest

pytestmark = pytest.mark.slow  # compile/oracle heavy (see pyproject addopts)

torch = pytest.importorskip("torch")

from convofusion_tpu.data.dataset import (
    BEATAugReactionDataset as OurDS,
)
from convofusion_tpu.data.fixture import make_beat_fixture, make_dnd_fixture

FIELDS = [
    "motion_spk", "m_length", "motion_lsn", "melspec_spk", "melspec_lsn",
    "audio_spk", "audio_lsn", "text_spk", "text_lsn", "active_passive_lsn",
    "name", "spk_name", "lsn_name", "lsn_id", "other_mlsns",
    "combined_audio", "seg_lsn", "seg_spk", "sem_lsn", "sem_info",
]


from ref_shims import install_data_shims as _install_data_shims  # noqa: E402


@pytest.fixture(scope="module")
def roots(tmp_path_factory):
    root = tmp_path_factory.mktemp("oracle_data")
    beat_root, dnd_root = str(root / "beat"), str(root / "dnd")
    os.makedirs(beat_root)
    os.makedirs(dnd_root)
    make_beat_fixture(beat_root)
    make_dnd_fixture(dnd_root)
    return beat_root, dnd_root


def _ds_args(beat_root, dnd_root):
    return dict(
        split_file=[os.path.join(beat_root, "train.txt"),
                    os.path.join(dnd_root, "train.txt")],
        max_motion_length=128, min_motion_length=128, motion_rep="pos",
        unit_length=1, dataset_path=[beat_root, dnd_root],
        face_joint_idx=[18, 13, 9, 5], sample_rate=16000, num_mels=80,
        hop_length=512, fps=25, dataset_select="both")


@pytest.fixture(scope="module")
def datasets(reference_path, roots):
    _install_data_shims()
    from convofusion.data.beat_dnd.dataset import (
        BEATAugReactionDataset as RefDS,
    )

    beat_root, dnd_root = roots
    ref = RefDS(**_ds_args(beat_root, dnd_root))
    ours = OurDS(**_ds_args(beat_root, dnd_root))
    # reference defect: DnD entries never get a 'sem_info' key
    for k, v in ref.data_dict.items():
        v.setdefault("sem_info", [])
        v.setdefault("sem_lsn", -1.0 * np.ones(128))
    return ref, ours


def test_name_lists_identical(datasets):
    ref, ours = datasets
    assert list(ref.name_list) == list(ours.name_list)
    assert len(ref) == len(ours) > 0
    # both sources present in the fixture
    assert any(n.startswith("beat+") for n in ours.name_list)
    assert any(n.startswith("dnd+") for n in ours.name_list)


def _compare_item(ref_item, our_item, name):
    assert len(ref_item) == len(our_item) == 20
    for f, rv, ov in zip(FIELDS, ref_item, our_item):
        ctx = f"{name}: field {f}"
        if f in ("motion_spk", "motion_lsn", "melspec_spk", "melspec_lsn",
                 "audio_spk", "audio_lsn", "active_passive_lsn",
                 "combined_audio", "sem_lsn"):
            # reference canonicalization runs through torch fp32 kernels,
            # ours through numpy — values agree to fp32 round-off
            np.testing.assert_allclose(
                np.asarray(ov, np.float64), np.asarray(rv, np.float64),
                rtol=1e-3, atol=5e-4, err_msg=ctx)
        elif f == "other_mlsns":
            if rv is None:
                assert ov is None, ctx
            else:
                assert sorted(ov) == sorted(rv), ctx
                for lname in rv:
                    np.testing.assert_allclose(ov[lname], rv[lname],
                                               rtol=1e-5, err_msg=ctx)
        elif f == "sem_info":
            assert len(ov) == len(rv), ctx
            for od, rd in zip(ov, rv):
                assert od["name"] == rd["name"], ctx
                assert od["word"] == rd["word"], ctx
                assert abs(od["start"] - rd["start"]) < 1e-6, ctx
                assert abs(od["end"] - rd["end"]) < 1e-6, ctx
        elif f in ("seg_lsn", "seg_spk"):
            if isinstance(rv, str) or rv is None:
                assert ov == rv, ctx
            else:
                assert len(ov) == len(rv), ctx
                for (ow, ot), (rw, rt) in zip(ov, rv):
                    assert ot == rt, ctx
                    np.testing.assert_allclose(ow, rw, atol=1e-6,
                                               err_msg=ctx)
        else:
            assert ov == rv, ctx


def test_items_field_by_field(datasets):
    import random

    ref, ours = datasets
    for idx, name in enumerate(ref.name_list):
        # identical RNG state for the (degenerate, single-listener)
        # lsn_idx draw and the passive-listener melspec rand
        random.seed(123 + idx)
        np.random.seed(123 + idx)
        ref_item = ref[idx]
        random.seed(123 + idx)
        np.random.seed(123 + idx)
        our_item = ours[idx]
        _compare_item(ref_item, our_item, name)


def test_nan_guard_matches_reference(datasets):
    """Both datasets raise on NaN motion (reference dataset.py:697-698)."""
    ref, ours = datasets
    name = ref.name_list[0]
    saved = ref.data_dict[name]["motions_lsn"]
    bad = [m.copy() for m in saved]
    bad[0][3, 7] = np.nan
    for ds in (ref, ours):
        ds.data_dict[name]["motions_lsn"] = bad
    try:
        with pytest.raises(ValueError, match="nan in motion"):
            ref[0]
        with pytest.raises(ValueError, match="nan in motion"):
            ours[0]
    finally:
        for ds in (ref, ours):
            ds.data_dict[name]["motions_lsn"] = saved


def test_motion_dataset_field_parity(reference_path, roots):
    """VAE-stage MotionDataset oracle: reference vs ours on the fixture
    (dataset.py:737-972) — name lists and (motion, length, name) items."""
    _install_data_shims()
    from convofusion.data.beat_dnd.dataset import MotionDataset as RefMD

    from convofusion_tpu.data.dataset import MotionDataset as OurMD

    beat_root, dnd_root = roots
    kwargs = dict(
        split_file=[os.path.join(beat_root, "train.txt"),
                    os.path.join(dnd_root, "train.txt")],
        max_motion_length=128, min_motion_length=128, motion_rep="pos",
        unit_length=1, dataset_path=[beat_root, dnd_root],
        face_joint_idx=[18, 13, 9, 5], fps=25, dataset_select="both")
    ref = RefMD(**kwargs)
    ours = OurMD(**kwargs)
    assert list(ref.name_list) == list(ours.name_list)
    assert len(ref) == len(ours) > 0
    for idx in range(len(ref)):
        m_r, len_r, name_r = ref[idx]
        m_o, len_o, name_o = ours[idx]
        assert (len_o, name_o) == (len_r, name_r)
        np.testing.assert_allclose(
            np.asarray(m_o, np.float64), np.asarray(m_r, np.float64),
            rtol=1e-3, atol=5e-4, err_msg=name_r)
