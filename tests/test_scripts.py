"""Preprocessing scripts: BVH parsing/FK, silence splitting, utterance
dataset generation, word segments, visualization."""
import os

import numpy as np
import pytest

from convofusion_tpu.scripts.bvh import parse_bvh, world_positions
from convofusion_tpu.scripts.silence import (
    detect_nonsilent,
    detect_silence,
    split_on_silence,
)

SIMPLE_BVH = """HIERARCHY
ROOT Hips
{
    OFFSET 0.0 0.0 0.0
    CHANNELS 6 Xposition Yposition Zposition Zrotation Xrotation Yrotation
    JOINT Spine
    {
        OFFSET 0.0 10.0 0.0
        CHANNELS 3 Zrotation Xrotation Yrotation
        End Site
        {
            OFFSET 0.0 5.0 0.0
        }
    }
}
MOTION
Frames: 2
Frame Time: 0.041667
1.0 2.0 3.0 0.0 0.0 0.0 0.0 0.0 0.0
1.0 2.0 3.0 90.0 0.0 0.0 0.0 0.0 0.0
"""


def test_bvh_parse_and_fk(tmp_path):
    p = tmp_path / "t.bvh"
    p.write_text(SIMPLE_BVH)
    data = parse_bvh(str(p))
    assert data.joint_names == ["Hips", "Spine", "SpineEnd"]
    assert abs(data.fps - 24.0) < 0.1
    pos, names = world_positions(data)
    assert pos.shape == (2, 3, 3)
    # frame 0: no rotation -> Spine at root + (0,10,0)
    np.testing.assert_allclose(pos[0, 1], [1.0, 12.0, 3.0], atol=1e-6)
    np.testing.assert_allclose(pos[0, 2], [1.0, 17.0, 3.0], atol=1e-6)
    # frame 1: root Z-rotated 90deg -> offset (0,10,0) maps to (-10,0,0)
    np.testing.assert_allclose(pos[1, 1], [-9.0, 2.0, 3.0], atol=1e-4)


def test_silence_detection_roundtrip():
    sr = 16000
    quiet = np.zeros(sr, np.float32)
    loud = 0.5 * np.sin(
        2 * np.pi * 220 * np.arange(sr * 2) / sr).astype(np.float32)
    y = np.concatenate([quiet, loud, quiet, quiet])
    sil = detect_silence(y, sr, min_silence_len=500, silence_thresh=-45)
    assert len(sil) == 2
    assert sil[0][0] == 0
    non = detect_nonsilent(y, sr, min_silence_len=500, silence_thresh=-45)
    assert len(non) == 1
    assert abs(non[0][0] - 1000) < 600 and abs(non[0][1] - 3000) < 600
    segs, ranges = split_on_silence(y, sr, min_silence_len=500,
                                    silence_thresh=-45, keep_silence=10)
    assert len(segs) == 1 and len(segs[0]) > sr


def test_make_utterance_dataset(tmp_path):
    from convofusion_tpu.data.audio import save_wav
    from convofusion_tpu.scripts.make_utterance_dataset import (
        process_session,
    )
    from convofusion_tpu.scripts.transcribe import NullTranscriber

    sr, fps = 16000, 25
    seconds = 12
    rng = np.random.default_rng(0)
    sess = tmp_path / "sessions" / "game1"
    sess.mkdir(parents=True)
    for p in range(5):
        if p == 0:
            y = 0.4 * np.sin(2 * np.pi * 200 * np.arange(
                seconds * sr) / sr).astype(np.float32)
        else:
            y = np.zeros(seconds * sr, np.float32)
        save_wav(str(sess / f"person_{p}.wav"), y, sr)
        np.save(sess / f"person_{p}.npy",
                rng.normal(size=(seconds * fps, 67, 3)).astype(
                    np.float32))

    out = tmp_path / "utt"
    n = process_session(str(sess), str(out), num_frames=128,
                       transcriber=NullTranscriber())
    assert n >= 2  # 12s of speech -> at least two 5.12s sets
    set_dirs = sorted(out.glob("game1/set_*"))
    d = set_dirs[0]
    assert np.load(d / "motion_spk.npy").shape[0] == 128
    for i in range(1, 5):
        assert (d / f"motion_lsn{i}.npy").exists()
        assert (d / f"audio_lsn{i}.wav").exists()
        assert (d / f"seg_lsn{i}.txt").exists()


def test_visualize_png_sheet(tmp_path):
    from convofusion_tpu.scripts.visualize import render_clip

    rng = np.random.default_rng(1)
    joints = rng.normal(size=(16, 63, 3)).astype(np.float32)
    out = render_clip(joints, str(tmp_path / "clip.png"))
    assert os.path.exists(out) and os.path.getsize(out) > 1000


def test_beat_getjoints_over_fixture_bvh(tmp_path):
    """A minimal BEAT-like BVH with the named joints converts end-to-end."""
    from convofusion_tpu.scripts.beat_getjoints import (
        bvh_to_joint_positions,
        JOINT_LIST,
    )

    # build a BVH containing every joint JOINT_LIST needs, as a flat chain
    needed = [j for j in dict.fromkeys(JOINT_LIST)
              if not j.endswith("Mid") and not j.endswith("End")]
    lines = ["HIERARCHY", "ROOT Hips", "{", "OFFSET 0 0 0",
             "CHANNELS 6 Xposition Yposition Zposition "
             "Zrotation Xrotation Yrotation"]
    for j in needed:
        lines += [f"JOINT {j}", "{", "OFFSET 0 1 0",
                  "CHANNELS 3 Zrotation Xrotation Yrotation"]
    # LeftToeBaseEnd / RightToeBaseEnd / HeadEnd come from End sites of
    # their parents; simplest: add them as explicit joints too
    for j in ("HeadEnd", "LeftToeBaseEnd", "RightToeBaseEnd"):
        lines += [f"JOINT {j}", "{", "OFFSET 0 1 0",
                  "CHANNELS 3 Zrotation Xrotation Yrotation"]
    lines += ["End Site", "{", "OFFSET 0 1 0", "}"]
    lines += ["}"] * (len(needed) + 3 + 1)
    n_channels = 6 + 3 * (len(needed) + 3)
    lines += ["MOTION", "Frames: 3", "Frame Time: 0.00833",
              " ".join(["0"] * n_channels),
              " ".join(["0"] * n_channels),
              " ".join(["0"] * n_channels)]
    p = tmp_path / "beat.bvh"
    p.write_text("\n".join(lines))

    joints = bvh_to_joint_positions(str(p))
    assert joints.shape == (2, len(JOINT_LIST), 3)
    assert np.isfinite(joints).all()


def test_silence_detection_pydub_semantics():
    """Pin the pydub.silence algorithm details: the final window start is
    analyzed even when seek_step doesn't divide it, and range end =
    last_silent_start + min_silence_len."""
    import numpy as np

    sr = 16000
    loud = 0.5 * np.sin(
        2 * np.pi * 220 * np.arange(int(sr * 0.6)) / sr).astype(np.float32)
    quiet = np.zeros(int(sr * 0.4), np.float32)
    y = np.concatenate([loud, quiet])  # 1000 ms, silence in [600, 1000]

    sil = detect_silence(y, sr, min_silence_len=300, silence_thresh=-45,
                         seek_step=7)
    # last_slice_start = 700, not a multiple of 7 -> must still be
    # analyzed, so the detected range reaches the clip end (700+300)
    assert len(sil) == 1
    start, end = sil[0]
    assert end == 1000
    assert 595 <= start <= 610
