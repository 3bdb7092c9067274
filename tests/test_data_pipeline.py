"""Data-layer tests: audio DSP parity invariants, TextGrid parsing, the
full BEAT/DnD loaders over on-disk fixtures, canonicalization invariants,
and the datamodule -> model handoff."""
import os

import numpy as np
import pytest

from convofusion_tpu.config.testing import tiny_config
from convofusion_tpu.data import audio as A
from convofusion_tpu.data.dataset import (
    BEATAugReactionDataset,
    MotionDataset,
    check_audio,
    process_motion,
    resample_motion_fps,
)
from convofusion_tpu.data.datamodule import get_datasets
from convofusion_tpu.data.fixture import make_beat_fixture, make_dnd_fixture
from convofusion_tpu.data.text import parse_textgrid, write_textgrid


@pytest.fixture(scope="module")
def fixture_roots(tmp_path_factory):
    root = tmp_path_factory.mktemp("data")
    beat_root = os.path.join(root, "beat")
    dnd_root = os.path.join(root, "dnd")
    os.makedirs(beat_root)
    os.makedirs(dnd_root)
    make_beat_fixture(beat_root)
    make_dnd_fixture(dnd_root)
    return str(beat_root), str(dnd_root)


def test_mel_shapes_and_range():
    rng = np.random.default_rng(0)
    y = rng.normal(size=int(5.12 * 16000)).astype(np.float32)
    mel = A.mel_db(y)
    assert mel.shape == (161, 80)  # audioenc.py:27 contract
    assert mel.max() <= 0.0 + 1e-6 and mel.min() >= -80.0 - 1e-6


def test_mel_batch_jax_matches_numpy():
    rng = np.random.default_rng(1)
    y = rng.normal(size=(2, 16000)).astype(np.float32)
    import jax.numpy as jnp

    p_jax = np.asarray(A.melspectrogram_batch_jax(jnp.asarray(y)))
    for i in range(2):
        p_np = A.melspectrogram(y[i])
        np.testing.assert_allclose(p_jax[i], p_np, rtol=2e-3, atol=2e-3)


def test_amplitude_db_and_silence_detection():
    sr, fps = 16000, 25
    n = int(128 / fps * sr)
    silent = np.zeros(n, np.float32)
    loud = 0.5 * np.sin(np.linspace(0, 1000, n)).astype(np.float32)
    assert check_audio(silent).sum() == 0
    assert check_audio(loud).sum() == 8
    half = np.concatenate([loud[: n // 2], silent[: n - n // 2]])
    bits = check_audio(half)
    assert bits[:4].sum() == 4 and bits[4:].sum() == 0


def test_wav_roundtrip(tmp_path):
    y = (0.3 * np.sin(np.linspace(0, 100, 16000))).astype(np.float32)
    p = str(tmp_path / "t.wav")
    A.save_wav(p, y, 16000)
    y2, sr = A.load_wav(p, 16000)
    assert sr == 16000
    np.testing.assert_allclose(y2, y, atol=1e-3)


def test_textgrid_roundtrip(tmp_path):
    p = str(tmp_path / "t.TextGrid")
    write_textgrid(p, ["hello", "world"], [0.0, 1.0], [1.0, 2.0], 2.0)
    td = parse_textgrid(p)
    assert list(td["text"]) == ["hello", "world"]
    np.testing.assert_allclose(td["start"], [0.0, 1.0])
    np.testing.assert_allclose(td["end"], [1.0, 2.0])


def test_resample_motion_fps():
    motion = np.arange(240, dtype=np.float32)[:, None, None] * np.ones(
        (1, 3, 3), np.float32)
    out = resample_motion_fps(motion, 120, 25)
    assert len(out) == 50
    np.testing.assert_allclose(out[1, 0, 0], 4.8, atol=1e-5)


def test_process_motion_invariants():
    rng = np.random.default_rng(2)
    raw = rng.uniform(-500, 500, size=(128, 67, 3)).astype(np.float32)
    raw[:, :, 1] += 1200
    out = process_motion([raw])[0]
    assert out.shape == (128, 189)
    pts = out.reshape(128, 63, 3)
    # root xz at origin in frame 0 (canonicalization contract)
    np.testing.assert_allclose(pts[0, 0, [0, 2]], 0.0, atol=1e-4)


def test_motion_dataset_over_fixture(fixture_roots):
    beat_root, dnd_root = fixture_roots
    ds = MotionDataset(
        split_file=[os.path.join(beat_root, "train.txt"),
                    os.path.join(dnd_root, "train.txt")],
        max_motion_length=128, min_motion_length=128, motion_rep="pos",
        unit_length=1, dataset_path=[beat_root, dnd_root],
        face_joint_idx=[18, 13, 9, 5], fps=25, dataset_select="both")
    assert len(ds) > 0
    motion, length, name = ds[0]
    assert motion.shape == (128, 189) and length == 128
    assert not np.any(np.isnan(motion))
    # both sources present
    names = [ds[i][2] for i in range(len(ds))]
    assert any(n.startswith("beat/") for n in names)
    assert any(n.startswith("dnd/") for n in names)


def test_reaction_dataset_over_fixture(fixture_roots):
    beat_root, dnd_root = fixture_roots
    ds = BEATAugReactionDataset(
        split_file=[os.path.join(beat_root, "train.txt"),
                    os.path.join(dnd_root, "train.txt")],
        max_motion_length=128, min_motion_length=128, motion_rep="pos",
        unit_length=1, dataset_path=[beat_root, dnd_root],
        face_joint_idx=[18, 13, 9, 5], sample_rate=16000, num_mels=80,
        hop_length=512, fps=25, dataset_select="both")
    assert len(ds) > 0
    item = ds[0]
    (motion_spk, length, motion_lsn, mel_spk, mel_lsn, audio_spk,
     audio_lsn, text_spk, text_lsn, apb, name, spk_name, lsn_name,
     lsn_id, other, comb, seg_lsn, seg_spk, sem_lsn, sem_info) = item
    assert motion_lsn.shape == (128, 189)
    assert mel_lsn.shape == (161, 80)
    assert apb.shape == (8,)
    assert 1 <= lsn_id <= 35
    assert isinstance(text_lsn, str)


def test_get_datasets_end_to_end(fixture_roots):
    beat_root, dnd_root = fixture_roots
    cfg = tiny_config("diffusion")
    cfg.DEBUG = False
    cfg.DATASET.BEATDND.ROOT = [beat_root, dnd_root]
    cfg.DATASET.BEATDND.SPLIT_ROOT = [beat_root, dnd_root]
    cfg.TRAIN.BATCH_SIZE = 2
    module = get_datasets(cfg)[0]
    assert cfg.DATASET.NFEATS == 189
    loader = module.train_dataloader()
    batch = next(iter(loader))
    assert batch["motion_lsn"].shape == (2, 128, 189)
    assert batch["melspec_lsn"].shape[0] == 2
    assert batch["active_passive_lsn"].dtype == np.int32

    # handoff into the model's array-batch contract
    from convofusion_tpu.data.synthetic import prepare_arrays
    from convofusion_tpu.models.convofusion import Convofusion

    model = Convofusion(cfg)
    arrays, _, _ = prepare_arrays(model, batch)
    assert arrays["lsn_ids"].shape[0] == 2


def test_dataloader_host_sharding_partitions_the_epoch():
    """DataLoader(shard=(i, n)) must give every host a disjoint stride of
    the same shuffled permutation whose union is the full epoch
    (DistributedSampler semantics for the multi-host train loop)."""
    from convofusion_tpu.data.datamodule import DataLoader

    class Items:
        def __len__(self):
            return 23

        def __getitem__(self, i):
            return i

    def collate(items):
        return list(items)

    full = [i for b in DataLoader(Items(), 4, collate, shuffle=True,
                                  seed=3) for i in b]
    shards = [
        [i for b in DataLoader(Items(), 4, collate, shuffle=True, seed=3,
                               shard=(r, 2)) for i in b]
        for r in (0, 1)
    ]
    # every host gets the SAME padded count (unequal counts would leave
    # hosts running different numbers of collective steps -> deadlock)
    assert len(shards[0]) == len(shards[1]) == 12
    # union covers the epoch; overlap is only the wrap-around padding
    assert set(shards[0]) | set(shards[1]) == set(range(23))
    padded = full + full[:1]
    assert shards[0] == padded[0::2] and shards[1] == padded[1::2]

    # drop_last sizing is per-shard and equal across hosts
    for r in (0, 1):
        dl = DataLoader(Items(), 4, collate, drop_last=True, shard=(r, 2))
        assert len(dl) == 3  # 12 padded items per host -> 3 full batches
