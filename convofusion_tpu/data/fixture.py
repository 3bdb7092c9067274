"""On-disk synthetic dataset fixtures in the reference's layout.

Generates BEAT-style (speaker dirs with 120 fps joint .npy + .wav +
.TextGrid + semantic .txt) and DnD-style (5-person utterance sets) trees so
the full data pipeline — loaders, canonicalization, featurization — can be
exercised end-to-end without the real datasets (which are not shipped with
the reference either, datasets/DATASETS.md).
"""
from __future__ import annotations

import os
from os.path import join as pjoin

import numpy as np

from convofusion_tpu.data.audio import save_wav
from convofusion_tpu.data.text import write_textgrid

_WORDS = ("hello there friend this is a story about brave knights and "
          "dragons we roll dice and laugh together all night").split()


def _skeleton_motion(rng, frames: int, njoints: int = 67,
                     scale_mm: float = 100.0, mode: str = "walk",
                     fps: float = 120.0):
    """Plausible joint trajectories in mm: static offsets + motion.

    mode='walk': random-walk drift — good for exercising the pipeline,
    but spectrally flat (incompressible), so the chunked VAE *cannot*
    reconstruct it well by design.  mode='smooth': band-limited
    sum-of-sinusoids (0.2-2 Hz), matching the premise of real gesture
    motion — used by the learning-loop overfit (train/overfit.py), where
    "recon near zero" must be achievable by a model that works.
    """
    base = rng.uniform(-400, 400, size=(1, njoints, 3))
    base[0, :, 1] = rng.uniform(800, 1600, size=njoints)  # above floor
    if mode == "smooth":
        t = np.arange(frames)[:, None, None, None] / fps
        freqs = rng.uniform(0.2, 2.0, size=(1, njoints, 3, 4))
        phase = rng.uniform(0, 2 * np.pi, size=(1, njoints, 3, 4))
        amp = rng.uniform(5, 60, size=(1, njoints, 3, 4)) / (1 + freqs)
        drift = (amp * np.sin(2 * np.pi * freqs * t + phase)).sum(-1)
    else:
        drift = np.cumsum(
            rng.normal(scale=scale_mm / 50, size=(frames, njoints, 3)),
            axis=0)
    return (base + drift).astype(np.float32)


def _speech_audio(rng, n_samples: int, sr: int, active: bool = True):
    if not active:
        return np.zeros(n_samples, np.float32)
    t = np.arange(n_samples) / sr
    env = (np.sin(2 * np.pi * 2.3 * t) > 0).astype(np.float32)
    carrier = 0.3 * np.sin(2 * np.pi * 220 * t) + 0.1 * rng.normal(
        size=n_samples)
    return (env * carrier).astype(np.float32)


def make_beat_fixture(root: str, speakers=("2_scott", "4_lawrence"),
                      n_files: int = 1, fps: int = 120, sr: int = 16000,
                      seconds: float = 11.0, seed: int = 0,
                      motion_mode: str = "walk"):
    """BEAT tree: <root>/<spkid>/<name>.{npy,wav,TextGrid,txt} + splits."""
    rng = np.random.default_rng(seed)
    names = []
    for spk in speakers:
        spk_id = spk.split("_")[0]
        d = pjoin(root, spk_id)
        os.makedirs(d, exist_ok=True)
        for i in range(n_files):
            name = f"{spk_id}_{spk.split('_')[1]}_0_{i}_{i}"
            frames = int(seconds * fps)
            np.save(pjoin(d, name + ".npy"),
                    _skeleton_motion(rng, frames, mode=motion_mode,
                                     fps=fps))
            n_samples = int(seconds * sr)
            save_wav(pjoin(d, name + ".wav"),
                     _speech_audio(rng, n_samples, sr), sr)
            # word-aligned TextGrid covering the clip
            n_words = 24
            bounds = np.linspace(0, seconds, n_words + 1)
            words = [str(rng.choice(_WORDS)) for _ in range(n_words)]
            write_textgrid(pjoin(d, name + ".TextGrid"), words,
                           bounds[:-1], bounds[1:], seconds)
            # semantic annotation tsv: name, start, end, duration, score,
            # keywords
            with open(pjoin(d, name + ".txt"), "w") as f:
                for k in range(0, n_words, 4):
                    cls = "beat_align" if k % 8 else "iconic_gesture"
                    f.write(f"{cls}\t{bounds[k]:.2f}\t{bounds[k + 1]:.2f}\t"
                            f"{bounds[k + 1] - bounds[k]:.2f}\t0.7\t"
                            f"{words[k]}\n")
            names.append(name)
    for split in ("train", "val", "test"):
        with open(pjoin(root, f"{split}.txt"), "w") as f:
            f.write("\n".join(names))
    return names


def make_dnd_fixture(root: str, n_sets: int = 2, frames: int = 128,
                     fps: int = 25, sr: int = 16000, seed: int = 1,
                     motion_mode: str = "walk"):
    """DnD utterance-set tree: <root>/<session>/<set>/motion_*.npy etc."""
    rng = np.random.default_rng(seed)
    seconds = frames / fps
    n_samples = int(seconds * sr)
    set_names = []
    session = "session1_anne"  # speaker name embedded in path
    for i in range(n_sets):
        set_name = f"{session}/set_{i:03d}"
        d = pjoin(root, set_name)
        os.makedirs(d, exist_ok=True)
        np.save(pjoin(d, "motion_spk.npy"),
                _skeleton_motion(rng, frames, mode=motion_mode, fps=fps))
        save_wav(pjoin(d, "audio_spk.wav"),
                 _speech_audio(rng, n_samples, sr), sr)
        with open(pjoin(d, "text_spk.txt"), "w") as f:
            f.write(" ".join(rng.choice(_WORDS, size=8)))
        for li in range(1, 5):
            np.save(pjoin(d, f"motion_lsn{li}.npy"),
                    _skeleton_motion(rng, frames, mode=motion_mode,
                                     fps=fps))
            active = li % 2 == 1
            save_wav(pjoin(d, f"audio_lsn{li}.wav"),
                     _speech_audio(rng, n_samples, sr, active), sr)
            with open(pjoin(d, f"text_lsn{li}.txt"), "w") as f:
                f.write(" ".join(rng.choice(_WORDS, size=6))
                        if active else "")
            with open(pjoin(d, f"seg_lsn{li}.txt"), "w") as f:
                if active:
                    f.write("0.0\t1.0\thello\n1.0\t2.5\tthere\n")
        with open(pjoin(d, "seg_spk.txt"), "w") as f:
            f.write("0.0\t2.0\tonce\n2.0\t4.0\tupon\n")
        set_names.append(set_name)
    for split in ("train", "val", "test"):
        with open(pjoin(root, f"{split}.txt"), "w") as f:
            f.write("\n".join(set_names))
    return set_names


def make_fixture_pair(tmpdir: str, **kw):
    beat_root = pjoin(tmpdir, "beat")
    dnd_root = pjoin(tmpdir, "dnd")
    os.makedirs(beat_root, exist_ok=True)
    os.makedirs(dnd_root, exist_ok=True)
    make_beat_fixture(beat_root, **{k: v for k, v in kw.items()
                                    if k in ("n_files", "seed")})
    make_dnd_fixture(dnd_root)
    return beat_root, dnd_root
