"""Silence detection on raw audio (pydub semantics, numpy-native).

Reference: scripts/dnd_make_utterance_dataset.py:32-78 uses pydub's
detect_nonsilent/detect_silence with ms windows and dBFS thresholds.
pydub is not available; these re-implementations operate on float wavs
with an O(n) cumulative-energy scan.
"""
from __future__ import annotations

from typing import List, Tuple

import numpy as np


def _rms_dbfs_windows(y: np.ndarray, sr: int, win_ms: int,
                      step_ms: int = 1) -> Tuple[np.ndarray, np.ndarray]:
    """RMS dBFS of each win_ms window at step_ms stride.

    Returns (starts_ms, dbfs)."""
    win = max(1, int(sr * win_ms / 1000))
    step = max(1, int(sr * step_ms / 1000))
    if len(y) < win:
        return np.zeros(0), np.zeros(0)
    sq = np.concatenate([[0.0], np.cumsum(y.astype(np.float64) ** 2)])
    starts = np.arange(0, len(y) - win + 1, step)
    energy = (sq[starts + win] - sq[starts]) / win
    rms = np.sqrt(np.maximum(energy, 1e-12))
    dbfs = 20.0 * np.log10(np.maximum(rms, 1e-10))
    return starts * 1000.0 / sr, dbfs


def detect_silence(y: np.ndarray, sr: int = 16000,
                   min_silence_len: int = 1000,
                   silence_thresh: float = -16.0,
                   seek_step: int = 1) -> List[List[int]]:
    """[[start_ms, end_ms], ...] of silent stretches (pydub contract)."""
    total_ms = int(len(y) * 1000 / sr)
    if total_ms < min_silence_len:
        return []
    starts_ms, dbfs = _rms_dbfs_windows(y, sr, min_silence_len, seek_step)
    silent = dbfs <= silence_thresh
    out: List[List[int]] = []
    run_start = None
    for s_ms, is_sil in zip(starts_ms, silent):
        if is_sil and run_start is None:
            run_start = s_ms
        elif not is_sil and run_start is not None:
            out.append([int(run_start), int(s_ms + min_silence_len - 1)])
            run_start = None
    if run_start is not None:
        out.append([int(run_start), total_ms])
    return out


def detect_nonsilent(y: np.ndarray, sr: int = 16000,
                     min_silence_len: int = 1000,
                     silence_thresh: float = -16.0,
                     seek_step: int = 1) -> List[List[int]]:
    total_ms = int(len(y) * 1000 / sr)
    silences = detect_silence(y, sr, min_silence_len, silence_thresh,
                              seek_step)
    out = []
    cur = 0
    for s, e in silences:
        if s > cur:
            out.append([cur, s])
        cur = max(cur, e)
    if cur < total_ms:
        out.append([cur, total_ms])
    return out


def split_on_silence(y: np.ndarray, sr: int = 16000,
                     min_silence_len: int = 1000,
                     silence_thresh: float = -16.0,
                     keep_silence: int = 100, seek_step: int = 1):
    """(segments, ranges_ms) with keep_silence padding at both ends."""
    total_ms = int(len(y) * 1000 / sr)
    ranges = [
        [max(0, s - keep_silence), min(total_ms, e + keep_silence)]
        for s, e in detect_nonsilent(y, sr, min_silence_len,
                                     silence_thresh, seek_step)
    ]
    segs = [y[int(s * sr / 1000):int(e * sr / 1000)] for s, e in ranges]
    return segs, ranges
