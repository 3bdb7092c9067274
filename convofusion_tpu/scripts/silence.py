"""Silence detection on raw audio (pydub semantics, numpy-native).

Reference: scripts/dnd_make_utterance_dataset.py:32-78 uses pydub's
detect_nonsilent/detect_silence with ms windows and dBFS thresholds.
pydub is not available; this re-implementation follows pydub.silence's
actual algorithm — ms-indexed analysis windows (with the final window
start guaranteed), and silent ranges MERGED when their starts are
within ``min_silence_len`` of each other — on an O(n)
cumulative-energy scan.
"""
from __future__ import annotations

from typing import List

import numpy as np


def _window_dbfs(y: np.ndarray, sr: int, starts_ms: np.ndarray,
                 win_ms: int) -> np.ndarray:
    """RMS dBFS of the ``win_ms`` window at each ms start."""
    sq = np.concatenate([[0.0], np.cumsum(y.astype(np.float64) ** 2)])
    a = (starts_ms * sr // 1000).astype(int)
    b = np.minimum(len(y), ((starts_ms + win_ms) * sr // 1000).astype(int))
    n = np.maximum(1, b - a)
    rms = np.sqrt(np.maximum((sq[b] - sq[a]) / n, 1e-12))
    return 20.0 * np.log10(np.maximum(rms, 1e-10))


def detect_silence(y: np.ndarray, sr: int = 16000,
                   min_silence_len: int = 1000,
                   silence_thresh: float = -16.0,
                   seek_step: int = 1) -> List[List[int]]:
    """[[start_ms, end_ms], ...] of silent stretches (pydub contract).

    Mirrors pydub.silence.detect_silence: window starts every
    ``seek_step`` ms with the last start (seg_len - min_silence_len)
    always included, and consecutive silent starts combined into one
    range unless the gap between them exceeds ``min_silence_len`` —
    two quiet stretches separated by a short blip count as ONE range.
    """
    seg_len = int(len(y) * 1000 / sr)
    if seg_len < min_silence_len:
        return []
    last_slice_start = seg_len - min_silence_len
    starts = np.arange(0, last_slice_start + 1, seek_step)
    if last_slice_start % seek_step:
        starts = np.append(starts, last_slice_start)
    dbfs = _window_dbfs(y, sr, starts, min_silence_len)
    silence_starts = starts[dbfs <= silence_thresh]
    if len(silence_starts) == 0:
        return []

    combined: List[List[int]] = []
    prev_i = int(silence_starts[0])
    range_start = prev_i
    for i in silence_starts[1:]:
        i = int(i)
        continuous = i == prev_i + seek_step
        has_gap = i > prev_i + min_silence_len
        if not continuous and has_gap:
            combined.append([range_start, prev_i + min_silence_len])
            range_start = i
        prev_i = i
    combined.append([range_start, prev_i + min_silence_len])
    return combined


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
