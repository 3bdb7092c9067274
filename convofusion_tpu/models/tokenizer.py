"""Host-side tokenization producing static-shape index tensors.

The reference tokenizes with the HF ``t5-base`` SentencePiece tokenizer,
wrapping every text as ``<bos> {text} <eos>`` except the uncond token
``'-'*10`` (t5.py:93), and builds token->word maps for word-excitation
guidance (t5.py:104-109).

This module provides:
  * ``SentencePieceTokenizer`` — exact t5-base tokenization from a local
    ``spiece.model`` (no network, no ``sentencepiece`` package needed): the
    proto is parsed natively and converted to the same ``tokenizers``
    pipeline transformers builds (see models/sentencepiece.py).  This is
    the production tokenizer whenever checkpoint assets are on disk.
  * ``HFTokenizer`` — thin adapter over a locally cached HF tokenizer.
  * ``WordHashTokenizer`` — a deterministic, dependency-free word-level
    tokenizer mapping words into the T5 vocab range via a stable hash; the
    explicit *fallback* when no SentencePiece assets exist (zero-egress
    environments).  Its ids do NOT match t5-base — released-checkpoint
    text conditioning requires ``SentencePieceTokenizer``/``HFTokenizer``.
  * ``make_tokenizer`` — resolution order: spiece.model next to the model
    path -> cached HF tokenizer -> WordHashTokenizer (with a warning).

Both return fixed-length ``(input_ids, attention_mask, word_ids)`` so the
downstream jit'd encoders see static shapes (SURVEY.md §7 design stance).
"""
from __future__ import annotations

import hashlib
from dataclasses import dataclass
from typing import List, Optional, Sequence, Tuple

import numpy as np

UNCOND_TEXT = "-" * 10


@dataclass
class TokenBatch:
    input_ids: np.ndarray          # (B, T) int32
    attention_mask: np.ndarray     # (B, T) bool, True = valid
    word_ids: List[List[Optional[int]]]  # per token: source word index

    def word_map(self, texts: Sequence[str]) -> List[List[str]]:
        """token2word maps as word strings (reference t5.py:77-86)."""
        out = []
        for text, wids in zip(texts, self.word_ids):
            words = text.split()
            out.append(
                [words[w] if w is not None and w < len(words) else ""
                 for w in wids])
        return out


class WordHashTokenizer:
    """Deterministic word-level tokenizer over the T5 vocab range.

    ids: 0 = <pad>, 1 = <bos>, 2 = <eos>, 3 = <unk>; words hash into
    [4, vocab_size).  The uncond text ``'-'*10`` is NOT wrapped with
    bos/eos, matching the reference (t5.py:93).
    """

    def __init__(self, vocab_size: int = 32128, max_length: int = 200):
        self.vocab_size = vocab_size
        self.max_length = max_length
        self.pad_id, self.bos_id, self.eos_id, self.unk_id = 0, 1, 2, 3

    def _word_id(self, word: str) -> int:
        h = int.from_bytes(
            hashlib.md5(word.lower().encode()).digest()[:4], "little")
        return 4 + h % (self.vocab_size - 4)

    def __call__(self, texts: Sequence[str],
                 pad_to: Optional[int] = None) -> TokenBatch:
        seqs, wids = [], []
        for text in texts:
            words = text.split()
            if text == UNCOND_TEXT or not words:
                ids = [self._word_id(UNCOND_TEXT)]
                wid: List[Optional[int]] = [0]
            else:
                ids = [self.bos_id] + [self._word_id(w) for w in words] + [
                    self.eos_id]
                # the reference wraps texts as "<bos> text <eos>" BEFORE
                # splitting, so word index 0 is "<bos>" (t5.py:93,104-109);
                # keep the same convention: shift content words by +1
                wid = [0] + [i + 1 for i in range(len(words))] + [
                    len(words) + 1]
            ids = ids[: self.max_length]
            wid = wid[: self.max_length]
            seqs.append(ids)
            wids.append(wid)

        n = pad_to if pad_to is not None else max(len(s) for s in seqs)
        ids_arr = np.full((len(seqs), n), self.pad_id, np.int32)
        mask = np.zeros((len(seqs), n), bool)
        for i, s in enumerate(seqs):
            s = s[:n]
            ids_arr[i, : len(s)] = s
            mask[i, : len(s)] = True
            wids[i] = wids[i][:n] + [None] * (n - len(wids[i]))
        return TokenBatch(ids_arr, mask, wids)

    def wrapped_texts(self, texts: Sequence[str]) -> List[str]:
        """Texts as the word maps see them (bos/eos wrapped)."""
        return [t if t == UNCOND_TEXT else f"<bos> {t} <eos>" for t in texts]


class _FastTokenizerAdapter:
    """Shared contract over any HF-fast tokenizer object.

    Applies the reference's runtime special-token additions
    (t5.py:30: ``<eos>``/``<bos>``/``<pad>``/``<unk>``; for t5-base the
    latter two already exist, so ``<eos>`` lands at id 32100 and ``<bos>``
    at 32101 — inside the model's 32128-row embedding) and its
    ``<bos> {text} <eos>`` wrapping (t5.py:93).
    """

    def __init__(self, tok, max_length: int = 200):
        self.tok = tok
        self.tok.add_special_tokens(
            {"eos_token": "<eos>", "bos_token": "<bos>",
             "pad_token": "<pad>", "unk_token": "<unk>"})
        self.max_length = max_length

    @property
    def vocab_size(self) -> int:
        """Id space incl. runtime-added specials — the minimum embedding
        rows a text encoder paired with this tokenizer needs."""
        return int(len(self.tok))

    def __call__(self, texts: Sequence[str],
                 pad_to: Optional[int] = None) -> TokenBatch:
        wrapped = [t if t == UNCOND_TEXT else f"<bos> {t} <eos>"
                   for t in texts]
        enc = self.tok(
            wrapped, return_tensors="np",
            padding="max_length" if pad_to else True,
            max_length=pad_to, truncation=True)
        word_ids = [enc.word_ids(i) for i in range(len(texts))]
        return TokenBatch(
            enc["input_ids"].astype(np.int32),
            enc["attention_mask"].astype(bool),
            word_ids,
        )

    def wrapped_texts(self, texts: Sequence[str]) -> List[str]:
        return [t if t == UNCOND_TEXT else f"<bos> {t} <eos>" for t in texts]


class HFTokenizer(_FastTokenizerAdapter):
    """Adapter over a locally cached HF tokenizer (same contract)."""

    def __init__(self, modelpath: str, max_length: int = 200):
        from transformers import AutoTokenizer

        tok = AutoTokenizer.from_pretrained(
            modelpath, model_max_length=max_length, use_fast=True,
            local_files_only=True)
        super().__init__(tok, max_length)


class SentencePieceTokenizer(_FastTokenizerAdapter):
    """Exact t5-base tokenization from a local ``spiece.model``.

    Parses the sentencepiece ModelProto natively and rebuilds the
    ``tokenizers`` pipeline that transformers' T5Converter would produce —
    ids, subword token->word maps and the trailing ``</s>`` all match
    ``AutoTokenizer.from_pretrained('t5-base')``
    (reference t5.py:28,104-109).
    """

    def __init__(self, spiece_path: str, max_length: int = 200,
                 extra_ids: int = 100):
        from convofusion_tpu.models.sentencepiece import (
            convert_t5_fast,
            load_spiece,
        )

        self.spiece_path = spiece_path
        sp = load_spiece(spiece_path)
        tok = convert_t5_fast(sp, extra_ids=extra_ids,
                              model_max_length=max_length)
        super().__init__(tok, max_length)


def find_spiece(modelpath: str) -> Optional[str]:
    """Locate a ``spiece.model`` for ``modelpath`` (file, dir, the
    documented asset-drop tree — utils/assets.py — or the HF cache layout
    ``models--t5-base/snapshots/*/spiece.model``)."""
    import glob
    import os

    if os.path.isfile(modelpath) and modelpath.endswith(".model"):
        return modelpath
    candidates = []
    if os.path.isdir(modelpath):
        candidates.append(os.path.join(modelpath, "spiece.model"))
    if "/" not in str(modelpath) or str(modelpath).count("/") == 1:
        # bare model names ('t5-base', 'google/t5-base'): check the
        # asset-drop contract first (utils/assets.py)
        from convofusion_tpu.utils.assets import assets_root

        candidates.append(os.path.join(
            assets_root(), str(modelpath).split("/")[-1], "spiece.model"))
    cache = os.environ.get(
        "HF_HOME", os.path.expanduser("~/.cache/huggingface"))
    slug = "models--" + str(modelpath).replace("/", "--")
    candidates += glob.glob(
        os.path.join(cache, "hub", slug, "snapshots", "*", "spiece.model"))
    for c in candidates:
        if os.path.isfile(c):
            return c
    return None


def make_tokenizer(modelpath: str = "t5-base", max_length: int = 200,
                   vocab_size: int = 32128):
    """Best available tokenizer for ``modelpath``.

    Priority: native spiece.model -> cached HF tokenizer ->
    WordHashTokenizer (explicit fallback, warns: ids are NOT t5-base, so
    released-checkpoint text conditioning will not be faithful).
    """
    import warnings

    spiece = find_spiece(modelpath)
    if spiece is not None:
        try:
            return SentencePieceTokenizer(spiece, max_length=max_length)
        except Exception as e:  # corrupted asset: fall through
            warnings.warn(f"failed to load {spiece}: {e}")
    try:
        return HFTokenizer(modelpath, max_length=max_length)
    except Exception:
        pass
    warnings.warn(
        f"no t5 tokenizer assets found for {modelpath!r}; falling back to "
        "WordHashTokenizer — token ids will NOT match t5-base, so text "
        "conditioning under released checkpoints is not faithful. Place "
        "spiece.model next to the checkpoint or set model.t5_path.")
    return WordHashTokenizer(vocab_size=vocab_size, max_length=max_length)


def focus_word_indices(
    word_maps: List[List[str]], focus_words: List[List[str]],
    max_indices: int = 8,
) -> Tuple[np.ndarray, np.ndarray]:
    """Token indices of focus words, padded to a static size.

    Mirrors convofusion.py:941-951; returns (indices (B, max_indices) int32,
    valid (B, max_indices) bool).
    """
    b = len(word_maps)
    idx = np.zeros((b, max_indices), np.int32)
    valid = np.zeros((b, max_indices), bool)
    for i in range(b):
        hits = []
        fw = focus_words[i] if i < len(focus_words) else []
        for word in fw:
            hits += [j for j, x in enumerate(word_maps[i]) if x == word]
        hits = hits[:max_indices]
        idx[i, : len(hits)] = hits
        valid[i, : len(hits)] = True
    return idx, valid
