"""Native SentencePiece support: ``spiece.model`` loader + unigram encoder.

The reference tokenizes with HF ``AutoTokenizer.from_pretrained('t5-base')``
(/root/reference/convofusion/models/architectures/t5.py:24-28), whose fast
path is a SentencePiece *unigram* model converted to the ``tokenizers``
pipeline.  This environment has no network and no ``sentencepiece`` package,
so we implement the two pieces natively:

* :func:`load_spiece` — a dependency-free protobuf wire-format parser for
  the ``sentencepiece.ModelProto`` serialized in ``spiece.model`` (pieces,
  scores, piece types, trainer/normalizer specs, precompiled charsmap).
* :func:`convert_t5_fast` — replicates ``transformers``'
  ``T5Converter.converted()`` (convert_slow_tokenizer.py) on top of the
  parsed proto, producing a ``PreTrainedTokenizerFast`` that is
  byte-identical in behavior to ``AutoTokenizer.from_pretrained('t5-base')``:
  Unigram model + reversed ``<extra_id_*>`` tail, Precompiled(nmt_nfkc)
  normalizer, Metaspace pre-tokenizer (prepend_scheme='always'),
  ``$A </s>`` template.  :func:`build_t5_tokenizer_object` needs only the
  ``tokenizers`` lib; :func:`convert_t5_fast` additionally wraps it in a
  ``transformers.PreTrainedTokenizerFast`` for padding/word_ids.
* :class:`UnigramEncoder` — a pure-python Viterbi unigram segmenter used as
  a last-resort fallback and as an independently testable implementation
  (oracle-tested against ``tokenizers.models.Unigram`` in
  tests/test_tokenizer.py).
"""
from __future__ import annotations

import struct
import unicodedata
from dataclasses import dataclass, field
from typing import Dict, List, Optional, Tuple

# sentencepiece_model.proto piece types
NORMAL, UNKNOWN, CONTROL, USER_DEFINED, UNUSED, BYTE = 1, 2, 3, 4, 5, 6


# --------------------------------------------------------------------------
# minimal protobuf wire-format reader (only what ModelProto needs)
# --------------------------------------------------------------------------

def _read_varint(data: bytes, pos: int) -> Tuple[int, int]:
    result = 0
    shift = 0
    while True:
        b = data[pos]
        pos += 1
        result |= (b & 0x7F) << shift
        if not b & 0x80:
            return result, pos
        shift += 7
        if shift > 63:
            raise ValueError("varint too long")


def _iter_fields(data: bytes):
    """Yield (field_number, wire_type, value) over a protobuf message.

    value is int for varint/fixed, bytes for length-delimited.
    """
    pos = 0
    n = len(data)
    while pos < n:
        tag, pos = _read_varint(data, pos)
        fno, wt = tag >> 3, tag & 7
        if wt == 0:                          # varint
            val, pos = _read_varint(data, pos)
        elif wt == 1:                        # 64-bit
            val = data[pos:pos + 8]
            pos += 8
        elif wt == 2:                        # length-delimited
            ln, pos = _read_varint(data, pos)
            val = data[pos:pos + ln]
            pos += ln
        elif wt == 5:                        # 32-bit
            val = data[pos:pos + 4]
            pos += 4
        else:
            raise ValueError(f"unsupported wire type {wt}")
        yield fno, wt, val


@dataclass
class SPModel:
    """Parsed subset of sentencepiece.ModelProto."""

    pieces: List[Tuple[str, float, int]] = field(default_factory=list)
    model_type: int = 1                      # 1 = unigram, 2 = bpe
    unk_id: int = 0
    byte_fallback: bool = False
    precompiled_charsmap: bytes = b""
    add_dummy_prefix: bool = True
    remove_extra_whitespaces: bool = True
    escape_whitespaces: bool = True

    def vocab_scores(self) -> List[Tuple[str, float]]:
        return [(p, s) for p, s, _ in self.pieces]


def parse_model_proto(data: bytes) -> SPModel:
    m = SPModel()
    for fno, wt, val in _iter_fields(data):
        if fno == 1 and wt == 2:             # repeated SentencePiece
            piece, score, ptype = "", 0.0, NORMAL
            for f2, w2, v2 in _iter_fields(val):
                if f2 == 1:
                    piece = v2.decode("utf-8")
                elif f2 == 2 and w2 == 5:
                    score = struct.unpack("<f", v2)[0]
                elif f2 == 3 and w2 == 0:
                    ptype = v2
            m.pieces.append((piece, score, ptype))
        elif fno == 2 and wt == 2:           # TrainerSpec
            for f2, w2, v2 in _iter_fields(val):
                if f2 == 3 and w2 == 0:
                    m.model_type = v2
                elif f2 == 35 and w2 == 0:
                    m.byte_fallback = bool(v2)
                elif f2 == 40 and w2 == 0:
                    m.unk_id = v2
        elif fno == 3 and wt == 2:           # NormalizerSpec
            for f2, w2, v2 in _iter_fields(val):
                if f2 == 2 and w2 == 2:
                    m.precompiled_charsmap = v2
                elif f2 == 3 and w2 == 0:
                    m.add_dummy_prefix = bool(v2)
                elif f2 == 4 and w2 == 0:
                    m.remove_extra_whitespaces = bool(v2)
                elif f2 == 5 and w2 == 0:
                    m.escape_whitespaces = bool(v2)
    if not m.pieces:
        raise ValueError("no pieces found — not a sentencepiece model?")
    return m


def load_spiece(path: str) -> SPModel:
    with open(path, "rb") as f:
        return parse_model_proto(f.read())


# --------------------------------------------------------------------------
# serializer (used by tests to build fixture models; also lets users dump
# a spiece.model equivalent for interchange)
# --------------------------------------------------------------------------

def _varint(n: int) -> bytes:
    out = bytearray()
    while True:
        b = n & 0x7F
        n >>= 7
        if n:
            out.append(b | 0x80)
        else:
            out.append(b)
            return bytes(out)


def _tag(fno: int, wt: int) -> bytes:
    return _varint((fno << 3) | wt)


def _len_field(fno: int, payload: bytes) -> bytes:
    return _tag(fno, 2) + _varint(len(payload)) + payload


def serialize_model_proto(m: SPModel) -> bytes:
    out = bytearray()
    for piece, score, ptype in m.pieces:
        sub = bytearray()
        sub += _len_field(1, piece.encode("utf-8"))
        sub += _tag(2, 5) + struct.pack("<f", score)
        if ptype != NORMAL:
            sub += _tag(3, 0) + _varint(ptype)
        out += _len_field(1, bytes(sub))
    trainer = bytearray()
    trainer += _tag(3, 0) + _varint(m.model_type)
    trainer += _tag(35, 0) + _varint(int(m.byte_fallback))
    trainer += _tag(40, 0) + _varint(m.unk_id)
    out += _len_field(2, bytes(trainer))
    norm = bytearray()
    if m.precompiled_charsmap:
        norm += _len_field(2, m.precompiled_charsmap)
    norm += _tag(3, 0) + _varint(int(m.add_dummy_prefix))
    norm += _tag(4, 0) + _varint(int(m.remove_extra_whitespaces))
    norm += _tag(5, 0) + _varint(int(m.escape_whitespaces))
    out += _len_field(3, bytes(norm))
    return bytes(out)


# --------------------------------------------------------------------------
# HF fast-tokenizer conversion (mirror of transformers' T5Converter)
# --------------------------------------------------------------------------

def build_t5_tokenizer_object(sp: SPModel, extra_ids: int = 100):
    """``tokenizers.Tokenizer`` equivalent of T5Converter.converted().

    Mirrors transformers/convert_slow_tokenizer.py (v4.57):
    SpmConverter.tokenizer/normalizer/pre_tokenizer/decoder (:579-673) with
    T5Converter.vocab/post_processor overrides (:1065-1079).
    """
    from tokenizers import AddedToken, Regex, Tokenizer, decoders
    from tokenizers import normalizers, pre_tokenizers, processors
    from tokenizers.models import Unigram

    if sp.model_type != 1:
        raise ValueError("only unigram spiece models are supported")

    vocab = sp.vocab_scores()
    vocab += [(f"<extra_id_{i}>", 0.0) for i in range(extra_ids - 1, -1, -1)]
    tok = Tokenizer(Unigram(vocab, unk_id=sp.unk_id,
                            byte_fallback=sp.byte_fallback))

    # control (type 3) pieces are special added tokens; user-defined (4) not
    spm_added = [(i, p, t == CONTROL) for i, (p, _, t) in
                 enumerate(sp.pieces) if t in (CONTROL, USER_DEFINED)]
    tok.add_tokens([
        AddedToken(piece, normalized=False, special=special)
        for _, piece, special in sorted(spm_added, key=lambda x: x[0])
    ])

    norms = [
        normalizers.Strip(left=False, right=True),
        normalizers.Replace(Regex(" {2,}"), "▁"),
    ]
    if sp.precompiled_charsmap:
        norms = [normalizers.Precompiled(sp.precompiled_charsmap)] + norms
    tok.normalizer = normalizers.Sequence(norms)
    tok.pre_tokenizer = pre_tokenizers.Metaspace(
        replacement="▁", prepend_scheme="always")
    tok.decoder = decoders.Metaspace(
        replacement="▁", prepend_scheme="always")

    eos_id = tok.token_to_id("</s>")
    if eos_id is None:
        raise ValueError("spiece model has no </s> piece")
    tok.post_processor = processors.TemplateProcessing(
        single=["$A", "</s>"], pair=["$A", "</s>", "$B", "</s>"],
        special_tokens=[("</s>", eos_id)])
    return tok


def convert_t5_fast(sp: SPModel, extra_ids: int = 100,
                    model_max_length: int = 200):
    """``PreTrainedTokenizerFast`` matching ``T5TokenizerFast('t5-base')``."""
    from transformers import PreTrainedTokenizerFast

    tok = build_t5_tokenizer_object(sp, extra_ids=extra_ids)
    return PreTrainedTokenizerFast(
        tokenizer_object=tok,
        model_max_length=model_max_length,
        eos_token="</s>", unk_token="<unk>", pad_token="<pad>",
        additional_special_tokens=[
            f"<extra_id_{i}>" for i in range(extra_ids)],
    )


# --------------------------------------------------------------------------
# pure-python unigram Viterbi (fallback / oracle-testable implementation)
# --------------------------------------------------------------------------

class UnigramEncoder:
    """Viterbi segmentation over a unigram piece vocabulary.

    Matches ``tokenizers.models.Unigram`` (and sentencepiece's
    ``EncodeAsIds``) on text whose characters are covered by the vocab;
    unknown characters map to ``unk_id`` with sentencepiece's 10.0 unknown
    penalty, and adjacent unknowns fuse into one token (fuse_unk).
    """

    UNK_PENALTY = 10.0

    def __init__(self, vocab_scores: List[Tuple[str, float]], unk_id: int):
        self.unk_id = unk_id
        self.ids: Dict[str, int] = {}
        self.scores: Dict[str, float] = {}
        for i, (piece, score) in enumerate(vocab_scores):
            if piece not in self.ids:
                self.ids[piece] = i
                self.scores[piece] = score
        self.max_piece_len = max(len(p) for p in self.ids)
        min_score = min(self.scores.values())
        self.unk_score = min_score - self.UNK_PENALTY

    def encode(self, text: str) -> List[int]:
        if not text:
            return []
        n = len(text)
        NEG = float("-inf")
        best = [NEG] * (n + 1)
        back: List[Optional[Tuple[int, int]]] = [None] * (n + 1)
        best[0] = 0.0
        for i in range(n):
            if best[i] == NEG:
                continue
            upper = min(n, i + self.max_piece_len)
            for j in range(i + 1, upper + 1):
                piece = text[i:j]
                pid = self.ids.get(piece)
                if pid is None:
                    continue
                s = best[i] + self.scores[piece]
                if s > best[j]:
                    best[j] = s
                    back[j] = (i, pid)
            # unknown single character fallback
            s = best[i] + self.unk_score
            if s > best[i + 1]:
                best[i + 1] = s
                back[i + 1] = (i, self.unk_id)
        ids: List[int] = []
        pos = n
        while pos > 0:
            i, pid = back[pos]
            ids.append(pid)
            pos = i
        ids.reverse()
        # fuse adjacent unknowns (sentencepiece fuse_unk behavior)
        fused: List[int] = []
        for pid in ids:
            if pid == self.unk_id and fused and fused[-1] == self.unk_id:
                continue
            fused.append(pid)
        return fused


def nmt_nfkc_normalize(text: str) -> str:
    """Approximation of sentencepiece's ``nmt_nfkc`` normalizer.

    Exact for ASCII (the BEAT/DnD transcript domain); for exotic unicode the
    precompiled-charsmap path via :func:`convert_t5_fast` should be used.
    Rules per sentencepiece/src/builder.cc NmtNfkc: drop control chars,
    map unicode spaces to ASCII space, then NFKC.
    """
    out = []
    for ch in text:
        cp = ord(ch)
        if cp in (0x0, 0xE, 0xF) or 0x1 <= cp <= 0x8 or 0x10 <= cp <= 0x1F \
                or 0x7F <= cp <= 0x9F or cp in (0x200B, 0x200E, 0x200F,
                                                0x202A, 0x202B, 0xFEFF,
                                                0xFFFD):
            continue
        if cp in (0x9, 0xA, 0xD) or unicodedata.category(ch) == "Zs":
            out.append(" ")
        else:
            out.append(ch)
    return unicodedata.normalize("NFKC", "".join(out))


# --------------------------------------------------------------------------
# synthetic t5-geometry model (asset-free benchmarking / serving)
# --------------------------------------------------------------------------

def synthesize_spiece_model(vocab_size: int = 32000) -> SPModel:
    """Build a t5-base-GEOMETRY synthetic unigram model.

    Same layout as t5-base's ``spiece.model`` — ``<pad>``/``</s>`` control
    pieces, ``<unk>`` unknown (``unk_id=2``), then ``▁``-prefixed word
    pieces, bare continuation subwords and single characters with
    Zipf-like log scores — so the *exact production tokenizer pipeline*
    (native proto parse -> ``tokenizers`` Unigram Viterbi over a 32k
    lattice -> subword token->word maps) can run in environments where the
    real asset is unavailable (zero egress).  Token ids do NOT match
    t5-base; this is for benchmarking/serving realism, not released-
    checkpoint fidelity (see models/tokenizer.py resolution order).
    """
    import math
    import string

    pieces: List[Tuple[str, float, int]] = [
        ("<pad>", 0.0, CONTROL), ("</s>", 0.0, CONTROL),
        ("<unk>", 0.0, UNKNOWN)]
    seen = {p for p, _, _ in pieces}

    def add(piece: str, score: float) -> None:
        if piece and piece not in seen and len(pieces) < vocab_size:
            seen.add(piece)
            pieces.append((piece, score, NORMAL))

    # coverage tier: whitespace marker, single chars (bare + word-initial)
    add("▁", -2.0)
    chars = (string.ascii_lowercase + string.ascii_uppercase +
             string.digits + "',.!?-:;\"()&%$#@/")
    for c in chars:
        add(c, -18.0)
        add("▁" + c, -17.0)

    # frequent-subword tier: common English suffix/prefix continuations
    affixes = ["s", "ing", "ed", "er", "ly", "tion", "ment", "ness", "es",
               "able", "est", "al", "ous", "ive", "ity", "ant", "ence",
               "ish", "ism", "ist", "ful", "less", "en", "y", "le", "re",
               "un", "in", "on", "an", "or", "ar", "th", "nd", "nt", "st",
               "ck", "ll", "ng", "rd"]
    for i, a in enumerate(affixes):
        add(a, -4.0 - 0.05 * i)

    # word tier: syllable-composed pieces in deterministic Zipf order
    onsets = ["", "b", "c", "d", "f", "g", "h", "j", "k", "l", "m", "n",
              "p", "r", "s", "t", "v", "w", "y", "z", "br", "ch", "cl",
              "cr", "dr", "fl", "fr", "gr", "pl", "pr", "sh", "sl", "sp",
              "st", "th", "tr"]
    nuclei = ["a", "e", "i", "o", "u", "ai", "ea", "ee", "io", "ou"]
    codas = ["", "b", "d", "g", "k", "l", "m", "n", "p", "r", "s", "t",
             "ck", "ll", "ng", "nt", "rd", "rk", "st", "nce"]

    def syllables():
        for n in nuclei:
            for o in onsets:
                for c in codas:
                    yield o + n + c

    rank = 0
    one_syll = list(syllables())
    for w in one_syll:
        add("▁" + w, -3.0 - 0.9 * math.log1p(rank))
        rank += 1
        if len(pieces) >= vocab_size:
            break
    # two-syllable tier (cartesian, deterministic); fills to 32k
    if len(pieces) < vocab_size:
        for w1 in one_syll:
            for w2 in one_syll:
                add("▁" + w1 + w2, -8.0 - 0.9 * math.log1p(rank))
                add(w2, -9.0 - 0.9 * math.log1p(rank))
                rank += 1
                if len(pieces) >= vocab_size:
                    break
            if len(pieces) >= vocab_size:
                break

    return SPModel(pieces=pieces, model_type=1, unk_id=2)


def write_synthetic_spiece(path: str, vocab_size: int = 32000) -> str:
    """Serialize :func:`synthesize_spiece_model` to ``path`` (idempotent:
    an existing non-empty file is kept).  Returns ``path``."""
    import os

    if not (os.path.isfile(path) and os.path.getsize(path) > 0):
        os.makedirs(os.path.dirname(path) or ".", exist_ok=True)
        data = serialize_model_proto(
            synthesize_spiece_model(vocab_size))
        tmp = path + ".tmp"
        with open(tmp, "wb") as f:
            f.write(data)
        os.replace(tmp, path)
    return path
