"""Tokenizer stack tests.

Covers the native spiece.model loader + T5 fast-pipeline conversion
(models/sentencepiece.py), the pure-python unigram Viterbi vs the
``tokenizers`` Rust oracle, the full reference token contract
(bos/eos wrapping, trailing </s>, subword word-maps — reference
t5.py:28-30,93,104-109), and the make_tokenizer resolution order.
"""
import os
import random

import numpy as np
import pytest

from convofusion_tpu.models.sentencepiece import (
    CONTROL,
    NORMAL,
    UNKNOWN,
    SPModel,
    UnigramEncoder,
    load_spiece,
    nmt_nfkc_normalize,
    serialize_model_proto,
)
from convofusion_tpu.models.tokenizer import (
    UNCOND_TEXT,
    SentencePieceTokenizer,
    WordHashTokenizer,
    make_tokenizer,
)

CHARS = "abcdefghijklmnopqrstuvwxyz',.!?-"


def toy_model() -> SPModel:
    """t5-style layout: <pad>/<//s> control, <unk> unknown, then pieces."""
    pieces = [("<pad>", 0.0, CONTROL), ("</s>", 0.0, CONTROL),
              ("<unk>", 0.0, UNKNOWN)]
    subwords = ["▁", "▁the", "▁hello", "▁world", "▁so", "▁that", "he",
                "llo", "wor", "ld", "th", "at", "ing", "▁go", "od"]
    pieces += [(s, -(i + 1) / 2, NORMAL) for i, s in enumerate(subwords)]
    pieces += [("▁" + c, -20.0, NORMAL) for c in CHARS]
    pieces += [(c, -21.0, NORMAL) for c in CHARS]
    return SPModel(pieces=pieces, model_type=1, unk_id=2)


@pytest.fixture(scope="module")
def spiece_path(tmp_path_factory):
    p = tmp_path_factory.mktemp("sp") / "spiece.model"
    p.write_bytes(serialize_model_proto(toy_model()))
    return str(p)


def test_proto_round_trip(spiece_path):
    m = toy_model()
    m2 = load_spiece(spiece_path)
    assert m2.pieces == m.pieces
    assert m2.unk_id == 2 and m2.model_type == 1
    assert not m2.byte_fallback


def test_full_contract_matches_reference_shape(spiece_path):
    """End-to-end contract the reference model relies on (t5.py:93-109)."""
    tok = SentencePieceTokenizer(spiece_path, max_length=32, extra_ids=4)
    texts = ["hello world", "so that the good thing", UNCOND_TEXT]
    tb = tok(texts, pad_to=16)
    inner = tok.tok
    n_pieces = len(toy_model().pieces)

    # special-token ids: t5 layout + runtime additions (t5.py:30) — for
    # real t5-base these are 0/1/2/32100/32101
    assert inner.convert_tokens_to_ids("<pad>") == 0
    assert inner.convert_tokens_to_ids("</s>") == 1
    assert inner.convert_tokens_to_ids("<unk>") == 2
    assert inner.convert_tokens_to_ids("<extra_id_0>") == n_pieces + 3
    assert inner.convert_tokens_to_ids("<eos>") == n_pieces + 4
    assert inner.convert_tokens_to_ids("<bos>") == n_pieces + 5

    row0 = inner.convert_ids_to_tokens(tb.input_ids[0])
    assert row0[:5] == ["<bos>", "▁hello", "▁world", "<eos>", "</s>"]
    assert set(row0[5:]) == {"<pad>"}
    assert tb.attention_mask[0].sum() == 5

    # word ids: <bos> is word 0, content words +1, template </s> None
    assert tb.word_ids[0][:5] == [0, 1, 2, 3, None]
    # subwords share the word index ("good" -> ▁go od, "thing" -> 3 pieces)
    assert tb.word_ids[1][:10] == [0, 1, 2, 3, 4, 4, 5, 5, 5, 6]

    # word maps index into the whitespace-split wrapped text (t5.py:77-86)
    maps = tb.word_map(tok.wrapped_texts(texts))
    assert maps[0][:5] == ["<bos>", "hello", "world", "<eos>", ""]
    assert maps[1][4:6] == ["good", "good"]

    # uncond text is NOT bos/eos-wrapped (t5.py:93) but still gets </s>
    row2 = inner.convert_ids_to_tokens(tb.input_ids[2])
    assert "<bos>" not in row2 and "<eos>" not in row2
    assert row2[tb.attention_mask[2].sum() - 1] == "</s>"


def test_pure_viterbi_matches_tokenizers_oracle():
    from tokenizers import Tokenizer
    from tokenizers.models import Unigram

    rng = random.Random(0)
    chars = "abcdef"
    vocab = [("<unk>", 0.0)]
    seen = {"<unk>"}
    for _ in range(200):
        p = "".join(rng.choice(chars) for _ in range(rng.randint(1, 4)))
        if p not in seen:
            seen.add(p)
            vocab.append((p, -rng.random() * 8 - 0.1))
    for c in chars + "▁":
        if c not in seen:
            seen.add(c)
            vocab.append((c, -10.0 - rng.random()))

    oracle = Tokenizer(Unigram(vocab, unk_id=0, byte_fallback=False))
    mine = UnigramEncoder(vocab, unk_id=0)
    for _ in range(300):
        # 'x'/'z' are absent from the vocab: exercises unk + fuse_unk
        s = "".join(rng.choice(chars + "xz")
                    for _ in range(rng.randint(1, 30)))
        assert oracle.encode(s, add_special_tokens=False).ids == \
            mine.encode(s), s


def test_nmt_nfkc_ascii_identity_and_space_rules():
    assert nmt_nfkc_normalize("hello world!") == "hello world!"
    assert nmt_nfkc_normalize("a\tb\nc") == "a b c"
    assert nmt_nfkc_normalize("a b​c") == "a bc"
    assert nmt_nfkc_normalize("ﬁx") == "fix"  # NFKC ligature fold


def test_make_tokenizer_fallback_warns(tmp_path):
    with pytest.warns(UserWarning, match="NOT match t5-base"):
        tok = make_tokenizer(str(tmp_path / "nope"), max_length=16)
    assert isinstance(tok, WordHashTokenizer)


def test_make_tokenizer_prefers_spiece(spiece_path, tmp_path):
    import shutil

    d = tmp_path / "model_dir"
    d.mkdir()
    shutil.copy(spiece_path, d / "spiece.model")
    tok = make_tokenizer(str(d), max_length=16)
    assert isinstance(tok, SentencePieceTokenizer)


@pytest.mark.parametrize("texts", [
    ["hello world", "so that the good thing goes well", UNCOND_TEXT],
])
def test_t5_base_parity_if_cached(texts):
    """ids + word maps identical to HF t5-base (skips without local assets).

    Reference contract: t5.py:28 (AutoTokenizer t5-base), :30 (added
    special tokens), :93 (wrapping), :104-109 (word maps).
    """
    from convofusion_tpu.models.tokenizer import HFTokenizer, find_spiece
    from convofusion_tpu.utils.assets import assets_root

    hf = None
    # documented drop path first (utils/assets.py), then the HF cache
    for src in (os.path.join(assets_root(), "t5-base"), "t5-base"):
        try:
            hf = HFTokenizer(src, max_length=200)
            break
        except Exception:
            continue
    if hf is None:
        pytest.skip("no t5-base tokenizer asset (drop per "
                    "utils/assets.py to activate)")
    spiece = find_spiece("t5-base")
    if spiece is None:
        pytest.skip("no local t5-base spiece.model (drop per "
                    "utils/assets.py to activate)")
    ours = SentencePieceTokenizer(spiece, max_length=200)
    a = hf(texts, pad_to=48)
    b = ours(texts, pad_to=48)
    np.testing.assert_array_equal(a.input_ids, b.input_ids)
    np.testing.assert_array_equal(a.attention_mask, b.attention_mask)
    assert a.word_ids == b.word_ids


@pytest.mark.slow
def test_t5_base_weight_parity_if_assets():
    """Native JAX T5 trunk vs transformers over REAL t5-base weights
    (skips without the asset drop; see utils/assets.py for the layout).

    Closes the only remaining unverified link of the text-conditioning
    chain: the toy/production-geometry goldens (test_models_parity.py,
    test_production_parity.py) already pin the math on random weights;
    this pins it on the released ones."""
    from convofusion_tpu.utils.assets import assets_root

    t5_dir = os.path.join(assets_root(), "t5-base")
    if not (os.path.isfile(os.path.join(t5_dir, "pytorch_model.bin"))
            or os.path.isfile(os.path.join(t5_dir, "model.safetensors"))):
        pytest.skip("no t5-base weight asset (drop per utils/assets.py "
                    "to activate)")
    import jax.numpy as jnp
    import torch
    from transformers import T5EncoderModel

    from convofusion_tpu.models.t5 import (
        T5EncoderStack,
        t5_params_from_torch,
    )

    ref = T5EncoderModel.from_pretrained(t5_dir).eval()
    sd = {k: v.detach().numpy() for k, v in ref.state_dict().items()}
    stack = T5EncoderStack(vocab_size=32128, d_model=768, d_kv=64,
                           num_heads=12, d_ff=3072, num_layers=12,
                           dtype=jnp.float32)
    params = {"params": t5_params_from_torch(sd, num_layers=12)}

    rng = np.random.default_rng(0)
    ids = rng.integers(4, 32000, size=(2, 48)).astype(np.int32)
    mask = np.ones_like(ids)
    mask[1, 40:] = 0
    with torch.no_grad():
        want = ref(input_ids=torch.from_numpy(ids).long(),
                   attention_mask=torch.from_numpy(mask).long()
                   ).last_hidden_state.numpy()
    got = np.asarray(stack.apply(params, jnp.asarray(ids),
                                 jnp.asarray(mask)))
    np.testing.assert_allclose(got, want, atol=2e-4, rtol=2e-3)


def test_model_uses_hash_tokenizer_for_tiny_vocab():
    """tiny_config has a non-t5 vocab: ids must stay inside the embedding
    (out-of-range ids NaN silently on CPU)."""
    from convofusion_tpu.config.testing import tiny_config
    from convofusion_tpu.models.convofusion import Convofusion

    model = Convofusion(tiny_config("diffusion"))
    assert isinstance(model.tokenizer, WordHashTokenizer)
    vocab = model.tokenizer.vocab_size
    tb = model.tokenize(["hello world", UNCOND_TEXT])
    assert tb.input_ids.max() < vocab


def test_synthetic_spiece_runs_production_pipeline(tmp_path):
    """The t5-geometry synthetic model (bench.py --tokenizer auto in
    asset-free environments) must drive the exact production pipeline:
    32k unique pieces, subword splitting, trailing </s>, bos/eos wrap,
    subword word maps, and ids inside the 32128-row embedding."""
    from convofusion_tpu.models.sentencepiece import (
        synthesize_spiece_model,
        write_synthetic_spiece,
    )

    m = synthesize_spiece_model()
    assert len(m.pieces) == 32000 and m.unk_id == 2
    assert len({p for p, _, _ in m.pieces}) == 32000

    p = write_synthetic_spiece(str(tmp_path / "spiece.model"))
    tok = SentencePieceTokenizer(p, max_length=64)
    texts = ["hello world this is a benchmark", UNCOND_TEXT]
    tb = tok(texts, pad_to=64)
    assert tb.input_ids.shape == (2, 64)
    assert 0 < int(tb.input_ids.max()) < 32128

    n = int(tb.attention_mask[0].sum())
    eos = tok.tok.convert_tokens_to_ids("</s>")
    bos = tok.tok.convert_tokens_to_ids("<bos>")
    assert tb.input_ids[0, n - 1] == eos          # T5 trailing </s>
    assert tb.input_ids[0, 0] == bos              # "<bos> {text} <eos>"
    # 6 content words + bos/eos wrap -> word indices 0..7, with at least
    # one word split across >1 subword piece (vocab has no whole-word
    # piece for every english word by construction)
    wids = [w for w in tb.word_ids[0] if w is not None]
    assert max(wids) == 7
    assert len(wids) > 8
    # uncond row: unwrapped (reference t5.py:93) -> strictly shorter
    assert int(tb.attention_mask[1].sum()) < n

    # idempotent writer: second call must not rebuild
    before = (tmp_path / "spiece.model").stat().st_mtime_ns
    write_synthetic_spiece(str(tmp_path / "spiece.model"))
    assert (tmp_path / "spiece.model").stat().st_mtime_ns == before
