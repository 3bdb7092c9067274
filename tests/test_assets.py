"""Asset-drop contract (utils/assets.py): resolution, manifest
freeze/verify, spiece auto-discovery, and T5-weight auto-injection."""
import json
import os

import numpy as np
import pytest

from convofusion_tpu.utils import assets as A


def test_assets_root_env_override(tmp_path, monkeypatch):
    monkeypatch.setenv(A.ENV_VAR, str(tmp_path))
    assert A.assets_root() == str(tmp_path)
    monkeypatch.delenv(A.ENV_VAR)
    assert A.assets_root().endswith(os.sep + "assets")


def test_asset_path_and_manifest_roundtrip(tmp_path, monkeypatch):
    monkeypatch.setenv(A.ENV_VAR, str(tmp_path))
    d = tmp_path / "t5-base"
    d.mkdir()
    (d / "spiece.model").write_bytes(b"not a real model")
    assert A.asset_path("t5-base/spiece.model") == str(d / "spiece.model")
    assert A.asset_path("eval/last_499.bin") is None

    m = A.freeze()
    assert "t5-base/spiece.model" in m
    assert m["t5-base/spiece.model"]["bytes"] == 16
    res = A.verify()
    assert res == {"t5-base/spiece.model": "ok"}

    # tamper -> changed; extra file -> untracked; delete -> missing
    (d / "spiece.model").write_bytes(b"tampered bytes!!")
    (tmp_path / "stray.txt").write_text("x")
    res = A.verify()
    assert res["t5-base/spiece.model"] == "changed"
    assert res["stray.txt"] == "untracked"
    os.remove(d / "spiece.model")
    assert A.verify()["t5-base/spiece.model"] == "missing"


def test_cli_status_and_verify_exit_codes(tmp_path, monkeypatch, capsys):
    monkeypatch.setenv(A.ENV_VAR, str(tmp_path))
    assert A.main([]) == 0
    out = capsys.readouterr().out
    assert "t5-base/spiece.model" in out and "absent" in out
    assert A.main(["--verify"]) == 2  # no manifest yet
    (tmp_path / "f.bin").write_bytes(b"abc")
    assert A.main(["--freeze"]) == 0
    assert A.main(["--verify"]) == 0
    (tmp_path / "f.bin").write_bytes(b"xyz")
    assert A.main(["--verify"]) == 1


def test_find_spiece_uses_asset_drop(tmp_path, monkeypatch, spiece_path):
    import shutil

    from convofusion_tpu.models.tokenizer import find_spiece

    monkeypatch.setenv(A.ENV_VAR, str(tmp_path))
    assert find_spiece("t5-base") is None
    d = tmp_path / "t5-base"
    d.mkdir()
    shutil.copy(spiece_path, d / "spiece.model")
    assert find_spiece("t5-base") == str(d / "spiece.model")
    # a HF-style org/name also resolves to the basename slot
    assert find_spiece("google-t5/t5-base") == str(d / "spiece.model")
    assert find_spiece("google/t5-base") == str(d / "spiece.model")


@pytest.fixture
def spiece_path(tmp_path_factory):
    from convofusion_tpu.models.sentencepiece import write_synthetic_spiece

    p = tmp_path_factory.mktemp("sp") / "spiece.model"
    return write_synthetic_spiece(str(p), vocab_size=400)


def _toy_t5_torch_sd(rng, vocab=1000, d_model=32, d_ff=64, heads=4,
                     d_kv=8, layers=2):
    import torch

    def t(*shape):
        return torch.from_numpy(
            rng.normal(size=shape).astype(np.float32))

    inner = heads * d_kv
    sd = {"shared.weight": t(vocab, d_model),
          "encoder.embed_tokens.weight": t(vocab, d_model),
          "encoder.final_layer_norm.weight": t(d_model)}
    for i in range(layers):
        p = f"encoder.block.{i}.layer"
        sd[f"{p}.0.SelfAttention.q.weight"] = t(inner, d_model)
        sd[f"{p}.0.SelfAttention.k.weight"] = t(inner, d_model)
        sd[f"{p}.0.SelfAttention.v.weight"] = t(inner, d_model)
        sd[f"{p}.0.SelfAttention.o.weight"] = t(d_model, inner)
        sd[f"{p}.0.layer_norm.weight"] = t(d_model)
        sd[f"{p}.1.DenseReluDense.wi.weight"] = t(d_ff, d_model)
        sd[f"{p}.1.DenseReluDense.wo.weight"] = t(d_model, d_ff)
        sd[f"{p}.1.layer_norm.weight"] = t(d_model)
        if i == 0:
            sd[f"{p}.0.SelfAttention.relative_attention_bias.weight"] = \
                t(32, heads)
    return sd


def test_maybe_load_t5_assets_injects_matching_geometry(
        tmp_path, monkeypatch):
    import torch

    from convofusion_tpu.config.testing import tiny_config
    from convofusion_tpu.models.convofusion import Convofusion
    from convofusion_tpu.train.checkpoint import maybe_load_t5_assets

    monkeypatch.setenv(A.ENV_VAR, str(tmp_path))
    import jax

    model = Convofusion(tiny_config("diffusion"))
    params = model.init_params(jax.random.PRNGKey(0))

    # no asset: identity
    assert maybe_load_t5_assets(params) is params

    d = tmp_path / "t5-base"
    d.mkdir()
    rng = np.random.default_rng(0)
    sd = _toy_t5_torch_sd(rng)  # matches tiny_config's text encoder
    torch.save(sd, d / "pytorch_model.bin")
    out = maybe_load_t5_assets(params)
    got = out["text_encoder"]["text_model"]["embed_tokens"]["embedding"]
    np.testing.assert_array_equal(
        np.asarray(got), sd["encoder.embed_tokens.weight"].numpy())
    # untouched subtrees are shared, not copied
    assert out["denoiser"] is params["denoiser"]

    # geometry mismatch: warn + no-op
    sd_bad = _toy_t5_torch_sd(rng, d_model=16)
    torch.save(sd_bad, d / "pytorch_model.bin")
    with pytest.warns(UserWarning, match="skipping injection"):
        out2 = maybe_load_t5_assets(params)
    assert out2 is params
