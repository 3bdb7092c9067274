"""Unbounded synthesis: windowed rollout with latent inpainting + root
stitching, plus the process_text window extraction."""
import numpy as np
import pytest
import jax
import jax.numpy as jnp

from convofusion_tpu.cli.unbounded import process_text, rollout
from convofusion_tpu.config.testing import tiny_config
from convofusion_tpu.data.synthetic import (
    synthetic_melspec,
    synthetic_motion,
    synthetic_texts,
)
from convofusion_tpu.models.convofusion import Convofusion


def test_process_text_window_selection():
    segs = [[[[0.0, 1.0], "hello"], [[1.2, 2.0], "there"],
             [[6.0, 7.0], "later"]]]
    # window [0, 5.12): first two words only
    out = process_text(segs, 0.0, 5.12)
    assert out == ["hello there"]
    # uncond rows pass through
    assert process_text(["-" * 10], 0.0, 5.12) == ["-" * 10]
    assert process_text([None], 0.0, 5.12) == [""]


def test_preseq_inpainting_keeps_overlap_tokens():
    """With preseq given, the first 8 latent tokens of the result must end
    near the preseq values (at t=0 add_noise is ~identity)."""
    cfg = tiny_config("diffusion")
    model = Convofusion(cfg)
    params = model.init_params(jax.random.PRNGKey(0))
    from convofusion_tpu.data.synthetic import (
        prepare_arrays,
        synthetic_raw_batch,
    )

    raw = synthetic_raw_batch(0, 2)
    batch, _, _ = prepare_arrays(model, raw)
    preseq = jnp.asarray(
        np.random.default_rng(1).normal(size=(2, 8, 32)).astype(
            np.float32)) * 0.5
    _, latents, _ = model.sample(
        params, batch, jax.random.PRNGKey(2), num_inference_steps=4,
        preseq=preseq)
    # alphas_cumprod[0] ~= 0.99915 -> overlap tokens ~= preseq after the
    # final overwrite + one scheduler step from t=0
    overlap = np.asarray(latents[:, :8, :])
    assert np.abs(overlap - np.asarray(preseq)).mean() < 0.2
    # the free half must NOT match preseq
    free = np.asarray(latents[:, 8:, :])
    assert np.abs(free - np.asarray(preseq)).mean() > 0.2


def test_rollout_windows_and_root_stitching(tmp_path):
    cfg = tiny_config("diffusion")
    model = Convofusion(cfg)
    params = model.init_params(jax.random.PRNGKey(0))

    rng = np.random.default_rng(3)
    b, n_parts = 1, 2
    frames = 128 * n_parts
    n_samples = int(frames / 25 * 16000)
    batch = {
        "motion_lsn": synthetic_motion(rng, b, frames),
        "motion_spk": synthetic_motion(rng, b, frames),
        "melspec_lsn": synthetic_melspec(
            rng, b, int(frames / 25 * 16000 // 512 + 1)),
        "melspec_spk": synthetic_melspec(
            rng, b, int(frames / 25 * 16000 // 512 + 1)),
        "active_passive_lsn": rng.integers(
            0, 2, (b, 8 * n_parts)).astype(np.int32),
        "lsn_id": np.asarray([3], np.int32),
        "audio_lsn": rng.normal(size=(b, n_samples)).astype(np.float32),
        "audio_spk": rng.normal(size=(b, n_samples)).astype(np.float32),
        "seg_lsn": [[[[0.0, 1.0], "hello"], [[5.5, 6.5], "world"]]],
        "seg_spk": [[[[2.0, 3.0], "speaking"]]],
        "name": ["long/sample"],
        "text_spk": ["speaking"],
        "spk_name": ["anne"],
        "lsn_name": ["ben"],
    }
    outs = rollout(model, params, batch, jax.random.PRNGKey(4),
                   num_inference_steps=3, save_dir=str(tmp_path))
    assert len(outs) == 2 * n_parts - 1
    for o in outs:
        assert o.shape == (b, 128, 189)
        assert np.isfinite(o).all()
    # root xz continuity: window k frame 0 == window k-1 frame 64
    for k in range(1, len(outs)):
        np.testing.assert_allclose(
            outs[k][:, 0, [0, 2]], outs[k - 1][:, 64, [0, 2]], atol=1e-4)
    # artifacts per window
    import os

    dirs = [d for d, _, files in os.walk(tmp_path) if "pred.npy" in files]
    assert len(dirs) == 2 * n_parts - 1


def test_select_focus_words_modes():
    """Focus selection parity surface (convofusion.py:862-906)."""
    from convofusion_tpu.cli.focus import select_focus_words

    assert select_focus_words("no", ["anything"]) == []

    # semantic: keyword words from BEAT sem_info rows, non-str filtered
    sem = [[{"word": "dragons", "name": "semantic"},
            {"word": float("nan"), "name": "beat"}],
           []]
    out = select_focus_words("semantic", ["t1", "t2"], sem_info=sem)
    assert out == [["dragons"], []]

    # random: a <=3-word phrase window of content words
    import random as _r
    _r.seed(0)
    out = select_focus_words(
        "random", ["the brave knights fight mighty dragons"])
    assert len(out) == 1 and 1 <= len(out[0]) <= 3
    for w in out[0]:
        assert w in "the brave knights fight mighty dragons".split()

    import pytest as _pytest
    with _pytest.raises(ValueError):
        select_focus_words("bogus", ["x"])


def test_rollout_weg_overrides_parameters_with_reference_hardcodes(
        monkeypatch):
    """The reference rollout hardcodes its WEG constants instead of
    reading cfg.model.weg_parameters (unbounded_synthesis.py:83-88); the
    override is threaded statically into sample() — the model's own
    parameters must stay untouched.  Unlike the regular sampler's
    collapsed schedule, the forecast re-creates scale_range inside the
    loop, so the rollout uses the true 'linspace' decay."""
    from convofusion_tpu.cli.unbounded import ROLLOUT_WEG_PARAMETERS

    cfg = tiny_config("diffusion")
    model = Convofusion(cfg)
    params = model.init_params(jax.random.PRNGKey(0))
    cfg_params_before = dict(model.weg_parameters)
    assert cfg_params_before.get("scale_factor") != 100

    seen = []

    def fake_sample(params, arrays, k, **kw):
        seen.append(kw.get("weg_params"))
        b = arrays["lsn_id"].shape[0]
        lat = jnp.zeros((b, 16, cfg.model.latent_dim[-1]))
        return jnp.zeros((b, 128, 189)), lat, {}

    monkeypatch.setattr(model, "sample", fake_sample)

    rng = np.random.default_rng(5)
    b, n_parts = 1, 1
    frames = 128 * n_parts
    n_samples = int(frames / 25 * 16000)
    batch = {
        "motion_lsn": synthetic_motion(rng, b, frames),
        "motion_spk": synthetic_motion(rng, b, frames),
        "melspec_lsn": synthetic_melspec(
            rng, b, int(frames / 25 * 16000 // 512 + 1)),
        "active_passive_lsn": rng.integers(
            0, 2, (b, 8 * n_parts)).astype(np.int32),
        "lsn_id": np.asarray([3], np.int32),
        "audio_lsn": rng.normal(size=(b, n_samples)).astype(np.float32),
        "audio_spk": rng.normal(size=(b, n_samples)).astype(np.float32),
        "seg_lsn": [[[[0.0, 1.0], "brave"], [[1.5, 2.5], "dragons"]]],
        "seg_spk": [[[[2.0, 3.0], "speaking"]]],
        "name": ["long/weg"],
        "text_spk": ["speaking"],
    }
    rollout(model, params, batch, jax.random.PRNGKey(6),
            num_inference_steps=2, weg_type="random")
    assert seen and all(wp == ROLLOUT_WEG_PARAMETERS for wp in seen)
    wp = ROLLOUT_WEG_PARAMETERS
    assert wp["scale_factor"] == 100
    assert wp["scale_range"] == [1.0, 0.5]
    assert wp["thresholds"] == {0: 0.05, 200: 0.4, 400: 0.6, 600: 0.8}
    assert wp["max_iter_to_alter"] == 800
    assert wp["max_refinement_steps"] == 300
    assert wp["scale_schedule"] == "linspace"
    # the model's config-derived parameters are untouched
    assert model.weg_parameters == cfg_params_before
