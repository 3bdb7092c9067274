"""Eval suite tests: FID net parity vs the reference torch module, metric
sanity, onset pipeline, and the end-to-end result-dir evaluation."""
import os

import numpy as np
import pytest

torch = pytest.importorskip("torch")


def test_fidnet_matches_torch(reference_path, tmp_path):
    import sys

    sys.path.insert(0, os.path.join(reference_path, "quant_eval"))
    from motion_autoencoder import HalfEmbeddingNet as TorchNet

    from convofusion_tpu.eval.fid_net import (
        HalfEmbeddingNet,
        load_torch_fidnet,
    )

    torch.manual_seed(0)
    net = TorchNet(pose_length=128, pose_dim=189, feature_length=32)
    net.eval()
    # randomize BN running stats so inference-mode parity is meaningful
    for m in net.modules():
        if isinstance(m, torch.nn.BatchNorm1d):
            m.running_mean.uniform_(-0.5, 0.5)
            m.running_var.uniform_(0.5, 1.5)
    x = torch.randn(3, 128, 189)
    with torch.no_grad():
        feat_t = net(x)

    ckpt = tmp_path / "fid.bin"
    torch.save({"model_state": net.state_dict()}, ckpt)
    params = load_torch_fidnet(str(ckpt))
    ours = HalfEmbeddingNet(128, 189, 32)
    import jax.numpy as jnp

    feat_j = np.asarray(ours(params, jnp.asarray(x.numpy())))
    np.testing.assert_allclose(feat_j, feat_t.numpy(), rtol=2e-3, atol=2e-3)


def test_frechet_distance_properties():
    from convofusion_tpu.eval.metrics import frechet_distance

    rng = np.random.default_rng(0)
    a = rng.normal(size=(500, 16))
    b = rng.normal(size=(500, 16))
    same = frechet_distance(a, a.copy())
    diff = frechet_distance(a, b + 5.0)
    assert abs(same) < 1e-6
    assert diff > 20.0


def test_srgr_and_l1div_and_jitter():
    from convofusion_tpu.eval.metrics import (
        L1div,
        SRGR,
        calculate_jitter,
    )

    rng = np.random.default_rng(1)
    gt = rng.normal(size=(128, 189)).astype(np.float32)
    sem = np.full(128, 0.165)
    srgr = SRGR(0.3, 63)
    rate = srgr.run(gt.copy(), gt.copy(), sem)
    assert rate == pytest.approx(1.0, rel=1e-5)  # perfect match -> 1

    l1 = L1div()
    l1.run(np.ones((10, 5), np.float32))
    assert l1.avg() == 0.0  # constant motion -> zero divergence

    j = calculate_jitter(gt.reshape(128, 63, 3), gt.reshape(128, 63, 3))
    assert j == 0.0


def test_onset_pipeline_detects_beats():
    from convofusion_tpu.eval.onsets import audio_beats

    sr = 16000
    t = np.arange(int(5.12 * sr)) / sr
    # 2 Hz amplitude bursts -> clear onsets
    env = (np.sin(2 * np.pi * 2.0 * t) > 0.6).astype(np.float32)
    y = env * np.sin(2 * np.pi * 330 * t).astype(np.float32)
    onset_raw, onset_bt, onset_bt_rms = audio_beats(y, sr)
    assert onset_raw is not None and len(onset_raw) >= 5
    assert (onset_bt_rms <= onset_raw).all()

    silent = np.zeros(sr, np.float32)
    assert audio_beats(silent, sr)[0] is None


def test_alignment_gahr_perfect_and_offset():
    from convofusion_tpu.eval.metrics import Alignment

    al = Alignment(sigma=0.3, order=10)
    a = np.array([1.0, 2.0, 3.0])
    assert al.gahr(a, a, 0.3) == pytest.approx(1.0)
    far = al.gahr(a, a + 10.0, 0.3)
    assert far < 0.1


@pytest.mark.slow
def test_evaluate_results_over_dump(tmp_path):
    from convofusion_tpu.data.audio import save_wav
    from convofusion_tpu.eval.run import evaluate_results

    rng = np.random.default_rng(2)
    for i in range(3):
        d = tmp_path / "exp" / f"sample_{i}"
        d.mkdir(parents=True)
        gt = rng.normal(scale=0.1, size=(128, 63, 3)).astype(np.float32)
        gt[:, :, 1] += 1.0
        pred = gt + rng.normal(scale=0.02, size=gt.shape).astype(
            np.float32)
        np.save(d / "gt.npy", gt)
        np.save(d / "pred.npy", pred)
        np.save(d / "sem_lsn.npy", np.full(128, 0.165, np.float32))
        t = np.arange(int(5.12 * 16000)) / 16000
        env = (np.sin(2 * np.pi * 1.5 * t) > 0.5).astype(np.float32)
        save_wav(str(d / "lsn_audio.wav"),
                 env * np.sin(2 * np.pi * 220 * t), 16000)

    out = evaluate_results(str(tmp_path), "monadic", fidnet_path=None)
    assert out["n_samples"] == 3
    assert out["alignment"] is not None and 0 < out["alignment"] <= 1
    assert out["jitter"] > 0
    assert out["l1div"] > 0
    assert "srgr" in out

    # without released FID-net weights the value must be unmistakably
    # marked as non-comparable (random-init features)
    with pytest.warns(UserWarning, match="RANDOM-INIT"):
        out_d = evaluate_results(str(tmp_path), "dyadic", fidnet_path=None)
    assert "fid" not in out_d
    assert np.isfinite(out_d["fid_random_init_features"])


def test_onset_detect_windows_use_librosa_default_sr():
    """The reference calls librosa.onset.onset_detect with NO sr
    (metric_eval.py:112-114), so peak-pick windows derive from the
    librosa default 22050 (wait=1, pre_avg=4, post_avg=5) even though
    the envelope was computed at 16 kHz.  wait=1 suppresses an onset one
    frame after another; sr=16000 windows (wait=0) would keep both."""
    import numpy as np

    from convofusion_tpu.eval.onsets import onset_detect

    env = np.zeros(64)
    env[[10, 11, 30]] = 1.0
    onsets = onset_detect(env)
    assert 10 in onsets and 30 in onsets
    assert 11 not in onsets


def test_frechet_distance_ill_conditioned_sentinel(monkeypatch):
    """A sqrtm whose diagonal keeps a material imaginary part must
    report the reference's 1e10 sentinel (dyadic_eval.py:29-31 raises
    and the caller substitutes 1e10), not a plausible real part."""
    import numpy as np

    from convofusion_tpu.eval import metrics

    fake = np.eye(8) + 1j * 0.5 * np.eye(8)
    monkeypatch.setattr(metrics.linalg, "sqrtm",
                        lambda m, disp=False: (fake, None))
    rng = np.random.default_rng(0)
    a = rng.standard_normal((50, 8))
    b = rng.standard_normal((50, 8))
    assert metrics.frechet_distance(a, b) == 1e10


def test_frechet_distance_well_conditioned():
    import numpy as np

    from convofusion_tpu.eval.metrics import frechet_distance

    rng = np.random.default_rng(0)
    a = rng.standard_normal((500, 8))
    b = rng.standard_normal((500, 8))
    assert frechet_distance(a, b) < 1.0
