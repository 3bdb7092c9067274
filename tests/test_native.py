"""Native C++ mel featurization kernel (convofusion_tpu/native).

Parity vs the numpy reference implementation (which is itself invariant-
and jax-equivalence-tested in test_data_pipeline) and the fallback
behavior when the native path is unavailable.
"""
import numpy as np
import pytest

from convofusion_tpu import native
from convofusion_tpu.data import audio as A

pytestmark = pytest.mark.skipif(
    not native.available(), reason="no g++ / native build failed")


def test_native_matches_numpy_power_mel():
    rng = np.random.default_rng(0)
    fb = A.mel_filterbank(16000, 2048, 80)
    for seconds in (0.2, 5.12, 7.3):
        y = rng.normal(size=int(seconds * 16000)).astype(np.float32)
        ref = A.stft_power(y) @ fb.T
        nat = native.melspec_power(y, fb, 2048, 512)
        assert nat.shape == ref.shape
        np.testing.assert_allclose(nat, ref, rtol=2e-4, atol=2e-3)


def test_native_mel_db_matches_numpy_end_to_end(monkeypatch):
    rng = np.random.default_rng(1)
    y = rng.normal(size=int(5.12 * 16000)).astype(np.float32)
    via_native = A.mel_db(y)
    # force the numpy fallback without rebuilding the module
    monkeypatch.setattr(native, "melspec_power",
                        lambda *a, **k: None)
    via_numpy = A.mel_db(y)
    assert via_native.shape == via_numpy.shape == (161, 80)
    np.testing.assert_allclose(via_native, via_numpy, atol=1e-4)


def test_native_rejects_non_power_of_two():
    y = np.zeros(4096, np.float32)
    fb = np.zeros((4, 1501), np.float32)  # 3000/2+1
    assert native.melspec_power(y, fb, 3000, 512) is None


def test_native_empty_signal():
    fb = A.mel_filterbank(16000, 2048, 8)
    out = native.melspec_power(np.zeros(0, np.float32), fb, 2048, 512)
    # centered padding still yields floor(2*1024-2048)/512+1 = 1 frame
    assert out.shape[1] == 8
    np.testing.assert_allclose(out, 0.0)
