"""Gaussian smoothing + Laplace filter tests against the torch reference."""
import numpy as np
import pytest
import jax.numpy as jnp

torch = pytest.importorskip("torch")

from convofusion_tpu.ops.smoothing import (
    gaussian_smooth_2d,
    laplace_filter_time,
    laplacian_1d_kernel,
)


def test_gaussian_smoothing_matches_reference(reference_path):
    import torch.nn.functional as F
    from convofusion.models.operator import GaussianSmoothing

    op = GaussianSmoothing(channels=1, kernel_size=3, sigma=0.5, dim=2)
    x = torch.randn(2, 16, 9)
    with torch.no_grad():
        padded = F.pad(x.unsqueeze(1), (1, 1, 1, 1), mode="reflect")
        out_t = op(padded).squeeze(1)
    out_j = gaussian_smooth_2d(jnp.asarray(x.numpy()), 3, 0.5)
    np.testing.assert_allclose(
        np.asarray(out_j), out_t.numpy(), rtol=1e-5, atol=1e-5
    )


def test_laplacian_kernel_matches_kornia_formula():
    np.testing.assert_array_equal(
        laplacian_1d_kernel(5), np.array([1, 1, -4, 1, 1], dtype=np.float32)
    )


def test_laplace_filter_matches_torch_conv1d():
    import torch.nn.functional as F

    k = torch.tensor(laplacian_1d_kernel(5))[None, None, :]
    x = torch.randn(2, 128, 7)  # (B, T, F)
    vec = x.permute(0, 2, 1).reshape(-1, 1, 128)
    out_t = F.conv1d(vec, k).reshape(2, 7, -1).permute(0, 2, 1)
    out_j = laplace_filter_time(jnp.asarray(x.numpy()), 5)
    np.testing.assert_allclose(
        np.asarray(out_j), out_t.numpy(), rtol=1e-4, atol=1e-4
    )
