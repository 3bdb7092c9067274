"""Small convolution helpers: Gaussian smoothing (used by word-excitation
guidance) and the 1-D Laplace kernel (used by the VAE's second-derivative
reconstruction loss).

Reference: convofusion/models/operator/gaussian_smoothing.py and the kornia
``laplacian_1d`` kernel used in convofusion/models/modeltype/convofusion.py:
29,146-149,682-693.
"""
from __future__ import annotations

import numpy as np
import jax.numpy as jnp
from jax import lax


def gaussian_kernel_2d(kernel_size: int = 3, sigma: float = 0.5) -> np.ndarray:
    """Separable 2-D Gaussian kernel, normalized to sum 1."""
    grid = np.arange(kernel_size, dtype=np.float32)
    mean = (kernel_size - 1) / 2.0
    # NB: the reference divides by (2*sigma) inside the square
    # (gaussian_smoothing.py:40) — kept for behavioral parity.
    g = np.exp(-(((grid - mean) / (2.0 * sigma)) ** 2)) / (
        sigma * np.sqrt(2.0 * np.pi)
    )
    k = np.outer(g, g)
    return (k / k.sum()).astype(np.float32)


def gaussian_smooth_2d(x, kernel_size: int = 3, sigma: float = 0.5,
                       reflect_pad: bool = True):
    """Smooth the trailing two axes of ``x`` (B, H, W) with a Gaussian.

    With ``reflect_pad`` the output keeps (H, W), matching the reference's
    F.pad(..., mode='reflect') + valid conv (word_excitation_guidance.py:33-36).
    """
    k = jnp.asarray(gaussian_kernel_2d(kernel_size, sigma), x.dtype)
    pad = kernel_size // 2
    if reflect_pad:
        x = jnp.pad(x, ((0, 0), (pad, pad), (pad, pad)), mode="reflect")
    out = lax.conv_general_dilated(
        x[:, None, :, :],
        k[None, None, :, :],
        window_strides=(1, 1),
        padding="VALID",
        dimension_numbers=("NCHW", "OIHW", "NCHW"),
    )
    return out[:, 0]


def laplacian_1d_kernel(window_size: int) -> np.ndarray:
    """kornia.filters.kernels.laplacian_1d: ones with center = 1 - N."""
    k = np.ones(window_size, dtype=np.float32)
    k[window_size // 2] = 1.0 - window_size
    return k


def laplace_filter_time(motion, window_size: int):
    """Valid 1-D Laplace conv along the time axis of (B, T, F) motion.

    Matches the reference's per-feature F.conv1d with the kornia kernel
    (convofusion.py:682-693); output (B, T - window_size + 1, F).
    """
    k = jnp.asarray(laplacian_1d_kernel(window_size), motion.dtype)
    x = jnp.transpose(motion, (0, 2, 1))  # (B, F, T)
    b, f, t = x.shape
    out = lax.conv_general_dilated(
        x.reshape(b * f, 1, t),
        k[None, None, :],
        window_strides=(1,),
        padding="VALID",
        dimension_numbers=("NCH", "OIH", "NCH"),
    )
    return jnp.transpose(out.reshape(b, f, -1), (0, 2, 1))
