"""Audio (mel-frame) encoder + text/audio controller.

Reference: convofusion/models/architectures/audioenc.py.  The
"AudioConvEncoder" is an MLP over mel frames (Linear 80->256 -> Dropout ->
LeakyReLU(0.1) -> Linear 256->512 -> Dropout -> LeakyReLU -> Linear out,
audioenc.py:13-21,29-34).
"""
from __future__ import annotations

import flax.linen as nn
import jax.numpy as jnp


def audio_num_frames(max_seq_len: int = 128, fps: int = 25,
                     sample_rate: int = 16000, hop_length: int = 512) -> int:
    """Mel frame count for a clip (audioenc.py:27): 161 for the defaults."""
    return int((max_seq_len / fps) * sample_rate // hop_length + 1)


class AudioConvEncoder(nn.Module):
    input_size: int = 80
    hidden_size: int = 256
    latent_dim: int = 512
    dropout: float = 0.1
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x, deterministic: bool = True):
        """x (B, T_mel, n_mels) -> (B, T_mel, latent_dim)."""
        x = nn.Dense(self.hidden_size, dtype=self.dtype, name="main_0")(x)
        x = nn.Dropout(self.dropout)(x, deterministic=deterministic)
        x = nn.leaky_relu(x, negative_slope=0.1)
        x = nn.Dense(self.latent_dim, dtype=self.dtype, name="main_3")(x)
        x = nn.Dropout(self.dropout)(x, deterministic=deterministic)
        x = nn.leaky_relu(x, negative_slope=0.1)
        return nn.Dense(self.latent_dim, dtype=self.dtype, name="out_net")(x)
