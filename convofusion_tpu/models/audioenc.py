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


class TextAudioController(nn.Module):
    """Wraps the text + audio encoders per person type.

    Reference: audioenc.py:37-91 (TextAudioController): returns the audio
    and text embeddings with their masks; the 'spk-ta' mode additionally
    time-projects both to a fixed token count and sums them into a fused
    control signal (dead in production — spk_emb = tspk — but part of the
    module inventory).

    Text encoding happens outside (host tokenization + the shared frozen
    T5), so this module receives ``text_emb``/``text_mask`` instead of raw
    strings; the Convofusion pipeline's encode_conditions drives it.
    """

    out_dim: int = 512
    text_max_length: int = 200
    audio_max_length: int = 161
    audio_input_size: int = 80
    audio_hidden_size: int = 256
    dtype: jnp.dtype = jnp.float32

    def setup(self):
        self.audio_encoder = AudioConvEncoder(
            self.audio_input_size, self.audio_hidden_size, self.out_dim,
            dtype=self.dtype, name="audio_encoder")
        self.text_time_proj = nn.Dense(
            self.out_dim, dtype=self.dtype, name="text_time_proj")
        self.audio_time_proj = nn.Dense(
            self.out_dim, dtype=self.dtype, name="audio_time_proj")
        self.out_net = nn.Dense(self.out_dim, dtype=self.dtype,
                                name="out_net")

    def __call__(self, text_emb, text_mask, audio, person_type: str,
                 deterministic: bool = True):
        """text_emb (B, Tt, D); text_mask (B, Tt) True = valid;
        audio (B, Ta, n_mels) mel frames.

        Returns (audio_emb, text_emb, audio_mask(None), pad_mask, fused)
        where pad_mask follows the torch convention (True = pad,
        audioenc.py:61) and fused is None unless person_type == 'spk-ta'.
        """
        pad_mask = ~text_mask
        audio_emb = self.audio_encoder(audio, deterministic=deterministic)
        if person_type != "spk-ta":
            return audio_emb, text_emb, None, pad_mask, None

        # spk-ta: mask, pad tokens to text_max_length, project the TIME
        # axis to out_dim tokens, leaky-relu, sum with the audio branch
        # (audioenc.py:70-89).  NB the reference masks with the INVERTED
        # mask (pad positions kept) — replicated.
        text_masked = text_emb * pad_mask.astype(text_emb.dtype)[..., None]
        tm = jnp.swapaxes(text_masked, 1, 2)  # (B, D, Tt)
        tm = jnp.pad(
            tm, ((0, 0), (0, 0),
                 (0, self.text_max_length - tm.shape[-1])))
        tm = nn.leaky_relu(self.text_time_proj(tm), negative_slope=0.01)
        text_ctrl = jnp.swapaxes(tm, 1, 2)

        am = jnp.swapaxes(audio_emb, 1, 2)
        am = nn.leaky_relu(self.audio_time_proj(am), negative_slope=0.01)
        audio_ctrl = jnp.swapaxes(am, 1, 2)

        fused = self.out_net(text_ctrl + audio_ctrl)
        return audio_emb, text_emb, None, pad_mask, fused
