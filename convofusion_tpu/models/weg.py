"""Word-Excitation Guidance (WEG) — test-time latent refinement.

Reference: convofusion/models/tools/word_excitation_guidance.py (an
Attend-and-Excite adaptation) + the refinement driver in
convofusion/models/modeltype/convofusion.py:298-388,437-496.

TPU-native formulation: focus-word token indices arrive as a static-shape
``(B, K)`` index array with a validity mask (host-side preprocessing,
convofusion_tpu/models/tokenizer.py:focus_word_indices), the bos/eot text
slice is expressed as a softmax mask instead of a dynamic slice, and the
data-dependent refinement loop (``while loss > target``) becomes
``lax.while_loop`` with the reference's max-iteration bound.

Smoothing matches the reference EXACTLY: the reference reflect-pads the
*sliced* [1, eot) attention map before the 3x3 Gaussian
(word_excitation_guidance.py:33-36); :func:`sliced_reflect_smooth`
reproduces that on the full static-shape map by gathering the reflected
interior columns into the (dynamic) slice-boundary ring columns before a
single valid conv — no dynamic slicing inside jit.
"""
from __future__ import annotations

from typing import Callable, Tuple

import jax
import jax.numpy as jnp
from jax import lax

from convofusion_tpu.ops.smoothing import gaussian_kernel_2d

_BIG_NEG = -1e9


def sliced_reflect_smooth(p: jnp.ndarray, eot_idx: jnp.ndarray,
                          kernel_size: int = 3,
                          sigma: float = 0.5) -> jnp.ndarray:
    """Gaussian-smooth the [1, eot) column slice of ``p`` (B, Tq, Tk)
    with reflect padding AT THE SLICE BOUNDARY, as the reference does on
    the sliced map (word_excitation_guidance.py:33-36).

    Static-shape formulation: the reflect ring is one column each side of
    the slice (3x3 kernel), so gather column 2 into column 0 and column
    eot-2 into column eot, reflect-pad the rows, run one valid conv over
    the full map, and zero the columns outside [1, eot).  Output columns
    inside the slice are then bit-equal to conv(reflect_pad(slice)).
    """
    b, tq, tk = p.shape
    j = jnp.arange(tk)[None, :]
    eot = eot_idx[:, None].astype(jnp.int32)
    src = jnp.where(j == 0, 2, jnp.where(j == eot, eot - 2, j))
    src = jnp.clip(src, 0, tk - 1)
    p_ext = jnp.take_along_axis(
        p, jnp.broadcast_to(src[:, None, :], (b, tq, tk)), axis=2)
    k = jnp.asarray(gaussian_kernel_2d(kernel_size, sigma), p.dtype)
    pad = kernel_size // 2
    x = jnp.pad(p_ext, ((0, 0), (pad, pad), (0, 0)), mode="reflect")
    x = jnp.pad(x, ((0, 0), (0, 0), (pad, pad)))
    out = lax.conv_general_dilated(
        x[:, None, :, :], k[None, None, :, :], window_strides=(1, 1),
        padding="VALID", dimension_numbers=("NCHW", "OIHW", "NCHW"))[:, 0]
    region = (j >= 1) & (j < eot)
    return out * region[:, None, :]


def aggregate_attentions(att_mats: jnp.ndarray) -> jnp.ndarray:
    """(B, layers, Tq, Tk) -> (B, Tq, Tk) mean over layers
    (word_excitation_guidance.py:11-14)."""
    return jnp.mean(att_mats, axis=1)


def max_attention_at_indices(
    att: jnp.ndarray,
    focus_idx: jnp.ndarray,
    focus_valid: jnp.ndarray,
    eot_idx: jnp.ndarray,
    smooth: bool = True,
) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """att (B, Tq, Tk) aggregated tlsn attention; focus_idx (B, K) token
    columns; eot_idx (B,) index of the <eos> token.

    Returns (max_att (B, K), focus_valid).  Mirrors
    word_excitation_guidance.py:16-51 with masked softmax over the
    [1, eot) text region and Gaussian smoothing.
    """
    b, tq, tk = att.shape
    pos = jnp.arange(tk)
    region = (pos[None, :] >= 1) & (pos[None, :] < eot_idx[:, None])  # (B,Tk)

    logits = jnp.where(region[:, None, :], att, _BIG_NEG)
    p = jax.nn.softmax(logits, axis=-1)
    p = p * region[:, None, :]
    if smooth:
        p = sliced_reflect_smooth(p, eot_idx, kernel_size=3, sigma=0.5)

    # gather focus columns and take the max over motion tokens
    cols = jnp.take_along_axis(
        p, focus_idx[:, None, :].astype(jnp.int32), axis=2)  # (B, Tq, K)
    max_att = jnp.max(cols, axis=1)
    return max_att, focus_valid


def attention_focus_loss(max_att: jnp.ndarray,
                         focus_valid: jnp.ndarray) -> jnp.ndarray:
    """mean over batch of mean over valid focus tokens of max(0, 1 - att)
    (word_excitation_guidance.py:64-82); samples without focus words
    contribute 0."""
    token_losses = jnp.maximum(0.0, 1.0 - max_att) * focus_valid
    counts = jnp.sum(focus_valid, axis=-1)
    per_sample = jnp.where(
        counts > 0, jnp.sum(token_losses, axis=-1) / jnp.maximum(counts, 1),
        0.0)
    return jnp.mean(per_sample)


def make_weg_loss(
    denoise_text_only: Callable[[jnp.ndarray, jnp.ndarray], jnp.ndarray],
    focus_idx: jnp.ndarray,
    focus_valid: jnp.ndarray,
    eot_idx: jnp.ndarray,
    smooth: bool = True,
):
    """Build loss(latents, t) differentiable w.r.t. latents.

    ``denoise_text_only(latents, t)`` must return the (B, L, Tq, Tk) tlsn
    attention stack of the text-only conditioned denoiser pass.
    """

    def loss_fn(latents, t):
        att = aggregate_attentions(denoise_text_only(latents, t))
        max_att, valid = max_attention_at_indices(
            att, focus_idx, focus_valid, eot_idx, smooth)
        return attention_focus_loss(max_att, valid)

    return loss_fn


def update_latent(latents, grad, lr):
    """Gradient step on the latents (word_excitation_guidance.py:54-61)."""
    return latents - lr * grad


def iterative_refinement(
    loss_and_grad: Callable,
    latents: jnp.ndarray,
    t: jnp.ndarray,
    threshold: jnp.ndarray,
    step_size: jnp.ndarray,
    max_refinement_steps: int = 300,
):
    """``while loss > 1 - threshold`` gradient refinement
    (convofusion.py:298-388) as a bounded lax.while_loop.

    ``loss_and_grad(latents, t) -> (loss, grad)``.
    """
    target = jnp.maximum(0.0, 1.0 - threshold)

    def cond(state):
        i, lat, loss = state
        return (loss > target) & (i < max_refinement_steps)

    def body(state):
        i, lat, _ = state
        loss, grad = loss_and_grad(lat, t)
        lat = jnp.where(loss > 0, lat - step_size * grad, lat)
        return i + 1, lat, loss

    loss0, _ = loss_and_grad(latents, t)
    _, latents, loss = jax.lax.while_loop(
        cond, body, (jnp.int32(0), latents, loss0))
    return latents, loss
