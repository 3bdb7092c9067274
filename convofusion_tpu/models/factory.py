"""Factories mapping reference-style config params onto TPU-native modules.

The reference instantiates classes straight from YAML ``target``/``params``
blocks (convofusion/config.py:24-31) whose signatures carry torch-era
arguments (``ablation`` namespaces, ``latent_dim`` as a [size, dim] list,
``laplace_kernel_size`` stored on the VAE).  These factories accept that
schema unchanged and build the flax modules, so reference experiment YAMLs
drive this framework without edits.
"""
from __future__ import annotations

from typing import Sequence

import jax.numpy as jnp

from convofusion_tpu.diffusion.schedulers import (
    DiffusionScheduler,
    scheduler_from_config,
)
from convofusion_tpu.models.audioenc import AudioConvEncoder
from convofusion_tpu.models.denoiser import Denoiser
from convofusion_tpu.models.t5 import T5TextEncoder
from convofusion_tpu.models.vae import ConvoFusionVae


def _dtype(name):
    return {"bfloat16": jnp.bfloat16, "float32": jnp.float32}.get(
        str(name), jnp.float32)



def _ablation_flag(ablation, name: str, default: bool = False) -> bool:
    """Read a boolean TRAIN.ABLATION flag from a dict-like or namespace
    container.  Missing container/key -> default; a present value is
    interpreted strictly (no exception swallowing — a flag that cannot
    be read must not silently pick the default)."""
    if ablation is None:
        return default
    if hasattr(ablation, "get"):
        value = ablation.get(name, default)
    else:
        value = getattr(ablation, name, default)
    return bool(value)


def build_vae(
    ablation=None,
    nfeats: int = 189,
    latent_dim: Sequence[int] = (1, 128),
    ff_size: int = 1024,
    num_layers: int = 9,
    num_heads: int = 4,
    dropout: float = 0.1,
    arch: str = "encoder_decoder",
    normalize_before: bool = False,
    activation: str = "gelu",
    position_embedding: str = "learned",
    laplace_kernel_size: int = 0,  # consumed by the loss, not the module
    compute_dtype="float32",
    **_: object,
) -> ConvoFusionVae:
    mlp_dist = _ablation_flag(ablation, "MLP_DIST")
    return ConvoFusionVae(
        nfeats=int(nfeats),
        latent_size=int(latent_dim[0]),
        latent_dim=int(latent_dim[-1]),
        mlp_dist=mlp_dist,
        ff_size=int(ff_size),
        num_layers=int(num_layers),
        num_heads=int(num_heads),
        dropout=float(dropout),
        arch=str(arch),
        normalize_before=bool(normalize_before),
        activation=str(activation),
        position_embedding=str(position_embedding),
        dtype=_dtype(compute_dtype),
    )


def build_denoiser(
    ablation=None,
    nfeats: int = 189,
    condition: str = "text+audio",
    latent_dim: Sequence[int] = (1, 128),
    ff_size: int = 1024,
    num_layers: int = 9,
    num_heads: int = 4,
    dropout: float = 0.1,
    normalize_before: bool = True,
    activation: str = "gelu",
    flip_sin_to_cos: bool = True,
    return_intermediate_dec: bool = False,
    position_embedding: str = "sine",
    arch: str = "trans_dec",
    freq_shift: float = 0,
    guidance_scale: float = 7.5,
    guidance_uncondp: float = 0.1,
    text_encoded_dim: int = 512,
    audio_encoded_dim: int = 512,
    nclasses: int = 10,
    fuse_streams: bool = False,
    remat: bool = False,
    compute_dtype="float32",
    **_: object,
) -> Denoiser:
    if _ablation_flag(ablation, "CAUSAL_ATTN"):
        # the reference's CAUSAL_ATTN knob cannot run: it passes
        # is_causal=True to its CROSS-attentions with attn_mask=None
        # (cross_attention.py:597-622), which torch rejects with
        # "Need attn_mask if specifying the is_causal hint" — the
        # ablation has no defined semantics to reproduce
        raise ValueError(
            "ABLATION.CAUSAL_ATTN=True is not supported: the "
            "reference implementation of this knob raises in torch "
            "(is_causal hint without attn_mask on cross-attention), "
            "so there is no behavior to match")
    return Denoiser(
        nfeats=int(nfeats),
        condition=str(condition),
        latent_size=int(latent_dim[0]),
        latent_dim=int(latent_dim[-1]),
        ff_size=int(ff_size),
        num_layers=int(num_layers),
        num_heads=int(num_heads),
        dropout=float(dropout),
        normalize_before=bool(normalize_before),
        activation=str(activation),
        flip_sin_to_cos=bool(flip_sin_to_cos),
        freq_shift=float(freq_shift),
        position_embedding=str(position_embedding),
        arch=str(arch),
        text_encoded_dim=int(text_encoded_dim),
        audio_encoded_dim=int(audio_encoded_dim),
        nclasses=int(nclasses),
        fuse_streams=bool(fuse_streams),
        remat=bool(remat),
        dtype=_dtype(compute_dtype),
    )


def build_text_encoder(
    modelpath: str = "t5-base",
    finetune: bool = False,
    last_hidden_state: bool = False,
    latent_dim: int = 512,
    dropout: float = 0.0,
    vocab_size: int = 32128,
    d_model: int = 768,
    d_ff: int = 3072,
    num_layers: int = 12,
    num_heads: int = 12,
    d_kv: int = 64,
    compute_dtype="float32",
    **_: object,
) -> T5TextEncoder:
    # defaults are the t5-base dims; other sizes pass through params
    return T5TextEncoder(
        latent_dim=int(latent_dim), dropout=float(dropout),
        vocab_size=int(vocab_size), d_model=int(d_model), d_ff=int(d_ff),
        num_layers=int(num_layers), num_heads=int(num_heads),
        d_kv=int(d_kv), dtype=_dtype(compute_dtype))


def build_audio_encoder(
    input_size: int = 80,
    hidden_size: int = 256,
    latent_dim: int = 512,
    compute_dtype="float32",
    **_: object,
) -> AudioConvEncoder:
    return AudioConvEncoder(
        input_size=int(input_size), hidden_size=int(hidden_size),
        latent_dim=int(latent_dim), dtype=_dtype(compute_dtype))


def build_scheduler(variant: str = "ddpm", eta: float = 0.0,
                    **params) -> DiffusionScheduler:
    params.pop("variance_type", None)  # fixed_small is the implemented mode
    return scheduler_from_config(params, eta=eta, variant=variant)
