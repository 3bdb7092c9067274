"""Torch state-dict -> JAX param-tree converters.

This is the checkpoint-parity layer (SURVEY.md §7 "hard parts"): it maps the
reference's PyTorch parameter names (convofusion/models/...) onto this
framework's flax param trees so released torch checkpoints can be loaded and
golden-value parity tests can use the reference modules as oracles.

All converters take a flat ``{name: np.ndarray}`` state dict (use
``to_numpy_state_dict`` on a torch module or checkpoint) plus a key prefix.
Torch ``nn.Linear`` weights are (out, in) -> flax kernels are (in, out).
"""
from __future__ import annotations

from typing import Dict

import numpy as np


def to_numpy_state_dict(torch_module_or_sd) -> Dict[str, np.ndarray]:
    if hasattr(torch_module_or_sd, "state_dict"):
        sd = torch_module_or_sd.state_dict()
    else:
        sd = torch_module_or_sd
    return {k: np.asarray(v.detach().cpu().numpy() if hasattr(v, "detach") else v)
            for k, v in sd.items()}


def linear(sd, prefix):
    out = {"kernel": sd[f"{prefix}.weight"].T}
    if f"{prefix}.bias" in sd:
        out["bias"] = sd[f"{prefix}.bias"]
    return out


def layernorm(sd, prefix):
    return {"scale": sd[f"{prefix}.weight"], "bias": sd[f"{prefix}.bias"]}


def embedding(sd, prefix):
    return {"embedding": sd[f"{prefix}.weight"]}


def mha(sd, prefix, d_model: int):
    """torch nn.MultiheadAttention (packed in_proj) -> q/k/v/out projections."""
    w = sd[f"{prefix}.in_proj_weight"]
    b = sd.get(f"{prefix}.in_proj_bias")
    out = {
        "q_proj": {"kernel": w[:d_model].T},
        "k_proj": {"kernel": w[d_model : 2 * d_model].T},
        "v_proj": {"kernel": w[2 * d_model :].T},
        "out_proj": linear(sd, f"{prefix}.out_proj"),
    }
    if b is not None:
        out["q_proj"]["bias"] = b[:d_model]
        out["k_proj"]["bias"] = b[d_model : 2 * d_model]
        out["v_proj"]["bias"] = b[2 * d_model :]
    return out


def ffn(sd, prefix):
    """linear1/linear2 pair living directly on a torch layer module."""
    return {
        "linear1": linear(sd, f"{prefix}.linear1"),
        "linear2": linear(sd, f"{prefix}.linear2"),
    }


def encoder_layer(sd, prefix, d_model):
    return {
        "self_attn": mha(sd, f"{prefix}.self_attn", d_model),
        "ffn": ffn(sd, prefix),
        "norm1": layernorm(sd, f"{prefix}.norm1"),
        "norm2": layernorm(sd, f"{prefix}.norm2"),
    }


def decoder_layer(sd, prefix, d_model):
    return {
        "self_attn": mha(sd, f"{prefix}.self_attn", d_model),
        "multihead_attn": mha(sd, f"{prefix}.multihead_attn", d_model),
        "ffn": ffn(sd, prefix),
        "norm1": layernorm(sd, f"{prefix}.norm1"),
        "norm2": layernorm(sd, f"{prefix}.norm2"),
        "norm3": layernorm(sd, f"{prefix}.norm3"),
    }


def time_block(sd, prefix):
    return {
        "emb_layers_1": linear(sd, f"{prefix}.emb_layers.1"),
        "out_layers_2": linear(sd, f"{prefix}.out_layers.2"),
        "norm": layernorm(sd, f"{prefix}.norm"),
    }


def decoder_layer_2att(sd, prefix, d_model):
    from convofusion_tpu.ops.transformer import COND_STREAMS

    out = {
        "self_attn": mha(sd, f"{prefix}.self_attn", d_model),
        "time_block1": time_block(sd, f"{prefix}.time_block1"),
        "time_block2": time_block(sd, f"{prefix}.time_block2"),
        "att_fuser": linear(sd, f"{prefix}.att_fuser"),
        "ffn": ffn(sd, prefix),
        "norm1": layernorm(sd, f"{prefix}.norm1"),
        "norm2": layernorm(sd, f"{prefix}.norm2"),
        "norm3": layernorm(sd, f"{prefix}.norm3"),
    }
    for s in COND_STREAMS:
        out[f"multihead_attn_{s}"] = mha(
            sd, f"{prefix}.multihead_attn_{s}", d_model
        )
        out[f"{s}_norm"] = layernorm(sd, f"{prefix}.{s}_norm")
    return out


def skip_stack(sd, prefix, d_model, num_layers, layer_fn):
    """SkipTransformerEncoder/Decoder param mapping."""
    num_block = (num_layers - 1) // 2
    out = {"norm": layernorm(sd, f"{prefix}.norm")}
    for i in range(num_block):
        out[f"input_blocks_{i}"] = layer_fn(
            sd, f"{prefix}.input_blocks.{i}", d_model
        )
        out[f"output_blocks_{i}"] = layer_fn(
            sd, f"{prefix}.output_blocks.{i}", d_model
        )
        # reference pops skips LIFO: output block i merges input block
        # (num_block-1-i)'s activation, but linear_blocks are indexed in
        # order, so the mapping is direct.
        out[f"linear_blocks_{i}"] = linear(sd, f"{prefix}.linear_blocks.{i}")
    out["middle_block"] = layer_fn(sd, f"{prefix}.middle_block", d_model)
    return out


def skip_encoder(sd, prefix, d_model, num_layers):
    return skip_stack(sd, prefix, d_model, num_layers, encoder_layer)


def skip_decoder(sd, prefix, d_model, num_layers):
    return skip_stack(sd, prefix, d_model, num_layers, decoder_layer)


def denoiser_decoder(sd, prefix, d_model, num_layers):
    out = {"norm": layernorm(sd, f"{prefix}.norm")}
    for i in range(num_layers):
        out[f"layers_{i}"] = decoder_layer_2att(
            sd, f"{prefix}.layers.{i}", d_model
        )
    return out


def timestep_embedding(sd, prefix):
    return {
        "linear_1": linear(sd, f"{prefix}.linear_1"),
        "linear_2": linear(sd, f"{prefix}.linear_2"),
    }


def vae_params(sd, d_model: int, num_layers: int, prefix: str = ""):
    """Reference ConvoFusionVae state dict -> convofusion_tpu.models.vae tree.

    ``prefix`` e.g. 'vae' when loading from a full-model checkpoint.
    """
    p = (prefix + ".") if prefix else ""
    out = {
        "body_encoder": skip_encoder(sd, f"{p}body_encoder", d_model,
                                     num_layers),
        "hands_encoder": skip_encoder(sd, f"{p}hands_encoder", d_model,
                                      num_layers),
        "body_decoder": skip_decoder(sd, f"{p}body_decoder", d_model,
                                     num_layers),
        "hands_decoder": skip_decoder(sd, f"{p}hands_decoder", d_model,
                                      num_layers),
        "body_global_motion_token": sd[f"{p}body_global_motion_token"],
        "hands_global_motion_token": sd[f"{p}hands_global_motion_token"],
        "body_skel_embedding": linear(sd, f"{p}body_skel_embedding"),
        "hands_skel_embedding": linear(sd, f"{p}hands_skel_embedding"),
        "body_final_layer": linear(sd, f"{p}body_final_layer"),
        "hands_final_layer": linear(sd, f"{p}hands_final_layer"),
    }
    # MLP_DIST ablation checkpoints carry Linear d->2d dist heads
    # (vae.py:134-140); convert them rather than silently dropping them
    if f"{p}body_dist_layer.weight" in sd:
        out["body_dist_layer"] = linear(sd, f"{p}body_dist_layer")
        out["hands_dist_layer"] = linear(sd, f"{p}hands_dist_layer")
    return out


def denoiser_params(sd, d_model: int, num_layers: int, prefix: str = ""):
    """Reference Denoiser (trans_dec) state dict -> our Denoiser tree."""
    p = (prefix + ".") if prefix else ""
    return {
        "latent_embd": linear(sd, f"{p}latent_embd"),
        "latent_proj": linear(sd, f"{p}latent_proj"),
        "time_embedding": timestep_embedding(sd, f"{p}time_embedding"),
        "bh_embedding": embedding(sd, f"{p}bh_embedding"),
        "condition_embedding": embedding(sd, f"{p}condition_embedding"),
        "decoder": denoiser_decoder(sd, f"{p}decoder", d_model, num_layers),
    }
