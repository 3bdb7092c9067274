"""FID feature extractor: conv pose autoencoder (inference encoder half).

Reference: quant_eval/motion_autoencoder.py (PoseEncoderConv /
HalfEmbeddingNet, from the BEAT/CaMN repo): 1-D conv + BatchNorm stack over
(128, 189) motion -> 300-d feature.  Weights come from the released
``experiments/eval/last_499.bin`` checkpoint via ``load_torch_fidnet``.

Faithfulness notes:
  * torch flattens (B, C, L) channel-major before the MLP — we transpose
    accordingly so released weights map exactly.
  * the reference's out_net uses ``nn.LeakyReLU(True)``, which sets
    negative_slope=1.0 (an identity!) — replicated, since the released
    checkpoint was trained with it (motion_autoencoder.py:48-59).
  * BatchNorm runs in inference mode with stored running stats.
"""
from __future__ import annotations

from typing import Dict

import flax.linen as nn
import jax.numpy as jnp
import numpy as np


def _bn(params, x, eps=1e-5):
    mean, var = params["mean"], params["var"]
    scale, bias = params["scale"], params["bias"]
    return (x - mean) / np.sqrt(var + eps) * scale + bias


class HalfEmbeddingNet:
    """Pure-function feature extractor over an explicit param dict."""

    def __init__(self, pose_length: int = 128, pose_dim: int = 189,
                 feature_length: int = 300):
        self.base = feature_length
        self.pose_dim = pose_dim
        self.pose_length = pose_length

    def init_params(self, seed: int = 0) -> Dict:
        """Random init (for tests); real use loads the torch checkpoint."""
        rng = np.random.default_rng(seed)
        b = self.base

        def conv(cin, cout, k):
            return {
                "kernel": rng.normal(
                    scale=1.0 / np.sqrt(cin * k),
                    size=(k, cin, cout)).astype(np.float32),
                "bias": np.zeros(cout, np.float32),
            }

        def bn(c):
            return {"mean": np.zeros(c, np.float32),
                    "var": np.ones(c, np.float32),
                    "scale": np.ones(c, np.float32),
                    "bias": np.zeros(c, np.float32)}

        def lin(cin, cout):
            return {"kernel": rng.normal(
                scale=1.0 / np.sqrt(cin),
                size=(cin, cout)).astype(np.float32),
                "bias": np.zeros(cout, np.float32)}

        return {
            "conv0": conv(self.pose_dim, b, 3), "bn0": bn(b),
            "conv1": conv(b, 2 * b, 3), "bn1": bn(2 * b),
            "conv2": conv(2 * b, 2 * b, 4), "bn2": bn(2 * b),
            "conv3": conv(2 * b, b, 3),
            "lin0": lin(59 * b, 20 * b), "lbn0": bn(20 * b),
            "lin1": lin(20 * b, 4 * b), "lbn1": bn(4 * b),
            "lin2": lin(4 * b, 2 * b), "lbn2": bn(2 * b),
            "lin3": lin(2 * b, b),
            "fc_mu": lin(b, b),
        }

    def __call__(self, params: Dict, poses: jnp.ndarray) -> jnp.ndarray:
        """poses (B, 128, 189) -> features (B, 300)."""
        x = poses  # (B, L, C) feature-last
        x = nn.leaky_relu(_bn(params["bn0"],
                              _conv1d(x, params["conv0"])), 0.2)
        x = nn.leaky_relu(_bn(params["bn1"],
                              _conv1d(x, params["conv1"])), 0.2)
        x = nn.leaky_relu(_bn(params["bn2"],
                              _conv1d(x, params["conv2"], stride=2)), 0.2)
        x = _conv1d(x, params["conv3"])  # (B, 59, base)

        # torch flattens channel-major: (B, C, L) -> (B, C*L)
        x = jnp.transpose(x, (0, 2, 1)).reshape(x.shape[0], -1)

        def dense(x, p):
            return x @ jnp.asarray(p["kernel"]) + jnp.asarray(p["bias"])

        # NB out_net LeakyReLU(True) == slope 1.0 == identity (see module
        # docstring) — so only the BN layers act between the linears
        x = _bn(params["lbn0"], dense(x, params["lin0"]))
        x = _bn(params["lbn1"], dense(x, params["lin1"]))
        x = _bn(params["lbn2"], dense(x, params["lin2"]))
        x = dense(x, params["lin3"])
        return dense(x, params["fc_mu"])


def _conv1d(x, p, stride: int = 1):
    """x (B, L, Cin); kernel (k, Cin, Cout); VALID padding."""
    import jax.lax

    return jax.lax.conv_general_dilated(
        x, jnp.asarray(p["kernel"]),
        window_strides=(stride,), padding="VALID",
        dimension_numbers=("NHC", "HIO", "NHC"),
    ) + jnp.asarray(p["bias"])


def load_torch_fidnet(path: str) -> Dict:
    """Released last_499.bin -> param dict (metric_eval.py:359-373 strips a
    possible 'module.' DDP prefix the same way)."""
    import torch

    states = torch.load(path, map_location="cpu", weights_only=False)
    sd = states["model_state"] if "model_state" in states else states
    sd = {(k[7:] if k.startswith("module.") else k): np.asarray(
        v.detach().cpu().numpy()) for k, v in sd.items()}

    def conv(prefix):
        return {"kernel": sd[f"{prefix}.weight"].transpose(2, 1, 0),
                "bias": sd[f"{prefix}.bias"]}

    def bn(prefix):
        return {"mean": sd[f"{prefix}.running_mean"],
                "var": sd[f"{prefix}.running_var"],
                "scale": sd[f"{prefix}.weight"],
                "bias": sd[f"{prefix}.bias"]}

    def lin(prefix):
        return {"kernel": sd[f"{prefix}.weight"].T,
                "bias": sd[f"{prefix}.bias"]}

    e = "pose_encoder"
    return {
        "conv0": conv(f"{e}.net.0.0"), "bn0": bn(f"{e}.net.0.1"),
        "conv1": conv(f"{e}.net.1.0"), "bn1": bn(f"{e}.net.1.1"),
        "conv2": conv(f"{e}.net.2.0"), "bn2": bn(f"{e}.net.2.1"),
        "conv3": conv(f"{e}.net.3"),
        "lin0": lin(f"{e}.out_net.0"), "lbn0": bn(f"{e}.out_net.1"),
        "lin1": lin(f"{e}.out_net.3"), "lbn1": bn(f"{e}.out_net.4"),
        "lin2": lin(f"{e}.out_net.6"), "lbn2": bn(f"{e}.out_net.7"),
        "lin3": lin(f"{e}.out_net.9"),
        "fc_mu": lin(f"{e}.fc_mu"),
    }
