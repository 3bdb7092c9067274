"""Torch checkpoint -> orbax conversion CLI round trip."""
import os
from types import SimpleNamespace

import numpy as np
import pytest

torch = pytest.importorskip("torch")


@pytest.mark.slow
def test_convert_vae_checkpoint_roundtrip(reference_path, tmp_path):
    from convofusion.models.architectures.vae import (
        ConvoFusionVae as TorchVae,
    )

    import jax
    import jax.numpy as jnp
    import yaml

    from convofusion_tpu.compat.convert import main as convert_main
    from convofusion_tpu.config import DEFAULTS_DIR
    from convofusion_tpu.models.vae import ConvoFusionVae
    from convofusion_tpu.train.checkpoint import load_checkpoint

    abl = SimpleNamespace(MLP_DIST=False, PE_TYPE="convofusion")
    torch.manual_seed(0)
    tvae = TorchVae(ablation=abl, nfeats=189, latent_dim=[1, 32],
                    ff_size=64, num_layers=3, num_heads=2, dropout=0.0,
                    arch="encoder_decoder", normalize_before=True,
                    activation="gelu", position_embedding="sine")
    ckpt_path = tmp_path / "vae.ckpt"
    torch.save({"state_dict": {f"vae.{k}": v for k, v in
                               tvae.state_dict().items()}}, ckpt_path)

    # experiment cfg matching the tiny torch vae dims
    cfg = {
        "TRAIN": {"STAGE": "vae"},
        "model": {"latent_dim": [1, 32],
                  "motion_vae": {"params": {
                      "num_layers": 3, "ff_size": 64, "dropout": 0.0}}},
        "DATASET": {"NFEATS": 189, "NJOINTS": 63},
    }
    cfg_path = tmp_path / "cfg.yaml"
    with open(cfg_path, "w") as f:
        yaml.safe_dump(cfg, f)

    out = str(tmp_path / "converted")
    convert_main(["--ckpt", str(ckpt_path), "--cfg", str(cfg_path),
                  "--out", out, "--kind", "vae"])
    assert os.path.isdir(out)

    params, _ = load_checkpoint(out)
    vae = ConvoFusionVae(latent_dim=32, ff_size=64, num_layers=3,
                         num_heads=2, dropout=0.0, normalize_before=True)
    motion = jnp.asarray(np.random.default_rng(0).normal(
        size=(2, 128, 189)).astype(np.float32))
    latent, (mu, _), _ = vae.apply(
        {"params": params["vae"]}, motion, method=vae.encode)

    with torch.no_grad():
        _, dist, _ = tvae.encode(torch.from_numpy(np.asarray(motion)),
                                 [128, 128])
    np.testing.assert_allclose(
        np.asarray(mu).reshape(2, 2 * 8, 32),
        dist.loc.numpy().reshape(2, 16, 32), rtol=2e-3, atol=2e-3)
