"""The reference repo's production config must build the FULL-SIZE model
(t5-base stack, 9-layer denoiser, 5-layer VAE) and initialize params."""
import numpy as np
import pytest

pytestmark = pytest.mark.slow  # compile/oracle heavy (see pyproject addopts)
import jax


@pytest.mark.slow
def test_reference_config_builds_production_model(reference_path):
    import os

    from convofusion_tpu.config import load_config
    from convofusion_tpu.models.convofusion import Convofusion

    ref_cfg = os.path.join(reference_path, "configs")
    cfg = load_config(
        os.path.join(ref_cfg, "config_cf_beatdnd.yaml"),
        assets_path=os.path.join(ref_cfg, "assets.yaml"),
        modules_dir=os.path.join(ref_cfg, "modules"),
        base_path=os.path.join(ref_cfg, "base.yaml"),
    )
    cfg.DATASET.NFEATS = 189
    cfg.DATASET.NJOINTS = 63
    cfg.TPU = {"TEXT_PAD_LEN": 32}

    model = Convofusion(cfg)
    assert model.denoiser.num_layers == 9
    assert model.denoiser.text_encoded_dim == 512
    assert model.vae.num_layers == 5
    assert model.scheduler.num_train_timesteps == 1000
    assert model.guidance_scale == 7.5

    params = model.init_params(jax.random.PRNGKey(0))
    n_params = sum(int(np.prod(x.shape))
                   for x in jax.tree_util.tree_leaves(params))
    # t5-base encoder alone is ~110M; full model well above that
    assert n_params > 100e6
    # t5-base dims flowed through
    assert params["text_encoder"]["text_model"]["block_11"][
        "wi"]["kernel"].shape == (768, 3072)
    assert params["denoiser"]["decoder"]["layers_8"][
        "att_fuser"]["kernel"].shape == (5 * 512, 512)
