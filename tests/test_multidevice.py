"""Multi-device behavior on the virtual 8-CPU mesh: sharded training step
equals single-device numerics; sharded sampling runs; TP placement works."""
import pytest

import numpy as np
import jax
import jax.numpy as jnp
from jax.sharding import NamedSharding, PartitionSpec as P

from convofusion_tpu.config.testing import tiny_config
from convofusion_tpu.data.synthetic import (
    prepare_arrays,
    synthetic_raw_batch,
)
from convofusion_tpu.models.convofusion import Convofusion
from convofusion_tpu.parallel.mesh import create_mesh
from convofusion_tpu.train.trainer import Trainer

pytestmark = pytest.mark.slow  # compile/oracle heavy (see pyproject addopts)


def test_sharded_train_step_matches_single_device():
    cfg = tiny_config("diffusion")
    model = Convofusion(cfg)
    raw = synthetic_raw_batch(0, 8)
    batch, _, _ = prepare_arrays(model, raw)
    key = jax.random.PRNGKey(0)

    t_single = Trainer(model, cfg, mesh=None)
    p1, o1 = t_single.init_state(jax.random.PRNGKey(1))
    s1 = t_single.make_train_step()
    p1, o1, loss1, _ = s1(p1, o1, batch, key)

    mesh = create_mesh(n_data=8, n_model=1)
    t_multi = Trainer(model, cfg, mesh=mesh)
    p8, o8 = t_multi.init_state(jax.random.PRNGKey(1))
    s8 = t_multi.make_train_step()
    p8, o8, loss8, _ = s8(p8, o8, t_multi.shard_batch(batch), key)

    np.testing.assert_allclose(float(loss1), float(loss8), rtol=1e-4)
    # parameters after the update must agree too
    l1 = jax.tree_util.tree_leaves(p1)[0]
    l8 = jax.tree_util.tree_leaves(p8)[0]
    np.testing.assert_allclose(np.asarray(l1), np.asarray(l8),
                               rtol=1e-4, atol=1e-5)


def test_sharded_sampling_matches_single_device():
    """The cli/test.py production sharding (batch over 'data', params
    replicated) must not change the generated motion vs one device."""
    cfg = tiny_config("diffusion")
    model = Convofusion(cfg)
    params = model.init_params(jax.random.PRNGKey(0))
    raw = synthetic_raw_batch(1, 8)
    batch, _, _ = prepare_arrays(model, raw)

    fn = jax.jit(
        lambda p, b, k: model.sample(p, b, k, num_inference_steps=3)[0])
    plain = np.asarray(fn(params, batch, jax.random.PRNGKey(2)))

    mesh = create_mesh(n_data=8, n_model=1)
    data = NamedSharding(mesh, P("data"))
    rep = NamedSharding(mesh, P())
    sharded_batch = jax.tree_util.tree_map(
        lambda x: jax.device_put(jnp.asarray(x), data), batch)
    params_r = jax.device_put(params, rep)

    motion = fn(params_r, sharded_batch, jax.random.PRNGKey(2))
    assert motion.shape == (8, 128, 189)
    # SPMD partitioning reorders reductions -> small fp32 noise
    np.testing.assert_allclose(np.asarray(motion), plain,
                               rtol=1e-4, atol=1e-4)


def test_sharded_rollout_matches_single_device():
    """Data-parallel unbounded rollout: window arrays sharded over the
    'data' axis, params replicated — outputs must equal the unsharded
    rollout bit-for-bit (same keys, same compiled math)."""
    import numpy as np

    from convofusion_tpu.cli.unbounded import rollout
    from convofusion_tpu.config.testing import tiny_config
    from convofusion_tpu.data.synthetic import synthetic_long_batch
    from convofusion_tpu.models.convofusion import Convofusion

    cfg = tiny_config("diffusion")
    model = Convofusion(cfg)
    params = model.init_params(jax.random.PRNGKey(0))
    batch = synthetic_long_batch(11, 8, n_parts=2)

    plain = rollout(model, params, batch, jax.random.PRNGKey(5),
                    num_inference_steps=2, verbose=False)

    mesh = create_mesh(n_data=8, n_model=1)
    data = NamedSharding(mesh, P("data"))
    rep = NamedSharding(mesh, P())
    params_r = jax.device_put(params, rep)
    model2 = Convofusion(cfg)  # fresh sampler cache (no executable reuse)
    sharded = rollout(model2, params_r, batch, jax.random.PRNGKey(5),
                      num_inference_steps=2, verbose=False,
                      data_sharding=data)

    assert len(plain) == len(sharded) == 3
    # SPMD partitioning reorders reductions -> small fp32 noise
    for a, b in zip(plain, sharded):
        np.testing.assert_allclose(a, b, rtol=1e-4, atol=1e-4)


def test_sharded_cached_posterior_step_matches_single_device():
    """The production cli/train layout (vae_mu/vae_logvar batch-leading
    (B,2,8,D), no motion array) must shard over 'data' and match
    single-device numerics."""
    cfg = tiny_config("diffusion")
    model = Convofusion(cfg)
    raw = synthetic_raw_batch(4, 8)
    batch, _, _ = prepare_arrays(model, raw)
    key = jax.random.PRNGKey(2)

    t_single = Trainer(model, cfg, mesh=None)
    p1, o1 = t_single.init_state(jax.random.PRNGKey(1))
    mu, lv = jax.jit(model.encode_vae_posterior)(p1, batch["motion_lsn"])
    cached = dict(batch)
    cached["vae_mu"], cached["vae_logvar"] = mu, lv
    del cached["motion_lsn"]

    s1 = t_single.make_train_step()
    p1, o1, loss1, _ = s1(p1, o1, cached, key)

    mesh = create_mesh(n_data=8, n_model=1)
    t_multi = Trainer(model, cfg, mesh=mesh)
    p8, o8 = t_multi.init_state(jax.random.PRNGKey(1))
    s8 = t_multi.make_train_step()
    p8, o8, loss8, _ = s8(p8, o8, t_multi.shard_batch(cached), key)

    np.testing.assert_allclose(float(loss1), float(loss8), rtol=1e-4)
    l1 = jax.tree_util.tree_leaves(p1)[0]
    l8 = jax.tree_util.tree_leaves(p8)[0]
    np.testing.assert_allclose(np.asarray(l1), np.asarray(l8),
                               rtol=1e-4, atol=1e-5)
