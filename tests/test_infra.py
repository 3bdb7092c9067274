"""Infra pieces: text-embedding cache, progress logger, checkpoint
surgeries."""
import pytest
import logging

import numpy as np

from convofusion_tpu.callback.progress import (
    ProgressLogger,
    host_memory_percent,
)
from convofusion_tpu.models.text_cache import TextEmbeddingCache
from convofusion_tpu.train.checkpoint import (
    reinject_frozen_text_model,
    strip_frozen_text_model,
)


def test_text_cache_hits_and_disk(tmp_path):
    cache = TextEmbeddingCache(str(tmp_path))
    calls = []

    def encode(texts):
        calls.append(list(texts))
        emb = np.stack([np.full((4, 8), hash(t) % 97, np.float32)
                        for t in texts])
        mask = np.ones((len(texts), 4), bool)
        return emb, mask

    texts = ["hello there", "general kenobi", "hello there"]
    emb, mask = cache.encode_batch(texts, 4, encode)
    assert emb.shape == (3, 4, 8)
    assert calls == [["hello there", "general kenobi"]]  # dedup within call
    np.testing.assert_array_equal(emb[0], emb[2])

    # second batch: all hits, encoder not called
    emb2, _ = cache.encode_batch(["general kenobi"], 4, encode)
    assert len(calls) == 1
    np.testing.assert_array_equal(emb2[0], emb[1])

    # fresh cache instance reads from disk
    cache2 = TextEmbeddingCache(str(tmp_path))
    emb3, _ = cache2.encode_batch(["hello there"], 4, encode)
    assert len(calls) == 1
    np.testing.assert_array_equal(emb3[0], emb[0])


def test_progress_logger_and_meminfo(caplog):
    assert host_memory_percent() is None or 0 < host_memory_percent() < 100
    logger = logging.getLogger("test_progress")
    pl = ProgressLogger(logger, {"loss": "total"})
    with caplog.at_level(logging.INFO, logger="test_progress"):
        pl.on_epoch_end(3, {"total": 1.25, "other": 9.0})
    assert "Epoch 3" in caplog.text and "1.2500" in caplog.text


def test_strip_and_reinject_text_model():
    current = {"text_encoder": {"text_model": {"w": np.ones(3)},
                                "projection_1": {"kernel": np.zeros(2)}},
               "denoiser": {"x": np.ones(1)}}
    stripped = strip_frozen_text_model(current)
    assert "text_model" not in stripped["text_encoder"]
    assert "projection_1" in stripped["text_encoder"]
    restored = reinject_frozen_text_model(stripped, current)
    np.testing.assert_array_equal(
        restored["text_encoder"]["text_model"]["w"], np.ones(3))


def test_aggregate_terms_skips_nan_steps():
    """Epoch metric aggregation skips NaN steps like the reference's
    epoch-end collection (base.py:54-55)."""
    import numpy as np

    from convofusion_tpu.utils.metrics_logger import (
        aggregate_terms,
        loss2logname,
    )

    terms = [
        {"total": 1.0, "recon_loss": 2.0},
        {"total": float("nan"), "recon_loss": 4.0},
        {"total": 3.0, "recon_loss": float("nan")},
    ]
    out = aggregate_terms(terms, "train")
    assert out[loss2logname("total", "train")] == 2.0
    assert out[loss2logname("recon_loss", "train")] == 3.0

    # all-NaN column stays NaN rather than crashing
    out2 = aggregate_terms([{"x_loss": float("nan")}], "val")
    assert np.isnan(out2[loss2logname("x_loss", "val")])
    assert aggregate_terms([], "train") == {}


@pytest.mark.slow
def test_checkpoint_resume_roundtrip(tmp_path):
    """save_checkpoint + load_checkpoint(opt_state_template=...) must
    return an optimizer state the jitted step can keep training with —
    a template-less orbax restore yields plain dicts that
    optimizer.update cannot traverse (optax states are typed pytrees)."""
    import jax
    import numpy as np

    from convofusion_tpu.config.testing import tiny_config
    from convofusion_tpu.data.synthetic import (
        prepare_arrays,
        synthetic_raw_batch,
    )
    from convofusion_tpu.models.convofusion import Convofusion
    from convofusion_tpu.train.checkpoint import (
        load_checkpoint,
        save_checkpoint,
    )
    from convofusion_tpu.train.trainer import Trainer

    cfg = tiny_config("diffusion")
    model = Convofusion(cfg)
    trainer = Trainer(model, cfg, mesh=None)
    params, opt_state = trainer.init_state(jax.random.PRNGKey(0))
    batch, _, _ = prepare_arrays(model, synthetic_raw_batch(0, 4))
    step = trainer.make_train_step()
    params, opt_state, _, _ = step(params, opt_state, batch,
                                   jax.random.PRNGKey(1))

    path = save_checkpoint(str(tmp_path), 0, params, opt_state)

    fresh_params = model.init_params(jax.random.PRNGKey(0))
    _, fresh_opt = trainer.init_state(jax.random.PRNGKey(0))
    p2, o2 = load_checkpoint(path, fresh_params,
                             opt_state_template=fresh_opt)

    # restored state must be live: another step runs and the adam moments
    # carried over (param values diverge from a fresh-state step)
    p2, o2, loss2, _ = step(p2, o2, batch, jax.random.PRNGKey(2))
    assert np.isfinite(float(loss2))
    leaves_saved = jax.tree_util.tree_leaves(opt_state)
    leaves_restored = jax.tree_util.tree_leaves(o2)
    assert len(leaves_saved) == len(leaves_restored)


def test_checkpoint_resume_mismatched_opt_state_falls_back(tmp_path):
    """Checkpoints written under a different optimizer structure must
    still resume (params only, fresh optimizer state) with a warning."""
    import warnings

    import jax
    import optax

    from convofusion_tpu.config.testing import tiny_config
    from convofusion_tpu.models.convofusion import Convofusion
    from convofusion_tpu.train.checkpoint import (
        load_checkpoint,
        save_checkpoint,
    )
    from convofusion_tpu.train.trainer import Trainer

    cfg = tiny_config("diffusion")
    model = Convofusion(cfg)
    params = model.init_params(jax.random.PRNGKey(0))
    old_opt_state = optax.adamw(1e-4).init(params)  # pre-masking format
    path = save_checkpoint(str(tmp_path), 3, params, old_opt_state)

    trainer = Trainer(model, cfg, mesh=None)
    _, new_template = trainer.init_state(jax.random.PRNGKey(0))
    with warnings.catch_warnings(record=True) as caught:
        warnings.simplefilter("always")
        p2, o2 = load_checkpoint(path, params,
                                 opt_state_template=new_template)
    assert o2 is None
    assert any("does not match" in str(w.message) for w in caught)
    assert set(p2) == set(params)


def test_reinject_keeps_checkpoint_trunk_when_present():
    """A checkpoint converted with keep_text_model=True carries REAL T5
    weights; reinject must not overwrite them with the session init."""
    import numpy as np

    from convofusion_tpu.train.checkpoint import (
        reinject_frozen_text_model,
        strip_frozen_text_model,
    )

    loaded = {"text_encoder": {"text_model": {"w": np.ones(2)},
                               "projection_1": {"k": np.ones(1)}}}
    current = {"text_encoder": {"text_model": {"w": np.zeros(2)}}}
    out = reinject_frozen_text_model(loaded, current)
    assert (out["text_encoder"]["text_model"]["w"] == 1).all()

    # stripped checkpoints still get the live trunk injected
    stripped = strip_frozen_text_model(loaded)
    out2 = reinject_frozen_text_model(stripped, current)
    assert (out2["text_encoder"]["text_model"]["w"] == 0).all()


def test_cached_sampler_uncond_invalidates_on_new_params():
    """ADVICE r2 (medium): the uncond cache must not serve encodings
    computed from old weights after the caller swaps params (multi-
    checkpoint eval, train-then-sample)."""
    import jax.numpy as jnp

    from convofusion_tpu.models.convofusion import CachedSampler

    class Stub:
        @staticmethod
        def encode_uncond(params, arrays):
            return params["w"] * 1.0

    cs = CachedSampler(Stub())
    arrays = {k: jnp.zeros((2, 3)) for k in (
        "uncond_ids", "uncond_tmask", "melspec_lsn",
        "active_passive_lsn", "lsn_id")}
    p1 = {"w": jnp.asarray(2.0)}
    u1 = cs.uncond_for(p1, arrays)
    assert float(u1) == 2.0
    assert cs.uncond_for(p1, arrays) is u1  # same weights: cache hit
    p2 = {"w": jnp.asarray(5.0)}
    assert float(cs.uncond_for(p2, arrays)) == 5.0  # new weights: recompute
    cs.invalidate()
    assert cs._uncond == {}
