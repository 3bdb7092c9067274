"""Background input pipeline (train/prefetch.py): ordering, exception
propagation, early-abandon shutdown, and jax staging from the thread."""
import time

import numpy as np
import pytest

from convofusion_tpu.train.prefetch import prefetch


def test_prefetch_preserves_order_and_values():
    items = list(range(20))
    out = list(prefetch(items, lambda x: x * x, depth=3))
    assert out == [x * x for x in items]


def test_prefetch_depth_zero_is_inline():
    seen = []

    def prep(x):
        seen.append(x)
        return x

    gen = prefetch(iter([1, 2, 3]), prep, depth=0)
    assert next(gen) == 1
    assert seen == [1]  # nothing ran ahead
    assert list(gen) == [2, 3]


def test_prefetch_runs_ahead():
    started = []

    def prep(x):
        started.append(x)
        return x

    gen = prefetch(list(range(10)), prep, depth=4)
    first = next(gen)
    time.sleep(0.2)
    assert first == 0
    # with the consumer stalled, the producer filled the lookahead
    assert len(started) >= 4
    assert list(gen) == list(range(1, 10))


def test_prefetch_propagates_exceptions_in_position():
    def source():
        yield 1
        yield 2
        raise RuntimeError("loader failed")

    gen = prefetch(source(), depth=2)
    assert next(gen) == 1
    assert next(gen) == 2
    with pytest.raises(RuntimeError, match="loader failed"):
        next(gen)


def test_prefetch_prepare_exception():
    def prep(x):
        if x == 1:
            raise ValueError("bad batch")
        return x

    gen = prefetch([0, 1, 2], prep, depth=2)
    assert next(gen) == 0
    with pytest.raises(ValueError, match="bad batch"):
        list(gen)


def test_prefetch_early_break_shuts_down():
    produced = []

    def prep(x):
        produced.append(x)
        time.sleep(0.01)
        return x

    gen = prefetch(list(range(1000)), prep, depth=2)
    for i, x in enumerate(gen):
        if i == 3:
            break
    gen.close()
    n = len(produced)
    time.sleep(0.2)
    # the producer stopped near where the consumer left off
    assert len(produced) <= n + 3 < 20


def test_prefetch_stages_jax_arrays():
    import jax
    import jax.numpy as jnp

    batches = [{"x": np.full((4, 8), i, np.float32)} for i in range(5)]

    def stage(b):
        return {k: jnp.asarray(v) for k, v in b.items()}

    outs = list(prefetch(batches, stage, depth=2))
    assert all(isinstance(o["x"], jax.Array) for o in outs)
    np.testing.assert_array_equal(np.asarray(outs[3]["x"]), batches[3]["x"])


def test_prefetch_close_bounded_when_producer_hangs():
    """ADVICE r2: abandoning the iterator while the producer is stuck
    inside prepare_fn must not hang generator close — the drain gives up
    after ~5s and relies on the daemon flag."""
    import threading
    import time

    release = threading.Event()

    def prep(x):
        if x == 1:
            release.wait(30)  # simulate a hung device transfer
        return x

    gen = prefetch(list(range(5)), prep, depth=1)
    assert next(gen) == 0
    t0 = time.time()
    gen.close()
    elapsed = time.time() - t0
    release.set()
    assert elapsed < 10, f"close took {elapsed:.1f}s"
