"""Serving subsystem: micro-batching, occupancy, WEG focus routing, the
HTTP endpoint, and weight swaps (convofusion_tpu/serving.py)."""
import json
import threading
import time
import urllib.error
import urllib.request

import jax
import numpy as np
import pytest

from convofusion_tpu.config.testing import tiny_config
from convofusion_tpu.models.convofusion import Convofusion
from convofusion_tpu.serving import (
    GestureRequest,
    GestureService,
    ServiceOverloaded,
    serve_http,
)

STEPS = 3


@pytest.fixture(scope="module")
def service_setup():
    cfg = tiny_config("diffusion")
    model = Convofusion(cfg)
    params = model.init_params(jax.random.PRNGKey(0))
    return model, params


def _req(i: int) -> GestureRequest:
    rng = np.random.default_rng(i)
    return GestureRequest(
        text_lsn=f"a nod about dragons {i}",
        text_spk=f"we talk about maps {i}",
        melspec=rng.uniform(-80, 0, (161, 80)).astype(np.float32),
        active_passive=rng.integers(0, 2, 8).astype(np.int32),
        lsn_id=int(rng.integers(1, 36)),
    )


def test_microbatching_and_occupancy(service_setup):
    model, params = service_setup
    svc = GestureService(model, params, batch_size=4, max_wait_ms=300,
                         num_inference_steps=STEPS)
    try:
        futs = [svc.submit(_req(i)) for i in range(6)]
        motions = [f.result(timeout=600) for f in futs]
        for m in motions:
            assert m.shape == (128, 189)
            assert np.isfinite(m).all()
        # 6 requests, batch 4 -> one full batch + one half batch
        st = svc.stats()
        assert st["requests"] == 6
        assert st["batches"] == 2
        assert st["occupancy"] == pytest.approx(6 / 8)
        assert np.isfinite(st["latency_p50_ms"])
        # distinct requests produce distinct motion
        assert not np.allclose(motions[0], motions[1])
        svc.reset_stats()
        st = svc.stats()
        assert st["requests"] == 0 and st["batches"] == 0
        assert st["occupancy"] == 0.0
    finally:
        svc.close()


def test_single_request_and_validation(service_setup):
    model, params = service_setup
    svc = GestureService(model, params, batch_size=4, max_wait_ms=5,
                         num_inference_steps=STEPS)
    try:
        # defaults: no mel (silence), no apb (idle), text only
        m = svc.generate(GestureRequest(text_lsn="hello there"),
                         timeout=600)
        assert m.shape == (128, 189) and np.isfinite(m).all()
        with pytest.raises(ValueError, match="melspec"):
            svc.submit(GestureRequest(text_lsn="x",
                                      melspec=np.zeros((3, 3), np.float32)))
        with pytest.raises(ValueError, match="weg"):
            svc.submit(GestureRequest(text_lsn="x", focus_words=("x",)))
    finally:
        svc.close()
    with pytest.raises(RuntimeError):
        svc.submit(GestureRequest(text_lsn="after close"))


def test_backpressure_rejects_when_full(service_setup):
    """Overload behavior: a full intake queue rejects with
    ServiceOverloaded (mapped to HTTP 503) instead of growing latency
    without bound; accepted work still completes."""
    model, params = service_setup
    svc = GestureService(model, params, batch_size=2, max_wait_ms=5,
                         num_inference_steps=STEPS, max_queue=3)
    gate = threading.Event()
    orig_build = svc._build
    svc._build = lambda reqs: (gate.wait(600), orig_build(reqs))[1]
    try:
        # first batch gets pulled into the (gated) builder...
        futs = [svc.submit(_req(i)) for i in range(2)]
        deadline = time.time() + 30
        while svc._q.qsize() and time.time() < deadline:
            time.sleep(0.01)
        assert svc._q.qsize() == 0, "builder never collected the batch"
        # ...then the intake queue fills to max_queue and rejects
        futs += [svc.submit(_req(i)) for i in range(2, 5)]
        with pytest.raises(ServiceOverloaded, match="queue full"):
            svc.submit(_req(5))
        st = svc.stats()
        assert st["rejected"] == 1
        assert st["queue_depth"] == 3
        gate.set()
        for f in futs:
            m = f.result(timeout=600)
            assert m.shape == (128, 189) and np.isfinite(m).all()
        assert svc.stats()["requests"] == 5
    finally:
        gate.set()
        svc.close()


@pytest.mark.slow
def test_weg_service_routes_focus(service_setup):
    model, params = service_setup
    svc = GestureService(model, params, batch_size=2, max_wait_ms=200,
                         num_inference_steps=STEPS, weg=True,
                         weg_max_focus=4)
    try:
        r0 = _req(0)
        r0.focus_words = ("dragons",)
        futs = [svc.submit(r0), svc.submit(_req(1))]
        for f in futs:
            m = f.result(timeout=600)
            assert m.shape == (128, 189) and np.isfinite(m).all()
        assert svc.stats()["batches"] == 1
    finally:
        svc.close()


def test_update_params_invalidates_uncond(service_setup):
    model, params = service_setup
    svc = GestureService(model, params, batch_size=2, max_wait_ms=5,
                         num_inference_steps=STEPS)
    try:
        m0 = svc.generate(_req(0), timeout=600)
        params2 = jax.tree_util.tree_map(lambda x: x * 1.05, params)
        svc.update_params(params2)
        m1 = svc.generate(_req(0), timeout=600)
        # same request, same service — different weights must show up
        # (the uncond cache must NOT serve stale encodes: ADVICE r2)
        assert not np.allclose(m0, m1)
    finally:
        svc.close()


def test_http_endpoint(service_setup):
    model, params = service_setup
    svc = GestureService(model, params, batch_size=2, max_wait_ms=100,
                         num_inference_steps=STEPS)
    server = serve_http(svc, port=0)  # ephemeral port
    t = threading.Thread(target=server.serve_forever, daemon=True)
    t.start()
    try:
        host, port = server.server_address

        def post(obj):
            data = json.dumps(obj).encode()
            req = urllib.request.Request(
                f"http://{host}:{port}/generate", data=data,
                headers={"Content-Type": "application/json"})
            return json.loads(urllib.request.urlopen(req, timeout=600)
                              .read())

        results = [None, None]

        def go(i):
            results[i] = post({"text": f"hello dragon {i}",
                               "lsn_id": i + 1})

        threads = [threading.Thread(target=go, args=(i,)) for i in (0, 1)]
        for th in threads:
            th.start()
        for th in threads:
            th.join(timeout=600)
        for r in results:
            assert r is not None
            motion = np.asarray(r["motion"])
            assert motion.shape == (128, 189)
            assert np.isfinite(motion).all()
            assert r["latency_ms"] > 0
        # health + stats endpoints
        with urllib.request.urlopen(
                f"http://{host}:{port}/healthz", timeout=30) as resp:
            assert json.loads(resp.read())["ok"]
        with urllib.request.urlopen(
                f"http://{host}:{port}/stats", timeout=30) as resp:
            st = json.loads(resp.read())
        assert st["requests"] >= 2
        # bad request -> 400, not a crash
        bad = urllib.request.Request(
            f"http://{host}:{port}/generate",
            data=json.dumps({"text": "x", "melspec": [[0.0]]}).encode(),
            headers={"Content-Type": "application/json"})
        try:
            urllib.request.urlopen(bad, timeout=30)
            assert False, "expected HTTP 400"
        except urllib.error.HTTPError as e:
            assert e.code == 400
    finally:
        server.shutdown()
        svc.close()


def test_build_service_from_config():
    """CLI surface (python -m convofusion_tpu.serving): build_service
    wires the SERVE/TEST/scheduler config knobs into a working service."""
    from convofusion_tpu.serving import build_service

    cfg = tiny_config("diffusion")
    cfg.model.scheduler["num_inference_timesteps"] = STEPS
    cfg.TRAIN.ABLATION["WEG_TYPE"] = "no"
    cfg["SERVE"] = {"BATCH_SIZE": 2, "MAX_WAIT_MS": 30.0}
    svc = build_service(cfg)
    try:
        assert svc.batch_size == 2 and not svc.weg
        m = svc.generate(_req(0), timeout=600)
        assert m.shape == (128, 189)
        assert np.isfinite(m).all()
    finally:
        svc.close()


def test_service_batch_equals_direct_sample(service_setup):
    """A full service micro-batch must be numerically identical to a
    direct cached-sampler call over the same assembled arrays and key —
    micro-batching adds routing, not math."""
    model, params = service_setup
    reqs = [_req(i) for i in range(4)]
    svc = GestureService(model, params, batch_size=4, max_wait_ms=2000,
                         num_inference_steps=STEPS, seed=123)
    try:
        futs = [svc.submit(r) for r in reqs]
        served = np.stack([f.result(timeout=600) for f in futs])
    finally:
        svc.close()

    # reproduce the service's dataflow: same batch assembly, same
    # sampler cache, same first key drawn from seed 123
    arrays, focus = svc._build(reqs)
    key = jax.random.split(jax.random.PRNGKey(123))[1]
    sampler = model.cached_sampler(num_inference_steps=STEPS)
    motion, _, _ = sampler(params, arrays, key, focus=focus)
    np.testing.assert_allclose(served, np.asarray(motion),
                               rtol=1e-5, atol=1e-5)
