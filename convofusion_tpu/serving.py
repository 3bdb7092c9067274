"""Online serving: request micro-batching over the compiled sampler.

The reference has no serving story — its ``test.py`` batch-dumps a fixed
dataset split (test.py:100-140).  Production deployment on TPU wants the
opposite shape: requests arrive one at a time, but the chip wants large
fixed-geometry batches feeding one compiled executable.  This module
bridges the two:

* :class:`GestureService` — accepts single generation requests (listener
  / speaker text, mel spectrogram, active/passive bits, listener id,
  optional focus words), groups them into fixed-size micro-batches
  (padding the tail by repeating the last request so the compiled
  geometry never changes), runs them through
  :meth:`Convofusion.cached_sampler` — compiled executables and the
  per-geometry uncond encodes are shared across batches and with any
  other caller — and resolves per-request futures with the
  (128, nfeats) motion slice.
* :func:`serve_http` — a stdlib ``ThreadingHTTPServer`` JSON endpoint
  around a service (``POST /generate``, ``GET /stats``, ``GET /healthz``).
  No extra dependencies.

TPU design notes: the worker is a three-stage pipeline.  A *builder*
thread collects requests and does all host work (tokenization, numpy
batch assembly, focus-index mapping); a *device* thread — the only
thread that ever dispatches jax computation — runs the compiled
sampler, which returns asynchronously while the chip works; a *fetch*
thread blocks on results, resolves futures and accounts stats.
Bounded queues between the stages double-buffer, so at steady state
batch N+1 is being built and batch N+2's requests queued while batch N
runs on the chip and batch N-1's motion is fetched: service throughput
tracks device batch time instead of host + device + fetch.  A fixed
batch size means one executable per (weg on/off) for the
service's lifetime; the tail padding costs at most one batch of wasted
rows when traffic drains, and occupancy is exported via
:meth:`GestureService.stats`.  Weight swaps
(:meth:`GestureService.update_params`) are picked up at the next batch;
the sampler's uncond cache invalidates itself on params identity
(models/convofusion.CachedSampler.uncond_for).
"""
from __future__ import annotations

import json
import logging
import queue
import threading
import time
from concurrent.futures import Future
from dataclasses import dataclass, field
from typing import Dict, List, Optional, Sequence

import numpy as np



def _resolve(fut: Future, value=None, exc=None) -> None:
    """Resolve a request future, tolerating client-side ``cancel()``:
    ``set_result`` on a cancelled Future raises ``InvalidStateError``,
    which must not poison the rest of the micro-batch."""
    try:
        if fut.done():
            return
        if exc is not None:
            fut.set_exception(exc)
        else:
            fut.set_result(value)
    except Exception:
        pass  # lost the race with a concurrent cancel()


@dataclass
class GestureRequest:
    """One generation request (the per-sample fields of the reference's
    test batch, BEAT_DnD collate — dataset.py:744-780)."""

    text_lsn: str
    text_spk: str = ""
    melspec: Optional[np.ndarray] = None  # (mel_frames, n_mels) dB
    active_passive: Optional[np.ndarray] = None  # (n_chunks,) in {0,1,2}
    lsn_id: int = 0
    focus_words: Sequence[str] = field(default_factory=tuple)

    @classmethod
    def from_json(cls, obj: Dict) -> "GestureRequest":
        mel = obj.get("melspec")
        apb = obj.get("active_passive")
        return cls(
            text_lsn=str(obj.get("text_lsn", obj.get("text", ""))),
            text_spk=str(obj.get("text_spk", "")),
            melspec=None if mel is None else np.asarray(mel, np.float32),
            active_passive=None if apb is None else np.asarray(apb,
                                                               np.int32),
            lsn_id=int(obj.get("lsn_id", 0)),
            focus_words=tuple(obj.get("focus_words", ())),
        )


class ServiceOverloaded(RuntimeError):
    """Raised by :meth:`GestureService.submit` when the intake queue is
    at ``max_queue`` — callers should back off and retry; the HTTP
    front-end maps this to 503 + Retry-After."""


class GestureService:
    """Micro-batching gesture generation service.

    ``batch_size`` fixes the compiled geometry; ``max_wait_ms`` bounds
    the time the first request of a batch waits for company.  ``weg``
    compiles the word-excitation-guidance path and honors per-request
    ``focus_words`` (requests without focus words run with an all-invalid
    focus mask, which is a no-op refinement).

    ``max_queue`` bounds the intake queue (default ``8 * batch_size``):
    when producers outrun the device, further submits raise
    :class:`ServiceOverloaded` instead of growing latency without bound.
    Pass ``0`` for unbounded intake.
    """

    def __init__(self, model, params, batch_size: int = 8,
                 max_wait_ms: float = 25.0,
                 num_inference_steps: Optional[int] = None,
                 weg: bool = False, weg_max_focus: int = 8,
                 mel_frames: int = 161, n_mels: int = 80,
                 n_chunks: int = 8, seed: int = 0,
                 max_queue: Optional[int] = None):
        import jax

        self.model = model
        self._params = params
        self._params_lock = threading.Lock()
        self.batch_size = int(batch_size)
        self.max_wait = float(max_wait_ms) / 1e3
        self.weg = bool(weg)
        self.weg_max_focus = int(weg_max_focus)
        self.mel_shape = (int(mel_frames), int(n_mels))
        self.n_chunks = int(n_chunks)
        self._sampler = model.cached_sampler(
            num_inference_steps=num_inference_steps)
        self._key = jax.random.PRNGKey(seed)
        self.max_queue = (8 * self.batch_size if max_queue is None
                          else int(max_queue))
        self._q: "queue.Queue" = queue.Queue()
        # one-slot hand-off: the builder assembles batch N+1 on host CPU
        # while the device thread runs batch N on the chip
        self._ready: "queue.Queue" = queue.Queue(maxsize=1)
        # dispatched-but-unfetched batches (jax dispatch is async; the
        # fetch thread blocks on the device result, the device thread
        # doesn't) — maxsize bounds in-flight device memory
        self._done: "queue.Queue" = queue.Queue(maxsize=2)
        self._stats_lock = threading.Lock()
        # orders submit()'s closed-check+enqueue against close()'s
        # sentinel+drain, so no future can slip in behind the drain
        self._submit_lock = threading.Lock()
        self._n_requests = 0
        self._n_batches = 0
        self._n_rejected = 0
        self._rows_used = 0
        self._latencies: List[float] = []
        self._closed = False
        self._builder = threading.Thread(target=self._run_build,
                                         daemon=True,
                                         name="gesture-service-build")
        self._worker = threading.Thread(target=self._run_device,
                                        daemon=True,
                                        name="gesture-service-device")
        self._fetcher = threading.Thread(target=self._run_fetch,
                                         daemon=True,
                                         name="gesture-service-fetch")
        self._builder.start()
        self._worker.start()
        self._fetcher.start()

    # ------------------------------------------------------------ client API
    def submit(self, request: GestureRequest) -> Future:
        """Enqueue; the future resolves to motion (128, nfeats) float32."""
        self._validate(request)
        with self._submit_lock:
            if self._closed:
                raise RuntimeError("service is closed")
            # backpressure: reject instead of queueing unbounded latency
            # (qsize is exact here — submits are serialized by this lock
            # and the consumer only ever shrinks the queue)
            if self.max_queue and self._q.qsize() >= self.max_queue:
                with self._stats_lock:
                    self._n_rejected += 1
                raise ServiceOverloaded(
                    f"intake queue full ({self.max_queue} requests); "
                    f"retry later")
            fut: Future = Future()
            self._q.put((request, fut, time.perf_counter()))
        return fut

    def generate(self, request: GestureRequest,
                 timeout: Optional[float] = None) -> np.ndarray:
        return self.submit(request).result(timeout=timeout)

    def update_params(self, params) -> None:
        """Swap model weights; takes effect at the next micro-batch.
        The sampler's uncond cache self-invalidates on params identity."""
        with self._params_lock:
            self._params = params

    def stats(self) -> Dict:
        with self._stats_lock:
            lat = sorted(self._latencies)

            def pct(p):
                return lat[min(len(lat) - 1, int(p * len(lat)))] if lat \
                    else float("nan")

            cap = self._n_batches * self.batch_size
            return {
                "requests": self._n_requests,
                "batches": self._n_batches,
                "rejected": self._n_rejected,
                "queue_depth": self._q.qsize(),
                "occupancy": (self._rows_used / cap) if cap else 0.0,
                "latency_p50_ms": pct(0.50) * 1e3,
                "latency_p95_ms": pct(0.95) * 1e3,
            }

    def reset_stats(self) -> None:
        """Zero the counters/latency window (e.g. after warmup/compile)."""
        with self._stats_lock:
            self._n_requests = 0
            self._n_batches = 0
            self._n_rejected = 0
            self._rows_used = 0
            self._latencies.clear()

    def close(self, timeout: float = 30.0) -> None:
        """Drain queued requests, stop the pipeline threads.

        Requests already in the queue when the shutdown sentinel lands are
        still served (FIFO); ``_submit_lock`` orders the closed-check +
        enqueue in :meth:`submit` against the sentinel, so nothing can
        land behind it (a drain after the joins catches items from
        workers that died mid-pipeline)."""
        if self._closed:
            return
        with self._submit_lock:
            self._closed = True
            self._q.put(None)
        self._builder.join(timeout=timeout)
        self._worker.join(timeout=timeout)
        self._fetcher.join(timeout=timeout)
        for th in (self._builder, self._worker, self._fetcher):
            if th.is_alive():
                logging.getLogger(__name__).warning(
                    "GestureService.close: %s did not join within %.1fs",
                    th.name, timeout)
        # drain every stage, not just the intake queue: if a stage thread
        # wedged (join timed out above) its downstream batches would
        # otherwise strand futures forever for callers blocked on
        # Future.result() with no timeout
        closed = RuntimeError("service closed")
        while True:
            try:
                item = self._q.get_nowait()
            except queue.Empty:
                break
            if item is not None:
                _resolve(item[1], exc=closed)
        for q in (self._ready, self._done):
            while True:
                try:
                    item = q.get_nowait()
                except queue.Empty:
                    break
                if item is not None:
                    for _, fut, _ in item[-1]:
                        _resolve(fut, exc=closed)

    # --------------------------------------------------------------- worker
    def _validate(self, r: GestureRequest) -> None:
        if r.melspec is not None and tuple(r.melspec.shape) != self.mel_shape:
            raise ValueError(
                f"melspec must be {self.mel_shape}, got {r.melspec.shape}")
        if r.active_passive is not None and \
                tuple(r.active_passive.shape) != (self.n_chunks,):
            raise ValueError(
                f"active_passive must be ({self.n_chunks},), got "
                f"{r.active_passive.shape}")
        if r.focus_words and not self.weg:
            raise ValueError(
                "focus_words given but the service was built with "
                "weg=False")

    def _collect(self) -> Optional[List]:
        item = self._q.get()
        if item is None:
            return None
        batch = [item]
        deadline = time.perf_counter() + self.max_wait
        while len(batch) < self.batch_size:
            remaining = deadline - time.perf_counter()
            if remaining <= 0:
                break
            try:
                nxt = self._q.get(timeout=remaining)
            except queue.Empty:
                break
            if nxt is None:
                self._q.put(None)  # re-post the shutdown sentinel
                break
            batch.append(nxt)
        return batch

    def _run_build(self) -> None:
        """Stage 1: collect requests, do ALL host work (tokenization,
        numpy batch assembly, focus mapping); hand the prepared batch to
        the device thread through the one-slot queue."""
        while True:
            batch = self._collect()
            if batch is None:
                self._ready.put(None)
                return
            try:
                arrays, focus = self._build([r for r, _, _ in batch])
            except Exception as e:
                for _, fut, _ in batch:
                    _resolve(fut, exc=e)
                continue
            self._ready.put((arrays, focus, batch))

    def _run_device(self) -> None:
        """Stage 2: the only thread that dispatches device computation.
        jax dispatch is async — the sampler call returns while the chip
        is still working, so this thread immediately starts the next
        batch; blocking on results happens in the fetch stage."""
        import jax

        while True:
            item = self._ready.get()
            if item is None:
                self._done.put(None)
                return
            arrays, focus, batch = item
            try:
                self._key, k = jax.random.split(self._key)
                with self._params_lock:
                    params = self._params
                motion, _, _ = self._sampler(params, arrays, k,
                                             focus=focus)
                self._done.put((motion, batch))
            except Exception as e:  # resolve, don't kill the worker
                for _, fut, _ in batch:
                    _resolve(fut, exc=e)

    def _run_fetch(self) -> None:
        """Stage 3: block on device results, resolve futures, account."""
        while True:
            item = self._done.get()
            if item is None:
                return
            motion, batch = item
            try:
                n = len(batch)
                motions = np.asarray(motion[:n])
                now = time.perf_counter()
                for i, (_, fut, t0) in enumerate(batch):
                    _resolve(fut, motions[i])
                with self._stats_lock:
                    self._n_requests += n
                    self._n_batches += 1
                    self._rows_used += n
                    self._latencies.extend(
                        now - t0 for _, _, t0 in batch)
                    del self._latencies[:-4096]
            except Exception as e:
                for _, fut, _ in batch:
                    _resolve(fut, exc=e)

    def _build(self, reqs: List[GestureRequest]):
        from convofusion_tpu.models.tokenizer import focus_word_indices

        # fixed geometry: pad the tail with repeats of the last request
        padded = reqs + [reqs[-1]] * (self.batch_size - len(reqs))
        silence = np.full(self.mel_shape, -80.0, np.float32)
        idle = np.full((self.n_chunks,), 2, np.int32)  # 'none' vocab bit
        mel = np.stack([r.melspec if r.melspec is not None else silence
                        for r in padded])
        apb = np.stack([np.asarray(r.active_passive, np.int32)
                        if r.active_passive is not None else idle
                        for r in padded])
        lsn_id = np.asarray([r.lsn_id for r in padded], np.int32)
        texts_lsn = [r.text_lsn for r in padded]
        texts_spk = [r.text_spk or r.text_lsn for r in padded]
        text_arrays, _, tb_lsn = self.model.prepare_text_batch(
            texts_spk, texts_lsn)
        arrays = {
            "melspec_lsn": mel,
            "active_passive_lsn": apb,
            "lsn_id": lsn_id,
            **text_arrays,
        }
        focus = None
        if self.weg:
            wrapped = self.model.tokenizer.wrapped_texts(texts_lsn)
            word_maps = tb_lsn.word_map(wrapped)
            fi, fv = focus_word_indices(
                word_maps, [list(r.focus_words) for r in padded],
                max_indices=self.weg_max_focus)
            focus = {"focus_idx": fi, "focus_valid": fv}
        return arrays, focus


# ------------------------------------------------------------------- HTTP
def serve_http(service: GestureService, host: str = "127.0.0.1",
               port: int = 8476):
    """Wrap a service in a stdlib JSON HTTP server (returns the server;
    call ``.serve_forever()`` or run it from a thread; ``.shutdown()`` to
    stop).  ``POST /generate`` with a :meth:`GestureRequest.from_json`
    body returns ``{"motion": [[...]], "latency_ms": t}``."""
    from http.server import BaseHTTPRequestHandler, ThreadingHTTPServer

    class Handler(BaseHTTPRequestHandler):
        def _send(self, code: int, obj: Dict) -> None:
            body = json.dumps(obj).encode()
            self.send_response(code)
            self.send_header("Content-Type", "application/json")
            self.send_header("Content-Length", str(len(body)))
            self.end_headers()
            self.wfile.write(body)

        def do_GET(self):
            if self.path == "/healthz":
                self._send(200, {"ok": True})
            elif self.path == "/stats":
                self._send(200, service.stats())
            else:
                self._send(404, {"error": "not found"})

        def do_POST(self):
            if self.path != "/generate":
                self._send(404, {"error": "not found"})
                return
            try:
                length = int(self.headers.get("Content-Length", "0"))
                obj = json.loads(self.rfile.read(length) or b"{}")
                req = GestureRequest.from_json(obj)
                t0 = time.perf_counter()
                motion = service.generate(req)
                self._send(200, {
                    "motion": np.asarray(motion, np.float64).tolist(),
                    "latency_ms": (time.perf_counter() - t0) * 1e3,
                })
            except ServiceOverloaded as e:
                # advise one batch window before retrying
                self.send_response(503)
                body = json.dumps({"error": str(e)}).encode()
                self.send_header("Content-Type", "application/json")
                self.send_header("Content-Length", str(len(body)))
                self.send_header("Retry-After", "1")
                self.end_headers()
                self.wfile.write(body)
            except ValueError as e:
                self._send(400, {"error": str(e)})
            except Exception as e:
                self._send(500, {"error": repr(e)})

        def log_message(self, *a):  # quiet by default
            pass

    return ThreadingHTTPServer((host, port), Handler)


# ------------------------------------------------------------------- CLI

def _serve_opt(cfg):
    """SERVE-block lookup shared by :func:`build_service` and
    :func:`main` (one resolution rule for every knob)."""
    serve = cfg.get("SERVE", {})

    def opt(key, default):
        return serve.get(key, default) if hasattr(serve, "get") else default

    return opt


def build_service(cfg, params=None) -> GestureService:
    """Construct a :class:`GestureService` from a merged config.

    Knobs: ``TEST.CHECKPOINTS`` (orbax dir or torch file, same resolution
    as cli/test.py), ``SERVE.BATCH_SIZE`` (default ``TEST.BATCH_SIZE``),
    ``SERVE.MAX_WAIT_MS``, ``SERVE.MAX_QUEUE`` (intake bound; 0 =
    unbounded, absent = 8x batch), ``model.scheduler.
    num_inference_timesteps``, and ``TRAIN.ABLATION.WEG_TYPE`` (any
    value but ``no`` compiles the word-excitation path and honors
    per-request focus words)."""
    import jax

    from convofusion_tpu.config import ablation_flag
    from convofusion_tpu.models.convofusion import Convofusion

    # serving runs without a datamodule, so inject the production feature
    # geometry if no dataset filled it in (dataset.py:523-574 contract)
    if not cfg.DATASET.get("NFEATS"):
        cfg.DATASET.NFEATS = 189
        cfg.DATASET.NJOINTS = 63

    model = Convofusion(cfg)
    if params is None:
        params = model.init_params(
            jax.random.PRNGKey(int(cfg.get("SEED_VALUE", 0))))
        from convofusion_tpu.train.checkpoint import maybe_load_t5_assets

        params = maybe_load_t5_assets(params)  # utils/assets.py drop
        ckpt = str(cfg.TEST.get("CHECKPOINTS", "") or "")
        if ckpt:
            from convofusion_tpu.train.checkpoint import (
                load_checkpoint,
                load_torch_full_model,
            )

            if ckpt.endswith((".ckpt", ".pt", ".pth", ".bin")):
                params = load_torch_full_model(ckpt, params)
            else:
                params, _ = load_checkpoint(ckpt, params)

    opt = _serve_opt(cfg)
    weg_type = ablation_flag(cfg, "WEG_TYPE")
    return GestureService(
        model, params,
        batch_size=int(opt("BATCH_SIZE", cfg.TEST.get("BATCH_SIZE", 8))),
        max_wait_ms=float(opt("MAX_WAIT_MS", 25.0)),
        num_inference_steps=int(
            cfg.model.scheduler.get("num_inference_timesteps", 1000)),
        weg=weg_type != "no",
        seed=int(cfg.get("SEED_VALUE", 0)),
        max_queue=(int(opt("MAX_QUEUE", -1))
                   if int(opt("MAX_QUEUE", -1)) >= 0 else None),
    )


def main(argv=None):
    """``python -m convofusion_tpu.serving --cfg <yaml> [key=value ...]``

    Stands up the micro-batching service plus the JSON HTTP endpoint
    (``POST /generate``, ``GET /stats``, ``GET /healthz``).  Accepts the
    same config schema as cli/test.py; see :func:`build_service` for the
    SERVE-block knobs (``SERVE.HOST``/``SERVE.PORT`` for the listener)."""
    from convofusion_tpu.config import parse_args
    from convofusion_tpu.utils.jaxsetup import setup_jax

    cfg = parse_args("test", argv)
    setup_jax(cfg)
    service = build_service(cfg)
    opt = _serve_opt(cfg)
    server = serve_http(service, host=str(opt("HOST", "127.0.0.1")),
                        port=int(opt("PORT", 8476)))
    host, port = server.server_address[:2]
    print(f"serving on http://{host}:{port} "
          f"(batch={service.batch_size}, wait={service.max_wait * 1e3:.0f}"
          f"ms, weg={service.weg})")
    try:
        server.serve_forever()
    except KeyboardInterrupt:
        pass
    finally:
        server.server_close()
        service.close()


if __name__ == "__main__":
    main()
