"""Background host->device input pipeline.

The reference overlaps host data work with GPU compute via torch
DataLoader worker processes (TRAIN.NUM_WORKERS, data/base.py:85-129).
The TPU-native equivalent is a single prefetch thread: while the device
executes step N (jax dispatch is async), the thread runs the *host*
side of batch N+1 — collate, tokenization, and the device_put that
stages it into HBM — so the accelerator never waits on input.

A thread (not processes) is the right tool here: the datasets load
everything into RAM at init (dataset.py:103-378 semantics), so per-batch
host work is numpy slicing + tokenization, and the device transfer must
happen in the process owning the jax runtime anyway.
"""
from __future__ import annotations

import queue
import sys
import threading
from typing import Callable, Iterable, Iterator, Optional

_OK, _ERR, _DONE = "ok", "err", "done"


def prefetch(iterable: Iterable, prepare_fn: Optional[Callable] = None,
             depth: int = 2) -> Iterator:
    """Iterate ``prepare_fn(item)`` for item in ``iterable``, running the
    preparation ``depth`` items ahead in a background thread.

    ``depth <= 0`` disables the thread (plain in-line mapping).
    Exceptions raised by the iterable or ``prepare_fn`` re-raise in the
    consumer at the position they occurred.
    """
    prepare_fn = prepare_fn or (lambda x: x)
    if depth <= 0:
        for item in iterable:
            yield prepare_fn(item)
        return

    q: queue.Queue = queue.Queue(maxsize=depth)
    stop = threading.Event()

    def producer():
        try:
            for item in iterable:
                if stop.is_set():
                    return
                q.put((_OK, prepare_fn(item)))
            q.put((_DONE, None))
        except BaseException:  # noqa: BLE001 — re-raised consumer-side
            q.put((_ERR, sys.exc_info()))

    thread = threading.Thread(target=producer, daemon=True,
                              name="convofusion-prefetch")
    thread.start()
    try:
        while True:
            tag, payload = q.get()
            if tag is _DONE:
                return
            if tag is _ERR:
                raise payload[1].with_traceback(payload[2])
            yield payload
    finally:
        # consumer abandoned the iterator (break / exception) or it is
        # exhausted: unblock any pending put and retire the producer.
        # The drain is BOUNDED: if the producer is stuck inside
        # prepare_fn (e.g. a hung device transfer) it cannot be joined —
        # give up after ~5s and rely on the daemon flag rather than
        # hanging generator close/GC forever
        stop.set()
        for _ in range(50):
            if not thread.is_alive():
                break
            try:
                q.get_nowait()
            except queue.Empty:
                thread.join(timeout=0.1)
