"""GPVServer: asynchronous batching inference server.

Production-serving runtime around `GPVEngine` (the reference has no serving
story beyond one-off CLIs): requests are queued, coalesced into fixed-size
batches (static XLA shapes; partial batches pad by repetition), executed on
the jitted engine by a pool of worker threads (>=2 keeps one batch in
flight while another fetches — the double-buffering that hits the device
compute bound, see bench.py), and resolved through futures.
"""
from __future__ import annotations

import queue
import threading
import time
from collections import deque
from concurrent.futures import Future
from typing import List, Optional

import numpy as np


class GPVServer:
    def __init__(self, engine, batch_size: int = 20,
                 max_wait_ms: float = 5.0, num_workers: int = 2,
                 bucket_sizes=None, warmup=None):
        """bucket_sizes: optional ascending pad targets (e.g. (1, 8, 64)).
        A collected batch of n requests pads to the smallest bucket >= n
        instead of always to batch_size, so a lone request under low load
        does not pay a full padded batch (each bucket is one extra XLA
        executable — static shapes). The largest bucket is the batch size.
        warmup: optional (H, W) — compile every bucket at construction for
        that image size, both the mask-less and the vocab-masked executable
        (mask CONTENT doesn't matter for compilation — all masks share one
        (V,) float32 shape — so this covers every later masked request).
        Otherwise the first request at each (occupancy, masked?) level pays
        its compile."""
        self.engine = engine
        if bucket_sizes:
            bucket_sizes = sorted(int(b) for b in bucket_sizes)
            batch_size = bucket_sizes[-1]
        self.buckets = tuple(bucket_sizes or (batch_size,))
        self.batch_size = batch_size
        self.max_wait_s = max_wait_ms / 1000.0
        if warmup:
            h, w = warmup
            vm = np.zeros((len(engine.vocab),), np.float32)
            for b in self.buckets:
                engine.predict(np.zeros((b, h, w, 3), np.uint8),
                               ["warm up"] * b)
                engine.predict(np.zeros((b, h, w, 3), np.uint8),
                               ["warm up"] * b, vm)
        self._q: "queue.Queue" = queue.Queue()
        # requests deferred by mask-mismatch, served BEFORE the queue at the
        # next collection so a minority-mask request cannot be starved by a
        # sustained majority-mask stream
        self._pending: list = []
        self._pending_lock = threading.Lock()
        # observability: counters + a bounded latency reservoir (the last
        # 1000 request latencies), snapshot by stats()
        self._stats_lock = threading.Lock()
        self._submitted = 0
        self._completed = 0
        self._failed = 0
        self._deferred = 0
        self._batches = {b: 0 for b in self.buckets}
        self._occupied_rows = 0
        self._padded_rows = 0
        self._latencies: deque = deque(maxlen=1000)
        self._closed = threading.Event()
        self._closing = threading.Event()  # reject submits while draining
        # submit/close serialization + busy-worker count: close(drain=True)
        # must not declare the server idle while a worker holds popped
        # items, and a submit that passed the closing check must not land
        # in the queue after close() already drained it
        self._lifecycle_lock = threading.Lock()
        self._busy = 0
        self._workers = [
            threading.Thread(target=self._worker, daemon=True)
            for _ in range(max(1, num_workers))]
        for w in self._workers:
            w.start()

    def submit(self, image_uint8: np.ndarray, query: str,
               vocab_mask: Optional[np.ndarray] = None,
               beam_size: Optional[int] = None) -> Future:
        """Enqueue one request; resolves to {answer, boxes, relevance}.

        beam_size (any K >= 1, None = greedy) routes the request through
        `engine.predict_beam` (resolves to {answers: [str x K],
        answer_probs, boxes, relevance, answer} — `answer` is the top
        beam, so greedy and beam clients can read the same field; K=1 is
        honored as a 1-beam search so a beam client ALWAYS gets the
        `answers` key). Requests only share a batch when BOTH their vocab
        mask and beam size match; beam executables compile on first use
        (warmup covers the greedy ones)."""
        fut: Future = Future()
        beam = None if beam_size is None else int(beam_size)
        if beam is not None and beam < 1:
            raise ValueError(f"beam_size must be >= 1, got {beam}")
        if beam is not None and not hasattr(self.engine, "predict_beam"):
            # fail at the door with the same message the HTTP layer gives a
            # 400 — otherwise the AttributeError would surface inside
            # _execute and fail the whole coalesced batch opaquely
            raise ValueError(
                "beam_size requested but this engine does not support beam "
                "search (no predict_beam; exported bundles serve greedy "
                "only)")
        with self._lifecycle_lock:
            # check-and-enqueue is atomic vs close(): no request can slip
            # into the queue after close() drained and cancelled leftovers
            if self._closed.is_set() or self._closing.is_set():
                raise RuntimeError("server closed")
            self._q.put((image_uint8, query, vocab_mask, beam, fut,
                         time.monotonic()))
        with self._stats_lock:
            self._submitted += 1
        return fut

    @staticmethod
    def _mask_key(mask) -> Optional[tuple]:
        """Identity key for a vocab mask: requests may only share a batch
        when their masks are byte-identical (engine.predict applies ONE mask
        to the whole batch — mixing e.g. a classification mask with open VQA
        would silently corrupt the open request's decode)."""
        if mask is None:
            return None
        m = np.asarray(mask)
        return (m.shape, m.dtype.str, m.tobytes())

    @classmethod
    def _batch_key(cls, item) -> tuple:
        """Requests coalesce only on (mask identity, beam size)."""
        return (cls._mask_key(item[2]), item[3])

    def _collect(self):
        """Collect up to batch_size requests sharing one vocab mask.

        Previously-deferred requests (mask mismatch) are served FIRST: the
        oldest deferred request seeds the batch, so every request is served
        within one batch of reaching the deferred list — no starvation
        under a sustained stream of another mask.
        """
        with self._pending_lock:
            if self._pending:
                first = self._pending.pop(0)
            else:
                first = None
        if first is None:
            try:
                first = self._q.get(timeout=0.1)
            except queue.Empty:
                return None
        # from here until _execute completes this worker HOLDS requests that
        # are in neither _q nor _pending; close(drain=True) must not declare
        # the server idle meanwhile (the worker decrements after _execute)
        with self._lifecycle_lock:
            self._busy += 1
        items = [first]
        key = self._batch_key(first)
        deferred = []
        deadline = time.monotonic() + self.max_wait_s
        # same-mask requests already deferred join this batch first
        with self._pending_lock:
            keep = []
            for it in self._pending:
                if len(items) < self.batch_size and \
                        self._batch_key(it) == key:
                    items.append(it)
                else:
                    keep.append(it)
            self._pending[:] = keep
        while len(items) < self.batch_size:
            remaining = deadline - time.monotonic()
            if remaining <= 0:
                break
            try:
                it = self._q.get(timeout=remaining)
            except queue.Empty:
                break
            if self._batch_key(it) == key:
                items.append(it)
            else:
                deferred.append(it)
        if deferred:
            late = []
            with self._pending_lock:
                self._pending.extend(deferred)
                if self._closed.is_set():
                    # this worker outlived close()'s pending-cancel
                    # snapshot; nothing will ever serve these — cancel
                    # under the same lock so no future is stranded
                    late = list(self._pending)
                    self._pending.clear()
            for it in late:
                it[4].cancel()
            with self._stats_lock:
                self._deferred += len(deferred)
        return items

    def _worker(self):
        while not self._closed.is_set():
            items = self._collect()
            if items:
                try:
                    self._execute(items)
                finally:
                    with self._lifecycle_lock:
                        self._busy -= 1

    def _execute(self, items):
        """Run one coalesced batch and resolve its futures."""
        n = len(items)
        images = [it[0] for it in items]
        queries = [it[1] for it in items]
        mask = items[0][2]
        beam = items[0][3]
        # pad to the smallest bucket that fits (static XLA shapes) by
        # repeating the last request — a lone request at low load runs
        # the bucket-1 executable, not a full padded batch
        target = next((b for b in self.buckets if b >= n),
                      self.batch_size)
        while len(images) < target:
            images.append(images[-1])
            queries.append(queries[-1])
        try:
            if beam:
                outs = self.engine.predict_beam(np.stack(images), queries,
                                                beam_size=beam,
                                                vocab_mask=mask)
                for o in outs:
                    o["answer"] = o["answers"][0]  # uniform client field
            else:
                outs = self.engine.predict(np.stack(images), queries, mask)
            done = time.monotonic()
            resolved = []
            for (_, _, _, _, fut, t0), out in zip(items, outs[:n]):
                # a client may have cancelled a queued future; never
                # let that re-route a successful batch to the failure
                # path (or double-count it in the stats)
                if fut.set_running_or_notify_cancel():
                    fut.set_result(out)
                    resolved.append(done - t0)
            with self._stats_lock:
                self._batches[target] = self._batches.get(target, 0) + 1
                self._occupied_rows += n
                self._padded_rows += target - n
                self._completed += len(resolved)
                self._latencies.extend(resolved)
        except Exception as e:
            failed = 0
            for _, _, _, _, fut, _ in items:
                if not fut.done() and fut.set_running_or_notify_cancel():
                    fut.set_exception(e)
                    failed += 1
            with self._stats_lock:
                self._failed += failed

    def stats(self) -> dict:
        """Snapshot of serving counters for monitoring/autoscaling.

        Occupancy = real rows / executed rows (pad-by-repetition waste is
        `1 - occupancy`); latency percentiles are over the last 1000
        completed requests (submit -> result), in milliseconds.
        """
        with self._stats_lock:
            lat = sorted(self._latencies)
            executed = self._occupied_rows + self._padded_rows
            out = {
                "submitted": self._submitted,
                "completed": self._completed,
                "failed": self._failed,
                "queued": self._q.qsize() + len(self._pending),
                "mask_deferrals": self._deferred,
                "batches_per_bucket": dict(self._batches),
                "batch_occupancy": (self._occupied_rows / executed
                                    if executed else None),
                "buckets": list(self.buckets),
            }
        if lat:
            def pct(p):
                return round(1000 * lat[min(len(lat) - 1,
                                            int(p * len(lat)))], 3)
            out["latency_ms"] = {"p50": pct(0.50), "p90": pct(0.90),
                                 "p99": pct(0.99), "n": len(lat)}
        else:
            out["latency_ms"] = None
        return out

    def close(self, drain: bool = True, timeout: float = 120.0):
        """Shut the server down without stranding clients.

        drain=True (default) stops accepting new requests, serves
        everything already queued, then stops the workers. drain=False
        stops immediately. Either way, any request still unresolved after
        shutdown has its future CANCELLED — a client blocked in
        `future.result()` gets CancelledError instead of hanging forever
        (previously queued-but-unserved futures never resolved).
        """
        if self._closed.is_set():
            return
        with self._lifecycle_lock:
            # atomic vs submit(): after this, no new request can enqueue
            self._closing.set()
        if drain:
            deadline = time.monotonic() + timeout
            stable = 0
            while time.monotonic() < deadline:
                with self._lifecycle_lock:
                    idle = self._busy == 0
                with self._pending_lock:
                    no_pending = not self._pending
                # idle must be checked too: a worker may HOLD popped items
                # (e.g. about to defer a mask-mismatched request back to
                # _pending) while both queues look empty. Require the idle
                # state to HOLD across 3 spaced observations: a worker
                # between q.get() and its busy increment is invisible for
                # one instant, but cannot stay so for 30 ms.
                if self._q.empty() and no_pending and idle:
                    stable += 1
                    if stable >= 3:
                        break
                else:
                    stable = 0
                time.sleep(0.01)
        self._closed.set()
        for w in self._workers:
            w.join(timeout=max(1.0, timeout / 4))
        # cancel anything the workers never picked up (or, without drain,
        # whatever was left in flight); under _pending_lock — a worker that
        # outlived its join timeout may still be re-adding deferrals
        with self._pending_lock:
            leftovers = list(self._pending)
            self._pending.clear()
        while True:
            try:
                leftovers.append(self._q.get_nowait())
            except queue.Empty:
                break
        for _, _, _, _, fut, _ in leftovers:
            fut.cancel()
