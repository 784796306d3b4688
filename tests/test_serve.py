"""Batching server tests on the tiny engine."""
import numpy as np
import pytest

import jax
import jax.numpy as jnp

from gpv_tpu.engine import GPVEngine
from gpv_tpu.serve import GPVServer
from gpv_tpu.text.vocab import AnswerVocab
from gpv_tpu.text.wordpiece import WordPieceTokenizer

from test_model import tiny_gpv, VOCAB


@pytest.fixture(scope="module")
def engine():
    from conftest import tiny_init
    model = tiny_gpv()
    vocab = AnswerVocab.debug(size=VOCAB)
    eng = GPVEngine(model, None, vocab, WordPieceTokenizer.debug())
    eng.variables = tiny_init(model)
    return eng


class TestServer:
    def test_all_requests_resolve_and_match_direct(self, engine):
        rng = np.random.RandomState(0)
        images = [rng.randint(0, 255, (48, 64, 3), np.uint8)
                  for _ in range(9)]
        queries = [f"what is {i}?" for i in range(9)]

        server = GPVServer(engine, batch_size=4, max_wait_ms=50,
                           num_workers=1)
        futs = [server.submit(im, q) for im, q in zip(images, queries)]
        results = [f.result(timeout=120) for f in futs]
        server.close()

        # compare against direct single-request predictions
        for im, q, got in zip(images, queries, results):
            ref = engine.predict(im[None], [q])[0]
            assert got["answer"] == ref["answer"]
            np.testing.assert_allclose(got["boxes"], ref["boxes"],
                                       atol=2e-2)

    def test_beam_requests_batch_separately_and_match_direct(self, engine):
        """beam_size routes through predict_beam; beam and greedy requests
        never share a batch (different decode executables); `answer` is
        the top beam so clients read one field either way."""
        rng = np.random.RandomState(3)
        images = [rng.randint(0, 255, (48, 64, 3), np.uint8)
                  for _ in range(4)]
        server = GPVServer(engine, batch_size=2, max_wait_ms=50,
                           num_workers=1)
        futs = [server.submit(im, f"what is {i}?",
                              beam_size=3 if i % 2 else None)
                for i, im in enumerate(images)]
        results = [f.result(timeout=300) for f in futs]
        server.close()
        for i, (im, got) in enumerate(zip(images, results)):
            if i % 2:
                ref = engine.predict_beam(im[None], [f"what is {i}?"],
                                          beam_size=3)[0]
                assert got["answers"] == ref["answers"]
                np.testing.assert_allclose(got["answer_probs"],
                                           ref["answer_probs"], atol=1e-4)
                assert got["answer"] == ref["answers"][0]
            else:
                ref = engine.predict(im[None], [f"what is {i}?"])[0]
                assert got["answer"] == ref["answer"]
                # the SERVER response must not leak beam fields into a
                # greedy request (a batching-key regression would)
                assert "answers" not in got

    def test_beam_size_one_still_returns_answers_key(self, engine):
        """K=1 is honored as a 1-beam search (review r4: silently
        downgrading to greedy broke the 'beam request -> answers key'
        contract); beam_size=0 is rejected loudly."""
        rng = np.random.RandomState(5)
        img = rng.randint(0, 255, (48, 64, 3), np.uint8)
        server = GPVServer(engine, batch_size=1, max_wait_ms=1,
                           num_workers=1)
        try:
            out = server.submit(img, "what?", beam_size=1).result(
                timeout=300)
            assert out["answers"] == [out["answer"]]
            assert len(out["answer_probs"]) == 1
            with pytest.raises(ValueError, match="beam_size"):
                server.submit(img, "what?", beam_size=0)
        finally:
            server.close()

    def test_stats_counters_account_for_all_traffic(self, engine):
        rng = np.random.RandomState(3)
        images = [rng.randint(0, 255, (48, 64, 3), np.uint8)
                  for _ in range(7)]
        server = GPVServer(engine, batch_size=4, max_wait_ms=50,
                           num_workers=1)
        futs = [server.submit(im, f"q {i}")
                for i, im in enumerate(images)]
        for f in futs:
            f.result(timeout=120)
        s = server.stats()
        server.close()
        assert s["submitted"] == 7
        assert s["completed"] == 7
        assert s["failed"] == 0
        assert s["queued"] == 0
        # every executed row is either a real request or a pad
        executed = sum(b * n for b, n in s["batches_per_bucket"].items())
        assert executed >= 7
        assert s["batch_occupancy"] == pytest.approx(7 / executed)
        assert s["latency_ms"]["n"] == 7
        assert s["latency_ms"]["p50"] <= s["latency_ms"]["p99"]

    def test_cancelled_future_does_not_fail_or_double_count_batch(
            self, engine):
        """A client-cancelled queued future must not re-route a successful
        batch to the failure path or corrupt the stats (review finding:
        set_result on a cancelled future raises InvalidStateError)."""
        from concurrent.futures import Future
        import time as _time

        server = GPVServer(engine, batch_size=2, max_wait_ms=1,
                           num_workers=1)
        try:
            rng = np.random.RandomState(9)
            img = rng.randint(0, 255, (48, 64, 3), np.uint8)
            # drive the worker body directly with a deterministic
            # pre-cancelled item (no queue timing races)
            f_ok, f_cancel = Future(), Future()
            f_cancel.cancel()
            t0 = _time.monotonic()
            server._execute([(img, "keep me", None, None, f_ok, t0),
                             (img, "cancelled", None, None, f_cancel, t0)])
            assert f_ok.result(timeout=60)["answer"] is not None
            assert f_cancel.cancelled()
            s = server.stats()
            assert s["failed"] == 0
            assert s["completed"] == 1  # only the uncancelled row
            assert sum(s["batches_per_bucket"].values()) == 1
        finally:
            server.close()

    def test_concurrent_distinct_vocab_masks_are_isolated(self, engine):
        """Two mask populations in flight: each request must be decoded
        under ITS OWN mask (regression: r1 applied items[0]'s mask to the
        whole coalesced batch — VERDICT.md round-1 weak #5)."""
        rng = np.random.RandomState(1)
        # additive (V,) masks, each allowing a different single token
        mask_a = np.full((VOCAB,), -10000.0, np.float32)
        mask_a[5] = 0.0
        mask_b = np.full((VOCAB,), -10000.0, np.float32)
        mask_b[7] = 0.0
        masks = [mask_a, mask_b, None]

        images = [rng.randint(0, 255, (48, 64, 3), np.uint8)
                  for _ in range(9)]
        queries = [f"what is {i}?" for i in range(9)]

        server = GPVServer(engine, batch_size=4, max_wait_ms=50,
                           num_workers=1)
        futs = [server.submit(im, q, masks[i % 3])
                for i, (im, q) in enumerate(zip(images, queries))]
        results = [f.result(timeout=120) for f in futs]
        server.close()

        for i, (im, q, got) in enumerate(zip(images, queries, results)):
            ref = engine.predict(im[None], [q], masks[i % 3])[0]
            assert got["answer"] == ref["answer"], (
                f"request {i} (mask {i % 3}) answer leaked another mask")
        # sanity: the two masks actually force different answers
        assert results[0]["answer"] != results[1]["answer"]

    def test_closed_server_rejects(self, engine):
        server = GPVServer(engine, batch_size=2, num_workers=1)
        server.close()
        with pytest.raises(RuntimeError):
            server.submit(np.zeros((48, 64, 3), np.uint8), "q")

    def test_beam_on_engine_without_predict_beam_rejected_at_submit(self):
        """An exported-bundle engine has no predict_beam; submit must raise
        a clear ValueError at the door instead of AttributeError-failing
        the whole coalesced batch inside _execute."""
        class _GreedyOnlyEngine:
            def predict(self, images, queries, vocab_mask=None):
                return [{"answer": "", "boxes": [], "relevance": []}
                        for _ in queries]

        server = GPVServer(_GreedyOnlyEngine(), batch_size=2, num_workers=1)
        try:
            with pytest.raises(ValueError, match="beam"):
                server.submit(np.zeros((48, 64, 3), np.uint8), "q",
                              beam_size=3)
            # greedy path unaffected
            out = server.submit(np.zeros((48, 64, 3), np.uint8),
                                "q").result(timeout=60)
            assert out["answer"] == ""
        finally:
            server.close()

    def test_close_drains_queued_requests(self, engine):
        """close(drain=True) serves everything already queued — no client
        blocked in future.result() is stranded."""
        rng = np.random.RandomState(11)
        server = GPVServer(engine, batch_size=2, max_wait_ms=5,
                           num_workers=1)
        futs = [server.submit(rng.randint(0, 255, (48, 64, 3), np.uint8),
                              f"drain {i}") for i in range(5)]
        server.close()  # immediately; queue likely non-empty
        for f in futs:
            assert f.done()
            if not f.cancelled():  # drained requests resolve with results
                assert f.result(timeout=1)["answer"] is not None
        # with drain, nothing should actually be cancelled
        assert all(not f.cancelled() for f in futs)

    def test_close_without_drain_cancels_unserved(self, engine):
        """close(drain=False): whatever the workers never picked up is
        CANCELLED rather than left pending forever. Deterministic: the
        single worker is parked inside a blocking predict while the tail
        is queued."""
        import threading
        from concurrent.futures import CancelledError

        gate = threading.Event()
        entered = threading.Event()

        class _BlockingEngine:
            vocab = engine.vocab

            def predict(self, images, queries, mask=None):
                entered.set()
                assert gate.wait(timeout=120)
                return engine.predict(images, queries, mask)

        rng = np.random.RandomState(12)
        server = GPVServer(_BlockingEngine(), batch_size=2, max_wait_ms=1,
                           num_workers=1)
        futs = [server.submit(rng.randint(0, 255, (48, 64, 3), np.uint8),
                              f"cancel {i}") for i in range(6)]
        assert entered.wait(timeout=60)  # worker holds batch 1 in predict
        closer = threading.Thread(
            target=lambda: server.close(drain=False, timeout=4))
        closer.start()
        # the tail (batches 2-3) is still queued; close cancels it, then
        # the gate releases the worker to finish batch 1
        closer.join(timeout=60)
        assert not closer.is_alive()
        gate.set()
        resolved = cancelled = 0
        for f in futs:
            try:
                f.result(timeout=60)
                resolved += 1
            except CancelledError:
                cancelled += 1
        assert cancelled == 4      # everything the worker never picked up
        assert resolved == 2       # the in-flight batch still completes


class TestCollectScheduling:
    """Deterministic tests of the batch-collection policy (no engine)."""

    def _server(self, batch_size):
        srv = GPVServer.__new__(GPVServer)
        import queue as _q
        import threading
        srv.batch_size = batch_size
        srv.max_wait_s = 0.01
        srv._q = _q.Queue()
        srv._pending = []
        srv._pending_lock = threading.Lock()
        srv._stats_lock = threading.Lock()
        srv._lifecycle_lock = threading.Lock()
        srv._busy = 0
        srv._closed = threading.Event()
        srv._deferred = 0
        return srv

    @staticmethod
    def _req(tag, mask, beam=None):
        from concurrent.futures import Future
        return (tag, f"query-{tag}", mask, beam, Future(),
                __import__("time").monotonic())

    def test_deferred_minority_mask_served_next_batch(self):
        """A mask-B request deferred during an A batch seeds the NEXT batch
        (regression: re-queueing let a sustained A stream starve B)."""
        ma = np.zeros((4,), np.float32)
        mb = np.ones((4,), np.float32)
        srv = self._server(batch_size=2)
        for it in (self._req("a1", ma), self._req("b1", mb),
                   self._req("a2", ma), self._req("a3", ma)):
            srv._q.put(it)
        first = srv._collect()
        assert [it[0] for it in first] == ["a1", "a2"]
        assert [it[0] for it in srv._pending] == ["b1"]
        second = srv._collect()  # deferred b1 must come FIRST
        assert [it[0] for it in second] == ["b1"]
        third = srv._collect()
        assert [it[0] for it in third] == ["a3"]

    def test_same_mask_pending_items_batch_together(self):
        ma = np.zeros((4,), np.float32)
        mb = np.ones((4,), np.float32)
        srv = self._server(batch_size=3)
        srv._pending = [self._req("b1", mb), self._req("a1", ma),
                        self._req("b2", mb)]
        srv._q.put(self._req("b3", mb))
        batch = srv._collect()
        # b1 seeds; b2 joins from pending; b3 joins from the queue
        assert [it[0] for it in batch] == ["b1", "b2", "b3"]
        assert [it[0] for it in srv._pending] == ["a1"]


class TestBucketedPadding:
    """Small-batch executable fallback: a collected batch of n pads to the
    smallest bucket >= n, not always to the max batch (VERDICT r2 item 7 —
    a lone request must not pay a (B-1)/B-padded full batch)."""

    class _SpyEngine:
        def __init__(self):
            self.batch_sizes = []

        def predict(self, images, queries, mask=None):
            self.batch_sizes.append(len(queries))
            return [{"answer": q, "boxes": None, "relevance": None}
                    for q in queries]

    def test_lone_request_uses_smallest_bucket(self):
        spy = self._SpyEngine()
        srv = GPVServer(spy, max_wait_ms=5, num_workers=1,
                        bucket_sizes=(1, 4, 16))
        assert srv.batch_size == 16
        img = np.zeros((8, 8, 3), np.uint8)
        assert srv.submit(img, "solo").result(timeout=30)["answer"] == "solo"
        srv.close()
        assert spy.batch_sizes == [1]

    def test_mid_occupancy_rounds_up_to_bucket(self):
        spy = self._SpyEngine()
        srv = GPVServer(spy, max_wait_ms=200, num_workers=1,
                        bucket_sizes=(1, 4, 16))
        img = np.zeros((8, 8, 3), np.uint8)
        futs = [srv.submit(img, f"q{i}") for i in range(3)]
        outs = [f.result(timeout=30)["answer"] for f in futs]
        srv.close()
        assert outs == ["q0", "q1", "q2"]
        assert spy.batch_sizes == [4]  # 3 requests -> bucket 4, not 16

    def test_default_single_bucket_unchanged(self):
        spy = self._SpyEngine()
        srv = GPVServer(spy, batch_size=8, max_wait_ms=5, num_workers=1)
        img = np.zeros((8, 8, 3), np.uint8)
        srv.submit(img, "x").result(timeout=30)
        srv.close()
        assert spy.batch_sizes == [8]  # legacy: always pad to batch_size


class TestWeightResidency:
    def test_installed_variables_are_device_arrays(self):
        """Installing numpy weights (fold_bn output / multi-host rank-0
        host fetch) must commit them to device ONCE — numpy leaves handed
        to the jitted cores would re-upload every weight on every predict
        (measured 23 s/batch over the dev relay vs 40 ms resident)."""
        from conftest import tiny_init
        model = tiny_gpv()
        vocab = AnswerVocab.debug(size=VOCAB)
        eng = GPVEngine(model, None, vocab, WordPieceTokenizer.debug())
        eng.variables = jax.tree.map(np.asarray, tiny_init(model))
        for leaf in jax.tree.leaves(eng.variables):
            assert isinstance(leaf, jax.Array), type(leaf)

    def test_install_is_lazy_until_first_read(self, engine):
        """Installing weights must NOT touch the device: multi-host
        non-main ranks build an engine they never predict with (eval/vis
        are rank-0-only), and an eager upload would hold a second full
        weight copy in HBM on every rank (round-3 review)."""
        host_vars = jax.tree.map(np.asarray, engine.variables)
        eng = GPVEngine(engine.model, host_vars, engine.vocab,
                        engine.tokenizer)
        assert eng._vars_dev is None  # nothing uploaded at install
        assert eng._vars_host is not None
        leaves = jax.tree.leaves(eng.variables)  # first read commits once
        assert all(isinstance(lf, jax.Array) for lf in leaves)
        # ...and drops the host copy (one resident copy total)
        assert eng._vars_dev is not None and eng._vars_host is None


class TestWarmupCoverage:
    def test_warmup_covers_masked_and_unmasked_executables(self, engine):
        """Construction-time warmup must compile BOTH the mask-less and the
        vocab-masked executable per bucket — vocab-masked requests are a
        first-class serving path (classification), and a serving-time XLA
        compile is minutes over a real relay (round-3 review)."""
        srv = GPVServer(engine, bucket_sizes=(3,), max_wait_ms=10,
                        num_workers=1, warmup=(48, 64))
        n0 = engine._greedy._cache_size()
        mask = np.full((VOCAB,), -10000.0, np.float32)
        mask[9] = 0.0
        img = np.zeros((48, 64, 3), np.uint8)
        srv.submit(img, "which one?", mask).result(timeout=120)
        srv.submit(img, "open question?").result(timeout=120)
        srv.close()
        assert engine._greedy._cache_size() == n0  # no serving-time compile
