"""Async checkpointing (training.async_checkpoint): overlap disk writes
with training; joins before same-path IO and at trainer end."""
from types import SimpleNamespace

import numpy as np

from gpv_tpu.train.checkpoint import (restore_checkpoint, save_checkpoint,
                                      wait_for_saves)


def _state(seed):
    rng = np.random.RandomState(seed)
    return SimpleNamespace(
        params={"layer": {"kernel": rng.randn(64, 64).astype(np.float32),
                          "bias": rng.randn(64).astype(np.float32)}},
        batch_stats={"bn": {"mean": rng.randn(8).astype(np.float32)}},
        opt_state={"mu": {"layer": rng.randn(64).astype(np.float32)}},
        step=np.int32(seed * 10))


class TestAsyncCheckpoint:
    def test_async_save_restores_identically(self, tmp_path):
        state = _state(1)
        save_checkpoint(tmp_path, state, {"epoch": 3}, async_write=True)
        wait_for_saves()
        payload, meta = restore_checkpoint(tmp_path)
        np.testing.assert_array_equal(payload["params"]["layer"]["kernel"],
                                      state.params["layer"]["kernel"])
        np.testing.assert_array_equal(
            payload["opt_state"]["mu"]["layer"],
            state.opt_state["mu"]["layer"])
        assert payload["step"] == 10
        assert meta["epoch"] == 3

    def test_restore_joins_inflight_save(self, tmp_path):
        """restore_checkpoint right after an async save must see the full
        payload (it waits for the in-flight write on that path)."""
        state = _state(2)
        save_checkpoint(tmp_path, state, {"epoch": 1}, async_write=True)
        payload, _ = restore_checkpoint(tmp_path)  # no explicit wait
        np.testing.assert_array_equal(payload["params"]["layer"]["bias"],
                                      state.params["layer"]["bias"])

    def test_second_save_joins_first_on_same_path(self, tmp_path):
        """Back-to-back async saves to one path serialize; the final
        content is the second state."""
        s1, s2 = _state(3), _state(4)
        save_checkpoint(tmp_path, s1, {"epoch": 1}, async_write=True)
        save_checkpoint(tmp_path, s2, {"epoch": 2}, async_write=True)
        wait_for_saves()
        payload, meta = restore_checkpoint(tmp_path)
        np.testing.assert_array_equal(payload["params"]["layer"]["kernel"],
                                      s2.params["layer"]["kernel"])
        assert meta["epoch"] == 2

    def test_previous_checkpoint_survives_failed_write(self, tmp_path):
        """The old checkpoint must stay loadable when a later write never
        completes (preemption mid-write): the new payload lands in a tmp
        dir and only swaps in at finalize."""
        from gpv_tpu.train import checkpoint as ckpt_mod

        s1 = _state(7)
        save_checkpoint(tmp_path, s1, {"epoch": 1})  # sync, committed

        class _DeadCkptr:
            def wait_until_finished(self):
                raise IOError("disk full")

            def close(self):
                pass

        # simulate an async write whose background flush fails
        path = (tmp_path / "model").resolve()
        entry = (_DeadCkptr(), path.with_name(".model.writing"), path,
                 {"epoch": 2})
        with ckpt_mod._INFLIGHT_LOCK:
            ckpt_mod._INFLIGHT[str(path)] = entry
        import pytest as _pytest
        with _pytest.raises(IOError):
            wait_for_saves()
        # the failed entry is dropped (no poisoning of later saves) and
        # the previous checkpoint is untouched
        with ckpt_mod._INFLIGHT_LOCK:
            assert not ckpt_mod._INFLIGHT
        payload, meta = restore_checkpoint(tmp_path)
        assert meta["epoch"] == 1
        np.testing.assert_array_equal(payload["params"]["layer"]["kernel"],
                                      s1.params["layer"]["kernel"])

    def test_meta_never_describes_uncommitted_payload(self, tmp_path):
        """meta.json is written AFTER the payload swap: a stale tmp dir
        from a preempted run never leaves meta pointing at missing data."""
        s1 = _state(8)
        tmp = tmp_path / ".model.writing"
        tmp.mkdir()  # stale junk from a "preempted" earlier run
        (tmp / "garbage").write_text("x")
        save_checkpoint(tmp_path, s1, {"epoch": 5})
        assert not tmp.exists()  # stale tmp cleaned, write landed
        payload, meta = restore_checkpoint(tmp_path)
        assert meta["epoch"] == 5
        assert payload["step"] == 80

    def test_distinct_names_write_concurrently(self, tmp_path):
        """best ('model') and rolling ('last') saves may be in flight at
        once — different paths don't serialize against each other."""
        s_best, s_last = _state(5), _state(6)
        save_checkpoint(tmp_path, s_best, {"epoch": 1}, name="model",
                        async_write=True)
        save_checkpoint(tmp_path, s_last, {"epoch": 1, "step": 60},
                        name="last", async_write=True)
        wait_for_saves()
        best, _ = restore_checkpoint(tmp_path, name="model")
        last, _ = restore_checkpoint(tmp_path, name="last")
        assert best["step"] == 50
        assert last["step"] == 60
