"""Data-parallel sharded inference (GPVEngine mesh=...) on the 8-device
virtual CPU mesh: sharded predict must equal single-device predict.

The reference evaluates on exactly one GPU (configs/exp/gpv.yaml:157-158);
the mesh engine runs the same jitted graphs SPMD over a slice's data axis.
"""
import numpy as np
import pytest

import jax
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from gpv_tpu.engine import GPVEngine
from gpv_tpu.text.vocab import AnswerVocab
from gpv_tpu.text.wordpiece import WordPieceTokenizer

from test_model import tiny_gpv, VOCAB

HW = (48, 64)


def _engines():
    from conftest import tiny_init
    model = tiny_gpv()
    vocab = AnswerVocab.debug(size=VOCAB)
    tok = WordPieceTokenizer.debug()
    variables = tiny_init(model)
    single = GPVEngine(model, None, vocab, tok)
    single.variables = variables
    mesh = Mesh(np.asarray(jax.devices()), ("dp",))
    sharded = GPVEngine(model, None, vocab, tok, mesh=mesh)
    sharded.variables = variables
    return single, sharded


@pytest.fixture(scope="module")
def engines():
    return _engines()


def _imgs(n, seed=0):
    rng = np.random.RandomState(seed)
    return rng.randint(0, 255, (n, *HW, 3), np.uint8)


class TestShardedPredict:
    def test_weights_replicated_and_batch_sharded(self, engines):
        _, sharded = engines
        leaf = jax.tree.leaves(sharded.variables)[0]
        assert leaf.sharding.is_fully_replicated
        imgs, qids, qvalid, pad = sharded._prep(_imgs(8), ["q"] * 8)
        assert pad == 0
        # one row per device along dim 0
        assert not imgs.sharding.is_fully_replicated
        assert imgs.sharding.shard_shape(imgs.shape)[0] == 1
        assert qids.sharding.shard_shape(qids.shape)[0] == 1

    def test_divisible_batch_matches_single_device(self, engines):
        single, sharded = engines
        imgs = _imgs(8, seed=1)
        queries = [f"what is {i}" for i in range(8)]
        ref = single.predict(imgs, queries)
        got = sharded.predict(imgs, queries)
        for r, g in zip(ref, got):
            assert g["answer"] == r["answer"]
            np.testing.assert_allclose(g["boxes"], r["boxes"], atol=1e-5)
            np.testing.assert_allclose(g["relevance"], r["relevance"],
                                       atol=1e-5)

    def test_ragged_batch_pads_by_repetition(self, engines):
        """n=5 on an 8-device axis: internal pad to 8, outputs slice to 5."""
        single, sharded = engines
        imgs = _imgs(5, seed=2)
        queries = [f"query {i}" for i in range(5)]
        ref = single.predict(imgs, queries)
        got = sharded.predict(imgs, queries)
        assert len(got) == 5
        for r, g in zip(ref, got):
            assert g["answer"] == r["answer"]
            np.testing.assert_allclose(g["relevance"], r["relevance"],
                                       atol=1e-5)

    def test_vocab_mask_replicates(self, engines):
        single, sharded = engines
        mask = np.full((VOCAB,), -10000.0, np.float32)
        mask[5] = mask[7] = 0.0
        imgs = _imgs(8, seed=3)
        queries = [f"pick {i}" for i in range(8)]
        ref = single.predict(imgs, queries, vocab_mask=mask)
        got = sharded.predict(imgs, queries, vocab_mask=mask)
        for r, g in zip(ref, got):
            assert g["answer"] == r["answer"]

    @pytest.mark.slow  # extra beam executable compile
    def test_beam_matches_single_device(self, engines):
        single, sharded = engines
        imgs = _imgs(3, seed=4)
        queries = [f"describe {i}" for i in range(3)]
        ref = single.predict_beam(imgs, queries, beam_size=3)
        got = sharded.predict_beam(imgs, queries, beam_size=3)
        assert len(got) == 3
        for r, g in zip(ref, got):
            assert g["answers"] == r["answers"]
            np.testing.assert_allclose(g["answer_probs"],
                                       r["answer_probs"], atol=1e-5)

    @pytest.mark.slow  # two native-shape buckets = two extra compiles
    def test_native_resolution_buckets_pad_per_group(self, engines):
        single, sharded = engines
        rng = np.random.RandomState(5)
        # two shape buckets with ragged group sizes (3 + 2)
        images = [rng.randint(0, 255, (40, 56, 3), np.uint8)
                  for _ in range(3)]
        images += [rng.randint(0, 255, (64, 48, 3), np.uint8)
                   for _ in range(2)]
        queries = [f"native {i}" for i in range(5)]
        ref = single.predict_native(images, queries, bucket=32)
        got = sharded.predict_native(images, queries, bucket=32)
        for r, g in zip(ref, got):
            assert g["answer"] == r["answer"]
            np.testing.assert_allclose(g["relevance"], r["relevance"],
                                       atol=1e-5)


class TestServerComposition:
    @pytest.mark.slow  # extra padded-shape executable
    def test_batching_server_over_sharded_engine(self, engines):
        """GPVServer coalesces onto a mesh engine: bucket sizes that don't
        divide the data axis pad internally (engine._prep) and answers
        match the single-device engine."""
        from gpv_tpu.serve import GPVServer
        single, sharded = engines
        server = GPVServer(sharded, bucket_sizes=(2,), max_wait_ms=20,
                           num_workers=1)
        try:
            imgs = _imgs(4, seed=31)
            futs = [server.submit(imgs[i], f"compose {i}")
                    for i in range(4)]
            ref = single.predict(imgs, [f"compose {i}" for i in range(4)])
            for f, r in zip(futs, ref):
                assert f.result(timeout=300)["answer"] == r["answer"]
        finally:
            server.close()


class TestMeshValidation:
    def test_non_addressable_mesh_rejected(self, engines):
        # doctored mesh view claiming a device owned by a foreign process:
        # the engine must reject it (multi-host eval is rank-0-only)
        class _Fake:
            process_index = 10**6

        class _M:
            axis_names = ("dp",)
            shape = {"dp": 1}
            devices = np.asarray([_Fake()])

        with pytest.raises(ValueError, match="addressable"):
            GPVEngine(engines[0].model, None,
                      AnswerVocab.debug(size=VOCAB),
                      WordPieceTokenizer.debug(), mesh=_M())

    @pytest.mark.slow  # full build_engine (model init) at tiny dims
    def test_build_engine_knob(self):
        """tpu.infer_data_parallel=-1 builds a mesh over all devices, and
        tpu.dtype is honored (not silently ignored) by the engine build."""
        import jax.numpy as jnp
        from _fake_data import TINY_OVERRIDES
        from inference import build_engine
        from gpv_tpu.utils.config import load_config
        # overrides AFTER TINY_OVERRIDES (which itself sets
        # tpu.dtype=float32 — last one wins); bfloat16 here proves the
        # knob actually flows into the build
        cfg = load_config("configs", "exp/gpv_inference",
                          ["ckpt=null"] + TINY_OVERRIDES
                          + ["tpu.infer_data_parallel=-1",
                             "tpu.dtype=bfloat16"])
        eng = build_engine(cfg)
        assert eng.mesh is not None
        assert eng._dp == len(jax.devices())
        assert eng.model.dtype == jnp.bfloat16

    def test_export_rejects_mesh_engine(self, engines, tmp_path):
        from gpv_tpu.export import export_engine
        with pytest.raises(ValueError, match="single-device"):
            export_engine(engines[1], tmp_path, batch_sizes=(2,),
                          image_hw=HW)

    def test_build_engine_too_many_devices_raises(self):
        from inference import build_engine
        from gpv_tpu.utils.config import load_config
        cfg = load_config("configs", "exp/gpv_inference",
                          ["ckpt=null",
                           f"tpu.infer_data_parallel={len(jax.devices())+1}"])
        with pytest.raises(ValueError, match="local devices"):
            build_engine(cfg)
