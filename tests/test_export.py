"""AOT serving-export bundle tests (gpv_tpu/export.py) on the tiny engine."""
import numpy as np
import pytest

from gpv_tpu.engine import GPVEngine
from gpv_tpu.export import ExportedEngine, export_engine
from gpv_tpu.text.vocab import AnswerVocab
from gpv_tpu.text.wordpiece import WordPieceTokenizer

from test_model import tiny_gpv, VOCAB

HW = (32, 32)


@pytest.fixture(scope="module")
def engine():
    from conftest import tiny_init
    model = tiny_gpv()
    vocab = AnswerVocab.debug(size=VOCAB)
    eng = GPVEngine(model, None, vocab, WordPieceTokenizer.debug())
    eng.variables = tiny_init(model)
    return eng


@pytest.fixture(scope="module")
def bundle(engine, tmp_path_factory):
    out = tmp_path_factory.mktemp("bundle")
    manifest = export_engine(engine, out, batch_sizes=(2,), image_hw=HW)
    return out, manifest


def _imgs(n, seed=0):
    rng = np.random.RandomState(seed)
    return rng.randint(0, 255, (n, *HW, 3), np.uint8)


class TestExportBundle:
    def test_manifest_and_files(self, bundle):
        out, manifest = bundle
        assert manifest["batch_sizes"] == [2]
        assert set(manifest["modules"]) == {"greedy_b2", "greedy_mask_b2"}
        for name in manifest["modules"]:
            assert (out / f"{name}.jaxexp").stat().st_size > 0
        assert (out / "weights.msgpack").stat().st_size > 0

    def test_roundtrip_matches_engine(self, bundle, engine):
        out, _ = bundle
        exported = ExportedEngine(out)
        imgs = _imgs(2)
        queries = ["what is this", "a dog"]
        ref = engine.predict(imgs, queries)
        got = exported.predict(imgs, queries)
        for r, g in zip(ref, got):
            assert g["answer"] == r["answer"]
            np.testing.assert_allclose(g["boxes"], r["boxes"], atol=1e-5)
            np.testing.assert_allclose(g["relevance"], r["relevance"],
                                       atol=1e-5)

    def test_partial_batch_pads_to_bucket(self, bundle, engine):
        out, _ = bundle
        exported = ExportedEngine(out)
        imgs = _imgs(1, seed=3)
        ref = engine.predict(imgs, ["what is this"])
        got = exported.predict(imgs, ["what is this"])
        assert len(got) == 1
        assert got[0]["answer"] == ref[0]["answer"]
        np.testing.assert_allclose(got[0]["relevance"], ref[0]["relevance"],
                                   atol=1e-5)

    def test_vocab_mask_variant(self, bundle, engine):
        out, _ = bundle
        exported = ExportedEngine(out)
        vocab = engine.vocab
        mask = vocab.make_mask(["dog", "cat"])
        imgs = _imgs(2, seed=5)
        queries = ["what is this", "what animal"]
        ref = engine.predict(imgs, queries, vocab_mask=mask)
        got = exported.predict(imgs, queries, vocab_mask=mask)
        for r, g in zip(ref, got):
            assert g["answer"] == r["answer"]
        # masked answers must come from the allowed words
        for g in got:
            for w in g["answer"].split():
                assert w in ("dog", "cat")

    def test_oversize_batch_raises(self, bundle):
        out, _ = bundle
        exported = ExportedEngine(out)
        with pytest.raises(ValueError, match="exceeds"):
            exported.predict(_imgs(3), ["a", "b", "c"])

    def test_wrong_resolution_raises(self, bundle):
        out, _ = bundle
        exported = ExportedEngine(out)
        with pytest.raises(ValueError, match="resize"):
            exported.predict(np.zeros((2, 16, 16, 3), np.uint8), ["a", "b"])


def test_bundle_drives_batching_server(bundle, engine):
    """GPVServer composes over ExportedEngine (predict-compatible)."""
    from gpv_tpu.serve import GPVServer

    out, _ = bundle
    exported = ExportedEngine(out)
    server = GPVServer(exported, bucket_sizes=(2,), max_wait_ms=20,
                       num_workers=1)
    try:
        imgs = _imgs(4, seed=11)
        futs = [server.submit(imgs[i], f"query {i}") for i in range(4)]
        ref = engine.predict(imgs, [f"query {i}" for i in range(4)])
        for f, r in zip(futs, ref):
            assert f.result(timeout=120)["answer"] == r["answer"]
    finally:
        server.close()


def test_export_cli_tiny(tmp_path):
    """Drive the export CLI end-to-end with the tiny model config."""
    from _fake_data import TINY_OVERRIDES
    from gpv_tpu.cli.export_serving import main

    out = tmp_path / "bundle"
    main(["ckpt=null", f"out={out}", "batch_sizes=[1]",
          "image_h=32", "image_w=32",
          "model.vocab=null", "model.bert_vocab=null",
          "model.vocab_embed=null",
          f"data_dir={tmp_path}", f"output_dir={tmp_path}",
          ] + TINY_OVERRIDES)
    exported = ExportedEngine(out)
    got = exported.predict(_imgs(1, seed=7)[:1], ["what is this"])
    assert len(got) == 1 and isinstance(got[0]["answer"], str)
