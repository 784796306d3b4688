"""predict_folder CLI: batch inference over an arbitrary image directory."""
import json

import numpy as np
import pytest
from PIL import Image

from _fake_data import TINY_OVERRIDES


@pytest.fixture(scope="module")
def image_dir(tmp_path_factory):
    d = tmp_path_factory.mktemp("imgs")
    rng = np.random.RandomState(0)
    for i in range(2):
        Image.fromarray(
            rng.randint(0, 255, (48, 64, 3), np.uint8)).save(
            d / f"img_{i}.png")
    # palette-mode PNG: must decode via convert('RGB'), not as raw
    # palette indices
    Image.fromarray(
        rng.randint(0, 255, (48, 64, 3), np.uint8)).convert(
        "P", palette=Image.ADAPTIVE).save(d / "img_2_palette.png")
    (d / "notes.txt").write_text("not an image")
    return d


@pytest.mark.slow
class TestPredictFolder:
    def test_jsonl_output(self, image_dir, tmp_path):
        from gpv_tpu.cli.predict_folder import main
        out = tmp_path / "preds.jsonl"
        # 48x64 training resolution keeps the resize path on one tiny
        # executable
        main([f"images={image_dir}", "query=what is this?", "ckpt=null",
              f"out={out}", "batch=2", "num_output_boxes=3",
              "task_configs.image_size={H: 48, W: 64}"] + TINY_OVERRIDES)
        rows = [json.loads(l) for l in out.read_text().splitlines()]
        assert len(rows) == 3
        for r in rows:
            assert r["file"].endswith(".png")
            assert isinstance(r["answer"], str)
            assert len(r["boxes"]) == 3 and len(r["boxes"][0]) == 4
            assert len(r["relevance"]) == 3

    def test_queries_file_pairing(self, image_dir, tmp_path):
        from gpv_tpu.cli.predict_folder import main
        qfile = tmp_path / "queries.txt"
        qfile.write_text("\n".join(f"query {i}" for i in range(3)))
        out = tmp_path / "paired.jsonl"
        main([f"images={image_dir}", f"queries={qfile}", f"out={out}",
              "batch=2", "ckpt=null",
              "task_configs.image_size={H: 48, W: 64}"] + TINY_OVERRIDES)
        rows = [json.loads(l) for l in out.read_text().splitlines()]
        assert [r["query"] for r in rows] == [f"query {i}"
                                              for i in range(3)]

    def test_query_count_mismatch_raises(self, image_dir, tmp_path):
        from gpv_tpu.cli.predict_folder import main
        qfile = tmp_path / "bad.txt"
        qfile.write_text("only one line")
        with pytest.raises(SystemExit, match="paired"):
            main([f"images={image_dir}", f"queries={qfile}"]
                 + TINY_OVERRIDES)

    def test_unknown_task_raises(self, image_dir, tmp_path):
        from gpv_tpu.cli.predict_folder import main
        with pytest.raises(SystemExit, match="unknown task"):
            main([f"images={image_dir}", "task=clasification"]
                 + TINY_OVERRIDES)

    def test_empty_dir_raises(self, tmp_path):
        from gpv_tpu.cli.predict_folder import main
        empty = tmp_path / "empty"
        empty.mkdir()
        with pytest.raises(SystemExit, match="no images"):
            main([f"images={empty}"] + TINY_OVERRIDES)

    def test_missing_ckpt_arg_raises(self, image_dir):
        """No ckpt= must fail loudly, not write random-weight predictions
        (ckpt=null is the explicit opt-in, used by the tests above)."""
        from gpv_tpu.cli.predict_folder import main
        with pytest.raises(SystemExit, match="ckpt="):
            main([f"images={image_dir}", "query=q"] + TINY_OVERRIDES)
