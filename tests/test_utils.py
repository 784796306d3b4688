"""Utility-layer tests: html writer, visualization, io, profiling."""
import json

import numpy as np

from gpv_tpu.utils.html_writer import HtmlWriter
from gpv_tpu.utils.io import dump_json_object, load_json_object
from gpv_tpu.utils.profiling import StepTimer
from gpv_tpu.utils.visualize import save_vis, vis_sample


class TestHtmlWriter:
    def test_table_rows(self, tmp_path):
        path = tmp_path / "index.html"
        w = HtmlWriter(path)
        w.add_row(["a", "b", w.image_tag("x.jpg", height=50)])
        w.add_row({"1": "second", "0": "first"})
        w.close()
        html = path.read_text()
        assert html.count("<tr>") == 2
        assert '<img src="x.jpg" height="50">' in html
        assert html.index("first") < html.index("second")  # dict key order


class TestVisualize:
    def test_boxes_drawn_and_saved(self, tmp_path):
        img = np.zeros((60, 80, 3), np.uint8)
        boxes = np.asarray([[0.5, 0.5, 0.4, 0.4], [0.2, 0.2, 0.1, 0.1]])
        scores = np.asarray([0.9, 0.4])
        gt = np.asarray([[0.6, 0.6, 0.2, 0.2]])
        out = vis_sample(img, boxes, scores, gt, num_boxes=2, answer="dog")
        arr = np.asarray(out)
        assert arr.shape == (60, 80, 3)
        assert arr.sum() > 0  # something was drawn
        save_vis(out, tmp_path / "v" / "x.jpg")
        assert (tmp_path / "v" / "x.jpg").exists()


class TestIo:
    def test_json_roundtrip(self, tmp_path):
        obj = {"a": [1, 2], "b": "x"}
        dump_json_object(obj, tmp_path / "d" / "o.json")
        assert load_json_object(tmp_path / "d" / "o.json") == obj
        dump_json_object(obj, tmp_path / "o.json.gz", compressed=True)
        assert load_json_object(tmp_path / "o.json.gz",
                                compressed=True) == obj


class TestStepTimer:
    def test_rate(self):
        t = StepTimer(window=4)
        import time
        for _ in range(3):
            t.tick()
            time.sleep(0.01)
        assert 10 < t.steps_per_sec() < 200
