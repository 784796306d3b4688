"""HTTP serving front-end tests (gpv_tpu/cli/serve_http.py) on the tiny
engine: health check, base64 round-trip predict, task vocab-mask routing,
and error paths."""
import base64
import io
import json
import urllib.error
import urllib.request

import numpy as np
import pytest

from gpv_tpu.serve import GPVServer
from gpv_tpu.cli.serve_http import make_http_server, serve_in_thread

from test_model import VOCAB
from test_serve import engine  # noqa: F401 (module-scoped tiny engine)


@pytest.fixture(scope="module")
def http_stack(engine):  # noqa: F811
    mask = np.full((VOCAB,), -10000.0, np.float32)
    mask[5] = 0.0
    srv = GPVServer(engine, bucket_sizes=(1, 2), max_wait_ms=10,
                    num_workers=1)
    httpd = make_http_server(srv, {"vqa": None, "classification": mask},
                             (48, 64), host="127.0.0.1", port=0)
    serve_in_thread(httpd)
    base = f"http://127.0.0.1:{httpd.server_address[1]}"
    yield base, mask
    httpd.shutdown()
    srv.close()


def _post(base, payload, timeout=300):
    req = urllib.request.Request(
        base + "/predict", data=json.dumps(payload).encode(),
        headers={"Content-Type": "application/json"})
    with urllib.request.urlopen(req, timeout=timeout) as r:
        return json.loads(r.read())


def _b64_png(img):
    from PIL import Image
    buf = io.BytesIO()
    Image.fromarray(img).save(buf, "PNG")
    return base64.b64encode(buf.getvalue()).decode()


class TestHttpFrontend:
    def test_healthz(self, http_stack):
        base, _ = http_stack
        with urllib.request.urlopen(base + "/healthz", timeout=30) as r:
            assert json.loads(r.read())["ok"] is True

    def test_predict_matches_direct_engine(self, http_stack, engine):  # noqa: F811
        base, mask = http_stack
        rng = np.random.RandomState(0)
        img = rng.randint(0, 255, (48, 64, 3), np.uint8)
        out = _post(base, {"image": _b64_png(img),
                           "query": "what is this?",
                           "task": "classification"})
        assert isinstance(out["answer"], str)
        assert len(out["boxes"]) == 10 and len(out["boxes"][0]) == 4
        assert len(out["relevance"]) == 10
        # PNG round-trip is lossless -> must equal a direct masked predict
        ref = engine.predict(img[None], ["what is this?"], mask)[0]
        assert out["answer"] == ref["answer"]
        np.testing.assert_allclose(np.asarray(out["boxes"]), ref["boxes"],
                                   atol=1e-5)

    def test_beam_request_returns_k_answers(self, http_stack, engine):  # noqa: F811,E501
        base, _ = http_stack
        rng = np.random.RandomState(7)
        img = rng.randint(0, 255, (48, 64, 3), np.uint8)
        out = _post(base, {"image": _b64_png(img),
                           "query": "describe the image",
                           "beam_size": 3})
        assert len(out["answers"]) == 3
        assert out["answer"] == out["answers"][0]
        probs = out["answer_probs"]
        assert all(probs[i] >= probs[i + 1] - 1e-6
                   for i in range(len(probs) - 1))
        ref = engine.predict_beam(img[None], ["describe the image"],
                                  beam_size=3)[0]
        assert out["answers"] == ref["answers"]

    def test_beam_size_out_of_range_is_400(self, http_stack):
        base, _ = http_stack
        img = np.zeros((8, 8, 3), np.uint8)
        with pytest.raises(urllib.error.HTTPError) as ei:
            _post(base, {"image": _b64_png(img), "query": "q",
                         "beam_size": 50})
        assert ei.value.code == 400

    def test_resizes_native_input(self, http_stack):
        base, _ = http_stack
        rng = np.random.RandomState(1)
        img = rng.randint(0, 255, (100, 130, 3), np.uint8)  # native size
        out = _post(base, {"image": _b64_png(img), "query": "a photo of"})
        assert isinstance(out["answer"], str)  # resized to 48x64, served

    def test_unknown_task_is_400(self, http_stack):
        base, _ = http_stack
        with pytest.raises(urllib.error.HTTPError) as ei:
            _post(base, {"image": _b64_png(np.zeros((8, 8, 3), np.uint8)),
                         "query": "q", "task": "nope"}, timeout=30)
        assert ei.value.code == 400

    def test_malformed_body_is_400(self, http_stack):
        base, _ = http_stack
        with pytest.raises(urllib.error.HTTPError) as ei:
            _post(base, {"query": "no image"}, timeout=30)
        assert ei.value.code == 400

    def test_unknown_path_is_404(self, http_stack):
        base, _ = http_stack
        with pytest.raises(urllib.error.HTTPError) as ei:
            urllib.request.urlopen(base + "/nope", timeout=30)
        assert ei.value.code == 404

    def test_python_client_roundtrip(self, http_stack, engine):  # noqa: F811
        """GPVClient (stdlib HTTP client) round-trips ndarray, bytes, and
        path inputs and matches the direct engine."""
        from gpv_tpu.client import GPVClient
        base, mask = http_stack
        client = GPVClient(base)
        assert client.healthy()

        rng = np.random.RandomState(21)
        img = rng.randint(0, 255, (48, 64, 3), np.uint8)
        ref = engine.predict(img[None], ["client test"])[0]
        out = client.predict(img, "client test")
        assert out["answer"] == ref["answer"]
        np.testing.assert_allclose(out["boxes"], ref["boxes"], atol=1e-3)

        # bytes + path inputs give identical answers (same PNG content)
        from PIL import Image
        buf = io.BytesIO()
        Image.fromarray(img).save(buf, "PNG")
        assert client.predict(buf.getvalue(),
                              "client test")["answer"] == ref["answer"]

        # task routing applies the server-side mask: equals a direct
        # masked predict
        masked = client.predict(img, "client test", task="classification")
        mref = engine.predict(img[None], ["client test"], mask)[0]
        assert masked["answer"] == mref["answer"]
        # server error surfaces as a RuntimeError with the message
        with pytest.raises(RuntimeError, match="unknown task"):
            client.predict(img, "q", task="nope")

        s = client.stats()
        assert s["completed"] >= 3

    @pytest.mark.slow
    def test_sigterm_graceful_shutdown(self, engine, tmp_path):  # noqa: F811
        """SIGTERM drains and exits 0 (orchestrator-stop contract)."""
        import os
        import signal
        import subprocess
        import sys as _sys
        import time
        from pathlib import Path
        from gpv_tpu.client import GPVClient
        from gpv_tpu.export import export_engine

        bundle = tmp_path / "bundle"
        export_engine(engine, bundle, batch_sizes=(2,), image_hw=(48, 64))
        port = 19000 + os.getpid() % 999
        env = dict(os.environ, JAX_PLATFORMS="cpu")
        # the env var alone loses to the sitecustomize axon registration;
        # pin the config BEFORE any backend touch (same as conftest), and
        # share the test compile cache so the exported modules reload warm
        code = (
            "import jax;"
            "jax.config.update('jax_platforms','cpu');"
            "jax.config.update('jax_compilation_cache_dir',"
            "'/tmp/gpv_tpu_test_jax_cache');"
            "from gpv_tpu.cli.serve_http import main;"
            f"main(['bundle={bundle}','port={port}','host=127.0.0.1',"
            "'serve.warmup=false'])")
        proc = subprocess.Popen(
            [_sys.executable, "-c", code],
            cwd=str(Path(__file__).resolve().parent.parent), env=env,
            stdout=subprocess.PIPE, stderr=subprocess.STDOUT, text=True)
        client = GPVClient(f"http://127.0.0.1:{port}", timeout_s=240)
        deadline = time.time() + 240
        try:
            while time.time() < deadline and not client.healthy():
                assert proc.poll() is None, proc.stdout.read()[-3000:]
                time.sleep(1)
            assert client.healthy()
            rng = np.random.RandomState(30)
            out = client.predict(rng.randint(0, 255, (48, 64, 3),
                                             np.uint8), "before sigterm")
            assert isinstance(out["answer"], str)
            proc.send_signal(signal.SIGTERM)
            proc.wait(timeout=120)
            assert proc.returncode == 0, proc.stdout.read()[-3000:]
        finally:
            if proc.poll() is None:
                proc.kill()

    def test_bundle_serving_imports_no_model_stack(self):
        """The AOT-bundle serving path (ExportedEngine + GPVServer + vocab
        masks) must not import the model stack — a packaged serving host
        carries no flax/model code (export.py's deployment contract)."""
        import subprocess
        import sys as _sys
        code = (
            "import jax; jax.config.update('jax_platforms','cpu')\n"
            "from gpv_tpu.evaluation.evaluators import coco_vocab_mask\n"
            "from gpv_tpu.export import ExportedEngine\n"
            "from gpv_tpu.serve import GPVServer\n"
            "import sys\n"
            "leaked = [m for m in ('flax', 'gpv_tpu.models.gpv',"
            " 'gpv_tpu.engine', 'gpv_tpu.nn.resnet') if m in sys.modules]\n"
            "assert not leaked, leaked\n"
            "print('OK')\n")
        out = subprocess.run([_sys.executable, "-c", code],
                             capture_output=True, text=True, timeout=300)
        assert out.returncode == 0, out.stderr[-2000:]
        assert "OK" in out.stdout

    def test_stats_endpoint(self, http_stack):
        """GET /stats reflects served traffic (runs after the predict
        tests in this class, so counters must be non-zero)."""
        base, _ = http_stack
        rng = np.random.RandomState(7)
        img = rng.randint(0, 255, (48, 64, 3), np.uint8)
        _post(base, {"image": _b64_png(img), "query": "stats probe"})
        with urllib.request.urlopen(base + "/stats", timeout=30) as r:
            s = json.loads(r.read())
        assert s["submitted"] >= s["completed"] >= 1
        assert s["failed"] == 0
        assert s["latency_ms"]["n"] >= 1
        assert s["latency_ms"]["p50"] <= s["latency_ms"]["p99"]
        assert 0 < s["batch_occupancy"] <= 1
        assert sum(s["batches_per_bucket"].values()) >= 1
