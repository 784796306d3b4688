"""HTTP serving front-end around `GPVServer` (stdlib only).

The reference has no serving story beyond one-off CLIs; this completes the
production path: a threaded HTTP endpoint feeding the asynchronous batching
server (`gpv_tpu/serve.py`), which coalesces concurrent requests into
fixed-shape batches for the jitted engine.

Protocol (JSON over HTTP):
  GET  /healthz   -> {"ok": true}
  GET  /stats     -> serving counters (submitted/completed/failed, queue
                     depth, per-bucket batch counts, batch occupancy,
                     submit->result latency p50/p90/p99 ms) — GPVServer.stats
  POST /predict   body {"image": <base64 JPEG/PNG>, "query": "<text>",
                        "task": "vqa"|"captioning"|"classification"|
                                "classification_syns"|"detection" (optional),
                        "beam_size": int (optional, 1..20 -> beam search;
                                     checkpoint deployments only — exported
                                     bundles serve greedy and reply 400)}
               -> {"answer": str, "boxes": [[cx,cy,w,h] x Q],
                   "relevance": [float x Q]}
                  + for beam requests: {"answers": [str x K],
                    "answer_probs": [float x K]} ("answer" = top beam)

`task=classification[_syns]` applies the COCO-class vocab mask exactly like
the offline eval path (`evaluation/evaluators.py:coco_vocab_mask`); all other
tasks decode over the open vocabulary (the task token is carried by the
query text itself, as upstream).

Images are resized server-side to the model's training resolution
(`task_configs.image_size`, default 480x640) so every request shares one
static XLA shape per occupancy bucket — arbitrary native sizes would each
pay their own compile (use `GPVEngine.predict_native` offline for that).

Usage:
  python -m gpv_tpu.cli.serve_http ckpt=<path> [port=8000] \
      [serve.batch_size=20] [serve.max_wait_ms=5] [model.vocab=...]
  python -m gpv_tpu.cli.serve_http bundle=<export dir> [port=8000] ...
      # serve an AOT bundle (gpv_tpu.cli.export_serving) — no model code
      # is loaded; buckets/image size come from the bundle manifest
"""
from __future__ import annotations

import base64
import io
import json
import sys
import threading
from http.server import BaseHTTPRequestHandler, ThreadingHTTPServer

import numpy as np


def _decode_image(b64: str, size_hw) -> np.ndarray:
    from PIL import Image
    img = Image.open(io.BytesIO(base64.b64decode(b64))).convert("RGB")
    h, w = size_hw
    if img.size != (w, h):
        img = img.resize((w, h), Image.BILINEAR)
    return np.asarray(img, np.uint8)


def make_handler(server, vocab_masks: dict, size_hw, timeout_s: float = 120.0):
    """Build the request-handler class over a running GPVServer.

    vocab_masks: task name -> additive (V,) float32 mask (or None).
    """

    class Handler(BaseHTTPRequestHandler):
        # one engine dispatch can take seconds cold; don't let the default
        # HTTP/1.0-style close kill keep-alive batching clients
        protocol_version = "HTTP/1.1"
        # socket read timeout: an idle keep-alive connection releases its
        # handler thread within 5 s, bounding graceful-shutdown joins
        # (waiting on a predict future is unaffected — that's not a socket
        # read)
        timeout = 5

        def _reply(self, code: int, payload: dict):
            body = json.dumps(payload).encode()
            self.send_response(code)
            self.send_header("Content-Type", "application/json")
            self.send_header("Content-Length", str(len(body)))
            self.end_headers()
            self.wfile.write(body)

        def do_GET(self):
            if self.path == "/healthz":
                self._reply(200, {"ok": True})
            elif self.path == "/stats":
                # serving counters: occupancy, per-bucket batches, queue
                # depth, submit->result latency percentiles (GPVServer.stats)
                self._reply(200, server.stats())
            else:
                self._reply(404, {"error": f"unknown path {self.path}"})

        def do_POST(self):
            if self.path != "/predict":
                self._reply(404, {"error": f"unknown path {self.path}"})
                return
            try:
                n = int(self.headers.get("Content-Length", 0))
                req = json.loads(self.rfile.read(n))
                query = req["query"]
                image = _decode_image(req["image"], size_hw)
                task = req.get("task")
                if task is not None and task not in vocab_masks:
                    self._reply(400, {
                        "error": f"unknown task {task!r}; known: "
                                 f"{sorted(vocab_masks)}"})
                    return
                mask = vocab_masks.get(task) if task else None
                beam = None
                if req.get("beam_size") is not None:
                    beam = int(req["beam_size"])
                    if not 1 <= beam <= 20:
                        # validate BEFORE any falsy-normalization so
                        # beam_size=0 is a 400, not silent greedy
                        self._reply(400, {"error": f"beam_size {beam} out "
                                                   f"of range [1, 20]"})
                        return
                    if not hasattr(server.engine, "predict_beam"):
                        # exported bundles ship greedy executables only
                        self._reply(400, {
                            "error": "beam_size is not supported by this "
                                     "deployment (exported bundle serves "
                                     "greedy only; serve from a checkpoint "
                                     "for beam search)"})
                        return
            except Exception as e:
                self._reply(400, {"error": f"bad request: {e}"})
                return
            try:
                out = server.submit(image, query, mask,
                                    beam_size=beam).result(
                    timeout=timeout_s)
                payload = {
                    "answer": out["answer"],
                    "boxes": np.asarray(out["boxes"]).tolist(),
                    "relevance": np.asarray(out["relevance"]).tolist()}
                if "answers" in out:  # beam request: all K + probs
                    payload["answers"] = out["answers"]
                    payload["answer_probs"] = out["answer_probs"]
                self._reply(200, payload)
            except Exception as e:
                self._reply(500, {"error": f"{type(e).__name__}: {e}"})

        def log_message(self, fmt, *args):  # quiet by default
            pass

    return Handler


def make_http_server(server, vocab_masks: dict, size_hw,
                     host: str = "0.0.0.0", port: int = 8000,
                     timeout_s: float = 120.0) -> ThreadingHTTPServer:
    handler = make_handler(server, vocab_masks, size_hw, timeout_s)
    httpd = ThreadingHTTPServer((host, port), handler)
    # non-daemon handler threads + block_on_close: server_close() JOINS
    # in-flight handlers, so a graceful shutdown never kills a thread
    # mid-reply (daemon threads die with the interpreter)
    httpd.daemon_threads = False
    httpd.block_on_close = True
    return httpd


def serve_in_thread(httpd: ThreadingHTTPServer) -> threading.Thread:
    t = threading.Thread(target=httpd.serve_forever, daemon=True)
    t.start()
    return t


def main(argv=None):
    from gpv_tpu.evaluation.evaluators import coco_vocab_mask
    from gpv_tpu.serve import GPVServer

    raw = list(argv if argv is not None else sys.argv[1:])
    bundle = next((o.split("=", 1)[1] for o in raw
                   if o.startswith("bundle=")), None)
    overrides = [o for o in raw if not o.startswith("bundle=")]
    if bundle:
        # AOT-bundle mode is CONFIG-FREE: no model code, no repo configs/
        # tree — a packaged install plus the bundle directory is enough
        # (export.py's deployment contract). Overrides are plain dotted
        # values onto serving defaults.
        from gpv_tpu.export import ExportedEngine
        from gpv_tpu.utils.config import ConfigNode, _parse_scalar
        cfg = ConfigNode({"serve": ConfigNode()})
        for o in overrides:
            k, _, v = o.partition("=")
            cfg.set_path(k, _parse_scalar(v))
        engine = ExportedEngine(bundle)
        H, W = engine.image_hw
        serve_cfg = cfg.get("serve") or {}
        buckets = tuple(serve_cfg.get("bucket_sizes")
                        or engine.batch_sizes)
    else:
        from gpv_tpu.infer.build import build_engine
        from gpv_tpu.utils.config import load_config
        cfg = load_config("configs", "exp/gpv_inference", overrides)
        engine = build_engine(cfg)
        H = int(cfg.task_configs.image_size.H)
        W = int(cfg.task_configs.image_size.W)
        serve_cfg = cfg.get("serve") or {}
        batch = int(serve_cfg.get("batch_size", 20))
        buckets = tuple(serve_cfg.get("bucket_sizes") or (1, 8, batch))
    warm = str(serve_cfg.get("warmup", True)).lower() != "false"
    server = GPVServer(
        engine, max_wait_ms=float(serve_cfg.get("max_wait_ms", 5.0)),
        num_workers=int(serve_cfg.get("num_workers", 2)),
        bucket_sizes=buckets, warmup=(H, W) if warm else None)
    masks = {
        "vqa": None, "captioning": None, "detection": None,
        "classification": coco_vocab_mask(engine.vocab, use_syns=False),
        "classification_syns": coco_vocab_mask(engine.vocab, use_syns=True),
    }
    port = int(cfg.get("port", 8000))
    httpd = make_http_server(server, masks, (H, W),
                             host=str(cfg.get("host", "0.0.0.0")), port=port)
    print(f"gpv_tpu serving on :{port} (buckets={buckets}, "
          f"image {H}x{W}); POST /predict, GET /healthz, GET /stats",
          flush=True)
    # SIGTERM (orchestrator stop) -> graceful drain: stop accepting, serve
    # the queued tail, resolve every in-flight future, then exit 0
    import signal

    def _term(signum, frame):
        threading.Thread(target=httpd.shutdown, daemon=True).start()

    try:
        signal.signal(signal.SIGTERM, _term)
    except ValueError:
        pass  # not the main thread (tests drive main() in a thread)
    try:
        httpd.serve_forever()
    except KeyboardInterrupt:
        pass
    finally:
        httpd.shutdown()           # stop accepting
        server.close(drain=True)   # serve the queued tail
        httpd.server_close()       # join in-flight handler replies


if __name__ == "__main__":
    main()
