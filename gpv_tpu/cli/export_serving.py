"""Serving-bundle export CLI.

    python -m gpv_tpu.cli.export_serving ckpt=<orbax dir | model.pth> \
        out=<bundle_dir> [batch_sizes=[1,8,20]] [image_h=480] [image_w=640]

Builds the engine (converting a reference torch checkpoint if given),
serializes its greedy-decode executables + folded weights + vocabularies
with `gpv_tpu.export.export_engine`, and prints the manifest. Load with
`gpv_tpu.export.ExportedEngine(bundle_dir)` — no model/flax code needed
at serving time.
"""
import json
import sys


def main(argv=None):
    from gpv_tpu.export import export_engine
    from gpv_tpu.utils.config import load_config
    from gpv_tpu.infer.build import build_engine

    overrides = list(argv if argv is not None else sys.argv[1:])
    keep, out, bs, h, w = [], None, (1, 8, 20), 480, 640
    for o in overrides:
        k, _, v = o.partition("=")
        if k == "out":
            out = v
        elif k == "batch_sizes":
            bs = tuple(int(x) for x in v.strip("[]").split(",") if x)
        elif k == "image_h":
            h = int(v)
        elif k == "image_w":
            w = int(v)
        else:
            keep.append(o)
    if not out:
        raise SystemExit("usage: export_serving ckpt=<path> out=<dir> "
                         "[batch_sizes=[1,8,20]] [image_h=] [image_w=]")
    cfg = load_config("configs", "exp/gpv_inference", keep)
    engine = build_engine(cfg)
    manifest = export_engine(engine, out, batch_sizes=bs, image_hw=(h, w))
    print(json.dumps({"out": out,
                      "modules": sorted(manifest["modules"]),
                      "platforms": sorted({p for m in
                                           manifest["modules"].values()
                                           for p in m["platforms"]})}))


if __name__ == "__main__":
    main()
