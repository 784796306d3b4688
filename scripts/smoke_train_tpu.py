"""Full Trainer cycle on the REAL accelerator (not the CPU test mesh).

Every trainer-path test runs on the virtual CPU mesh (tests/conftest.py
pins JAX_PLATFORMS=cpu); this script executes the identical tiny e2e
drive — fake COCO tree -> Trainer(cfg).train(): train epoch (with
grad-accum microbatching) -> in-train eval -> best-metric checkpoint ->
HTML vis — on whatever real device jax finds, and prints one JSON line.
It validates device-specific behavior the CPU mesh can't (bf16 default
dtype, buffer donation on the relay, host<->device sync points in the
epoch loop).

Usage: python scripts/smoke_train_tpu.py [epochs=1] [dtype=bfloat16]
"""
import json
import os
import sys
import tempfile
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)
sys.path.insert(0, os.path.join(REPO, "tests"))


def main():
    args = dict(a.split("=", 1) for a in sys.argv[1:])
    epochs = int(args.get("epochs", "1"))
    dtype = args.get("dtype", "bfloat16")

    import jax
    jax.config.update("jax_compilation_cache_dir", "/tmp/gpv_jax_cache")
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1)
    dev = jax.devices()[0]

    import numpy as np
    from _fake_data import make_fake_data, tiny_cfg

    with tempfile.TemporaryDirectory() as tmp:
        data_dir = make_fake_data(os.path.join(tmp, "data"))
        cfg = tiny_cfg(data_dir, os.path.join(tmp, "exp"), extra=(
            "training.grad_accum_steps=2",
            f"training.num_epochs={epochs}",
            f"tpu.dtype={dtype}",
        ))
        from gpv_tpu.train.trainer import Trainer
        t0 = time.perf_counter()
        trainer = Trainer(cfg)
        results = trainer.train()
        wall = time.perf_counter() - t0

        metric = float(results["model_selection_metric"])
        ckpt = os.path.join(cfg.ckpt_dir, "model")
        ok = (np.isfinite(metric) and os.path.exists(ckpt)
              and bool(list(__import__("pathlib").Path(cfg.exp_dir).glob(
                  "training_visualizations/*/index.html"))))
        print(json.dumps({
            "smoke": "trainer_cycle", "device": str(dev.device_kind),
            "platform": dev.platform, "dtype": dtype, "epochs": epochs,
            "model_selection_metric": round(metric, 4),
            "wall_s": round(wall, 1), "ok": ok}), flush=True)
        if not ok:
            raise SystemExit(1)


if __name__ == "__main__":
    main()
