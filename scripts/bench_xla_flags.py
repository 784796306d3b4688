"""XLA-flag sweep on the full B=120 train step (MFU-tail experiment).

BASELINE.md "r3 roofline": the step is HBM-bound (~38% MFU cap); the
addressable gap is ~70 ms of non-overlapped pointwise tail. These flags
steer XLA's fusion/scheduling without touching model code — each sweep
point recompiles the step under one flag set and reports ms/step
(min-of-N, RNG-varied inputs per call per the relay dedup rule).

Usage:
  python scripts/bench_xla_flags.py [B=120] [accum=4] [steps=4]

Flag sets swept (TPU-relevant, safe-to-fail: a set that crashes compile
is reported and skipped):
  baseline                 (no extra flags)
  vmem64                   --xla_tpu_scoped_vmem_limit_kib=65536
  vmem96                   --xla_tpu_scoped_vmem_limit_kib=98304
  aggressive_fusion        --xla_tpu_enable_aggressive_loop_fusion_layout_opt=true
  licm                     --xla_tpu_enable_dot_strength_reduction=false
"""
import json
import os
import subprocess
import sys
from pathlib import Path

REPO = Path(__file__).resolve().parent.parent

FLAG_SETS = {
    "baseline": "",
    "vmem64": "--xla_tpu_scoped_vmem_limit_kib=65536",
    "vmem96": "--xla_tpu_scoped_vmem_limit_kib=98304",
    "aggressive_fusion":
        "--xla_tpu_enable_aggressive_loop_fusion_layout_opt=true",
    "no_dot_strength_red": "--xla_tpu_enable_dot_strength_reduction=false",
}


def main():
    args = dict(a.split("=", 1) for a in sys.argv[1:])
    smoke = bool(int(args.get("smoke", 0)))
    B = int(args.get("B", 4 if smoke else 120))
    accum = int(args.get("accum", 1 if smoke else 4))
    steps = int(args.get("steps", 2 if smoke else 4))

    flag_sets = FLAG_SETS
    if smoke:
        # smoke=1: validate the subprocess plumbing on CPU with a tiny
        # model before the TPU is available. The TPU-only flag names are
        # unknown to the CPU backend — that exercises the safe-to-fail
        # error path on one set; "baseline" must produce a real row.
        flag_sets = {"baseline": FLAG_SETS["baseline"],
                     "vmem64": FLAG_SETS["vmem64"]}

    for name, flags in flag_sets.items():
        env = dict(os.environ)
        base = env.get("XLA_FLAGS", "")
        env["XLA_FLAGS"] = f"{base} {flags}".strip()
        # fresh process per flag set: XLA flags are read once at backend
        # init, and the persistent compile cache keys include them
        cmd = [sys.executable, str(REPO / "scripts/bench_train_step.py"),
               f"B={B},accum={accum}" + (",tiny=1" if smoke else ""),
               f"steps={steps}"] + (["platform=cpu"] if smoke else [])
        try:
            out = subprocess.run(cmd, env=env, cwd=str(REPO),
                                 capture_output=True, text=True,
                                 timeout=3600)
            rows = [l for l in out.stdout.splitlines()
                    if l.startswith("{")]
            if out.returncode != 0 or not rows:
                print(json.dumps({"flags": name, "error":
                                  (out.stderr or out.stdout)[-400:]}),
                      flush=True)
                continue
            row = json.loads(rows[-1])
            row["flags"] = name
            print(json.dumps(row), flush=True)
        except subprocess.TimeoutExpired:
            print(json.dumps({"flags": name, "error": "timeout"}),
                  flush=True)


if __name__ == "__main__":
    main()
