"""Multi-host FULL-TRAINER worker: one process of a 2-process CPU cluster.

Run: python tests/_mh_trainer_worker.py <process_id> <port> <work_dir>
Joins a localhost jax.distributed cluster (2 procs x 4 virtual CPU devices)
through the Trainer's own `initialize_distributed` config path, then runs a
complete tiny epoch: launch eval (rank 0 with rank-local host weights) ->
sharded train steps over the global 8-device mesh -> rank-0 checkpoint
(orbax restricted to the active process) -> final eval behind the
end-of-train barrier. Validates the whole survivability story the round-2
verdict flagged: rank 1 must NOT hang or die while rank 0 evaluates
(reference behavior: rank-gated eval, train_distr.py:327-394).
"""
import os
import sys

pid = int(sys.argv[1])
port = sys.argv[2]
work_dir = sys.argv[3]
os.environ["JAX_PLATFORMS"] = "cpu"
os.environ["XLA_FLAGS"] = "--xla_force_host_platform_device_count=4"

sys.path.insert(0, os.path.dirname(os.path.dirname(
    os.path.abspath(__file__))))
sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_compilation_cache_dir",
                  "/tmp/gpv_tpu_test_jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1)

from _fake_data import tiny_cfg  # noqa: E402
from gpv_tpu.train.trainer import Trainer  # noqa: E402

data_dir = os.path.join(work_dir, "data")
exp_dir = os.path.join(work_dir, "exp")  # shared; only rank 0 writes
cfg = tiny_cfg(data_dir, exp_dir, extra=[
    "tpu.mesh.data=8",
    f"tpu.distributed={{coordinator_address: localhost:{port}, "
    f"num_processes: 2, process_id: {pid}}}",
    # 24 train samples / global batch 8 = 3 exact sharded steps
    "training.ckpt_step=2",  # exercise the rolling 'last' ckpt mid-epoch
    # vis batch == eval batch so predict() reuses one compiled executable
    "training.num_vis_samples=4",
    # rank-0 eval shards over rank 0's own 4 local devices (multi-host
    # local-mesh inference): the engine mesh must stay fully addressable
    # while the TRAIN mesh spans both processes
    "tpu.infer_data_parallel=-1",
])

trainer = Trainer(cfg)
assert jax.process_count() == 2, jax.process_count()
assert len(jax.devices()) == 8
assert trainer.is_main == (pid == 0)
# eval engine shards over THIS process's 4 local devices while the train
# mesh spans all 8 global devices (infer_data_parallel=-1 above)
assert trainer.engine.mesh is not None
assert trainer.engine._dp == 4, trainer.engine._dp

results = trainer.train()
if pid == 0:
    assert "model_selection_metric" in results, results
    import numpy as np
    assert np.isfinite(results["model_selection_metric"])
    print(f"MH_TRAIN p{pid} sel={results['model_selection_metric']:.6f} "
          f"step={trainer.step}", flush=True)
else:
    assert results == {}
    print(f"MH_TRAIN p{pid} done step={trainer.step}", flush=True)
