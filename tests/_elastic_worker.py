"""Elastic-recovery worker: resume an 8-device checkpoint on 4 devices.

Run: python tests/_elastic_worker.py <data_dir> <exp_dir> <expected_step>
Spawned by test_e2e.py::test_elastic_resume_on_fewer_devices with XLA
forced to FOUR virtual CPU devices, while the checkpoint it restores was
written by a trainer on the default EIGHT-device mesh. Checkpoints are
host numpy (topology-independent); the restored state must carry the
saved step and train one more epoch on the smaller mesh. This is the
preempted-pod-resumes-on-a-smaller-slice scenario the reference cannot
do at all (SURVEY.md §5: recovery = manual restart on the same rig).
"""
import os
import sys

data_dir, exp_dir, expected_step = sys.argv[1], sys.argv[2], int(sys.argv[3])
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

import numpy as np  # noqa: E402

from _fake_data import tiny_cfg  # noqa: E402
from gpv_tpu.train.trainer import Trainer  # noqa: E402

assert len(jax.devices()) == 4, jax.devices()
cfg = tiny_cfg(data_dir, exp_dir, extra=[
    "exp_name=elastic_n4",
    f"training.ckpt={exp_dir}/elastic_n4/ckpts/model",
    "training.num_epochs=2",
])
trainer = Trainer(cfg)
assert dict(trainer.mesh.shape) == {"data": 4, "model": 1}, trainer.mesh
assert int(trainer.state.step) == expected_step, \
    (int(trainer.state.step), expected_step)
results = trainer.train()
assert np.isfinite(results["model_selection_metric"]), results
print("ELASTIC_OK", int(trainer.state.step))
