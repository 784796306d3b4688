"""Multi-host test worker: one process of a 2-process CPU cluster.

Run: python tests/_mh_worker.py <process_id> <port>
Joins a localhost jax.distributed cluster (2 procs x 4 virtual CPU devices),
builds the tiny GPV train step over the GLOBAL 8-device mesh, feeds its
process-local batch shard through `shard_batch`, and prints the step loss
(identical across processes — the gradient psum is a real cross-process
collective here).
"""
import os
import sys

pid = int(sys.argv[1])
port = sys.argv[2]
os.environ["JAX_PLATFORMS"] = "cpu"
os.environ["XLA_FLAGS"] = "--xla_force_host_platform_device_count=4"

sys.path.insert(0, os.path.dirname(os.path.dirname(
    os.path.abspath(__file__))))
sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")
jax.distributed.initialize(f"localhost:{port}", num_processes=2,
                           process_id=pid)

import numpy as np  # noqa: E402

import jax.numpy as jnp  # noqa: E402

from gpv_tpu.losses import LossConfig  # noqa: E402
from gpv_tpu.parallel import (create_train_state, make_mesh,  # noqa: E402
                              make_train_step, shard_batch)
from gpv_tpu.train import build_optimizer  # noqa: E402

from test_model import tiny_gpv  # noqa: E402
from test_train import make_batch, training_cfg  # noqa: E402

assert len(jax.devices()) == 8, jax.devices()
assert len(jax.local_devices()) == 4

mesh = make_mesh(data=8, model=1)
model = tiny_gpv()
global_batch = make_batch(B=8, seed=0)
local_batch = {k: v[pid * 4:(pid + 1) * 4] for k, v in global_batch.items()}


def barrier(name):
    """Align ranks via the coordination-service KV barrier: Gloo context
    init has a hard ~30 s timeout, and compile times can diverge by more
    than that between ranks under CPU contention (cold vs warm cache)."""
    from jax._src import distributed
    distributed.global_state.client.wait_at_barrier(
        name, timeout_in_ms=3_600_000)

with jax.default_device(jax.local_devices()[0]):
    variables = model.init(jax.random.PRNGKey(0),
                           jnp.asarray(global_batch["image"][:1]),
                           jnp.asarray(global_batch["query_ids"][:1]),
                           jnp.asarray(global_batch["answer_ids"][:1]),
                           train=False)
optimizer = build_optimizer(training_cfg(), steps_per_epoch=10,
                            params=variables["params"])
state = create_train_state(variables, optimizer)
step = make_train_step(model, optimizer, LossConfig(), 0.1, mesh=mesh,
                       donate=False, state_template=state)
sharded = shard_batch(local_batch, mesh)
step.lower(state, sharded, jax.random.PRNGKey(1)).compile()
barrier("mh_step_compiled")
state, losses = step(state, sharded, jax.random.PRNGKey(1))
print(f"MH_RESULT p{pid} total_loss={float(losses['total_loss']):.6f}",
      flush=True)

# grad accumulation over the process-sharded global batch (GSPMD reshapes
# the sharded leading axis into (k, B/k) microbatches)
state2 = create_train_state(variables, optimizer)
step2 = make_train_step(model, optimizer, LossConfig(), 0.1, mesh=mesh,
                        donate=False, state_template=state2, grad_accum=2)
sharded2 = shard_batch(local_batch, mesh)
step2.lower(state2, sharded2, jax.random.PRNGKey(1)).compile()
barrier("mh_accum_compiled")
state2, losses2 = step2(state2, sharded2, jax.random.PRNGKey(1))
print(f"MH_ACCUM p{pid} total_loss={float(losses2['total_loss']):.6f}",
      flush=True)
