"""Device mesh + sharding helpers (the TPU replacement for DDP/NCCL).

Behavior spec: reference distributed layer (SURVEY.md §2.7) is single-node
multi-process DDP with NCCL all-reduce (`exp/gpv/train_distr.py:170-203`).
TPU-native design: one process drives a `jax.sharding.Mesh`; the train step is
jitted with the batch sharded over the `data` axis and the model replicated
(a `model` axis is reserved for tensor parallelism on larger slices); XLA
emits the gradient reductions over ICI — no hand-written collectives.
"""
from __future__ import annotations

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

DATA_AXIS = "data"
MODEL_AXIS = "model"


def make_mesh(data: int = -1, model: int = 1,
              devices=None) -> Mesh:
    """Build a (data, model) mesh. data=-1 means all remaining devices."""
    devices = list(devices if devices is not None else jax.devices())
    n = len(devices)
    if data == -1:
        assert n % model == 0, f"{n} devices not divisible by model={model}"
        data = n // model
    assert data * model == n, f"mesh {data}x{model} != {n} devices"
    arr = np.asarray(devices).reshape(data, model)
    return Mesh(arr, (DATA_AXIS, MODEL_AXIS))


def mesh_from_config(tpu_cfg, devices=None) -> Mesh:
    return make_mesh(int(tpu_cfg.mesh.data), int(tpu_cfg.mesh.model),
                     devices)


def validate_multihost_mesh(mesh: Mesh, n_processes: int | None = None):
    """Reject multi-host tensor parallelism loudly.

    With >1 processes and a model axis >1, params become global arrays
    SHARDED across hosts: rank-0 checkpointing and rank-0 eval both
    materialize `addressable_data(0)` (one shard), which would silently
    write a corrupt checkpoint / evaluate on truncated weights. GPV at
    ~250M params never needs cross-host TP (SURVEY.md §2.7); until the
    save/eval paths gain an all-rank gather, reject the combination at
    trainer construction instead of corrupting state at the first save.
    """
    n = jax.process_count() if n_processes is None else int(n_processes)
    if n > 1 and mesh.shape.get(MODEL_AXIS, 1) > 1:
        raise ValueError(
            f"tpu.mesh.model={mesh.shape[MODEL_AXIS]} with {n} processes: "
            "multi-host tensor parallelism is not supported — rank-0 "
            "checkpointing/eval assume params are fully replicated across "
            "processes. Use tpu.mesh.model=1 for multi-host runs (pure "
            "DP, the reference's strategy) or single-process TP.")


def batch_sharding(mesh: Mesh) -> NamedSharding:
    """Shard the leading (batch) axis over the data axis."""
    return NamedSharding(mesh, P(DATA_AXIS))


def replicated(mesh: Mesh) -> NamedSharding:
    return NamedSharding(mesh, P())


def initialize_distributed(tpu_cfg) -> bool:
    """Join a multi-host jax cluster if `tpu.distributed` is configured.

    The reference is single-node only (`num_nodes: 1`,
    configs/exp/gpv.yaml:8-17 upstream); this extends the DP story across
    hosts: each host runs one process, `jax.devices()` becomes the global
    device list, and `shard_batch` assembles per-process batch shards into
    one global array. Returns True when distributed mode is active.
    """
    dist = tpu_cfg.get("distributed") if hasattr(tpu_cfg, "get") else None
    if not dist or not dist.get("coordinator_address"):
        return jax.process_count() > 1
    missing = [k for k in ("num_processes", "process_id")
               if dist.get(k) is None]
    if missing:
        raise ValueError(
            "tpu.distributed needs coordinator_address, num_processes and "
            f"process_id; missing: {missing} (got {dict(dist)})")
    # a second Trainer in one process (tests, notebooks) must not re-join.
    # NOTE: only is_initialized() is safe here — jax.process_count() would
    # initialize the XLA backend, after which initialize() refuses to run.
    if jax.distributed.is_initialized():
        return True
    jax.distributed.initialize(str(dist["coordinator_address"]),
                               num_processes=int(dist["num_processes"]),
                               process_id=int(dist["process_id"]))
    return True


def shard_batch(batch, mesh: Mesh):
    """Place a host batch dict on device, sharded along axis 0.

    Single-device meshes use a plain device_put (matching the plain-jit
    train step path — see parallel/train_step.py). On a multi-process
    (multi-host) mesh each process passes its LOCAL rows of the global
    batch; they are assembled into one globally-sharded array without any
    cross-host data movement (rows live where they were produced).
    """
    if mesh.size == 1:
        dev = mesh.devices.reshape(-1)[0]
        return jax.tree.map(lambda x: jax.device_put(x, dev), batch)
    sh = batch_sharding(mesh)
    n_proc = len({d.process_index for d in mesh.devices.flat})
    if n_proc > 1:
        def put(x):
            x = np.asarray(x)
            global_shape = (x.shape[0] * n_proc, *x.shape[1:])
            return jax.make_array_from_process_local_data(sh, x,
                                                          global_shape)
        return jax.tree.map(put, batch)
    return jax.tree.map(lambda x: jax.device_put(x, sh), batch)
