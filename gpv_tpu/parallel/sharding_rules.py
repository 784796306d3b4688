"""Parameter sharding rules for tensor parallelism on the `model` mesh axis.

The reference has no TP (SURVEY.md §2.7); GPV at ~250M params doesn't need
it for memory, but sharding the wide matmuls lets larger slices scale
compute per step. Strategy (Megatron-style pairs, no extra collectives
beyond what GSPMD inserts):

- attention q/k/v projections: shard the OUTPUT (head) dim; out_proj
  shards the INPUT dim -> one all-reduce per attention block.
- FFN in (d -> 4d): shard OUTPUT; FFN out (4d -> d): shard INPUT.
- embeddings / layernorms / heads stay replicated (small).

`param_partition_spec` maps a param path to a PartitionSpec;
`make_param_shardings` builds the NamedSharding tree for a mesh. The data
axis never shards params (pure DP there).
"""
from __future__ import annotations

import jax
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from .mesh import MODEL_AXIS

# kernel-name suffixes -> which matmul dim to shard
_COL_PARALLEL = ("q_proj", "k_proj", "v_proj", "linear1", "intermediate",
                 "ffn_in1", "ffn_in2", "query1", "key1", "value1",
                 "query2", "key2", "value2")
_ROW_PARALLEL = ("out_proj", "linear2", "output", "ffn_out1", "ffn_out2")


def param_partition_spec(path: tuple, leaf) -> P:
    """Param path (tuple of str keys) -> PartitionSpec."""
    keys = [str(k) for k in path]
    name = keys[-2] if len(keys) >= 2 else ""
    kind = keys[-1]  # kernel | bias | scale | embedding | ...
    if kind != "kernel" or getattr(leaf, "ndim", len(getattr(leaf, "shape", ()))) != 2:
        return P()
    if name in _COL_PARALLEL:
        return P(None, MODEL_AXIS)
    if name in _ROW_PARALLEL:
        return P(MODEL_AXIS, None)
    return P()


def make_param_shardings(mesh: Mesh, params):
    """Pytree of NamedShardings matching `params` for this mesh."""
    def spec(path, leaf):
        if mesh.shape.get(MODEL_AXIS, 1) == 1:
            return NamedSharding(mesh, P())
        ps = param_partition_spec(tuple(k.key for k in path), leaf)
        # only shard dims divisible by the axis size
        axis = mesh.shape[MODEL_AXIS]
        shape = getattr(leaf, "shape", ())
        for dim, part in enumerate(ps):
            if part == MODEL_AXIS and (len(shape) <= dim
                                       or shape[dim] % axis != 0):
                return NamedSharding(mesh, P())
        return NamedSharding(mesh, ps)

    return jax.tree_util.tree_map_with_path(spec, params)


def shard_params(params, mesh: Mesh):
    """Place (and lay out) a param tree according to the TP rules."""
    shardings = make_param_shardings(mesh, params)
    return jax.tree.map(jax.device_put, params, shardings)
