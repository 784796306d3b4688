"""Frozen-BN folding: outputs identical before/after folding."""
import numpy as np

import jax
import jax.numpy as jnp

from gpv_tpu.nn.resnet import ResNet
from gpv_tpu.ops.fold_bn import fold_frozen_bn


class TestFoldBn:
    def test_resnet_outputs_match(self):
        model = ResNet(layers=(1, 1), return_layers=("layer2",))
        x = jax.random.normal(jax.random.PRNGKey(0), (2, 32, 48, 3))
        variables = model.init(jax.random.PRNGKey(1), x)
        # randomize the BN statistics so folding is non-trivial
        def randomize(stats, key=[2]):
            out = {}
            for k, v in stats.items():
                if isinstance(v, dict):
                    out[k] = randomize(v)
                else:
                    key[0] += 1
                    rng = np.random.RandomState(key[0])
                    if k in ("weight",):
                        out[k] = jnp.asarray(
                            rng.uniform(0.5, 1.5, v.shape).astype(np.float32))
                    elif k == "bias":
                        out[k] = jnp.asarray(
                            rng.randn(*v.shape).astype(np.float32) * 0.1)
                    elif k == "running_mean":
                        out[k] = jnp.asarray(
                            rng.randn(*v.shape).astype(np.float32) * 0.2)
                    else:  # running_var
                        out[k] = jnp.asarray(
                            rng.uniform(0.5, 2.0, v.shape).astype(np.float32))
            return out

        stats = randomize(variables["batch_stats"])
        ref = model.apply({"params": variables["params"],
                           "batch_stats": stats}, x)["layer2"]

        fp, fs = fold_frozen_bn(variables["params"], stats)
        got = model.apply({"params": jax.tree.map(jnp.asarray, fp),
                           "batch_stats": jax.tree.map(jnp.asarray, fs)},
                          x)["layer2"]
        np.testing.assert_allclose(np.asarray(got), np.asarray(ref),
                                   atol=2e-4, rtol=1e-4)

    def test_folded_bn_scale_is_identity(self):
        model = ResNet(layers=(1,), return_layers=("layer1",))
        x = jnp.zeros((1, 16, 16, 3))
        variables = model.init(jax.random.PRNGKey(0), x)
        _, fs = fold_frozen_bn(variables["params"],
                               variables["batch_stats"])
        bn = fs["bn1"]
        scale = bn["weight"] / np.sqrt(bn["running_var"] + 1e-5)
        np.testing.assert_allclose(scale, 1.0, rtol=1e-6)
