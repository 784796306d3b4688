"""Space-to-depth stem rewrite: exactness and params-tree transform.

The s2d stem (gpv_tpu/ops/stem_s2d.py) must be numerically equivalent to
the reference stem conv (torchvision resnet50 conv1, 7x7/s2/pad3 —
reference exp/gpv/models/backbone.py:82-99): same multiply-adds, blocked.
"""
import os

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from gpv_tpu.nn.resnet import ResNet
from gpv_tpu.ops.stem_s2d import (apply_stem_s2d, s2d_stem_kernel,
                                  space_to_depth)


def _conv(x, kernel, strides, padding):
    return jax.lax.conv_general_dilated(
        x, kernel, window_strides=strides, padding=padding,
        dimension_numbers=("NHWC", "HWIO", "NHWC"))


class TestKernelRewrite:
    def test_conv_equivalence(self):
        """conv7x7/s2/pad3 == conv4x4/s1/pad(2,1) over s2d input."""
        rng = np.random.RandomState(0)
        x = jnp.asarray(rng.randn(2, 24, 32, 3).astype(np.float32))
        k7 = rng.randn(7, 7, 3, 16).astype(np.float32)
        ref = _conv(x, jnp.asarray(k7), (2, 2), [(3, 3), (3, 3)])
        got = _conv(space_to_depth(x), jnp.asarray(s2d_stem_kernel(k7)),
                    (1, 1), [(2, 1), (2, 1)])
        assert got.shape == ref.shape
        np.testing.assert_allclose(np.asarray(got), np.asarray(ref),
                                   atol=1e-5, rtol=1e-5)

    def test_zero_taps_only_at_leading_edge(self):
        """The 8x8 padding adds exactly the ky=-1 / kx=-1 zero taps; every
        original kernel entry appears exactly once."""
        k7 = np.arange(7 * 7 * 3 * 2, dtype=np.float64).reshape(7, 7, 3, 2)
        k7 += 1.0  # no zero entries in the source
        kb = s2d_stem_kernel(k7)
        assert kb.shape == (4, 4, 12, 2)
        nonzero = np.count_nonzero(kb[..., 0])
        assert nonzero == 7 * 7 * 3
        assert sorted(kb[..., 0].ravel()[kb[..., 0].ravel() != 0]) == sorted(
            k7[..., 0].ravel())

    def test_rejects_non_stem_kernel(self):
        with pytest.raises(ValueError, match="7x7"):
            s2d_stem_kernel(np.zeros((1, 1, 64, 64)))

    def test_space_to_depth_rejects_odd(self):
        with pytest.raises(ValueError, match="even"):
            space_to_depth(jnp.zeros((1, 7, 8, 3)))


class TestResNetParity:
    def test_full_tower_parity_and_tree_transform(self):
        """A ResNet built with stem_s2d=True over apply_stem_s2d(params)
        matches the plain tower; bottleneck 1x1 'conv1' kernels untouched."""
        rng = np.random.RandomState(1)
        x = jnp.asarray(rng.randn(2, 32, 48, 3).astype(np.float32))
        plain = ResNet(layers=(1, 1, 1, 1), return_layers=("layer4",))
        s2d = ResNet(layers=(1, 1, 1, 1), return_layers=("layer4",),
                     stem_s2d=True)
        variables = plain.init(jax.random.PRNGKey(0), x)
        # randomize the frozen-BN stats so parity covers them too
        stats = jax.tree.map(
            lambda v: jnp.asarray(
                rng.uniform(0.5, 1.5, v.shape).astype(np.float32)),
            variables["batch_stats"])
        variables = {"params": variables["params"], "batch_stats": stats}

        ref = plain.apply(variables, x)["layer4"]
        params2 = apply_stem_s2d(variables["params"])
        got = s2d.apply({"params": params2, "batch_stats": stats},
                        x)["layer4"]
        np.testing.assert_allclose(np.asarray(got), np.asarray(ref),
                                   atol=1e-4, rtol=1e-4)

        # the blocked param shape matches what flax init would create
        init2 = s2d.init(jax.random.PRNGKey(0), x)["params"]
        assert (init2["conv1"]["kernel"].shape
                == np.asarray(params2["conv1"]["kernel"]).shape
                == (4, 4, 12, 64))
        # bottleneck conv1 (1x1) kernels must be untouched
        np.testing.assert_array_equal(
            np.asarray(params2["layer1"]["block0"]["conv1"]["kernel"]),
            np.asarray(
                variables["params"]["layer1"]["block0"]["conv1"]["kernel"]))

    def test_transform_requires_a_stem(self):
        with pytest.raises(ValueError, match="no 7x7"):
            apply_stem_s2d({"dense": {"kernel": np.zeros((8, 8))}})


class TestConfigPath:
    def test_build_gpv_forwards_stem_s2d(self):
        """The documented `model.detr.stem_s2d=true` override must reach
        the DETR module (build_gpv whitelists detr keys explicitly)."""
        import sys
        sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))
        from gpv_tpu.models.gpv import build_gpv
        from gpv_tpu.utils.config import load_config
        from test_schema_sweep import TINY

        cfg = load_config("configs", "exp/gpv",
                          TINY + ["model.detr.stem_s2d=true"]).model
        model = build_gpv(cfg, vocab_size=50)
        assert model.detr_cfg["stem_s2d"] is True
        cfg0 = load_config("configs", "exp/gpv", TINY).model
        assert build_gpv(cfg0, vocab_size=50).detr_cfg["stem_s2d"] is False
