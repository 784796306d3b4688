"""Native C++ component tests: LSAP vs scipy, resize sanity + speed."""
import numpy as np
import pytest

native = pytest.importorskip("gpv_tpu.native")


class TestNativeLsap:
    def test_matches_scipy_optimum(self):
        from scipy.optimize import linear_sum_assignment
        rng = np.random.RandomState(0)
        for _ in range(30):
            m = rng.randint(1, 40)
            q = rng.randint(m, 120)
            c = (rng.randn(m, q) * rng.uniform(0.1, 5)).astype(np.float32)
            col = native.solve_lsap_native(c)
            ri, ci = linear_sum_assignment(c)
            assert len(np.unique(col)) == m
            np.testing.assert_allclose(c[np.arange(m), col].sum(),
                                       c[ri, ci].sum(), rtol=1e-5, atol=1e-4)

    def test_batch(self):
        from scipy.optimize import linear_sum_assignment
        rng = np.random.RandomState(1)
        c = rng.randn(4, 8, 30).astype(np.float32)
        out = native.solve_lsap_native(c)
        for b in range(4):
            ri, ci = linear_sum_assignment(c[b])
            np.testing.assert_allclose(
                c[b][np.arange(8), out[b]].sum(), c[b][ri, ci].sum(),
                rtol=1e-5, atol=1e-4)

    def test_matches_jax_matcher(self):
        """Native solver is the oracle for the on-device JAX solver."""
        import jax.numpy as jnp
        from gpv_tpu.ops import solve_lsap
        rng = np.random.RandomState(2)
        for _ in range(5):
            c = rng.randn(12, 100).astype(np.float32)
            a = native.solve_lsap_native(c)
            b = np.asarray(solve_lsap(jnp.asarray(c)))
            np.testing.assert_allclose(
                c[np.arange(12), a].sum(), c[np.arange(12), b].sum(),
                rtol=1e-5, atol=1e-4)


class TestNativeResize:
    def test_constant_image(self):
        img = np.full((100, 160, 3), 77, np.uint8)
        out = native.resize_bilinear_native(img, 48, 64)
        assert out.shape == (48, 64, 3)
        assert (out == 77).all()

    def test_gradient_preserved(self):
        img = np.tile(np.linspace(0, 255, 160, dtype=np.uint8), (100, 1))
        img = np.stack([img] * 3, -1)
        out = native.resize_bilinear_native(img, 50, 80)
        # monotone horizontal gradient survives the resize
        row = out[25, :, 0].astype(int)
        assert (np.diff(row) >= 0).all()
        assert row[0] < 10 and row[-1] > 245

    def test_close_to_pil(self):
        from PIL import Image
        rng = np.random.RandomState(0)
        img = rng.randint(0, 255, (96, 128, 3), np.uint8)
        ours = native.resize_bilinear_native(img, 48, 64).astype(int)
        pil = np.asarray(Image.fromarray(img).resize(
            (64, 48), Image.BILINEAR)).astype(int)
        # PIL uses a true area-weighted bilinear on downscale (support
        # scaling); allow loose agreement
        assert np.abs(ours - pil).mean() < 30


class TestNativeColorJitter:
    def test_native_matches_numpy_reference(self):
        """Fused C++ jitter (imageproc.cc color_jitter_f32) == the numpy
        reference math for every op and random order/factors."""
        from gpv_tpu.datasets import transforms as T

        if T._native_jitter() is None:
            pytest.skip("native toolchain unavailable")
        img = np.random.RandomState(0).randint(
            0, 255, (64, 96, 3), np.uint8)
        jit = T.ColorJitter(0.4, 0.4, 0.4, 0.1, p=1.0)
        for seed in range(5):
            a = jit(img.copy(), np.random.RandomState(seed), native=True)
            b = jit(img.copy(), np.random.RandomState(seed), native=False)
            np.testing.assert_allclose(a, b, atol=5e-3)

    def test_native_grayscale_matches(self):
        from gpv_tpu.datasets import transforms as T

        if T._native_jitter() is None:
            pytest.skip("native toolchain unavailable")
        img = np.random.RandomState(1).randint(
            0, 255, (32, 48, 3), np.uint8)
        g = T.RandomGrayscale(p=1.0)
        a = g(img.copy(), np.random.RandomState(0), native=True)
        b = g(img.copy(), np.random.RandomState(0), native=False)
        np.testing.assert_allclose(a, b, atol=1e-3)

    def test_rng_stream_unchanged_by_backend(self):
        """Factor sampling must consume the SAME rng stream on both paths
        (checkpointed-run reproducibility across toolchains)."""
        from gpv_tpu.datasets import transforms as T

        img = np.random.RandomState(2).randint(
            0, 255, (16, 16, 3), np.uint8)
        jit = T.ColorJitter(0.2, 0.2, 0.2, 0.0, p=0.8)
        r1, r2 = np.random.RandomState(9), np.random.RandomState(9)
        jit(img.copy(), r1, native=True)
        jit(img.copy(), r2, native=False)
        assert r1.rand() == r2.rand()
