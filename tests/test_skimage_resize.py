"""Validation of the skimage-0.17.2-exact resize reconstruction
(`gpv_tpu/data/skimage_resize.py`; VERDICT r4 next #2).

scikit-image itself is absent from this image, so correctness rests on
three independent legs:
  1. hand-computed order-1 warps at the skimage grid positions,
  2. cross-validation of the numpy warp against scipy's OWN independent
     interpolator (`ndi.zoom(order=1, mode='mirror', grid_mode=True)`,
     which implements the identical center-aligned map in C),
  3. the 0.17.2 uint8-prefilter quantization quirk asserted explicitly.
The divergence of the production PIL / jax.image paths from the exact
path is MEASURED here and recorded in PARITY.md #7.
"""
import numpy as np
import pytest

from gpv_tpu.data.skimage_resize import (_mirror_index, skimage_resize_exact,
                                         skimage_read_semantics)

ndi = pytest.importorskip("scipy.ndimage")


def _zoom_reference(img_float, out_shape):
    """Independent scipy implementation of the same warp (zoom with
    grid_mode=True maps src = (dst + 0.5) * in/out - 0.5, like skimage's
    corner-estimated AffineTransform)."""
    zoom = [out_shape[0] / img_float.shape[0],
            out_shape[1] / img_float.shape[1]] + [1.0] * (img_float.ndim - 2)
    return ndi.zoom(img_float, zoom, order=1, mode="mirror",
                    grid_mode=True, prefilter=False)


class TestMirrorIndex:
    def test_reflect_no_edge_repeat(self):
        # numpy-pad 'reflect' of [a b c d]: position -1 -> b, -2 -> c,
        # 4 -> c, 5 -> b, 6 -> a (period 6)
        idx = np.array([-2, -1, 0, 1, 2, 3, 4, 5, 6])
        np.testing.assert_array_equal(
            _mirror_index(idx, 4), [2, 1, 0, 1, 2, 3, 2, 1, 0])

    def test_n1(self):
        np.testing.assert_array_equal(
            _mirror_index(np.array([-1, 0, 1]), 1), [0, 0, 0])


class TestHandComputed:
    def test_identity_same_shape(self):
        rng = np.random.RandomState(0)
        img = rng.randint(0, 256, (5, 7, 3), np.uint8)
        out = skimage_resize_exact(img, (5, 7), anti_aliasing=True)
        np.testing.assert_allclose(out, img / 255.0, atol=1e-15)

    def test_upscale_2_to_4_by_hand(self):
        # src = 0.5*(j+0.5)-0.5 = [-.25, .25, .75, 1.25]; mirror at both ends
        img = np.array([[0.0], [1.0]])
        out = skimage_resize_exact(img, (4, 1), anti_aliasing=False)
        np.testing.assert_allclose(out[:, 0], [0.25, 0.25, 0.75, 0.75],
                                   atol=1e-15)

    def test_downscale_ramp_no_aa_by_hand(self):
        # src = 2*(j+0.5)-0.5 = [0.5, 2.5] on the ramp [0,1,2,3]
        img = np.arange(4, dtype=np.float64)[:, None]
        out = skimage_resize_exact(img, (2, 1), anti_aliasing=False)
        np.testing.assert_allclose(out[:, 0], [0.5, 2.5], atol=1e-15)

    def test_upscale_is_pure_interp(self):
        # enlarging: factors < 1 -> sigma 0 -> anti_aliasing is a no-op
        rng = np.random.RandomState(1)
        img = rng.rand(6, 5)
        a = skimage_resize_exact(img, (9, 11), anti_aliasing=True)
        b = skimage_resize_exact(img, (9, 11), anti_aliasing=False)
        np.testing.assert_array_equal(a, b)


class TestScipyCrossValidation:
    @pytest.mark.parametrize("in_shape,out_shape", [
        ((480, 640), (480, 640)),
        ((427, 640), (480, 640)),     # typical COCO landscape
        ((640, 427), (480, 640)),     # portrait squeezed
        ((1024, 768), (480, 640)),    # strong downscale
        ((93, 121), (480, 640)),      # cls-crop-style upscale
        ((35, 28), (480, 640)),       # tiny crop
    ])
    def test_warp_matches_ndi_zoom(self, in_shape, out_shape):
        rng = np.random.RandomState(hash(in_shape) % 2**31)
        img = rng.rand(*in_shape, 3)
        ours = skimage_resize_exact(img, out_shape, anti_aliasing=False)
        ref = _zoom_reference(img, out_shape)
        assert float(np.abs(ours - ref).max()) < 1e-12

    def test_full_pipeline_uint8(self):
        rng = np.random.RandomState(7)
        img = rng.randint(0, 256, (427, 640, 3), np.uint8)
        ours = skimage_resize_exact(img, (480, 640), anti_aliasing=True)
        # independent composition: same prefilter contract, scipy warp
        sigma = [max(0.0, (427 / 480 - 1) / 2), max(0.0, (640 / 640 - 1) / 2),
                 0.0]
        filt = img
        if any(s > 0 for s in sigma):
            filt = ndi.gaussian_filter(img, sigma, cval=0, mode="mirror")
        ref = _zoom_reference(filt.astype(np.float64) / 255.0, (480, 640))
        assert float(np.abs(ours - ref).max()) < 1e-12

    def test_downscale_pipeline_uint8(self):
        rng = np.random.RandomState(8)
        img = rng.randint(0, 256, (1024, 1280, 3), np.uint8)
        ours = skimage_resize_exact(img, (480, 640), anti_aliasing=True)
        sigma = [(1024 / 480 - 1) / 2, (1280 / 640 - 1) / 2, 0.0]
        filt = ndi.gaussian_filter(img, sigma, cval=0, mode="mirror")
        ref = _zoom_reference(filt.astype(np.float64) / 255.0, (480, 640))
        assert float(np.abs(ours - ref).max()) < 1e-12


class TestSkimage017Quirks:
    def test_uint8_prefilter_quantizes(self):
        """0.17.2 smooths at the INPUT dtype: a uint8 checkerboard filtered
        in uint8 differs from float-first filtering (0.19+ behavior) — the
        exact path must reproduce the 0.17.2 order."""
        img = np.zeros((64, 64), np.uint8)
        img[::2] = 1  # alternating 0/1 rows: uint8 smoothing truncates
        out_uint8_path = skimage_resize_exact(img, (32, 32),
                                              anti_aliasing=True)
        sigma = [0.5, 0.5]
        float_first = ndi.gaussian_filter(img / 255.0, sigma, cval=0,
                                          mode="mirror")
        out_float_path = _zoom_reference(float_first, (32, 32))
        # they must genuinely differ (else this test guards nothing)...
        assert float(np.abs(out_uint8_path - out_float_path).max()) > 1e-4
        # ...and ours must equal the uint8-dtype-filter composition
        filt = ndi.gaussian_filter(img, sigma, cval=0, mode="mirror")
        ref = _zoom_reference(filt.astype(np.float64) / 255.0, (32, 32))
        assert float(np.abs(out_uint8_path - ref).max()) < 1e-12

    def test_grayscale_tile_and_alpha_drop(self):
        rng = np.random.RandomState(9)
        gray = rng.randint(0, 256, (100, 120), np.uint8)
        out = skimage_read_semantics(gray, 480, 640)
        assert out.shape == (480, 640, 3)
        np.testing.assert_array_equal(out[..., 0], out[..., 1])
        rgba = rng.randint(0, 256, (100, 120, 4), np.uint8)
        out4 = skimage_read_semantics(rgba, 480, 640)
        np.testing.assert_array_equal(
            out4, skimage_resize_exact(rgba[:, :, :3], (480, 640)))


class TestProductionPathDivergence:
    """Measure (and bound) the production resize paths against the exact
    reference path — the numbers PARITY.md #7 records (VERDICT r4 next #2:
    'a measured per-pixel bound instead of a deferred gate')."""

    def _structured(self, h, w, seed=10):
        rng = np.random.RandomState(seed)
        yy, xx = np.mgrid[0:h, 0:w]
        img = np.stack([
            (255 * xx / max(w - 1, 1)),
            (255 * yy / max(h - 1, 1)),
            255.0 * ((xx // 8 + yy // 8) % 2)], -1)
        img = 0.7 * img + 0.3 * rng.randint(0, 256, (h, w, 3))
        return img.astype(np.uint8)

    @pytest.mark.parametrize("in_shape", [(427, 640), (1024, 1280),
                                          (93, 121)])
    def test_pil_and_jax_divergence_measured(self, in_shape):
        from gpv_tpu.datasets.coco import resize_uint8
        img = self._structured(*in_shape)
        exact = skimage_resize_exact(img, (480, 640), anti_aliasing=True)

        pil = resize_uint8(img, 480, 640).astype(np.float64) / 255.0
        d_pil = float(np.abs(pil - exact).max())

        import jax.numpy as jnp
        from gpv_tpu.ops.image import resize_image
        jx = np.asarray(resize_image(jnp.asarray(img, jnp.float32) / 255.0,
                                     480, 640), np.float64)
        d_jax = float(np.abs(jx - exact).max())
        # interior (border row/col excluded): PIL edge-CLAMPS where skimage
        # MIRRORS, so the outermost pixels legitimately differ by up to the
        # local edge amplitude (measured 0.39 on a hard checkerboard edge)
        d_pil_int = float(np.abs(pil - exact)[2:-2, 2:-2].max())
        mean_pil = float(np.abs(pil - exact).mean())
        print(f"\n[resize divergence {in_shape}] PIL max={d_pil:.4f} "
              f"interior={d_pil_int:.4f} mean={mean_pil:.5f} "
              f"jax.image max={d_jax:.4f} (of 1.0 range)")
        # measured r5 (PARITY.md #7): interior PIL divergence is at uint8
        # quantization level for upscales (<0.01) and <=0.16 on hard
        # checkerboard edges for 2x+ downscales (PIL box-filter vs skimage
        # gaussian anti-aliasing); border row/col <= 0.4 (clamp vs mirror)
        # (mean over the strong 2x+ downscale is ~0.02: the filter
        # difference pervades, not just edges — exactly why check_parity
        # and host_resize='exact' exist)
        assert d_pil_int < 0.2 and mean_pil < 0.03
        assert d_pil < 0.45 and d_jax < 0.45
