"""Unit tests for core geometry/matching/roi ops against independent references."""
import numpy as np
import pytest

import jax
import jax.numpy as jnp

from gpv_tpu.ops import (box_cxcywh_to_xyxy, box_iou, box_xyxy_to_cxcywh,
                         elementwise_generalized_box_iou, generalized_box_iou,
                         hungarian_match, roi_align_mean_pooled,
                         sine_position_embedding_2d,
                         sine_position_encoding_1d, solve_lsap)


def rand_boxes_xyxy(rng, n):
    x0y0 = rng.uniform(0, 0.6, size=(n, 2))
    wh = rng.uniform(0.05, 0.4, size=(n, 2))
    return np.concatenate([x0y0, x0y0 + wh], -1).astype(np.float32)


class TestBoxes:
    def test_roundtrip(self):
        rng = np.random.RandomState(0)
        b = rand_boxes_xyxy(rng, 32)
        out = np.asarray(box_cxcywh_to_xyxy(box_xyxy_to_cxcywh(jnp.asarray(b))))
        np.testing.assert_allclose(out, b, atol=1e-6)

    def test_iou_reference(self):
        rng = np.random.RandomState(1)
        a, b = rand_boxes_xyxy(rng, 7), rand_boxes_xyxy(rng, 5)
        iou, _ = box_iou(jnp.asarray(a), jnp.asarray(b))
        iou = np.asarray(iou)
        # brute-force reference
        for i in range(7):
            for j in range(5):
                xx0 = max(a[i, 0], b[j, 0]); yy0 = max(a[i, 1], b[j, 1])
                xx1 = min(a[i, 2], b[j, 2]); yy1 = min(a[i, 3], b[j, 3])
                inter = max(0, xx1 - xx0) * max(0, yy1 - yy0)
                area_a = (a[i, 2] - a[i, 0]) * (a[i, 3] - a[i, 1])
                area_b = (b[j, 2] - b[j, 0]) * (b[j, 3] - b[j, 1])
                ref = inter / (area_a + area_b - inter)
                assert abs(iou[i, j] - ref) < 1e-5

    def test_giou_bounds_and_identity(self):
        rng = np.random.RandomState(2)
        a = rand_boxes_xyxy(rng, 16)
        g = np.asarray(generalized_box_iou(jnp.asarray(a), jnp.asarray(a)))
        np.testing.assert_allclose(np.diag(g), 1.0, atol=1e-5)
        assert (g >= -1 - 1e-5).all() and (g <= 1 + 1e-5).all()

    def test_elementwise_giou_matches_diag(self):
        rng = np.random.RandomState(3)
        a, b = rand_boxes_xyxy(rng, 9), rand_boxes_xyxy(rng, 9)
        full = np.diag(np.asarray(generalized_box_iou(jnp.asarray(a), jnp.asarray(b))))
        elt = np.asarray(elementwise_generalized_box_iou(jnp.asarray(a), jnp.asarray(b)))
        np.testing.assert_allclose(elt, full, atol=1e-5)


class TestPosEnc:
    def test_sine_2d_shape_and_norm(self):
        mask = jnp.ones((2, 6, 8), dtype=bool)
        pos = sine_position_embedding_2d(mask, num_pos_feats=128)
        assert pos.shape == (2, 6, 8, 256)
        # torch-reference check of a few values: last valid row/col maps to 2*pi
        pos_np = np.asarray(pos)
        # feature 0 of y-part at last row: sin(2*pi / 10000^0) = sin(2*pi)
        np.testing.assert_allclose(pos_np[0, -1, 0, 0], np.sin(2 * np.pi), atol=1e-5)

    def test_sine_2d_torch_parity(self):
        """Exact parity with the reference PositionEmbeddingSine math."""
        import math
        B, H, W, F = 1, 5, 7, 64
        valid = np.ones((B, H, W), bool)
        valid[:, 4:, :] = False  # padded bottom row
        pos = np.asarray(sine_position_embedding_2d(jnp.asarray(valid), F))
        # independent numpy re-derivation
        not_mask = valid.astype(np.float32)
        y = not_mask.cumsum(1); x = not_mask.cumsum(2)
        eps = 1e-6; scale = 2 * math.pi
        y = y / (y[:, -1:, :] + eps) * scale
        x = x / (x[:, :, -1:] + eps) * scale
        dim_t = 10000.0 ** (2 * (np.arange(F) // 2) / F)
        px = x[..., None] / dim_t
        py = y[..., None] / dim_t
        px = np.stack([np.sin(px[..., 0::2]), np.cos(px[..., 1::2])], -1).reshape(B, H, W, -1)
        py = np.stack([np.sin(py[..., 0::2]), np.cos(py[..., 1::2])], -1).reshape(B, H, W, -1)
        ref = np.concatenate([py, px], -1)
        np.testing.assert_allclose(pos, ref, atol=1e-4)

    def test_sine_1d(self):
        import math
        pe = np.asarray(sine_position_encoding_1d(8, 5))
        div = np.exp(np.arange(0, 8, 2) * -(math.log(10000.0) / 8))
        assert abs(pe[3, 0] - np.sin(3 * div[0])) < 1e-6
        assert abs(pe[3, 1] - np.cos(3 * div[0])) < 1e-6


def _roi_align_ref(feat_chw, boxes_xyxy, pooled=7):
    """NumPy port of torchvision roi_align aligned=True, sampling_ratio=-1."""
    C, H, W = feat_chw.shape
    out = np.zeros((len(boxes_xyxy), C, pooled, pooled), np.float32)

    def bilinear(c, y, x):
        if y < -1.0 or y > H or x < -1.0 or x > W:
            return 0.0
        y = max(y, 0.0); x = max(x, 0.0)
        y_low, x_low = int(y), int(x)
        if y_low >= H - 1:
            y_high = y_low = H - 1; y = float(y_low)
        else:
            y_high = y_low + 1
        if x_low >= W - 1:
            x_high = x_low = W - 1; x = float(x_low)
        else:
            x_high = x_low + 1
        ly, lx = y - y_low, x - x_low
        hy, hx = 1 - ly, 1 - lx
        return (hy * hx * feat_chw[c, y_low, x_low] + hy * lx * feat_chw[c, y_low, x_high]
                + ly * hx * feat_chw[c, y_high, x_low] + ly * lx * feat_chw[c, y_high, x_high])

    for n, (x0, y0, x1, y1) in enumerate(boxes_xyxy):
        rsw, rsh = x0 - 0.5, y0 - 0.5
        rw, rh = x1 - x0, y1 - y0
        bh, bw = rh / pooled, rw / pooled
        gh = max(int(np.ceil(rh / pooled)), 1)
        gw = max(int(np.ceil(rw / pooled)), 1)
        for c in range(C):
            for ph in range(pooled):
                for pw in range(pooled):
                    acc = 0.0
                    for iy in range(gh):
                        yy = rsh + ph * bh + (iy + 0.5) * bh / gh
                        for ix in range(gw):
                            xx = rsw + pw * bw + (ix + 0.5) * bw / gw
                            acc += bilinear(c, yy, xx)
                    out[n, c, ph, pw] = acc / (gh * gw)
    return out


class TestRoiAlign:
    def test_vs_torchvision_semantics(self):
        rng = np.random.RandomState(0)
        H, W, C, N = 15, 20, 6, 5
        feat = rng.randn(H, W, C).astype(np.float32)
        boxes = []
        for _ in range(N):
            cx, cy = rng.uniform(0.2, 0.8, 2)
            w, h = rng.uniform(0.05, 0.5, 2)
            boxes.append([cx, cy, w, h])
        boxes = np.asarray(boxes, np.float32)

        got = np.asarray(roi_align_mean_pooled(
            jnp.asarray(feat[None]), jnp.asarray(boxes[None]), pooled=7, max_grid=8))[0]

        boxes_xyxy = np.stack([
            W * (boxes[:, 0] - boxes[:, 2] / 2), H * (boxes[:, 1] - boxes[:, 3] / 2),
            W * (boxes[:, 0] + boxes[:, 2] / 2), H * (boxes[:, 1] + boxes[:, 3] / 2)], -1)
        ref = _roi_align_ref(np.transpose(feat, (2, 0, 1)), boxes_xyxy).mean((-1, -2)).T
        np.testing.assert_allclose(got, ref.T if ref.shape != got.shape else ref, atol=1e-4)

    def test_degenerate_and_edge_boxes(self):
        feat = jnp.ones((1, 15, 20, 4))
        boxes = jnp.asarray([[[0.5, 0.5, 1.0, 1.0],   # full image
                              [0.5, 0.5, 0.0, 0.0],   # zero-size
                              [0.0, 0.0, 0.1, 0.1]]])  # corner
        out = np.asarray(roi_align_mean_pooled(feat, boxes))
        assert np.isfinite(out).all()
        np.testing.assert_allclose(out[0, 0], 1.0, atol=1e-5)


class TestMatcher:
    def test_lsap_vs_scipy(self):
        from scipy.optimize import linear_sum_assignment
        rng = np.random.RandomState(0)
        for trial in range(20):
            m = rng.randint(1, 30)
            c = rng.randn(m, 100).astype(np.float32) * rng.uniform(0.1, 10)
            col = np.asarray(solve_lsap(jnp.asarray(c)))
            assert len(np.unique(col)) == m, "assignment must be a matching"
            ri, ci = linear_sum_assignment(c)
            ref_cost = c[ri, ci].sum()
            got_cost = c[np.arange(m), col].sum()
            np.testing.assert_allclose(got_cost, ref_cost, rtol=1e-5, atol=1e-4)

    def test_lsap_adversarial_cases(self):
        """Ties, identical rows/cols, extreme scales — cost must still be
        optimal and the assignment a matching."""
        from scipy.optimize import linear_sum_assignment
        cases = [
            np.zeros((5, 8), np.float32),                    # all ties
            np.ones((4, 100), np.float32) * 7.5,             # constant
            np.tile(np.arange(100, dtype=np.float32), (6, 1)),  # equal rows
            np.tile(np.arange(6, dtype=np.float32)[:, None], (1, 100)),
            np.asarray([[1e6, -1e6, 0.0] * 34 + [0.0, 0.0]] * 3,
                       np.float32),
        ]
        rng = np.random.RandomState(7)
        c = rng.randn(10, 50).astype(np.float32)
        c[:, :10] = c[:, 10:20]  # duplicated column blocks
        cases.append(c)
        for i, c in enumerate(cases):
            col = np.asarray(solve_lsap(jnp.asarray(c)))
            m = c.shape[0]
            assert len(np.unique(col)) == m, f"case {i}: not a matching"
            ri, ci = linear_sum_assignment(c)
            np.testing.assert_allclose(
                c[np.arange(m), col].sum(), c[ri, ci].sum(),
                rtol=1e-5, atol=1e-3, err_msg=f"case {i}")

    def test_hungarian_match_with_padding(self):
        from scipy.optimize import linear_sum_assignment
        rng = np.random.RandomState(1)
        B, Q, M = 3, 100, 16
        logits = rng.randn(B, Q, 2).astype(np.float32)
        pboxes = rng.uniform(0.2, 0.8, (B, Q, 4)).astype(np.float32) * 0.5
        tboxes = rng.uniform(0.2, 0.8, (B, M, 4)).astype(np.float32) * 0.5
        labels = np.zeros((B, M), np.int32)
        nvalid = [5, 1, 16]
        valid = np.zeros((B, M), bool)
        for b, n in enumerate(nvalid):
            valid[b, :n] = True

        q4t = np.asarray(hungarian_match(
            jnp.asarray(logits), jnp.asarray(pboxes), jnp.asarray(labels),
            jnp.asarray(tboxes), jnp.asarray(valid)))

        from gpv_tpu.ops import detr_cost_matrix
        for b, n in enumerate(nvalid):
            c = np.asarray(detr_cost_matrix(
                jnp.asarray(logits[b]), jnp.asarray(pboxes[b]),
                jnp.asarray(labels[b, :n]), jnp.asarray(tboxes[b, :n])))
            ri, ci = linear_sum_assignment(c)
            ref_cost = c[ri, ci].sum()
            got_cost = c[np.arange(n), q4t[b, :n]].sum()
            assert len(np.unique(q4t[b, :n])) == n
            np.testing.assert_allclose(got_cost, ref_cost, rtol=1e-4, atol=1e-3)
