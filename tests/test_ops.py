"""Unit tests for the core geometry/image/pe ops vs independent oracles."""

import numpy as np
import jax.numpy as jnp
import pytest

from birdsoundclassif_tpu.ops import (
    iou_matrix,
    encode_boxes,
    decode_boxes,
    clip_boxes,
    greedy_nms,
    batched_greedy_nms,
    generate_base_anchors,
    generate_anchor_shifts,
    full_anchor_grid,
    resize_bilinear_align_corners,
    adaptive_avg_pool,
    one_dim_positional_encoding,
    sine_position_embedding_2d,
)
from birdsoundclassif_tpu.ops.nms import select_post_nms
from birdsoundclassif_tpu.ops.anchors import inside_image_mask

import torch_oracles as oracle


def random_boxes(rng, n, w=1024, h=375):
    x1 = rng.uniform(0, w - 2, n)
    y1 = rng.uniform(0, h - 2, n)
    x2 = x1 + rng.uniform(1, 200, n)
    y2 = y1 + rng.uniform(1, 100, n)
    return np.stack([x1, y1, np.minimum(x2, w - 1), np.minimum(y2, h - 1)], axis=1).astype(
        np.float32
    )


class TestAnchors:
    def test_base_anchors_default_config(self):
        a = generate_base_anchors(16, (0.5, 1.0, 2.0), (1, 2, 4, 8, 16))
        assert a.shape == (15, 4)
        # scale-major ordering: first three rows are scale 1, ratios .5/1/2
        # ratio 1 at scale 1: wh = 16 -> [-8, -8, 8, 8] + 8 = [0, 0, 16, 16]
        np.testing.assert_array_equal(a[1], [0, 0, 16, 16])
        # ratio .5: w = sqrt(.5)*16 ~ 11.31, h = 16/sqrt(.5) ~ 22.63
        np.testing.assert_array_equal(a[0], [2, -3, 13, 19])
        # scale 16 ratio 2 (last row): w ~ 362, h ~ 181
        w = a[:, 2] - a[:, 0]
        assert w[14] > w[12]  # ratio 2 wider than ratio .5 at same scale

    def test_shift_ordering_y_major(self):
        s = generate_anchor_shifts(64, 24, 16)
        assert s.shape == (24 * 64, 1, 4)
        # k = y * width + x
        np.testing.assert_array_equal(s[0, 0], [0, 0, 0, 0])
        np.testing.assert_array_equal(s[1, 0], [16, 0, 16, 0])
        np.testing.assert_array_equal(s[64, 0], [0, 16, 0, 16])

    def test_full_grid_count(self):
        grid = full_anchor_grid(16, (0.5, 1.0, 2.0), (1, 2, 4, 8, 16), 64, 24, 16)
        assert grid.shape == (23040, 4)
        inside = inside_image_mask(grid, 1024, 375)
        assert 0 < inside.sum() < 23040


class TestBoxes:
    def test_iou_vs_oracle(self, rng):
        a = random_boxes(rng, 37)
        b = random_boxes(rng, 11)
        got = np.asarray(iou_matrix(jnp.asarray(a), jnp.asarray(b)))
        want = oracle.iou_matrix_oracle(a, b)
        np.testing.assert_allclose(got, want, rtol=1e-5)

    def test_encode_vs_oracle(self, rng):
        anchors = random_boxes(rng, 29)
        boxes = random_boxes(rng, 29)
        got = np.asarray(encode_boxes(jnp.asarray(anchors), jnp.asarray(boxes)))
        want = oracle.encode_oracle(anchors, boxes)
        # XLA f32 log vs numpy f32 log differ in the last ulps
        np.testing.assert_allclose(got, want, rtol=5e-4, atol=1e-5)

    def test_decode_vs_oracle(self, rng):
        anchors = random_boxes(rng, 31)
        deltas = rng.normal(0, 0.3, (31, 4)).astype(np.float32)
        got = np.asarray(decode_boxes(jnp.asarray(deltas), jnp.asarray(anchors)))
        want = oracle.decode_oracle(deltas, anchors)
        np.testing.assert_array_equal(got, want)

    def test_encode_decode_roundtrip(self, rng):
        # The reference's encode/decode pair is NOT a strict inverse: with the
        # +1 width convention, decode(encode(box)) = (x1, y1, x2+1, y2+1).
        # We reproduce that semantic exactly (it shapes every proposal).
        anchors = random_boxes(rng, 17)
        boxes = np.round(random_boxes(rng, 17))
        deltas = encode_boxes(jnp.asarray(anchors), jnp.asarray(boxes))
        rec = np.asarray(decode_boxes(deltas, jnp.asarray(anchors)))
        expected = boxes + np.array([0.0, 0.0, 1.0, 1.0])
        np.testing.assert_allclose(rec, expected, atol=0.51)

    def test_clip(self):
        b = jnp.asarray([[-5.0, -3.0, 2000.0, 400.0]])
        got = np.asarray(clip_boxes(b, 1024, 375))
        np.testing.assert_array_equal(got, [[0, 0, 1023, 374]])


class TestNMS:
    @pytest.mark.parametrize("n", [1, 7, 50, 300])
    def test_vs_oracle(self, rng, n):
        boxes = random_boxes(rng, n)
        scores = rng.uniform(0.01, 1.0, n).astype(np.float32)
        order, keep = greedy_nms(
            jnp.asarray(boxes), jnp.asarray(scores), jnp.ones(n, bool), 0.7
        )
        got = np.asarray(order)[np.asarray(keep)]
        want = oracle.greedy_nms_oracle(boxes, scores, 0.7)
        np.testing.assert_array_equal(got, want)

    def test_streaming_matches_matrix(self, rng):
        # force the streaming path with a large N and compare a prefix subset
        from birdsoundclassif_tpu.ops import nms as nms_mod

        n = 256
        boxes = random_boxes(rng, n)
        scores = rng.uniform(0.01, 1.0, n).astype(np.float32)
        valid = jnp.ones(n, bool)
        o1, k1 = greedy_nms(jnp.asarray(boxes), jnp.asarray(scores), valid, 0.5)
        old = nms_mod._MATRIX_NMS_MAX
        try:
            nms_mod._MATRIX_NMS_MAX = 0
            o2, k2 = greedy_nms(jnp.asarray(boxes), jnp.asarray(scores), valid, 0.5)
        finally:
            nms_mod._MATRIX_NMS_MAX = old
        np.testing.assert_array_equal(np.asarray(o1), np.asarray(o2))
        np.testing.assert_array_equal(np.asarray(k1), np.asarray(k2))

    def test_invalid_entries_never_kept_or_suppressing(self, rng):
        boxes = random_boxes(rng, 20)
        boxes[10:] = boxes[:10]  # duplicates that would suppress if valid
        scores = np.linspace(1.0, 0.1, 20).astype(np.float32)
        scores[10:] = 2.0  # invalid boxes have the best scores
        valid = np.ones(20, bool)
        valid[10:] = False
        order, keep = greedy_nms(jnp.asarray(boxes), jnp.asarray(scores), jnp.asarray(valid), 0.5)
        kept = set(np.asarray(order)[np.asarray(keep)].tolist())
        assert kept == set(range(10))

    def test_select_post_nms_batch_min_truncation(self, rng):
        # image 0: 3 well-separated boxes; image 1: 3 identical boxes -> 1 kept
        b0 = np.array([[0, 0, 10, 10], [100, 100, 120, 120], [500, 200, 540, 230]], np.float32)
        b1 = np.array([[0, 0, 10, 10]] * 3, np.float32)
        boxes = jnp.asarray(np.stack([b0, b1]))
        scores = jnp.asarray(np.array([[0.9, 0.8, 0.7], [0.9, 0.8, 0.7]], np.float32))
        valid = jnp.ones((2, 3), bool)
        order, keep = batched_greedy_nms(boxes, scores, valid, 0.7)
        sel_boxes, sel_scores, sel_idx, out_valid = select_post_nms(boxes, scores, order, keep, 3)
        # reference quirk: min over batch of kept counts -> only 1 valid slot
        np.testing.assert_array_equal(np.asarray(out_valid), [[True, False, False]] * 2)


class TestImageOps:
    @pytest.mark.parametrize("shape,out", [((2, 3, 12, 32), (24, 64)), ((1, 4, 17, 9), (5, 3)),
                                           ((1, 2, 8, 8), (16, 16))])
    def test_bilinear_align_corners(self, rng, shape, out):
        x = rng.normal(size=shape).astype(np.float32)
        want = oracle.bilinear_align_corners_oracle(x, *out)
        x_nhwc = jnp.asarray(np.moveaxis(x, 1, -1))
        got = np.moveaxis(np.asarray(resize_bilinear_align_corners(x_nhwc, *out)), -1, 1)
        np.testing.assert_allclose(got, want, rtol=1e-5, atol=1e-5)

    @pytest.mark.parametrize("shape,out", [((2, 3, 188, 512), (24, 64)), ((1, 4, 5, 7), (2, 2)),
                                           ((1, 2, 23, 64), (23, 64))])
    def test_adaptive_avg_pool(self, rng, shape, out):
        x = rng.normal(size=shape).astype(np.float32)
        want = oracle.adaptive_avg_pool_oracle(x, *out)
        x_nhwc = jnp.asarray(np.moveaxis(x, 1, -1))
        got = np.moveaxis(np.asarray(adaptive_avg_pool(x_nhwc, *out)), -1, 1)
        np.testing.assert_allclose(got, want, rtol=1e-5, atol=1e-5)


class TestPosEnc:
    @pytest.mark.parametrize("length,cn", [(375, 128), (1024, 128), (16, 6)])
    def test_one_dim(self, length, cn):
        got = np.asarray(one_dim_positional_encoding(length, cn))
        want = oracle.one_dim_pe_oracle(length, cn)
        # f32 pow/sin at positions up to 1024 differ in the last ulps between
        # numpy and torch; 5e-5 abs is far below any downstream effect.
        np.testing.assert_allclose(got, want, rtol=0, atol=5e-4)

    @pytest.mark.parametrize("h,w,c,only_y", [(12, 32, 64, True), (7, 9, 10, False)])
    def test_sine_2d(self, h, w, c, only_y):
        got = np.asarray(sine_position_embedding_2d(h, w, c, only_y=only_y))
        want = oracle.sine_pe_2d_oracle(h, w, c, only_y=only_y)
        np.testing.assert_allclose(got, want, rtol=1e-4, atol=1e-5)
