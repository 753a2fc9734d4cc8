"""Box geometry tests: rotated IoU vs rasterization oracle, NMS fixed point
vs exact greedy, box coder round-trip, points-in-boxes."""
import jax
jax.config.update('jax_default_matmul_precision', 'highest')
import numpy as np
import jax.numpy as jnp
import pytest

from virconv_tpu.ops import boxes as jb
from virconv_tpu.ops import boxes_np as nb


def raster_overlap(box_a, box_b, res=0.02):
    """Rasterization oracle for BEV overlap area of two rotated rects."""
    lo = np.minimum(box_a[0:2] - np.abs(box_a[3:5]).sum(),
                    box_b[0:2] - np.abs(box_b[3:5]).sum())
    hi = np.maximum(box_a[0:2] + np.abs(box_a[3:5]).sum(),
                    box_b[0:2] + np.abs(box_b[3:5]).sum())
    xs = np.arange(lo[0], hi[0], res) + res / 2
    ys = np.arange(lo[1], hi[1], res) + res / 2
    gx, gy = np.meshgrid(xs, ys, indexing='ij')
    pts = np.stack([gx.ravel(), gy.ravel()], -1)
    in_a = nb._points_in_rects(pts, box_a[None])[:, 0]
    in_b = nb._points_in_rects(pts, box_b[None])[:, 0]
    return (in_a & in_b).sum() * res * res


def random_boxes(rng, n, span=10.0):
    boxes = np.zeros((n, 7))
    boxes[:, 0:2] = rng.uniform(-span / 2, span / 2, (n, 2))
    boxes[:, 2] = rng.uniform(-1, 1, n)
    boxes[:, 3:5] = rng.uniform(1.0, 4.5, (n, 2))
    boxes[:, 5] = rng.uniform(1.0, 2.5, n)
    boxes[:, 6] = rng.uniform(-np.pi, np.pi, n)
    return boxes


class TestRotatedIoU:
    def test_identical_boxes(self):
        b = np.array([[1.0, 2.0, 0.0, 4.0, 2.0, 1.5, 0.7]])
        iou = np.asarray(jb.boxes_iou_bev(jnp.asarray(b), jnp.asarray(b)))
        np.testing.assert_allclose(iou, [[1.0]], atol=1e-5)
        iou3d = np.asarray(jb.boxes_iou3d(jnp.asarray(b), jnp.asarray(b)))
        np.testing.assert_allclose(iou3d, [[1.0]], atol=1e-5)

    def test_disjoint(self):
        a = np.array([[0.0, 0, 0, 2, 2, 2, 0.3]])
        b = np.array([[10.0, 0, 0, 2, 2, 2, -0.3]])
        assert float(jb.boxes_iou_bev(jnp.asarray(a), jnp.asarray(b))[0, 0]) == 0.0

    def test_axis_aligned_known_overlap(self):
        a = np.array([[0.0, 0, 0, 4, 2, 2, 0.0]])
        b = np.array([[1.0, 0.5, 0, 4, 2, 2, 0.0]])
        # overlap = 3 x 1.5 = 4.5; union = 8 + 8 - 4.5
        got = float(jb.boxes_overlap_bev(jnp.asarray(a), jnp.asarray(b))[0, 0])
        np.testing.assert_allclose(got, 4.5, atol=1e-5)

    def test_vs_raster_oracle_random(self):
        rng = np.random.default_rng(7)
        boxes_a = random_boxes(rng, 6)
        boxes_b = random_boxes(rng, 6)
        got = np.asarray(jb.boxes_overlap_bev(jnp.asarray(boxes_a),
                                              jnp.asarray(boxes_b)))
        got_np = nb.boxes_overlap_bev(boxes_a, boxes_b)
        np.testing.assert_allclose(got, got_np, atol=1e-3)
        for i in range(6):
            for j in range(6):
                want = raster_overlap(boxes_a[i], boxes_b[j])
                assert abs(got[i, j] - want) < 0.15, (i, j, got[i, j], want)

    def test_jax_matches_numpy_exactly(self):
        rng = np.random.default_rng(8)
        a, b = random_boxes(rng, 20), random_boxes(rng, 15)
        ja = np.asarray(jb.boxes_iou3d(jnp.asarray(a), jnp.asarray(b)))
        na = nb.boxes_iou3d(a, b)
        np.testing.assert_allclose(ja, na, atol=1e-4)


class TestNMS:
    @pytest.mark.parametrize('seed', [0, 1, 2])
    def test_fixed_point_matches_exact_greedy(self, seed):
        rng = np.random.default_rng(seed)
        boxes = random_boxes(rng, 120, span=30.0)
        scores = rng.uniform(0, 1, 120).astype(np.float32)
        sel, valid = jb.nms_bev(jnp.asarray(boxes, jnp.float32),
                                jnp.asarray(scores), 0.5,
                                pre_max=120, post_max=60)
        got = np.asarray(sel)[np.asarray(valid)]
        want = nb.nms_bev(boxes, scores, 0.5, post_max=60)
        np.testing.assert_array_equal(np.sort(got), np.sort(want))

    def test_respects_validity_and_post_max(self):
        rng = np.random.default_rng(3)
        boxes = random_boxes(rng, 50, span=100.0)  # mostly disjoint
        scores = rng.uniform(0, 1, 50).astype(np.float32)
        valid = np.arange(50) < 30
        sel, selv = jb.nms_bev(jnp.asarray(boxes, jnp.float32),
                               jnp.asarray(scores), 0.5, pre_max=50,
                               post_max=10, valid=jnp.asarray(valid))
        sel = np.asarray(sel)[np.asarray(selv)]
        assert len(sel) <= 10
        assert all(s < 30 for s in sel)


class TestBoxCoder:
    def test_round_trip(self):
        rng = np.random.default_rng(11)
        coder = jb.ResidualCoder()
        boxes = jnp.asarray(random_boxes(rng, 32), jnp.float32)
        anchors = jnp.asarray(random_boxes(rng, 32), jnp.float32)
        enc = coder.encode(boxes, anchors)
        dec = coder.decode(enc, anchors)
        np.testing.assert_allclose(np.asarray(dec), np.asarray(boxes),
                                   rtol=1e-3, atol=1e-3)

    def test_sincos_round_trip(self):
        rng = np.random.default_rng(12)
        coder = jb.ResidualCoder(encode_angle_by_sincos=True)
        boxes = jnp.asarray(random_boxes(rng, 8), jnp.float32)
        anchors = jnp.asarray(random_boxes(rng, 8), jnp.float32)
        dec = np.asarray(coder.decode(coder.encode(boxes, anchors), anchors))
        b = np.asarray(boxes)
        np.testing.assert_allclose(dec[:, :6], b[:, :6], rtol=1e-3, atol=1e-3)
        np.testing.assert_allclose(np.sin(dec[:, 6]), np.sin(b[:, 6]),
                                   atol=1e-3)


class TestPointsInBoxes:
    def test_rotated_membership(self):
        box = np.array([[0, 0, 0, 4, 2, 2, np.pi / 4]])
        pts = np.array([
            [1.2, 1.2, 0.0],   # along rotated x-axis -> inside
            [1.2, -1.2, 0.0],  # along rotated y-axis -> outside (dy/2=1)
            [0.0, 0.0, 0.9],   # inside z
            [0.0, 0.0, 1.1],   # outside z
        ])
        got = np.asarray(jb.points_in_boxes(jnp.asarray(pts),
                                            jnp.asarray(box)))
        np.testing.assert_array_equal(got, [0, -1, 0, -1])
        np.testing.assert_array_equal(nb.points_in_boxes(pts, box), got)


class TestLosses:
    def test_corner_loss_zero_for_equal(self):
        rng = np.random.default_rng(13)
        boxes = jnp.asarray(random_boxes(rng, 5), jnp.float32)
        loss = np.asarray(jb.corner_loss(boxes, boxes))
        np.testing.assert_allclose(loss, 0.0, atol=1e-5)

    def test_corner_loss_flip_invariant(self):
        rng = np.random.default_rng(14)
        boxes = np.asarray(random_boxes(rng, 5), np.float32)
        flipped = boxes.copy()
        flipped[:, 6] += np.pi
        loss = np.asarray(jb.corner_loss(jnp.asarray(boxes),
                                         jnp.asarray(flipped)))
        np.testing.assert_allclose(loss, 0.0, atol=1e-4)

    def test_bb_loss_minimal_for_equal(self):
        rng = np.random.default_rng(15)
        boxes = jnp.asarray(random_boxes(rng, 5), jnp.float32)
        l_eq = np.asarray(jb.bb_loss(boxes, boxes))
        np.testing.assert_allclose(l_eq, 0.0, atol=1e-4)
        shifted = boxes.at[:, 0].add(0.5)
        assert (np.asarray(jb.bb_loss(shifted, boxes)) > l_eq + 1e-3).all()


class TestODIoU:
    def test_differentiable_and_decreasing(self):
        import jax
        from virconv_tpu.ops.odiou import odiou_3d_loss
        gt = jnp.asarray([[5.0, 2.0, -1.0, 4.0, 1.6, 1.5, 0.3]])
        pred = jnp.asarray([[5.6, 2.3, -1.0, 4.0, 1.6, 1.5, 0.5]])

        def loss_fn(p):
            return odiou_3d_loss(p, gt).sum()

        g = jax.grad(loss_fn)(pred)
        assert np.isfinite(np.asarray(g)).all()
        assert np.abs(np.asarray(g)).sum() > 0
        # one gradient step toward the gt reduces the loss
        stepped = pred - 0.1 * g
        assert float(loss_fn(stepped)) < float(loss_fn(pred))


class TestGreenOverlapDegenerate:
    """The Green's-theorem overlap must handle degenerate configurations."""

    def test_identical_boxes_full_area(self):
        rng = np.random.default_rng(21)
        b = jnp.asarray(random_boxes(rng, 5), jnp.float32)
        ov = np.asarray(jb.boxes_overlap_bev(b, b))
        areas = np.asarray(b[:, 3] * b[:, 4])
        np.testing.assert_allclose(np.diag(ov), areas, rtol=1e-3)

    def test_abutting_boxes_zero_overlap(self):
        a = jnp.asarray([[0, 0, 0, 4, 2, 2, 0.0]], jnp.float32)
        b = jnp.asarray([[4, 0, 0, 4, 2, 2, 0.0]], jnp.float32)
        assert float(jb.boxes_overlap_bev(a, b)[0, 0]) < 1e-3

    def test_contained_box(self):
        a = jnp.asarray([[0, 0, 0, 10, 10, 2, 0.3]], jnp.float32)
        b = jnp.asarray([[0.5, 0.2, 0, 2, 1, 2, 1.0]], jnp.float32)
        np.testing.assert_allclose(
            float(jb.boxes_overlap_bev(a, b)[0, 0]), 2.0, rtol=1e-4)

    def test_chunked_matches_full(self):
        rng = np.random.default_rng(22)
        a = jnp.asarray(random_boxes(rng, 300), jnp.float32)
        b = jnp.asarray(random_boxes(rng, 40), jnp.float32)
        full = np.asarray(jb.boxes_overlap_bev(a, b))
        chunked = np.asarray(jb.boxes_overlap_bev(a, b, row_chunk=128))
        # chunked (lax.map) and full lowerings fuse elementwise chains in a
        # different order -> a few x 1e-5 f32 noise on small overlaps
        np.testing.assert_allclose(full, chunked, atol=3e-4)


def test_green_matches_candidate_vertex():
    """Cross-validate the Green's-theorem overlap against the
    candidate-vertex reference implementation."""
    rng = np.random.default_rng(33)
    a = jnp.asarray(random_boxes(rng, 12), jnp.float32)
    b = jnp.asarray(random_boxes(rng, 9), jnp.float32)
    green = np.asarray(jb.boxes_overlap_bev(a, b))
    ca, pa = jb._box_pair_pack(a)
    cb, pb = jb._box_pair_pack(b)
    f = jax.vmap(jax.vmap(jb._rect_intersection_area_packed,
                          (None, None, 0, 0)), (0, 0, None, None))
    cand = np.asarray(f(ca, pa, cb, pb))
    np.testing.assert_allclose(green, cand, atol=1e-3)


def test_overlap_lowering_has_no_dot():
    """boxes_overlap_bev must stay elementwise: on TPU any dot/einsum in
    the clip tests lowers to the MXU at default bf16 precision, whose
    rounding breaks the exact parallel/on-boundary detection (identical
    boxes then score IoU 1/3 instead of 1 and NMS stops suppressing
    duplicates)."""
    b = jnp.zeros((4, 7), jnp.float32)
    hlo = jax.jit(jb.boxes_overlap_bev).lower(b, b).as_text()
    assert ' dot(' not in hlo and 'dot_general' not in hlo
