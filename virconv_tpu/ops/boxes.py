"""Box geometry ops in JAX: rotated IoU, NMS, box coding, point-in-box.

TPU-native replacements for the reference CUDA kernels in
``/root/reference/pcdet/ops/iou3d_nms/src/iou3d_nms_kernel.cu`` (rotated BEV
overlap + bitmask NMS) and the numba.cuda eval IoU
(``.../kitti_object_eval_python/rotate_iou.py:17-232``). The rotated-rect
intersection is computed with fixed-size candidate-vertex buffers (corners
inside the other box + pairwise edge intersections), an angular sort around
the centroid, and the shoelace formula — all dense vector ops, no dynamic
shapes. Boxes are (x, y, z, dx, dy, dz, heading) in LiDAR frame.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

EPS = 1e-8


def limit_period(val, offset=0.5, period=jnp.pi):
    return val - jnp.floor(val / period + offset) * period


def rotate_points_along_z(points, angle):
    """Rotate (B, N, 3+C) points by (B,) angles around +z (x toward y)."""
    cosa, sina = jnp.cos(angle), jnp.sin(angle)
    zeros = jnp.zeros_like(angle)
    ones = jnp.ones_like(angle)
    rot = jnp.stack([cosa, sina, zeros,
                     -sina, cosa, zeros,
                     zeros, zeros, ones], axis=1).reshape(-1, 3, 3)
    # HIGHEST: feeds binary point-in-box tests; default TPU matmul
    # precision (bf16) shifts points by ~1e-3.
    xyz = jnp.einsum('bnc,bcd->bnd', points[..., 0:3], rot,
                     precision=jax.lax.Precision.HIGHEST)
    return jnp.concatenate([xyz, points[..., 3:]], axis=-1)


def boxes_to_corners_bev(boxes):
    """BEV corners (N, 4, 2) of (N, 7) boxes, counter-clockwise."""
    dx, dy = boxes[:, 3], boxes[:, 4]
    template = jnp.asarray([[0.5, 0.5], [-0.5, 0.5], [-0.5, -0.5],
                            [0.5, -0.5]], dtype=boxes.dtype)
    corners = template[None] * jnp.stack([dx, dy], -1)[:, None, :]
    angle = boxes[:, 6]
    cosa, sina = jnp.cos(angle), jnp.sin(angle)
    x = corners[..., 0] * cosa[:, None] - corners[..., 1] * sina[:, None]
    y = corners[..., 0] * sina[:, None] + corners[..., 1] * cosa[:, None]
    return jnp.stack([x, y], -1) + boxes[:, None, 0:2]


def boxes_to_corners_3d(boxes):
    """All 8 corners (N, 8, 3). Order matches the reference box_utils
    (``/root/reference/pcdet/utils/box_utils.py`` corner template)."""
    template = jnp.asarray([
        [1, 1, -1], [1, -1, -1], [-1, -1, -1], [-1, 1, -1],
        [1, 1, 1], [1, -1, 1], [-1, -1, 1], [-1, 1, 1],
    ], dtype=boxes.dtype) / 2.0
    corners = boxes[:, None, 3:6] * template[None]
    corners = rotate_points_along_z(corners, boxes[:, 6])
    return corners + boxes[:, None, 0:3]


def _point_in_rect(points, box):
    """points (..., 2) inside a single rotated rect (7,) in BEV."""
    d = points - box[0:2]
    cosa, sina = jnp.cos(box[6]), jnp.sin(box[6])
    lx = d[..., 0] * cosa + d[..., 1] * sina
    ly = -d[..., 0] * sina + d[..., 1] * cosa
    return (jnp.abs(lx) <= box[3] / 2 + EPS) & (jnp.abs(ly) <= box[4] / 2 + EPS)


def _seg_intersections(ca, cb):
    """Pairwise intersections of the 4 edges of two quads.

    Returns points (16, 2) and validity (16,).
    """
    a0 = ca                              # (4, 2)
    a1 = jnp.roll(ca, -1, axis=0)
    b0 = cb
    b1 = jnp.roll(cb, -1, axis=0)
    # broadcast (4, 4)
    da = (a1 - a0)[:, None, :]
    db = (b1 - b0)[None, :, :]
    d0 = b0[None, :, :] - a0[:, None, :]
    denom = da[..., 0] * db[..., 1] - da[..., 1] * db[..., 0]
    t = (d0[..., 0] * db[..., 1] - d0[..., 1] * db[..., 0]) / \
        jnp.where(jnp.abs(denom) < EPS, 1.0, denom)
    u = (d0[..., 0] * da[..., 1] - d0[..., 1] * da[..., 0]) / \
        jnp.where(jnp.abs(denom) < EPS, 1.0, denom)
    ok = (jnp.abs(denom) >= EPS) & (t >= 0) & (t <= 1) & (u >= 0) & (u <= 1)
    pts = a0[:, None, :] + t[..., None] * da
    return pts.reshape(16, 2), ok.reshape(16)


def _box_pair_pack(boxes):
    """Precompute per-box quantities reused across all pairs:
    corners (N, 4, 2) and [cx, cy, cos, sin, hx, hy] (N, 6)."""
    corners = boxes_to_corners_bev(boxes)
    pack = jnp.stack([boxes[:, 0], boxes[:, 1], jnp.cos(boxes[:, 6]),
                      jnp.sin(boxes[:, 6]), boxes[:, 3] / 2, boxes[:, 4] / 2],
                     axis=-1)
    return corners, pack


def _point_in_packed(points, pack):
    d = points - pack[0:2]
    lx = d[..., 0] * pack[2] + d[..., 1] * pack[3]
    ly = -d[..., 0] * pack[3] + d[..., 1] * pack[2]
    return (jnp.abs(lx) <= pack[4] + EPS) & (jnp.abs(ly) <= pack[5] + EPS)


def _rect_intersection_area_packed(ca, pa, cb, pb):
    """Overlap area of two rotated BEV rects from precomputed corners/trig
    (the CUDA kernel's candidate-vertex algorithm)."""
    in_b = _point_in_packed(ca, pb)            # (4,)
    in_a = _point_in_packed(cb, pa)            # (4,)
    xpts, xok = _seg_intersections(ca, cb)     # (16, 2), (16,)

    cand = jnp.concatenate([ca, cb, xpts], axis=0)        # (24, 2)
    valid = jnp.concatenate([in_b, in_a, xok], axis=0)    # (24,)
    cnt = valid.sum()

    wsum = jnp.where(valid[:, None], cand, 0.0).sum(0)
    center = wsum / jnp.maximum(cnt, 1).astype(cand.dtype)
    rel = cand - center
    ang = jnp.arctan2(rel[:, 1], rel[:, 0])
    ang = jnp.where(valid, ang, 1e9)
    order = jnp.argsort(ang)
    v = cand[order]                                        # sorted ring
    n = cnt.astype(jnp.int32)
    idx = jnp.arange(24, dtype=jnp.int32)
    nxt = jnp.where(idx + 1 < n, idx + 1, 0)
    cross = v[:, 0] * v[nxt, 1] - v[nxt, 0] * v[:, 1]
    area = 0.5 * jnp.abs(jnp.where(idx < n, cross, 0.0).sum())
    return jnp.where(cnt >= 3, area, 0.0)


def _rect_intersection_area(box_a, box_b):
    ca, pa = _box_pair_pack(box_a[None])
    cb, pb = _box_pair_pack(box_b[None])
    return _rect_intersection_area_packed(ca[0], pa[0], cb[0], pb[0])


def _rect_halfplanes(boxes):
    """Half-plane form of rotated rects: normals (N, 4, 2), offsets (N, 4)
    with inside = {x : n . x <= c}."""
    cosa, sina = jnp.cos(boxes[:, 6]), jnp.sin(boxes[:, 6])
    n1 = jnp.stack([cosa, sina], -1)
    n2 = jnp.stack([-sina, cosa], -1)
    normals = jnp.stack([n1, -n1, n2, -n2], axis=1)            # (N, 4, 2)
    center = boxes[:, 0:2]
    # elementwise 2-term dot (NOT einsum: on TPU einsum lowers to the MXU
    # at default bf16 precision, whose ~1e-3 rounding breaks the exact
    # parallel-plane tests in _clipped_edge_integrals)
    proj = (normals * center[:, None, :]).sum(-1)
    half = jnp.stack([boxes[:, 3] / 2, boxes[:, 3] / 2,
                      boxes[:, 4] / 2, boxes[:, 4] / 2], -1)
    return normals, proj + half


def _clipped_edge_integrals(corners, normals, offsets, coincide_tol=1e-4):
    """Green's-theorem contribution of one box's edges clipped to another
    box's half-planes (Liang-Barsky, no sort/scatter).

    corners: (..., 4, 2) CCW; normals (..., 4, 2); offsets (..., 4).
    Returns the summed cross-product integral (scalar per pair).

    Edges lying exactly ON a clip boundary are weighted 1/2: such an edge is
    traversed by both polygons' arc sets (same direction for identical
    boxes -> halves the double count; opposite directions for abutting
    boxes -> the halves cancel), making degenerate configurations exact.
    """
    u = corners                                 # (..., 4, 2)
    v = jnp.roll(corners, -1, axis=-2)
    d = v - u
    # constraints: n . (u + t d) <= c  for each of 4 planes. Elementwise
    # 2-term dots (not einsum): MXU bf16 rounding would defeat the exact
    # parallel / on-boundary detection below.
    npl = normals[..., None, :, :]                        # (..., 1, 4pl, 2)
    nu = (npl * u[..., :, None, :]).sum(-1)               # (..., 4edge, 4pl)
    nd = (npl * d[..., :, None, :]).sum(-1)
    c = offsets[..., None, :]                             # (..., 1, 4)
    # Parallel threshold: nd = n.(v-u) for a truly parallel edge is only
    # zero up to f32 rounding of the corner/trig products — ~1e-5 at KITTI
    # coordinate scale (|coords| ~ 80 m). 1e-4 absorbs that with margin; a
    # genuinely non-parallel edge has |nd| = L * sin(dtheta), so only
    # near-parallel pairs (dtheta < ~3e-4 rad) are reclassified, for which
    # the unconstrained-feasibility approximation is the right answer
    # anyway. (An earlier 1e-8 threshold made TPU clip intervals divide by
    # rounding noise, producing overlaps > area for arbitrary headings.)
    par_eps = 1e-4
    denom = jnp.where(jnp.abs(nd) < par_eps, par_eps, nd)
    t_hit = (c - nu) / denom
    # nd > 0: upper bound; nd < 0: lower bound; nd == 0: feasible iff nu <= c
    t_lo = jnp.where(nd < -par_eps, t_hit, 0.0).max(axis=-1)
    t_hi = jnp.where(nd > par_eps, t_hit, 1.0).min(axis=-1)
    parallel = jnp.abs(nd) <= par_eps
    infeasible = (parallel & (nu > c + coincide_tol)).any(axis=-1)
    on_boundary = (parallel & (jnp.abs(nu - c) <= coincide_tol)).any(axis=-1)
    t0 = jnp.clip(t_lo, 0.0, 1.0)
    t1 = jnp.clip(t_hi, 0.0, 1.0)
    ok = (~infeasible) & (t1 > t0)
    p0 = u + t0[..., None] * d
    p1 = u + t1[..., None] * d
    cross = p0[..., 0] * p1[..., 1] - p1[..., 0] * p0[..., 1]
    weight = jnp.where(on_boundary, 0.5, 1.0)
    return (jnp.where(ok, cross, 0.0) * weight).sum(axis=-1)


def boxes_overlap_bev(boxes_a, boxes_b, row_chunk: int | None = None):
    """Pairwise rotated BEV overlap areas, (N, M), via Green's theorem.

    area(A ^ B) = 1/2 |closed boundary integral|; the boundary tiles into
    A's edges clipped to B plus B's edges clipped to A (Liang-Barsky clips,
    no per-pair sort or scatter — pure elementwise work, ~1000x faster on
    TPU than the candidate-vertex algorithm). Edges coincident with a clip
    boundary are half-weighted so degenerate configurations (identical or
    abutting boxes) stay exact. ``row_chunk`` bounds transient memory for
    very large N*M.
    """
    ca = boxes_to_corners_bev(boxes_a)
    cb = boxes_to_corners_bev(boxes_b)
    na, oa = _rect_halfplanes(boxes_a)
    nb, ob = _rect_halfplanes(boxes_b)

    def block(ca_, na_, oa_):
        # pairwise (n_chunk, M)
        suma = _clipped_edge_integrals(ca_[:, None], nb[None], ob[None])
        sumb = _clipped_edge_integrals(cb[None], na_[:, None], oa_[:, None])
        return jnp.clip(0.5 * (suma + sumb), 0.0)

    n = boxes_a.shape[0]
    if row_chunk is None or n <= row_chunk:
        return block(ca, na, oa)
    pad = (-n) % row_chunk
    car = jnp.pad(ca, ((0, pad), (0, 0), (0, 0))).reshape(-1, row_chunk, 4, 2)
    nar = jnp.pad(na, ((0, pad), (0, 0), (0, 0))).reshape(-1, row_chunk, 4, 2)
    oar = jnp.pad(oa, ((0, pad), (0, 0))).reshape(-1, row_chunk, 4)
    out = jax.lax.map(lambda args: block(*args), (car, nar, oar))
    return out.reshape(-1, boxes_b.shape[0])[:n]


def boxes_iou_bev(boxes_a, boxes_b, row_chunk: int | None = None):
    """Pairwise rotated BEV IoU (N, M)."""
    inter = boxes_overlap_bev(boxes_a, boxes_b, row_chunk=row_chunk)
    area_a = (boxes_a[:, 3] * boxes_a[:, 4])[:, None]
    area_b = (boxes_b[:, 3] * boxes_b[:, 4])[None, :]
    return inter / jnp.clip(area_a + area_b - inter, EPS)


def boxes_iou3d(boxes_a, boxes_b):
    """Pairwise 3D IoU (N, M): BEV overlap x z-overlap / union.

    Matches ``boxes_iou3d_gpu`` (``/root/reference/pcdet/ops/iou3d_nms/
    iou3d_nms_utils.py:103``).
    """
    inter_bev = boxes_overlap_bev(boxes_a, boxes_b)
    za1 = boxes_a[:, 2] - boxes_a[:, 5] / 2
    za2 = boxes_a[:, 2] + boxes_a[:, 5] / 2
    zb1 = boxes_b[:, 2] - boxes_b[:, 5] / 2
    zb2 = boxes_b[:, 2] + boxes_b[:, 5] / 2
    zi = jnp.clip(jnp.minimum(za2[:, None], zb2[None]) -
                  jnp.maximum(za1[:, None], zb1[None]), 0.0)
    inter = inter_bev * zi
    vol_a = (boxes_a[:, 3] * boxes_a[:, 4] * boxes_a[:, 5])[:, None]
    vol_b = (boxes_b[:, 3] * boxes_b[:, 4] * boxes_b[:, 5])[None]
    return inter / jnp.clip(vol_a + vol_b - inter, EPS)


def nms_bev(boxes, scores, thresh: float, pre_max: int, post_max: int,
            valid=None, num_iters: int = 8):
    """Greedy rotated NMS via fixed-point suppression propagation.

    The exact greedy rule keep[i] = not exists j<i (by score) with keep[j]
    and IoU(i,j) > thresh is a sequential recurrence; on TPU we iterate the
    monotone fixed point ``keep <- f(keep)`` starting from all-kept. Each
    iteration resolves one level of suppression chains; detection workloads
    converge in a handful of rounds (validated against exact NMS in tests).

    Returns (selected_indices (post_max,) into the input order, valid_mask).
    """
    n = boxes.shape[0]
    if valid is None:
        valid = jnp.ones((n,), dtype=bool)
    neg = jnp.asarray(-jnp.inf, dtype=scores.dtype)
    masked_scores = jnp.where(valid, scores, neg)
    k = min(pre_max, n)
    top_scores, order = jax.lax.top_k(masked_scores, k)
    top_valid = jnp.isfinite(top_scores)
    b = boxes[order]
    iou = boxes_iou_bev(b, b, row_chunk=256 if k > 512 else None)
    over = (iou > thresh) & top_valid[:, None] & top_valid[None, :]
    # strictly-lower-triangular: j suppresses i only if score_j > score_i
    tri = jnp.tril(jnp.ones((k, k), dtype=bool), k=-1)
    sup = over & tri

    def body(_, keep):
        return ~jnp.any(sup & keep[None, :], axis=1) & top_valid

    keep = jax.lax.fori_loop(0, num_iters, body,
                             jnp.ones((k,), dtype=bool))
    # compact kept indices to the front, preserving score order
    rank = jnp.cumsum(keep.astype(jnp.int32)) - 1
    sel = jnp.full((post_max,), -1, dtype=jnp.int32)
    src = jnp.where(keep & (rank < post_max), rank, post_max)
    sel = jnp.zeros((post_max + 1,), jnp.int32).at[src].set(
        order.astype(jnp.int32))[:post_max]
    count = jnp.minimum(keep.sum(), post_max)
    sel_valid = jnp.arange(post_max) < count
    return jnp.where(sel_valid, sel, 0), sel_valid


class ResidualCoder:
    """Anchor-residual box coder (reference ``box_coder_utils.py:5-79``)."""

    def __init__(self, code_size=7, encode_angle_by_sincos=False, **kwargs):
        self.code_size = code_size + (1 if encode_angle_by_sincos else 0)
        self.encode_angle_by_sincos = encode_angle_by_sincos

    def encode(self, boxes, anchors):
        anchors = anchors.at[..., 3:6].set(jnp.clip(anchors[..., 3:6], 1e-5))
        boxes = boxes.at[..., 3:6].set(jnp.clip(boxes[..., 3:6], 1e-5))
        xa, ya, za, dxa, dya, dza, ra = jnp.split(anchors[..., :7], 7, -1)
        xg, yg, zg, dxg, dyg, dzg, rg = jnp.split(boxes[..., :7], 7, -1)
        diag = jnp.sqrt(dxa ** 2 + dya ** 2)
        xt = (xg - xa) / diag
        yt = (yg - ya) / diag
        zt = (zg - za) / dza
        dxt = jnp.log(dxg / dxa)
        dyt = jnp.log(dyg / dya)
        dzt = jnp.log(dzg / dza)
        if self.encode_angle_by_sincos:
            rts = [jnp.cos(rg) - jnp.cos(ra), jnp.sin(rg) - jnp.sin(ra)]
        else:
            rts = [rg - ra]
        cts = [boxes[..., 7 + i:8 + i] - anchors[..., 7 + i:8 + i]
               for i in range(boxes.shape[-1] - 7)]
        return jnp.concatenate([xt, yt, zt, dxt, dyt, dzt, *rts, *cts], -1)

    def decode(self, encodings, anchors):
        xa, ya, za, dxa, dya, dza, ra = jnp.split(anchors[..., :7], 7, -1)
        if self.encode_angle_by_sincos:
            xt, yt, zt, dxt, dyt, dzt, cost, sint = jnp.split(
                encodings[..., :8], 8, -1)
        else:
            xt, yt, zt, dxt, dyt, dzt, rt = jnp.split(encodings[..., :7], 7, -1)
        diag = jnp.sqrt(dxa ** 2 + dya ** 2)
        xg = xt * diag + xa
        yg = yt * diag + ya
        zg = zt * dza + za
        # clamp the log-dim residuals: a transiently wild reg output
        # (high-LR training) otherwise overflows exp -> inf boxes -> NaN
        # loss grads that poison the params (seen in the round-4 mini-KITTI
        # campaign at the OneCycle peak). Symmetric clip at +-10 (exp(10)
        # ~ 22k x anchor dim) — a no-op for any sane residual, incl. the
        # parity-test ranges. Deliberate divergence from the reference's
        # unclamped decode_torch (documented in PARITY.md).
        dxg = jnp.exp(jnp.clip(dxt, -10.0, 10.0)) * dxa
        dyg = jnp.exp(jnp.clip(dyt, -10.0, 10.0)) * dya
        dzg = jnp.exp(jnp.clip(dzt, -10.0, 10.0)) * dza
        if self.encode_angle_by_sincos:
            rg = jnp.arctan2(sint + jnp.sin(ra), cost + jnp.cos(ra))
        else:
            rg = rt + ra
        rest = encodings.shape[-1] - self.code_size
        cgs = [encodings[..., self.code_size + i:self.code_size + i + 1]
               + anchors[..., 7 + i:8 + i] for i in range(rest)]
        return jnp.concatenate([xg, yg, zg, dxg, dyg, dzg, rg, *cgs], -1)


def points_in_boxes(points, boxes):
    """(P,) int32 index of the first (N,7) box containing each point, -1 if
    none. Dense rotate + AABB test (TPU replacement for the roiaware_pool3d
    CUDA op, ``/root/reference/pcdet/ops/roiaware_pool3d/``)."""
    d = points[:, None, 0:3] - boxes[None, :, 0:3]          # (P, N, 3)
    cosa = jnp.cos(boxes[:, 6])[None]
    sina = jnp.sin(boxes[:, 6])[None]
    lx = d[..., 0] * cosa + d[..., 1] * sina
    ly = -d[..., 0] * sina + d[..., 1] * cosa
    inside = ((jnp.abs(lx) <= boxes[None, :, 3] / 2)
              & (jnp.abs(ly) <= boxes[None, :, 4] / 2)
              & (jnp.abs(d[..., 2]) <= boxes[None, :, 5] / 2))
    idx = jnp.argmax(inside, axis=1).astype(jnp.int32)
    return jnp.where(inside.any(axis=1), idx, -1)


def corner_loss(pred_boxes, gt_boxes):
    """Corner-distance loss with flipped-heading minimum (reference
    ``loss_utils.get_corner_loss_lidar:209``): per-box huber over the min of
    corner distances to gt and heading-flipped gt."""
    pred_c = boxes_to_corners_3d(pred_boxes)
    gt_c = boxes_to_corners_3d(gt_boxes)
    gt_flip = gt_boxes.at[:, 6].add(jnp.pi)
    gt_cf = boxes_to_corners_3d(gt_flip)
    d1 = jnp.linalg.norm(pred_c - gt_c, axis=-1)
    d2 = jnp.linalg.norm(pred_c - gt_cf, axis=-1)
    d = jnp.minimum(d1, d2)
    # huber, delta = 1
    abs_d = jnp.abs(d)
    loss = jnp.where(abs_d < 1.0, 0.5 * d ** 2, abs_d - 0.5)
    return loss.mean(axis=1)


def _axis_overlap_ratio(c1, w1, c2, w2):
    """1D overlap / total span of two centered intervals."""
    hi = jnp.minimum(c1 + w1 / 2, c2 + w2 / 2)
    lo = jnp.maximum(c1 - w1 / 2, c2 - w2 / 2)
    span_hi = jnp.maximum(c1 + w1 / 2, c2 + w2 / 2)
    span_lo = jnp.minimum(c1 - w1 / 2, c2 - w2 / 2)
    return jnp.clip(hi - lo, 0.0) / jnp.clip(span_hi - span_lo, EPS)


def bb_loss(pred_boxes, gt_boxes):
    """Differentiable box loss of the rcnn reg branch (reference
    ``pcdet/utils/bbloss.py:30-48``): product of per-axis 1D overlap ratios
    times an angle weight 1-|sin(dr)|, plus 1.25*(1-|cos(dr)|) and squared
    center distance, all scaled by 1.5. Returns per-box loss (N,)."""
    iou = (_axis_overlap_ratio(pred_boxes[:, 0], pred_boxes[:, 3],
                               gt_boxes[:, 0], gt_boxes[:, 3])
           * _axis_overlap_ratio(pred_boxes[:, 1], pred_boxes[:, 4],
                                 gt_boxes[:, 1], gt_boxes[:, 4])
           * _axis_overlap_ratio(pred_boxes[:, 2], pred_boxes[:, 5],
                                 gt_boxes[:, 2], gt_boxes[:, 5]))
    dr = pred_boxes[:, 6] - gt_boxes[:, 6]
    iou = iou * (1.0 - jnp.abs(jnp.sin(dr)))
    angle_factor = 1.25 * (1.0 - jnp.abs(jnp.cos(dr)))
    center_sq = jnp.sum((gt_boxes[:, 0:3] - pred_boxes[:, 0:3]) ** 2, axis=-1)
    return (1.0 - iou + angle_factor + center_sq) * 1.5
