"""Differentiable rotated-IoU (ODIoU) RPN loss.

Parity target ``/root/reference/pcdet/utils/odiou_loss.py:835-906``
(``odiou_3D``): per matched box pair

    odiou = 1 - IoU3D~ + |c_g - c_q|^2 / (mbr_diag_bev^2 + inter_h^2 + 1e-7)
            + 1.25 * (1 - |cos(r_q - r_g)|)

and the loss is ``2 * sum(odiou * weights) / batch_size``. The reference's
910 lines of hand-written torch autograd Functions (polygon clipping,
convex hull, rotating-calipers MBR) reduce to a few vectorized jax
expressions whose gradients come from autodiff.

Two reference quirks replicated exactly (verified by executing the
reference module in tests/test_trunk_parity.py):

  * **Reflected-heading BEV geometry**: ``odiou_3D`` swaps each box's
    (dx, dy) before building corners with a clockwise-rotation convention
    (``odiou_loss.py:849-853, 455-484``) — the net effect is that every
    box enters the BEV overlap and MBR with heading ``pi/2 - ry`` while
    centers stay put. For pairs with different centers this is NOT the
    true rotated IoU; we match the reference, not the ideal.
  * ``mbr_diag_3d^2 = mbr_diag_bev^2 + inter_h^2`` uses the *clamped
    intersection* height, not the union height (``:885-890``).

One knowing deviation: the reference's rotating calipers iterate only
consecutive hull vertices and DROP the closing edge
(``mbr_diag_convex_hull``, ``:608``: ``hull_points_2d[1:N] - [0:N-1]``),
so when the true min-area orientation aligns with that closing edge the
reference returns a slightly larger rectangle. We evaluate every pairwise
direction (a superset of all hull edges) and therefore find the true
minimum — parity is within ~1e-3 relative on the loss
(tests/test_trunk_parity.py::test_odiou_parity pins the delta).
"""

from __future__ import annotations

import numpy as np
import jax
import jax.numpy as jnp

from . import boxes as box_ops


def _reflect(boxes):
    """Heading ry -> pi/2 - ry (the reference's swapped-dims clockwise
    corner convention expressed as an equivalent standard box)."""
    return boxes.at[..., 6].set(jnp.pi / 2 - boxes[..., 6])


def _bev_corners(boxes):
    """(N, 4, 2) BEV corners of standard boxes."""
    c, s = jnp.cos(boxes[:, 6]), jnp.sin(boxes[:, 6])
    u = jnp.stack([c, s], -1) * boxes[:, 3:4] / 2          # (N, 2)
    v = jnp.stack([-s, c], -1) * boxes[:, 4:5] / 2
    ctr = boxes[:, 0:2]
    return jnp.stack([ctr + u + v, ctr + u - v, ctr - u + v, ctr - u - v], 1)


def _mbr_diag_sq(corners):
    """Squared diagonal of the minimum-area enclosing rectangle of
    (N, P, 2) points (reference ``mbr_diag_convex_hull``: rotating
    calipers over convex-hull edges). The min over all orientations is
    attained at a hull-edge angle, so evaluating every pairwise-difference
    angle (a superset of the hull edges) finds the same minimum — no hull
    needed. Returns diag**2 (sqrt of a possibly-zero spread has a NaN
    gradient, and the only consumer squares it anyway)."""
    d = corners[:, :, None, :] - corners[:, None, :, :]     # (N, P, P, 2)
    # i == j (and duplicate-corner) pairs give d == 0, where arctan2 has a
    # NaN gradient (0/0). Substitute a fixed direction for those pairs:
    # arctan2(0, 1) == 0 keeps the forward value identical and autodiff
    # sees no dependence on the masked inputs.
    nz = (jnp.abs(d[..., 0]) + jnp.abs(d[..., 1])) > 1e-9
    ang = jnp.arctan2(jnp.where(nz, d[..., 1], 0.0),
                      jnp.where(nz, d[..., 0], 1.0))
    ang = jnp.abs(jnp.fmod(ang, np.pi / 2))                 # ref: fmod + abs
    n, p = corners.shape[0], corners.shape[1]
    ang = ang.reshape(n, p * p)                             # (N, A)
    ca, sa = jnp.cos(ang), jnp.sin(ang)
    # rotate points into each candidate frame: ref R = [[cos, sin],
    # [-sin, cos]] (cos(a - pi/2) = sin, cos(a + pi/2) = -sin)
    x = ca[:, :, None] * corners[:, None, :, 0] \
        + sa[:, :, None] * corners[:, None, :, 1]           # (N, A, P)
    y = -sa[:, :, None] * corners[:, None, :, 0] \
        + ca[:, :, None] * corners[:, None, :, 1]
    wx = x.max(2) - x.min(2)
    wy = y.max(2) - y.min(2)
    areas = wx * wy                                         # (N, A)
    best = jnp.argmin(areas, axis=1)
    bw = jnp.take_along_axis(wx, best[:, None], 1)[:, 0]
    bh = jnp.take_along_axis(wy, best[:, None], 1)[:, 0]
    return bw ** 2 + bh ** 2


def odiou_3d(gboxes, qboxes):
    """Per-pair ODIoU (reference ``odiou_3D.forward`` before the weighted
    batch reduction). gboxes/qboxes: (N, 7) matched pairs."""
    ok = (gboxes[:, 3:6] > 0).all(-1) & (qboxes[:, 3:6] > 0).all(-1)
    g = jnp.clip(gboxes, -200.0, 200.0)
    q = jnp.clip(qboxes, -200.0, 200.0)

    angle_factor = 1.25 * (1.0 - jnp.abs(jnp.cos(q[:, 6] - g[:, 6])))

    gr, qr = _reflect(g), _reflect(q)
    inter_area = jax.vmap(
        lambda a, b: box_ops.boxes_overlap_bev(a[None], b[None])[0, 0]
    )(gr, qr)
    inter_h = jnp.clip(
        jnp.minimum(g[:, 2] + 0.5 * g[:, 5], q[:, 2] + 0.5 * q[:, 5])
        - jnp.maximum(g[:, 2] - 0.5 * g[:, 5], q[:, 2] - 0.5 * q[:, 5]), 0.0)
    vol_inc = inter_h * inter_area
    vol_union = (g[:, 3] * g[:, 4] * g[:, 5]
                 + q[:, 3] * q[:, 4] * q[:, 5] - vol_inc)
    # pairs masked out by `ok` can have vol_union == 0; a NaN there would
    # leak through the final where's backward pass (NaN * 0 == NaN)
    iou = vol_inc / jnp.where(ok, vol_union, 1.0)

    corners = jnp.concatenate([_bev_corners(gr), _bev_corners(qr)], 1)
    mbr_sq = _mbr_diag_sq(corners) + inter_h ** 2 + 1e-7
    center_sq = jnp.sum((g[:, 0:3] - q[:, 0:3]) ** 2, -1)

    od = 1.0 - iou + center_sq / mbr_sq + angle_factor
    return jnp.where(ok, od, 0.0)


def odiou_3d_weighted(gboxes, qboxes, weights, batch_size):
    """The reference module's full forward: 2 * sum(od * w) / batch_size."""
    od = odiou_3d(gboxes, qboxes)
    return 2.0 * (od * weights).sum() / batch_size


def odiou_3d_loss(pred_boxes, gt_boxes, weights=None):
    """Per-box ODIoU (gt first, matching the reference call order
    ``od_loss_func(gt_bbs[positives], batch_box_preds[positives], ...)``,
    anchor_head_template.py:296-318)."""
    od = odiou_3d(gt_boxes, pred_boxes)
    if weights is not None:
        od = od * weights
    return od
