"""Anchor-based RPN head (AnchorHeadSingle) — static-shape TPU formulation.

Parity targets:
  * anchor generation ``/root/reference/pcdet/models/dense_heads/
    target_assigner/anchor_generator.py`` (align_center=False grid).
  * point-occupancy anchor mask ``anchor_head_single.py:75-115`` — here a
    scatter + 2x2 forward-OR dilation + x10 upsample, fully on device
    (the reference round-trips through numpy argwhere).
  * axis-aligned target assignment ``target_assigner/
    axis_aligned_target_assigner.py`` with nearest-BEV AABB IoU
    (MATCH_HEIGHT=False path, ``box_utils.boxes3d_nearest_bev_iou``).
  * focal / smooth-L1 / direction losses ``anchor_head_template.py:178-294``.

Instead of dynamically gathering masked anchors (dynamic shapes), all anchors
are kept; masked-out anchors get label -1 (ignored), zero reg weight, and
-inf proposal scores.
"""

from __future__ import annotations

from typing import Any, Dict, Tuple

import numpy as np
import jax
import jax.numpy as jnp
from flax import linen as nn

from ...ops import boxes as box_ops


def generate_anchors(point_cloud_range, grid_size, stride, anchor_sizes,
                     anchor_rotations, anchor_bottom_heights,
                     align_center=False):
    """Dense anchor grid, flattened (y, x, size, rot) -> (N, 7) float32."""
    pcr = np.asarray(point_cloud_range, np.float64)
    nx, ny = grid_size[0] // stride, grid_size[1] // stride
    if align_center:
        x_stride = (pcr[3] - pcr[0]) / nx
        y_stride = (pcr[4] - pcr[1]) / ny
        x_off, y_off = x_stride / 2, y_stride / 2
    else:
        x_stride = (pcr[3] - pcr[0]) / (nx - 1)
        y_stride = (pcr[4] - pcr[1]) / (ny - 1)
        x_off = y_off = 0.0
    xs = pcr[0] + x_off + np.arange(nx) * x_stride
    ys = pcr[1] + y_off + np.arange(ny) * y_stride
    sizes = np.asarray(anchor_sizes, np.float64)            # (S, 3)
    rots = np.asarray(anchor_rotations, np.float64)         # (R,)
    heights = np.asarray(anchor_bottom_heights, np.float64)  # (Z,)

    # layout (z, y, x, size, rot, 7); z == len(heights) == 1 for KITTI
    gz, gy, gx = np.meshgrid(heights, ys, xs, indexing='ij')
    base = np.stack([gx, gy, gz], axis=-1)                  # (Z, Y, X, 3)
    a = np.broadcast_to(base[:, :, :, None, None, :],
                        base.shape[:3] + (len(sizes), len(rots), 3))
    s = np.broadcast_to(sizes[None, None, None, :, None, :], a.shape)
    r = np.broadcast_to(rots[None, None, None, None, :, None],
                        a.shape[:5] + (1,))
    anchors = np.concatenate([a, s, r], axis=-1)
    anchors = anchors.copy()
    anchors[..., 2] += anchors[..., 5] / 2                  # bottom -> center
    return anchors.reshape(-1, 7).astype(np.float32), (ny, nx)


def nearest_bev_iou(boxes_a, boxes_b):
    """AABB IoU of heading-snapped BEV boxes (box_utils.boxes3d_nearest_bev_iou)."""
    def to_aabb(b):
        rot = jnp.abs(box_ops.limit_period(b[:, 6], 0.5, jnp.pi))
        dxdy = jnp.where((rot < jnp.pi / 4)[:, None], b[:, [3, 4]],
                         b[:, [4, 3]])
        return jnp.concatenate([b[:, 0:2] - dxdy / 2, b[:, 0:2] + dxdy / 2],
                               axis=1)
    a, b = to_aabb(boxes_a), to_aabb(boxes_b)
    lt = jnp.maximum(a[:, None, 0:2], b[None, :, 0:2])
    rb = jnp.minimum(a[:, None, 2:4], b[None, :, 2:4])
    inter = jnp.clip(rb - lt, 0.0).prod(-1)
    area_a = (a[:, 2] - a[:, 0]) * (a[:, 3] - a[:, 1])
    area_b = (b[:, 2] - b[:, 0]) * (b[:, 3] - b[:, 1])
    return inter / jnp.clip(area_a[:, None] + area_b[None] - inter, 1e-6)


def compute_anchor_mask(points_xy, points_mask, point_cloud_range, bev_shape):
    """(H, W) anchor occupancy mask shared across the batch.

    Scatter points into a x10-coarse grid, OR-dilate one cell forward in each
    axis, upsample x10 (anchor_head_single.get_anchor_mask semantics: each
    occupied coarse cell activates the [-10, 10) fine neighborhood)."""
    h, w = bev_shape
    stride = (point_cloud_range[3] - point_cloud_range[0]) / w * 10.0
    ix = ((points_xy[:, 0] - point_cloud_range[0]) / stride).astype(jnp.int32)
    iy = ((points_xy[:, 1] - point_cloud_range[1]) / stride).astype(jnp.int32)
    ix = jnp.clip(ix, 0, w // 10 - 1)
    iy = jnp.clip(iy, 0, h // 10 - 1)
    large = jnp.zeros((h // 10, w // 10), jnp.bool_)
    large = large.at[iy, ix].max(points_mask)
    pad = jnp.pad(large, ((0, 1), (0, 1)))
    dil = pad[:-1, :-1] | pad[1:, :-1] | pad[:-1, 1:] | pad[1:, 1:]
    fine = jnp.repeat(jnp.repeat(dil, 10, axis=0), 10, axis=1)
    # h/w may not be multiples of 10; the reference's coarse grid simply
    # never activates the remainder cells, so pad with False
    return jnp.pad(fine, ((0, h - fine.shape[0]), (0, w - fine.shape[1])))


def assign_anchor_targets(anchors, gt_boxes, gt_valid, coder,
                          matched_threshold, unmatched_threshold):
    """Single-sample target assignment (assign_targets_single, static shapes).

    Args:
        anchors: (N, 7); gt_boxes: (M, 8) [box7, class]; gt_valid: (M,).
    Returns dict with labels (N,) int32 (-1 ignore / 0 bg / cls fg),
        reg_targets (N, code), reg_weights (N,), ious (N,).
    """
    n = anchors.shape[0]
    iou = nearest_bev_iou(anchors, gt_boxes[:, :7])
    iou = jnp.where(gt_valid[None, :], iou, -1.0)
    any_gt = gt_valid.any()

    a2g_max = iou.max(axis=1)
    a2g_arg = iou.argmax(axis=1)
    g2a_max = iou.max(axis=0)
    g2a_max = jnp.where(g2a_max == 0, -1.0, g2a_max)   # empty gt -> no force
    force = (iou == g2a_max[None, :]) & gt_valid[None, :] & (g2a_max[None, :] > 0)
    force_any = force.any(axis=1)

    gt_cls = gt_boxes[:, 7].astype(jnp.int32)
    labels = jnp.full((n,), -1, jnp.int32)
    labels = jnp.where(a2g_max < unmatched_threshold, 0, labels)
    pos = a2g_max >= matched_threshold
    labels = jnp.where(pos, gt_cls[a2g_arg], labels)
    labels = jnp.where(force_any, gt_cls[a2g_arg], labels)
    labels = jnp.where(any_gt, labels, 0)

    fg = labels > 0
    tgt = coder.encode(gt_boxes[a2g_arg, :7], anchors)
    reg_targets = jnp.where(fg[:, None], tgt, 0.0)
    reg_weights = fg.astype(jnp.float32)
    return {'labels': labels, 'reg_targets': reg_targets,
            'reg_weights': reg_weights, 'ious': jnp.maximum(a2g_max, 0.0)}


def sigmoid_focal_loss(logits, targets, weights, alpha=0.25, gamma=2.0):
    """Reference loss_utils.SigmoidFocalClassificationLoss (per-element)."""
    p = jax.nn.sigmoid(logits)
    alpha_w = targets * alpha + (1 - targets) * (1 - alpha)
    pt = targets * (1 - p) + (1 - targets) * p
    bce = jnp.clip(logits, 0) - logits * targets + \
        jnp.log1p(jnp.exp(-jnp.abs(logits)))
    loss = alpha_w * jnp.power(pt, gamma) * bce
    return loss * weights[..., None]


def weighted_smooth_l1(preds, targets, weights, beta=1.0 / 9.0,
                       code_weights=None):
    diff = preds - targets
    if code_weights is not None:
        diff = diff * jnp.asarray(code_weights, diff.dtype)
    n = jnp.abs(diff)
    loss = jnp.where(n < beta, 0.5 * n ** 2 / beta, n - 0.5 * beta)
    return loss * weights[..., None]


class AnchorHeadSingle(nn.Module):
    """1x1-conv RPN over BEV features with in-graph NMS proposals."""

    model_cfg: Any
    num_class: int
    grid_size: Tuple[int, int]              # (nx, ny) at voxel resolution
    point_cloud_range: Tuple[float, ...]

    def setup(self):
        from ...config import CfgNode
        mcfg = CfgNode(self.model_cfg)
        cfg = mcfg.ANCHOR_GENERATOR_CONFIG[0]
        anchors, bev_shape = generate_anchors(
            self.point_cloud_range, self.grid_size,
            cfg['feature_map_stride'], cfg['anchor_sizes'],
            cfg['anchor_rotations'], cfg['anchor_bottom_heights'],
            cfg.get('align_center', False))
        self.anchors = jnp.asarray(anchors)
        self.bev_shape = bev_shape
        self.num_anchors_per_loc = (len(cfg['anchor_sizes'])
                                    * len(cfg['anchor_rotations'])
                                    * len(cfg['anchor_bottom_heights']))
        self.matched_threshold = cfg['matched_threshold']
        self.unmatched_threshold = cfg['unmatched_threshold']
        self.coder = box_ops.ResidualCoder()
        self.num_dir_bins = mcfg.get('NUM_DIR_BINS', 2)
        self.dir_offset = mcfg.get('DIR_OFFSET', 0.78539)
        self.dir_limit_offset = mcfg.get('DIR_LIMIT_OFFSET', 0.0)
        na = self.num_anchors_per_loc
        pi = 0.01
        self.conv_cls = nn.Conv(
            na * self.num_class, (1, 1),
            bias_init=nn.initializers.constant(-np.log((1 - pi) / pi)))
        self.conv_box = nn.Conv(
            na * self.coder.code_size, (1, 1),
            kernel_init=nn.initializers.normal(0.001))
        self.conv_dir = nn.Conv(na * self.num_dir_bins, (1, 1))

    def __call__(self, bev_feats, points_xy, points_mask, nms_cfg,
                 gt_boxes=None, gt_valid=None, train: bool = False,
                 with_proposals: bool = True):
        """
        Args:
            bev_feats: (B, H, W, C) NHWC BEV features.
            points_xy: (P, 2) all points of the batch (anchor mask source).
            gt_boxes: (B, M, 8) padded, gt_valid: (B, M) — train only.
            with_proposals: skip the in-head NMS proposal generation when
                False (loss-only paths and parity tests).
        Returns dict with proposals (rois/roi_scores/roi_valid), decoded
            batch predictions, and (train) loss inputs.
        """
        b = bev_feats.shape[0]
        cls_preds = self.conv_cls(bev_feats).reshape(b, -1, self.num_class)
        box_preds = self.conv_box(bev_feats).reshape(b, -1,
                                                     self.coder.code_size)
        dir_preds = self.conv_dir(bev_feats).reshape(b, -1, self.num_dir_bins)

        amask = compute_anchor_mask(points_xy, points_mask,
                                    self.point_cloud_range, self.bev_shape)
        amask_flat = jnp.repeat(amask.reshape(-1), self.num_anchors_per_loc)

        out = {'cls_preds': cls_preds, 'box_preds': box_preds,
               'dir_preds': dir_preds, 'anchor_mask': amask_flat}

        # decode proposals
        anchors = self.anchors
        batch_boxes = self.coder.decode(box_preds, anchors[None])
        dir_labels = dir_preds.argmax(-1)
        period = 2 * jnp.pi / self.num_dir_bins
        dir_rot = box_ops.limit_period(batch_boxes[..., 6] - self.dir_offset,
                                       self.dir_limit_offset, period)
        heading = dir_rot + self.dir_offset + period * dir_labels
        batch_boxes = batch_boxes.at[..., 6].set(heading)
        out['batch_box_preds'] = batch_boxes
        out['batch_cls_preds'] = cls_preds

        if train and gt_boxes is not None:
            tgt = jax.vmap(
                lambda g, v: assign_anchor_targets(
                    anchors, g, v, self.coder, self.matched_threshold,
                    self.unmatched_threshold))(gt_boxes, gt_valid)
            # anchors outside the occupancy mask are ignored entirely
            tgt['labels'] = jnp.where(amask_flat[None, :], tgt['labels'], -1)
            tgt['reg_weights'] = tgt['reg_weights'] * amask_flat[None, :]
            out['targets'] = tgt

        if not with_proposals:
            return out

        # proposals via rotated NMS (scores of masked anchors -> invalid)
        scores = jax.nn.sigmoid(cls_preds.max(-1))
        roi_labels = cls_preds.argmax(-1) + 1

        def one(boxes_i, scores_i):
            sel, valid = box_ops.nms_bev(
                boxes_i, scores_i, nms_cfg['thresh'],
                pre_max=nms_cfg['pre'], post_max=nms_cfg['post'],
                valid=amask_flat)
            return sel, valid

        sel, valid = jax.vmap(one)(batch_boxes, scores)
        brange = jnp.arange(b)[:, None]
        out['rois'] = jnp.where(valid[..., None], batch_boxes[brange, sel],
                                0.0)
        out['roi_scores'] = jnp.where(valid, scores[brange, sel], 0.0)
        out['roi_labels'] = jnp.where(valid, roi_labels[brange, sel], 1)
        out['roi_valid'] = valid
        return out

    def loss(self, out, loss_weights, code_weights):
        """RPN loss (cls focal + loc smooth-L1 with sin-diff + dir CE)."""
        tgt = out['targets']
        labels = tgt['labels']                                # (B, N)
        b = labels.shape[0]
        cared = labels >= 0
        positives = labels > 0
        negatives = labels == 0
        cls_w = (negatives + positives).astype(jnp.float32)
        reg_w = positives.astype(jnp.float32)
        pos_norm = jnp.clip(positives.sum(1, keepdims=True), 1.0)
        cls_w = cls_w / pos_norm
        reg_w = reg_w / pos_norm

        cls_t = jnp.where(positives, 1, 0) if self.num_class == 1 else \
            labels * cared
        one_hot = jax.nn.one_hot(cls_t, self.num_class + 1)[..., 1:]
        cls_loss = sigmoid_focal_loss(out['cls_preds'], one_hot,
                                      cls_w).sum() / b
        cls_loss = cls_loss * loss_weights['cls_weight']

        # sin(a - b) encoding of the heading residual
        bp, rt = out['box_preds'], tgt['reg_targets']
        sin_p = jnp.sin(bp[..., 6:7]) * jnp.cos(rt[..., 6:7])
        sin_t = jnp.cos(bp[..., 6:7]) * jnp.sin(rt[..., 6:7])
        bp2 = jnp.concatenate([bp[..., :6], sin_p, bp[..., 7:]], -1)
        rt2 = jnp.concatenate([rt[..., :6], sin_t, rt[..., 7:]], -1)
        loc_loss = weighted_smooth_l1(bp2, rt2, reg_w,
                                      code_weights=code_weights).sum() / b
        loc_loss = loc_loss * loss_weights['loc_weight']

        # direction classification
        anchors = self.anchors[None]
        rot_gt = tgt['reg_targets'][..., 6] + anchors[..., 6]
        offset_rot = box_ops.limit_period(rot_gt - self.dir_offset, 0,
                                          2 * jnp.pi)
        dir_t = jnp.clip((offset_rot / (2 * jnp.pi / self.num_dir_bins))
                         .astype(jnp.int32), 0, self.num_dir_bins - 1)
        dir_oh = jax.nn.one_hot(dir_t, self.num_dir_bins)
        logp = jax.nn.log_softmax(out['dir_preds'], -1)
        dir_w = positives.astype(jnp.float32)
        dir_w = dir_w / jnp.clip(dir_w.sum(-1, keepdims=True), 1.0)
        dir_loss = -(dir_oh * logp).sum(-1) * dir_w
        dir_loss = dir_loss.sum() / b * loss_weights['dir_weight']

        total = cls_loss + loc_loss + dir_loss
        tb = {'rpn_loss_cls': cls_loss, 'rpn_loss_loc': loc_loss,
              'rpn_loss_dir': dir_loss}

        # optional ODIoU rotated-IoU loss on positive anchors (OD_LOSS flag,
        # off in shipped configs — anchor_head_template.py:296-318)
        from ...config import CfgNode
        if CfgNode(self.model_cfg).get('OD_LOSS', False):
            # reference normalization (anchor_head_template.py:296-318 +
            # odiou_loss.py:904-906): the loss module returns
            # 2*sum(od)/batch_size over positives, and the template scales
            # by a further 2/(n_pos + 1)
            from ...ops.odiou import odiou_3d
            decoded = self.coder.decode(out['box_preds'], anchors)
            gt_dec = self.coder.decode(tgt['reg_targets'], anchors)
            w = positives.astype(jnp.float32)
            od_sum = jax.vmap(lambda g, p, ww: (odiou_3d(g, p) * ww).sum())(
                gt_dec, decoded, w).sum()
            od = 2.0 * od_sum / b
            od = 2.0 * od / (positives.sum() + 1)
            total = total + od
            tb['rpn_loss_od'] = od
        return total, tb
