"""ROI proposal target sampling — static-shape port of the reference
``/root/reference/pcdet/models/roi_heads/target_assigner/
proposal_target_layer.py`` (fg/hard-bg/easy-bg subsampling, per-class IoU
thresholds, ``roi_iou_x`` soft labels, stochastic hard-example mining) and
the canonical-frame gt transform of ``roi_head_template.py:121-159``.

Dynamic ``nonzero()`` index lists become random-priority rankings: each ROI
gets a random key within its category (fg / hard-bg / easy-bg), an argsort
groups categories contiguously, and per-slot gathers compose the fixed-size
sample. Background sampling uses replacement like the reference's randint.
"""

from __future__ import annotations

from typing import Any, Dict

import jax
import jax.numpy as jnp

from ...ops import boxes as box_ops


def _canonical_gt(rois, gt_of_rois):
    """Express gt boxes in each roi's canonical frame + heading flip logic."""
    roi_center = rois[..., 0:3]
    roi_ry = rois[..., 6] % (2 * jnp.pi)
    gt = gt_of_rois.at[..., 0:3].add(-roi_center)
    gt = gt.at[..., 6].add(-roi_ry)
    b, n = gt.shape[0], gt.shape[1]
    gt = box_ops.rotate_points_along_z(
        gt.reshape(-1, 1, gt.shape[-1]), -roi_ry.reshape(-1)
    ).reshape(b, n, -1)
    heading = gt[..., 6] % (2 * jnp.pi)
    opposite = (heading > jnp.pi * 0.5) & (heading < jnp.pi * 1.5)
    heading = jnp.where(opposite, (heading + jnp.pi) % (2 * jnp.pi), heading)
    heading = jnp.where(heading > jnp.pi, heading - 2 * jnp.pi, heading)
    heading = jnp.clip(heading, -jnp.pi / 2, jnp.pi / 2)
    return gt.at[..., 6].set(heading)


def sample_rois_single(rng, rois, roi_scores, roi_labels, gt_boxes, gt_valid,
                       cfg):
    """One sample's ROI subsampling. rois (R, 7), gt (M, 8). Returns dict of
    (roi_per_image,) tensors."""
    roi_per_image = int(cfg.ROI_PER_IMAGE)
    fg_quota = int(round(cfg.FG_RATIO * roi_per_image))
    r = rois.shape[0]

    # class-matched max IoU (get_max_iou_with_same_class)
    iou = box_ops.boxes_iou3d(rois[:, :7], gt_boxes[:, :7])
    gt_cls = gt_boxes[:, 7].astype(jnp.int32)
    same_cls = roi_labels[:, None] == gt_cls[None, :]
    iou = jnp.where(same_cls & gt_valid[None, :], iou, -1.0)
    max_overlaps = jnp.maximum(iou.max(axis=1), 0.0)
    gt_assignment = iou.argmax(axis=1)

    # category masks (per roi) using per-class thresholds of the assigned gt
    assigned_cls = gt_cls[gt_assignment]
    n_cls = len(cfg.CLS_FG_THRESH)
    fg_thresh = jnp.asarray([min(cfg.REG_FG_THRESH[i], cfg.CLS_FG_THRESH[i])
                             for i in range(n_cls)], jnp.float32)
    reg_fg = jnp.asarray(list(cfg.REG_FG_THRESH), jnp.float32)
    cls_idx = jnp.clip(assigned_cls - 1, 0, n_cls - 1)
    is_fg = max_overlaps >= fg_thresh[cls_idx]
    is_easy_bg = max_overlaps < cfg.CLS_BG_THRESH_LO
    is_hard_bg = (~is_fg) & (~is_easy_bg) & \
        (max_overlaps < reg_fg[cls_idx])
    # rois that fall in none of the categories (between reg_fg and fg_thresh
    # can't happen since fg_thresh <= reg_fg; guard anyway)
    is_hard_bg = is_hard_bg | (~is_fg & ~is_easy_bg & ~is_hard_bg)

    k1, k2, k3, k4 = jax.random.split(rng, 4)
    n_fg = is_fg.sum()
    n_hard = is_hard_bg.sum()
    n_easy = is_easy_bg.sum()
    n_bg = n_hard + n_easy

    # random ordering within each category
    fg_order = jnp.argsort(jnp.where(is_fg, jax.random.uniform(k1, (r,)),
                                     jnp.inf))
    hard_order = jnp.argsort(jnp.where(is_hard_bg,
                                       jax.random.uniform(k2, (r,)), jnp.inf))
    easy_order = jnp.argsort(jnp.where(is_easy_bg,
                                       jax.random.uniform(k3, (r,)), jnp.inf))

    # if no bg at all: fill everything with fg (sampled with replacement —
    # fg_pos below already wraps slots >= n_fg via rand % n_fg, so fg_take
    # must NOT be re-clamped to n_fg in that case)
    fg_take = jnp.where(n_bg == 0, roi_per_image,
                        jnp.minimum(fg_quota, n_fg))
    bg_needed = roi_per_image - fg_take
    hard_num = jnp.where(
        (n_hard > 0) & (n_easy > 0),
        jnp.minimum((bg_needed.astype(jnp.float32)
                     * cfg.HARD_BG_RATIO).astype(jnp.int32), n_hard),
        jnp.where(n_hard > 0, bg_needed, 0))

    slots = jnp.arange(roi_per_image)
    rand_sel = jax.random.randint(k4, (roi_per_image,), 0, 2**30)
    # fg slots: without replacement up to n_fg, with replacement past it
    fg_pos = jnp.where(slots < n_fg, slots,
                       rand_sel % jnp.maximum(n_fg, 1))
    fg_idx = fg_order[fg_pos]
    t = slots - fg_take                     # bg slot rank
    hard_idx = hard_order[rand_sel % jnp.maximum(n_hard, 1)]
    easy_idx = easy_order[rand_sel % jnp.maximum(n_easy, 1)]
    bg_idx = jnp.where(t < hard_num, hard_idx, easy_idx)
    sampled = jnp.where(slots < fg_take, fg_idx, bg_idx)

    out_gt = gt_boxes[gt_assignment[sampled]]
    out_gt = jnp.where(gt_valid.any(), out_gt, jnp.zeros_like(out_gt))
    return {
        'rois': rois[sampled],
        'roi_labels': roi_labels[sampled],
        'roi_ious': max_overlaps[sampled],
        'roi_scores': roi_scores[sampled],
        'gt_of_rois': out_gt,
    }


def proposal_targets(rng, rois, roi_scores, roi_labels, gt_boxes, gt_valid,
                     cfg):
    """Batched ROI sampling + label/mask generation (the full
    ProposalTargetLayer.forward with CLS_SCORE_TYPE=roi_iou_x)."""
    b = rois.shape[0]
    keys = jax.random.split(rng, b + 1)
    sampled = jax.vmap(
        lambda k, r, s, l, g, v: sample_rois_single(k, r, s, l, g, v, cfg)
    )(keys[:b], rois, roi_scores, roi_labels, gt_boxes, gt_valid)

    ious = sampled['roi_ious']                       # (B, N)
    gt_of = sampled['gt_of_rois']
    gt_cls = gt_of[..., -1].astype(jnp.int32)
    n_cls = len(cfg.CLS_FG_THRESH)

    # reg_valid_mask with optional stochastic hard-example mining
    reg_valid = jnp.zeros_like(ious, dtype=jnp.int32)
    for ci in range(n_cls):
        cls_mask = gt_cls == (ci + 1)
        reg_fg = cfg.REG_FG_THRESH[ci]
        base = (ious > reg_fg) & cls_mask
        if cfg.get('ENABLE_HARD_SAMPLING', False):
            hard = (ious < reg_fg) & (ious > cfg.HARD_SAMPLING_THRESH[ci]) \
                & cls_mask
            teval = int(1 / cfg.HARD_SAMPLING_RATIO[ci])
            start = jax.random.randint(keys[b], (), 0, teval)
            stripe = (jnp.arange(ious.shape[0]) % teval) == start
            hard = hard & stripe[:, None]
            reg_valid = reg_valid + base.astype(jnp.int32) \
                + hard.astype(jnp.int32)
        else:
            reg_valid = reg_valid + base.astype(jnp.int32)

    # roi_iou_x soft classification labels
    cls_labels = jnp.zeros_like(ious)
    for ci in range(n_cls):
        cls_mask = gt_cls == (ci + 1)
        fg_t, bg_t = cfg.CLS_FG_THRESH[ci], cfg.CLS_BG_THRESH[ci]
        lab = (ious > fg_t).astype(jnp.float32)
        interval = (ious <= fg_t) & (ious >= bg_t)
        lab = jnp.where(interval, (ious - bg_t) / (fg_t - bg_t), lab)
        cls_labels = jnp.where(cls_mask, lab, cls_labels)

    gt_canonical = _canonical_gt(sampled['rois'], gt_of)
    return {
        'rois': sampled['rois'],
        'roi_labels': sampled['roi_labels'],
        'roi_scores': sampled['roi_scores'],
        'gt_iou_of_rois': ious,
        'gt_of_rois': gt_canonical,
        'gt_of_rois_src': gt_of,
        'reg_valid_mask': reg_valid,
        'rcnn_cls_labels': cls_labels,
    }
