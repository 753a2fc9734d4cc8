"""Differentiable rotated-IoU (ODIoU) RPN loss.

Parity target ``/root/reference/pcdet/utils/odiou_loss.py`` (910 lines of
hand-written torch autograd Functions for polygon clipping). In JAX the
vertex-collection rotated-IoU of ``ops.boxes`` is already differentiable
almost everywhere (gathers route gradients through the selected vertices),
so ODIoU reduces to a few lines: loss = 1 - IoU3D(pred, gt), averaged over
positives. Available to the RPN via the ``OD_LOSS`` config flag.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from . import boxes as box_ops


def odiou_3d_loss(pred_boxes, gt_boxes, weights=None):
    """Per-box 1 - IoU3D, differentiable w.r.t. pred_boxes.

    Args:
        pred_boxes: (N, 7); gt_boxes: (N, 7) matched pairs.
        weights: optional (N,).
    """
    iou = jax.vmap(
        lambda p, g: box_ops.boxes_iou3d(p[None], g[None])[0, 0]
    )(pred_boxes, gt_boxes)
    loss = 1.0 - iou
    if weights is not None:
        loss = loss * weights
    return loss
