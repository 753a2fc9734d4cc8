"""Shared evaluation loop (used by tools/test.py and train auto-eval).

Parity target ``/root/reference/tools/eval_utils/eval_utils.py``: run the
jitted eval forward over the loader, collect KITTI-format predictions
(host-side WBF), log recall stats and sec/example, run the official metric.
"""

from __future__ import annotations

import functools
import time
from pathlib import Path

import numpy as np


def eval_one_ckpt(cfg, ckpt_path, logger, output_dir, batch_size=1,
                  workers=4, save_to_file=False, max_batches=None,
                  dist_eval=False):
    """Evaluate one checkpoint. With ``dist_eval`` under a multi-process
    JAX launch, each process evaluates its pad+stride shard and the partial
    results merge via the file-based ``merge_results_dist`` analog
    (reference ``eval_utils.py:79-82``); rank 0 returns the metric."""
    import jax
    from ..datasets import build_dataloader
    from ..models.detectors.voxel_rcnn import VoxelRCNN
    from ..parallel.dist import get_dist_info, merge_results_dist
    from ..utils.metrics import compute_recall
    from ..utils.postprocess import post_process_batch
    from .trainer import load_checkpoint

    rank, world_size = get_dist_info() if dist_eval else (0, 1)
    dataset, loader, _ = build_dataloader(
        dataset_cfg=cfg.DATA_CONFIG, class_names=cfg.CLASS_NAMES,
        batch_size=batch_size, workers=workers, logger=logger,
        training=False, num_shards=world_size, shard_id=rank)

    model = VoxelRCNN(model_cfg=cfg.MODEL, dataset_cfg=cfg.DATA_CONFIG,
                      num_class=len(cfg.CLASS_NAMES))
    ckpt = load_checkpoint(ckpt_path)
    variables = {'params': ckpt['params'],
                 'batch_stats': ckpt['batch_stats']}
    forward = jax.jit(functools.partial(model.apply, train=False))

    det_annos = []
    recalls = {}
    t_total, n_frames = 0.0, 0
    result_dir = Path(output_dir) / 'final_result' / 'data'
    if save_to_file:
        result_dir.mkdir(parents=True, exist_ok=True)

    for bi, (batch, meta) in enumerate(loader):
        if max_batches is not None and bi >= max_batches:
            break
        t0 = time.perf_counter()
        out = forward(variables, batch)
        # force execution (tunneled TPU backends may not block otherwise)
        float(out['batch_box_preds'].sum())
        t_total += time.perf_counter() - t0
        n_frames += meta['batch_size']
        pred_dicts = post_process_batch(out, cfg.MODEL.POST_PROCESSING,
                                        len(cfg.CLASS_NAMES))
        # recall records vs gt (reference eval_utils recall stats)
        if meta.get('gt_boxes') is not None:
            for bix, pd in enumerate(pred_dicts):
                gtb = meta['gt_boxes'][bix][meta['gt_valid'][bix]]
                for key, (hit, tot) in compute_recall(
                        np.asarray(pd['pred_boxes']), gtb).items():
                    h, t = recalls.get(key, (0, 0))
                    recalls[key] = (h + hit, t + tot)
        det_annos += dataset.generate_prediction_dicts(
            meta, pred_dicts, cfg.CLASS_NAMES,
            output_path=result_dir if save_to_file else None)

    if n_frames:
        logger.info('sec_per_example: %.4f' % (t_total / n_frames))
    for key, (hit, tot) in sorted(recalls.items()):
        logger.info('%s: %.4f (%d/%d)' % (key, hit / max(tot, 1), hit, tot))
    if world_size > 1:
        # file-based partial-result merge (reference eval_utils.py:79-82)
        det_annos = merge_results_dist(
            det_annos, len(dataset),
            Path(output_dir) / 'tmp_result_merge')
        if rank != 0:
            return None
    if not det_annos:
        return {}
    result_str, result_dict = dataset.evaluation(det_annos, cfg.CLASS_NAMES)
    if result_str:
        logger.info(result_str)
    return result_dict
