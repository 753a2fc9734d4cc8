"""Observability: scalar logging, phase timers, jax profiler hooks.

The reference has no tracing/profiling beyond tqdm + tensorboardX scalars
(SURVEY.md §5). Here metrics are a first-class module: scalars go to a
JSONL event log (machine-readable) and, when available, to TensorBoard via
torch.utils.tensorboard; `phase` context-managers time host-side stages; and
`trace` wraps a block with the jax profiler for TPU timeline capture.
"""

from __future__ import annotations

import contextlib
import json
import time
from pathlib import Path
from typing import Optional


class MetricsLogger:
    def __init__(self, log_dir, use_tensorboard=True):
        self.log_dir = Path(log_dir)
        self.log_dir.mkdir(parents=True, exist_ok=True)
        self._jsonl = open(self.log_dir / 'events.jsonl', 'a')
        self._tb = None
        if use_tensorboard:
            try:
                from torch.utils.tensorboard import SummaryWriter
                self._tb = SummaryWriter(str(self.log_dir))
            except Exception:
                self._tb = None
        self._phase_totals = {}

    def scalar(self, tag: str, value: float, step: int):
        self._jsonl.write(json.dumps(
            {'tag': tag, 'value': float(value), 'step': int(step),
             'time': time.time()}) + '\n')
        self._jsonl.flush()
        if self._tb is not None:
            self._tb.add_scalar(tag, float(value), int(step))

    def scalars(self, prefix: str, values: dict, step: int):
        for k, v in values.items():
            try:
                self.scalar(f'{prefix}/{k}', float(v), step)
            except (TypeError, ValueError):
                pass

    @contextlib.contextmanager
    def phase(self, name: str):
        """Accumulating host-side phase timer."""
        t0 = time.perf_counter()
        try:
            yield
        finally:
            dt = time.perf_counter() - t0
            acc, cnt = self._phase_totals.get(name, (0.0, 0))
            self._phase_totals[name] = (acc + dt, cnt + 1)

    def phase_summary(self):
        return {name: {'total_s': acc, 'count': cnt,
                       'mean_ms': 1000 * acc / max(cnt, 1)}
                for name, (acc, cnt) in self._phase_totals.items()}

    @contextlib.contextmanager
    def trace(self, trace_dir: Optional[str] = None):
        """Wrap a block with the jax profiler (TPU timeline)."""
        import jax
        d = str(trace_dir or (self.log_dir / 'profile'))
        jax.profiler.start_trace(d)
        try:
            yield
        finally:
            jax.profiler.stop_trace()

    def close(self):
        if self._phase_totals:
            self._jsonl.write(json.dumps(
                {'phase_summary': self.phase_summary()}) + '\n')
        self._jsonl.close()
        if self._tb is not None:
            self._tb.close()


def compute_recall(pred_boxes, gt_boxes, thresh_list=(0.3, 0.5, 0.7)):
    """Per-sample recall record (detector3d_template.generate_recall_record
    analog), host-side numpy."""
    from ..ops import boxes_np
    out = {}
    if len(gt_boxes) == 0:
        return {f'recall_{t}': (0, 0) for t in thresh_list}
    if len(pred_boxes) == 0:
        return {f'recall_{t}': (0, len(gt_boxes)) for t in thresh_list}
    iou = boxes_np.boxes_iou3d(gt_boxes[:, :7], pred_boxes[:, :7])
    best = iou.max(axis=1)
    for t in thresh_list:
        out[f'recall_{t}'] = (int((best > t).sum()), len(gt_boxes))
    return out
