"""Parse a tensorboard event dir and localize training-loss spikes.

Usage: python tools/analyze_tb.py <tensorboard_dir> [threshold_multiple]

Reads every scalar series, finds steps where train/loss exceeds
``threshold_multiple`` x its trailing median, and prints the per-term
values at those steps ranked by how far above their own trailing medians
they are — pinpointing WHICH loss term carries each spike (the round-2
ROI-reg spike observability, finally pointed at data).
"""
import sys
from collections import defaultdict

import numpy as np


def load_scalars(logdir):
    """Prefer the MetricsLogger events.jsonl mirror (no tensorboard dep)."""
    import json
    import os
    jl = os.path.join(logdir, 'events.jsonl')
    if os.path.exists(jl):
        series = defaultdict(lambda: ([], []))
        with open(jl) as fh:
            for line in fh:
                e = json.loads(line)
                s, v = series[e['tag']]
                s.append(e['step'])
                v.append(e['value'])
        return {t: (np.array(s), np.array(v))
                for t, (s, v) in series.items()}
    from tensorboard.backend.event_processing.event_accumulator import \
        EventAccumulator
    acc = EventAccumulator(logdir, size_guidance={'scalars': 0})
    acc.Reload()
    out = {}
    for tag in acc.Tags()['scalars']:
        ev = acc.Scalars(tag)
        out[tag] = (np.array([e.step for e in ev]),
                    np.array([e.value for e in ev]))
    return out


def main():
    logdir = sys.argv[1]
    mult = float(sys.argv[2]) if len(sys.argv) > 2 else 3.0
    scalars = load_scalars(logdir)
    if 'train/loss' not in scalars:
        print('tags:', sorted(scalars))
        return
    steps, loss = scalars['train/loss']
    med = np.array([np.median(loss[max(0, i - 20):i + 1])
                    for i in range(len(loss))])
    spikes = np.where(loss > mult * np.maximum(med, 1e-6))[0]
    print(f'{len(spikes)} spikes / {len(loss)} steps '
          f'(>{mult}x trailing median)')
    by_step = {}
    for tag, (s, v) in scalars.items():
        by_step[tag] = dict(zip(s.tolist(), v.tolist()))
    for i in spikes[:40]:
        st = int(steps[i])
        rows = []
        for tag, sv in by_step.items():
            if st not in sv or tag in ('train/loss',
                                       'meta_data/learning_rate'):
                continue
            _, v = scalars[tag]
            tmed = np.median(v[max(0, i - 20):i + 1])
            ratio = sv[st] / max(tmed, 1e-6)
            rows.append((ratio, tag, sv[st], tmed))
        rows.sort(reverse=True)
        top = ', '.join(f'{t}={val:.2f} ({r:.0f}x med {m:.2f})'
                        for r, t, val, m in rows[:3])
        print(f'step {st}: loss={loss[i]:.2f} (med {med[i]:.2f}) <- {top}')


if __name__ == '__main__':
    main()
