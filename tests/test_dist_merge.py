"""File-based distributed eval merge (reference merge_results_dist,
common_utils.py:174-195): interleave pad+stride shards back into dataset
order, truncate padding, rank-0-only result."""

import numpy as np

from virconv_tpu.parallel.dist import merge_results_dist


def _noop_barrier(name='x'):
    return None


def test_merge_results_dist_restores_order(tmp_path):
    size, world = 10, 4
    # the loader pads to a multiple of world and strides:
    # shard r holds padded indices r, r+4, r+8
    idx = np.arange(size)
    padded = np.concatenate([idx, idx[:(-size) % world]])
    parts = [list(padded[r::world]) for r in range(world)]

    # non-zero ranks write first (the barrier provides this ordering in a
    # real launch), rank 0 merges last
    outs = {}
    for r in list(range(1, world)) + [0]:
        outs[r] = merge_results_dist(
            parts[r], size, tmp_path / 'merge', rank=r, world_size=world,
            _barrier=_noop_barrier)
    for r in range(1, world):
        assert outs[r] is None
    assert outs[0] == list(range(size))
    assert not (tmp_path / 'merge').exists()   # cleaned up


def test_merge_results_dist_single_process_passthrough(tmp_path):
    part = [{'frame': i} for i in range(3)]
    out = merge_results_dist(part, 3, tmp_path / 'merge', rank=0,
                             world_size=1, _barrier=_noop_barrier)
    assert out == part


def test_merge_results_dist_ragged_parts(tmp_path):
    # uneven shard sizes (e.g. an early-stopped eval): order still by
    # round-robin position, truncated to size
    parts = [[0, 3, 6], [1, 4], [2, 5]]
    outs = {}
    for r in (1, 2, 0):
        outs[r] = merge_results_dist(
            parts[r], 7, tmp_path / 'm2', rank=r, world_size=3,
            _barrier=_noop_barrier)
    assert outs[0] == [0, 1, 2, 3, 4, 5, 6]
