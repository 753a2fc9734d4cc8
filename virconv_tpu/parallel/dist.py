"""Multi-process (multi-host) helpers: rank info, barrier, eval merge.

Parity target ``/root/reference/pcdet/utils/common_utils.py:114-195``:
``init_dist_pytorch`` becomes ``jax.distributed.initialize`` (done by the
CLI launcher), ``get_dist_info`` reads the JAX process topology, and
``merge_results_dist`` keeps the reference's shared-filesystem pickle
design — each process dumps its partial result list, a global barrier,
then rank 0 interleaves the parts (undoing the loader's pad+stride
sharding, ``datasets/__init__.py``) and truncates to the dataset size.
"""

from __future__ import annotations

import os
import pickle
import shutil
import time
from pathlib import Path


def init_distributed(coordinator=None, num_processes=None, process_id=None):
    """Initialize multi-host JAX (the ``--launcher jax`` path). No-op when
    env vars / args describe a single process."""
    import jax
    if num_processes is None:
        num_processes = int(os.environ.get('JAX_NUM_PROCESSES', '1'))
    if num_processes <= 1:
        return False
    jax.distributed.initialize(
        coordinator_address=coordinator
        or os.environ.get('JAX_COORDINATOR', '127.0.0.1:12345'),
        num_processes=num_processes,
        process_id=process_id
        if process_id is not None
        else int(os.environ.get('JAX_PROCESS_ID', '0')))
    return True


def get_dist_info():
    """(rank, world_size) of the host-process topology."""
    import jax
    return jax.process_index(), jax.process_count()


def barrier(name='barrier'):
    """Global cross-process sync; no-op single-process."""
    import jax
    if jax.process_count() > 1:
        from jax.experimental import multihost_utils
        multihost_utils.sync_global_devices(name)


def merge_results_dist(result_part, size, tmpdir, rank=None,
                       world_size=None, _barrier=None):
    """Merge per-process partial result lists (reference
    ``merge_results_dist``, common_utils.py:174-195).

    Each rank's ``result_part`` holds samples ``rank, rank+W, rank+2W, ...``
    of the padded index space (the loader's pad+stride sharding), so
    ``zip(*parts)`` interleaves them back into dataset order; the pad
    duplicates fall off the truncation to ``size``.

    Returns the ordered full list on rank 0, ``None`` elsewhere.
    ``rank``/``world_size``/``_barrier`` are injectable for tests.
    """
    if rank is None or world_size is None:
        rank, world_size = get_dist_info()
    sync = _barrier if _barrier is not None else barrier
    if world_size == 1:
        return list(result_part)

    tmpdir = Path(tmpdir)
    tmpdir.mkdir(parents=True, exist_ok=True)
    sync('merge_results_dist_start')
    part_file = tmpdir / f'result_part_{rank}.pkl'
    tmp_file = tmpdir / f'.result_part_{rank}.pkl.tmp'
    with open(tmp_file, 'wb') as f:
        pickle.dump(result_part, f)
    os.replace(tmp_file, part_file)   # atomic publish on shared FS
    sync('merge_results_dist_written')

    if rank != 0:
        return None

    part_list = []
    for i in range(world_size):
        pf = tmpdir / f'result_part_{i}.pkl'
        # barrier guarantees the write happened; allow for FS visibility lag
        for _ in range(100):
            if pf.exists():
                break
            time.sleep(0.1)
        else:
            raise RuntimeError(
                f'merge_results_dist: rank 0 cannot see part file {pf} '
                f'(written by rank {i}) after 10s — the barrier guarantees '
                f'the write happened, so this is shared-filesystem '
                f'visibility lag; extend the wait or check the tmpdir mount')
        with open(pf, 'rb') as f:
            part_list.append(pickle.load(f))

    ordered = []
    for group in zip(*part_list):
        ordered.extend(group)
    # ragged tails (when parts are unevenly sized) keep dataset order too
    longest = max(len(p) for p in part_list)
    for j in range(min(len(p) for p in part_list), longest):
        for p in part_list:
            if j < len(p):
                ordered.append(p[j])
    ordered = ordered[:size]
    shutil.rmtree(tmpdir, ignore_errors=True)
    return ordered
