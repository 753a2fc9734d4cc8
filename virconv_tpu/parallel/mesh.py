"""Device mesh + sharded train/eval steps (the DDP replacement).

The reference's only parallelism is data parallelism over NCCL DDP
(``/root/reference/tools/train.py:141``, SURVEY.md §2.3). Here the same
strategy is expressed the TPU way: a 1-D ``dp`` mesh, batch entries sharded
over it, parameters replicated, and gradient/batch-stat reductions inserted
by GSPMD — one logical program, collectives ride ICI. Masked BatchNorm
statistics become globally-synced for free (the reference's ``--sync_bn``).

Multi-host DCN would be initialized via ``jax.distributed.initialize`` by the
launcher (``tools/train.py --launcher jax``).
"""

from __future__ import annotations

from typing import Any

import numpy as np
import jax
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P


def make_mesh(n_devices=None):
    devices = jax.devices()
    if n_devices is not None:
        devices = devices[:n_devices]
    return Mesh(np.asarray(devices), ('dp',))


def batch_sharding(mesh):
    """Shard every batch array on its leading (batch-entry) axis."""
    return NamedSharding(mesh, P('dp'))


def replicated(mesh):
    return NamedSharding(mesh, P())


def shard_batch(batch, mesh):
    """Place a host batch pytree with leading-axis sharding over dp.

    None leaves pass through; per-sample arrays (gt_boxes etc. with leading
    B) and per-entry arrays (points with leading B*R) both shard on axis 0.
    """
    sh = batch_sharding(mesh)

    def place(x):
        if x is None:
            return None
        arr = np.asarray(x)
        if arr.ndim == 0 or arr.shape[0] % mesh.size != 0:
            return jax.device_put(arr, replicated(mesh))
        return jax.device_put(arr, sh)
    return jax.tree_util.tree_map(place, batch, is_leaf=lambda x: x is None)
