"""Dataset registry + loader.

Parity target ``/root/reference/pcdet/datasets/__init__.py:23-80``: string
registry, train sampler (shuffled) and padded/strided eval sharding for
multi-host, background-prefetched batches. torch's DataLoader is replaced by
a light thread-prefetch loader (the heavy work — voxelization/VFE — moved on
device, so host collation is cheap).
"""

from __future__ import annotations

import queue
import threading

import numpy as np

from .dataset import DatasetTemplate
from .kitti.kitti_dataset import KittiDataset
from .kitti.kitti_dataset_mm import KittiDatasetMM
from .kitti.kitti_dataset_semi import KittiDatasetSemi

__all__ = {
    'DatasetTemplate': DatasetTemplate,
    'KittiDataset': KittiDataset,
    'KittiDatasetMM': KittiDatasetMM,
    'KittiDatasetSemi': KittiDatasetSemi,
}


class DataLoader:
    """Minimal epoch loader with shuffling, host sharding and prefetching."""

    def __init__(self, dataset, batch_size, shuffle=False, seed=None,
                 num_shards=1, shard_id=0, prefetch=2, drop_last=False):
        self.dataset = dataset
        self.batch_size = batch_size
        self.shuffle = shuffle
        self.seed = seed if seed is not None else 0
        self.num_shards = num_shards
        self.shard_id = shard_id
        self.prefetch = prefetch
        self.drop_last = drop_last
        self.epoch = 0

    def set_epoch(self, epoch):
        self.epoch = epoch

    def _indices(self):
        n = len(self.dataset)
        idx = np.arange(n)
        if self.shuffle:
            rng = np.random.default_rng(self.seed + self.epoch)
            rng.shuffle(idx)
        if self.num_shards > 1:
            # pad + stride sharding (reference eval DistributedSampler)
            pad = (-len(idx)) % self.num_shards
            idx = np.concatenate([idx, idx[:pad]])
            idx = idx[self.shard_id::self.num_shards]
        return idx

    def __len__(self):
        n = len(self._indices())
        if self.drop_last:
            return n // self.batch_size
        return -(-n // self.batch_size)

    def __iter__(self):
        idx = self._indices()
        batches = [idx[i:i + self.batch_size]
                   for i in range(0, len(idx), self.batch_size)]
        if self.drop_last:
            batches = [b for b in batches if len(b) == self.batch_size]

        def produce(q):
            try:
                for bidx in batches:
                    samples = []
                    for i in bidx:
                        s = self.dataset[int(i)]
                        while s is None:
                            s = self.dataset[int(np.random.randint(
                                len(self.dataset)))]
                        samples.append(s)
                    q.put(('batch', self.dataset.collate_batch(samples)))
            except BaseException as e:   # propagate to the consumer
                q.put(('error', e))
            else:
                q.put(('done', None))

        q = queue.Queue(maxsize=self.prefetch)
        t = threading.Thread(target=produce, args=(q,), daemon=True)
        t.start()
        while True:
            kind, item = q.get()
            if kind == 'error':
                raise item
            if kind == 'done':
                return
            yield item


def build_dataloader(dataset_cfg, class_names, batch_size, dist=False,
                     root_path=None, workers=4, seed=None, logger=None,
                     training=True, merge_all_iters_to_one_epoch=False,
                     total_epochs=0, num_shards=1, shard_id=0):
    dataset = __all__[dataset_cfg.DATASET](
        dataset_cfg=dataset_cfg, class_names=class_names,
        root_path=root_path, training=training, logger=logger)
    if merge_all_iters_to_one_epoch:
        dataset.merge_all_iters_to_one_epoch(merge=True, epochs=total_epochs)
    loader = DataLoader(dataset, batch_size, shuffle=training, seed=seed,
                        num_shards=num_shards, shard_id=shard_id,
                        drop_last=training)
    return dataset, loader, None
