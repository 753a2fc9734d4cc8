"""Drift guards for the driver entry points (__graft_entry__.py).

The multichip dryrun uses a width-shrunk 'small' preset (8 virtual devices
share one host core in the driver environment). The guard: the small
preset must define EXACTLY the same module/parameter tree as the preset
entry() compiles — same graph structure, smaller widths — so the
dryrun artifact keeps validating the real architecture.
"""
import numpy as np
import jax
import pytest


def _param_paths(model_cfg, data_cfg, batch):
    import functools
    from virconv_tpu.models.detectors.voxel_rcnn import VoxelRCNN
    model = VoxelRCNN(model_cfg=model_cfg, dataset_cfg=data_cfg)
    variables = jax.eval_shape(
        functools.partial(model.init, train=True),
        {'params': jax.random.PRNGKey(0), 'stvd': jax.random.PRNGKey(1),
         'sampling': jax.random.PRNGKey(2),
         'dropout': jax.random.PRNGKey(3)},
        jax.tree_util.tree_map(
            lambda x: jax.ShapeDtypeStruct(np.shape(x), np.asarray(x).dtype)
            if x is not None else None, batch,
            is_leaf=lambda x: x is None))
    paths = [jax.tree_util.keystr(p) for p, _ in
             jax.tree_util.tree_flatten_with_path(variables)[0]]
    return sorted(paths)


def test_dryrun_small_preset_matches_entry_structure():
    import __graft_entry__ as ge
    full = ge._tiny_cfg_and_batch(train=True, n_entries=1, small=False)
    small = ge._tiny_cfg_and_batch(train=True, n_entries=1, small=True)
    paths_full = _param_paths(*full)
    paths_small = _param_paths(*small)
    assert paths_full == paths_small
