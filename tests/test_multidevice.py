"""Multi-device (8 virtual CPU devices) data-parallel tests.

The JAX analog of the reference's 8-GPU DDP bread-and-butter path
(``/root/reference/tools/train.py:141``,
``pcdet/utils/common_utils.py:114-154``): one logical program, batch
sharded over a 1-D dp mesh, gradient allreduce and BN-stat sync inserted
by GSPMD. These tests assert the sharded program computes the SAME math
as the single-device one on the same global batch — the property DDP +
SyncBN provides in the reference.
"""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from virconv_tpu.config import CfgNode
from virconv_tpu.models.detectors.voxel_rcnn import VoxelRCNN
from virconv_tpu.parallel.mesh import (batch_sharding, make_mesh, replicated,
                                       shard_batch)
from virconv_tpu.train.trainer import init_state, make_train_step

from test_model_forward import make_batch, tiny_cfg

pytestmark = pytest.mark.skipif(
    jax.device_count() < 8, reason='needs the 8-device virtual CPU mesh')


@pytest.fixture(scope='module', autouse=True)
def _pin_matmul_precision_and_cache():
    """Pin matmul precision to the default for this module's compiles.

    Several numeric-parity modules set jax_default_matmul_precision=
    'highest' at import time — a process-global leak. In a full-suite run
    those imports happen first, so this module's large 8-partition train
    -step compile got a DIFFERENT compile-cache key than a standalone run:
    a guaranteed in-suite cache miss. Serializing the resulting multi
    -hundred-MB XLA:CPU executable for the cache write crashes the long
    -lived suite process (observed SIGABRT and SIGSEGV inside
    compilation_cache.put_executable_and_time at the same suite position).
    Pinning the default here makes in-suite and standalone keys equal (the
    seeded cache entry hits, nothing recompiles); suppressing persistent
    -cache WRITES for the module keeps a miss from re-entering the crashy
    serialization path (reads are unaffected)."""
    prev_prec = jax.config.jax_default_matmul_precision
    prev_min = jax.config.jax_persistent_cache_min_compile_time_secs
    jax.config.update('jax_default_matmul_precision', None)
    jax.config.update('jax_persistent_cache_min_compile_time_secs', 1e9)
    yield
    jax.config.update('jax_default_matmul_precision', prev_prec)
    jax.config.update('jax_persistent_cache_min_compile_time_secs', prev_min)

OPT_CFG = CfgNode({'OPTIMIZER': 'adam_onecycle', 'LR': 0.01,
                   'WEIGHT_DECAY': 0.01, 'MOMS': [0.95, 0.85],
                   'PCT_START': 0.4, 'DIV_FACTOR': 10,
                   'GRAD_NORM_CLIP': 10, 'NUM_EPOCHS': 1})


def _tree_allclose(a, b, atol, rtol=1e-5):
    fa, _ = jax.tree_util.tree_flatten(a)
    fb, _ = jax.tree_util.tree_flatten(b)
    assert len(fa) == len(fb)
    for x, y in zip(fa, fb):
        np.testing.assert_allclose(np.asarray(x, np.float64),
                                   np.asarray(y, np.float64),
                                   atol=atol, rtol=rtol)


@pytest.fixture(scope='module')
def model_and_batch():
    model_cfg, data_cfg = tiny_cfg(mm=True)
    model = VoxelRCNN(model_cfg=model_cfg, dataset_cfg=data_cfg)
    rng = np.random.default_rng(0)
    batch = make_batch(rng, n_entries=8, train=True)
    return model, batch


@pytest.fixture(scope='module')
def small_model_and_batch():
    """Width-shrunk preset (the dryrun_multichip config, shared via
    shrink_cfg) — keeps the always-on smoke's in-suite compile around a
    minute instead of ~3 (the tiny-width compile at suite position had
    a guaranteed cache miss, PARITY.md round-5 notes)."""
    from test_model_forward import shrink_cfg
    model_cfg, data_cfg = tiny_cfg(mm=True)
    n_pts = shrink_cfg(model_cfg, data_cfg)
    model = VoxelRCNN(model_cfg=model_cfg, dataset_cfg=data_cfg)
    rng = np.random.default_rng(0)
    batch = make_batch(rng, n_entries=8, n_pts=n_pts, train=True)
    return model, batch


def test_train_step_8dev_smoke(small_model_and_batch):
    """Always-on smoke: the 8-device dp train step compiles, executes, and
    produces a finite loss with params/stats placed replicated — the same
    program (and width preset) the driver's dryrun_multichip validates.
    The full 8-dev-vs-1-dev equality check is the `slow` test below (two
    multi-minute XLA-CPU compiles at tiny widths)."""
    model, batch = small_model_and_batch
    rngs = {'params': jax.random.PRNGKey(0), 'stvd': jax.random.PRNGKey(1),
            'sampling': jax.random.PRNGKey(2),
            'dropout': jax.random.PRNGKey(3)}
    mesh = make_mesh(8)
    sharded = shard_batch(batch, mesh)
    state, tx, _ = init_state(model, sharded, rngs, OPT_CFG, total_steps=10)
    state = jax.device_put(state, replicated(mesh))
    step = jax.jit(make_train_step(model, tx))
    new_state, loss, tb = step(state, sharded, jax.random.PRNGKey(7))
    assert np.isfinite(float(loss))
    leaf = jax.tree_util.tree_leaves(new_state.params)[0]
    assert len(leaf.sharding.device_set) == 8     # replicated over the mesh


@pytest.mark.slow
def test_train_step_8dev_matches_1dev(model_and_batch):
    """Same global batch, same rng: the dp-sharded train step must produce
    the same loss, params, and synced batch_stats as single-device."""
    model, batch = model_and_batch
    rngs = {'params': jax.random.PRNGKey(0), 'stvd': jax.random.PRNGKey(1),
            'sampling': jax.random.PRNGKey(2),
            'dropout': jax.random.PRNGKey(3)}
    step_rng = jax.random.PRNGKey(7)

    results = {}
    for ndev in (1, 8):
        mesh = make_mesh(ndev)
        sharded = shard_batch(batch, mesh)
        state, tx, _ = init_state(model, sharded, rngs, OPT_CFG,
                                  total_steps=10)
        state = jax.device_put(state, replicated(mesh))
        step = jax.jit(make_train_step(model, tx))
        new_state, loss, _ = step(state, sharded, step_rng)
        results[ndev] = (float(loss), jax.device_get(new_state.params),
                         jax.device_get(new_state.batch_stats))

    loss1, params1, stats1 = results[1]
    loss8, params8, stats8 = results[8]
    assert np.isfinite(loss1)
    # different reduction orders -> tiny float drift only
    assert abs(loss1 - loss8) < 1e-4 * max(1.0, abs(loss1))
    # post-Adam params: near-zero grads amplify reduction-order drift to a
    # full +/-lr step (update ~ lr * m/sqrt(v) ~ lr * sign(g)), so bound by
    # the step size rather than float eps. A real sharding bug (missing
    # psum, shard-local loss) moves params far beyond one step.
    lr0 = OPT_CFG.LR / OPT_CFG.DIV_FACTOR
    _tree_allclose(params1, params8, atol=3 * lr0, rtol=1e-3)
    # BN stats are the reference's SyncBN: global-batch moments either way.
    # GSPMD reduction blocking drifts the moments by ~1e-5 absolute through
    # the 14 BN layers; a missing sync would show O(1) relative error
    # (each shard would carry different-data moments).
    _tree_allclose(stats1, stats8, atol=2e-4, rtol=0.01)


@pytest.mark.slow
def test_eval_forward_sharded_matches_replicated(model_and_batch):
    """Eval with entries sharded over dp == eval on one device (the
    reference's pad+stride eval sampler merges to the same outputs)."""
    model, train_batch = model_and_batch
    rngs = {'params': jax.random.PRNGKey(0), 'stvd': jax.random.PRNGKey(1),
            'sampling': jax.random.PRNGKey(2),
            'dropout': jax.random.PRNGKey(3)}
    variables = jax.jit(lambda r, b: model.init(r, b, train=True))(
        rngs, train_batch)
    eval_vars = {'params': variables['params'],
                 'batch_stats': variables.get('batch_stats', {})}

    rng = np.random.default_rng(1)
    eval_batch = make_batch(rng, n_entries=8, train=False, n_rep=2)

    outs = {}
    for ndev in (1, 8):
        mesh = make_mesh(ndev)
        sharded = shard_batch(eval_batch, mesh)
        ev = jax.device_put(eval_vars, replicated(mesh))
        fwd = jax.jit(lambda v, b: model.apply(v, b, train=False))
        outs[ndev] = jax.device_get(fwd(ev, sharded))

    for key in ('batch_box_preds', 'batch_cls_preds'):
        np.testing.assert_allclose(outs[1][key], outs[8][key],
                                   atol=1e-4, rtol=1e-4)


def test_batch_sharding_layout():
    """Leading-axis arrays shard over dp; indivisible ones replicate."""
    mesh = make_mesh(8)
    batch = {'a': np.zeros((8, 4), np.float32),
             'b': np.zeros((3, 4), np.float32),
             'c': None}
    placed = shard_batch(batch, mesh)
    assert placed['a'].sharding == batch_sharding(mesh)
    assert placed['b'].sharding == replicated(mesh)
    assert placed['c'] is None
    # a genuinely distributed layout: one batch row per device
    assert len(placed['a'].addressable_shards) == 8
    assert placed['a'].addressable_shards[0].data.shape == (1, 4)
