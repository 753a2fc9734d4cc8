"""OneCycle schedule + optimizer construction tests."""
import numpy as np
import jax.numpy as jnp

from virconv_tpu.config import CfgNode
from virconv_tpu.train.optim import build_optimizer, one_cycle_lr


def test_one_cycle_shape():
    lr_fn, mom_fn = one_cycle_lr(0.01, 1000, (0.95, 0.85), 10.0, 0.4)
    lr0 = float(lr_fn(0))
    lr_peak = float(lr_fn(400))
    lr_end = float(lr_fn(1000))
    np.testing.assert_allclose(lr0, 0.001, rtol=1e-5)        # lr/div
    np.testing.assert_allclose(lr_peak, 0.01, rtol=1e-4)     # lr_max at pct
    assert lr_end < 1e-5                                     # annealed out
    # monotone up then down
    ups = [float(lr_fn(s)) for s in range(0, 401, 50)]
    downs = [float(lr_fn(s)) for s in range(400, 1001, 100)]
    assert all(a <= b + 1e-9 for a, b in zip(ups, ups[1:]))
    assert all(a >= b - 1e-9 for a, b in zip(downs, downs[1:]))
    # momentum moves opposite
    m0, mp, me = float(mom_fn(0)), float(mom_fn(400)), float(mom_fn(1000))
    np.testing.assert_allclose([m0, mp, me], [0.95, 0.85, 0.95], rtol=1e-4)


def test_build_optimizer_steps():
    import optax
    cfg = CfgNode({'OPTIMIZER': 'adam_onecycle', 'LR': 0.01,
                   'WEIGHT_DECAY': 0.01, 'MOMS': [0.95, 0.85],
                   'PCT_START': 0.4, 'DIV_FACTOR': 10,
                   'GRAD_NORM_CLIP': 10, 'NUM_EPOCHS': 2})
    params = {'dense': {'kernel': jnp.ones((4, 4)),
                        'bias': jnp.zeros((4,))},
              'bn': {'scale': jnp.ones((4,))}}
    tx, lr_fn = build_optimizer(params, cfg, total_steps=100)
    state = tx.init(params)
    grads = {'dense': {'kernel': jnp.ones((4, 4)) * 0.1,
                       'bias': jnp.ones((4,)) * 0.1},
             'bn': {'scale': jnp.ones((4,)) * 0.1}}
    updates, state = tx.update(grads, state, params)
    new_params = optax.apply_updates(params, updates)
    # all leaves moved
    assert not np.allclose(np.asarray(new_params['dense']['kernel']), 1.0)
    assert not np.allclose(np.asarray(new_params['bn']['scale']), 1.0)


def test_checkpoint_resume_restores_optax_state_types(tmp_path):
    """orbax serializes optax NamedTuple states as dicts; a typeless
    restore breaks apply_if_finite's state.inner_state on resume (seen
    live in the round-4 campaign). load_checkpoint(template=...) must
    rebuild the exact container types so tx.update works after resume."""
    import jax
    import jax.numpy as jnp
    from virconv_tpu.config import CfgNode
    from virconv_tpu.train.optim import build_optimizer
    from virconv_tpu.train.trainer import load_checkpoint, save_checkpoint
    from virconv_tpu.train.trainer import TrainState

    params = {'w': jnp.ones((3, 2)), 'b': jnp.zeros((2,))}
    cfg = CfgNode({'OPTIMIZER': 'adam_onecycle', 'LR': 0.01,
                   'WEIGHT_DECAY': 0.01, 'MOMS': [0.95, 0.85],
                   'PCT_START': 0.4, 'DIV_FACTOR': 10,
                   'GRAD_NORM_CLIP': 10, 'NUM_EPOCHS': 1})
    tx, _ = build_optimizer(params, cfg, total_steps=10)
    opt_state = tx.init(params)
    grads = jax.tree_util.tree_map(jnp.ones_like, params)
    # advance once so non-default values round-trip
    _, opt_state = tx.update(grads, opt_state, params)
    state = TrainState(params=params, batch_stats={}, opt_state=opt_state,
                       step=jnp.asarray(1, jnp.int32))
    save_checkpoint(tmp_path, state, epoch=1)

    template = {'params': params, 'batch_stats': {},
                'opt_state': jax.device_get(opt_state), 'step': 0,
                'epoch': 0}
    ckpt = load_checkpoint(tmp_path / 'checkpoint_epoch_1',
                           template=template)
    restored = ckpt['opt_state']
    assert type(restored) is type(opt_state)
    # the restored state must drive tx.update (attribute access on
    # NamedTuples) and match the original values
    upd, _ = tx.update(grads, restored, params)
    for a, b in zip(jax.tree_util.tree_leaves(restored),
                    jax.tree_util.tree_leaves(opt_state)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b))
