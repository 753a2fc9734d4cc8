"""Optimizer + LR schedules (optax).

Parity target ``/root/reference/tools/train_utils/optimization/`` — the
fastai-style OneCycle Adam (LR 0.01, moms .95/.85, pct_start .4, div 10,
decoupled weight decay 0.01) plus plain adam/sgd with step decay. The
cosine-phase OneCycle becomes an optax schedule; the momentum (beta1)
schedule rides ``optax.inject_hyperparams``.
"""

from __future__ import annotations

import math

import jax.numpy as jnp
import optax


def one_cycle_lr(lr_max, total_steps, moms=(0.95, 0.85), div_factor=10.0,
                 pct_start=0.4):
    """fastai OneCycle: cos-anneal lr/div -> lr over pct_start, then
    lr -> lr/(div*1e4); momentum moves opposite."""
    low_lr = lr_max / div_factor
    final_lr = lr_max / (div_factor * 1e4)
    up = int(total_steps * pct_start)
    down = max(total_steps - up, 1)

    def lr_fn(step):
        step = jnp.minimum(step, total_steps)
        phase1 = _cos_anneal(low_lr, lr_max, step / jnp.maximum(up, 1))
        phase2 = _cos_anneal(lr_max, final_lr, (step - up) / down)
        return jnp.where(step <= up, phase1, phase2)

    def mom_fn(step):
        step = jnp.minimum(step, total_steps)
        phase1 = _cos_anneal(moms[0], moms[1], step / jnp.maximum(up, 1))
        phase2 = _cos_anneal(moms[1], moms[0], (step - up) / down)
        return jnp.where(step <= up, phase1, phase2)

    return lr_fn, mom_fn


def _cos_anneal(start, end, pct):
    pct = jnp.clip(pct, 0.0, 1.0)
    cos_out = jnp.cos(jnp.pi * pct) + 1.0
    return end + (start - end) / 2.0 * cos_out


def _decay_mask(params):
    """Apply weight decay to matmul/conv kernels only (not BN/bias)."""
    import flax

    def mask_fn(path, leaf):
        name = path[-1].key if hasattr(path[-1], 'key') else str(path[-1])
        return name in ('kernel',)
    import jax
    return jax.tree_util.tree_map_with_path(mask_fn, params)


def build_optimizer(params, opt_cfg, total_steps):
    """Build (optimizer, lr_schedule_fn) from an OPTIMIZATION config."""
    name = opt_cfg.OPTIMIZER
    clip = optax.clip_by_global_norm(opt_cfg.get('GRAD_NORM_CLIP', 10.0))
    wd = opt_cfg.get('WEIGHT_DECAY', 0.0)

    if name == 'adam_onecycle':
        lr_fn, mom_fn = one_cycle_lr(
            opt_cfg.LR, total_steps, tuple(opt_cfg.MOMS),
            opt_cfg.DIV_FACTOR, opt_cfg.PCT_START)

        opt = optax.inject_hyperparams(optax.adamw, static_args=('mask',))(
            learning_rate=lr_fn, b1=mom_fn, weight_decay=wd,
            mask=_decay_mask(params) if wd > 0 else None)
        # Skip (zero) any update whose grads are non-finite instead of
        # writing NaN into the params: optax clip_by_global_norm propagates
        # a NaN norm into every weight, so ONE bad step destroys the run
        # (round-4 campaign post-mortem, docs/DESIGN.md §14). torch's
        # clip_grad_norm_ scales by max_norm/inf ~= 0 in the same case, so
        # the reference effectively skips too — this matches it, and gives
        # up only after 10000 consecutive bad steps.
        return optax.apply_if_finite(optax.chain(clip, opt), 10000), lr_fn
    if name == 'adam':
        steps_per_epoch = max(total_steps // max(opt_cfg.NUM_EPOCHS, 1), 1)
        bounds = {int(e) * steps_per_epoch: opt_cfg.LR_DECAY
                  for e in opt_cfg.DECAY_STEP_LIST}
        lr_fn = optax.piecewise_constant_schedule(opt_cfg.LR, bounds)
        return optax.chain(clip, optax.adam(lr_fn)), lr_fn
    if name == 'sgd':
        steps_per_epoch = max(total_steps // max(opt_cfg.NUM_EPOCHS, 1), 1)
        bounds = {int(e) * steps_per_epoch: opt_cfg.LR_DECAY
                  for e in opt_cfg.DECAY_STEP_LIST}
        lr_fn = optax.piecewise_constant_schedule(opt_cfg.LR, bounds)
        return optax.chain(
            clip, optax.sgd(lr_fn, momentum=opt_cfg.MOMENTUM,
                            nesterov=False)), lr_fn
    raise NotImplementedError(name)
