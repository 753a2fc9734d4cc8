"""Training state + jitted train/eval steps + checkpointing (orbax).

Parity target ``/root/reference/tools/train_utils/train_utils.py``: per-iter
LR schedule, grad clip, checkpoint rotation; checkpoints store
{epoch, it, model_state (params + batch_stats), optimizer_state} like the
reference's ``checkpoint_state`` (``:128-155``). The torch-DDP loop becomes
one jitted step with GSPMD data parallelism (see ``parallel.mesh``).
"""

from __future__ import annotations

import functools
from pathlib import Path
from typing import Any, Dict, Optional

import numpy as np
import jax
import jax.numpy as jnp
import optax
from flax import struct

from ..parallel.mesh import make_mesh, replicated, shard_batch
from .optim import build_optimizer


@struct.dataclass
class TrainState:
    params: Any
    batch_stats: Any
    opt_state: Any
    step: jnp.ndarray


def init_state(model, batch, rngs, opt_cfg, total_steps):
    variables = jax.jit(functools.partial(model.init, train=True))(
        rngs, batch)
    params = variables['params']
    batch_stats = variables.get('batch_stats', {})
    tx, lr_fn = build_optimizer(params, opt_cfg, total_steps)
    opt_state = tx.init(params)
    state = TrainState(params=params, batch_stats=batch_stats,
                       opt_state=opt_state,
                       step=jnp.zeros((), jnp.int32))
    return state, tx, lr_fn


def make_train_step(model, tx):
    def train_step(state: TrainState, batch, rng):
        rngs = {k: jax.random.fold_in(r, state.step)
                for k, r in zip(('stvd', 'sampling', 'dropout'),
                                jax.random.split(rng, 3))}

        def loss_fn(params):
            out, mut = model.apply(
                {'params': params, 'batch_stats': state.batch_stats},
                batch, train=True, rngs=rngs, mutable=['batch_stats'])
            return out['loss'], (out.get('tb', {}), mut)

        (loss, (tb, mut)), grads = jax.value_and_grad(
            loss_fn, has_aux=True)(state.params)
        updates, opt_state = tx.update(grads, state.opt_state, state.params)
        params = optax.apply_updates(state.params, updates)
        if hasattr(opt_state, 'total_notfinite'):
            # apply_if_finite wrapper (adam_onecycle): count of skipped
            # non-finite-grad steps — spike/divergence observability
            tb = {**tb, 'nonfinite_skips': opt_state.total_notfinite}
        new_state = state.replace(
            params=params, batch_stats=mut.get('batch_stats',
                                               state.batch_stats),
            opt_state=opt_state, step=state.step + 1)
        return new_state, loss, tb
    return train_step


def make_eval_step(model):
    def eval_step(params, batch_stats, batch):
        return model.apply({'params': params, 'batch_stats': batch_stats},
                           batch, train=False)
    return eval_step


# ------------------------------------------------------------ checkpoints ---
def save_checkpoint(ckpt_dir, state: TrainState, epoch: int,
                    max_keep: int = 30):
    import orbax.checkpoint as ocp
    ckpt_dir = Path(ckpt_dir).resolve()
    ckpt_dir.mkdir(parents=True, exist_ok=True)
    path = ckpt_dir / f'checkpoint_epoch_{epoch}'
    ckptr = ocp.PyTreeCheckpointer()
    ckptr.save(path, {'params': jax.device_get(state.params),
                      'batch_stats': jax.device_get(state.batch_stats),
                      'opt_state': jax.device_get(state.opt_state),
                      'step': int(state.step), 'epoch': epoch},
               force=True)
    # rotation (reference keeps max 30 checkpoints)
    ckpts = sorted(ckpt_dir.glob('checkpoint_epoch_*'),
                   key=lambda p: p.stat().st_mtime)
    for old in ckpts[:-max_keep]:
        import shutil
        shutil.rmtree(old, ignore_errors=True)
    return path


def load_checkpoint(path, template=None):
    """Restore a checkpoint.

    ``template``: optional pytree of the same structure whose container
    TYPES are authoritative — orbax serializes NamedTuples (optax states
    like ApplyIfFiniteState / ScaleByAdamState) as plain dicts, and a
    typeless restore breaks ``state.inner_state``-style attribute access
    on resume. Field-name keyed dicts are re-wrapped into the template's
    containers (never positionally: dict key order is sorted, NamedTuple
    field order is not)."""
    import orbax.checkpoint as ocp
    ckptr = ocp.PyTreeCheckpointer()
    restored = ckptr.restore(Path(path).resolve())
    if template is None:
        return restored

    def pick(got, name, i, path):
        """Field lookup tolerant of orbax's two NamedTuple serializations
        (field-name keyed vs index keyed) and raw sequences."""
        if isinstance(got, dict):
            if name in got:
                return got[name]
            if str(i) in got:                 # index-keyed orbax versions
                return got[str(i)]
            raise ValueError(
                f'checkpoint restore mismatch at {path!r}: field '
                f'{name!r} (index {i}) absent from restored dict with '
                f'keys {sorted(got)[:8]}')
        if isinstance(got, (tuple, list)):
            if i < len(got):
                return got[i]
            raise ValueError(
                f'checkpoint restore mismatch at {path!r}: sequence of '
                f'length {len(got)} has no index {i}')
        raise ValueError(
            f'checkpoint restore mismatch at {path!r}: expected a '
            f'container for field {name!r}, restored {type(got).__name__}')

    def rebuild(tmpl, got, path='/'):
        if hasattr(tmpl, '_fields'):          # NamedTuple: rebuild by name
            vals = {f: rebuild(getattr(tmpl, f), pick(got, f, i, path),
                               f'{path}{f}/')
                    for i, f in enumerate(tmpl._fields)}
            return type(tmpl)(**vals)
        if isinstance(tmpl, (tuple, list)):
            return type(tmpl)(
                rebuild(t, pick(got, str(i), i, path), f'{path}{i}/')
                for i, t in enumerate(tmpl))
        if isinstance(tmpl, dict):
            if not isinstance(got, dict):
                raise ValueError(
                    f'checkpoint restore mismatch at {path!r}: expected '
                    f'dict, restored {type(got).__name__}')
            extra = set(got) - set(tmpl)
            if extra:
                raise ValueError(
                    f'checkpoint restore mismatch at {path!r}: restored '
                    f'keys {sorted(extra)[:8]} absent from the template '
                    '(template/checkpoint structure drift)')
            return {k: rebuild(v, pick(got, k, i, path), f'{path}{k}/')
                    for i, (k, v) in enumerate(tmpl.items())}
        return got
    return rebuild(template, restored)


def latest_checkpoint(ckpt_dir):
    ckpts = sorted(Path(ckpt_dir).glob('checkpoint_epoch_*'),
                   key=lambda p: p.stat().st_mtime)
    return ckpts[-1] if ckpts else None
