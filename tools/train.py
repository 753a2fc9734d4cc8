"""Training CLI.

Parity target ``/root/reference/tools/train.py``: same flags (--cfg_file,
--batch_size, --epochs, --extra_tag, --ckpt, --pretrained_model, --set, ...),
same output tree ``output/<exp_group>/<tag>/<extra_tag>/{ckpt,eval,log}``,
auto-resume from the newest checkpoint, and auto-eval of the last epochs.
The torch.distributed launcher is replaced by JAX GSPMD data parallelism
(all local devices by default; multi-host via jax.distributed.initialize).
"""

import argparse
import datetime
import functools
import os
import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

import numpy as np


def parse_config():
    parser = argparse.ArgumentParser(description='train a detector')
    parser.add_argument('--cfg_file', type=str, required=True)
    parser.add_argument('--batch_size', type=int, default=None,
                        help='global batch size (default: cfg per-chip x '
                             'n_devices)')
    parser.add_argument('--epochs', type=int, default=None)
    parser.add_argument('--workers', type=int, default=4)
    parser.add_argument('--extra_tag', type=str, default='default')
    parser.add_argument('--ckpt', type=str, default=None)
    parser.add_argument('--pretrained_model', type=str, default=None)
    parser.add_argument('--launcher', choices=['none', 'jax'],
                        default='none')
    parser.add_argument('--fix_random_seed', action='store_true')
    parser.add_argument('--max_ckpt_save_num', type=int, default=30)
    parser.add_argument('--no_eval', action='store_true',
                        help='skip the post-training auto-eval')
    parser.add_argument('--log_interval', type=int, default=50,
                        help='iterations between loss/tb logs (set low for '
                             'small datasets so per-term reg-loss spikes '
                             'are visible)')
    parser.add_argument('--set', dest='set_cfgs', default=None,
                        nargs=argparse.REMAINDER)
    args = parser.parse_args()

    from virconv_tpu.config import (cfg, cfg_from_list, cfg_from_yaml_file)
    cfg_from_yaml_file(args.cfg_file, cfg)
    cfg.TAG = Path(args.cfg_file).stem
    cfg.EXP_GROUP_PATH = '/'.join(args.cfg_file.split('/')[1:-1])
    if args.set_cfgs is not None:
        cfg_from_list(args.set_cfgs, cfg)
    return args, cfg


def main():
    args, cfg = parse_config()
    if args.launcher == 'jax':
        import jax
        jax.distributed.initialize()

    import jax
    from virconv_tpu.config import log_config_to_file
    from virconv_tpu.datasets import build_dataloader
    from virconv_tpu.models.detectors.voxel_rcnn import VoxelRCNN
    from virconv_tpu.parallel.mesh import make_mesh, shard_batch, replicated
    from virconv_tpu.train.trainer import (
        init_state, latest_checkpoint, load_checkpoint, make_train_step,
        save_checkpoint, TrainState)
    from virconv_tpu.utils import common as common_utils

    jax.config.update('jax_compilation_cache_dir',
                      str(Path('.jax_cache').resolve()))

    n_devices = jax.device_count()
    batch_size = args.batch_size or \
        cfg.OPTIMIZATION.BATCH_SIZE_PER_GPU * n_devices
    epochs = args.epochs or cfg.OPTIMIZATION.NUM_EPOCHS

    output_dir = (cfg.ROOT_DIR / 'output' / cfg.EXP_GROUP_PATH / cfg.TAG
                  / args.extra_tag)
    ckpt_dir = output_dir / 'ckpt'
    output_dir.mkdir(parents=True, exist_ok=True)
    ckpt_dir.mkdir(parents=True, exist_ok=True)
    log_file = output_dir / ('log_train_%s.txt'
                             % datetime.datetime.now().strftime(
                                 '%Y%m%d-%H%M%S'))
    logger = common_utils.create_logger(log_file)
    from virconv_tpu.utils.metrics import MetricsLogger
    metrics = MetricsLogger(output_dir / 'tensorboard')
    logger.info('********** Start training **********')
    log_config_to_file(cfg, logger=logger)
    if args.fix_random_seed:
        common_utils.set_random_seed(666)

    dataset, loader, _ = build_dataloader(
        dataset_cfg=cfg.DATA_CONFIG, class_names=cfg.CLASS_NAMES,
        batch_size=batch_size, root_path=None, workers=args.workers,
        logger=logger, training=True)
    steps_per_epoch = len(loader)
    if steps_per_epoch == 0:
        raise RuntimeError(
            f'No training batches: dataset at {cfg.DATA_CONFIG.DATA_PATH} '
            f'is empty or smaller than the batch size ({batch_size}). '
            'Check DATA_CONFIG.DATA_PATH and the info pkls.')
    total_steps = steps_per_epoch * epochs

    model = VoxelRCNN(model_cfg=cfg.MODEL, dataset_cfg=cfg.DATA_CONFIG,
                      num_class=len(cfg.CLASS_NAMES))
    mesh = make_mesh()

    # init from the first batch
    first_batch, _ = next(iter(loader))
    sharded = shard_batch(first_batch, mesh)
    rngs = {'params': jax.random.PRNGKey(666),
            'stvd': jax.random.PRNGKey(667),
            'sampling': jax.random.PRNGKey(668),
            'dropout': jax.random.PRNGKey(669)}
    state, tx, lr_fn = init_state(model, sharded, rngs,
                                  cfg.OPTIMIZATION, total_steps)
    start_epoch = 0

    resume = args.ckpt or latest_checkpoint(ckpt_dir)
    if resume is not None:
        logger.info(f'Resuming from {resume}')
        # typed template: optax NamedTuple states must be rebuilt from
        # orbax's dict serialization (see load_checkpoint docstring)
        template = {'params': jax.device_get(state.params),
                    'batch_stats': jax.device_get(state.batch_stats),
                    'opt_state': jax.device_get(state.opt_state),
                    'step': 0, 'epoch': 0}
        ckpt = load_checkpoint(resume, template=template)
        state = TrainState(params=ckpt['params'],
                           batch_stats=ckpt['batch_stats'],
                           opt_state=ckpt['opt_state'],
                           step=np.asarray(ckpt['step'], np.int32))
        start_epoch = int(ckpt['epoch'])
    elif args.pretrained_model is not None:
        logger.info(f'Loading pretrained model {args.pretrained_model}')
        ckpt = load_checkpoint(args.pretrained_model)
        state = state.replace(params=ckpt['params'],
                              batch_stats=ckpt['batch_stats'])

    state = jax.device_put(state, replicated(mesh))
    train_step = jax.jit(make_train_step(model, tx), donate_argnums=(0,))
    rng = jax.random.PRNGKey(666)

    for epoch in range(start_epoch, epochs):
        loader.set_epoch(epoch)
        import time
        t_epoch = time.time()
        for it, (batch, _) in enumerate(loader):
            sharded = shard_batch(batch, mesh)
            state, loss, tb = train_step(state, sharded, rng)
            if it % args.log_interval == 0:
                # apply_if_finite freezes the inner schedule count on
                # skipped steps, so the APPLIED LR lags state.step by the
                # skip count (ADVICE r4) — log what was actually applied
                skips = int(tb.get('nonfinite_skips', 0))
                lr = float(lr_fn(max(int(state.step) - skips, 0)))
                logger.info(
                    f'epoch {epoch} it {it}/{steps_per_epoch} '
                    f'loss {float(loss):.4f} lr {lr:.6f}')
                metrics.scalar('train/loss', float(loss), int(state.step))
                metrics.scalar('meta_data/learning_rate', lr,
                               int(state.step))
                metrics.scalars('train', jax.device_get(tb),
                                int(state.step))
        logger.info('epoch %d done in %.1fs' % (epoch, time.time() - t_epoch))
        save_checkpoint(ckpt_dir, jax.device_get(state), epoch + 1,
                        max_keep=args.max_ckpt_save_num)

    metrics.close()
    logger.info('********** Training done **********')

    if not args.no_eval:
        # auto-eval the newest checkpoints (reference train.py:186-192)
        from virconv_tpu.train.eval_loop import eval_one_ckpt
        from virconv_tpu.train.trainer import latest_checkpoint
        eval_dir = output_dir / 'eval'
        eval_dir.mkdir(exist_ok=True)
        last = latest_checkpoint(ckpt_dir)
        if last is not None:
            logger.info(f'==> auto-eval {last}')
            eval_one_ckpt(cfg, last, logger, eval_dir, batch_size=1,
                          workers=args.workers)


if __name__ == '__main__':
    main()
