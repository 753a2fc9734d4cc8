"""Evaluation CLI.

Parity target ``/root/reference/tools/test.py`` + ``tools/eval_utils/
eval_utils.py``: evaluate one checkpoint (--ckpt) or poll a checkpoint dir
(--eval_all), produce KITTI-format prediction files, run the official AP(R40)
metric, log recalls and sec/example. Post-processing follows the config: WBF
(score-threshold only in-graph, clustering host-side) or rotated NMS.
"""

import argparse
import datetime
import functools
import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

import numpy as np


def parse_config():
    parser = argparse.ArgumentParser(description='evaluate a detector')
    parser.add_argument('--cfg_file', type=str, required=True)
    parser.add_argument('--batch_size', type=int, default=1)
    parser.add_argument('--workers', type=int, default=4)
    parser.add_argument('--extra_tag', type=str, default='default')
    parser.add_argument('--ckpt', type=str, default=None)
    parser.add_argument('--eval_all', action='store_true')
    parser.add_argument('--max_waiting_mins', type=int, default=30)
    parser.add_argument('--save_to_file', action='store_true')
    parser.add_argument('--launcher', choices=['none', 'jax'],
                        default='none',
                        help="'jax' initializes multi-process JAX and "
                             'shards eval across processes '
                             '(reference dist_test.sh)')
    parser.add_argument('--set', dest='set_cfgs', default=None,
                        nargs=argparse.REMAINDER)
    args = parser.parse_args()
    from virconv_tpu.config import cfg, cfg_from_list, cfg_from_yaml_file
    cfg_from_yaml_file(args.cfg_file, cfg)
    cfg.TAG = Path(args.cfg_file).stem
    cfg.EXP_GROUP_PATH = '/'.join(args.cfg_file.split('/')[1:-1])
    if args.set_cfgs is not None:
        cfg_from_list(args.set_cfgs, cfg)
    return args, cfg


def eval_one_ckpt(args, cfg, ckpt_path, logger, output_dir):
    from virconv_tpu.train.eval_loop import eval_one_ckpt as _eval
    return _eval(cfg, ckpt_path, logger, output_dir,
                 batch_size=args.batch_size, workers=args.workers,
                 save_to_file=args.save_to_file,
                 dist_eval=args.launcher == 'jax')


def main():
    args, cfg = parse_config()
    from virconv_tpu.utils import common as common_utils
    import jax
    if args.launcher == 'jax':
        from virconv_tpu.parallel.dist import init_distributed
        init_distributed()
    jax.config.update('jax_compilation_cache_dir',
                      str(Path('.jax_cache').resolve()))

    output_dir = (cfg.ROOT_DIR / 'output' / cfg.EXP_GROUP_PATH / cfg.TAG
                  / args.extra_tag / 'eval')
    output_dir.mkdir(parents=True, exist_ok=True)
    log_file = output_dir / ('log_eval_%s.txt'
                             % datetime.datetime.now().strftime(
                                 '%Y%m%d-%H%M%S'))
    logger = common_utils.create_logger(log_file)
    np.random.seed(1024)

    if args.eval_all:
        ckpt_dir = output_dir.parent / 'ckpt'
        evaluated = set()
        wait_start = time.time()
        while True:
            ckpts = sorted(ckpt_dir.glob('checkpoint_epoch_*'),
                           key=lambda p: p.stat().st_mtime)
            todo = [c for c in ckpts if str(c) not in evaluated]
            if not todo:
                if (time.time() - wait_start) / 60 > args.max_waiting_mins:
                    break
                time.sleep(30)
                continue
            wait_start = time.time()
            for c in todo:
                logger.info(f'==> evaluating {c}')
                eval_one_ckpt(args, cfg, c, logger, output_dir)
                evaluated.add(str(c))
    else:
        assert args.ckpt is not None, '--ckpt required without --eval_all'
        eval_one_ckpt(args, cfg, args.ckpt, logger, output_dir)


if __name__ == '__main__':
    main()
