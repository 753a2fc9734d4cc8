"""Build the ``semi/`` pseudo-label split from KITTI odometry sequences.

Parity target ``/root/reference/tools/creat_semi_dataset.py``: subsample
odometry frames 1:4, rename into the KITTI detection layout under
``data/kitti/semi/`` (velodyne + image_2 + calib), rewriting the odometry
calib into detection-style calib files, and emit ``ImageSets/semi.txt``.
Pseudo labels are produced afterwards by running a trained VirConv-T over the
split (tools/test.py --save_to_file) and copying the detections to
``semi/label_2``.
"""

import argparse
import shutil
import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))


def convert_calib(odom_calib_file, out_file):
    """Odometry calib (P0..P3, Tr) -> detection-style calib txt."""
    entries = {}
    with open(odom_calib_file) as f:
        for line in f:
            if ':' not in line:
                continue
            key, vals = line.split(':', 1)
            entries[key.strip()] = vals.strip()
    with open(out_file, 'w') as f:
        p2 = entries.get('P2', entries.get('P0', ''))
        f.write(f'P0: {entries.get("P0", p2)}\n')
        f.write(f'P1: {entries.get("P1", p2)}\n')
        f.write(f'P2: {p2}\n')
        f.write(f'P3: {entries.get("P3", p2)}\n')
        # odometry has no R0_rect; identity keeps geometry consistent
        f.write('R0_rect: 1 0 0 0 1 0 0 0 1\n')
        f.write(f'Tr_velo_to_cam: {entries.get("Tr", "")}\n')


def main():
    parser = argparse.ArgumentParser()
    parser.add_argument('--odometry_root', type=str, required=True,
                        help='KITTI odometry root (sequences/<seq>/...)')
    parser.add_argument('--out_root', type=str, default='data/kitti')
    parser.add_argument('--sequences', type=str, nargs='+',
                        default=['00', '02', '05', '07', '08'])
    parser.add_argument('--stride', type=int, default=4)
    args = parser.parse_args()

    odo = Path(args.odometry_root)
    out = Path(args.out_root) / 'semi'
    for sub in ('velodyne', 'image_2', 'calib'):
        (out / sub).mkdir(parents=True, exist_ok=True)

    frame_ids = []
    counter = 0
    for seq in args.sequences:
        seq_dir = odo / 'sequences' / seq
        calib_file = seq_dir / 'calib.txt'
        bins = sorted((seq_dir / 'velodyne').glob('*.bin'))
        for i, binf in enumerate(bins):
            if i % args.stride != 0:
                continue
            fid = f'{counter:06d}'
            shutil.copy(binf, out / 'velodyne' / f'{fid}.bin')
            img = seq_dir / 'image_2' / f'{binf.stem}.png'
            if img.exists():
                shutil.copy(img, out / 'image_2' / f'{fid}.png')
            convert_calib(calib_file, out / 'calib' / f'{fid}.txt')
            frame_ids.append(fid)
            counter += 1

    sets = Path(args.out_root) / 'ImageSets'
    sets.mkdir(exist_ok=True)
    with open(sets / 'semi.txt', 'w') as f:
        f.write('\n'.join(frame_ids) + '\n')
    print(f'semi split: {len(frame_ids)} frames')


if __name__ == '__main__':
    main()
