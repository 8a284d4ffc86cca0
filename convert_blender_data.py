#!/usr/bin/env python
"""Multi-scale dataset conversion CLI — parity with reference
datasets/convert_blender_data.py:120-147."""

import argparse
import os


def main():
    parser = argparse.ArgumentParser()
    parser.add_argument("--blender_dir", help="data root path", type=str)
    parser.add_argument("--object_name", help="single scene to convert",
                        type=str, default=None)
    parser.add_argument("--out_dir", help="Output directory.", type=str)
    parser.add_argument("--n_down", help="number of pyramid levels",
                        type=int, default=4)
    args = parser.parse_args()

    from mipnerf_pl_tpu.data.convert import convert_to_nerfdata

    os.makedirs(args.out_dir, exist_ok=True)
    scenes = [args.object_name] if args.object_name else os.listdir(
        args.blender_dir)
    dirs = [os.path.join(args.blender_dir, s) for s in scenes]
    dirs = [d for d in dirs if os.path.isdir(d)]
    print(dirs)
    for basedir in dirs:
        newdir = os.path.join(args.out_dir, os.path.basename(basedir))
        print('Converting from', basedir, 'to', newdir)
        convert_to_nerfdata(basedir, newdir, args.n_down)


if __name__ == '__main__':
    main()
