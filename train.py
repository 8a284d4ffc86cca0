#!/usr/bin/env python
"""Train CLI — same public flags as reference train.py:14-21.

  python train.py --data_path DATA --out_dir OUT --dataset_name blender \\
      [--config configs/lego.yaml] [key value ...]
"""

import argparse

parser = argparse.ArgumentParser()
parser.add_argument("--data_path", help="data path.", type=str, required=True)
parser.add_argument("--out_dir", help="Output directory.", type=str,
                    required=True)
parser.add_argument("--dataset_name", help="Single or multi data.", type=str,
                    choices=['multi_blender', 'blender', 'real360'],
                    required=True)
parser.add_argument("--config", help="Path to config file.", required=False,
                    default='./configs/lego.yaml')
parser.add_argument("--max_steps", help="Override optimizer.max_steps.",
                    type=int, default=None)
parser.add_argument("--profile", help="Trace this many train steps with "
                    "jax.profiler into the TB logdir (0 = off).",
                    type=int, default=0)
parser.add_argument("opts", nargs=argparse.REMAINDER,
                    help="Modify hparams, e.g.: train.batch_size 1024")


def main(hparams):
    # Single jax PRNG seed replaces the reference's torch/cuda/np/random
    # seeding (train.py:24-29) — strictly stronger determinism: every random
    # draw threads from jax.random.PRNGKey(seed).
    from mipnerf_pl_tpu.compile_cache import enable_compilation_cache
    from mipnerf_pl_tpu.parallel.mesh import maybe_initialize_distributed
    from mipnerf_pl_tpu.train.system import MipNeRFSystem

    enable_compilation_cache()

    # Pod scale: when parallel.multi_host is set, join the jax.distributed
    # cluster BEFORE any backend use so the mesh spans all hosts' chips.
    if maybe_initialize_distributed(hparams):
        import jax
        print(f'multi-host: process {jax.process_index()}/'
              f'{jax.process_count()}, '
              f'{jax.local_device_count()} local / '
              f'{jax.device_count()} global devices', flush=True)

    system = MipNeRFSystem(hparams)
    print(f'mesh: {system.mesh}', flush=True)
    system.fit(
        data_path=hparams['data_path'],
        dataset_name=hparams['dataset_name'],
        out_dir=hparams['out_dir'],
        max_steps=hparams.get('max_steps'),
        resume_path=hparams.get('checkpoint.resume_path'),
    )


if __name__ == "__main__":
    from mipnerf_pl_tpu.config import parse_args
    main(parse_args(parser))
