"""CLI-level tests: eval.py and render_video.py driven in-process on the
CPU mesh against a checkpoint from a short fit()."""

import argparse
import os
import sys

import numpy as np
import pytest

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from mipnerf_pl_tpu.train.system import MipNeRFSystem
from tests.helpers import make_blender_scene, tiny_hparams


@pytest.fixture(scope='module')
def trained(tmp_path_factory):
    root = tmp_path_factory.mktemp('cli')
    scene = make_blender_scene(str(root / 'scene'), n_frames=2, size=8)
    hp = tiny_hparams()
    hp['val.check_interval'] = 10
    out_dir = str(root / 'out')
    system = MipNeRFSystem(hp)
    system.fit(scene, 'blender', out_dir, max_steps=10, verbose=False)
    return scene, os.path.join(out_dir, 'ckpt', 'test'), str(root)


def test_eval_cli(trained):
    scene, ckpt_dir, root = trained
    import eval as eval_cli

    args = argparse.Namespace(
        ckpt=ckpt_dir, data=scene, out_dir=os.path.join(root, 'eval'),
        chunk_size=64, white_bkgd=True, save_image=True, summa_only=False,
        scale=1, base_size=[8, 8], no_video=True, dataset_name=None)
    scenes = eval_cli.main(args)
    assert scenes == ['test']
    exp_dir = os.path.join(root, 'eval', 'test', 'test')
    assert os.path.exists(os.path.join(exp_dir, 'psnrs.txt'))
    assert os.path.exists(os.path.join(exp_dir, 'ssims.txt'))
    psnrs = [float(v) for v in
             open(os.path.join(exp_dir, 'psnrs.txt')).read().split()]
    assert len(psnrs) == 2 and all(np.isfinite(psnrs))
    # save_image wrote per-scale artifacts
    assert any(f.endswith('_rgb.png')
               for f in os.listdir(os.path.join(exp_dir, '1')))

    from mipnerf_pl_tpu.utils.metrics import summarize_results
    line = summarize_results(os.path.join(root, 'eval'), ['test'], 1)
    assert len(line.split(' | ')) == 3


def test_render_video_cli(trained):
    scene, ckpt_dir, root = trained
    import render_video

    args = argparse.Namespace(
        ckpt=ckpt_dir, out_dir=os.path.join(root, 'render'),
        chunk_size=64, white_bkgd=True, render_images_dir=None, scale=1,
        base_size=[8, 8], camera_angle_x=0.6911112070083618, n_poses=2,
        gen_video_only=False)
    render_video.run_render(args)
    frame_dir = os.path.join(root, 'render', 'render_spheric', 'test', '1')
    assert any(f.endswith('_rgb.png') for f in os.listdir(frame_dir))
    assert any(f.endswith('.mov') for f in os.listdir(frame_dir))


def test_multiscale_fit(tmp_path):
    """fit() end-to-end on a converted multi-scale dataset (lossmult loss)."""
    from mipnerf_pl_tpu.data.convert import convert_to_nerfdata

    scene = make_blender_scene(str(tmp_path / 's'), n_frames=2, size=8)
    multi = str(tmp_path / 'multi')
    convert_to_nerfdata(scene, multi, n_down=2)
    hp = tiny_hparams()
    hp['val.check_interval'] = 8
    system = MipNeRFSystem(hp)
    state = system.fit(multi, 'multi_blender', str(tmp_path / 'out'),
                       max_steps=8, verbose=False)
    assert int(state['step']) == 8


def test_graft_entry_dryrun():
    """The driver's multichip dryrun must work on the virtual CPU mesh."""
    import __graft_entry__ as g
    g.dryrun_multichip(8)   # dp=4 x tp=2
    g.dryrun_multichip(3)   # odd -> pure dp


def test_eval_cli_multiscale(tmp_path):
    """eval.py --scale 2 on a converted multi-scale set: per-resolution
    buckets and the bucketed summary line."""
    from mipnerf_pl_tpu.data.convert import convert_to_nerfdata

    scene = make_blender_scene(str(tmp_path / 's'), n_frames=2, size=8)
    multi = str(tmp_path / 'multi')
    convert_to_nerfdata(scene, multi, n_down=2)

    hp = tiny_hparams()
    hp['val.check_interval'] = 5
    out_dir = str(tmp_path / 'out')
    system = MipNeRFSystem(hp)
    system.fit(multi, 'multi_blender', out_dir, max_steps=5, verbose=False)

    import eval as eval_cli
    args = argparse.Namespace(
        ckpt=os.path.join(out_dir, 'ckpt', 'test'), data=multi,
        out_dir=str(tmp_path / 'eval'), chunk_size=64, white_bkgd=True,
        save_image=True, summa_only=False, scale=2, base_size=[8, 8],
        no_video=True)
    eval_cli.main(args)
    exp_dir = os.path.join(str(tmp_path / 'eval'), 'test', 'test')
    # 2 test images x 2 scales = 4 metric entries
    psnrs = open(os.path.join(exp_dir, 'psnrs.txt')).read().split()
    assert len(psnrs) == 4
    # per-scale image buckets
    assert os.listdir(os.path.join(exp_dir, '1'))
    assert os.listdir(os.path.join(exp_dir, '2'))

    from mipnerf_pl_tpu.utils.metrics import summarize_results
    line = summarize_results(str(tmp_path / 'eval'), ['test'], 2)
    assert len(line.split(' | ')[0].split(' ')) == 2  # 2 buckets
