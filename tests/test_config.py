"""Tests for the flat dotted-key config system (L6)."""

import argparse
import os
import sys

import pytest

from mipnerf_pl_tpu import config as config_lib

CONFIGS = os.path.join(os.path.dirname(os.path.dirname(
    os.path.abspath(__file__))), 'configs')


def test_default_yaml_complete():
    cfg = config_lib.default()
    for key in ['seed', 'exp_name', 'train.batch_size', 'train.randomized',
                'val.chunk_size', 'nerf.num_samples', 'nerf.mlp.net_depth',
                'optimizer.lr_init', 'loss.coarse_loss_mult',
                'checkpoint.resume_path']:
        assert key in cfg, key


def test_lego_yaml_values():
    cfg = config_lib.load(os.path.join(CONFIGS, 'lego.yaml'))
    assert cfg['train.batch_size'] == 3072
    assert cfg['nerf.num_samples'] == 128
    assert cfg['nerf.mlp.net_width'] == 256
    assert cfg['optimizer.lr_init'] == 5e-4
    assert cfg['nerf.append_identity'] is True  # upstream 'Ture' typo fixed
    assert cfg['checkpoint.resume_path'] is None


def test_literal_eval_coercion(tmp_path):
    p = tmp_path / 'c.yaml'
    p.write_text("a: '3'\nb: 'hello'\nc: [1, 2]\nnested:\n  d: '1e-3'\n")
    cfg = config_lib.load(str(p))
    assert cfg['a'] == 3
    assert cfg['b'] == 'hello'
    assert cfg['c'] == (1, 2)          # lists -> tuples
    assert cfg['nested.d'] == 1e-3


def test_merge_order(tmp_path, monkeypatch):
    p = tmp_path / 'override.yaml'
    p.write_text("train:\n  batch_size: 128\n")
    parser = argparse.ArgumentParser()
    parser.add_argument('--config')
    parser.add_argument('--data_path')
    parser.add_argument('opts', nargs=argparse.REMAINDER)
    monkeypatch.setattr(sys, 'argv', [
        'prog', '--config', str(p), '--data_path', '/tmp/d',
        'train.batch_size', '64', 'new.key', '7'])
    cfg = config_lib.parse_args(parser)
    # CLI opts beat the config file beat the defaults.
    assert cfg['train.batch_size'] == 64
    assert cfg['new.key'] == 7
    assert cfg['data_path'] == '/tmp/d'      # argparse keys merged last
    assert cfg['nerf.num_samples'] == 128    # default preserved


def test_roundtrip_save_load(tmp_path):
    cfg = config_lib.default()
    cfg['custom.tuple'] = (1, 2, 3)
    out = tmp_path / 'saved.yaml'
    config_lib.save(cfg, str(out))
    cfg2 = config_lib.load(str(out))
    assert cfg2['custom.tuple'] == (1, 2, 3)
    assert cfg2['train.batch_size'] == cfg['train.batch_size']


def test_num_gpus_honored_as_device_count():
    """A reference-style config with num_gpus set must use that many
    devices when num_devices is unset (ref configs/lego.yaml:2)."""
    from tests.helpers import tiny_hparams
    from mipnerf_pl_tpu.train.system import MipNeRFSystem

    hp = tiny_hparams()
    assert hp['num_devices'] == 0 and hp['num_gpus'] == 0
    # Default: all 8 virtual devices.
    assert MipNeRFSystem(hp).mesh.devices.size == 8
    # num_gpus is the fallback device count...
    hp2 = tiny_hparams(**{'num_gpus': 2})
    assert MipNeRFSystem(hp2).mesh.devices.size == 2
    # ...and num_devices wins when both are set.
    hp3 = tiny_hparams(**{'num_gpus': 2, 'num_devices': 4})
    assert MipNeRFSystem(hp3).mesh.devices.size == 4
    # num_gpus: 1 means "unset" (the pre-round-3 compat default baked into
    # old checkpoints' hparams.json) — old ckpts keep using all devices.
    hp4 = tiny_hparams(**{'num_gpus': 1})
    assert MipNeRFSystem(hp4).mesh.devices.size == 8


def test_real360_yaml_loads():
    cfg = config_lib.load(os.path.join(CONFIGS, 'real360.yaml'))
    assert cfg['nerf.unbounded'] is True
    assert cfg['exp_name'] == 'real360'
