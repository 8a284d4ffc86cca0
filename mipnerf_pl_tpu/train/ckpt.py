"""Checkpoint management (orbax).

Replaces PL's ModelCheckpoint (reference train.py:35-40): keeps the top-k
checkpoints by `val/psnr` plus the most recent one (`save_last=True`), and
persists hparams next to the weights so eval/render CLIs can restore a model
without a config file (parity with `load_from_checkpoint`,
reference eval.py:28-31).

Layout:
  {out_dir}/ckpt/{exp_name}/
    hparams.json        # flat dotted-key config (json; tuples -> lists)
    best/<step>/state   # top-k by val/psnr (orbax StandardSave)
    last/<step>/state   # most recent (max_to_keep=1)
"""

from __future__ import annotations

import json
import os
from typing import Any, Optional, Tuple

import jax
import orbax.checkpoint as ocp


def _jsonable(hparams: dict) -> dict:
    out = {}
    for k, v in hparams.items():
        if isinstance(v, tuple):
            v = list(v)
        out[k] = v
    return out


class CheckpointManager:
    """Top-k-on-PSNR + save-last checkpointing of {params, opt_state, step}."""

    def __init__(self, ckpt_dir: str, hparams: Optional[dict] = None,
                 save_top_k: int = 2):
        self.ckpt_dir = os.path.abspath(ckpt_dir)
        os.makedirs(self.ckpt_dir, exist_ok=True)
        if hparams is not None:
            with open(os.path.join(self.ckpt_dir, 'hparams.json'), 'w') as f:
                json.dump(_jsonable(hparams), f, indent=2)
        self._best = ocp.CheckpointManager(
            os.path.join(self.ckpt_dir, 'best'),
            options=ocp.CheckpointManagerOptions(
                max_to_keep=save_top_k,
                best_fn=lambda m: m['val_psnr'],
                best_mode='max',
                create=True))
        self._last = ocp.CheckpointManager(
            os.path.join(self.ckpt_dir, 'last'),
            options=ocp.CheckpointManagerOptions(max_to_keep=1, create=True))

    def save(self, step: int, state: Any, val_psnr: Optional[float] = None):
        """Save `state` (a pytree) at `step`; rank by val_psnr when given."""
        self._last.save(step, args=ocp.args.StandardSave(state))
        if val_psnr is not None:
            self._best.save(step, args=ocp.args.StandardSave(state),
                            metrics={'val_psnr': float(val_psnr)})

    def wait(self):
        self._best.wait_until_finished()
        self._last.wait_until_finished()

    def latest_step(self) -> Optional[int]:
        return self._last.latest_step()

    @staticmethod
    def _restore_args(abstract_state: Any, partial: bool):
        """Partial restores (eval/render want {params, step} only) go through
        PyTreeRestore(partial_restore=True) so the on-disk opt_state — whose
        structure varies with train.packed_adam — is simply skipped."""
        if partial:
            return ocp.args.PyTreeRestore(item=abstract_state,
                                          partial_restore=True)
        return ocp.args.StandardRestore(abstract_state)

    def restore_last(self, abstract_state: Any,
                     partial: bool = False) -> Tuple[int, Any]:
        step = self._last.latest_step()
        assert step is not None, f'no checkpoint under {self.ckpt_dir}/last'
        state = self._last.restore(
            step, args=self._restore_args(abstract_state, partial))
        return step, state

    def restore_best(self, abstract_state: Any,
                     partial: bool = False) -> Tuple[int, Any]:
        step = self._best.best_step()
        if step is None:
            return self.restore_last(abstract_state, partial)
        state = self._best.restore(
            step, args=self._restore_args(abstract_state, partial))
        return step, state

    def close(self):
        self.wait()
        self._best.close()
        self._last.close()


def load_hparams(ckpt_path: str) -> dict:
    """Read hparams.json from a checkpoint root (or a subdirectory of one)."""
    d = os.path.abspath(ckpt_path)
    for _ in range(5):
        cand = os.path.join(d, 'hparams.json')
        if os.path.exists(cand):
            with open(cand) as f:
                h = json.load(f)
            return {k: tuple(v) if isinstance(v, list) else v
                    for k, v in h.items()}
        d = os.path.dirname(d)
    raise FileNotFoundError(f'hparams.json not found above {ckpt_path}')


def restore_for_eval(ckpt_path: str, abstract_state: Any,
                     prefer_best: bool = True) -> Tuple[int, Any]:
    """Restore a checkpointed state given the checkpoint root directory.

    Pass `system.abstract_eval_state()` ({params, step}, no opt_state) —
    the restore is partial, so it never depends on the optimizer layout the
    checkpoint was written with.  A full template still works (exact
    structural match required, as for train auto-resume)."""
    mgr = CheckpointManager(ckpt_path)
    partial = isinstance(abstract_state, dict) and \
        'opt_state' not in abstract_state
    try:
        if prefer_best:
            return mgr.restore_best(abstract_state, partial=partial)
        return mgr.restore_last(abstract_state, partial=partial)
    finally:
        mgr.close()


def replicate_to_mesh(state, mesh):
    """Place a restored (host) state replicated across a mesh."""
    from jax.sharding import NamedSharding, PartitionSpec as P
    sharding = NamedSharding(mesh, P())
    return jax.tree.map(lambda x: jax.device_put(x, sharding), state)
