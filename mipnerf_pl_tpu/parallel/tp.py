"""Tensor parallelism for the MipNeRF MLP over the mesh's `model` axis.

The reference has no TP (SURVEY.md §2.3 — DP only, and at a 256-wide trunk
TP buys nothing on one host).  It exists here so wider MLPs scale beyond a
chip's MXU/HBM: the trunk follows the Megatron pairing — even-indexed
layers column-parallel (kernel sharded on the output dim), odd-indexed
layers row-parallel (kernel sharded on the input dim) — expressed purely as
`NamedSharding`s on the parameter pytree.  XLA GSPMD derives the
activation shardings and inserts the psum/all-gather collectives over ICI;
there is no hand-written collective code.

Usage:
    shardings = mlp_param_shardings(params, mesh)
    params = jax.device_put(params, shardings)
    # any jit over these params now runs DPxTP on the mesh.
"""

from __future__ import annotations

import re
from typing import Any

import jax
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P


def _spec_for(path: str, leaf) -> P:
    """PartitionSpec for one MLP parameter by its flax path.

    Kernels are [in, out].  Column-parallel -> P(None, 'model');
    row-parallel -> P('model', None); 1-D biases follow the output dim of
    their layer (sharded only for column-parallel layers).
    """
    if leaf.ndim == 0:
        return P()

    m = re.search(r"trunk_(\d+)", path)
    if m is not None:
        i = int(m.group(1))
        col = (i % 2 == 0)  # trunk_0 col-parallel, trunk_1 row-parallel, ...
        if leaf.ndim == 2:
            return P(None, 'model') if col else P('model', None)
        return P('model') if col else P()

    if 'bottleneck' in path or re.search(r"view_\d+", path):
        # Column-parallel (output dim sharded): the fat [W, W] / [W+Fv, Wv]
        # matmuls split across chips; the tiny rgb/density heads downstream
        # read the gathered activations (an all-gather GSPMD inserts —
        # acceptable at head width 3/1).
        if leaf.ndim == 2:
            return P(None, 'model')
        return P('model')

    # density / rgb heads: tiny output dims — replicate.
    return P()


def mlp_param_shardings(params: Any, mesh: Mesh):
    """NamedSharding pytree for a MipNerf param tree (Megatron-style TP).

    Works on both concrete params and `jax.eval_shape` abstract trees.
    """
    flat, treedef = jax.tree_util.tree_flatten_with_path(params)
    shardings = []
    for path, leaf in flat:
        path_str = '/'.join(str(p) for p in path)
        shardings.append(NamedSharding(mesh, _spec_for(path_str, leaf)))
    return jax.tree_util.tree_unflatten(treedef, shardings)


def shard_params_tp(params: Any, mesh: Mesh):
    """Place params on the mesh with TP shardings."""
    return jax.device_put(params, mlp_param_shardings(params, mesh))
