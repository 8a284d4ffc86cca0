"""Packed single-buffer Adam.

optax.adam runs its update per parameter leaf; inside the K-step
`lax.scan` trainer that is ~3 fusions for each of the MLP's ~36
kernels/biases — dozens of micro-launches of a few KB each, pure
per-fusion overhead on TPU (the whole parameter set is only ~2.4 MB).
`packed_adam` keeps the first/second moments as ONE flat f32 vector and
applies the update as a single fused elementwise chain over it: the
grads are raveled (one concat of donated buffers), updated, and the step
is unraveled back into the parameter tree.  Semantics match optax.adam
(same bias correction, same eps placement, same schedule stepping) to
float rounding — pinned by tests/test_opt.py.

Not used when parallel.model_axis > 1: raveling would merge leaves that
carry different `model`-axis shardings into one replicated vector,
silently all-gathering TP-sharded parameters (train/system.py guards).

Reference analog: the torch Adam step in nerf_system.py:123-131
(configure_optimizers) — torch fuses this via multi_tensor_apply;
this is the XLA-native equivalent.
"""

from __future__ import annotations

import jax.numpy as jnp
import optax
from jax.flatten_util import ravel_pytree


def packed_adam(learning_rate, b1: float = 0.9, b2: float = 0.999,
                eps: float = 1e-8) -> optax.GradientTransformation:
    """Adam over one flat parameter vector; optax-compatible transform.

    `learning_rate` may be a schedule fn (step -> lr) or a float; schedule
    stepping matches optax.scale_by_schedule (step k uses schedule(k),
    0-indexed), while the bias correction uses k+1 like optax.scale_by_adam.
    """

    def init_fn(params):
        flat, _ = ravel_pytree(params)
        # Two distinct buffers: donation rejects a state pytree whose
        # leaves alias the same buffer (`donate(a), donate(a)`).
        return {'count': jnp.zeros((), jnp.int32),
                'mu': jnp.zeros_like(flat), 'nu': jnp.zeros_like(flat)}

    def update_fn(updates, state, params=None):
        del params
        g, unravel = ravel_pytree(updates)
        count = state['count'] + 1
        mu = state['mu'] * b1 + g * (1.0 - b1)
        nu = state['nu'] * b2 + g * g * (1.0 - b2)
        c = count.astype(jnp.float32)
        mu_hat = mu / (1.0 - b1 ** c)
        nu_hat = nu / (1.0 - b2 ** c)
        lr = (learning_rate(state['count']) if callable(learning_rate)
              else learning_rate)
        step = (-lr) * mu_hat / (jnp.sqrt(nu_hat) + eps)
        return unravel(step), {'count': count, 'mu': mu, 'nu': nu}

    return optax.GradientTransformation(init_fn, update_fn)
