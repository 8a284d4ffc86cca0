"""Learning-rate schedule.

Parity: reference utils/lr_schedule.py:51-60 (`MipLRDecay.get_lr`) —
log-linear interpolation lr_init -> lr_final over max_steps with a
sin-eased warmup scaled by lr_delay_mult over lr_delay_steps.  Here it is a
plain optax schedule function (step -> lr), traced into the update rule.
"""

from __future__ import annotations

import jax.numpy as jnp


def mip_lr_decay(lr_init: float, lr_final: float, max_steps: int,
                 lr_delay_steps: int, lr_delay_mult: float):
    """Return an optax-compatible schedule fn mapping step -> learning rate."""

    def schedule(step):
        step = jnp.asarray(step, jnp.float32)
        if lr_delay_steps > 0:
            delay_rate = lr_delay_mult + (1 - lr_delay_mult) * jnp.sin(
                0.5 * jnp.pi * jnp.clip(step / lr_delay_steps, 0, 1))
        else:
            delay_rate = 1.0
        t = jnp.clip(step / max_steps, 0, 1)
        log_lerp = jnp.exp(jnp.log(lr_init) * (1 - t) + jnp.log(lr_final) * t)
        return delay_rate * log_lerp

    return schedule
