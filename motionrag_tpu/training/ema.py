"""EMA of parameters with num_updates decay ramp (reference
``lvdm/ema.py:5-75``): decay_t = min(decay, (1+t)/(10+t))."""

from __future__ import annotations

import jax
import jax.numpy as jnp

__all__ = ["ema_init", "ema_update"]


def ema_init(params):
    return jax.tree.map(lambda x: x.astype(jnp.float32), params)


def ema_update(ema_params, params, step: jnp.ndarray, decay: float = 0.9999):
    d = jnp.minimum(decay, (1.0 + step) / (10.0 + step))
    return jax.tree.map(
        lambda e, p: e * d + p.astype(jnp.float32) * (1.0 - d), ema_params, params
    )
