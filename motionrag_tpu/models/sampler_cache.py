"""Adaptive denoiser-output caching for sampler loops (opt-in).

TeaCache/AdaCache-style (arXiv 2411.02397, 2506.00329): between two
denoiser calls the latents drift slowly for most of the trajectory, so a
step whose accumulated relative-L1 drift since the last REAL model call
stays under a threshold reuses the cached branch outputs via ``lax.cond``
instead of running the network. Exact protocol at threshold 0.0 (the
default everywhere); cached speedups are reported separately from protocol
benchmarks.

Used by the CogVideoX DDIM loop (models/cogvideox/scheduler.py, inline for
its segmented-carry plumbing) and both DynamiCrafter DDIM samplers.
"""

from __future__ import annotations

import jax.numpy as jnp
from jax import lax

__all__ = ["init_cache", "cached_call"]


def init_cache(latents: jnp.ndarray, n_outputs: int):
    """Initial carry: zero output slots + an infinite accumulated drift so
    the first step always computes."""
    zero = jnp.zeros_like(latents)
    return tuple(zero for _ in range(n_outputs)) + (latents, jnp.float32(jnp.inf))


def cached_call(denoise_fn, x, t, carry, threshold: float, force_compute):
    """One threshold-gated denoiser call.

    carry = (*outs, x_ref, accum) from :func:`init_cache` / a previous call.
    Returns (outs_tuple, new_carry). ``force_compute`` (traced bool) pins
    quality-critical steps (first/last) to the real model.
    """
    outs, x_ref, accum = carry[:-2], carry[-2], carry[-1]
    xf = x.astype(jnp.float32)
    rf = x_ref.astype(jnp.float32)
    rel = jnp.mean(jnp.abs(xf - rf)) / (jnp.mean(jnp.abs(rf)) + 1e-8)
    accum = accum + rel
    do = (accum >= threshold) | force_compute

    def compute(_):
        new = denoise_fn(x, t)
        new = (new,) if not isinstance(new, (tuple, list)) else tuple(new)
        return new + (x, jnp.float32(0.0))

    def reuse(_):
        return tuple(outs) + (x_ref, accum)

    res = lax.cond(do, compute, reuse, None)
    return res[:-2], res
