"""EDM / Euler-discrete sampler for SVD, fully jitted.

The reference drives diffusers' EulerDiscreteScheduler (karras sigmas,
continuous c_noise = 0.25*log(sigma), v-style EDM preconditioning — the same
math as the training step at reference ``svd/module.py:92-98``). Here the
whole denoising loop is a ``lax.fori_loop`` inside one jit: CFG as batch-2,
per-frame guidance-scale ramp (SVD's linspace(min_guidance, max_guidance)
across frames), no host round-trips.
"""

from __future__ import annotations

import numpy as np
import jax.numpy as jnp
from jax import lax

__all__ = ["karras_sigmas", "edm_precondition", "euler_sample_loop"]


def karras_sigmas(
    num_steps: int, sigma_min: float = 0.002, sigma_max: float = 700.0, rho: float = 7.0
) -> np.ndarray:
    """Karras et al. sigma schedule, descending, with terminal 0 appended."""
    ramp = np.linspace(0, 1, num_steps)
    min_inv_rho = sigma_min ** (1 / rho)
    max_inv_rho = sigma_max ** (1 / rho)
    sigmas = (max_inv_rho + ramp * (min_inv_rho - max_inv_rho)) ** rho
    return np.concatenate([sigmas, [0.0]]).astype(np.float32)


def edm_precondition(sigma):
    """EDM c_skip / c_out / c_in / c_noise (reference svd/module.py:93-96)."""
    c_skip = 1.0 / (sigma ** 2 + 1.0)
    c_out = -sigma / jnp.sqrt(sigma ** 2 + 1.0)
    c_in = 1.0 / jnp.sqrt(sigma ** 2 + 1.0)
    c_noise = 0.25 * jnp.log(sigma)
    return c_skip, c_out, c_in, c_noise


def euler_sample_loop(
    denoise_fn,
    latents: jnp.ndarray,
    sigmas: jnp.ndarray,
    guidance_scale: jnp.ndarray | None = None,
    cache_threshold: float = 0.0,
):
    """Run the Euler ancestral-free sampling loop.

    denoise_fn(x_scaled, c_noise, sigma) -> (denoised_uncond, denoised_cond)
    or a single denoised tensor when guidance_scale is None.
    latents: [b, f, h, w, c] noise * sqrt(sigma0^2+1).
    guidance_scale: [f] per-frame CFG scale or None.
    ``cache_threshold > 0`` enables opt-in adaptive output caching
    (models/sampler_cache.py); 0.0 is bit-identical to the exact loop.
    """
    num_steps = sigmas.shape[0] - 1
    sigmas = jnp.asarray(sigmas, jnp.float32)
    n_out = 1 if guidance_scale is None else 2

    def body(i, x):
        if cache_threshold > 0.0:
            x, cache = x[0], x[1:]
        sigma = sigmas[i]
        c_skip, c_out, c_in, c_noise = edm_precondition(sigma)
        x_in = (x.astype(jnp.float32) * c_in).astype(x.dtype)
        if cache_threshold > 0.0:
            from motionrag_tpu.models.sampler_cache import cached_call

            preds, cache = cached_call(
                lambda xi, _t: denoise_fn(xi, c_noise, sigma), x_in, 0,
                cache, cache_threshold, (i == 0) | (i == num_steps - 1))
        else:
            preds = denoise_fn(x_in, c_noise, sigma)
            preds = (preds,) if n_out == 1 else tuple(preds)
        if guidance_scale is None:
            denoised = c_skip * x.astype(jnp.float32) + c_out * preds[0].astype(jnp.float32)
        else:
            pred_u, pred_c = preds
            den_u = c_skip * x.astype(jnp.float32) + c_out * pred_u.astype(jnp.float32)
            den_c = c_skip * x.astype(jnp.float32) + c_out * pred_c.astype(jnp.float32)
            g = guidance_scale[None, :, None, None, None]
            denoised = den_u + g * (den_c - den_u)
        d = (x.astype(jnp.float32) - denoised) / sigma
        x_next = x.astype(jnp.float32) + d * (sigmas[i + 1] - sigma)
        x_next = x_next.astype(x.dtype)
        if cache_threshold > 0.0:
            return (x_next,) + tuple(cache)
        return x_next

    if cache_threshold > 0.0:
        from motionrag_tpu.models.sampler_cache import init_cache

        out = lax.fori_loop(0, num_steps, body,
                            (latents,) + init_cache(latents, n_out))
        return out[0]
    return lax.fori_loop(0, num_steps, body, latents)
