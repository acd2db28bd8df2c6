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
):
    """Run the Euler ancestral-free sampling loop.

    denoise_fn(x_scaled, c_noise, sigma) -> (denoised_uncond, denoised_cond)
    or a single denoised tensor when guidance_scale is None.
    latents: [b, f, h, w, c] noise * sqrt(sigma0^2+1).
    guidance_scale: [f] per-frame CFG scale or None.
    """
    num_steps = sigmas.shape[0] - 1
    sigmas = jnp.asarray(sigmas, jnp.float32)

    def body(i, x):
        sigma = sigmas[i]
        c_skip, c_out, c_in, c_noise = edm_precondition(sigma)
        x_in = (x.astype(jnp.float32) * c_in).astype(x.dtype)
        if guidance_scale is None:
            pred = denoise_fn(x_in, c_noise, sigma)
            denoised = c_skip * x.astype(jnp.float32) + c_out * pred.astype(jnp.float32)
        else:
            pred_u, pred_c = denoise_fn(x_in, c_noise, sigma)
            den_u = c_skip * x.astype(jnp.float32) + c_out * pred_u.astype(jnp.float32)
            den_c = c_skip * x.astype(jnp.float32) + c_out * pred_c.astype(jnp.float32)
            g = guidance_scale[None, :, None, None, None]
            denoised = den_u + g * (den_c - den_u)
        d = (x.astype(jnp.float32) - denoised) / sigma
        x_next = x.astype(jnp.float32) + d * (sigmas[i + 1] - sigma)
        return x_next.astype(x.dtype)

    return lax.fori_loop(0, num_steps, body, latents)
