"""Small shared helpers (reference ``src/utils/common.py``)."""

from __future__ import annotations

import jax.numpy as jnp

__all__ = ["tensor2latent"]


def tensor2latent(video: jnp.ndarray, vae, params, scaling: bool = True) -> jnp.ndarray:
    """[-1,1] ``[b, f, c, h, w]`` -> latents ``[b, f, h/8, w/8, z]``
    (reference ``common.py:4-14``: per-frame VAE encode x scale)."""
    b, f, c, h, w = video.shape
    frames = video.reshape(b * f, c, h, w).transpose(0, 2, 3, 1)
    z = vae.apply(params, frames, method="encode")
    if scaling and hasattr(vae, "scaling_factor"):
        z = z * vae.scaling_factor
    return z.reshape(b, f, z.shape[1], z.shape[2], z.shape[3])
