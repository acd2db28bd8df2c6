"""Tensor <-> image/video conversion utilities.

Ports the *semantics* of the reference's ``src/utils/pipeline.py`` (the
[-1,1] <-> uint8 contracts used by every eval pipeline) to JAX/numpy. The
output contract for generated videos is uint8 host arrays shaped
``[b, f, c, h, w]`` (reference ``base_module.py:150-158``).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np

__all__ = [
    "denormalize",
    "normalize",
    "tensor2vid",
    "assert_video_output",
    "resize_with_antialiasing",
]


def normalize(x_uint8: jnp.ndarray, dtype=jnp.bfloat16) -> jnp.ndarray:
    """uint8 [0,255] -> dtype [-1,1]."""
    return (x_uint8.astype(jnp.float32) / 127.5 - 1.0).astype(dtype)


def denormalize(x: jnp.ndarray) -> jnp.ndarray:
    """[-1,1] float -> uint8 [0,255] (reference pipeline.py:178-184)."""
    x = jnp.clip((x.astype(jnp.float32) + 1.0) * 127.5, 0.0, 255.0)
    return jnp.round(x).astype(jnp.uint8)


def tensor2vid(latent_frames: jnp.ndarray) -> np.ndarray:
    """Device [-1,1] ``[b f c h w]`` -> host uint8 ``[b f c h w]``."""
    return np.asarray(jax.device_get(denormalize(latent_frames)))


def assert_video_output(videos: np.ndarray, batch: int | None = None) -> None:
    """Hard output-contract assertions (reference base_module.py:150-158)."""
    assert isinstance(videos, np.ndarray), f"expected host ndarray, got {type(videos)}"
    assert videos.dtype == np.uint8, f"expected uint8, got {videos.dtype}"
    assert videos.ndim == 5, f"expected [b f c h w], got shape {videos.shape}"
    assert videos.shape[2] == 3, f"expected 3 channels, got {videos.shape}"
    if batch is not None:
        assert videos.shape[0] == batch


def _gaussian_kernel1d(sigma: float, radius: int) -> np.ndarray:
    x = np.arange(-radius, radius + 1, dtype=np.float64)
    phi = np.exp(-0.5 * (x / sigma) ** 2)
    return (phi / phi.sum()).astype(np.float32)


def resize_with_antialiasing(x: jnp.ndarray, size: tuple[int, int]) -> jnp.ndarray:
    """Gaussian-blur + bilinear resize, matching the semantics of the
    reference's ``_resize_with_antialiasing`` (pipeline.py:33-59): blur with
    sigma derived from the downscale factor, then interpolate.

    x: [..., h, w] float array.
    """
    h, w = x.shape[-2], x.shape[-1]
    out_h, out_w = size
    factors = (max(h / out_h, 1.0), max(w / out_w, 1.0))
    sigmas = (max((factors[0] - 1.0) / 2.0, 0.001), max((factors[1] - 1.0) / 2.0, 0.001))
    if factors[0] > 1.0 or factors[1] > 1.0:
        radii = (max(int(2.0 * sigmas[0] + 0.5), 1), max(int(2.0 * sigmas[1] + 0.5), 1))
        kh = jnp.asarray(_gaussian_kernel1d(sigmas[0], radii[0]))
        kw = jnp.asarray(_gaussian_kernel1d(sigmas[1], radii[1]))
        orig_dtype = x.dtype
        xf = x.astype(jnp.float32)
        lead = xf.shape[:-2]
        xf = xf.reshape((-1, 1, h, w))
        xf = jnp.pad(xf, ((0, 0), (0, 0), (radii[0], radii[0]), (radii[1], radii[1])), mode="edge")
        kernel = (kh[:, None] * kw[None, :])[None, None]
        xf = jax.lax.conv_general_dilated(
            xf, kernel, (1, 1), "VALID", dimension_numbers=("NCHW", "OIHW", "NCHW")
        )
        x = xf.reshape(lead + (h, w)).astype(orig_dtype)
    return jax.image.resize(x, x.shape[:-2] + (out_h, out_w), method="bilinear")
