"""lvdm-style diffusion schedule + jitted DDIM sampler for DynamiCrafter.

Math mirrors the vendored lvdm stack (reference file:line cited per piece):
  - linear beta schedule (``utils_diffusion.py`` make_beta_schedule),
  - optional zero-terminal-SNR rescale (``ddpm3d.py:141-142``),
  - dynamic latent rescale ``scale_arr`` = concat(linspace(1, base, 400),
    const) (``ddpm3d.py:536-541``), with the x0 correction inside the DDIM
    step (``ddim.py:280-284``),
  - v-parameterization recovery of eps/x0 (``ddim.py:249-252, 275-278``),
  - uniform / uniform_trailing timestep spacing (``utils_diffusion.py:56-64``),
  - batched-2x CFG with optional guidance rescale (``ddim.py:218-247``).

All schedule math stays in fp32 (the reference keeps it fp32 too —
SURVEY.md §7 "sampler numerical parity").
"""

from __future__ import annotations

import numpy as np
import jax.numpy as jnp
from jax import lax

__all__ = ["LVDMSchedule", "ddim_sample", "ddim_sample_dual_cfg"]


def make_beta_schedule(n: int, linear_start=0.00085, linear_end=0.012) -> np.ndarray:
    return (
        np.linspace(linear_start ** 0.5, linear_end ** 0.5, n, dtype=np.float64) ** 2
    )


def rescale_zero_terminal_snr(betas: np.ndarray) -> np.ndarray:
    alphas = 1.0 - betas
    acp = np.cumprod(alphas)
    a = np.sqrt(acp)
    a0, aT = a[0].copy(), a[-1].copy()
    a -= aT
    a *= a0 / (a0 - aT)
    acp = a ** 2
    alphas = acp[1:] / acp[:-1]
    alphas = np.concatenate([acp[0:1], alphas])
    return 1.0 - alphas


class LVDMSchedule:
    def __init__(
        self,
        num_timesteps: int = 1000,
        linear_start: float = 0.00085,
        linear_end: float = 0.012,
        rescale_betas_zero_snr: bool = False,
        use_dynamic_rescale: bool = False,
        base_scale: float = 0.3,
        turning_step: int = 400,
    ):
        betas = make_beta_schedule(num_timesteps, linear_start, linear_end)
        if rescale_betas_zero_snr:
            betas = rescale_zero_terminal_snr(betas)
        # zero-terminal-SNR makes acp[-1] EXACTLY 0 (the point of the
        # rescale); do not clip — v-param math never divides by acp
        acp = np.cumprod(1.0 - betas)
        self.num_timesteps = num_timesteps
        self.alphas_cumprod = jnp.asarray(acp, jnp.float32)
        self.use_dynamic_rescale = use_dynamic_rescale
        if use_dynamic_rescale:
            arr = np.concatenate(
                [np.linspace(1.0, base_scale, turning_step), np.full(num_timesteps, base_scale)]
            )[:num_timesteps]
            self.scale_arr = jnp.asarray(arr, jnp.float32)
        else:
            self.scale_arr = jnp.ones((num_timesteps,), jnp.float32)

    # -- training helpers (ddpm3d q_sample / v-param) ----------------------

    def _gather(self, arr, t, ndim):
        return arr[t].reshape((-1,) + (1,) * (ndim - 1))

    def q_sample(self, x0, noise, t):
        """Forward diffusion with the dynamic rescale applied to x0
        (reference ``ddpm3d.py:736``)."""
        a = self._gather(self.alphas_cumprod, t, x0.ndim)
        s = self._gather(self.scale_arr, t, x0.ndim)
        return jnp.sqrt(a) * (x0 * s) + jnp.sqrt(1.0 - a) * noise

    def get_v(self, x0, noise, t):
        a = self._gather(self.alphas_cumprod, t, x0.ndim)
        return jnp.sqrt(a) * noise - jnp.sqrt(1.0 - a) * x0

    def predict_eps_from_v(self, x, v, a):
        return jnp.sqrt(a) * v + jnp.sqrt(1.0 - a) * x

    def predict_x0_from_v(self, x, v, a):
        return jnp.sqrt(a) * x - jnp.sqrt(1.0 - a) * v

    def ddim_timesteps(self, num_steps: int, method: str = "uniform_trailing") -> np.ndarray:
        n = self.num_timesteps
        if method == "uniform":
            c = n // num_steps
            ts = np.arange(0, n, c) + 1
        elif method == "uniform_trailing":
            c = n / num_steps
            ts = np.flip(np.round(np.arange(n, 0, -c))).astype(np.int64) - 1
        else:
            raise ValueError(method)
        return np.clip(ts, 0, n - 1)


def _rescale_noise_cfg(noise_cfg, noise_pred_text, guidance_rescale):
    """reference lvdm ``utils_diffusion.py`` rescale_noise_cfg."""
    axes = tuple(range(1, noise_cfg.ndim))
    # torch Tensor.std applies Bessel's correction (ddof=1)
    std_text = jnp.std(noise_pred_text, axis=axes, keepdims=True, ddof=1)
    std_cfg = jnp.std(noise_cfg, axis=axes, keepdims=True, ddof=1)
    rescaled = noise_cfg * (std_text / jnp.maximum(std_cfg, 1e-8))
    return guidance_rescale * rescaled + (1.0 - guidance_rescale) * noise_cfg


def ddim_sample(
    schedule: LVDMSchedule,
    denoise_fn,
    latents: jnp.ndarray,
    num_steps: int,
    guidance_scale: float = 7.5,
    guidance_rescale: float = 0.0,
    parameterization: str = "v",
    timestep_spacing: str = "uniform_trailing",
    eta: float = 0.0,
    rng=None,
    cache_threshold: float = 0.0,
):
    """DDIM loop under lax.fori_loop.

    denoise_fn(x, t) -> (pred_cond, pred_uncond); latents [b, t, h, w, c].
    ``eta > 0`` is the ancestral DDIM the reference's DC eval actually runs
    (its pipeline wrapper defaults ddim_eta=1.0, pipelines/pipeline.py:28):
    sigma_t = eta*sqrt((1-a_prev)/(1-a_t)*(1-a_t/a_prev)) per lvdm
    make_ddim_sampling_parameters, per-step noise from fold_in(rng, i).
    eta=0 traces the exact noise-free loop (unchanged HLO).
    ``cache_threshold > 0`` enables opt-in adaptive output caching
    (models/sampler_cache.py); 0.0 is bit-identical to the exact loop.
    """
    ts_np = schedule.ddim_timesteps(num_steps, timestep_spacing)
    ts = jnp.asarray(ts_np)
    acp = schedule.alphas_cumprod
    scale_arr = schedule.scale_arr
    # 'uniform' spacing can yield ceil(n/c) entries (one more than requested)
    # -- the reference iterates over ALL of them (make_ddim_timesteps)
    n = len(ts_np)

    def body(i, x):
        idx = n - 1 - i  # descending through the ddim steps
        t = ts[idx]
        a_t = acp[t]
        # reference boundary (make_ddim_sampling_parameters): the final step
        # (index 0) uses alphas_cumprod[0] / scale_arr[ts[0]], NOT 1.0
        a_prev = jnp.where(idx > 0, acp[ts[jnp.maximum(idx - 1, 0)]], acp[0])

        if cache_threshold > 0.0:
            x, cache = x[0], x[1:]
            from motionrag_tpu.models.sampler_cache import cached_call

            (pred_c, pred_u), cache = cached_call(
                denoise_fn, x, t, cache, cache_threshold,
                (i == 0) | (i == n - 1))
        else:
            pred_c, pred_u = denoise_fn(x, t)
        model_out = pred_u + guidance_scale * (pred_c - pred_u)
        if guidance_rescale > 0.0:
            model_out = _rescale_noise_cfg(model_out, pred_c, guidance_rescale)
        xf = x.astype(jnp.float32)
        mo = model_out.astype(jnp.float32)

        if parameterization == "v":
            e_t = schedule.predict_eps_from_v(xf, mo, a_t)
            pred_x0 = schedule.predict_x0_from_v(xf, mo, a_t)
        else:
            e_t = mo
            pred_x0 = (xf - jnp.sqrt(1.0 - a_t) * e_t) / jnp.sqrt(
                jnp.maximum(a_t, 2.0 ** -24)
            )

        if schedule.use_dynamic_rescale:
            scale_t = scale_arr[t]
            prev_scale = jnp.where(
                idx > 0, scale_arr[ts[jnp.maximum(idx - 1, 0)]], scale_arr[ts[0]]
            )
            pred_x0 = pred_x0 * (prev_scale / scale_t)

        if eta > 0.0:
            import jax

            sigma = eta * jnp.sqrt(
                (1.0 - a_prev) / (1.0 - a_t) * (1.0 - a_t / a_prev)
            )
            dir_xt = jnp.sqrt(jnp.maximum(1.0 - a_prev - sigma ** 2, 0.0)) * e_t
            z = jax.random.normal(
                jax.random.fold_in(rng_key, i), x.shape, jnp.float32
            )
            x_prev = jnp.sqrt(a_prev) * pred_x0 + dir_xt + sigma * z
        else:
            dir_xt = jnp.sqrt(1.0 - a_prev) * e_t
            x_prev = jnp.sqrt(a_prev) * pred_x0 + dir_xt
        x_prev = x_prev.astype(x.dtype)
        if cache_threshold > 0.0:
            return (x_prev,) + tuple(cache)
        return x_prev

    if eta > 0.0:
        import jax

        rng_key = rng if rng is not None else jax.random.key(0)

    if cache_threshold > 0.0:
        from motionrag_tpu.models.sampler_cache import init_cache

        out = lax.fori_loop(0, n, body, (latents,) + init_cache(latents, 2))
        return out[0]
    return lax.fori_loop(0, n, body, latents)


def ddim_sample_dual_cfg(
    schedule: LVDMSchedule,
    denoise_fn3,
    latents: jnp.ndarray,
    num_steps: int,
    text_guidance_scale: float = 7.5,
    image_guidance_scale: float = 1.0,
    guidance_rescale: float = 0.0,
    timestep_spacing: str = "uniform_trailing",
    eta: float = 0.0,
    rng=None,
    cache_threshold: float = 0.0,
):
    """Dual-CFG DDIM (reference ``lvdm/models/samplers/ddim_multiplecond.py``):
    text and image guidance applied separately,

        out = e_uc + s_img * (e_img_only - e_uc) + s_txt * (e_full - e_img_only)

    denoise_fn3(x, t) -> (pred_full, pred_img_only, pred_uncond), typically a
    batched-3x model call. ``eta`` as in :func:`ddim_sample` (the reference
    wrapper defaults ddim_eta=1.0).
    """
    ts_np = schedule.ddim_timesteps(num_steps, timestep_spacing)
    ts = jnp.asarray(ts_np)
    acp = schedule.alphas_cumprod
    scale_arr = schedule.scale_arr
    n = len(ts_np)

    def body(i, x):
        idx = n - 1 - i
        t = ts[idx]
        a_t = acp[t]
        a_prev = jnp.where(idx > 0, acp[ts[jnp.maximum(idx - 1, 0)]], acp[0])

        if cache_threshold > 0.0:
            x, cache = x[0], x[1:]
            from motionrag_tpu.models.sampler_cache import cached_call

            (pred_full, pred_img, pred_uc), cache = cached_call(
                denoise_fn3, x, t, cache, cache_threshold,
                (i == 0) | (i == n - 1))
        else:
            pred_full, pred_img, pred_uc = denoise_fn3(x, t)
        model_out = (
            pred_uc
            + image_guidance_scale * (pred_img - pred_uc)
            + text_guidance_scale * (pred_full - pred_img)
        )
        if guidance_rescale > 0.0:
            model_out = _rescale_noise_cfg(model_out, pred_full, guidance_rescale)
        xf = x.astype(jnp.float32)
        mo = model_out.astype(jnp.float32)
        e_t = schedule.predict_eps_from_v(xf, mo, a_t)
        pred_x0 = schedule.predict_x0_from_v(xf, mo, a_t)
        if schedule.use_dynamic_rescale:
            prev_scale = jnp.where(
                idx > 0, scale_arr[ts[jnp.maximum(idx - 1, 0)]], scale_arr[ts[0]]
            )
            pred_x0 = pred_x0 * (prev_scale / scale_arr[t])
        if eta > 0.0:
            import jax

            sigma = eta * jnp.sqrt(
                (1.0 - a_prev) / (1.0 - a_t) * (1.0 - a_t / a_prev)
            )
            dir_xt = jnp.sqrt(jnp.maximum(1.0 - a_prev - sigma ** 2, 0.0)) * e_t
            z = jax.random.normal(
                jax.random.fold_in(rng_key, i), x.shape, jnp.float32
            )
            x_prev = jnp.sqrt(a_prev) * pred_x0 + dir_xt + sigma * z
        else:
            x_prev = jnp.sqrt(a_prev) * pred_x0 + jnp.sqrt(1.0 - a_prev) * e_t
        x_prev = x_prev.astype(x.dtype)
        if cache_threshold > 0.0:
            return (x_prev,) + tuple(cache)
        return x_prev

    if eta > 0.0:
        import jax

        rng_key = rng if rng is not None else jax.random.key(0)

    if cache_threshold > 0.0:
        from motionrag_tpu.models.sampler_cache import init_cache

        out = lax.fori_loop(0, n, body, (latents,) + init_cache(latents, 3))
        return out[0]
    return lax.fori_loop(0, n, body, latents)
