"""CogVideoX noise schedules and samplers (DDIM + DPM-Solver++ 2M), jitted.

Schedule math mirrors the reference's CogVideoXDDIMScheduler /
CogVideoXDPMScheduler (selected by config at reference
``cogvideox/module.py:28-35``): scaled-linear betas, SNR shift
(snr_shift_scale=3.0), zero-terminal-SNR rescale, v-prediction, trailing
timestep spacing. All schedule math in fp64-free fp32 islands (the reference
keeps schedule math fp32 too, SURVEY.md §7 "sampler numerical parity").
"""

from __future__ import annotations

import numpy as np
import jax.numpy as jnp
from jax import lax

__all__ = ["CogVideoXSchedule", "ddim_sample_loop", "dpm_sample_loop"]


def _rescale_zero_terminal_snr(alphas_cumprod: np.ndarray) -> np.ndarray:
    """Shift the sqrt-alphas-cumprod line so the terminal SNR is zero
    (reference lvdm ``utils_diffusion.py`` rescale_zero_terminal_snr and
    diffusers equivalent)."""
    a = np.sqrt(alphas_cumprod)
    a0, aT = a[0].copy(), a[-1].copy()
    a -= aT
    a *= a0 / (a0 - aT)
    return a ** 2


class CogVideoXSchedule:
    def __init__(
        self,
        num_train_timesteps: int = 1000,
        beta_start: float = 0.00085,
        beta_end: float = 0.012,
        snr_shift_scale: float = 3.0,
        rescale_betas_zero_snr: bool = True,
    ):
        self.num_train_timesteps = num_train_timesteps
        betas = np.linspace(
            beta_start ** 0.5, beta_end ** 0.5, num_train_timesteps, dtype=np.float64
        ) ** 2
        alphas_cumprod = np.cumprod(1.0 - betas)
        # SNR shift (CogVideoX-specific)
        alphas_cumprod = alphas_cumprod / (
            snr_shift_scale + (1.0 - snr_shift_scale) * alphas_cumprod
        )
        if rescale_betas_zero_snr:
            alphas_cumprod = _rescale_zero_terminal_snr(alphas_cumprod)
            # numerical floor at the terminal step (exact 0 breaks div)
            alphas_cumprod[-1] = 2 ** -24
        self.alphas_cumprod = jnp.asarray(alphas_cumprod, jnp.float32)

    def timesteps(self, num_inference_steps: int) -> np.ndarray:
        """trailing spacing: equally spaced from T-ish down."""
        step = self.num_train_timesteps / num_inference_steps
        ts = np.round(np.arange(self.num_train_timesteps, 0, -step)).astype(np.int64) - 1
        return ts[:num_inference_steps]

    def add_noise(self, x0, noise, t):
        a = self.alphas_cumprod[t].reshape((-1,) + (1,) * (x0.ndim - 1))
        return jnp.sqrt(a) * x0 + jnp.sqrt(1.0 - a) * noise

    def get_velocity(self, noise, x0, t):
        a = self.alphas_cumprod[t].reshape((-1,) + (1,) * (x0.ndim - 1))
        return jnp.sqrt(a) * noise - jnp.sqrt(1.0 - a) * x0

    def to_x0_eps(self, v, x, a):
        """v-prediction -> (pred_x0, pred_eps) at alpha_cumprod a."""
        sqrt_a = jnp.sqrt(a)
        sqrt_1ma = jnp.sqrt(1.0 - a)
        x0 = sqrt_a * x - sqrt_1ma * v
        eps = sqrt_a * v + sqrt_1ma * x
        return x0, eps


def ddim_sample_loop(
    schedule: CogVideoXSchedule,
    denoise_fn,
    latents: jnp.ndarray,
    num_inference_steps: int,
    guidance_scale: float = 6.0,
    use_dynamic_cfg: bool = False,
    step_range: tuple | None = None,
    cache_threshold: float = 0.0,
    cache_carry=None,
    return_cache: bool = False,
):
    """DDIM (eta=0) v-prediction loop with CFG.

    denoise_fn(x, t) -> (v_uncond, v_cond); whole loop under lax.fori_loop.
    Dynamic CFG follows the reference pipeline's cosine schedule.
    ``step_range=(lo, hi)`` runs only that slice of the schedule — used to
    split long samplers into multiple device launches (the tunneled runtime
    kills single programs running past ~60 s).

    ``cache_threshold > 0`` enables opt-in adaptive output caching
    (TeaCache/AdaCache-style, arXiv 2411.02397 / 2506.00329): the relative
    L1 drift of the latents since the last real model call accumulates, and
    while it stays under the threshold the step REUSES the cached
    (v_uncond, v_cond) via ``lax.cond`` instead of running the DiT — an
    output-level skip that trades bounded approximation for wall-clock.
    0.0 (default) is bit-identical to the exact loop. The first and final
    steps always compute. ``cache_carry``/``return_cache`` thread the cache
    across segmented launches.
    """
    ts = jnp.asarray(schedule.timesteps(num_inference_steps))
    acp = schedule.alphas_cumprod
    n = num_inference_steps

    def cfg_and_step(x, i, v_u, v_c):
        t = ts[i]
        a_t = acp[t]
        # diffusers CogVideoXDDIMScheduler.step: prev_timestep = t - T//steps
        # (NOT the next schedule entry — they differ when T/steps rounds);
        # negative -> final_alpha_cumprod = 1.0 (set_alpha_to_one)
        t_prev = t - schedule.num_train_timesteps // n
        a_prev = jnp.where(t_prev >= 0, acp[jnp.maximum(t_prev, 0)], 1.0)
        if use_dynamic_cfg:
            g = 1.0 + (guidance_scale - 1.0) * (
                (1.0 - jnp.cos(jnp.pi * ((n - t / (schedule.num_train_timesteps / n)) / n) ** 5.0)) / 2.0
            )
        else:
            g = guidance_scale
        v = v_u + g * (v_c - v_u)
        xf = x.astype(jnp.float32)
        x0, eps = schedule.to_x0_eps(v.astype(jnp.float32), xf, a_t)
        x_prev = jnp.sqrt(a_prev) * x0 + jnp.sqrt(1.0 - a_prev) * eps
        return x_prev.astype(x.dtype)

    lo, hi = step_range or (0, n)

    if cache_threshold <= 0.0:
        def body(i, x):
            v_u, v_c = denoise_fn(x, ts[i])
            return cfg_and_step(x, i, v_u, v_c)

        return lax.fori_loop(lo, hi, body, latents)

    if cache_carry is None:
        zero_v = jnp.zeros_like(latents)
        cache_carry = (zero_v, zero_v, latents, jnp.float32(jnp.inf))

    def body(i, carry):
        x, vu, vc, x_ref, accum = carry
        xf = x.astype(jnp.float32)
        rel = jnp.mean(jnp.abs(xf - x_ref.astype(jnp.float32))) / (
            jnp.mean(jnp.abs(x_ref.astype(jnp.float32))) + 1e-8
        )
        accum = accum + rel
        do_compute = (accum >= cache_threshold) | (i == 0) | (i == n - 1)

        def compute(_):
            v_u, v_c = denoise_fn(x, ts[i])
            return v_u, v_c, x, jnp.float32(0.0)

        def reuse(_):
            return vu, vc, x_ref, accum

        vu2, vc2, x_ref2, accum2 = lax.cond(do_compute, compute, reuse, None)
        x_prev = cfg_and_step(x, i, vu2, vc2)
        return x_prev, vu2, vc2, x_ref2, accum2

    out = lax.fori_loop(lo, hi, body, (latents,) + tuple(cache_carry))
    if return_cache:
        return out[0], out[1:]
    return out[0]


def dpm_sample_loop(
    schedule: CogVideoXSchedule,
    denoise_fn,
    latents: jnp.ndarray,
    num_inference_steps: int,
    guidance_scale: float = 6.0,
    rng=None,
    step_range: tuple | None = None,
    init_carry=None,
    return_carry: bool = False,
):
    """SDE-DPM-Solver++(2M) — the reference protocol's sampler
    (``configs/cogvideox/MotionRAG_open.yml:194`` sets ``scheduler: "dpm"``,
    loading diffusers' CogVideoXDPMScheduler, which is the *stochastic*
    DPM-Solver++ variant):

        x_prev = m1 * x  - m2 * D  + sqrt(1-a_prev) * sqrt(-expm1(-2h)) * z
        m1 = sqrt((1-a_prev)/(1-a_t)) * exp(-h)
        m2 = expm1(-2h) * sqrt(a_prev)                       (negative)
        D  = (1 + 1/(2r)) * x0 - 1/(2r) * x0_previous        (first step: x0)

    with lambda = log sqrt(a/(1-a)), h = lambda_prev - lambda_t,
    r = h_last / h, prev timestep = t - T//steps. The final step
    (a_prev = 1, h -> inf) reduces exactly to ``x_prev = x0`` and is
    special-cased. Per-step noise is ``fold_in(rng, i)``: segmented
    launches (``step_range``/``init_carry``) are bit-identical to one
    launch. carry = the previous step's x0 for the 2M correction.
    """
    import jax

    ts = jnp.asarray(schedule.timesteps(num_inference_steps))
    acp = schedule.alphas_cumprod
    n = num_inference_steps
    if rng is None:
        rng = jax.random.key(0)

    def lam(a):  # log sqrt(a / (1-a))
        return 0.5 * (jnp.log(a) - jnp.log1p(-a))

    def body(i, carry):
        x, prev_x0 = carry
        t = ts[i]
        a_t = acp[t]
        t_prev = t - schedule.num_train_timesteps // n
        last_step = t_prev < 0
        a_prev = jnp.where(last_step, 1.0, acp[jnp.maximum(t_prev, 0)])
        # a_prev = 1 makes lambda_prev infinite; compute with a dummy and
        # select the exact limit (x_prev = x0) at the end
        a_safe = jnp.where(last_step, jnp.float32(0.5), a_prev)

        v_u, v_c = denoise_fn(x, t)
        v = v_u + guidance_scale * (v_c - v_u)
        xf = x.astype(jnp.float32)
        x0, _ = schedule.to_x0_eps(v.astype(jnp.float32), xf, a_t)

        l_t, l_prev = lam(a_t), lam(a_safe)
        h = l_prev - l_t
        m1 = jnp.sqrt((1.0 - a_safe) / (1.0 - a_t)) * jnp.exp(-h)
        m2 = jnp.expm1(-2.0 * h) * jnp.sqrt(a_safe)

        # 2M correction from the previous step's x0 (lax.select keeps the
        # first step safe from the r=0 division)
        a_back = acp[ts[jnp.maximum(i - 1, 0)]]
        r = (l_t - lam(a_back)) / h
        corr = (1.0 + 1.0 / (2.0 * r)) * x0 - (1.0 / (2.0 * r)) * prev_x0
        d = jnp.where(i == 0, x0, corr)

        z = jax.random.normal(jax.random.fold_in(rng, i), x.shape, jnp.float32)
        noise_mult = jnp.sqrt(1.0 - a_safe) * jnp.sqrt(-jnp.expm1(-2.0 * h))
        x_prev = m1 * xf - m2 * d + noise_mult * z
        x_prev = jnp.where(last_step, x0, x_prev)
        return (x_prev.astype(x.dtype), x0)

    lo, hi = step_range or (0, n)
    carry0 = init_carry if init_carry is not None else jnp.zeros_like(latents, jnp.float32)
    out, carry = lax.fori_loop(lo, hi, body, (latents, carry0))
    return (out, carry) if return_carry else out
