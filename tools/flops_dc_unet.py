#!/usr/bin/env python
"""Count DC UNet3D forward FLOPs at the protocol shape via XLA cost analysis
(CPU lowering, no execution) and derive MXU utilization from the measured
sampler wall-clock. Diagnostic for where the headline has headroom."""
import sys

sys.path.insert(0, "/root/repo")

import jax
import jax.numpy as jnp

jax.config.update("jax_platforms", "cpu")

from motionrag_tpu.models.dynamicrafter.unet3d import UNet3D

unet = UNet3D(dtype=jnp.bfloat16)  # DynamiCrafter-1024 scale defaults
b, t, h, w = 1, 16, 72, 128
x = jax.ShapeDtypeStruct((b, t, h, w, 8), jnp.bfloat16)
ts = jax.ShapeDtypeStruct((b,), jnp.int32)
ctx = {
    "prompt": jax.ShapeDtypeStruct((b, 77, 1024), jnp.bfloat16),
    "image": jax.ShapeDtypeStruct((b, t * 16, 1024), jnp.bfloat16),
}
fs = jax.ShapeDtypeStruct((b,), jnp.int32)

params = jax.eval_shape(
    lambda: unet.init(jax.random.key(0),
                      jnp.zeros((b, t, h, w, 8), jnp.bfloat16),
                      jnp.zeros((b,), jnp.int32),
                      {"prompt": jnp.zeros((b, 77, 1024), jnp.bfloat16),
                       "image": jnp.zeros((b, t * 16, 1024), jnp.bfloat16)},
                      jnp.zeros((b,), jnp.int32)))

lowered = jax.jit(lambda p, x, ts, ctx, fs: unet.apply(p, x, ts, ctx, fs)).lower(
    params, x, ts, ctx, fs)
ca = lowered.cost_analysis()
flops = ca.get("flops", float("nan"))
bytes_ = ca.get("bytes accessed", float("nan"))
print(f"forward flops: {flops/1e12:.2f} TFLOP")
print(f"bytes accessed (unfused estimate): {bytes_/2**30:.1f} GiB")
n_fwd = 31 * 2  # 31 uniform DDIM steps x dual-CFG forwards
meas_s = 49.4  # bench_full queue measurement (includes VAE decode ~small)
print(f"sampler total: {flops*n_fwd/1e12:.1f} TFLOP over {meas_s}s "
      f"-> {flops*n_fwd/meas_s/1e12:.1f} TFLOP/s avg "
      f"({flops*n_fwd/meas_s/1e12/197*100:.0f}% of v5e bf16 peak)")
