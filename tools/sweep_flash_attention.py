"""Flash-attention block sweep at the CogVideoX 49f 720p joint-attention
shape (226 text + 17550 video = 17776 tokens, 48 heads, d=64, batch 1),
plus the jax.experimental.pallas reference flash as a public comparator.
Run alone on the TPU (serialize with other TPU work); shapes overridable:

    python tools/sweep_flash_attention.py [B H S D]
"""
import os
import sys
import time

import jax
import jax.numpy as jnp

sys.path.insert(0, "/root/repo")
jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")

from motionrag_tpu.ops.flash_attention import flash_attention

b, h, s, d = (int(x) for x in sys.argv[1:5]) if len(sys.argv) >= 5 else (1, 48, 17776, 64)
flops = 4 * s * s * d * h  # fwd QK^T + PV

q = jax.random.normal(jax.random.key(0), (b, h, s, d), jnp.bfloat16)
k = jax.random.normal(jax.random.key(1), (b, h, s, d), jnp.bfloat16)
v = jax.random.normal(jax.random.key(2), (b, h, s, d), jnp.bfloat16)

configs = [(None, None)] + [
    (bq, bk) for bq in (512, 1024, 2048) for bk in (1024, 1536, 2048, 4096)
]
for bq, bk in configs:
    if bq is None:
        os.environ.pop("MRT_FLASH_BQ", None)
        os.environ.pop("MRT_FLASH_BK", None)
    else:
        os.environ["MRT_FLASH_BQ"] = str(bq)
        os.environ["MRT_FLASH_BK"] = str(bk)
    try:
        f = jax.jit(lambda q, k, v: flash_attention(q, k, v))
        float(jnp.mean(f(q, k, v).astype(jnp.float32)))  # compile+complete
        # distinct inputs per timing rep (tunnel dedups identical launches)
        t0 = time.time()
        reps = 3
        for i in range(1, reps + 1):
            float(jnp.mean(f(q + i * 1e-3, k, v).astype(jnp.float32)))
        dt = (time.time() - t0) / reps
        print(f"bq={bq} bk={bk}: {dt*1e3:.1f} ms  {flops/dt/1e12:.1f} TFLOP/s",
              flush=True)
    except Exception as e:  # noqa: BLE001
        print(f"bq={bq} bk={bk}: FAIL {str(e)[:120]}", flush=True)

# -- public comparator: jax.experimental.pallas reference flash ------------
try:
    from jax.experimental.pallas.ops.tpu.flash_attention import (
        BlockSizes, flash_attention as jax_flash)

    for bq, bk in ((512, 1024), (1024, 1024), (1024, 2048)):
        try:
            bs = BlockSizes(block_q=bq, block_k_major=bk, block_k=bk,
                            block_b=1,
                            block_q_major_dkv=bq, block_k_major_dkv=bk,
                            block_k_dkv=bk, block_q_dkv=bq,
                            block_k_major_dq=bk, block_k_dq=bk,
                            block_q_dq=bq)
            f = jax.jit(lambda q, k, v: jax_flash(
                q, k, v, sm_scale=d ** -0.5, block_sizes=bs))
            float(jnp.mean(f(q, k, v).astype(jnp.float32)))
            t0 = time.time()
            reps = 3
            for i in range(1, reps + 1):
                float(jnp.mean(f(q + i * 1e-3, k, v).astype(jnp.float32)))
            dt = (time.time() - t0) / reps
            print(f"jax-ref bq={bq} bk={bk}: {dt*1e3:.1f} ms  "
                  f"{flops/dt/1e12:.1f} TFLOP/s", flush=True)
        except Exception as e:  # noqa: BLE001
            print(f"jax-ref bq={bq} bk={bk}: FAIL {str(e)[:120]}", flush=True)
except ImportError:
    print("jax reference flash unavailable", flush=True)
