"""Decide the int8-QK premise: at attention shapes with contraction dim 64
(the d=64 QK^T), does the v5e int8 MXU still deliver ~2x bf16, or does the
narrow contraction erase the advantage? Overhead-cancelled in-launch scans.

If int8 [m,64]x[64,n] ~= 2x bf16, a SageAttention-style int8-QK serving mode
can break the ~98 TFLOP/s d=64 bf16 flash ceiling; if not, the idea is dead
on this chip and we document that instead.
"""
import json
import sys
import time

sys.path.insert(0, "/root/repo")
from tools.tpu_lock import tpu_lock  # noqa: E402

import jax  # noqa: E402
import jax.numpy as jnp  # noqa: E402

jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")


def measure(fn, args, n1=4, n2=24):
    def runner(n):
        @jax.jit
        def run(a, *rest):
            def step(carry, _):
                out = fn(carry, *rest)
                nxt = carry + (out[:, : carry.shape[1]] * 1e-6).astype(carry.dtype)
                return nxt, out[0, 0].astype(jnp.float32)
            carry, vals = jax.lax.scan(step, a, jnp.arange(n))
            return jnp.sum(vals) + jnp.sum(carry[0, 0].astype(jnp.float32))
        return run

    r1, r2 = runner(n1), runner(n2)
    a0 = args[0]
    perturb = lambda s: (a0 + jax.random.normal(jax.random.key(s), a0.shape).astype(a0.dtype),) + args[1:]
    float(r1(*perturb(0)))
    float(r2(*perturb(1)))
    best = float("inf")
    for r in range(2):
        t0 = time.time(); float(r1(*perturb(10 + r))); t1 = time.time() - t0
        t0 = time.time(); float(r2(*perturb(20 + r))); t2 = time.time() - t0
        best = min(best, (t2 - t1) / (n2 - n1))
    return best


def main():
    m, k, n = (int(x) for x in sys.argv[1:4]) if len(sys.argv) >= 4 else (1024, 64, 1536)
    flops = 2 * m * k * n
    key = jax.random.key(0)
    a_bf = jax.random.normal(key, (m, k), jnp.bfloat16)
    b_bf = jax.random.normal(jax.random.key(1), (k, n), jnp.bfloat16)
    b_i8 = (jax.random.normal(jax.random.key(2), (k, n)) * 10).astype(jnp.int8)

    dt = measure(lambda a, b: jax.lax.dot(a, b, preferred_element_type=jnp.float32),
                 (a_bf, b_bf))
    print(json.dumps({"mode": "bf16", "mkn": [m, k, n], "us": round(dt * 1e6, 1),
                      "tflops": round(flops / dt / 1e12, 1)}), flush=True)

    def int8_mm(a_bf16, b):  # quantize a per-row, s8xs8->s32
        scale = jnp.max(jnp.abs(a_bf16.astype(jnp.float32)), axis=1, keepdims=True) / 127.0
        a_q = jnp.round(a_bf16.astype(jnp.float32) / scale).astype(jnp.int8)
        acc = jax.lax.dot(a_q, b, preferred_element_type=jnp.int32)
        return acc.astype(jnp.float32) * scale

    dt = measure(int8_mm, (a_bf, b_i8))
    print(json.dumps({"mode": "int8(w8a8+quant)", "mkn": [m, k, n],
                      "us": round(dt * 1e6, 1),
                      "tflops": round(flops / dt / 1e12, 1)}), flush=True)

    def int8_pure(a, b):  # pre-quantized both sides: the raw MXU rate
        return jax.lax.dot(a, b, preferred_element_type=jnp.int32)

    a_i8 = (jax.random.normal(jax.random.key(3), (m, k)) * 10).astype(jnp.int8)
    dt = measure(int8_pure, (a_i8, b_i8))
    print(json.dumps({"mode": "int8(pure)", "mkn": [m, k, n],
                      "us": round(dt * 1e6, 1),
                      "tflops": round(flops / dt / 1e12, 1)}), flush=True)


if __name__ == "__main__":
    with tpu_lock():
        main()
