#!/usr/bin/env python
"""Int8-vs-bf16 matmul microbenchmark at CogVideoX DiT shapes.

Validates the premise of the W8A8 serving mode (ops/quant.py): the v5e MXU
executes int8 x int8 -> int32 at 2x the bf16 rate (~394 vs ~197 TOP/s peak).
Measures the full quantized-Dense path (dynamic per-token activation quant +
int8 dot + fp32 rescale) against the plain bf16 Dense at the joint-attention
token counts (17f: 6,976 tokens; 49f: 17,776) and the DiT's d=3072 /
ff=12288 projections.

Timing follows the axon-tunnel rules (CLAUDE.md): distinct inputs per
iteration, completion forced via scalar checksum. The per-launch tunnel
overhead (~43 ms) would swamp single-GEMM calls (6976x3072x3072 bf16 is
~0.7 ms of MXU time), so each measurement scans over a stack of distinct
inputs INSIDE one launch, and the per-iteration time is the difference
between a large and a small stack — constant launch overhead cancels.

Usage: python tools/bench_int8_gemm.py [--small]
"""

import argparse
import json
import sys
import time

sys.path.insert(0, "/root/repo")


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--small", action="store_true", help="tiny CPU smoke sizes")
    ap.add_argument("--iters", type=int, default=8)
    args = ap.parse_args()

    import jax
    import jax.numpy as jnp

    if args.small:
        jax.config.update("jax_platforms", "cpu")

    from motionrag_tpu.ops.quant import quantize_kernel

    if args.small:
        shapes = [(64, 32, 48)]
    else:
        # (tokens, d_in, d_out): qkv+out proj and the two FF projections at
        # 17f and 49f joint-attention lengths
        shapes = [
            (6976, 3072, 3072),
            (6976, 3072, 12288),
            (17776, 3072, 3072),
            (17776, 3072, 12288),
        ]

    def bf16_dense(x, k):
        return jax.lax.dot_general(
            x, k, (((1,), (0,)), ((), ())), preferred_element_type=jnp.float32
        ).astype(jnp.bfloat16)

    def int8_dense(x, kq, ks):
        xf = x.astype(jnp.float32)
        a = jnp.maximum(jnp.max(jnp.abs(xf), axis=-1, keepdims=True), 1e-8) / 127.0
        xq = jnp.clip(jnp.round(xf / a), -127, 127).astype(jnp.int8)
        y = jax.lax.dot_general(
            xq, kq, (((1,), (0,)), ((), ())), preferred_element_type=jnp.int32
        )
        return (y.astype(jnp.float32) * a * ks).astype(jnp.bfloat16)

    def int8_pallas(x, kq, ks):
        from motionrag_tpu.ops.int8_matmul import int8_matmul_dequant

        xf = x.astype(jnp.float32)
        a = jnp.maximum(jnp.max(jnp.abs(xf), axis=-1, keepdims=True), 1e-8) / 127.0
        xq = jnp.clip(jnp.round(xf / a), -127, 127).astype(jnp.int8)
        blocks = ({"block_m": x.shape[0], "block_n": kq.shape[1],
                   "block_k": kq.shape[0]} if args.small else {})
        return int8_matmul_dequant(xq, kq, a, ks, None,
                                   out_dtype=jnp.bfloat16,
                                   interpret=args.small, **blocks)

    results = {}
    for (m, kdim, n) in shapes:
        key = jax.random.key(0)
        kern = jax.random.normal(key, (kdim, n), jnp.float32)
        kq, ks = quantize_kernel(kern)
        kern = kern.astype(jnp.bfloat16)
        kq, ks = jax.device_put(kq), jax.device_put(ks)

        flops = 2.0 * m * kdim * n
        n_small, n_large = args.iters, 4 * args.iters

        def timeit(fn, *consts):
            # one launch scans the whole stack; checksum forces completion
            @jax.jit
            def scan_fn(xs, *cs):
                def body(acc, x):
                    y = fn(x, *cs)
                    return acc + jnp.sum(y.astype(jnp.float32)), None
                acc, _ = jax.lax.scan(body, jnp.float32(0.0), xs)
                return acc

            def stack(count, salt):
                return jax.random.normal(
                    jax.random.key(salt), (count, m, kdim), jnp.bfloat16)

            def run(count, salt):
                xs = stack(count, salt)
                jax.block_until_ready(xs)
                t0 = time.time()
                float(scan_fn(xs, *consts))
                return time.time() - t0

            run(n_small, 1)  # warm both executables (distinct scan lengths)
            run(n_large, 2)
            t_s = run(n_small, 3)
            t_l = run(n_large, 4)
            return max(t_l - t_s, 1e-9) / (n_large - n_small)

        t_b = timeit(bf16_dense, kern)
        t_q = timeit(int8_dense, kq, ks)
        try:
            t_p = timeit(int8_pallas, kq, ks)
        except Exception as e:  # noqa: BLE001
            print(f"pallas int8 failed at {m}x{kdim}x{n}: {str(e)[:200]}",
                  file=sys.stderr)
            t_p = float("nan")
        results[f"{m}x{kdim}x{n}"] = {
            "bf16_ms": round(t_b * 1e3, 3),
            "int8_ms": round(t_q * 1e3, 3),
            "int8_pallas_ms": round(t_p * 1e3, 3),
            "bf16_tflops": round(flops / t_b / 1e12, 1),
            "int8_tflops": round(flops / t_q / 1e12, 1),
            "int8_pallas_tflops": round(flops / t_p / 1e12, 1),
            "speedup": round(t_b / t_q, 3),
            "pallas_speedup": round(t_b / t_p, 3),
        }
        print(f"{m}x{kdim}x{n}: {results[f'{m}x{kdim}x{n}']}", file=sys.stderr)

    print(json.dumps(results))


if __name__ == "__main__":
    import os
    import sys as _sys
    _sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
    from tools.tpu_lock import tpu_lock

    with tpu_lock():
        main()
