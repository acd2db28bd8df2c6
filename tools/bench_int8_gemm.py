#!/usr/bin/env python
"""Int8-vs-bf16 matmul microbenchmark at CogVideoX DiT shapes.

Validates the premise of the W8A8 serving mode (ops/quant.py): the v5e MXU
executes int8 x int8 -> int32 at 2x the bf16 rate (~394 vs ~197 TOP/s peak).
Measures the full quantized-Dense path (dynamic per-token activation quant +
int8 dot + fp32 rescale) against the plain bf16 Dense at the joint-attention
token counts (17f: 6,976 tokens; 49f: 17,776) and the DiT's d=3072 /
ff=12288 projections.

Timing follows the axon-tunnel rules (CLAUDE.md): distinct inputs per
iteration, completion forced via scalar checksum.

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

    results = {}
    for (m, kdim, n) in shapes:
        key = jax.random.key(0)
        kern = jax.random.normal(key, (kdim, n), jnp.float32)
        kq, ks = quantize_kernel(kern)
        kern = kern.astype(jnp.bfloat16)
        kq, ks = jax.device_put(kq), jax.device_put(ks)

        fb = jax.jit(bf16_dense)
        fq = jax.jit(int8_dense)
        flops = 2.0 * m * kdim * n

        def timeit(fn, *consts):
            xs = [
                jax.random.normal(jax.random.key(i + 1), (m, kdim), jnp.bfloat16)
                for i in range(args.iters)
            ]
            jax.block_until_ready(xs)
            float(jnp.mean(fn(xs[0], *consts).astype(jnp.float32)))  # warm
            t0 = time.time()
            acc = 0.0
            for x in xs:
                acc += float(jnp.mean(fn(x, *consts).astype(jnp.float32)))
            dt = (time.time() - t0) / args.iters
            return dt, acc

        t_b, _ = timeit(fb, kern)
        t_q, _ = timeit(fq, kq, ks)
        results[f"{m}x{kdim}x{n}"] = {
            "bf16_ms": round(t_b * 1e3, 3),
            "int8_ms": round(t_q * 1e3, 3),
            "bf16_tflops": round(flops / t_b / 1e12, 1),
            "int8_tflops": round(flops / t_q / 1e12, 1),
            "speedup": round(t_b / t_q, 3),
        }
        print(f"{m}x{kdim}x{n}: {results[f'{m}x{kdim}x{n}']}", file=sys.stderr)

    print(json.dumps(results))


if __name__ == "__main__":
    main()
