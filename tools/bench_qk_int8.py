"""Decide the int8-QK premise: at attention shapes with contraction dim 64
(the d=64 QK^T), does the v5e int8 MXU still deliver ~2x bf16, or does the
narrow contraction erase the advantage? Overhead-cancelled in-launch scans.

Measures BOTH the XLA rate and the Mosaic/Pallas rate at QK tile geometry
([bm, 64] x [64, n]) — the flash kernel can only use what Mosaic lowers
well (round-2 data: pallas int8 at k=3072 ran at 0.7-0.9x XLA bf16, so the
XLA int8 rate does NOT transfer automatically).

If pallas int8 [bm,64]x[64,n] >~ 1.5x pallas bf16, a SageAttention-style
int8-QK serving mode can break the d=64 bf16 flash ceiling; if not, the
idea is dead on this chip and we document that instead.

Round-3 fix: the first version of this harness fed int8 carries perturbed
by +out*1e-6 (rounds to zero -> identical executions -> de-duped by the
axon tunnel -> negative differenced times) at a 1024x128x1536 shape too
small for launch-jitter cancellation. Perturb int8 via XOR with the step
index and use ~GFLOP-scale steps instead.
"""
import functools
import json
import sys
import time

sys.path.insert(0, "/root/repo")
from tools.tpu_lock import tpu_lock  # noqa: E402

import jax  # noqa: E402
import jax.numpy as jnp  # noqa: E402
from jax.experimental import pallas as pl  # noqa: E402
from jax.experimental.pallas import tpu as pltpu  # noqa: E402

jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")


def measure(fn, a, b, n1=8, n2=168, reps=3):
    int_carry = jnp.issubdtype(a.dtype, jnp.integer)

    def runner(n):
        @jax.jit
        def run(a, b):
            def step(carry, i):
                out = fn(carry, b)
                if int_carry:
                    # int8 carry: XOR a step-dependent byte (a float epsilon
                    # rounds to zero and the tunnel de-dupes the executions)
                    nxt = jnp.bitwise_xor(carry, (i % 7 + 1).astype(carry.dtype))
                else:
                    nxt = carry + (out[: carry.shape[0], : carry.shape[1]] * 1e-6
                                   ).astype(carry.dtype)
                return nxt, out[0, 0].astype(jnp.float32)
            carry, vals = jax.lax.scan(step, a, jnp.arange(n))
            return jnp.sum(vals) + jnp.sum(carry[0, 0].astype(jnp.float32))
        return run

    r1, r2 = runner(n1), runner(n2)

    def perturb(s):
        if int_carry:
            return jnp.bitwise_xor(a, jnp.asarray(s % 127 + 1, a.dtype))
        return a + jax.random.normal(jax.random.key(s), a.shape).astype(a.dtype) * 1e-3

    float(r1(perturb(0), b))  # compile + complete
    float(r2(perturb(1), b))
    best = float("inf")
    for r in range(reps):
        t0 = time.time(); float(r1(perturb(10 + 2 * r), b)); t1 = time.time() - t0
        t0 = time.time(); float(r2(perturb(11 + 2 * r), b)); t2 = time.time() - t0
        best = min(best, (t2 - t1) / (n2 - n1))
    return best


def _mm_kernel(a_ref, b_ref, o_ref):
    o_ref[...] = jax.lax.dot(
        a_ref[...], b_ref[...],
        preferred_element_type=jnp.int32 if a_ref.dtype == jnp.int8 else jnp.float32,
    )


@functools.partial(jax.jit, static_argnums=(2,))
def pallas_mm(a, b, bm=1024):
    m, k = a.shape
    n = b.shape[1]
    acc = jnp.int32 if a.dtype == jnp.int8 else jnp.float32
    return pl.pallas_call(
        _mm_kernel,
        grid=(m // bm,),
        in_specs=[pl.BlockSpec((bm, k), lambda i: (i, 0)),
                  pl.BlockSpec((k, n), lambda i: (0, 0))],
        out_specs=pl.BlockSpec((bm, n), lambda i: (i, 0)),
        out_shape=jax.ShapeDtypeStruct((m, n), acc),
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("arbitrary",)),
    )(a, b)


def main():
    m, k, n = (int(x) for x in sys.argv[1:4]) if len(sys.argv) >= 4 else (16384, 64, 2048)
    flops = 2 * m * k * n
    a_bf = jax.random.normal(jax.random.key(0), (m, k), jnp.bfloat16)
    b_bf = jax.random.normal(jax.random.key(1), (k, n), jnp.bfloat16)
    a_i8 = (jax.random.normal(jax.random.key(2), (m, k)) * 10).astype(jnp.int8)
    b_i8 = (jax.random.normal(jax.random.key(3), (k, n)) * 10).astype(jnp.int8)

    results = {}
    for mode, fn, a, b in [
        ("xla_bf16", lambda a, b: jax.lax.dot(a, b, preferred_element_type=jnp.float32), a_bf, b_bf),
        ("xla_int8", lambda a, b: jax.lax.dot(a, b, preferred_element_type=jnp.int32), a_i8, b_i8),
        ("pallas_bf16", pallas_mm, a_bf, b_bf),
        ("pallas_int8", pallas_mm, a_i8, b_i8),
    ]:
        dt = measure(fn, a, b)
        results[mode] = {"us": round(dt * 1e6, 1), "tflops": round(flops / dt / 1e12, 1)}
        print(json.dumps({"mode": mode, "mkn": [m, k, n], **results[mode]}), flush=True)
    print(json.dumps({
        "mkn": [m, k, n],
        "xla_int8_speedup": round(results["xla_bf16"]["us"] / results["xla_int8"]["us"], 2),
        "pallas_int8_speedup": round(results["pallas_bf16"]["us"] / results["pallas_int8"]["us"], 2),
    }), flush=True)


if __name__ == "__main__":
    with tpu_lock():
        main()
