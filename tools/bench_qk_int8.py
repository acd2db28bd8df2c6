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
    # per-length minima (not min over rep-pairs): a hiccup on a short run
    # would otherwise inflate the kept difference (see tools/bench_attn.py)
    t1s, t2s = [], []
    for r in range(reps):
        t0 = time.time(); float(r1(perturb(10 + 2 * r), b)); t1s.append(time.time() - t0)
        t0 = time.time(); float(r2(perturb(11 + 2 * r), b)); t2s.append(time.time() - t0)
    return (min(t2s) - min(t1s)) / (n2 - n1)


def _qk_probe_kernel(a_ref, b_ref, o_ref):
    # S stays in VMEM (like the flash kernel's score tile); only a 128-lane
    # slice reaches HBM. Writing the full [m, n] product out instead makes
    # every mode HBM-bound at k=64 arithmetic intensity — and on the XLA
    # side the compiler narrows a dot whose output is partially consumed,
    # so a naive A@B micro measures neither engine honestly.
    s = jax.lax.dot(
        a_ref[...], b_ref[...],
        preferred_element_type=jnp.int32 if a_ref.dtype == jnp.int8 else jnp.float32,
    )  # [bm, n], VMEM only
    # fold all columns into 128 lanes (one cheap VPU pass, identical across
    # modes — the accumulate stays in the dot's native dtype) so every
    # output column is consumed: no dot narrowing possible
    folded = sum(s[:, j * 128:(j + 1) * 128] for j in range(s.shape[1] // 128))
    o_ref[...] = folded.astype(jnp.float32)


@functools.partial(jax.jit, static_argnums=(2,))
def pallas_mm(a, b, bm=512):
    m, k = a.shape
    n = b.shape[1]
    return pl.pallas_call(
        _qk_probe_kernel,
        grid=(m // bm,),
        in_specs=[pl.BlockSpec((bm, k), lambda i: (i, 0)),
                  pl.BlockSpec((k, n), lambda i: (0, 0))],
        out_specs=pl.BlockSpec((bm, 128), lambda i: (i, 0)),
        out_shape=jax.ShapeDtypeStruct((m, 128), jnp.float32),
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("arbitrary",)),
    )(a, b)


def main():
    m, k, n = (int(x) for x in sys.argv[1:4]) if len(sys.argv) >= 4 else (16384, 64, 1024)
    flops = 2 * m * k * n
    a_bf = jax.random.normal(jax.random.key(0), (m, k), jnp.bfloat16)
    b_bf = jax.random.normal(jax.random.key(1), (k, n), jnp.bfloat16)
    a_i8 = (jax.random.normal(jax.random.key(2), (m, k)) * 10).astype(jnp.int8)
    b_i8 = (jax.random.normal(jax.random.key(3), (k, n)) * 10).astype(jnp.int8)

    def fold(s):  # consume every column (see _qk_probe_kernel)
        return sum(
            s[:, j * 128:(j + 1) * 128] for j in range(s.shape[1] // 128)
        ).astype(jnp.float32)

    results = {}
    for mode, fn, a, b in [
        ("xla_bf16", lambda a, b: fold(jax.lax.dot(a, b, preferred_element_type=jnp.float32)), a_bf, b_bf),
        ("xla_int8", lambda a, b: fold(jax.lax.dot(a, b, preferred_element_type=jnp.int32)), a_i8, b_i8),
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
