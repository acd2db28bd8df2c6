"""Overhead-cancelled flash-attention microbenchmark.

The axon tunnel adds ~43 ms per launch and de-dupes identical executions
(CLAUDE.md), so per-call timing overstates kernel time badly at these
shapes (a 17776-token forward is ~50 ms of real work). This harness runs
N kernel applications INSIDE one jitted lax.scan (each step perturbs q via
the carry so no two applications are identical) and reports the
scan-length difference (N2 - N1), which cancels launch overhead, fetch
RTT, and the scan's own fixed cost.

Usage:  python tools/bench_attn.py [B H S D [KV]]
Env:    MRT_FLASH_BQ / MRT_FLASH_BK / MRT_FLASH_BK_INNER — block overrides
        MRT_ATTN_REF=1 — also measure jax.experimental reference flash

Serialize with other TPU work (flock on /root/repo/.tpu_lock is taken).
"""
import json
import os
import sys
import time

sys.path.insert(0, "/root/repo")

from tools.tpu_lock import tpu_lock  # noqa: E402

import jax  # noqa: E402
import jax.numpy as jnp  # noqa: E402

jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")

from motionrag_tpu.ops.flash_attention import flash_attention  # noqa: E402


def make_runner(fn, n):
    """One launch: scan fn n times, q perturbed per step via the carry."""

    @jax.jit
    def run(q, k, v):
        def step(carry, i):
            out = fn(carry, k, v)
            # feed a cheap function of the output back as the next q so no
            # two steps are identical and none can be dead-code-eliminated
            nxt = carry + (out * 1e-6).astype(carry.dtype)
            return nxt, jnp.sum(out[..., 0, 0].astype(jnp.float32))
        carry, sums = jax.lax.scan(step, q, jnp.arange(n))
        return jnp.sum(sums) + jnp.sum(carry[..., 0, 0].astype(jnp.float32))

    return run


def measure(fn, q, k, v, n1=2, n2=12, reps=3):
    """Scan-length differencing cancels launch overhead and fetch RTT.
    Every timed execution uses a fresh q perturbation (the tunnel de-dupes
    identical executions, including compile-vs-timed repeats).

    Differencing uses min(t2) - min(t1) — the min of each scan length
    separately — NOT min over reps of (t2_r - t1_r): a relay hiccup landing
    on a short run inflates that rep's difference, and a min over rep-pairs
    keeps exactly the most-inflated rep (observed: same kernel config
    reading 105 vs 91 TFLOP/s across harness runs). Per-length minima keep
    the least-disturbed execution of each."""
    run1, run2 = make_runner(fn, n1), make_runner(fn, n2)
    perturb = lambda seed: q + jax.random.normal(jax.random.key(seed), q.shape, q.dtype) * 1e-3
    float(run1(perturb(0), k, v))  # compile + complete
    float(run2(perturb(1), k, v))
    t1s, t2s = [], []
    for r in range(reps):
        t0 = time.time()
        float(run1(perturb(10 + 2 * r), k, v))
        t1s.append(time.time() - t0)
        t0 = time.time()
        float(run2(perturb(11 + 2 * r), k, v))
        t2s.append(time.time() - t0)
    return (min(t2s) - min(t1s)) / (n2 - n1)


def main():
    b, h, s, d = (int(x) for x in sys.argv[1:5]) if len(sys.argv) >= 5 else (1, 48, 17776, 64)
    kv = int(sys.argv[5]) if len(sys.argv) > 5 else s
    flops = 4 * s * kv * d * h * b

    q = jax.random.normal(jax.random.key(0), (b, h, s, d), jnp.bfloat16)
    k = jax.random.normal(jax.random.key(1), (b, h, kv, d), jnp.bfloat16)
    v = jax.random.normal(jax.random.key(2), (b, h, kv, d), jnp.bfloat16)

    dt = measure(lambda q, k, v: flash_attention(q, k, v), q, k, v)
    print(json.dumps({
        "shape": f"b{b} h{h} s{s} kv{kv} d{d}",
        "bq": os.environ.get("MRT_FLASH_BQ"), "bk": os.environ.get("MRT_FLASH_BK"),
        "ms": round(dt * 1e3, 2), "tflops": round(flops / dt / 1e12, 1),
    }), flush=True)

    if os.environ.get("MRT_ATTN_REF"):
        from jax.experimental.pallas.ops.tpu.flash_attention import (
            BlockSizes, flash_attention as jax_flash)
        bs = BlockSizes(block_q=512, block_k_major=1024, block_k=1024, block_b=1,
                        block_q_major_dkv=512, block_k_major_dkv=1024,
                        block_k_dkv=1024, block_q_dkv=512,
                        block_k_major_dq=1024, block_k_dq=1024, block_q_dq=512)
        fn = lambda q, k, v: jax_flash(q, k, v, sm_scale=d ** -0.5, block_sizes=bs)
        dt = measure(fn, q, k, v)
        print(json.dumps({"ref": f"b{b} h{h} s{s} d{d}", "ms": round(dt * 1e3, 2),
                          "tflops": round(flops / dt / 1e12, 1)}), flush=True)


if __name__ == "__main__":
    with tpu_lock():
        main()
