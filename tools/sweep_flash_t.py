#!/usr/bin/env python
"""Padding-aware block sweep for the transposed flash path (inference).

Motivation (round 4): flash-T measures 95.1 TFLOP/s at s=9216 but only
84.2 at s=6976 and 84.6 at s=17776. The default tile (bq=1536, bk=1024)
divides 9216 exactly (zero padded compute) but pads 6976 by 10.1% on the
q axis (5x1536=7680) and 2.75% on kv, and 17776 by 3.7%+3.7%. This sweeps
tile pairs chosen to minimize padding at each protocol shape, with the
overhead-cancelled in-launch-scan harness (tools/bench_attn.py) — per-call
timing pays the ~43 ms tunnel launch per rep and understates TFLOP/s.

Constraints: BOTH bq and bk must be multiples of 128 — bq is the lane dim
of every VPU op and of the [*, block_q] score tile; bk is the lane dim of
the pre-transposed V^T tile and the offset of its dynamic lane slice
(Mosaic's (8,128) tile rule; interpret mode does NOT catch violations —
CLAUDE.md round-3). The f32 score tile bq*bk*4 B must fit scoped VMEM
alongside acc/m/l (~8 MB budget).

Usage: python tools/sweep_flash_t.py [shape ...]
    shape = B,H,S[,KV]   (d=64 fixed — the only head dim in the repo)
Defaults: the three protocol shapes (cog17 joint, cog49 joint, DC spatial).
"""
import json
import os
import sys

sys.path.insert(0, "/root/repo")
sys.path.insert(0, "/root/repo/tools")

from tools.tpu_lock import tpu_lock  # noqa: E402

import jax  # noqa: E402
import jax.numpy as jnp  # noqa: E402

jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")

from motionrag_tpu.ops.flash_attention import flash_attention  # noqa: E402
from tools.bench_attn import measure  # noqa: E402

D = 64


def ceil_to(x, m):
    return -(-x // m) * m


def candidates(s, kv):
    """Tile pairs minimizing padded compute, plus the current default."""
    bqs = sorted(range(896, 1921, 128),
                 key=lambda bq: (ceil_to(s, bq), -bq))[:3]
    bks = sorted(range(768, 1281, 128),
                 key=lambda bk: (ceil_to(kv, bk), -bk))[:3]
    cfgs = [(1536, 1024)]  # current default first, as the anchor
    for bq in bqs:
        for bk in bks:
            if bq * bk * 4 <= 8 * 2 ** 20 and (bq, bk) not in cfgs:
                cfgs.append((bq, bk))
    return cfgs


def main():
    shapes = []
    for arg in sys.argv[1:]:
        parts = [int(x) for x in arg.split(",")]
        b, h, s = parts[:3]
        kv = parts[3] if len(parts) > 3 else s
        shapes.append((b, h, s, kv))
    if not shapes:
        shapes = [(1, 48, 6976, 6976),    # CogVideoX 17f joint attention
                  (1, 48, 17776, 17776),  # CogVideoX 49f joint attention
                  (16, 5, 9216, 9216),    # DC/SVD L0 spatial (b*h=80)
                  (16, 10, 2304, 2304)]   # DC L1 spatial — the default
                                          # 1536/1024 tile pads 2304 -> 3072
                                          # on BOTH axes (78% extra compute)

    for b, h, s, kv in shapes:
        flops = 4 * s * kv * D * h * b
        q = jax.random.normal(jax.random.key(0), (b, h, s, D), jnp.bfloat16)
        k = jax.random.normal(jax.random.key(1), (b, h, kv, D), jnp.bfloat16)
        v = jax.random.normal(jax.random.key(2), (b, h, kv, D), jnp.bfloat16)
        best = None
        for bq, bk in candidates(s, kv):
            os.environ["MRT_FLASH_T_BQ"] = str(bq)
            os.environ["MRT_FLASH_T_BK"] = str(bk)
            try:
                # fresh lambda -> fresh jit trace -> env knobs re-read
                dt = measure(lambda q, k, v: flash_attention(q, k, v),
                             q, k, v)
                tf = flops / dt / 1e12
                row = {"shape": f"b{b} h{h} s{s} kv{kv}", "bq": bq, "bk": bk,
                       "ms": round(dt * 1e3, 2), "tflops": round(tf, 1),
                       "pad_pct": round(100 * (ceil_to(s, bq) * ceil_to(kv, bk)
                                               / (s * kv) - 1), 2)}
                print(json.dumps(row), flush=True)
                if best is None or tf > best[0]:
                    best = (tf, bq, bk)
            except Exception as e:  # noqa: BLE001
                print(json.dumps({"bq": bq, "bk": bk,
                                  "fail": str(e)[:140]}), flush=True)
        if best:
            print(json.dumps({"shape": f"b{b} h{h} s{s} kv{kv}",
                              "best_bq": best[1], "best_bk": best[2],
                              "best_tflops": round(best[0], 1)}), flush=True)
        os.environ.pop("MRT_FLASH_T_BQ", None)
        os.environ.pop("MRT_FLASH_T_BK", None)


if __name__ == "__main__":
    with tpu_lock():
        main()
