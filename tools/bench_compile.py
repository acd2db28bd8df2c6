"""Compile-time benchmark: unrolled-loop vs nn.scan'd CogVideoX DiT.

The 42-block unroll dominates cold-start compile cost (BENCH_r01 timed out
in exactly that phase; the tunnel's remote compile service also fails
RESOURCE_EXHAUSTED on very large modules). scan_blocks collapses the stack
to one block in the HLO; this tool measures lower+compile wall time and HLO
size for both layouts at a configurable depth so the scaling is measurable
without burning a 5B-scale compile.

Usage:
    python tools/bench_compile.py [--depth 16] [--dim 512] [--platform cpu]

Prints one JSON line per layout.
"""

from __future__ import annotations

import argparse
import json
import sys
import time

sys.path.insert(0, "/root/repo")


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--depth", type=int, default=16)
    ap.add_argument("--dim", type=int, default=512)
    ap.add_argument("--heads", type=int, default=8)
    ap.add_argument("--tokens", type=int, default=1024, help="video tokens (f*ph*pw)")
    ap.add_argument("--platform", default="cpu", choices=["cpu", "axon", "tpu", "keep"])
    args = ap.parse_args()

    import os

    if args.platform != "keep":
        import jax

        p = args.platform
        if p == "tpu" and os.environ.get("JAX_PLATFORMS", "") == "axon":
            p = "axon"
        jax.config.update("jax_platforms", p)
    import jax
    import jax.numpy as jnp

    # fresh-compile measurement: do NOT hit the persistent cache
    jax.config.update("jax_enable_compilation_cache", False)

    from motionrag_tpu.models.cogvideox.dit import CogVideoXTransformer3D

    # tokens = f * (h/p) * (w/p); pick f=4 and a square-ish spatial grid
    f = 4
    grid = int((args.tokens // f) ** 0.5)
    h = w = grid * 2  # patch_size 2
    sample = jnp.zeros((1, f, h, w, 16), jnp.bfloat16)
    text = jnp.zeros((1, 32, 64), jnp.bfloat16)
    t = jnp.zeros((1,), jnp.int32)

    results = {}
    for mode, scan in (("loop", False), ("scan", True)):
        dit = CogVideoXTransformer3D(
            in_channels=16, out_channels=16, dim=args.dim, depth=args.depth,
            heads=args.heads, head_dim=args.dim // args.heads,
            text_embed_dim=64, time_embed_dim=args.dim // 4,
            dtype=jnp.bfloat16, scan_blocks=scan,
        )
        params = dit.init(jax.random.key(0), sample[:, :1, :2, :2], text[:, :4], t)

        fn = jax.jit(lambda p, s, txt, tt: dit.apply(p, s, txt, tt))
        t0 = time.time()
        lowered = fn.lower(params, sample, text, t)
        lower_s = time.time() - t0
        hlo_chars = len(lowered.as_text())
        t0 = time.time()
        compiled = lowered.compile()
        compile_s = time.time() - t0
        row = {
            "mode": mode, "depth": args.depth, "dim": args.dim,
            "tokens": args.tokens, "lower_s": round(lower_s, 2),
            "compile_s": round(compile_s, 2), "hlo_chars": hlo_chars,
        }
        results[mode] = row
        print(json.dumps(row), flush=True)
        del fn, lowered, compiled

    if "loop" in results and "scan" in results:
        print(json.dumps({
            "compile_speedup": round(
                results["loop"]["compile_s"] / max(results["scan"]["compile_s"], 1e-9), 2
            ),
            "hlo_shrink": round(
                results["loop"]["hlo_chars"] / max(results["scan"]["hlo_chars"], 1), 2
            ),
        }), flush=True)


if __name__ == "__main__":
    main()
