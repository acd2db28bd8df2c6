#!/usr/bin/env python
"""Compare the DiT's two sequence-parallel attention algorithms on the
virtual CPU mesh (VERDICT r3 #5): 'allgather' (seq-sharded flash; XLA
inserts per-block K/V all-gathers) vs 'ring' (ops/ring_attention.py
ppermute ring, O(s/N) K/V residency).

Both move the same total K/V volume per block — (N-1)/N of the full K/V —
so the decision is about per-device RESIDENCY (all-gather materializes the
full-length K/V on every device; ring holds 1/N plus one in-flight shard)
and overlap (ring's transfers overlap local compute on real ICI). This tool
compiles one DiT forward at a 49f-proportioned token count over an sp=4
mesh and reports, per mode: compiled collective-op census (bytes moved per
block) and XLA's per-device memory analysis.

CPU-mesh caveat: wall-clock here is meaningless (no real ICI); the
artifacts are the compiled-HLO structure and the memory analysis, which are
backend-layout decisions XLA makes the same way for a TPU mesh.

Usage: python tools/compare_sp_modes.py [--tokens 17776] [--dim 256]
"""

import argparse
import re
import sys

sys.path.insert(0, "/root/repo")


def collective_census(hlo_text: str):
    """Sum output bytes of each collective family in a compiled HLO dump."""
    sizes = {"all-gather": 0, "collective-permute": 0, "all-reduce": 0,
             "reduce-scatter": 0, "all-to-all": 0}
    counts = dict.fromkeys(sizes, 0)
    dt_bytes = {"f32": 4, "bf16": 2, "f16": 2, "s32": 4, "u32": 4, "s8": 1,
                "u8": 1, "pred": 1, "f64": 8, "s64": 8}
    for line in hlo_text.splitlines():
        m = re.search(r"=\s*(?:\(([^)]*)\)|(\S+))\s+(all-gather|collective-permute|all-reduce|reduce-scatter|all-to-all)", line)
        if not m:
            continue
        shapes = m.group(1) if m.group(1) else m.group(2)
        op = m.group(3)
        total = 0
        for sm in re.finditer(r"(\w+)\[([\d,]*)\]", shapes):
            dt, dims = sm.group(1), sm.group(2)
            n = 1
            for d in dims.split(","):
                if d:
                    n *= int(d)
            total += n * dt_bytes.get(dt, 4)
        sizes[op] += total
        counts[op] += 1
    return {k: {"count": counts[k], "bytes": sizes[k]}
            for k in sizes if counts[k]}


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--tokens", type=int, default=17776,
                    help="joint seq target (226 text + video tokens)")
    ap.add_argument("--dim", type=int, default=256)
    ap.add_argument("--depth", type=int, default=2)
    ap.add_argument("--sp", type=int, default=4)
    args = ap.parse_args()

    import jax

    jax.config.update("jax_platforms", "cpu")
    import os

    os.environ["XLA_FLAGS"] = (
        os.environ.get("XLA_FLAGS", "")
        + " --xla_force_host_platform_device_count=8"
    )
    import jax.numpy as jnp
    import numpy as np
    from jax.sharding import Mesh

    from motionrag_tpu.models.cogvideox.dit import CogVideoXTransformer3D

    # 49f proportions: f_lat=13, 30x45 patches = 17550 video + 226 text
    f_lat, ph, pw, s_text = 13, 30, 45, 226
    s = s_text + f_lat * ph * pw
    assert s == args.tokens or args.tokens == 17776, "custom tokens unused"
    heads = args.dim // 64

    mesh = Mesh(np.array(jax.devices()[: args.sp]), ("sp",))
    x = jnp.zeros((1, f_lat, ph * 2, pw * 2, 8), jnp.float32)
    text = jnp.zeros((1, s_text, 64), jnp.float32)
    t = jnp.zeros((1,), jnp.int32)

    report = {}
    for mode in ("allgather", "ring"):
        m = CogVideoXTransformer3D(
            in_channels=8, out_channels=4, dim=args.dim, depth=args.depth,
            heads=heads, head_dim=64, text_embed_dim=64, time_embed_dim=32,
            dtype=jnp.float32, sequence_parallel=True, sp_attention=mode,
        )
        params = jax.eval_shape(lambda: m.init(jax.random.key(0), x, text, t))
        params = jax.tree.map(lambda a: jnp.zeros(a.shape, a.dtype), params)
        with mesh:
            fn = jax.jit(lambda p, x, c, t: m.apply(p, x, c, t))
            compiled = fn.lower(params, x, text, t).compile()
        txt = compiled.as_text()
        mem = compiled.memory_analysis()
        report[mode] = {
            "collectives": collective_census(txt),
            "temp_bytes_per_device": getattr(mem, "temp_size_in_bytes", None),
            "argument_bytes": getattr(mem, "argument_size_in_bytes", None),
            "peak_bytes": getattr(mem, "peak_memory_in_bytes", None),
        }
        print(f"[{mode}] {report[mode]}", flush=True)

    import json

    print(json.dumps({"tokens": s, "dim": args.dim, "depth": args.depth,
                      "sp": args.sp, "modes": report}))


if __name__ == "__main__":
    main()
