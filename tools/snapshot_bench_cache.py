#!/usr/bin/env python
"""Snapshot the scoreboard-relevant persistent-compile-cache entries into
git-tracked ``bench_cache/`` (VERDICT r4 #4).

Why: session resets wipe the gitignored ``.jax_cache``, and the driver's
end-of-round bench then pays ~522 s of DC sampler compile (BENCH_r04).
scan_blocks was measured as a no-op for this (the cost is remote-compile-
service-bound, docs/benchmarks.md), so the reset-proof lever is the cache
itself: JAX persistent-cache entries are content-addressed by HLO hash +
compile options, so a restored entry is a ~199 s executable LOAD instead of
a ~522 s compile. Entries are already zstd-compressed internally (gzip -1
gains 0.5%), so they are committed raw; ``.gitattributes`` disables delta
packing for them.

Excluded: ``jit_train_step*`` / ``jit_eval_loss*`` (training benches; large
and not on the driver's scoreboard path).

Usage: python tools/snapshot_bench_cache.py [--dry-run]
Restore happens automatically at bench.py startup (hardlink per entry).
"""

import argparse
import os
import sys

CACHE = "/root/repo/.jax_cache"
SNAP = "/root/repo/bench_cache"
EXCLUDE_PREFIXES = ("jit_train_step", "jit_eval_loss")


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--dry-run", action="store_true")
    args = ap.parse_args()

    os.makedirs(SNAP, exist_ok=True)
    total = kept = 0
    for name in sorted(os.listdir(CACHE)):
        src = os.path.join(CACHE, name)
        if not os.path.isfile(src):
            continue
        size = os.path.getsize(src)
        total += size
        if any(name.startswith(p) for p in EXCLUDE_PREFIXES):
            continue
        kept += size
        dst = os.path.join(SNAP, name)
        if os.path.exists(dst) and os.path.getsize(dst) == size:
            continue
        if args.dry_run:
            print(f"would snapshot {name} ({size / 1e6:.0f} MB)")
            continue
        tmp = dst + ".tmp"
        try:
            if os.path.exists(tmp):
                os.unlink(tmp)
            os.link(src, tmp)  # same filesystem: free
        except OSError:
            import shutil

            shutil.copy2(src, tmp)
        os.replace(tmp, dst)
        print(f"snapshotted {name} ({size / 1e6:.0f} MB)")
    print(f"cache {total / 1e9:.2f} GB total -> snapshot {kept / 1e9:.2f} GB",
          file=sys.stderr)


if __name__ == "__main__":
    main()
