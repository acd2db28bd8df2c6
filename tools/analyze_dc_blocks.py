#!/usr/bin/env python
"""Merge bench_dc_blocks.py wall-clock with flops_dc_blocks.py FLOP counts
into a per-block MFU table for the DC UNet3D at the protocol shape.

Usage: python tools/analyze_dc_blocks.py .bench_logs/dc_blocks_s6.out [flops.json]
(flops default: runs tools/flops_dc_blocks.py fresh if no file is given —
CPU-only, ~2 min.)
"""
import json
import subprocess
import sys

PEAK = 197e12  # v5e bf16

ms_path = sys.argv[1]
with open(ms_path) as f:
    ms = json.loads([l for l in f if l.strip().startswith("{")][-1])

if len(sys.argv) > 2:
    fl = json.loads(open(sys.argv[2]).read().strip().splitlines()[-1])
else:
    out = subprocess.run([sys.executable, "tools/flops_dc_blocks.py"],
                         capture_output=True, text=True, check=True)
    fl = json.loads(out.stdout.strip().splitlines()[-1])

# block-count accounting mirrors bench_dc_blocks.py
COUNTS = {"resblock_tconv": {0: 5, 1: 5, 2: 5, 3: 7},
          "spatial_xfmr": {0: 5, 1: 5, 2: 5, 3: 1},
          "temporal_xfmr": {0: 5, 1: 5, 2: 5, 3: 1}}

tot_ms = tot_gf = 0.0
rows = []
for fam, counts in COUNTS.items():
    fam_ms = fam_gf = 0.0
    for li, n in counts.items():
        m = ms.get(f"L{li}_{fam}_ms")
        g = fl.get(f"L{li}_{fam}_gflop")
        if m is None or g is None:
            continue
        tput = g / m  # GFLOP / ms == TFLOP/s
        rows.append((f"L{li} {fam}", n, m, g, tput))
        fam_ms += n * m
        fam_gf += n * g
    rows.append((f"== {fam} total", "", fam_ms, fam_gf, fam_gf / fam_ms))
    tot_ms += fam_ms
    tot_gf += fam_gf

print(f"{'block':<26}{'n':>3}{'ms/blk':>9}{'GFLOP':>9}{'TFLOP/s':>9}{'MFU%':>6}")
for name, n, m, g, tput in rows:
    print(f"{name:<26}{n:>3}{m:>9.1f}{g:>9.0f}{tput:>9.1f}{100*tput*1e12/PEAK:>6.0f}")
print(f"\naccounted: {tot_ms:.0f} ms, {tot_gf/1e3:.1f} TFLOP, "
      f"avg {tot_gf/tot_ms:.1f} TFLOP/s ({100*tot_gf/tot_ms*1e12/PEAK:.0f}% peak)")
if "full_forward_ms" in ms:
    print(f"full forward measured: {ms['full_forward_ms']:.0f} ms "
          f"(unaccounted {ms['full_forward_ms'] - tot_ms:.0f} ms)")
