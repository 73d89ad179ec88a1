"""Render a BENCH/BASELINE-ready markdown table from a
scaling_paired_*.json artifact (tools/scaling_bench.py --paired).

Usage: python tools/paired_report.py .scratch/scaling_paired_generate_8x32.json
"""

from __future__ import annotations

import json
import sys


def main(path: str) -> None:
    d = json.load(open(path))
    small, big = d["pair"]
    print(f"### Paired protocol {small}x{big} cores, {d['rows']:,} rows ({d['mode']})\n")
    hdr = f"| pair | order | t{small} (s) | t{big} (s) | efficiency |"
    tags = any(p.get("hw_bw_GBps_32") is not None for p in d["pairs"])
    if tags:
        hdr += " host bw GB/s (32p) | hw 4x ratio |"
    print(hdr)
    print("|" + "---|" * (hdr.count("|") - 1))
    for p in d["pairs"]:
        row = (
            f"| {p['pair']} | {'→'.join(map(str, p['order']))} "
            f"| {p[f't{small}_sec']} | {p[f't{big}_sec']} | {p['efficiency']} |"
        )
        if tags:
            row += f" {p.get('hw_bw_GBps_32', '—')} | {p.get('hw_bw_ratio', '—')} |"
        print(row)
    s = d["efficiency_spread"]
    print(
        f"\nefficiency: median **{s['median']}**, IQR [{s['q1']}, {s['q3']}],"
        f" range [{s['min']}, {s['max']}]; min-based {d['min_based_efficiency']};"
        f" best t{big} {d[f'best_t{big}_sec']} s ="
        f" {d[f'best_rows_per_sec_{big}']:,.0f} rows/s\n"
    )
    print("Per-stage efficiency (median [min, max] across pairs):\n")
    print("| stage | median | min | max |")
    print("|---|---|---|---|")
    for k, v in sorted(d["stage_efficiency_spread"].items()):
        print(f"| {k} | {v['median']} | {v['min']} | {v['max']} |")


if __name__ == "__main__":
    main(sys.argv[1])
