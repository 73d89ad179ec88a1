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

    if tags:
        conditioned(d)


def conditioned(d: dict) -> None:
    """Condition the efficiency distribution on host state.

    Each pair is tagged with the host's concurrent memory-bandwidth
    scaling ratio (aggregate bandwidth at 32 vs 8 processes,
    tools/hw_calibrate.py, run adjacent to the pair). A
    bandwidth-bound job cannot scale better than the box's own
    bandwidth does, so a pair measured while the host delivers only
    1.3x bandwidth for 4x processes carries a ~0.33 hardware ceiling
    that is not an engine property. Rather than normalizing (which
    can exceed 1 and hides noise), report the split: pairs from
    epochs where the host itself could scale (ratio >= threshold)
    vs pairs where it could not.
    """
    tagged = [p for p in d["pairs"] if p.get("hw_bw_ratio") is not None]
    if not tagged:
        return
    thresh = 3.2  # host delivers >=80% of ideal 4x bandwidth scaling
    quiet = [p for p in tagged if p["hw_bw_ratio"] >= thresh]
    noisy = [p for p in tagged if p["hw_bw_ratio"] < thresh]
    n = len(tagged)
    xs = [p["hw_bw_ratio"] for p in tagged]
    ys = [p["efficiency"] for p in tagged]
    mx, my = sum(xs) / n, sum(ys) / n
    sxy = sum((x - mx) * (y - my) for x, y in zip(xs, ys))
    sxx = sum((x - mx) ** 2 for x in xs)
    syy = sum((y - my) ** 2 for y in ys)
    r = sxy / (sxx * syy) ** 0.5 if sxx > 0 and syy > 0 else float("nan")

    def med(ps):
        v = sorted(p["efficiency"] for p in ps)
        m = len(v)
        return round(v[m // 2] if m % 2 else (v[m // 2 - 1] + v[m // 2]) / 2, 3)

    print("\n### Efficiency conditioned on host state\n")
    print(
        f"corr(hw 4x-bandwidth ratio, measured efficiency) = **{r:.2f}** "
        f"across {n} pairs.\n"
    )
    print(f"| host epoch | pairs | efficiency median | range |")
    print("|---|---|---|---|")
    for label, ps in (
        (f"quiet (hw ratio >= {thresh})", quiet),
        (f"contended (hw ratio < {thresh})", noisy),
    ):
        if ps:
            es = [p["efficiency"] for p in ps]
            print(
                f"| {label} | {len(ps)} | **{med(ps)}** "
                f"| [{min(es)}, {max(es)}] |"
            )
        else:
            print(f"| {label} | 0 | — | — |")
    small, big = d["pair"]
    stealed = [
        p for p in d["pairs"]
        if p.get(f"steal_{small}") is not None and p.get(f"steal_{big}") is not None
    ]
    if stealed:
        print(
            "\nPer-trial hypervisor steal fraction (/proc/stat over the"
            " timed window): a pair is *clean* when both sides ran with"
            " <1% steal, *stable* when the two sides saw steal within"
            " 1 point of each other (noise cancels in the ratio even"
            " if high). The 1% cut was set empirically — in the round-5"
            " 2x8 campaign the only >=1% reading was also the only"
            " efficiency outlier; raw values are printed so any other"
            " cut can be re-derived:\n"
        )
        print(f"| pair | steal t{small} | steal t{big} | class | efficiency |")
        print("|---|---|---|---|---|")
        clean, stable = [], []
        for p in stealed:
            ss, sb = p[f"steal_{small}"], p[f"steal_{big}"]
            cls = []
            if max(ss, sb) < 0.01:
                cls.append("clean")
                clean.append(p)
            if abs(ss - sb) < 0.01:
                cls.append("stable")
                stable.append(p)
            print(
                f"| {p['pair']} | {ss:.1%} | {sb:.1%} |"
                f" {','.join(cls) or 'shifted'} | {p['efficiency']} |"
            )
        for label, ps in (("clean", clean), ("epoch-stable", stable)):
            if ps:
                es = sorted(p["efficiency"] for p in ps)
                m = len(es)
                med = es[m // 2] if m % 2 else (es[m // 2 - 1] + es[m // 2]) / 2
                print(
                    f"\n{label} pairs ({m}): efficiency median **{round(med, 3)}**,"
                    f" range [{es[0]}, {es[-1]}]"
                )
        print()

    print(
        "\nEach pair's hardware ceiling for bandwidth-bound work is"
        " hw_ratio/4; per-pair measured efficiency vs that ceiling:\n"
    )
    print("| pair | hw ratio | bw ceiling (ratio/4) | measured efficiency |")
    print("|---|---|---|---|")
    for p in tagged:
        print(
            f"| {p['pair']} | {p['hw_bw_ratio']} |"
            f" {round(p['hw_bw_ratio'] / 4, 3)} | {p['efficiency']} |"
        )


if __name__ == "__main__":
    main(sys.argv[1])
