#!/usr/bin/env python3
"""Compare two BENCH_DETAIL-format runs and print per-query scaling ratios.

Usage: python3 scripts/scale_ratios.py <base.json> <scaled.json> [threshold]

Prints queries sorted by ratio (scaled/base), flagging those above
`threshold` (default 12 — a 10x corpus with ~linear operators should
land near 10x; superlinear shapes stick out above the threshold).
Sub-0.2 s base rows are noise-dominated (constant per-query overhead)
and are summarized separately rather than flagged.
"""
import json, sys

def load(p):
    d = json.load(open(p))
    return d["queries"] if "queries" in d else d

def main(base_p, scaled_p, thr=12.0):
    base, scaled = load(base_p), load(scaled_p)
    common = sorted(set(base) & set(scaled))
    rows = [(q, base[q], scaled[q],
             (scaled[q] / base[q]) if base[q] > 0 else float("inf"))
            for q in common if base[q] >= 0 and scaled[q] >= 0]
    fails_b = [q for q in base if base[q] < 0]
    fails_s = [q for q in scaled if scaled[q] < 0]
    big = [r for r in rows if r[1] >= 0.2]
    small = [r for r in rows if r[1] < 0.2]
    big.sort(key=lambda r: -r[3])
    print(f"{'query':42s} {'base':>8s} {'scaled':>9s} {'ratio':>7s}")
    for q, b, s, r in big:
        flag = "  <-- ABOVE THRESHOLD" if r > thr else ""
        print(f"{q:42s} {b:8.3f} {s:9.3f} {r:6.1f}x{flag}")
    tot_b = sum(r[1] for r in rows)
    tot_s = sum(r[2] for r in rows)
    print(f"\ntotals: base {tot_b:.1f}s scaled {tot_s:.1f}s "
          f"ratio {tot_s / tot_b:.1f}x over {len(rows)} queries")
    if small:
        sb, ss = sum(r[1] for r in small), sum(r[2] for r in small)
        print(f"sub-0.2s-base rows ({len(small)}): base {sb:.1f}s -> "
              f"scaled {ss:.1f}s ({ss / max(sb, 1e-9):.1f}x, noise-dominated)")
    if fails_b or fails_s:
        print(f"FAILED base={fails_b} scaled={fails_s}")
    over = [q for q, b, s, r in big if r > thr]
    print(f"\nabove {thr}x (base >= 0.2s): {over if over else 'none'}")

if __name__ == "__main__":
    main(sys.argv[1], sys.argv[2],
         float(sys.argv[3]) if len(sys.argv) > 3 else 12.0)
