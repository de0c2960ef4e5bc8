#!/usr/bin/env python3
"""Compare BENCH_DETAIL-format runs and print per-query scaling ratios.

Two-point usage:
    python3 scripts/scale_ratios.py <base.json> <scaled.json> [threshold]
Three-point usage (sf0.1 / sf1 / sf3 — prints a combined table with
both ratios so the 10x AND 30x stories reproduce from committed files):
    python3 scripts/scale_ratios.py --three <sf0.1.json> <sf1.json> <sf3.json> [thr10] [thr30]

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

def main3(p01, p1, p3, thr10=12.0, thr30=36.0):
    b, m, t = load(p01), load(p1), load(p3)
    common = sorted(set(b) & set(m) & set(t))
    rows = [(q, b[q], m[q], t[q],
             m[q] / b[q] if b[q] > 0 else float("inf"),
             t[q] / b[q] if b[q] > 0 else float("inf"))
            for q in common if b[q] >= 0 and m[q] >= 0 and t[q] >= 0]
    big = [r for r in rows if r[1] >= 0.2]
    small = [r for r in rows if r[1] < 0.2]
    big.sort(key=lambda r: -r[5])
    print(f"{'query':42s} {'sf0.1':>8s} {'sf1':>8s} {'sf3':>8s} {'10x':>7s} {'30x':>7s}")
    for q, x, y, z, r10, r30 in big:
        flags = []
        if r10 > thr10: flags.append(f"10x>{thr10:.0f}")
        if r30 > thr30: flags.append(f"30x>{thr30:.0f}")
        flag = ("  <-- " + ",".join(flags)) if flags else ""
        print(f"{q:42s} {x:8.3f} {y:8.3f} {z:8.3f} {r10:6.1f}x {r30:6.1f}x{flag}")
    tb, tm, tt = (sum(r[i] for r in rows) for i in (1, 2, 3))
    print(f"\ntotals: sf0.1 {tb:.1f}s  sf1 {tm:.1f}s ({tm/tb:.2f}x)  "
          f"sf3 {tt:.1f}s ({tt/tb:.2f}x) over {len(rows)} queries")
    if small:
        sb, sm_, st = (sum(r[i] for r in small) for i in (1, 2, 3))
        print(f"sub-0.2s-base rows ({len(small)}): sf0.1 {sb:.1f}s -> sf1 {sm_:.1f}s "
              f"-> sf3 {st:.1f}s (noise-dominated)")
    over10 = [q for q, x, y, z, r10, r30 in big if r10 > thr10]
    over30 = [q for q, x, y, z, r10, r30 in big if r30 > thr30]
    print(f"\nabove {thr10}x at 10x (base >= 0.2s): {over10 if over10 else 'none'}")
    print(f"above {thr30}x at 30x (base >= 0.2s): {over30 if over30 else 'none'}")

def main4(p01, p1, p3, p10, thr10=12.0, thr30=36.0, thr100=120.0):
    """Four-point table (sf0.1 / sf1 / sf3 / sf10): the 10x, 30x AND
    100x stories from committed files. thr100 defaults to 120 =
    'super-linear-plus' at 100x data (round-9 verdict ask #1)."""
    b, m, t, x10 = load(p01), load(p1), load(p3), load(p10)
    common = sorted(set(b) & set(m) & set(t) & set(x10))
    rows = [(q, b[q], m[q], t[q], x10[q],
             m[q] / b[q] if b[q] > 0 else float("inf"),
             t[q] / b[q] if b[q] > 0 else float("inf"),
             x10[q] / b[q] if b[q] > 0 else float("inf"))
            for q in common
            if b[q] >= 0 and m[q] >= 0 and t[q] >= 0 and x10[q] >= 0]
    big = [r for r in rows if r[1] >= 0.2]
    small = [r for r in rows if r[1] < 0.2]
    big.sort(key=lambda r: -r[7])
    print(f"{'query':42s} {'sf0.1':>8s} {'sf1':>8s} {'sf3':>8s} {'sf10':>8s} "
          f"{'10x':>7s} {'30x':>7s} {'100x':>7s}")
    for q, a, y, z, w, r10, r30, r100 in big:
        flags = []
        if r10 > thr10: flags.append(f"10x>{thr10:.0f}")
        if r30 > thr30: flags.append(f"30x>{thr30:.0f}")
        if r100 > thr100: flags.append(f"100x>{thr100:.0f}")
        flag = ("  <-- " + ",".join(flags)) if flags else ""
        print(f"{q:42s} {a:8.3f} {y:8.3f} {z:8.3f} {w:8.3f} "
              f"{r10:6.1f}x {r30:6.1f}x {r100:6.1f}x{flag}")
    ta, tm_, tt, tw = (sum(r[i] for r in rows) for i in (1, 2, 3, 4))
    print(f"\ntotals: sf0.1 {ta:.1f}s  sf1 {tm_:.1f}s ({tm_/ta:.2f}x)  "
          f"sf3 {tt:.1f}s ({tt/ta:.2f}x)  sf10 {tw:.1f}s ({tw/ta:.2f}x) "
          f"over {len(rows)} queries")
    if small:
        sa, sm_, st, sw = (sum(r[i] for r in small) for i in (1, 2, 3, 4))
        print(f"sub-0.2s-base rows ({len(small)}): sf0.1 {sa:.1f}s -> sf1 {sm_:.1f}s "
              f"-> sf3 {st:.1f}s -> sf10 {sw:.1f}s (noise-dominated)")
    over100 = [q for q, a, y, z, w, r10, r30, r100 in big if r100 > thr100]
    print(f"\nabove {thr100}x at 100x (base >= 0.2s): {over100 if over100 else 'none'}")

if __name__ == "__main__":
    if sys.argv[1] == "--four":
        main4(sys.argv[2], sys.argv[3], sys.argv[4], sys.argv[5],
              float(sys.argv[6]) if len(sys.argv) > 6 else 12.0,
              float(sys.argv[7]) if len(sys.argv) > 7 else 36.0,
              float(sys.argv[8]) if len(sys.argv) > 8 else 120.0)
    elif sys.argv[1] == "--three":
        main3(sys.argv[2], sys.argv[3], sys.argv[4],
              float(sys.argv[5]) if len(sys.argv) > 5 else 12.0,
              float(sys.argv[6]) if len(sys.argv) > 6 else 36.0)
    else:
        main(sys.argv[1], sys.argv[2],
             float(sys.argv[3]) if len(sys.argv) > 3 else 12.0)
