#!/usr/bin/env python3
"""Cross-artifact bench-drift gate -> ABTime adjudication queue.

Round-10 lesson (SCALE.md host-drift notes, memory: bench-noise-
discipline): per-query deltas under ~1.5x between two bench artifacts
are NOT signal on this host -- an idle machine measured a 2.1x max/min
spread across 10 interleaved observations of one unchanged query. The
standing adjudicator is graft.tools.ABTime (N interleaved sweeps of the
suspect queries in ONE session after untimed warmup; read the MIN).

This hook mechanizes the workflow the round-10 verdict asked for: any
cross-artifact per-query delta past the band gets an AUTOMATIC ABTime
work item instead of ad-hoc judgment.

Usage:
    python3 scripts/ab_gate.py A.json B.json [--ratio 1.5]
        [--min-sec 0.5] [--sfdir /root/testdata/sf0.1] [--sweeps 7]

A.json / B.json: BENCH_DETAIL-style artifacts (anything with a
"queries" name->seconds map; the driver's compact BENCH_rN.json works
too -- only the intersection of the two query sets is compared).

Output: one line per flagged query (ratio, both values), then a
ready-to-run ABTime command covering all flagged queries and a
SCALE.md-ready ledger row template. Exit 1 iff anything was flagged,
so a bench freeze can gate on it:
    python3 scripts/ab_gate.py OLD.json NEW.json || <run the printed ABTime>
"""
import argparse
import json
import sys


def load_queries(path):
    with open(path) as f:
        d = json.load(f)
    qs = d.get("queries")
    if not isinstance(qs, dict) and isinstance(d.get("parsed"), dict):
        # the driver's BENCH_rN.json wraps the bench's compact stdout
        # line under "parsed"
        qs = d["parsed"].get("queries")
    if not isinstance(qs, dict):
        sys.exit(f"{path}: no 'queries' map")
    return {k: v for k, v in qs.items() if isinstance(v, (int, float)) and v >= 0}


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("a", help="older artifact (BENCH_DETAIL*.json or BENCH_rN.json)")
    ap.add_argument("b", help="newer artifact")
    ap.add_argument("--ratio", type=float, default=1.5,
                    help="band edge: |delta| past this ratio is flagged (default 1.5, "
                         "the measured idle-host drift band)")
    ap.add_argument("--min-sec", type=float, default=0.5,
                    help="ignore queries whose max(A,B) is under this many seconds "
                         "(sub-noise bases produce meaningless ratios)")
    ap.add_argument("--sfdir", default="/root/testdata/sf0.1",
                    help="sfDir for the printed ABTime command")
    ap.add_argument("--sweeps", type=int, default=7,
                    help="ABTime sweeps for the printed command")
    args = ap.parse_args()

    qa, qb = load_queries(args.a), load_queries(args.b)
    shared = sorted(set(qa) & set(qb))
    if not shared:
        sys.exit("no shared queries between the two artifacts")

    flagged = []
    for q in shared:
        a, b = qa[q], qb[q]
        if max(a, b) < args.min_sec or min(a, b) <= 0:
            continue
        r = b / a
        if r > args.ratio or r < 1 / args.ratio:
            flagged.append((q, a, b, r))

    print(f"# ab_gate: {len(shared)} shared queries, band ±{args.ratio}x, "
          f"floor {args.min_sec}s")
    if not flagged:
        print("# no per-query delta outside the drift band -- nothing to adjudicate")
        return 0

    flagged.sort(key=lambda t: -max(t[3], 1 / t[3]))
    for q, a, b, r in flagged:
        print(f"FLAG {q:42s} A={a:8.3f}s  B={b:8.3f}s  B/A={r:6.2f}x")

    names = " ".join(q for q, *_ in flagged)
    print("\n# adjudicate in ONE session (read the MIN against both artifacts):")
    print(f'sbt -batch "runMain graft.tools.ABTime {args.sfdir} {args.sweeps} {names}"')
    print("# or, if sbt's lock is held (see memory: direct-jvm-spark-runner):")
    print(f"#   java <add-opens> -Xmx48g -cp 'target/scala-2.13/classes:/opt/spark/jars/*' \\")
    print(f"#     graft.tools.ABTime {args.sfdir} {args.sweeps} {names}")
    print("\n# SCALE.md ledger row template (fill from the ABTIME lines):")
    for q, a, b, r in flagged:
        print(f"# | {q} | A {a:.2f}s vs B {b:.2f}s ({r:.2f}x) | "
              f"ABTime min=__ med=__ -> verdict: host-window / real |")
    return 1


if __name__ == "__main__":
    sys.exit(main())
