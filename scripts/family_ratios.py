#!/usr/bin/env python3
"""Per-family sf0.1 -> sf1 scaling table for SCALE.md.

Usage: python3 scripts/family_ratios.py <base.json> <scaled.json>

Families follow SCALE.md's section structure (coarse: a query belongs
to the family whose work dominates it). A 10x corpus with linear
operators and nonzero fixed per-query overhead should land BELOW 10x;
families above ~12x need an explanation (complexity class, measured
host variance) or a fix.
"""
import json, sys, re

FAMILIES = {
    "scan/filter/project": ["q0", "q10", "q11", "q12", "q38", "q43"],
    "aggregation/rollup": ["q1", "q13", "q14", "q15", "q16", "q17", "q18",
                           "q21", "q23", "q35", "q37", "q39", "q54", "q95",
                           "q106", "q108", "q196", "q206", "q208"],
    "joins": ["q3", "q4", "q5", "q6", "q7", "q19", "q20", "q40", "q56",
              "q99", "q166", "q183"],
    "windows/ranks": ["q2", "q9", "q22", "q49", "q107", "q170", "q174",
                      "q179", "q184", "q192", "q197", "q200"],
    "set ops": ["q8", "q42"],
    "dedup/similarity": ["q24", "q25", "q26", "q27", "q28", "q50", "q55", "q175",
                         "q57", "q58", "q60", "q65", "q90", "q98", "q101",
                         "q155", "q159", "q160", "q167", "q168", "q211"],
    "vector search": ["q29", "q30", "q41", "q81", "q83", "q88", "q96",
                      "q140", "q149", "q157", "q187", "q205", "q212",
                      "q213", "q214", "q216", "q218", "q219", "q221"],
    "retrieval/ranking": ["q84", "q94", "q202", "q217", "q220"],
    "text analysis": ["q31", "q32", "q33", "q34", "q52", "q59", "q74",
                      "q75", "q78", "q85", "q154", "q189", "q194", "q198",
                      "q204", "q215"],
    "curation/mixing": ["q51", "q53", "q61", "q62", "q63", "q64", "q66",
                        "q67", "q68", "q69", "q70", "q71", "q72", "q73",
                        "q76", "q77", "q79", "q80", "q82", "q86", "q87",
                        "q89", "q92", "q105", "q201", "q209"],
    "graph": ["q100", "q102", "q103", "q112", "q147", "q156", "q171",
              "q172", "q203"],
    "temporal/state": ["q104", "q110", "q111", "q113", "q114", "q118",
                       "q119", "q139", "q150", "q185"],
    "behavioral/funnel": ["q44", "q45", "q46", "q47", "q48", "q120",
                          "q121", "q122", "q123", "q124", "q133", "q134",
                          "q137", "q146"],
    "stats/profiling": ["q91", "q93", "q109", "q115", "q116", "q117",
                        "q125", "q126", "q127", "q128", "q129", "q130",
                        "q131", "q132", "q135", "q136", "q138", "q141",
                        "q142", "q143", "q144", "q145", "q148", "q151",
                        "q161", "q163", "q165", "q169", "q176", "q177",
                        "q178", "q180", "q181", "q182", "q186", "q188",
                        "q190", "q191", "q193", "q199"],
    "privacy": ["q97", "q162", "q195"],
    "layout/maintenance": ["q164", "q173", "q207", "q210"],
    "multimodal": ["q36", "q152", "q153", "q158"],
}


def load(p):
    d = json.load(open(p))
    return d["queries"] if "queries" in d else d


def fam_of(q):
    m = re.match(r"(q\d+)_", q)
    if not m:
        return "other"
    stem = m.group(1)
    for f, stems in FAMILIES.items():
        if stem in stems:
            return f
    return "other"


def main(base_p, scaled_p):
    base, scaled = load(base_p), load(scaled_p)
    agg = {}
    for q in sorted(set(base) & set(scaled)):
        if base[q] < 0 or scaled[q] < 0:
            continue
        f = fam_of(q)
        b, s, n, worst = agg.get(f, (0.0, 0.0, 0, ("", 0.0)))
        r = scaled[q] / base[q] if base[q] > 0 else 0
        if r > worst[1] and base[q] >= 0.2:
            worst = (q, r)
        agg[f] = (b + base[q], s + scaled[q], n + 1, worst)
    print(f"| family | n | sf0.1 s | sf1 s | ratio | worst query (base>=0.2s) |")
    print(f"|---|---|---|---|---|---|")
    for f, (b, s, n, worst) in sorted(agg.items(), key=lambda kv: -kv[1][1]):
        w = f"{worst[0]} {worst[1]:.1f}x" if worst[0] else "-"
        ratio = f"{s/b:.1f}x" if b > 0 else "-"
        print(f"| {f} | {n} | {b:.1f} | {s:.1f} | {ratio} | {w} |")
    tb = sum(v[0] for v in agg.values())
    ts = sum(v[1] for v in agg.values())
    tr = f"{ts/tb:.1f}x" if tb > 0 else "-"
    print(f"| **total** | {sum(v[2] for v in agg.values())} | {tb:.1f} | "
          f"{ts:.1f} | {tr} | |")


if __name__ == "__main__":
    main(sys.argv[1], sys.argv[2])
