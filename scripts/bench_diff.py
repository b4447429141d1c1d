#!/usr/bin/env python3
"""Per-query benchmark diff between two committed bench snapshots.

Usage: python3 scripts/bench_diff.py r08 r09  [threshold_pct]

Reads bench/<a>.json and bench/<b>.json (the quiet-box consolidation
snapshots committed each round), prints per-query wall-time deltas
sorted worst-regression-first, and a summary line. Queries present in
only one snapshot are listed separately (added/removed). A row is
flagged REGRESSED when it slowed by more than threshold_pct (default
25%) AND more than 0.3 s absolute — small absolute moves on sub-second
queries are noise, as are contended/retimed measurements (carried
through as annotations so the reader can discount them).

Driver-side helper only — NOT part of the library.
"""
import json
import sys


def load(tag):
    with open(f"bench/{tag}.json") as f:
        d = json.load(f)
    meta = d.pop("_meta", {})
    return meta, d


def main():
    a_tag, b_tag = sys.argv[1], sys.argv[2]
    thr = float(sys.argv[3]) if len(sys.argv) > 3 else 25.0
    ma, qa = load(a_tag)
    mb, qb = load(b_tag)
    common = sorted(set(qa) & set(qb))
    added = sorted(set(qb) - set(qa))
    removed = sorted(set(qa) - set(qb))

    rows = []
    for q in common:
        wa, wb = qa[q]["wall"], qb[q]["wall"]
        pct = (wb - wa) / wa * 100 if wa > 0 else 0.0
        flags = []
        for side, rec in ((a_tag, qa[q]), (b_tag, qb[q])):
            for k in ("contended", "low_par", "retimed", "failed"):
                if rec.get(k):
                    flags.append(f"{side}:{k}")
        reg = pct > thr and (wb - wa) > 0.3
        rows.append((pct, wb - wa, q, wa, wb, reg, flags))
    rows.sort(key=lambda r: -r[0])

    print(f"# bench diff {a_tag} -> {b_tag}  "
          f"(total {ma.get('total_sec', '?')} s / {ma.get('n_queries', '?')} q"
          f"  ->  {mb.get('total_sec', '?')} s / {mb.get('n_queries', '?')} q)")
    n_reg = 0
    for pct, dw, q, wa, wb, reg, flags in rows:
        mark = " REGRESSED" if reg else ""
        n_reg += reg
        note = f"  [{' '.join(flags)}]" if flags else ""
        print(f"{q:40s} {wa:7.2f} -> {wb:7.2f}  {pct:+7.1f}%{mark}{note}")
    for q in added:
        print(f"{q:40s}    (new) -> {qb[q]['wall']:7.2f}")
    for q in removed:
        print(f"{q:40s} {qa[q]['wall']:7.2f} -> (gone)")
    print(f"# {n_reg} regressed beyond {thr}% (+0.3 s abs), "
          f"{len(added)} added, {len(removed)} removed")


if __name__ == "__main__":
    main()
