#!/usr/bin/env python3
"""Per-query bench regression tripwire (round-10 VERDICT item 6).

Usage: python3 tools/bench_diff.py OLD.json NEW.json [--threshold 1.5]

Accepts either bench artifact shape:
  - the repo's own `bench/rN.json` (one JSON object with a "queries" map), or
  - the driver's `BENCH_rN.json` wrapper (the JSON line lives inside "tail").

Prints every query whose NEW/OLD ratio exceeds the threshold (regressions)
or falls below 1/threshold (wins), plus totals, and exits 1 when any
regression also moved by more than --abs-floor seconds (sub-0.15 s absolute
moves are run-spread noise at sf0.1, not regressions worth failing on).
"""
import argparse
import json
import re
import sys


def load_queries(path):
    """Returns (queries_min, queries_median_or_None, total_or_None).

    The median map ("queries_median", emitted since r13) is the stabler
    statistic for regression diffing — min-of-3 rewards one lucky run while
    median-of-3 absorbs one spiked run; `main` diffs on it when BOTH
    artifacts carry it, else falls back to the min map.
    """
    with open(path) as f:
        doc = json.load(f)
    if "queries" in doc and isinstance(doc["queries"], dict):
        return doc["queries"], doc.get("queries_median"), doc.get("value")
    # driver wrapper: prefer the pre-parsed bench object when present
    parsed = doc.get("parsed")
    if isinstance(parsed, dict) and isinstance(parsed.get("queries"), dict):
        return parsed["queries"], parsed.get("queries_median"), parsed.get("value")
    # otherwise the bench JSON line is embedded in "tail" — and the driver
    # truncates long tails from the FRONT, so the '"queries":{' marker (and
    # any prefix keys like the total) may be gone. Recover what survives.
    tail = doc.get("tail", "")
    m = re.search(r'"queries":\{', tail)
    if m:
        start = m.end() - 1
        depth, end = 0, None
        for i in range(start, len(tail)):
            if tail[i] == "{":
                depth += 1
            elif tail[i] == "}":
                depth -= 1
                if depth == 0:
                    end = i + 1
                    break
        if end is None:
            # truncated after the marker but before the map closes:
            # fall through to the pair-scan over the partial map
            m = None
        else:
            queries = json.loads(tail[start:end])
            med = None
            mm = re.search(r'"queries_median":\{', tail)
            if mm:
                try:
                    dec = json.JSONDecoder()
                    med, _ = dec.raw_decode(tail[mm.end() - 1:])
                except ValueError:
                    med = None
            # total only trusted when anchored to the untruncated key order
            tm = re.search(r'"metric":"[^"]*","value":([0-9.]+)', tail)
            return queries, med, (float(tm.group(1)) if tm else None)
    if not m:
        # front-truncated tail: regex-collect the '"name": float' pairs up to
        # the '},"errors"' terminator (the queries map is the only place the
        # bench line holds a flat name->seconds map). The result is PARTIAL —
        # the caller diffs the key intersection, which is exactly what a
        # regression tripwire needs.
        end = tail.find('},"errors"')
        # keep the closing brace so the LAST pair retains its delimiter
        body = tail[:end + 1] if end >= 0 else tail
        # don't let the r13+ median map's pairs shadow the min map's
        med_cut = body.find('},"queries_median"')
        if med_cut >= 0:
            body = body[:med_cut + 1]
        # delimiter lookahead so a scientific-notation time ("q":8.7E-4 from
        # a sub-ms erroring query) is SKIPPED rather than torn to 8.7 s —
        # a torn value would fabricate a phantom 10000x regression
        pairs = [(mm.start(), mm.group(1), mm.group(2)) for mm in
                 re.finditer(r'"([A-Za-z0-9_]+)":([0-9]+\.[0-9]+)(?=[,}])', body)]
        # a cut mid-key leaves a torn first name ('edia_neardup') — only keep
        # the first pair when its opening quote is properly delimited
        if pairs and pairs[0][0] > 0 and body[pairs[0][0] - 1] not in ",{":
            pairs = pairs[1:]
        queries = {k: float(v) for _, k, v in pairs
                   if k not in ("value", "sf")}
        if not queries:
            sys.exit(f"{path}: no queries map found")
        print(f"note: {path} tail is front-truncated; "
              f"recovered {len(queries)} queries, total unavailable")
        return queries, None, None


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("old")
    ap.add_argument("new")
    ap.add_argument("--threshold", type=float, default=1.5)
    ap.add_argument("--abs-floor", type=float, default=0.15,
                    help="ignore regressions smaller than this in seconds")
    args = ap.parse_args()

    old_q, old_med, old_total = load_queries(args.old)
    new_q, new_med, new_total = load_queries(args.new)
    if isinstance(old_med, dict) and isinstance(new_med, dict):
        print("stat: median-of-3 (both artifacts carry queries_median)")
        old_q, new_q = old_med, new_med
        # keep the total line on the SAME statistic as the per-query diffs —
        # mixing a min-based total over median-based sums reads as a phantom
        # discrepancy (the artifacts' "value" field is the min-of-3 headline)
        old_total = sum(old_q.values())
        new_total = sum(new_q.values())
    else:
        print("stat: min-of-3 (median map absent on at least one side)")

    shared = sorted(set(old_q) & set(new_q))
    added = sorted(set(new_q) - set(old_q))
    removed = sorted(set(old_q) - set(new_q))

    regressions, wins = [], []
    for q in shared:
        o, n = old_q[q], new_q[q]
        if o <= 0:
            continue
        ratio = n / o
        if ratio > args.threshold and (n - o) >= args.abs_floor:
            regressions.append((q, o, n, ratio))
        elif ratio < 1 / args.threshold and (o - n) >= args.abs_floor:
            wins.append((q, o, n, ratio))

    like_old = sum(old_q[q] for q in shared)
    like_new = sum(new_q[q] for q in shared)
    print(f"shared queries: {len(shared)}  added: {len(added)}  removed: {len(removed)}")
    if old_total and new_total:
        print(f"total: {old_total:.2f}s -> {new_total:.2f}s")
    print(f"like-for-like sum: {like_old:.2f}s -> {like_new:.2f}s "
          f"({like_new / like_old:.2f}x)" if like_old else "")
    if added:
        print("added:", ", ".join(added))
    if removed:
        print("removed:", ", ".join(removed))
    for tag, rows in (("REGRESSION", regressions), ("win", wins)):
        for q, o, n, r in sorted(rows, key=lambda t: -abs(t[2] - t[1])):
            print(f"{tag:>10}  {q:<28} {o:7.3f}s -> {n:7.3f}s  ({r:.2f}x)")
    if not regressions:
        print("no regressions above "
              f"{args.threshold}x (abs floor {args.abs_floor}s)")
    sys.exit(1 if regressions else 0)


if __name__ == "__main__":
    main()
