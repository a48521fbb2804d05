#!/usr/bin/env python3
"""Bench regression gate: compare two bench JSONs per query and flag
regressions that nobody annotated.

Usage:
    python3 scripts/bench_compare.py OLD.json NEW.json \
        [--threshold 2.0] [--min-abs 0.5] [--waivers scripts/bench_waivers.txt]

Accepts both artifact shapes:
  * a pinned local run: the Bench main's own JSON line
    ({"metric": ..., "queries": {...}, ...});
  * a driver round file (BENCH_rNN.json) whose "tail" embeds (possibly
    truncated) runner output — per-query seconds are regex-scraped, so a
    truncated head still yields the surviving tail queries.

A query REGRESSES when new/old > threshold AND (new - old) > min-abs
seconds (tiny queries flap multiplicatively under host load; sub-second
deltas are noise, not regressions). Waived queries (one per line:
`qname  reason...`) are reported but don't fail the gate — the waiver
file is the paper trail for intentional changes (q58 growing a real
sample decode, etc.). Exit 1 iff any unwaived regression remains, so a
round script can gate on it.
"""
import argparse
import json
import re
import sys


def load_queries(path):
    with open(path) as f:
        data = json.load(f)
    if isinstance(data, dict):
        if isinstance(data.get("queries"), dict):
            return {k: float(v) for k, v in data["queries"].items()}
        parsed = data.get("parsed")
        if isinstance(parsed, dict) and isinstance(parsed.get("queries"), dict):
            return {k: float(v) for k, v in parsed["queries"].items()}
        tail = data.get("tail")
        if isinstance(tail, str):
            # scrape whatever per-query pairs survived truncation
            pairs = re.findall(r'"(q\d+[a-z0-9_]*)":\s*([0-9.]+)', tail)
            out = {}
            for k, v in pairs:
                out[k] = float(v)  # last occurrence wins (the final rep)
            if out:
                return out
    raise SystemExit(f"{path}: no per-query timings found")


def load_waivers(path):
    waivers = {}
    try:
        with open(path) as f:
            for line in f:
                line = line.strip()
                if not line or line.startswith("#"):
                    continue
                parts = line.split(None, 1)
                waivers[parts[0]] = parts[1] if len(parts) > 1 else ""
    except FileNotFoundError:
        pass
    return waivers


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("old")
    ap.add_argument("new")
    ap.add_argument("--threshold", type=float, default=2.0)
    ap.add_argument("--min-abs", type=float, default=0.5)
    ap.add_argument("--waivers", default="scripts/bench_waivers.txt")
    args = ap.parse_args()

    old = load_queries(args.old)
    new = load_queries(args.new)
    waivers = load_waivers(args.waivers)
    common = sorted(set(old) & set(new))
    print(f"comparing {len(common)} common queries "
          f"({len(old)} old, {len(new)} new)")

    failed = []
    for q in common:
        o, n = old[q], new[q]
        if o <= 0:
            continue
        ratio = n / o
        if ratio > args.threshold and (n - o) > args.min_abs:
            tag = f"WAIVED ({waivers[q]})" if q in waivers else "REGRESSION"
            print(f"  {tag:<12} {q}: {o:.2f}s -> {n:.2f}s ({ratio:.1f}x)")
            if q not in waivers:
                failed.append(q)
    improved = sum(1 for q in common if old[q] > 0 and new[q] / old[q] < 0.5
                   and (old[q] - new[q]) > args.min_abs)
    print(f"{len(failed)} unwaived regression(s); {improved} >2x improvement(s)")
    sys.exit(1 if failed else 0)


if __name__ == "__main__":
    main()
