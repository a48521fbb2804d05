#!/usr/bin/env python3
"""Local mirror of the driver's t2 gate: run graft.Verify output against
DuckDB oracles and compare values (sorted columns, sorted rows).

Usage: python3 scripts/check_oracle.py <sfDir> <verifyOutDir> [query ...]

With no query names, this is a FULL-run check: every oracle entry must have
an output dir, and a missing one is a FAILURE (a crashed sweep must not
exit 0). Passing explicit query names checks only those (the single-query
iteration loop) — partial mode is an explicit request, never inferred from
how many output dirs happen to exist.
"""
import json
import math
import os
import sys

import duckdb
import numpy as np

TABLES = ["region", "nation", "customer", "supplier", "part", "orders",
          "lineitem", "events", "documents", "embeddings"]


def canon(v):
    # Type-tagged so an int64 Spark column vs a HUGEINT/float64 oracle column
    # (e.g. DuckDB sum() over integers -> HUGEINT -> pandas float64) is a
    # FAIL locally, matching the driver's dtype-sensitive hasher.
    if isinstance(v, (bool, np.bool_)):
        return f"b:{v}"
    if isinstance(v, (float, np.floating)):
        if math.isnan(v):
            return "f:nan"
        return f"f:{v:.9g}"
    if isinstance(v, (int, np.integer)):
        return f"i:{v}"
    return str(v)


def frame(rel):
    # Go through pandas (.df()) like the driver does: DuckDB HUGEINT becomes
    # float64 there (not Python int as with fetchall), so dtype drift between
    # the Spark output and the oracle is visible locally.
    df = rel.df()
    cols = sorted(df.columns)
    df = df[cols]
    out = sorted(tuple(canon(v) for v in row) for row in df.itertuples(index=False, name=None))
    return cols, out


def main(sf_dir, out_dir, only=()):
    con = duckdb.connect()
    for t in TABLES:
        con.sql(f"CREATE VIEW {t} AS SELECT * FROM '{sf_dir}/{t}.parquet'")
    oracle = json.load(open(f"{out_dir}/oracle_sql.json"))
    unknown = [q for q in only if q not in oracle]
    if unknown:
        print(f"FAIL: unknown query name(s) {unknown} (not in oracle_sql.json)")
        return 1
    n_pass = n_fail = n_skip = 0
    for name, sql in sorted(oracle.items()):
        # explicit partial mode: check only the requested queries
        if only and name not in only:
            n_skip += 1
            continue
        if not os.path.isdir(f"{out_dir}/{name}"):
            print(f"FAIL {name}: no output dir")
            n_fail += 1
            continue
        try:
            got = frame(con.sql(
                f"SELECT * FROM '{out_dir}/{name}/*.parquet'"))
        except Exception as e:
            print(f"FAIL {name}: spark output unreadable: {e}")
            n_fail += 1
            continue
        try:
            exp = frame(con.sql(sql))
        except Exception as e:
            print(f"FAIL {name}: oracle sql error: {e}")
            n_fail += 1
            continue
        if got[0] != exp[0]:
            print(f"FAIL {name}: columns {got[0]} != {exp[0]}")
            n_fail += 1
        elif got[1] != exp[1]:
            diffs = [(a, b) for a, b in zip(got[1], exp[1]) if a != b]
            print(f"FAIL {name}: {len(got[1])} vs {len(exp[1])} rows, "
                  f"first diffs: {diffs[:3]}")
            n_fail += 1
        else:
            print(f"PASS {name} ({len(got[1])} rows)")
            n_pass += 1
    skipped = f", {n_skip} skipped (not requested)" if n_skip else ""
    print(f"\n{n_pass} pass, {n_fail} fail{skipped}")
    return 1 if n_fail else 0


if __name__ == "__main__":
    sys.exit(main(sys.argv[1], sys.argv[2], tuple(sys.argv[3:])))
