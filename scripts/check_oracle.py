#!/usr/bin/env python3
"""Local mirror of the driver's t2 gate: run graft.Verify output against
DuckDB oracles and compare values (sorted columns, sorted rows).

Usage: python3 scripts/check_oracle.py <sfDir> <verifyOutDir>
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


def main(sf_dir, out_dir):
    con = duckdb.connect()
    for t in TABLES:
        con.sql(f"CREATE VIEW {t} AS SELECT * FROM '{sf_dir}/{t}.parquet'")
    oracle = json.load(open(f"{out_dir}/oracle_sql.json"))
    n_pass = n_fail = n_skip = 0
    # single-query Verify runs write only their own subdir(s) — skip the
    # rest instead of drowning the report in missing-file FAILs. But a FULL
    # run where one query crashed before writing must stay a FAILURE, so
    # skip-mode only engages when at most half the outputs exist.
    present = sum(os.path.isdir(f"{out_dir}/{n}") for n in oracle)
    partial_run = present <= len(oracle) // 2
    for name, sql in sorted(oracle.items()):
        if not os.path.isdir(f"{out_dir}/{name}"):
            if partial_run:
                n_skip += 1
            else:
                print(f"FAIL {name}: no output dir in a full run")
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
    skipped = f", {n_skip} skipped (no output dir)" if n_skip else ""
    print(f"\n{n_pass} pass, {n_fail} fail{skipped}")
    return 1 if n_fail else 0


if __name__ == "__main__":
    sys.exit(main(sys.argv[1], sys.argv[2]))
