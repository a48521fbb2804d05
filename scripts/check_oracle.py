#!/usr/bin/env python3
"""Local mirror of the driver's t2 gate: run graft.Verify output against
DuckDB oracles and compare values (sorted columns, sorted rows).

Usage: python3 scripts/check_oracle.py <sfDir> <verifyOutDir>
"""
import json
import math
import sys

import duckdb

TABLES = ["region", "nation", "customer", "supplier", "part", "orders",
          "lineitem", "events", "documents", "embeddings"]


def canon(v):
    if isinstance(v, float):
        if math.isnan(v):
            return "nan"
        return f"{v:.9g}"
    return str(v)


def frame(rows, cols):
    idx = sorted(range(len(cols)), key=lambda i: cols[i])
    out = [tuple(canon(r[i]) for i in idx) for r in rows]
    return sorted(cols), sorted(out)


def main(sf_dir, out_dir):
    con = duckdb.connect()
    for t in TABLES:
        con.sql(f"CREATE VIEW {t} AS SELECT * FROM '{sf_dir}/{t}.parquet'")
    oracle = json.load(open(f"{out_dir}/oracle_sql.json"))
    n_pass = n_fail = 0
    for name, sql in sorted(oracle.items()):
        try:
            got_rel = con.sql(
                f"SELECT * FROM '{out_dir}/{name}/*.parquet'")
            got = frame(got_rel.fetchall(), got_rel.columns)
        except Exception as e:
            print(f"FAIL {name}: spark output unreadable: {e}")
            n_fail += 1
            continue
        try:
            exp_rel = con.sql(sql)
            exp = frame(exp_rel.fetchall(), exp_rel.columns)
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
    print(f"\n{n_pass} pass, {n_fail} fail")
    return 1 if n_fail else 0


if __name__ == "__main__":
    sys.exit(main(sys.argv[1], sys.argv[2]))
