#!/usr/bin/env python3
"""Local dev harness mirroring the driver's DuckDB-oracle compare.

Usage: python3 tools/compare.py [sf_dir] [verify_out]

For each query in verify_out/oracle_sql.json: run the SQL in DuckDB
(tables = views over sf_dir parquet), read the Spark parquet result,
compare schemas + sorted rows. Dev tool only — not part of the
shipped library.
"""
import json
import sys

import duckdb

TABLES = "region nation customer supplier part orders lineitem events documents embeddings".split()


def main():
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
    out = sys.argv[2] if len(sys.argv) > 2 else "/tmp/verify_out"
    con = duckdb.connect()
    for t in TABLES:
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM '{sf_dir}/{t}.parquet'")
    oracle = json.load(open(f"{out}/oracle_sql.json"))
    n_pass = n_fail = 0
    for name, sql in sorted(oracle.items()):
        try:
            exp = con.sql(sql)
            exp_cols = sorted(exp.columns)
            exp_sorted = con.sql(
                f"SELECT {', '.join(exp_cols)} FROM exp ORDER BY ALL")
            exp_types = [str(t) for t in exp_sorted.types]
            exp_rows = exp_sorted.fetchall()
        except Exception as e:
            print(f"FAIL {name}: oracle error: {e}")
            n_fail += 1
            continue
        # The driver's hasher is TYPE-sensitive: a DuckDB HUGEINT
        # (uncast sum()/`//`) hashes differently from Spark's BIGINT
        # even when every value is equal. Reject such oracles outright
        # so a local PASS implies a driver PASS (VERDICT r7 #2).
        wide = [c for c, t in zip(exp_cols, exp_types)
                if "HUGEINT" in t or "DECIMAL" in t]
        if wide:
            print(f"FAIL {name}: oracle projects non-BIGINT-safe types "
                  f"{[(c, t) for c, t in zip(exp_cols, exp_types) if c in wide]}"
                  f" — add CAST(... AS BIGINT)")
            n_fail += 1
            continue
        try:
            got = con.sql(f"SELECT * FROM '{out}/{name}/*.parquet'")
            got_cols = sorted(got.columns)
            got_sorted = con.sql(
                f"SELECT {', '.join(got_cols)} FROM got ORDER BY ALL")
            got_types = [str(t) for t in got_sorted.types]
            got_rows = got_sorted.fetchall()
        except Exception as e:
            print(f"FAIL {name}: spark result error: {e}")
            n_fail += 1
            continue
        if exp_cols != got_cols:
            print(f"FAIL {name}: columns {got_cols} != {exp_cols}")
            n_fail += 1
        elif exp_types != got_types:
            print(f"FAIL {name}: types {got_types} != {exp_types}")
            n_fail += 1
        elif exp_rows != got_rows:
            diff = [
                (a, b) for a, b in zip(exp_rows, got_rows) if a != b
            ][:3]
            print(
                f"FAIL {name}: {len(exp_rows)} vs {len(got_rows)} rows; first diffs {diff}")
            n_fail += 1
        else:
            print(f"PASS {name} ({len(got_rows)} rows)")
            n_pass += 1
    print(f"== {n_pass} pass, {n_fail} fail ==")
    sys.exit(1 if n_fail else 0)


if __name__ == "__main__":
    main()
