#!/usr/bin/env python3
"""Local mirror of the driver's correctness gate (dev tooling, not engine
code): load each Verify output parquet, run the matching oracle SQL in
DuckDB over the same testdata tables, and compare schema + rows.

Usage: python3 tools/check.py <sfDir> <verifyOutDir>
"""
import json
import sys

import duckdb

TABLES = ["region", "nation", "customer", "supplier", "part", "orders",
          "lineitem", "events", "documents", "embeddings"]


def norm(v):
    """Strict, serialization-faithful form of a value.

    The driver gate hashes a SERIALIZED representation of each row, so
    Python cross-type equality (Decimal(5) == 5.0) is too lenient: round 1
    shipped 9 queries whose values matched but whose decimal serializations
    hashed differently.  repr() keeps the type visible (Decimal('5.00') vs
    5.0) and floats exact (no rounding), matching the driver's behavior.
    """
    if isinstance(v, list):
        return tuple(norm(x) for x in v)
    return repr(v)


def main(sf_dir, out_dir):
    con = duckdb.connect()
    for t in TABLES:
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{sf_dir}/{t}.parquet')")
    oracle = json.load(open(f"{out_dir}/oracle_sql.json"))
    failed = []
    for name, sql in sorted(oracle.items()):
        try:
            got = con.sql(
                f"SELECT * FROM read_parquet('{out_dir}/{name}/*.parquet')")
            got_cols = sorted(got.columns)
            got_rows = [tuple(norm(v) for _, v in sorted(zip(got.columns, r)))
                        for r in got.fetchall()]
        except Exception as e:
            print(f"FAIL {name}: spark output unreadable: {e}")
            failed.append(name)
            continue
        try:
            exp = con.sql(sql)
            exp_cols = sorted(exp.columns)
            exp_rows = [tuple(norm(v) for _, v in sorted(zip(exp.columns, r)))
                        for r in exp.fetchall()]
        except Exception as e:
            print(f"FAIL {name}: oracle error: {e}")
            failed.append(name)
            continue
        if got_cols != exp_cols:
            print(f"FAIL {name}: columns {got_cols} != {exp_cols}")
            failed.append(name)
            continue
        if len(got_rows) != len(exp_rows):
            print(f"FAIL {name}: rows {len(got_rows)} != {len(exp_rows)}")
            failed.append(name)
            continue
        bad = [(i, a, b) for i, (a, b) in enumerate(zip(got_rows, exp_rows)) if a != b]
        if bad:
            i, a, b = bad[0]
            print(f"FAIL {name}: {len(bad)}/{len(got_rows)} rows differ; first at {i}:")
            print(f"  spark : {a}")
            print(f"  duckdb: {b}")
            failed.append(name)
        else:
            print(f"OK   {name} ({len(got_rows)} rows)")
    print(f"\n{len(oracle) - len(failed)}/{len(oracle)} queries match")
    return 1 if failed else 0


if __name__ == "__main__":
    sys.exit(main(sys.argv[1], sys.argv[2]))
