"""Local replica of the driver's correctness gate.

Runs every ``queries()`` entry on Spark and its ``oracle_sql()`` on DuckDB
over the same parquet (default sf0.01), compares row count, sorted column
names, and order-insensitive values (floats rounded), and prints a one-line
verdict per query. Use while iterating:

    python verify_local.py [sf_dir] [query ...]
"""

from __future__ import annotations

import math
import sys
import time
import traceback

import duckdb

import __spark_entry__ as entry_mod
from consumer_loans_analysis_spark.schemas import TESTDATA_TABLES
from consumer_loans_analysis_spark.session import get_spark

ROUND = 6


def canon(rows, colnames):
    """Order-insensitive canonical form: sort columns by name, round floats,
    stringify, sort rows."""
    order = sorted(range(len(colnames)), key=lambda i: colnames[i])
    out = []
    for row in rows:
        vals = []
        for i in order:
            v = row[i]
            if isinstance(v, float):
                if math.isnan(v):
                    v = "NaN"
                else:
                    v = round(v, ROUND)
                    v = 0.0 if v == 0 else v
                    v = f"{v:.{ROUND}f}"
            vals.append(str(v))
        out.append("|".join(vals))
    out.sort()
    return out


def main() -> int:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
    only = set(sys.argv[2:])
    spark = get_spark("verify_local")
    con = duckdb.connect()
    for t in TESTDATA_TABLES:
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM '{sf_dir}/{t}.parquet'"
        )
    queries = entry_mod.queries()
    oracles = entry_mod.oracle_sql()
    n_pass = n_fail = n_weak = 0
    for name, fn in queries.items():
        if only and name not in only:
            continue
        t0 = time.time()
        try:
            df = fn(spark, sf_dir)
            spark_cols = df.columns
            spark_rows = [tuple(r) for r in df.collect()]
        except Exception:
            print(f"FAIL {name}: spark error")
            traceback.print_exc(limit=3)
            n_fail += 1
            continue
        dt = time.time() - t0
        if name not in oracles:
            print(f"WEAK {name}: rows-only ({len(spark_rows)} rows, {dt:.1f}s)")
            n_weak += 1
            continue
        try:
            res = con.execute(oracles[name])
            duck_cols = [d[0] for d in res.description]
            duck_rows = res.fetchall()
        except Exception:
            print(f"FAIL {name}: duckdb error")
            traceback.print_exc(limit=3)
            n_fail += 1
            continue
        if sorted(spark_cols) != sorted(duck_cols):
            print(f"FAIL {name}: columns {sorted(spark_cols)} != {sorted(duck_cols)}")
            n_fail += 1
            continue
        if len(spark_rows) != len(duck_rows):
            print(f"FAIL {name}: rowcount {len(spark_rows)} != {len(duck_rows)}")
            n_fail += 1
            continue
        cs = canon(spark_rows, spark_cols)
        cd = canon(duck_rows, duck_cols)
        if cs != cd:
            bad = [(a, b) for a, b in zip(cs, cd) if a != b][:3]
            print(f"FAIL {name}: value mismatch, e.g. {bad}")
            n_fail += 1
            continue
        print(f"PASS {name} ({len(spark_rows)} rows, {dt:.1f}s)")
        n_pass += 1
    print(f"\n{n_pass} pass / {n_weak} weak / {n_fail} fail")
    return 1 if n_fail else 0


if __name__ == "__main__":
    raise SystemExit(main())
