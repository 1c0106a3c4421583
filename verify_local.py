"""Local replica of the driver's correctness gate.

Runs every ``queries()`` entry on Spark and its ``oracle_sql()`` on DuckDB
over the same parquet (default sf0.01), compares row count, sorted column
names, and order-insensitive values (floats rounded), and prints a one-line
verdict per query. Use while iterating:

    python verify_local.py [sf_dir] [query ...]

Faithful to the driver's environment (lessons from CORRECTNESS_r01):
- the Spark session runs with ANSI **enabled** (Spark 4 default — the driver
  controls its own session, not ``get_spark``'s permissive defaults), and
- both sides canonicalize **via pandas** (``toPandas`` / duckdb ``.df()``),
  so type artifacts the driver sees (DuckDB HUGEINT -> float64 vs Spark
  long) also show up here instead of being masked by ``fetchall``'s ints.
"""

from __future__ import annotations

import math
import sys
import time
import traceback

import duckdb
import pandas as pd

import __spark_entry__ as entry_mod
from consumer_loans_analysis_spark.schemas import TESTDATA_TABLES
from consumer_loans_analysis_spark.session import get_spark

# Float comparison precision (decimal places) for the value-hash compare —
# mirrors the driver's rounding. NOT a round number (r7 VERDICT misread).
FLOAT_DECIMALS = 6


def canon_pdf(pdf: pd.DataFrame):
    """Order-insensitive canonical form over a pandas frame: sort columns by
    name, round floats, stringify, sort rows — mirrors the driver's compare."""
    pdf = pdf[sorted(pdf.columns)]
    out = []
    for row in pdf.itertuples(index=False):
        vals = []
        for v in row:
            if isinstance(v, float):
                if math.isnan(v):
                    v = "NaN"
                else:
                    v = round(v, FLOAT_DECIMALS)
                    v = 0.0 if v == 0 else v
                    v = f"{v:.{FLOAT_DECIMALS}f}"
            vals.append(str(v))
        out.append("|".join(vals))
    out.sort()
    return out


def main() -> int:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
    only = set(sys.argv[2:])
    # ANSI ON to mirror the driver's session (Spark 4 default) — every
    # registered query must survive it.
    spark = get_spark(
        "verify_local", extra_configs={"spark.sql.ansi.enabled": "true"}
    )
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
            spark_pdf = df.toPandas()
        except Exception:
            print(f"FAIL {name}: spark error")
            traceback.print_exc(limit=3)
            n_fail += 1
            continue
        dt = time.time() - t0
        if name not in oracles:
            print(f"WEAK {name}: rows-only ({len(spark_pdf)} rows, {dt:.1f}s)")
            n_weak += 1
            continue
        try:
            duck_pdf = con.execute(oracles[name]).df()
        except Exception:
            print(f"FAIL {name}: duckdb error")
            traceback.print_exc(limit=3)
            n_fail += 1
            continue
        if sorted(spark_pdf.columns) != sorted(duck_pdf.columns):
            print(
                f"FAIL {name}: columns {sorted(spark_pdf.columns)}"
                f" != {sorted(duck_pdf.columns)}"
            )
            n_fail += 1
            continue
        if len(spark_pdf) != len(duck_pdf):
            print(f"FAIL {name}: rowcount {len(spark_pdf)} != {len(duck_pdf)}")
            n_fail += 1
            continue
        cs = canon_pdf(spark_pdf)
        cd = canon_pdf(duck_pdf)
        if cs != cd:
            bad = [(a, b) for a, b in zip(cs, cd) if a != b][:3]
            print(f"FAIL {name}: value mismatch, e.g. {bad}")
            n_fail += 1
            continue
        print(f"PASS {name} ({len(spark_pdf)} rows, {dt:.1f}s)")
        n_pass += 1
    print(f"\n{n_pass} pass / {n_weak} weak / {n_fail} fail")
    return 1 if n_fail else 0


if __name__ == "__main__":
    raise SystemExit(main())
