"""r13 optimization-round profiler (guide §1: measure first).

For each bench query (+ any extras passed on argv): capture
``.explain("formatted")`` into plans/r13/<q>_<tag>.txt, then time N reps of
the bench's own action (``fn(spark, sf_dir).collect()`` — same methodology
as bench.py so numbers are comparable) and, separately, the noop-sink wall
(guide §1.4: computation only, no row fetch) so driver-fetch cost is
attributable. Prints one JSON line per query and a sorted summary.

Usage: python probe_r13_profile.py [tag] [query ...]
  tag defaults to "before"; queries default to bench.BENCH_QUERIES.
"""

from __future__ import annotations

import json
import os
import re
import statistics
import sys
import time

from bench import BENCH_QUERIES, _canary_wall
from consumer_loans_analysis_spark.plans import registry
from consumer_loans_analysis_spark.session import get_spark


def plan_stats(plan: str) -> dict:
    return {
        "exchanges": len(re.findall(r"\bExchange\b", plan)),
        "bhj": len(re.findall(r"\bBroadcastHashJoin\b", plan)),
        "smj": len(re.findall(r"\bSortMergeJoin\b", plan)),
        "shj": len(re.findall(r"\bShuffledHashJoin\b", plan)),
        "bnlj": len(re.findall(r"\bBroadcastNestedLoopJoin\b", plan)),
        "window": len(re.findall(r"\bWindow\b", plan)),
        "python": len(
            re.findall(r"BatchEvalPython|ArrowEvalPython|MapInPandas|FlatMapGroupsInPandas", plan)
        ),
        "sort": len(re.findall(r"^\s*[+:]?-? ?\*?\(?\d*\)? ?Sort ", plan, re.M)),
    }


def main() -> None:
    tag = sys.argv[1] if len(sys.argv) > 1 else "before"
    names = sys.argv[2:] or list(BENCH_QUERIES)
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    reps = int(os.environ.get("SPARK_GRAFT_PROFILE_REPS", "3"))
    out_dir = os.environ.get("SPARK_GRAFT_PROFILE_OUT") or os.path.join(
        os.path.dirname(os.path.abspath(__file__)), "plans", "r13"
    )
    os.makedirs(out_dir, exist_ok=True)

    registry.load_all()
    spark = get_spark("r13-profile")
    # engine warmup only (bench.py discipline): codegen, python workers
    from bench import _warmup

    _warmup(spark, sf_dir)

    rows = []
    for name in names:
        fn = registry.QUERIES[name]
        spark.sparkContext.setJobDescription(f"r13-profile: {name}")
        # plan capture (one extra construction; queries are path-keyed pure
        # functions so this does not warm anything the timed reps reuse)
        try:
            df = fn(spark, sf_dir)
            plan = df._sc._jvm.PythonSQLUtils.explainString(
                df._jdf.queryExecution(), "formatted"
            )
        except Exception:
            import traceback

            plan = "PLAN CAPTURE FAILED\n" + traceback.format_exc()
        with open(os.path.join(out_dir, f"{name}_{tag}.txt"), "w") as fh:
            fh.write(plan)
        stats = plan_stats(plan)
        # timed reps: bench methodology (collect) — comparable to BENCH_r*.json
        secs, canaries = [], []
        for _ in range(reps):
            spark.catalog.clearCache()
            canaries.append(round(_canary_wall(spark), 3))
            t0 = time.perf_counter()
            fn(spark, sf_dir).collect()
            secs.append(round(time.perf_counter() - t0, 3))
        # noop sink (guide §1.4): computation-only wall, one rep
        spark.catalog.clearCache()
        t0 = time.perf_counter()
        fn(spark, sf_dir).write.format("noop").mode("overwrite").save()
        noop = round(time.perf_counter() - t0, 3)
        rec = {
            "q": name,
            "median": round(statistics.median(secs), 3),
            "reps": secs,
            "noop": noop,
            "canary": canaries,
            **stats,
        }
        rows.append(rec)
        print(json.dumps(rec), flush=True)
        spark.sparkContext.setJobDescription(None)

    rows.sort(key=lambda r: -r["median"])
    print("\n=== slowest first ===")
    for r in rows:
        print(
            f'{r["median"]:8.3f}s (noop {r["noop"]:7.3f}s) ex={r["exchanges"]:2d} '
            f'py={r["python"]} bhj={r["bhj"]} smj={r["smj"]} {r["q"]}'
        )
    print(json.dumps({"total_median": round(sum(r["median"] for r in rows), 3),
                      "tag": tag, "sf_dir": sf_dir}))


if __name__ == "__main__":
    main()
