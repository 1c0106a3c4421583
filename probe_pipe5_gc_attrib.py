"""Attribute pipe5's intra-run wall variance: 10 reps in one fresh
session, per-rep wall vs JVM GC time/count (GarbageCollectorMXBeans)
and heap use. Explicit gc between reps, same as bench.py.

r12 final-session result (committed so r13 does not re-chase GC):
GC time is NOT the wall driver — 112-555 ms of collection per rep
against 7.3-10.1 s walls; rep 0 pays ~27 s of session JIT/worker
warmup; the remaining ~1.4x spread is stage-latency jitter across the
plan's ~16-Exchange sequential stage chain. Run from the repo root:
PYTHONPATH=. python probe_pipe5_gc_attrib.py"""
import gc
import json
import time

from consumer_loans_analysis_spark.session import get_spark
from consumer_loans_analysis_spark.plans import datapipe_queries as dq

SF_DIR = "/root/testdata/sf0.1"


def gc_totals(spark):
    jvm = spark.sparkContext._jvm
    beans = jvm.java.lang.management.ManagementFactory.getGarbageCollectorMXBeans()
    t = c = 0
    it = beans.iterator()
    while it.hasNext():
        b = it.next()
        # a collector that does not support the metric returns -1; clamp
        # so it cannot skew the summed deltas (ADVICE r12)
        t += max(0, b.getCollectionTime())
        c += max(0, b.getCollectionCount())
    mem = jvm.java.lang.management.ManagementFactory.getMemoryMXBean()
    used = mem.getHeapMemoryUsage().getUsed()
    return t, c, used


def main():
    spark = get_spark()
    recs = []
    for i in range(10):
        gc.collect()
        spark.sparkContext._jvm.System.gc()
        spark.catalog.clearCache()
        g0, c0, u0 = gc_totals(spark)
        t0 = time.perf_counter()
        rows = dq.pipe5_fluency_curation(spark, SF_DIR).collect()
        dt = time.perf_counter() - t0
        g1, c1, u1 = gc_totals(spark)
        rec = {
            "rep": i,
            "wall_s": round(dt, 3),
            "gc_ms": g1 - g0,
            "gc_n": c1 - c0,
            "heap_pre_mb": round(u0 / 1e6),
            "heap_post_mb": round(u1 / 1e6),
            "rows": len(rows),
        }
        recs.append(rec)
        print(json.dumps(rec), flush=True)
    walls = sorted(r["wall_s"] for r in recs)
    print(json.dumps({"min": walls[0], "median": walls[len(walls) // 2],
                      "max": walls[-1]}))


if __name__ == "__main__":
    main()
