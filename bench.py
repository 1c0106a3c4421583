"""Benchmark harness: headline queries at $SPARK_GRAFT_SF_DIR (default
sf0.1) on local[$SPARK_GRAFT_CPUS].

Prints the full JSON record (one line: diagnostics first, headline scalars
last) followed by a compact summary line {"queries": ..., "legacy_total":
..., "contaminated": ..., "worst_rep": ..., "value": ...} — the FINAL line,
so a truncated stdout tail always keeps the totals (r10 verdict #2).

The set spans the engine's surface: scan-agg (q1, q6), multi-join (q3, q5),
window (w1, w3), event-time (e1, e3), as-of + bucketed range join, dedup
(inverted-index Jaccard, MinHash-LSH), similarity top-k, the text/
quality pass, and (r9) the LLM-datapipe heavies (Bloom incremental dedup,
PQ full-rerank ANN, CMS/MG sketches, broadcast BPE, the pipe1/pipe2
end-to-end compositions) — each measured end-to-end (plan+execute+fetch).

Measurement discipline (r10 — the r9 official record passed the start-only
loadavg gate and was still garbage: load ramped 1.24 -> 6.73 MID-run and a
d3 rep recorded 366.9 s on code five quiet runs measure at ~7 s):

- start gate as before (1-min loadavg <= QUIET_LOAD, waits up to
  $SPARK_GRAFT_BENCH_WAIT_SEC);
- per-rep NEIGHBOR-CPU measurement: loadavg is useless mid-run because it
  counts our own 32 Spark threads, so each rep instead samples
  /proc/stat's IN-VM busy jiffies minus our own process tree's jiffies
  (python driver + JVM + Arrow workers, incl. reaped children via
  cutime/cstime). ``other_cores = (invm_busy - ours) / wall`` is the
  cores of in-VM NEIGHBOR compute that ran during the rep — immune to
  self-load. Hypervisor STEAL is tracked separately per rep (it rises
  while WE are busy and a retry can't dodge it; dirty only above
  STEAL_CORES_MAX);
- a rep whose other_cores exceeds NEIGHBOR_CORES_MAX is re-run (bounded:
  $SPARK_GRAFT_BENCH_REP_RETRIES per rep, global retry budget), after a
  short wait-for-quiet probe;
- every KEPT rep carries its loadavg + other_cores stamp in
  ``rep_stamps``; the query median prefers clean reps, and the record is
  stamped ``"contaminated": true`` iff the start gate failed OR any rep
  the medians actually use ran above threshold — quiet-by-construction,
  not quiet-by-luck;
- r12 (VERDICT r11 #5): jiffy accounting bounds RUNNABLE contention but is
  blind to host frequency / memory-bandwidth throttling — r11's official
  record ran 1.4-5.4x quiet walls under CLEAN stamps, and the r12 baseline
  reproduced it (a 30.25 s rep of a 1.3 s query at 0.0 neighbor cores). A
  fixed CANARY workload (2^26-row codegen-only sum, no shuffle, no python)
  now runs before and after every rep; its wall calibrates host throughput
  against the run's own steady state (running MEDIAN — this host's CPU
  burst budget makes the MINIMUM a transient ~2x burst that would flag
  steady-state reps). A rep bracketed by canaries above
  ``CANARY_SLOW_RATIO`` x that reference (or with either side above 2x
  the ratio) is stamped ``fabric_slow`` (not clean) and retried exactly
  like a neighbor-dirty rep. Methodology of the timed action itself
  (collect, median-of-clean-reps) is UNCHANGED.
"""

from __future__ import annotations

import gc
import json
import os
import statistics
import time

from consumer_loans_analysis_spark.plans import registry
from consumer_loans_analysis_spark.session import get_spark

# Queries r01-r08 tracked — kept stable for round-over-round comparability
# (BASELINE.md / BENCH_r01 totals are sums over exactly this set).
LEGACY_QUERIES = [
    "q1_pricing_summary",
    "q3_shipping_priority",
    "q5_local_supplier_volume",
    "q6_forecast_revenue",
    "join_broadcast_part_revenue",
    "rollup_region_nation",
    "w1_topn_per_group",
    "w3_running_sum",
    "asof_join_last_click",
    "range_join_followers",
    "e1_tumbling_window",
    "e3_session_window",
    "a1_summary_numeric",
    "a12_corr_matrix",
    "d2_ngram_jaccard_pairs",
    "d3_minhash_lsh_pairs",
    "sim1_cosine_topk",
    "t2_quality_features",
    "q10_returned_items",
    "q18_large_orders",
    "w4_ranking_functions",
    "grouping_sets_custom",
    "mm3_sample_frames",
]

# The LLM-datapipe heavies (r9, VERDICT r8 #5): the official bench now
# tracks the scale-path operators too. Their quiet-host r9 medians are the
# 2x-bar reference going forward; the LEGACY set's total stays comparable
# to BENCH_r01 via "legacy_total".
DATAPIPE_QUERIES = [
    "d12_bloom_incremental_dedup",
    "sim5b_pq_full_rerank_topk",
    "sk3_cms_heavy_hitters",
    "sk4_mg_heavy_hitters",
    "t14b_bpe_encode_broadcast",
    "pipe1_corpus_curation",
    "pipe2_pretrain_prep",
    # r10 (VERDICT r9 #7): the remaining composition flagships — the
    # closest thing to a customer workload. Expanded-set totals are
    # comparable r10-forward only; legacy_total stays the r01 yardstick.
    "pipe3_audited_curation",
    "pipe4_clean_dedup_shard",
    # r11 additions: the composed IVFADC serving path, both new tokenizer
    # families, and the learned quality filter. Expanded-set totals are
    # comparable r11-forward only (the set grew by these four);
    # legacy_total remains the r01 yardstick.
    "sim8_ivfadc_pinned_topk",
    "t20_wordpiece_greedy_encode",
    "t21_unigram_viterbi_encode",
    "dq8_seed_quality_classifier",
    # r12 (VERDICT r11 #4): the heaviest composition flagship and the
    # PRODUCTION approximate ANN path (rerank=4 live fit) — previously only
    # sim5's exactness-proof twin sim5b was tracked. Expanded-set totals
    # are comparable r12-forward only; legacy_total stays the r01 yardstick.
    "pipe5_fluency_curation",
    "sim5_pq_topk",
    # r13 (VERDICT r12 #7): the PRODUCTION dedup shape — d2 stays the
    # exact superlinear anchor, d2b is the df-capped path a deployment
    # actually runs (4.6 s vs 123.8 s at sf1). Expanded-set totals are
    # comparable r13-forward only; legacy_total stays the r01 yardstick.
    "d2b_ngram_jaccard_capped",
]

BENCH_QUERIES = LEGACY_QUERIES + DATAPIPE_QUERIES


def _warmup(spark, sf_dir: str) -> None:
    """Warm engine infrastructure, NOT the benchmark queries.

    Exercises the codegen/janino compiler, hash-agg, shuffle-join, window,
    and parquet-reader class paths once on tiny synthetic data (first-use
    class loading + JIT otherwise lands on whichever query runs first), and
    prefetches the benchmark files into the OS page cache so timings measure
    compute, not cold-disk reads. No benchmark query, plan, or result is
    pre-built or cached.
    """
    import glob

    from pyspark.sql import Window
    from pyspark.sql import functions as F

    r = spark.range(100_000).select(
        "id", (F.col("id") % 7).alias("k"), F.rand(1).alias("v")
    )
    r.groupBy("k").agg(F.sum("v"), F.min("v"), F.count(F.lit(1))).collect()
    r.join(r.select(F.col("k"), F.col("v").alias("v2")), "k").filter("v > 0.9").count()
    r.select(F.sum("v").over(Window.partitionBy("k").orderBy("id"))).count()
    # spin up the reusable Python/Arrow worker pool (first Pandas-UDF query
    # otherwise pays worker spawn, not query cost)
    r.repartition(int(spark.sparkContext.defaultParallelism)).mapInPandas(
        lambda it: it, schema="id long, k long, v double"
    ).count()
    for path in glob.glob(os.path.join(sf_dir, "*.parquet")):
        # testdata tables are single files; Spark-written ones (e.g. the
        # scale_check sf1 union) are directories of part files
        files = (
            [os.path.join(r, f) for r, _, fs in os.walk(path) for f in fs]
            if os.path.isdir(path)
            else [path]
        )
        for f in files:
            with open(f, "rb") as fh:
                while fh.read(1 << 24):
                    pass
    # Compile the bench operators' generated code against the tiny sf0.001
    # tables: the wide dedup/minhash aggregates cost seconds of janino
    # compile + first-use class loading, which belongs to the engine, not
    # the measured dataset. Deliberately the SMALLEST sf (cheap): a heavier
    # warmup would spend the host's CPU burst budget right before the timed
    # section. Plans (and any operator-internal caches) are keyed on the
    # input path, so nothing computed here is reusable by the timed runs —
    # every timed byte still comes from sf_dir.
    tiny = os.path.join(os.path.dirname(sf_dir.rstrip("/")), "sf0.001")
    if not (os.path.isdir(tiny) and os.path.realpath(tiny) != os.path.realpath(sf_dir)):
        tiny = ""
    if tiny:
        for name in BENCH_QUERIES:
            registry.QUERIES[name](spark, tiny).collect()
        # drop the tiny-table caches/broadcasts the warmup left behind so
        # the timed runs start from a clean heap
        spark.catalog.clearCache()
        spark.sparkContext._jvm.System.gc()


def _loadavg() -> list[float]:
    try:
        return [round(x, 2) for x in os.getloadavg()]
    except OSError:
        return []


# A 1-min loadavg above this at bench start means another workload is
# competing for the 32 cores — r8's official record was +71% purely from
# the builder's own tuning waves draining (the r8 VERDICT adjudication).
QUIET_LOAD = 1.5

# Cores of IN-VM neighbor compute during a rep above which the rep is
# contaminated (another process in this VM — the r8/r9 failure mode was
# 5-30+ cores). 2 of 32 cores is above the jiffy-accounting noise floor
# (measured ±0.15 cores on a 4 s rep).
NEIGHBOR_CORES_MAX = float(os.environ.get("SPARK_GRAFT_NEIGHBOR_CORES_MAX", "2.0"))

# Hypervisor steal above this many cores marks a rep dirty too — normal
# fabric noise here is 1-2 cores while we saturate 32 vCPUs; 8+ means a
# co-tenant VM is eating a quarter of the machine. The default SCALES
# with the bench's core count (cpus/4, capped at the original 8.0 so
# 32-core runs are unchanged): steal is dirty in PROPORTION to the
# cores we run on — a measured 8-core scaling run kept reps with
# 2.75-3.5 stolen cores (35-44% of the machine) under the flat 8.0
# gate, reading sim5 at 9.5-10.5 s vs 4.4 s on its steal-clean rep and
# faking a 3.2x core-scaling ratio where the clean ratio is ~1.5x.
try:
    # session.py accepts non-numeric values verbatim in local[{cpus}]
    # (e.g. "*"); the gate falls back to the machine's core count there
    # instead of crashing at import (r13, ADVICE r12).
    _BENCH_CPUS = float(os.environ.get("SPARK_GRAFT_CPUS", "32"))
except ValueError:
    _BENCH_CPUS = float(os.cpu_count() or 32)
# floor of 2.0: normal fabric steal here is 1-2 cores, so an unfloored
# cpus/4 gate at <=8 cores would stamp every rep dirty and burn the
# retry budget (r13, ADVICE r12)
STEAL_CORES_MAX = float(
    os.environ.get(
        "SPARK_GRAFT_STEAL_CORES_MAX", str(max(2.0, min(8.0, _BENCH_CPUS / 4.0)))
    )
)

# r12 fabric canary (VERDICT r11 #5): a rep whose surrounding canary walls
# exceed this multiple of the run's canary MEDIAN is fabric-throttled —
# the host is serving cycles slower than its own demonstrated steady
# state, which jiffy/steal accounting cannot see. The reference is the
# running MEDIAN, not the minimum: this host has a CPU-burst budget, so
# its fastest canary (~0.07 s) is a transient ~2x burst over the steady
# ~0.13 s — a min-anchored gate would flag steady-state reps as slow.
# 1.5 x median leaves room for normal jitter (measured ±15%) while
# catching the observed 2-5x throttle windows. The run's min and median
# are both recorded in the artifact so cross-run throughput can be
# compared even when every rep within a run stamps clean.
CANARY_SLOW_RATIO = float(os.environ.get("SPARK_GRAFT_CANARY_SLOW_RATIO", "1.5"))

# Every canary wall observed this run (module state so _canary_wall can
# update it from any call site); the gate reads its median.
_canary_walls: list[float] = []

# Optional ABSOLUTE reference cap: the running median is blind to a
# throttle window that covers the START of the run, because the slow
# walls seed the median itself (observed r12 run /tmp/bench_r12_fixed_A:
# first ~14 queries at 2-6x quiet canary walls, all stamped clean; quiet
# runs start at ~0.15 s and stay 0.08-0.19 s, so the 0.58-0.73 s start
# was fabric, not JIT warmup). When the host's steady quiet canary wall
# is known (this box: ~0.12 s median across quiet runs), export
# SPARK_GRAFT_CANARY_REF_SEC to cap the reference so a throttled start
# is flagged/retried instead of silently kept. Unset (the driver's
# default) the gate stays self-calibrating exactly as before.
_CANARY_REF_CAP = float(os.environ.get("SPARK_GRAFT_CANARY_REF_SEC", "inf"))


def _canary_ref() -> float:
    run = statistics.median(_canary_walls) if _canary_walls else float("inf")
    return min(run, _CANARY_REF_CAP)


def _canary_wall(spark, record: bool = True) -> float:
    """Wall of the fixed reference workload: a 2^26-row codegen-only
    aggregate (range → sum of an arithmetic expression). No shuffle, no
    python worker, no disk — pure JVM compute whose wall tracks effective
    host throughput (frequency + memory bandwidth + real cores).

    record=False runs a DRAIN canary whose wall is deliberately not
    added to the running reference: it is used right after a timed rep
    to absorb our own GC/ContextCleaner tail, so it measures a known-
    contaminated window."""
    t0 = time.perf_counter()
    spark.range(1 << 26).selectExpr("sum(id * 3 + 1) AS s").collect()
    wall = time.perf_counter() - t0
    if record:
        _canary_walls.append(wall)
    return wall

try:
    _CLK = float(os.sysconf("SC_CLK_TCK"))
except (OSError, ValueError, AttributeError):
    _CLK = 100.0


def _host_busy_jiffies() -> tuple[int, int]:
    """(in-VM busy jiffies, steal jiffies) across all CPUs.

    The two are SEPARATE contamination signals (measured on this host,
    r10): in-VM busy (user+nice+system+irq+softirq) minus our own tree
    is another PROCESS in this VM competing for cores — the r8/r9
    failure mode (tuning waves, stray pytest), tightly thresholded and
    worth retrying. STEAL is the hypervisor running OTHER VMs; it shows
    up mostly while WE are busy (that's when we demand cycles the
    fabric denies), sits at ~1-2 cores during heavy queries here, and a
    retry can't dodge it — so it's stamped per rep and only flags the
    record above a much higher ceiling."""
    try:
        with open("/proc/stat") as fh:
            vals = [int(x) for x in fh.readline().split()[1:]]
    except (OSError, ValueError):
        return 0, 0
    idle = vals[3] + (vals[4] if len(vals) > 4 else 0)
    steal = vals[7] if len(vals) > 7 else 0
    return sum(vals) - idle - steal, steal


def _tree_jiffies() -> int:
    """utime+stime summed over OUR process tree (driver + JVM + Arrow
    workers), plus cutime+cstime so reaped children (short-lived Python
    workers) stay counted. This is the self-load term: host_busy minus
    this is what the NEIGHBORS burned.

    Reparenting blind spot (r10 ADVICE): a worker that daemonizes /
    outlives its parent reparents to PID 1 and falls out of the ppid
    walk — its CPU would be misread as NEIGHBOR load (conservative
    direction: false dirty, never false clean, but it burns retry
    budget). Orphans KEEP their session id, so reparented processes are
    recovered via sid — but ONLY processes that actually reparented
    (ppid == 1) qualify (r11 ADVICE): a live unrelated process sharing
    our terminal session (backgrounded job, tee, sibling command) also
    matches our sid, and claiming its jiffies as self-load would let a
    genuinely contaminated rep stamp itself clean — inverting the
    conservative direction. ppid==1 AND sid==ours is exactly the orphan
    signature and nothing else."""
    me = os.getpid()
    try:
        my_sid = os.getsid(0)
    except OSError:
        my_sid = -1
    children: dict[int, list[int]] = {}
    jiffies: dict[int, int] = {}
    sids: dict[int, int] = {}
    ppids: dict[int, int] = {}
    try:
        pids = [int(p) for p in os.listdir("/proc") if p.isdigit()]
    except OSError:
        return 0
    for pid in pids:
        try:
            with open(f"/proc/{pid}/stat") as fh:
                raw = fh.read()
        except (OSError, ValueError):
            continue
        # comm (field 2) may contain spaces/parens: split after last ')'
        try:
            fields = raw[raw.rindex(")") + 2 :].split()
            ppid = int(fields[1])
            ppids[pid] = ppid
            sids[pid] = int(fields[3])  # session id
            own = int(fields[11]) + int(fields[12])  # utime+stime
            reaped = int(fields[13]) + int(fields[14])  # cutime+cstime
        except (ValueError, IndexError):
            continue
        jiffies[pid] = own + reaped
        children.setdefault(ppid, []).append(pid)
    seen: set[int] = set()
    total, stack = 0, [me]
    while stack:
        p = stack.pop()
        if p in seen:
            continue
        seen.add(p)
        total += jiffies.get(p, 0)
        stack.extend(children.get(p, []))
    for pid, sid in sids.items():
        if sid == my_sid and ppids.get(pid) == 1 and pid not in seen:
            total += jiffies.get(pid, 0)
    return total


def _median_of_clean(kept: list[dict]) -> tuple[float, bool]:
    """Median over CLEAN reps when any exist, else over all reps (and the
    record is then contaminated). Returns (median_sec, used_dirty)."""
    clean = sorted(r["sec"] for r in kept if r["clean"])
    used = clean if clean else sorted(r["sec"] for r in kept)
    return round(statistics.median(used), 3), not clean


def _other_cores_probe(window: float = 0.25) -> float:
    """Cores of non-our-tree IN-VM compute over a short sleep — the
    pre-rep quiet check (our tree is ~idle while we sleep, so this reads
    the neighbors directly; loadavg can't, it still carries our last
    rep). Steal is excluded: while we sleep we demand no cycles, so
    steal reads ~0 regardless of fabric state."""
    (h0, _), m0 = _host_busy_jiffies(), _tree_jiffies()
    time.sleep(window)
    (h1, _), m1 = _host_busy_jiffies(), _tree_jiffies()
    return max(0.0, ((h1 - h0) - (m1 - m0)) / _CLK / window)


def main() -> None:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    sf = sf_dir.rstrip("/").rsplit("sf", 1)[-1]
    reps = int(os.environ.get("SPARK_GRAFT_BENCH_REPS", "3"))
    # loadavg gate (r8 lesson): wait for the host to go quiet before
    # measuring; if it never does within the budget, still emit a record
    # but stamp it "contaminated" so no round compares against it.
    wait_budget = float(os.environ.get("SPARK_GRAFT_BENCH_WAIT_SEC", "900"))
    waited = 0.0
    while (la := _loadavg()) and la[0] > QUIET_LOAD and waited < wait_budget:
        time.sleep(15)
        waited += 15
    load_start = _loadavg()
    contaminated = bool(load_start and load_start[0] > QUIET_LOAD)
    registry.load_all()
    spark = get_spark("bench")
    _warmup(spark, sf_dir)
    # canary calibration: 5 runs warm its codegen path and seed the
    # running-median reference (which every later call keeps updating)
    for _ in range(5):
        _canary_wall(spark)
    # Median-of-N per query (default 3): single-shot timings drift ±10%
    # with host load (the r04 lesson — a uniform +2-12% across untouched
    # queries); the median pins that noise so round-over-round deltas are
    # attributable to plan changes. Runs are interleaved per-query (all
    # reps of one query back-to-back) so each query's reps see similar
    # machine state; caches are cleared between reps' plans only via the
    # path-keyed plan construction (nothing persists across reps).
    timings: dict[str, float] = {}
    spreads: dict[str, list[float]] = {}
    rep_stamps: dict[str, list[dict]] = {}
    rep_retries = int(os.environ.get("SPARK_GRAFT_BENCH_REP_RETRIES", "2"))
    # PER-QUERY retry budget (r10 ADVICE: a shared global budget let a
    # noisy early stretch starve the late pipe* heavies of any retry —
    # exactly the queries compared round-over-round). Default = every rep
    # can use its full per-rep retries; spent counts land in the artifact.
    query_retry_budget = int(os.environ.get("SPARK_GRAFT_BENCH_RETRY_BUDGET", "6"))
    per_rep_wait = float(os.environ.get("SPARK_GRAFT_BENCH_REP_WAIT_SEC", "45"))
    retries_used: dict[str, int] = {}
    any_kept_dirty = False
    for name in BENCH_QUERIES:
        fn = registry.QUERIES[name]
        retry_budget = query_retry_budget
        kept: list[dict] = []
        for _ in range(reps):
            rec = None
            for attempt in range(rep_retries + 1):
                # brief pre-rep quiet wait: probe NEIGHBOR cores (not
                # loadavg — that still carries our own last rep) and hold
                # until quiet or the per-rep budget runs out
                waited_rep = 0.0
                while waited_rep < per_rep_wait:
                    if (
                        _other_cores_probe() <= NEIGHBOR_CORES_MAX
                        and _canary_wall(spark)
                        <= CANARY_SLOW_RATIO * _canary_ref()
                    ):
                        break
                    time.sleep(5)
                    waited_rep += 5.25
                # cold-equivalent reps: drop caches a query left behind
                # (e.g. d2/d3's shingle table) so every rep measures the
                # full plan+cache-build cost, comparable with prior rounds
                spark.catalog.clearCache()
                # r12: release dead checkpoint/broadcast blocks NOW, not
                # nondeterministically mid-rep — localCheckpoint blocks
                # from a prior rep are freed only when Python GC releases
                # the DataFrame and the JVM ContextCleaner runs; letting
                # that land inside a timed rep is self-inflicted noise
                # (paired pipe5 probe: reps 17.6/36.5/9.2 s plain vs
                # 10.2/9.7/8.1 s with the explicit gc). Runs BEFORE the
                # pre-canary, so the timed action itself is unchanged.
                gc.collect()
                try:
                    spark.sparkContext._jvm.System.gc()
                except Exception:
                    pass
                cpre = _canary_wall(spark)
                la0 = _loadavg()
                (h0, s0), m0 = _host_busy_jiffies(), _tree_jiffies()
                t0 = time.perf_counter()
                rows = fn(spark, sf_dir).collect()
                dt = time.perf_counter() - t0
                (h1, s1), m1 = _host_busy_jiffies(), _tree_jiffies()
                # flush OUR OWN cleanup debt before the post-canary: a
                # heavy rep (pipe5's checkpoint blocks, large collects)
                # otherwise leaves GC/ContextCleaner work that lands
                # inside cpost and reads as fabric_slow on a QUIET host
                # (measured at r12 HEAD: pipe5 cpost 0.33-0.39 s vs
                # 0.10-0.12 pre, with other_cores 0.0 and steal ~0 — all
                # three reps flagged, whole record stamped contaminated).
                # System.gc() only ENQUEUES the cleanup — the
                # ContextCleaner drains its reference queue on its own
                # thread — so an unrecorded DRAIN canary then absorbs
                # that concurrent work (gc alone still read cpost 0.31 s
                # at other_cores 0.0). The recorded cpost that follows
                # measures the HOST; a genuine throttle window (seconds+)
                # spans the drain and still shows. The timed action (dt
                # above) is unchanged.
                gc.collect()
                try:
                    spark.sparkContext._jvm.System.gc()
                except Exception:
                    pass
                # the drain wall is recorded in the rep (ADVICE r12: a
                # brief throttle ending inside the drain window is
                # otherwise invisible post-hoc) but never joins the
                # reference median — it measures a known-contaminated
                # window
                cdrain = _canary_wall(spark, record=False)
                cpost = _canary_wall(spark)
                assert rows is not None
                other = max(0.0, ((h1 - h0) - (m1 - m0)) / _CLK / max(dt, 1e-3))
                steal = (s1 - s0) / _CLK / max(dt, 1e-3)
                # fabric_slow iff BOTH surrounding canaries exceed the
                # ratio (a rep bracketed by slow walls ran throttled) or
                # either side is extremely slow (a throttle that began or
                # ended mid-rep). Reference re-reads the running median,
                # which cpre/cpost themselves have just joined.
                cref = _canary_ref()
                fabric_slow = (
                    min(cpre, cpost) > CANARY_SLOW_RATIO * cref
                    or max(cpre, cpost) > 2.0 * CANARY_SLOW_RATIO * cref
                )
                rec = {
                    "sec": round(dt, 3),
                    "other_cores": round(other, 2),
                    "steal_cores": round(steal, 2),
                    "canary_pre": round(cpre, 3),
                    "canary_drain": round(cdrain, 3),
                    "canary_post": round(cpost, 3),
                    "fabric_slow": fabric_slow,
                    "loadavg_pre": la0,
                    "loadavg_post": _loadavg(),
                    "clean": other <= NEIGHBOR_CORES_MAX
                    and steal <= STEAL_CORES_MAX
                    and not fabric_slow,
                    "attempt": attempt,
                }
                if rec["clean"] or retry_budget <= 0:
                    break
                retry_budget -= 1
            kept.append(rec)
        rep_stamps[name] = kept
        retries_used[name] = query_retry_budget - retry_budget
        # median over CLEAN reps when any exist; a query forced to use a
        # dirty rep marks the whole record contaminated
        timings[name], used_dirty = _median_of_clean(kept)
        if used_dirty:
            any_kept_dirty = True
        spreads[name] = sorted(r["sec"] for r in kept)
    total = round(sum(timings.values()), 3)
    legacy_total = round(sum(timings[n] for n in LEGACY_QUERIES if n in timings), 3)
    worst = max(
        (
            dict(q=name, sec=r["sec"], other_cores=r["other_cores"],
                 steal_cores=r["steal_cores"], clean=r["clean"])
            for name, ks in rep_stamps.items()
            for r in ks
        ),
        key=lambda r: (r["other_cores"], r["steal_cores"]),
        default=None,
    )
    # The headline scalars, repeated in BOTH output lines below. Keys that
    # must survive any stdout truncation live at the TAIL of each record.
    summary = {
        # sum over the r01-stable subset — THE number comparable to
        # BASELINE.md / BENCH_r01..r08 (value also includes the r9+
        # datapipe heavies)
        "legacy_total": legacy_total,
        # r10 definition: contaminated iff the start gate failed OR any
        # rep a median actually uses ran with neighbor compute above
        # NEIGHBOR_CORES_MAX (dirty reps are retried, bounded per query)
        "contaminated": contaminated or any_kept_dirty,
        "start_gate_failed": contaminated,
        # dirtiest kept rep across the whole run — a contaminated record
        # is attributable from this line alone
        "worst_rep": worst,
        "metric": "headline_queries_total_wall",
        "unit": "sec",
        "sf": float(sf) if sf.replace(".", "").isdigit() else sf,
        "value": total,
    }
    # Full record first: bulky diagnostics (rep_stamps/samples) EARLY,
    # headline scalars LAST, so a byte-truncated tail still ends with
    # value/legacy_total/contaminated (r10 verdict #2: the driver keeps
    # only the tail of stdout and BENCH_r10's totals were cut off).
    print(
        json.dumps(
            {
                "reps": reps,
                "protocol": "median_of_clean_reps_per_query",
                # per-rep stamps (r10): sec + neighbor-cores + loadavg for
                # every kept rep, so a contaminated record is diagnosable
                # from the artifact alone
                "rep_stamps": rep_stamps,
                "samples": spreads,
                "retries_used": retries_used,
                "retry_budget_per_query": query_retry_budget,
                "neighbor_cores_max": NEIGHBOR_CORES_MAX,
                "steal_cores_max": STEAL_CORES_MAX,
                "canary_min_sec": round(min(_canary_walls), 3),
                "canary_median_sec": round(_canary_ref(), 3),
                "canary_slow_ratio": CANARY_SLOW_RATIO,
                "quiet_load_threshold": QUIET_LOAD,
                "waited_for_quiet_sec": waited,
                # host-load snapshot so round-over-round drift can be
                # attributed (r05's lesson: a uniformly slower host looks
                # like a uniform regression)
                "loadavg_at_start": load_start,
                "loadavg_at_end": _loadavg(),
                "queries": timings,
                **summary,
            }
        )
    )
    # Compact summary as the FINAL line: complete per-query timings +
    # headline scalars, small enough that no plausible tail cut loses it.
    # A consumer taking the LAST json line gets a full valid record (minus
    # the per-rep diagnostics); one taking the FIRST gets everything.
    print(json.dumps({"queries": timings, **summary}))


if __name__ == "__main__":
    main()
