"""Z-order layout: Morton code correctness + measured skipping benefit."""

from __future__ import annotations

from pyspark.sql import functions as F

from consumer_loans_analysis_spark.sources.layout import morton_code, zorder_write


def _morton_ref(x: int, y: int, bits: int) -> int:
    out = 0
    for i in range(bits):
        out |= ((x >> i) & 1) << (2 * i)
        out |= ((y >> i) & 1) << (2 * i + 1)
    return out


def test_morton_code_matches_reference(spark):
    import random

    rng = random.Random(7)
    rows = [(rng.randrange(1 << 16), rng.randrange(1 << 16)) for _ in range(200)]
    df = spark.createDataFrame(rows, schema="x long, y long")
    got = df.select("x", "y", morton_code(F.col("x"), F.col("y"), 16)).collect()
    for r in got:
        assert r["zorder"] == _morton_ref(r["x"], r["y"], 16)
    # locality sanity: neighbors in both dims get nearby codes
    assert _morton_ref(3, 5, 16) ^ _morton_ref(3, 4, 16) < 16


def test_morton_code_saturates_out_of_range(spark):
    """Out-of-range coordinates must CLAMP to the edge of the grid, not
    wrap modulo 2^bits — a wrap maps an overflowing value to a small code
    and destroys Z-curve locality."""
    df = spark.createDataFrame(
        [(1 << 20, 5), (-3, 5), (7, (1 << 20) + 123)], schema="x long, y long"
    )
    got = [r["zorder"] for r in df.select(morton_code(F.col("x"), F.col("y"), 16)).collect()]
    hi = (1 << 16) - 1
    assert got[0] == _morton_ref(hi, 5, 16)   # x saturates high
    assert got[1] == _morton_ref(0, 5, 16)    # x saturates low
    assert got[2] == _morton_ref(7, hi, 16)   # y saturates high


def test_zorder_write_tightens_file_stats(spark, sf_dir, tmp_path):
    """The point of the layout: per-file (min,max) ranges on BOTH
    dimensions must cover far less of the value space than an arbitrary
    layout, which is exactly what parquet min/max skipping consumes."""
    ev = spark.read.parquet(f"{sf_dir}/events.parquet").select(
        "event_id", "user_id", "value"
    )
    plain, zordered = str(tmp_path / "plain"), str(tmp_path / "zorder")
    ev.repartition(16).write.parquet(plain)
    zorder_write(ev, zordered, dims=("user_id", "value"), bits=10, n_files=16)

    def mean_file_coverage(path):
        # fraction of each dimension's global span covered per file, averaged
        import glob

        spans = []
        g = spark.read.parquet(path)
        lo_u, hi_u, lo_v, hi_v = g.agg(
            F.min("user_id"), F.max("user_id"), F.min("value"), F.max("value")
        ).collect()[0]
        for f in glob.glob(f"{path}/part-*.parquet"):
            s = spark.read.parquet(f).agg(
                F.min("user_id"), F.max("user_id"), F.min("value"), F.max("value")
            ).collect()[0]
            u = (s[1] - s[0]) / max(hi_u - lo_u, 1)
            v = (s[3] - s[2]) / max(hi_v - lo_v, 1e-9)
            spans.append(u * v)  # covered area in normalized 2-D space
        return sum(spans) / len(spans)

    cov_plain = mean_file_coverage(plain)
    cov_z = mean_file_coverage(zordered)
    # arbitrary layout: every file spans ~the whole space (area ≈ 1);
    # Z-order: compact rectangles. Require a large, robust margin.
    assert cov_z < cov_plain / 3, (cov_plain, cov_z)


def test_zorder_write_preserves_rows(spark, sf_dir, tmp_path):
    ev = spark.read.parquet(f"{sf_dir}/events.parquet").select(
        "event_id", "user_id", "value"
    )
    out = str(tmp_path / "z2")
    zorder_write(ev, out, dims=("user_id", "value"), bits=8, n_files=8)
    back = spark.read.parquet(out)
    assert back.count() == ev.count()
    assert sorted(back.columns) == sorted(ev.columns)
    a = ev.agg(F.sum("event_id"), F.sum("user_id")).collect()[0]
    b = back.agg(F.sum("event_id"), F.sum("user_id")).collect()[0]
    assert tuple(a) == tuple(b)


def test_zorder_file_stats_ledger_shows_skipping(spark, sf_dir):
    """z1's ledger semantics: both layouts partition ALL rows; the
    Z-order layout's per-file x-spans are dramatically tighter than the
    linear-by-y layout's (which must cover ~the full x range per file),
    while staying bounded on y — the measured two-dimensional skipping
    benefit. Also pins the plan: ONE hash-partition Exchange (the file
    aggregate); the scalar min/max attach is a broadcast."""
    from pyspark.sql import functions as F

    from consumer_loans_analysis_spark.plans import registry

    registry.load_all()
    df = registry.QUERIES["z1_zorder_layout_stats"](spark, sf_dir)
    plan = df._jdf.queryExecution().executedPlan().toString()
    assert plan.count("Exchange hashpartitioning") == 1, plan
    rows = df.collect()
    n_orders = spark.read.parquet(f"{sf_dir}/orders.parquet").count()
    by_layout = {}
    for r in rows:
        by_layout.setdefault(r["layout"], []).append(r)
    for layout, files in by_layout.items():
        assert sum(f["n_rows"] for f in files) == n_orders, layout
    mean_x = {
        lay: sum(f["x_span_frac"] for f in fs) / len(fs)
        for lay, fs in by_layout.items()
    }
    # linear-by-date files span essentially the whole custkey range;
    # Z-order files cover a compact slice of it.
    assert mean_x["linear_y"] > 0.9, mean_x
    assert mean_x["zorder"] < mean_x["linear_y"] / 2, mean_x


def test_bench_neighbor_cpu_accounting():
    """bench.py's r10 contamination machinery: the jiffy accounting is
    self-load-immune (a CPU burn inside OUR process tree must NOT read as
    neighbor compute), and the clean-median rule prefers clean reps and
    flags a query forced onto dirty ones."""
    import time as _time

    import bench

    # burning CPU in-process raises host busy jiffies AND our tree's by
    # the same amount -> other_cores stays near the true neighbor level
    idle = bench._other_cores_probe(window=0.3)

    t0 = _time.perf_counter()
    (h0, _), m0 = bench._host_busy_jiffies(), bench._tree_jiffies()
    x = 0
    while _time.perf_counter() - t0 < 0.5:
        x += 1  # one core, our own tree
    dt = _time.perf_counter() - t0
    (h1, _), m1 = bench._host_busy_jiffies(), bench._tree_jiffies()
    ours = (m1 - m0) / bench._CLK / dt
    other = max(0.0, ((h1 - h0) - (m1 - m0)) / bench._CLK / dt)
    assert ours > 0.5, ours          # the burn shows up as OUR load
    assert other < idle + 2.0, (other, idle)  # ...not as neighbor load

    # clean-median rule
    kept = [
        {"sec": 10.0, "clean": False},
        {"sec": 1.0, "clean": True},
        {"sec": 3.0, "clean": True},
    ]
    med, dirty = bench._median_of_clean(kept)
    assert (med, dirty) == (2.0, False)
    med, dirty = bench._median_of_clean([{"sec": 7.0, "clean": False}])
    assert (med, dirty) == (7.0, True)
