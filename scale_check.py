"""Scale sanity harness: does each headline plan survive a 10× scale-up?

Builds an sf≈1 dataset in /tmp by unioning 10 key-shifted copies of the
sf0.1 tables (keys shifted so join/group cardinalities scale like real
data: 10× orders, 10× users, 10× documents with perturbed text), then runs
a headline subset at both scales and reports the wall-clock ratio. A plan
that holds should scale ~linearly (ratio ≈ 10 on fixed cores) or better;
a quadratic pair-explosion or a driver-side collect shows up immediately.

Usage: python scale_check.py [--rebuild]
"""

from __future__ import annotations

import os
import sys
import time

from pyspark.sql import functions as F

from consumer_loans_analysis_spark.plans import registry
from consumer_loans_analysis_spark.session import get_spark
from consumer_loans_analysis_spark.sources.readers import read_table

SRC = "/root/testdata/sf0.1"
DST = "/tmp/spark_graft_sf1"
COPIES = 10

QUERIES = [
    "q1_pricing_summary",
    "q3_shipping_priority",
    "w3_running_sum",
    "a12_corr_matrix",
    "e3_session_window",
    "d2_ngram_jaccard_pairs",
    "d3_minhash_lsh_pairs",
    "d4_simhash_pairs",
    "d5_embedding_near_dupes",
    "d6_dup_clusters",
    "t2_quality_features",
]


def build(spark) -> None:
    li = read_table(spark, SRC, "lineitem")
    o = read_table(spark, SRC, "orders")
    c = read_table(spark, SRC, "customer")
    docs = read_table(spark, SRC, "documents")
    ev = read_table(spark, SRC, "events")

    okey_span = o.agg(F.max("o_orderkey")).head()[0] + 1
    ckey_span = c.agg(F.max("c_custkey")).head()[0] + 1
    dkey_span = docs.agg(F.max("doc_id")).head()[0] + 1
    ukey_span = ev.agg(F.max("user_id")).head()[0] + 1

    def times(df, shifts):
        parts = []
        for i in range(COPIES):
            part = df
            for col, span in shifts.items():
                part = part.withColumn(col, F.col(col) + F.lit(i * span))
            parts.append(part)
        out = parts[0]
        for p in parts[1:]:
            out = out.unionByName(p)
        return out

    times(li, {"l_orderkey": okey_span}).write.mode("overwrite").parquet(
        f"{DST}/lineitem.parquet"
    )
    times(o, {"o_orderkey": okey_span, "o_custkey": ckey_span}).write.mode(
        "overwrite"
    ).parquet(f"{DST}/orders.parquet")
    times(c, {"c_custkey": ckey_span}).write.mode("overwrite").parquet(
        f"{DST}/customer.parquet"
    )
    # perturb text per copy so near-dup structure replicates instead of
    # collapsing into 10-way exact dup groups
    docs10 = times(docs, {"doc_id": dkey_span}).withColumn(
        "text",
        F.concat(F.col("text"), F.lit(" zz"), (F.col("doc_id") / dkey_span).cast("int").cast("string")),
    )
    docs10.write.mode("overwrite").parquet(f"{DST}/documents.parquet")
    ev10 = times(ev, {"user_id": ukey_span, "event_id": 10_000_000})
    ev10.write.mode("overwrite").parquet(f"{DST}/events.parquet")
    # embeddings: 10 key-shifted copies, each under a copy-specific diagonal
    # ±1 reflection (an orthogonal transform): within-copy cosines are
    # preserved exactly (near-dup structure replicates) while cross-copy
    # twins decorrelate instead of forming 10-way exact-dup clusters.
    emb = read_table(spark, SRC, "embeddings")
    vkey_span = emb.agg(F.max("vec_id")).head()[0] + 1
    dim = len(emb.select("embedding").head()[0])
    parts = []
    for i in range(COPIES):
        signs = F.array(
            *[
                F.lit(1.0 if i == 0 or (j * 7 + i * 13 + i * j) % 2 == 0 else -1.0)
                for j in range(dim)
            ]
        )
        parts.append(
            emb.withColumn("vec_id", F.col("vec_id") + F.lit(i * vkey_span))
            .withColumn(
                "embedding",
                F.zip_with("embedding", signs, lambda x, s: (x * s).cast("float")),
            )
        )
    emb10 = parts[0]
    for p in parts[1:]:
        emb10 = emb10.unionByName(p)
    emb10.write.mode("overwrite").parquet(f"{DST}/embeddings.parquet")
    for small in ("nation", "region", "supplier", "part"):
        read_table(spark, SRC, small).write.mode("overwrite").parquet(
            f"{DST}/{small}.parquet"
        )


def main() -> None:
    registry.load_all()
    spark = get_spark("scale-check")
    if "--rebuild" in sys.argv or not os.path.isdir(DST):
        t0 = time.perf_counter()
        build(spark)
        print(f"built {DST} in {time.perf_counter() - t0:.1f}s")

    names = [a for a in sys.argv[1:] if not a.startswith("--")] or QUERIES
    for name in names:
        fn = registry.QUERIES[name]
        fn(spark, SRC).collect()  # warm/compile
        t0 = time.perf_counter()
        n_small = len(fn(spark, SRC).collect())
        t_small = time.perf_counter() - t0
        t0 = time.perf_counter()
        n_big = len(fn(spark, DST).collect())
        t_big = time.perf_counter() - t0
        print(
            f"{name:28s} sf0.1 {t_small:6.2f}s ({n_small} rows)  "
            f"sf1 {t_big:6.2f}s ({n_big} rows)  ratio {t_big / t_small:5.1f}x"
        )


if __name__ == "__main__":
    main()
