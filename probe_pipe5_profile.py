"""pipe5 stage attribution at sf1 (VERDICT r10 #5: 65.2 s total vs 31 s
of attributed stages — where did the other half go?).

Answer (measured here): the r10 tail branched the ranked frame into a
candidate count AND a selection — two consumers of an uncached lineage —
so the KN scoring join + lang join + window executed TWICE. r11 folds
the ledger into ONE aggregation (selection columns as conditional
aggregates over rn), removing the recompute.

The probe materializes each stage behind an explicit localCheckpoint so
stage walls are non-overlapping and sum to ~the probe total; the
production query wall (no extra checkpoints) is measured alongside.

Usage: python probe_pipe5_profile.py [sf_dir]   (default the sf1 union;
       run scale_check.py first). Prints one JSON line; paste the table
       into SCALING.md.
"""

from __future__ import annotations

import json
import sys
import time

from pyspark.sql import Window
from pyspark.sql import functions as F

from consumer_loans_analysis_spark.operators import text
from consumer_loans_analysis_spark.plans import registry
from consumer_loans_analysis_spark.session import get_spark
from consumer_loans_analysis_spark.sources.readers import read_table


def main() -> None:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/tmp/spark_graft_sf1"
    spark = get_spark("pipe5-profile")
    registry.load_all()

    # production wall first (cold-equivalent: path-keyed plans, no caches)
    t0 = time.perf_counter()
    registry.QUERIES["pipe5_fluency_curation"](spark, sf_dir).collect()
    t_prod = time.perf_counter() - t0

    # staged re-run with explicit materialization boundaries
    docs = read_table(spark, sf_dir, "documents").select(
        "doc_id", "lang",
        F.when(F.col("doc_id") % 25 == 0,
               F.concat(F.col("text"), F.lit(" "), F.col("text")))
        .otherwise(F.col("text")).alias("text"),
    )
    t0 = time.perf_counter()
    gate = text.gopher_repetition_rules(docs).where(F.col("keep")).select("doc_id")
    surv = docs.join(gate, "doc_id").localCheckpoint()
    t_gate = time.perf_counter() - t0

    t0 = time.perf_counter()
    scored = text.kneser_ney_score(surv).join(
        surv.select("doc_id", "lang"), "doc_id"
    ).localCheckpoint()
    t_score = time.perf_counter() - t0

    t0 = time.perf_counter()
    w = Window.partitionBy("lang").orderBy("kn_cross_entropy", "doc_id")
    ranked = scored.withColumn("rn", F.row_number().over(w))
    in_sel = F.col("rn") <= 40
    ranked.groupBy("lang").agg(
        F.count(F.lit(1)).alias("n_candidates"),
        F.sum(in_sel.cast("long")).alias("n_selected"),
        F.round(F.avg(F.when(in_sel, F.col("kn_cross_entropy"))), 6).alias("avg_ce"),
        F.md5(F.array_join(F.transform(
            F.array_sort(F.collect_list(F.when(in_sel, F.col("doc_id")))),
            lambda x: x.cast("string")), ",")).alias("sel_digest"),
    ).collect()
    t_select = time.perf_counter() - t0

    print(json.dumps({
        "sf_dir": sf_dir,
        "production_total_sec": round(t_prod, 2),
        "stages": {
            "gate_plus_survivor_checkpoint": round(t_gate, 2),
            "kn_model_plus_scoring_join": round(t_score, 2),
            "rank_plus_ledger_agg": round(t_select, 2),
        },
        "stages_sum_sec": round(t_gate + t_score + t_select, 2),
    }))


if __name__ == "__main__":
    main()
