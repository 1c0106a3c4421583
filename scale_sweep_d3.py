"""d3 band/row sensitivity sweep (VERDICT r06 task 6). d3
(minhash_near_dupes) is the slowest bench query and the designated
100 TB dedup path; this sweep shows the (num_hashes, rows_per_band)
knob is understood: recall vs candidate-pair volume vs wall at sf0.1,
against the exact jaccard_near_dupes(0.8) ground truth.

The banding math (s = Jaccard, b bands of r rows): P(candidate) =
1 − (1 − s^r)^b. More bands / shorter rows → higher recall and more
candidate pairs (more verify-join traffic); fewer bands / longer rows →
cheaper but leakier. The default (H=64, r=2 → b=32) targets
P(miss | s=0.8) ≈ 5·10⁻⁸.

Protocol: per config, median of 3 fresh ``count()`` runs (bench.py's
median-of-reps convention; loadavg recorded — run on a quiet host),
then one run collecting pairs for recall and one candidate-count probe
via the same ``band_keys_table`` the operator uses. Prints a markdown
table for SCALING.md and one JSON line.
"""

from __future__ import annotations

import json
import os
import statistics
import time

from pyspark.sql import functions as F

from consumer_loans_analysis_spark.operators import dedup
from consumer_loans_analysis_spark.session import get_spark
from consumer_loans_analysis_spark.sources.readers import read_table

SRC = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
CONFIGS = [  # (num_hashes, rows_per_band) -> bands = H / r
    (128, 2),  # 64 bands — recall-max, candidate-heavy
    (64, 2),   # 32 bands — the shipped default
    (32, 2),   # 16 bands — half the signature work
    (64, 4),   # 16 bands, longer rows — tighter buckets
    (64, 8),   # 8 bands — cheapest, leakiest
]
THRESHOLD = 0.8


def main() -> None:
    spark = get_spark("d3-sweep")
    t_start = time.perf_counter()
    docs = read_table(spark, SRC, "documents")

    truth = {
        (r["id_a"], r["id_b"])
        for r in dedup.jaccard_near_dupes(docs, threshold=THRESHOLD).collect()
    }
    print(f"exact ground truth: {len(truth)} pairs", flush=True)

    rows_out = []
    for H, r in CONFIGS:
        b = H // r
        walls = []
        for _ in range(3):
            t0 = time.perf_counter()
            dedup.minhash_near_dupes(
                docs, threshold=THRESHOLD, num_hashes=H, rows_per_band=r
            ).count()
            walls.append(time.perf_counter() - t0)
        wall = statistics.median(walls)
        got = {
            (x["id_a"], x["id_b"])
            for x in dedup.minhash_near_dupes(
                docs, threshold=THRESHOLD, num_hashes=H, rows_per_band=r
            ).collect()
        }
        recall = len(got & truth) / len(truth) if truth else 1.0
        # candidate volume through the SAME banding the operator builds
        arr_tbl = dedup.shingle_hash_arrays(docs).filter(F.size("arr") > 0)
        banded = dedup.band_keys_table(arr_tbl, H, r)
        left = banded.select(F.col("id").alias("id_a"), "band_idx", "band_key")
        right = banded.select(F.col("id").alias("id_b"), "band_idx", "band_key")
        n_cand = (
            left.join(right, ["band_idx", "band_key"])
            .filter(F.col("id_a") < F.col("id_b"))
            .select("id_a", "id_b").distinct().count()
        )
        # analytic miss probability at s = threshold
        p_miss = (1.0 - THRESHOLD ** r) ** b
        rows_out.append({
            "num_hashes": H, "rows_per_band": r, "bands": b,
            "wall_median_s": round(wall, 2), "walls": [round(w, 2) for w in walls],
            "recall_at_08": round(recall, 4), "candidate_pairs": n_cand,
            "p_miss_analytic_at_08": f"{p_miss:.1e}",
            "pairs_found": len(got),
        })
        print(rows_out[-1], flush=True)

    print("\n| H | r | bands | wall (median, s) | recall@0.8 | candidate pairs | P(miss|s=0.8) |")
    print("|---|---|---|---|---|---|---|")
    for x in rows_out:
        print(f"| {x['num_hashes']} | {x['rows_per_band']} | {x['bands']} | "
              f"{x['wall_median_s']} | {x['recall_at_08']} | "
              f"{x['candidate_pairs']} | {x['p_miss_analytic_at_08']} |")

    record = {
        "probe": "d3_band_sweep", "sf_dir": SRC, "threshold": THRESHOLD,
        "truth_pairs": len(truth), "rows": rows_out,
        "loadavg": list(os.getloadavg()),
        "sec_total": round(time.perf_counter() - t_start),
    }
    print(json.dumps(record), flush=True)


if __name__ == "__main__":
    main()
