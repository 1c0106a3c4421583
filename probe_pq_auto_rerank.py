"""rerank="auto" recall audit (VERDICT r10 #3 'done' condition): the
scale-adaptive PQ re-rank budget must hold recall@5 >= 0.95 at BOTH
sf0.1 and the adversarial out-of-fit sf1 union with NO manual tuning —
pinned codebooks (the drift case the r10 audit caught) and live fits.

Usage: python probe_pq_auto_rerank.py   (sf1 union must exist — run
       scale_check.py first). Appends pq_*_auto rows to
       ANN_RECALL_SCALE.json.
"""

from __future__ import annotations

import json
import math
import time

from pyspark.sql import functions as F

from consumer_loans_analysis_spark.operators import similarity
from consumer_loans_analysis_spark.operators.pq_codebooks import PQ_CODEBOOKS
from consumer_loans_analysis_spark.session import get_spark
from consumer_loans_analysis_spark.sources.readers import read_table

SCALES = [("sf0.1", "/root/testdata/sf0.1"), ("sf1", "/tmp/spark_graft_sf1")]
N_QUERIES = 20
K = 5


def pair_set(df) -> set:
    return {(r["query_id"], r["neighbor_id"]) for r in df.collect()}


def main() -> None:
    spark = get_spark("pq-auto-rerank")
    results = []
    for label, sf_dir in SCALES:
        emb = read_table(spark, sf_dir, "embeddings").cache()
        corpus = emb.filter(F.col("vec_id") >= N_QUERIES)
        queries = emb.filter(F.col("vec_id") < N_QUERIES)
        n_corpus = corpus.count()
        resolved = max(16, math.ceil(16 * max(n_corpus / 2000.0, 1.0) ** 0.30103))
        exact = pair_set(similarity.cosine_topk(corpus, queries, k=K))
        for variant, codebooks in (("pinned", PQ_CODEBOOKS), ("live", None)):
            t0 = time.perf_counter()
            approx = pair_set(
                similarity.pq_topk(
                    corpus, queries, k=K, m_subs=16, ks=64,
                    rerank="auto", codebooks=codebooks,
                )
            )
            rec = {
                "path": f"pq_{variant}_auto",
                "scale": label,
                "n_corpus": n_corpus,
                "knob": {"rerank": "auto", "resolved": resolved},
                "recall_at_5": round(len(exact & approx) / len(exact), 4),
                "sec": round(time.perf_counter() - t0, 2),
            }
            results.append(rec)
            print(json.dumps(rec))
        emb.unpersist()

    with open("ANN_RECALL_SCALE.json") as fh:
        prior = json.load(fh)
    prior = [r for r in prior if not r["path"].endswith("_auto")] + results
    with open("ANN_RECALL_SCALE.json", "w") as fh:
        json.dump(prior, fh, indent=1)
    print("updated ANN_RECALL_SCALE.json")


if __name__ == "__main__":
    main()
