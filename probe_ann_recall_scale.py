"""ANN recall-vs-knob curves at sf0.1 AND the 10×-union sf1 (VERDICT r9 #5).

Measures recall@5 against the exact cosine scan for the two PINNED
pruned paths the driver hash-oracles:

- sim3b's IVF routing (frozen coarse centroids, `operators/ivf_centroids.py`)
  across n_probe;
- sim5c's PQ ADC (frozen codebooks, `operators/pq_codebooks.py`)
  across the rerank budget.

The sf1 union decorrelates its 10 copies with copy-specific ±1 diagonal
reflections (orthogonal transforms — see scale_check.build), so the
pinned quantizers fit on the sf0.1 cloud meet genuinely out-of-fit
vectors at 10× — exactly the drift question: do the pruning knobs hold
when the corpus grows past what the quantizer saw? Live-fit variants
(quantizer refit per corpus, the production cadence) run alongside as
the control.

Usage: python probe_ann_recall_scale.py   (sf1 union must exist —
       run scale_check.py first). Prints one JSON line per
       (path, scale, knob) for SCALING.md.
"""

from __future__ import annotations

import json
import time

from pyspark.sql import functions as F

from consumer_loans_analysis_spark.operators import similarity
from consumer_loans_analysis_spark.operators.ivf_centroids import IVF_CENTROIDS
from consumer_loans_analysis_spark.operators.pq_codebooks import PQ_CODEBOOKS
from consumer_loans_analysis_spark.session import get_spark
from consumer_loans_analysis_spark.sources.readers import read_table

SCALES = [("sf0.1", "/root/testdata/sf0.1"), ("sf1", "/tmp/spark_graft_sf1")]
N_QUERIES = 20
K = 5


def pair_set(df) -> set:
    return {(r["query_id"], r["neighbor_id"]) for r in df.collect()}


def main() -> None:
    spark = get_spark("ann-recall-scale")
    results = []
    for label, sf_dir in SCALES:
        emb = read_table(spark, sf_dir, "embeddings").cache()
        corpus = emb.filter(F.col("vec_id") >= N_QUERIES)
        queries = emb.filter(F.col("vec_id") < N_QUERIES)
        n_corpus = corpus.count()
        exact = pair_set(similarity.cosine_topk(corpus, queries, k=K))

        for n_probe in (2, 3, 4, 5, 6, 8):
            for variant, centroids in (
                ("pinned", IVF_CENTROIDS),
                ("live", None),
            ):
                t0 = time.perf_counter()
                kw = {"centroids": centroids} if centroids else {"n_lists": 8}
                approx = pair_set(
                    similarity.ivf_topk(
                        corpus, queries, k=K, n_probe=n_probe, **kw
                    )
                )
                rec = {
                    "path": f"ivf_{variant}",
                    "scale": label,
                    "n_corpus": n_corpus,
                    "knob": {"n_probe": n_probe},
                    "recall_at_5": round(len(exact & approx) / len(exact), 4),
                    "sec": round(time.perf_counter() - t0, 2),
                }
                results.append(rec)
                print(json.dumps(rec))

        for rerank in (2, 4, 8, 16, 32):
            for variant, codebooks in (
                ("pinned", PQ_CODEBOOKS),
                ("live", None),
            ):
                t0 = time.perf_counter()
                approx = pair_set(
                    similarity.pq_topk(
                        corpus, queries, k=K, m_subs=16, ks=64,
                        rerank=rerank, codebooks=codebooks,
                    )
                )
                rec = {
                    "path": f"pq_{variant}",
                    "scale": label,
                    "n_corpus": n_corpus,
                    "knob": {"rerank": rerank},
                    "recall_at_5": round(len(exact & approx) / len(exact), 4),
                    "sec": round(time.perf_counter() - t0, 2),
                }
                results.append(rec)
                print(json.dumps(rec))
        # r12 (VERDICT r11 #6): the COMPOSED ivfadc path — probe × rerank
        # grid so the two prunings' interaction is visible at both scales.
        # Pinned = the sim8 production shape (frozen router + codebooks);
        # live refits both on the current corpus (parallel subspace fits).
        for n_probe in (2, 4, 8):
            for rerank in (4, 16, 64):
                for variant, cent, cb in (
                    ("pinned", IVF_CENTROIDS, PQ_CODEBOOKS),
                    ("live", None, None),
                ):
                    t0 = time.perf_counter()
                    approx = pair_set(
                        similarity.ivfadc_topk(
                            corpus, queries, k=K, n_probe=n_probe,
                            m_subs=16, ks=64, rerank=rerank,
                            centroids=cent, codebooks=cb,
                        )
                    )
                    rec = {
                        "path": f"ivfadc_{variant}",
                        "scale": label,
                        "n_corpus": n_corpus,
                        "knob": {"n_probe": n_probe, "rerank": rerank},
                        "recall_at_5": round(
                            len(exact & approx) / len(exact), 4
                        ),
                        "sec": round(time.perf_counter() - t0, 2),
                    }
                    results.append(rec)
                    print(json.dumps(rec))
        emb.unpersist()

    with open("ANN_RECALL_SCALE.json", "w") as fh:
        json.dump(results, fh, indent=1)
    print("wrote ANN_RECALL_SCALE.json")


if __name__ == "__main__":
    main()
