"""Unit tests for the scale-extension operators (dedup/similarity/text/mm)."""

from __future__ import annotations

import hashlib

import pytest
from pyspark.sql import functions as F

from consumer_loans_analysis_spark.operators import dedup, multimodal, similarity, text


@pytest.fixture(scope="module")
def docs(spark):
    base = "the quick brown fox jumps over the lazy dog again and again today"
    near = "the quick brown fox jumps over the lazy dog again and again tonight"
    other = "completely different words about spark engines running large queries"
    return spark.createDataFrame(
        [(0, base), (1, near), (2, other), (3, base)],
        schema="doc_id long, text string",
    )


def test_shingles(docs):
    sh = dedup.shingles(docs.filter("doc_id = 2"), n=3)
    got = {r["shingle"] for r in sh.collect()}
    assert "completely different words" in got
    assert len(got) == 7  # 9 words → 7 trigrams


def test_exact_dedup(docs):
    assert dedup.exact_dedup(docs, ["text"]).count() == 3  # 0 and 3 identical


def test_jaccard_and_minhash_agree(docs):
    exact = {
        (r["id_a"], r["id_b"]): r["jaccard"]
        for r in dedup.jaccard_near_dupes(docs, threshold=0.5).collect()
    }
    mh = {
        (r["id_a"], r["id_b"]): r["jaccard"]
        for r in dedup.minhash_near_dupes(docs, threshold=0.5).collect()
    }
    assert (0, 3) in exact and exact[(0, 3)] == 1.0
    assert (0, 1) in exact and 0.5 < exact[(0, 1)] < 1.0
    assert mh == exact  # LSH candidates + verification ≡ exact answer here


def test_simhash(docs):
    pairs = {
        (r["id_a"], r["id_b"]): r["hamming"]
        for r in dedup.simhash_near_dupes(docs, max_hamming=5).collect()
    }
    assert pairs[(0, 3)] == 0  # identical docs → identical signature
    assert (0, 1) in pairs  # near-dup within distance 5
    assert (0, 2) not in pairs and (2, 3) not in pairs


def test_cosine_topk(spark):
    corpus = spark.createDataFrame(
        [(10, [1.0, 0.0]), (11, [0.9, 0.1]), (12, [0.0, 1.0])],
        schema="vec_id long, embedding array<float>",
    )
    queries = spark.createDataFrame(
        [(0, [1.0, 0.0])], schema="vec_id long, embedding array<float>"
    )
    out = similarity.cosine_topk(corpus, queries, k=2).collect()
    assert [(r["neighbor_id"], r["rank"]) for r in out] == [(10, 1), (11, 2)]
    assert out[0]["cos"] == pytest.approx(1.0)


def test_embedding_near_dupes(spark):
    emb = spark.createDataFrame(
        [(0, [1.0, 0.0]), (1, [1.0, 0.01]), (2, [0.0, 1.0])],
        schema="vec_id long, embedding array<float>",
    )
    pairs = similarity.embedding_near_dupes(emb, threshold=0.99).collect()
    assert [(p["id_a"], p["id_b"]) for p in pairs] == [(0, 1)]


def _pair_set(rows):
    return {(r["id_a"], r["id_b"]): round(r["cos"], 9) for r in rows}


def test_embedding_near_dupes_fullprobe_equals_bruteforce(spark, sf_dir):
    emb = spark.read.parquet(f"{sf_dir}/embeddings.parquet")
    exact = _pair_set(
        similarity.embedding_near_dupes_exact(emb, threshold=0.45).collect()
    )
    # rows_per_band=0 → one all-pairs bucket through the SAME candidate/
    # verify plumbing: provably identical to brute force
    full_probe = _pair_set(
        similarity.embedding_near_dupes(emb, threshold=0.45, rows_per_band=0).collect()
    )
    assert full_probe == exact
    # default banded LSH: miss probability ~6e-16 per true pair at the
    # threshold — expect the identical pair set on real data
    lsh = _pair_set(similarity.embedding_near_dupes(emb, threshold=0.45).collect())
    assert lsh == exact


def test_embedding_near_dupes_blocked_equals_bruteforce(spark, sf_dir):
    """Blocked-GEMM path is exact by construction (it enumerates every
    block pair) — verify against the row-wise Column implementation,
    including with a block count that forces uneven singleton blocks."""
    emb = spark.read.parquet(f"{sf_dir}/embeddings.parquet")
    exact = _pair_set(
        similarity.embedding_near_dupes_exact(emb, threshold=0.45).collect()
    )
    for n_blocks in (1, 7, 32):
        blocked = _pair_set(
            similarity.embedding_near_dupes_blocked(
                emb, threshold=0.45, n_blocks=n_blocks
            ).collect()
        )
        assert blocked == exact, n_blocks


def test_duplicate_clusters(spark):
    """Connected components over an explicit pair graph: a 3-chain
    {0-1, 1-2} (diameter 2 — exercises >1 propagation round), a 2-clique
    {5, 6}, and singletons {3, 4}; canonical = min id per cluster."""
    docs = spark.createDataFrame(
        [(i,) for i in range(7)], schema="doc_id long"
    )
    pairs = spark.createDataFrame(
        [(0, 1), (1, 2), (5, 6)], schema="id_a long, id_b long"
    )
    got = {
        r["doc_id"]: (r["cluster_id"], r["is_canonical"])
        for r in dedup.duplicate_clusters(docs, pairs).collect()
    }
    assert got == {
        0: (0, True), 1: (0, False), 2: (0, False),
        3: (3, True), 4: (4, True),
        5: (5, True), 6: (5, False),
    }


def test_duplicate_clusters_nonconvergence_raises(spark):
    docs = spark.createDataFrame([(i,) for i in range(5)], schema="doc_id long")
    chain = spark.createDataFrame(
        [(i, i + 1) for i in range(4)], schema="id_a long, id_b long"
    )
    with pytest.raises(RuntimeError, match="converge"):
        dedup.duplicate_clusters(docs, chain, max_iter=1)


def test_simhash_blocking_equals_allpairs(docs):
    """Pigeonhole blocking finds EXACTLY the all-pairs answer (the split
    into max_hamming+1 blocks guarantees no false negatives; the Hamming
    verify removes false positives)."""
    sig = dedup.simhash_signatures(docs)
    a = sig.select(F.col("id").alias("id_a"), F.col("simhash").alias("sig_a"))
    b = sig.select(F.col("id").alias("id_b"), F.col("simhash").alias("sig_b"))
    brute = {
        (r["id_a"], r["id_b"]): r["hamming"]
        for r in a.join(b, F.col("id_a") < F.col("id_b"))
        .withColumn("hamming", F.bit_count(F.col("sig_a").bitwiseXOR(F.col("sig_b"))))
        .filter(F.col("hamming") <= 5)
        .select("id_a", "id_b", "hamming")
        .collect()
    }
    blocked = {
        (r["id_a"], r["id_b"]): r["hamming"]
        for r in dedup.simhash_near_dupes(docs, max_hamming=5).collect()
    }
    assert blocked == brute


def test_token_stats(spark):
    df = spark.createDataFrame([(0, "abcd ab abcdefgh")], "doc_id long, text string")
    row = text.token_stats(df).collect()[0]
    assert row["n_tokens"] == 3
    assert row["n_subwords"] == 1 + 1 + 2


def test_fingerprint_order_invariant(spark):
    df = spark.createDataFrame(
        [(0, "alpha beta gamma"), (1, "gamma alpha beta"), (2, "alpha beta delta")],
        "doc_id long, text string",
    )
    fp = {r["doc_id"]: r["fingerprint"] for r in text.fingerprint(df).collect()}
    assert fp[0] == fp[1] != fp[2]


def test_repetition_stats(spark):
    """A pure 2-word loop is maximally repetitive (every trigram repeats,
    one bigram dominates); an all-distinct doc has zero repetition; a
    1-word doc (no n-grams) gets zeros, not nulls."""
    docs = spark.createDataFrame(
        [
            (0, "spam ham " * 20 + "spam"),
            (1, "one two three four five six seven eight nine ten"),
            (2, "single"),
        ],
        schema="doc_id long, text string",
    )
    got = {r["doc_id"]: r for r in text.repetition_stats(docs).collect()}
    assert got[0]["is_repetitive"] and got[0]["dup_trigram_frac"] == 1.0
    assert got[0]["top_bigram_frac"] == pytest.approx(0.5, abs=0.01)
    assert not got[1]["is_repetitive"]
    assert got[1]["dup_trigram_frac"] == 0.0 and got[1]["top_bigram_frac"] == pytest.approx(1 / 9)
    assert not got[2]["is_repetitive"]
    assert got[2]["top_bigram_frac"] == 0.0 and got[2]["dup_trigram_frac"] == 0.0


def test_lang_id_markers(spark):
    df = spark.createDataFrame(
        [(0, "the cat and the dog of the house"), (1, "el gato y la casa de los perros")],
        "doc_id long, text string",
    )
    out = {r["doc_id"]: r["lang_pred"] for r in text.lang_id(df).collect()}
    assert out == {0: "en", 1: "es"}


def test_multimodal_decode_matches_stub(spark):
    df = spark.createDataFrame([(0, "hello world")], "doc_id long, text string")
    row = multimodal.decode_images(multimodal.attach_binary(df)).collect()[0]
    h = int(hashlib.md5(b"hello world").hexdigest()[:8], 16)
    assert row["n_bytes"] == 11
    assert row["width"] == 1 + h % 64
    assert row["height"] == 1 + h % 48
    assert row["mean_pixel"] == pytest.approx((h % 256) / 255.0)


def test_portable_hash_matches_duckdb(spark):
    import duckdb

    df = spark.createDataFrame([("abc",)], "s string")
    spark_val = df.select(text.portable_hash(F.col("s")).alias("h")).collect()[0]["h"]
    duck_val = duckdb.sql(
        "SELECT CAST(concat('0x', substr(md5('abc'),1,8)) AS BIGINT)"
    ).fetchone()[0]
    assert spark_val == duck_val


def test_ivf_recall(spark, sf_dir):
    """IVF with moderate probes recovers most exact neighbors; full probe
    (n_probe = n_lists) recovers them all."""
    from consumer_loans_analysis_spark.operators import similarity
    from consumer_loans_analysis_spark.sources.readers import read_table
    from pyspark.sql import functions as F

    emb = read_table(spark, sf_dir, "embeddings").cache()
    corpus = emb.filter(F.col("vec_id") >= 10)
    queries = emb.filter(F.col("vec_id") < 10)
    exact = {
        (r["query_id"], r["neighbor_id"])
        for r in similarity.cosine_topk(corpus, queries, k=5).collect()
    }
    def recall(n_probe: int) -> float:
        approx = {
            (r["query_id"], r["neighbor_id"])
            for r in similarity.ivf_topk(
                corpus, queries, k=5, n_lists=8, n_probe=n_probe
            ).collect()
        }
        return len(exact & approx) / len(exact)

    r4, r6 = recall(4), recall(6)
    # recall rises with probes and is well above the n_probe/n_lists floor
    assert r4 >= 0.7, r4
    assert r6 >= max(r4, 0.85), (r4, r6)
    # full probe == exact search
    full = {
        (r["query_id"], r["neighbor_id"])
        for r in similarity.ivf_topk(corpus, queries, k=5, n_lists=8, n_probe=8).collect()
    }
    assert full == exact


def test_ivf_pinned_recall(spark, sf_dir):
    """The sim3b pinned-quantizer path: 5-of-8 probes with the FROZEN
    centroids still recover most exact neighbors, and pinned full probe
    equals the exact scan (routing can hide candidates, never invent or
    mis-rank them). 5 probes, not 3: these near-random test embeddings
    (cos margins 0.45 vs 0.4497 — see d5) have weak cluster structure, so
    8-list routing at 3 probes sits near 0.56 recall at every SF —
    measured, a data property."""
    from consumer_loans_analysis_spark.operators import similarity
    from consumer_loans_analysis_spark.operators.ivf_centroids import IVF_CENTROIDS
    from consumer_loans_analysis_spark.sources.readers import read_table
    from pyspark.sql import functions as F

    emb = read_table(spark, sf_dir, "embeddings").cache()
    corpus = emb.filter(F.col("vec_id") >= 5)
    queries = emb.filter(F.col("vec_id") < 5)
    exact = {
        (r["query_id"], r["neighbor_id"])
        for r in similarity.cosine_topk(corpus, queries, k=5).collect()
    }
    approx = {
        (r["query_id"], r["neighbor_id"])
        for r in similarity.ivf_topk(
            corpus, queries, k=5, n_probe=5, centroids=IVF_CENTROIDS
        ).collect()
    }
    assert len(exact & approx) / len(exact) >= 0.7
    full = {
        (r["query_id"], r["neighbor_id"])
        for r in similarity.ivf_topk(
            corpus, queries, k=5, n_probe=len(IVF_CENTROIDS),
            centroids=IVF_CENTROIDS,
        ).collect()
    }
    assert full == exact


def test_pq_pinned_recall(spark, sf_dir):
    """The sim5c pinned-codebook path matches live-fit sim5's recall
    profile (0.88 @ rerank 4 measured; 1.0 @ rerank 16), and a rerank
    budget ≥ corpus degenerates to the exact scan."""
    from consumer_loans_analysis_spark.operators import similarity
    from consumer_loans_analysis_spark.operators.pq_codebooks import PQ_CODEBOOKS
    from consumer_loans_analysis_spark.sources.readers import read_table
    from pyspark.sql import functions as F

    emb = read_table(spark, sf_dir, "embeddings").cache()
    corpus = emb.filter(F.col("vec_id") >= 5)
    queries = emb.filter(F.col("vec_id") < 5)
    exact = {
        (r["query_id"], r["neighbor_id"])
        for r in similarity.cosine_topk(corpus, queries, k=5).collect()
    }

    def approx(rerank: int) -> set:
        return {
            (r["query_id"], r["neighbor_id"])
            for r in similarity.pq_topk(
                corpus, queries, k=5, m_subs=16, ks=64, rerank=rerank,
                codebooks=PQ_CODEBOOKS,
            ).collect()
        }

    assert len(exact & approx(4)) / len(exact) >= 0.8
    assert approx(400) == exact  # R = 2000 ≥ corpus at every test sf


def test_ivfadc_pinned_recall(spark, sf_dir):
    """The sim8 composed path: recall is bounded by the PRODUCT of its
    prunings (IVF probe-5 ~0.87 × PQ rerank-4 ~0.8 on these weakly
    clustered embeddings — measured 0.72/0.80/0.56 at the 3 SFs), and
    the no-pruning degeneration (probe all 8 lists + rerank ≥ corpus)
    must EQUAL the exact scan — routing and the ADC cut may hide
    candidates, never invent or mis-rank them."""
    from consumer_loans_analysis_spark.operators import similarity
    from consumer_loans_analysis_spark.operators.ivf_centroids import IVF_CENTROIDS
    from consumer_loans_analysis_spark.operators.pq_codebooks import PQ_CODEBOOKS
    from consumer_loans_analysis_spark.sources.readers import read_table
    from pyspark.sql import functions as F

    emb = read_table(spark, sf_dir, "embeddings").cache()
    corpus = emb.filter(F.col("vec_id") >= 5)
    queries = emb.filter(F.col("vec_id") < 5)
    exact = {
        (r["query_id"], r["neighbor_id"])
        for r in similarity.cosine_topk(corpus, queries, k=5).collect()
    }

    def approx(n_probe: int, rerank: int) -> set:
        return {
            (r["query_id"], r["neighbor_id"])
            for r in similarity.ivfadc_topk(
                corpus, queries, k=5, n_probe=n_probe, m_subs=16, ks=64,
                rerank=rerank, centroids=IVF_CENTROIDS, codebooks=PQ_CODEBOOKS,
            ).collect()
        }

    assert len(exact & approx(5, 4)) / len(exact) >= 0.6
    assert approx(len(IVF_CENTROIDS), 400) == exact
    # live mode (both quantizers fit on the bounded sample) produces a
    # valid ranked result for every query too
    live = similarity.ivfadc_topk(
        corpus, queries, k=5, n_probe=2, m_subs=16, ks=16,
    ).collect()
    assert {r["query_id"] for r in live} == {0, 1, 2, 3, 4}
    assert all(1 <= r["rank"] <= 5 for r in live)


def test_prefix_rerank_recall(spark, sf_dir):
    """sim6's funnel: (a) degenerate funnel (full-dim prefix, rerank ≥
    corpus) EQUALS the exact scan; (b) a larger rerank budget never loses
    neighbors (candidate sets grow as supersets); (c) the 16-dim/R=20
    funnel beats its 4%-of-corpus random-candidate floor by an order of
    magnitude. Absolute recall is ~0.4 here BY DATA DESIGN: these test
    embeddings are iid-random (prefix carries 16/64 of the signal, cos
    margins razor-thin — see d5); Matryoshka-trained embeddings, the
    operator's domain, concentrate signal in the prefix."""
    from consumer_loans_analysis_spark.operators import similarity
    from consumer_loans_analysis_spark.sources.readers import read_table
    from pyspark.sql import functions as F

    emb = read_table(spark, sf_dir, "embeddings").cache()
    corpus = emb.filter(F.col("vec_id") >= 5)
    queries = emb.filter(F.col("vec_id") < 5)
    exact = {
        (r["query_id"], r["neighbor_id"])
        for r in similarity.cosine_topk(corpus, queries, k=5).collect()
    }
    dim = len(emb.select("embedding").first()["embedding"])
    n = corpus.count()
    degenerate = {
        (r["query_id"], r["neighbor_id"])
        for r in similarity.prefix_rerank_topk(
            corpus, queries, k=5, prefix_dim=dim, rerank=(n // 5) + 1
        ).collect()
    }
    assert degenerate == exact

    def recall(rerank: int) -> float:
        approx = {
            (r["query_id"], r["neighbor_id"])
            for r in similarity.prefix_rerank_topk(
                corpus, queries, k=5, prefix_dim=16, rerank=rerank
            ).collect()
        }
        return len(exact & approx) / len(exact)

    r4, r8 = recall(4), recall(8)
    assert r8 >= r4 >= 0.3, (r4, r8)


def test_seeded_samples_deterministic(spark, sf_dir):
    """o4/o5 have no SQL oracle (Spark RNG); pin their contract instead:
    same seed + same partitioning → identical sample, twice."""
    from consumer_loans_analysis_spark.plans import registry

    registry.load_all()
    for name in ("o4_sample_uniform", "o5_sample_stratified"):
        a = sorted(map(str, registry.QUERIES[name](spark, sf_dir).collect()))
        b = sorted(map(str, registry.QUERIES[name](spark, sf_dir).collect()))
        assert a == b and len(a) > 0, name


def test_quantize_int8_bounds_and_fidelity(spark):
    import math

    df = spark.createDataFrame(
        [(0, [0.5, -1.0, 0.25, 0.125]), (1, [1e-3, 2e-3, -4e-3, 0.0])],
        schema="vec_id long, embedding array<float>",
    )
    scale, qvec = similarity.quantize_int8(F.col("embedding"))
    rows = df.select(
        "vec_id", scale.alias("s"), qvec.alias("q"), F.col("embedding").alias("v")
    ).collect()
    for r in rows:
        assert all(-127 <= x <= 127 for x in r["q"])
        # max-|v| element maps to exactly ±127
        assert 127.0 in [abs(x) for x in r["q"]]
        # dequantized reconstruction is within half a quantization step
        for orig, q in zip(r["v"], r["q"]):
            assert math.isclose(q / r["s"], orig, abs_tol=0.5 / r["s"] + 1e-12)


def test_duplicate_spans(spark):
    shared = " ".join(f"w{i}" for i in range(20))          # exact 20-word span
    doc_a = shared + " tail_a unique_a"
    doc_b = "head_b " + shared
    doc_c = " ".join(f"z{i}" for i in range(25))           # no shared spans
    doc_d = "too short"                                    # < 20 words
    df = spark.createDataFrame(
        [(0, doc_a), (1, doc_b), (2, doc_c), (3, doc_d)],
        schema="doc_id long, text string",
    )
    got = {r["doc_id"]: r for r in dedup.duplicate_spans(df, span_words=20).collect()}
    assert got[0]["n_spans"] == 3 and got[0]["n_dup_spans"] == 1  # only the exact shared span
    assert got[1]["n_spans"] == 2 and got[1]["n_dup_spans"] == 1
    assert got[2]["n_spans"] == 6 and got[2]["n_dup_spans"] == 0
    assert got[3]["n_spans"] == 0 and got[3]["dup_span_ratio"] is None


def test_redact_counts_and_output(spark):
    df = spark.createDataFrame(
        [
            (0, "contact me at bob@example.com or 555-123-4567 now"),
            (1, "server at 10.0.0.1 and 192.168.1.255 up"),
            (2, "monkey keys nothing to scrub here"),
        ],
        schema="doc_id long, text string",
    )
    out = {r["doc_id"]: r for r in text.redact(df, text.PII_PATTERNS).collect()}
    assert out[0]["n_email"] == 1 and out[0]["n_phone"] == 1
    assert out[0]["n_redactions"] == 2
    assert "bob@example.com" not in out[0]["text_redacted"]
    assert "[REDACTED]" in out[0]["text_redacted"]
    assert out[1]["n_ipv4"] == 2 and "10.0.0.1" not in out[1]["text_redacted"]
    # sequential counting: ipv4 already scrubbed both dotted quads, so the
    # broader phone pattern (which matches long dotted IPs too) finds none
    assert out[1]["n_phone"] == 0 and out[1]["n_redactions"] == 2
    # word boundaries: "monkey"/"keys" must survive a \bkey\b-style denylist
    den = {r["doc_id"]: r for r in text.redact(df, {"kw": r"\bkey\b"}).collect()}
    assert den[2]["n_kw"] == 0 and den[2]["text_redacted"] == den[2]["text"]


def test_bm25_known_values(spark):
    # 2 docs; "rare" appears only in doc 0, "the" in both -> idf(rare) > idf(the)
    df = spark.createDataFrame(
        [(0, "the rare term the"), (1, "the common the stuff")],
        schema="doc_id long, text string",
    )
    out = text.bm25_top_terms(df, k=10)
    rows = {(r["doc_id"], r["term"]): r for r in out.collect()}
    import math as m
    # idf per the exact formula: N=2, df(the)=2, df(rare)=1
    idf_the = m.log((2 - 2 + 0.5) / (2 + 0.5) + 1.0)
    idf_rare = m.log((2 - 1 + 0.5) / (1 + 0.5) + 1.0)
    r = rows[(0, "rare")]
    # dl=4, avgdl=4 -> denominator tf + k1*(1-b+b*1) = tf + k1
    expect = idf_rare * (1 * 2.2) / (1 + 1.2)
    assert abs(r["bm25"] - round(expect, 6)) < 1e-9
    t = rows[(0, "the")]
    expect_the = idf_the * (2 * 2.2) / (2 + 1.2)
    assert abs(t["bm25"] - round(expect_the, 6)) < 1e-9
    # rank 1 in doc 0 is the highest-scored term
    top = [r for r in rows.values() if r["doc_id"] == 0 and r["rank"] == 1][0]
    assert top["bm25"] == max(r["bm25"] for r in rows.values() if r["doc_id"] == 0)


def test_group_reservoir_is_pure_function_of_data(spark, sf_dir):
    import consumer_loans_analysis_spark.plans.datapipe_queries  # noqa: F401  (registers)
    from pyspark.sql import Window

    from consumer_loans_analysis_spark.plans.registry import QUERIES

    a = QUERIES["o11_group_reservoir"](spark, sf_dir)
    got = sorted((r["source"], r["doc_id"]) for r in a.collect())

    # the kept set must be a pure function of the DATA: rebuild the same
    # selection over a differently-partitioned input and compare
    docs = spark.read.parquet(f"{sf_dir}/documents.parquet").repartition(7)
    h = text.portable_hash(F.concat(F.lit("o11:"), F.col("doc_id").cast("string")))
    w = Window.partitionBy("source").orderBy(h.asc(), F.col("doc_id").asc())
    b = (
        docs.select("source", "doc_id", F.row_number().over(w).alias("pick"))
        .filter(F.col("pick") <= 5)
    )
    again = sorted((r["source"], r["doc_id"]) for r in b.collect())
    assert got == again
    per_group = {}
    for s, d in got:
        per_group.setdefault(s, []).append(d)
    assert all(len(v) <= 5 for v in per_group.values())


def test_gopher_rules_hand_computed(spark):
    """Each Gopher rule fires on exactly the document planted to violate
    it (paper defaults except word-count bounds, rescaled to the tiny
    fixture)."""
    from consumer_loans_analysis_spark.operators.text import gopher_quality_rules

    df = spark.createDataFrame(
        [
            (1, "the quick brown fox jumps with all of that have energy"),
            (2, "the of"),                                   # too few words
            (3, "the extraordinarily incomprehensible "      # mean word len > 10
                + "internationalization of anthropomorphized "
                + "characteristically overrepresented have"),
            (4, "# # # the ## of # stuff ... #"),            # symbol ratio
            (5, "1 2 3 4 5 6 7 8 the of"),                   # alpha ratio < 0.8
            (6, "cat dog bird fish mouse horse cow hen"),    # 0 stopwords
        ],
        schema="doc_id int, text string",
    )
    out = {
        r["doc_id"]: r
        for r in gopher_quality_rules(df, min_words=3, max_words=60).collect()
    }
    assert out[1]["keep"] is True
    assert out[2]["ok_word_count"] is False and out[2]["ok_stopwords"] is True
    assert out[3]["ok_mean_word_len"] is False
    assert out[4]["ok_symbol_ratio"] is False
    assert out[5]["ok_alpha_words"] is False and out[5]["ok_word_count"] is True
    assert out[6]["ok_stopwords"] is False
    # only the planted rule (plus keep) fails per row
    assert out[4]["n_words"] == 10 and out[4]["n_stopwords"] == 2
    assert abs(out[5]["alpha_word_ratio"] - 0.2) < 1e-12


def test_c4_line_rules_hand_computed(spark):
    """Each C4 line rule fires on exactly the planted line; the cleaned
    text is the surviving lines re-joined in ORDER and its md5 matches a
    hand computation (the oracle hashes the same string)."""
    import hashlib

    from consumer_loans_analysis_spark.operators.text import c4_line_rules

    good = lambda tag: " ".join(f"{tag}w{i:03d}" for i in range(10))  # noqa: E731
    docs = [
        # 3 clean 10-word lines (every word 6-7 chars) -> everything kept
        (1, " ".join(good(t) for t in ("a", "b", "c"))),
        # middle line carries the denylist token 'dup' -> that line dies,
        # the other three survive -> page still kept
        (2, " ".join([good("a"), "dup " + " ".join(f"x{i:04d}" for i in range(9)),
                      good("c"), good("d")])),
        # 24 words -> 4-word tail line fails the short rule; 2 kept < 3
        (3, " ".join(f"y{i:04d}" for i in range(24))),
        # middle line of ten 2-char words -> mean word length 2 < 4.2
        (4, " ".join([good("a"), " ".join(["zz"] * 10), good("c")])),
    ]
    out = {
        r["doc_id"]: r
        for r in c4_line_rules(
            spark.createDataFrame(docs, "doc_id int, text string")
        ).collect()
    }
    assert out[1]["keep"] is True and out[1]["n_kept_lines"] == 3
    assert out[1]["cleaned_text"] == docs[0][1]
    assert out[2]["n_denylist_lines"] == 1 and out[2]["keep"] is True
    assert out[2]["cleaned_text"] == " ".join([good("a"), good("c"), good("d")])
    assert out[3]["n_short_lines"] == 1 and out[3]["n_kept_lines"] == 2
    assert out[3]["keep"] is False
    assert out[4]["n_low_mwl_lines"] == 1 and out[4]["n_kept_lines"] == 2
    # md5 of the reassembled text matches an independent hash (what the
    # DuckDB oracle compares against)
    assert (
        out[2]["cleaned_md5"]
        == hashlib.md5(out[2]["cleaned_text"].encode()).hexdigest()
    )
    # zero-survivor page: md5('') on both engines (the COALESCE case)
    empty = c4_line_rules(
        spark.createDataFrame([(9, " ".join(["zz"] * 30))], "doc_id int, text string")
    ).collect()[0]
    assert empty["n_kept_lines"] == 0
    assert empty["cleaned_md5"] == hashlib.md5(b"").hexdigest()


def test_token_budget_select_straddle_semantics(spark, tmp_path):
    """o15's greedy-knapsack relaxation on a crafted shard: a document is
    admitted iff the budget is not exhausted BEFORE it, so exactly one
    document may straddle the 600-word boundary and everything after it
    is cut — and ordering is (quality DESC, doc_id ASC)."""
    from consumer_loans_analysis_spark.plans import registry

    registry.load_all()
    # quality score is monotone in doc order here: doc 0 richest vocab.
    # word counts: 550, 40, 30 → cum_before = 0, 550, 590; all < 600?
    # doc2 cum_before 590 < 600 admitted (straddles to 620), doc3 would
    # see 620 ≥ 600 → cut.
    texts = [
        " ".join(f"w{i}" for i in range(550)),          # distinct: high TTR
        " ".join(["the", "a"] * 20),                     # 40 words
        " ".join(["x"] * 30),                            # 30 words, low TTR
        " ".join(["y"] * 25),                            # 25 words — cut
    ]
    df = spark.createDataFrame(
        [(i, t, "en", "srcA", len(t)) for i, t in enumerate(texts)],
        schema="doc_id long, text string, lang string, source string, n_chars long",
    )
    df.write.mode("overwrite").parquet(str(tmp_path / "documents.parquet"))
    out = registry.QUERIES["o15_token_budget_select"](spark, str(tmp_path))
    rows = {r["doc_id"]: r for r in out.collect()}
    # quality ordering on this fixture: doc0 (TTR 1.0) > doc1 > doc2/3
    assert set(rows) == {0, 1, 2}, rows
    assert rows[2]["words_before"] == 590  # admitted: 590 < 600, straddles
    assert 0 in rows and rows[0]["words_before"] == 0


def test_quality_audit_detects_seeded_violations(spark):
    from consumer_loans_analysis_spark.operators import quality as dq

    df = spark.createDataFrame(
        [
            (1, "O", 10.0, "a@b.co"),
            (1, "O", 20.0, "c@d.eu"),        # duplicate key
            (None, "F", -5.0, "not-an-email"),  # null key, range, pattern
            (3, "X", 99.0, None),            # bad status; null email not a violation
        ],
        schema="k int, status string, amt double, email string",
    )
    ref = spark.createDataFrame([(1,), (3,)], schema="k int")
    res = {
        r["rule"]: r
        for r in dq.audit(
            df,
            [
                dq.not_null("k"),
                dq.unique("k"),
                dq.in_set("status", ["O", "F", "P"]),
                dq.in_range("amt", 0, 50),
                dq.matches("email", r"^[^@]+@[^@]+\.[a-z]+$"),
                dq.foreign_key("k", ref, "k"),
            ],
        ).collect()
    }
    assert res["not_null_k"]["n_violations"] == 1
    assert res["unique_k"]["n_violations"] == 1     # one extra row in the dup group
    assert res["set_status"]["n_violations"] == 1
    assert res["range_amt"]["n_violations"] == 2    # -5 and 99
    assert res["matches_email"]["n_violations"] == 1
    assert res["fk_k"]["n_violations"] == 0         # nulls skipped; 1 and 3 exist
    assert all(r["n_rows"] == 4 for r in res.values())
    assert not res["unique_k"]["passed"] and res["fk_k"]["passed"]


def test_simhash64_blocking_equals_allpairs(docs):
    """bits=64: full-width signatures must (a) carry information in the top
    32 bits — a 32-bit hash would leave them constant and blow up blocking
    — and (b) reproduce the brute-force Hamming answer exactly."""
    sig = dedup.simhash_signatures(docs, bits=64)
    rows = sig.collect()
    top_halves = {r["simhash"] >> 32 for r in rows}
    assert len(top_halves) > 1, "top 32 signature bits are degenerate"
    a = sig.select(F.col("id").alias("id_a"), F.col("simhash").alias("sig_a"))
    b = sig.select(F.col("id").alias("id_b"), F.col("simhash").alias("sig_b"))
    brute = {
        (r["id_a"], r["id_b"]): r["hamming"]
        for r in a.join(b, F.col("id_a") < F.col("id_b"))
        .withColumn("hamming", F.bit_count(F.col("sig_a").bitwiseXOR(F.col("sig_b"))))
        .filter(F.col("hamming") <= 5)
        .select("id_a", "id_b", "hamming")
        .collect()
    }
    blocked = {
        (r["id_a"], r["id_b"]): r["hamming"]
        for r in dedup.simhash_near_dupes(docs, max_hamming=5, bits=64).collect()
    }
    assert blocked == brute


def test_jaccard_df_cap_drops_boilerplate(spark):
    """Hot-shingle cap: docs sharing a boilerplate prefix must not pair up
    on boilerplate alone, and capped Jaccard is computed over the filtered
    shingle universe (hot shingles leave numerator AND denominator)."""
    boiler = "all rights reserved by the example corporation"
    rows = [(i, f"{boiler} unique tail {i} alpha beta") for i in range(20)]
    # plus one genuine near-dup pair whose similarity survives the cap
    rows += [
        (100, "the quick brown fox jumps over the lazy dog today"),
        (101, "the quick brown fox jumps over the lazy dog tonight"),
    ]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    capped = {
        (r["id_a"], r["id_b"]): r["jaccard"]
        for r in dedup.jaccard_near_dupes(
            df, threshold=0.5, max_shingle_df=3
        ).collect()
    }
    # boilerplate-only docs share ONLY above-cap shingles -> no pairs
    assert all(a == 100 and b == 101 for a, b in capped), capped
    # the surviving pair's jaccard uses the filtered universe: both docs
    # have 8 shingles, sharing 7 (all below cap; "lazy dog X" differs)
    assert capped[(100, 101)] == pytest.approx(7 / 9)
    # uncapped, the boilerplate docs DO pair up (sanity: the cap is what
    # removed them, not the threshold)
    uncapped = dedup.jaccard_near_dupes(df, threshold=0.5).collect()
    assert any(r["id_a"] < 100 for r in uncapped)


def test_duplicate_spans_df_cap(spark):
    """Span-df cap: spans above the cap leave the span universe entirely,
    and zero-span docs keep their output row."""
    boiler = " ".join(f"b{i}" for i in range(6))
    rows = [(i, f"{boiler} u{i} v{i}") for i in range(5)]  # hot 6-word span
    rows.append((10, f"{boiler} u0 v0"))  # exact dup of doc 0's text
    rows.append((11, "short"))  # zero spans
    df = spark.createDataFrame(rows, "doc_id long, text string")
    out = {
        r["doc_id"]: (r["n_spans"], r["n_dup_spans"])
        for r in dedup.duplicate_spans(
            df, span_words=6, max_span_df=4
        ).collect()
    }
    assert len(out) == 7  # every doc, including the zero-span one
    assert out[11] == (0, 0)
    # the boilerplate span (df=6 > cap) is excluded everywhere; docs 0 and
    # 10 still share their full 3-span tail (df=2 each)
    assert out[0] == (2, 2) and out[10] == (2, 2)
    # a doc whose only above-cap span was the boilerplate keeps its unique
    # tail spans (df=1, kept, not dup)
    assert out[1] == (2, 0)


def test_bpe_encode_matches_reference_greedy(spark):
    """bpe_encode == the textbook GPT-2 greedy loop (min-rank pair, merge
    all left-to-right non-overlapping occurrences, repeat) on words that
    exercise multi-level chains, cross-rank interleaving and repeats."""
    from consumer_loans_analysis_spark.operators.text import (
        DEFAULT_BPE_MERGES,
        bpe_encode,
        bpe_vocab,
    )

    def ref_bpe(word, merges):
        ranks = {m: i for i, m in enumerate(merges)}
        syms = list(word)
        while True:
            present = [
                ranks[(syms[i], syms[i + 1])]
                for i in range(len(syms) - 1)
                if (syms[i], syms[i + 1]) in ranks
            ]
            if not present:
                return syms
            l, r = merges[min(present)]
            out, i = [], 0
            while i < len(syms):
                if i < len(syms) - 1 and syms[i] == l and syms[i + 1] == r:
                    out.append(l + r)
                    i += 2
                else:
                    out.append(syms[i])
                    i += 1
            syms = out

    texts = [
        (0, "table query hash scan join row"),
        (1, "aggg errrr tttaaa"),          # repeat runs (non-overlap parity)
        (2, "scanner stable jointable"),   # merges inside longer words
        (3, "zzz qqq"),                    # no merges fire
    ]
    df = spark.createDataFrame(texts, "doc_id long, text string")
    got = {
        r["doc_id"]: (r["n_tokens"], r["token_str"])
        for r in bpe_encode(df).collect()
    }
    vocab = bpe_vocab(DEFAULT_BPE_MERGES)
    for doc_id, line in texts:
        ids = []
        for w in line.split():
            ids += [vocab.get(s, -1) for s in ref_bpe(w, DEFAULT_BPE_MERGES)]
        assert got[doc_id] == (len(ids), " ".join(map(str, ids))), doc_id


def test_bpe_encode_converges_in_m_rounds(spark):
    """Structural convergence: len(merges) rounds reach a fixpoint — an
    extra round changes nothing (each round permanently retires a rank)."""
    from consumer_loans_analysis_spark.operators.text import (
        DEFAULT_BPE_MERGES,
        bpe_encode,
    )

    df = spark.createDataFrame(
        [(0, "table tabletable stable query scanner hashhash jointable aggg")],
        "doc_id long, text string",
    )
    m = len(DEFAULT_BPE_MERGES)
    base = bpe_encode(df, n_rounds=m).collect()
    extra = bpe_encode(df, n_rounds=m + 1).collect()
    assert base == extra


def test_bpe_train_then_encode_roundtrip(spark):
    """Learned merges feed bpe_encode: training on a corpus whose dominant
    pair structure is known must learn those merges first, and encoding
    with the learned table must compress tokens accordingly."""
    from consumer_loans_analysis_spark.operators.text import bpe_encode, bpe_train

    rows = [(i, "abab abab cdcd") for i in range(30)]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    merges = bpe_train(df, n_merges=3)
    learned = [(l, r) for l, r, _ in merges]
    # 'ab' dominates (4 occurrences/doc vs 2 for cd; 'ba' overlaps down to
    # 2 after non-overlap); then ab+ab; counts are deterministic
    assert learned[0] == ("a", "b"), merges
    assert ("ab", "ab") in learned, merges
    out = bpe_encode(
        df.limit(1), merges=[(l, r) for l, r, _ in merges]
    ).collect()[0]
    # "abab"->1 token ("abab"), "cdcd" depends on rank 3; at most 4+ tokens
    assert out["n_tokens"] < 14  # raw chars would be 14


def test_dsir_selection_is_target_biased(spark, sf_dir):
    """DSIR (curation.py): (a) returns exactly k docs; (b) the selected
    sample is enriched in the target domain vs the corpus base rate —
    the operator's entire point; (c) selection is a TakeOrderedAndProject
    (top-k), not a global sort materialization."""
    from consumer_loans_analysis_spark.operators import curation
    from consumer_loans_analysis_spark.sources.readers import read_table

    docs = read_table(spark, sf_dir, "documents")
    sel = curation.dsir_select(docs, F.col("lang") == "en", k=100)
    assert "TakeOrderedAndProject" in sel._jdf.queryExecution().executedPlan().toString()
    rows = sel.collect()
    assert len(rows) == 100
    share_sel = sum(r["lang"] == "en" for r in rows) / len(rows)
    base = docs.filter(F.col("lang") == "en").count() / docs.count()
    # the synthetic corpus shares most vocabulary across langs, so the
    # importance signal is weak — require enrichment, not domination
    assert share_sel > base + 0.03, (share_sel, base)
    # selection prefers high-importance docs: mean logw of the sample
    # beats the corpus mean
    sel_mean = sum(r["logw"] for r in rows) / len(rows)
    corpus_mean = curation.dsir_select(docs, F.col("lang") == "en", k=10**9).agg(
        F.avg("logw")
    ).head()[0]
    assert sel_mean > corpus_mean, (sel_mean, corpus_mean)


def test_ccnet_buckets_partition_each_language(spark, sf_dir):
    """CCNet buckets (curation.py): per language, head/middle/tail are a
    partition in tercile-balanced proportions (each bucket within
    [1/6, 1/2] of that language's scored docs), and head has the lowest
    mean cross-entropy."""
    from consumer_loans_analysis_spark.operators import curation
    from consumer_loans_analysis_spark.sources.readers import read_table

    docs = read_table(spark, sf_dir, "documents")
    out = curation.ccnet_perplexity_buckets(
        docs, F.col("source").isin("src0", "src1", "src2", "src3", "src4")
    ).cache()
    stats = {
        (r["lang"], r["bucket"]): (r["n"], r["ce"])
        for r in out.groupBy("lang", "bucket")
        .agg(F.count(F.lit(1)).alias("n"), F.avg("cross_entropy").alias("ce"))
        .collect()
    }
    langs = {k[0] for k in stats}
    assert len(langs) >= 3
    for lang in langs:
        counts = {b: stats.get((lang, b), (0, 0.0))[0] for b in ("head", "middle", "tail")}
        total = sum(counts.values())
        assert total > 0
        for b, n in counts.items():
            assert total / 6 <= n <= total / 2, (lang, b, counts)
        assert (
            stats[(lang, "head")][1]
            < stats[(lang, "middle")][1]
            < stats[(lang, "tail")][1]
        )
    out.unpersist()


def test_semantic_dedup_components(spark, sf_dir):
    """semantic_dedup (curation.py): labels are valid min-label components
    — every cluster_id is the min vec_id of its cluster, exactly one
    canonical per cluster, and every ≥-threshold same-bucket cosine pair
    lands in the same cluster."""
    from consumer_loans_analysis_spark.operators import curation, similarity
    from consumer_loans_analysis_spark.sources.readers import read_table

    emb = read_table(spark, sf_dir, "embeddings").cache()
    out = curation.semantic_dedup(emb, threshold=0.45, n_bits=4).cache()
    assert out.count() == emb.count()
    agg = out.groupBy("cluster_id").agg(
        F.min("vec_id").alias("mn"),
        F.count_if(F.col("is_canonical")).alias("n_canon"),
    )
    bad = agg.filter(
        (F.col("cluster_id") != F.col("mn")) | (F.col("n_canon") != 1)
    ).count()
    assert bad == 0
    # every same-bucket near-dup pair is co-clustered
    b = emb.select(
        "vec_id",
        "embedding",
        similarity.sign_bucket(F.col("embedding"), 4).alias("bucket"),
    )
    pairs = (
        b.alias("x")
        .join(b.alias("y"), "bucket")
        .filter(F.col("x.vec_id") < F.col("y.vec_id"))
        .filter(
            similarity.cosine(F.col("x.embedding"), F.col("y.embedding")) >= 0.45
        )
        .select(
            F.col("x.vec_id").alias("id_a"), F.col("y.vec_id").alias("id_b")
        )
    )
    lab = out.select("vec_id", "cluster_id")
    split = (
        pairs.join(lab.withColumnRenamed("vec_id", "id_a"), "id_a")
        .withColumnRenamed("cluster_id", "ca")
        .join(lab.withColumnRenamed("vec_id", "id_b"), "id_b")
        .filter(F.col("ca") != F.col("cluster_id"))
        .count()
    )
    assert split == 0
    assert pairs.count() > 0  # the corpus actually has near-dup structure
    out.unpersist()
    emb.unpersist()


def test_bpe_golden_fixture_hand_derived(spark):
    """PAPER-DERIVED golden tokenization (not recomputed by any engine
    idiom — breaks the t14 oracle's shared-algorithm circularity).

    With DEFAULT_BPE_MERGES (ranks 0-20, ids: a-z=0-25 then one id per
    merge output in rank order), the text
    "table scan in hash join query rows 42" tokenizes BY HAND as:
      table -> t a b l e -(r2 t,a)-> ta b l e -(r3)-> tab l e -(r4)->
               tabl e -(r5)-> table                    = [31]
      scan  -> s c a n -(r0 a,n)-> s c an -(r16 c,an)-> s can -(r17)->
               scan                                    = [43]
      in    -> i n -(r19)-> in                         = [45]
      hash  -> h a s h -(r10 a,s)-> h as h -(r11)-> h ash -(r12)->
               hash                                    = [38]
      join  -> j o i n -(r18 j,o beats r19 i,n)-> jo i n -(r19)->
               jo in -(r20)-> join                     = [46]
      query -> q u e r y -(r1 e,r beats r6 q,u)-> q u er y -(r6)->
               qu er y -(r7)-> quer y -(r8)-> query    = [34]
      rows  -> r o w s -(r13 o,w)-> r ow s -(r14)-> row s
               (row,s not in table)                    = [40, 18]
      42    -> digits are not in the a-z/merge vocab   = [-1, -1]
    """
    from consumer_loans_analysis_spark.operators.text import (
        bpe_encode,
        bpe_encode_broadcast,
    )

    golden = "31 43 45 38 46 34 40 18 -1 -1"
    df = spark.createDataFrame(
        [(1, "table scan in hash join query rows 42")], ["doc_id", "text"]
    )
    for fn in (bpe_encode, bpe_encode_broadcast):
        row = fn(df).collect()[0]
        assert row["token_str"] == golden, (fn.__name__, row["token_str"])
        assert row["n_tokens"] == 10


def test_bpe_broadcast_equivalent_to_literal_replace(spark, sf_dir):
    """The mapInPandas large-table variant must produce the identical
    tokenization to the when-chain literal-replace path on a real corpus,
    and its physical plan must stay map-only (no Exchange)."""
    from consumer_loans_analysis_spark.operators.text import (
        bpe_encode,
        bpe_encode_broadcast,
    )
    from consumer_loans_analysis_spark.sources.readers import read_table

    docs = read_table(spark, sf_dir, "documents").limit(200)
    a = {r["doc_id"]: (r["n_tokens"], r["token_str"]) for r in bpe_encode(docs).collect()}
    b = {
        r["doc_id"]: (r["n_tokens"], r["token_str"])
        for r in bpe_encode_broadcast(docs).collect()
    }
    assert a == b and len(a) == 200
    plan = bpe_encode_broadcast(read_table(spark, sf_dir, "documents"))._jdf.queryExecution().executedPlan().toString()
    assert "Exchange" not in plan, plan


def test_bpe_encode_broadcast_passthrough_cols(spark, sf_dir):
    """passthrough_cols must copy input columns through the Arrow batch
    unchanged (the r12 join-elimination lever for pipe2) with identical
    encode output and a still map-only plan."""
    from consumer_loans_analysis_spark.operators.text import (
        bpe_encode_broadcast,
    )
    from consumer_loans_analysis_spark.sources.readers import read_table

    docs = read_table(spark, sf_dir, "documents").limit(200)
    plain = {
        r["doc_id"]: (r["n_tokens"], r["token_str"])
        for r in bpe_encode_broadcast(docs).collect()
    }
    thru = bpe_encode_broadcast(docs, passthrough_cols=["source"])
    rows = thru.collect()
    assert {r["doc_id"]: (r["n_tokens"], r["token_str"]) for r in rows} == plain
    src = {r["doc_id"]: r["source"] for r in docs.select("doc_id", "source").collect()}
    assert {r["doc_id"]: r["source"] for r in rows} == src
    plan = (
        bpe_encode_broadcast(
            read_table(spark, sf_dir, "documents"), passthrough_cols=["source"]
        )
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    assert "Exchange" not in plan, plan


def test_bpe_encode_rejects_duplicate_merge_outputs(spark):
    """Merge tables where two merges share an output string break the
    fixed-round convergence argument — bpe_encode must refuse them."""
    import pytest

    from consumer_loans_analysis_spark.operators.text import bpe_encode

    df = spark.createDataFrame([(1, "abc")], ["doc_id", "text"])
    with pytest.raises(ValueError, match="unique merge outputs"):
        bpe_encode(df, merges=[("a", "bc"), ("ab", "c")])

def test_semantic_dedup_kmeans_blocker_recall(spark, sf_dir):
    """d11 with the paper's k-means blocker (VERDICT r04 task 7).

    The synthetic embeddings table has NO near-identical pairs (max
    pairwise cosine ≈ 0.48), which is outside SemDeDup's operating regime
    — so the recall gate uses a PLANTED corpus: 200 seeded background
    vectors plus 30 planted near-dup twins (base + tiny noise, cosine
    ≈ 0.999). The k-means blocker must (a) produce valid min-label
    components with one canonical each on the REAL table, and (b) recover
    ≥ 90% of the planted pairs (near-identical vectors straddle a Voronoi
    boundary only in a measure-zero sliver — the paper's cross-cluster
    blind spot, measured here rather than asserted away)."""
    import random

    from consumer_loans_analysis_spark.operators import curation
    from consumer_loans_analysis_spark.sources.readers import read_table

    # (a) structural validity on the real table
    emb = read_table(spark, sf_dir, "embeddings").cache()
    out = curation.semantic_dedup(
        emb, threshold=0.45, blocker="kmeans", n_clusters=8
    ).cache()
    assert out.count() == emb.count()
    agg = out.groupBy("cluster_id").agg(
        F.min("vec_id").alias("mn"),
        F.count_if(F.col("is_canonical")).alias("n_canon"),
    )
    assert agg.filter(
        (F.col("cluster_id") != F.col("mn")) | (F.col("n_canon") != 1)
    ).count() == 0
    out.unpersist()
    emb.unpersist()

    # (b) planted-pair recall
    rng = random.Random(11)
    dim = 16
    rows = []
    for i in range(200):
        rows.append((i, [rng.gauss(0, 1) for _ in range(dim)]))
    planted = []
    for j in range(30):
        base_id = j * 6  # spread over distinct bases
        twin_id = 1000 + j
        v = rows[base_id][1]
        rows.append((twin_id, [x + rng.gauss(0, 0.01) for x in v]))
        planted.append((base_id, twin_id))
    df = spark.createDataFrame(rows, ["vec_id", "embedding"])
    labels = {
        r["vec_id"]: r["cluster_id"]
        for r in curation.semantic_dedup(
            df, threshold=0.95, blocker="kmeans", n_clusters=8
        ).collect()
    }
    hit = sum(1 for a, b in planted if labels[a] == labels[b])
    recall = hit / len(planted)
    print(f"kmeans-blocker planted-pair recall: {recall:.3f} ({hit}/{len(planted)})")
    assert recall >= 0.9, recall


def test_pq_recall(spark, sf_dir):
    """PQ-ADC top-k (sim5's gate, same pattern as sim3's): recall@5 vs the
    exact scan is high at 16×64 codebooks with 4k re-rank, rises when the
    candidate pool R grows, and surviving candidates carry their EXACT
    cosine (re-rank contract: scores for common pairs match sim1's to
    1e-9). Codebook size matters on this corpus: the planted-pair margin
    is ~0.005 of cosine, so coarse 8×16 books lose it to quantization
    noise (measured 0.44 recall) — worth keeping as the documented
    failure mode."""
    from pyspark.sql import functions as F

    from consumer_loans_analysis_spark.operators import similarity
    from consumer_loans_analysis_spark.sources.readers import read_table

    emb = read_table(spark, sf_dir, "embeddings").cache()
    corpus = emb.filter(F.col("vec_id") >= 10)
    queries = emb.filter(F.col("vec_id") < 10)
    exact_rows = similarity.cosine_topk(corpus, queries, k=5).collect()
    exact = {(r["query_id"], r["neighbor_id"]) for r in exact_rows}
    exact_cos = {(r["query_id"], r["neighbor_id"]): r["cos"] for r in exact_rows}

    def run(rerank: int):
        return similarity.pq_topk(
            corpus, queries, k=5, m_subs=16, ks=64, rerank=rerank
        ).collect()

    got4 = run(4)
    r4 = len(exact & {(r["query_id"], r["neighbor_id"]) for r in got4}) / len(exact)
    assert r4 >= 0.75, r4
    got16 = run(16)
    r16 = len(exact & {(r["query_id"], r["neighbor_id"]) for r in got16}) / len(exact)
    assert r16 >= max(r4, 0.9), (r4, r16)
    # exact-cosine contract on the intersection
    for r in got16:
        key = (r["query_id"], r["neighbor_id"])
        if key in exact_cos:
            assert abs(r["cos"] - exact_cos[key]) < 1e-9, key


def test_mg_merge_rule_hand_case():
    """The Agarwal et al. merge rule by hand: capacity 2, counts
    {a:5, b:3, c:2} -> third-largest t=2 subtracted, c dropped."""
    import pandas as pd

    from consumer_loans_analysis_spark.operators.text import _mg_merge

    out = _mg_merge({"a": 3, "b": 3}, pd.Series({"a": 2, "c": 2}), k=2)
    assert out == {"a": 3, "b": 1}  # t = c's 2: a 5-2, b 3-2, c dropped


def test_mg_heavy_hitters_partition_independent(spark):
    """The φ-heavy output must equal the brute-force frequency filter at
    EVERY partitioning — including an adversarial layout that spreads a
    borderline-heavy word thinly across partitions (the superset
    guarantee's worst case) and heavily skewed layouts."""
    from pyspark.sql import functions as F

    from consumer_loans_analysis_spark.operators.text import mg_heavy_hitters

    # 10_000 tokens: one word at exactly 2.5% (heavy), one at 1.5%
    # (light), 96 fillers at ~1% each
    toks = (
        ["heavy"] * 250 + ["light"] * 150
        + [f"w{i % 96}" for i in range(9600)]
    )
    df = spark.createDataFrame([(w,) for w in toks], "word string")
    want = {
        r["word"]: r["n"]
        for r in df.groupBy("word").agg(F.count(F.lit(1)).alias("n"))
        .filter(F.col("n") >= 0.02 * len(toks)).collect()
    }
    assert "heavy" in want and "light" not in want  # fixture sanity

    for parts in (1, 8, 64):
        # round-robin repartition spreads "heavy" evenly — its
        # per-partition share stays near the global 2.5%, just above the
        # N_p/(k+1) retention floor at k=64
        got = {
            r["word"]: r["exact_n"]
            for r in mg_heavy_hitters(
                df.repartition(parts), phi=0.02, k=64
            ).collect()
        }
        assert got == want, parts

    import pytest as _pytest

    with _pytest.raises(ValueError, match="superset"):
        mg_heavy_hitters(df, phi=0.02, k=10)


def test_mg_heavy_hitters_nulls_excluded_from_stream(spark):
    """Null tokens must not inflate the share denominator (r8 ADVICE):
    they can never be reported (value_counts and the equi-join both drop
    them), so they must not be counted in the stream total either."""
    from consumer_loans_analysis_spark.operators.text import mg_heavy_hitters

    # 100 non-null tokens + 900 nulls; "hot" is 60/100 = 60% of the
    # non-null stream but only 6% of the null-inflated one
    rows = [("hot",)] * 60 + [(f"w{i}",) for i in range(40)] + [(None,)] * 900
    df = spark.createDataFrame(rows, "word string")
    got = {r["word"]: (r["exact_n"], r["share"])
           for r in mg_heavy_hitters(df, phi=0.5, k=4).collect()}
    assert got == {"hot": (60, 0.6)}


def test_kmeans_assign_matches_mllib_transform(spark, sf_dir):
    """The pinned-centroid Column-expression assignment (d11b's blocker
    with frozen centroids) must reproduce MLlib's own transform() for the
    SAME centroids on every row — pins that the ``kmeans_assign`` argmin
    formula (‖c‖² − 2·u·c over unit vectors, ties to lowest id) is the
    assignment k-means actually uses, independent of the pinned values."""
    from pyspark.ml.clustering import KMeans
    from pyspark.ml.functions import array_to_vector

    from consumer_loans_analysis_spark.operators import curation
    from consumer_loans_analysis_spark.sources.readers import read_table

    emb = read_table(spark, sf_dir, "embeddings")
    unit = F.transform(
        F.col("embedding"),
        lambda x: F.try_divide(
            x.cast("double"),
            F.sqrt(
                F.aggregate(
                    F.transform(F.col("embedding"), lambda y: y * y),
                    F.lit(0.0),
                    lambda a, y: a + y,
                )
            ),
        ),
    )
    feats = emb.select("vec_id", unit.alias("uv"), array_to_vector(unit).alias("_f"))
    km = KMeans(k=4, seed=7, featuresCol="_f", predictionCol="mllib_bucket").fit(feats)
    cents = [[float(x) for x in c] for c in km.clusterCenters()]
    both = km.transform(feats).select(
        "vec_id",
        "mllib_bucket",
        curation.kmeans_assign(F.col("uv"), cents).alias("expr_bucket"),
    )
    assert both.filter(F.col("mllib_bucket") != F.col("expr_bucket")).count() == 0


def test_bpe_decode_inverts_encode(spark):
    """decode(encode(x)) == pretoken concatenation with out-of-vocab
    chars replaced by '?' — exact on the in-vocab subset, one '?' per
    unknown CHARACTER (encode wraps each char as one symbol)."""
    docs = spark.createDataFrame(
        [(0, "the table tab ble"), (1, "ab7cd ef!gh"), (2, "zzz")],
        "doc_id long, text string",
    )
    enc = text.bpe_encode_broadcast(docs)
    got = {r["doc_id"]: r["decoded"] for r in text.bpe_decode(enc).collect()}
    assert got[0] == "thetabletabble"
    assert got[1] == "ab?cdef?gh"  # digit and '!' each -> one '?'
    assert got[2] == "zzz"


def test_bpe_train_incremental_equals_full_recount(spark, sf_dir):
    """The pair-count-reuse trainer must produce the IDENTICAL merge
    table (ranks, pairs, counts) to the per-rank full recount — the
    delta bookkeeping is exact, not approximate."""
    from consumer_loans_analysis_spark.sources.readers import read_table

    docs = read_table(spark, sf_dir, "documents")
    full = text.bpe_train(docs, n_merges=6)
    inc = text.bpe_train_incremental(docs, n_merges=6)
    assert inc == full


def test_bpe_train_local_equals_distributed_to_exhaustion(spark, sf_dir):
    """The driver-side vocabulary-table trainer (ONE distributed
    aggregation, all ranks local — the production 50k-vocab path) must
    produce the IDENTICAL merge table to the distributed per-rank
    trainer, ALL the way to pair exhaustion: same Sennrich objective,
    same (count desc, l, r) tie-break, same left-to-right non-overlapping
    merge application. n_merges far beyond exhaustion also pins that both
    trainers stop at the same rank."""
    from consumer_loans_analysis_spark.sources.readers import read_table

    docs = read_table(spark, sf_dir, "documents")
    local = text.bpe_train_local(docs, n_merges=10_000)
    full = text.bpe_train(docs, n_merges=len(local) + 5)
    assert local == full


def test_bpe_train_local_min_frequency_floor(spark):
    """min_frequency drops rare pretokens from the vocabulary table
    BEFORE training: with the floor above a word's count, none of its
    exclusive pairs can appear in the merge table."""
    df = spark.createDataFrame(
        [("aa aa aa aa zq",), ("aa aa bb bb",)], ["text"]
    )
    floored = text.bpe_train_local(df, n_merges=50, min_frequency=2)
    assert all("z" not in l + r for l, r, _ in floored)
    unfloored = text.bpe_train_local(df, n_merges=50)
    assert any("z" in l + r for l, r, _ in unfloored)


def test_pca_whiten_matches_numpy_ltr_bit_exact(spark, sf_dir):
    """The pinned whitening expression path reproduces a numpy
    left-to-right recompute BIT-EXACTLY (the same construction argument
    the pca1 DuckDB oracle relies on), and the chi²₈(0.99) flag fires on
    ~1% of rows — present but rare on this well-behaved embedding cloud."""
    import numpy as np

    from consumer_loans_analysis_spark.operators.curation import pca_whiten_score
    from consumer_loans_analysis_spark.operators.pca_components import (
        PCA_C,
        PCA_INV_SD,
        PCA_W,
    )

    emb = spark.read.parquet(f"{sf_dir}/embeddings.parquet")
    from consumer_loans_analysis_spark.operators.pca_components import (
        PCA_CHI2_90_8,
    )

    got = {
        r["vec_id"]: r
        for r in pca_whiten_score(emb, threshold=PCA_CHI2_90_8).collect()
    }
    raw = emb.orderBy("vec_id").limit(20).collect()
    for row in raw:
        v = [float(x) for x in row["embedding"]]
        for j, (w, c, s) in enumerate(zip(PCA_W, PCA_C, PCA_INV_SD), 1):
            acc = v[0] * w[0]
            for i in range(1, len(w)):
                acc = acc + v[i] * w[i]
            expect = (acc - c) * s
            assert got[row["vec_id"]][f"pc{j}"] == expect, (row["vec_id"], j)
    n = len(got)
    n_out = sum(1 for r in got.values() if r["is_outlier"])
    assert 0 < n_out < 0.10 * n, (n_out, n)
    assert all(r["maha2"] >= 0.0 for r in got.values())
    # whitened cloud is ~standard normal IN-SAMPLE (mean maha2 ≈ k = 8 at
    # the sf0.01 fit SF); other SFs draw from a tighter cloud under the
    # frozen transform (sf0.1 measures ≈ 5), so bound loosely — the exact
    # per-row equality above is the real numerical pin
    mean_m = float(np.mean([r["maha2"] for r in got.values()]))
    assert 3.0 < mean_m < 12.0, mean_m


def test_int4_block_quantization_outlier_robustness(spark):
    """The point of blockwise scaling: one outlier coordinate destroys a
    per-vector int8-style scale's resolution everywhere, but only inside
    its own block under block-absmax. Hand-check: codes stay in [-7, 7],
    reconstruction is exact for values on the code grid, and the blocked
    reconstruction cosine beats a single-scale int4 reconstruction on an
    outlier vector."""
    from consumer_loans_analysis_spark.operators.similarity import (
        quantize_int4_block,
        recon_int4_block,
    )

    # block 0 carries a 100x outlier; blocks 1-3 are small values
    vec = [100.0] + [0.5] * 15 + [0.4, -0.3] * 24
    df = spark.createDataFrame([(0, vec)], "vec_id int, v array<double>")
    staged = df.select(
        "vec_id", "v", quantize_int4_block(F.col("v"), dim=64).alias("amax")
    )
    row = staged.select(
        "v", "amax",
        recon_int4_block(F.col("v"), F.col("amax"), dim=64).alias("rv"),
    ).collect()[0]
    amax, rv, v = row["amax"], row["rv"], row["v"]
    assert amax == [100.0, 0.4, 0.4, 0.4]
    # codes in range: |r_i| <= amax_b
    for i, r in enumerate(rv):
        assert abs(r) <= amax[i // 16] + 1e-12, (i, r)
    # grid-exact: the outlier itself reconstructs exactly (code 7 * 100/7)
    assert rv[0] == 100.0
    # blockwise reconstruction error beats one global int4 scale by a
    # huge factor on this vector: under the global scale g = 100/7 every
    # small coordinate quantizes to code 0 (|x| < g/2), so the global
    # error is the whole small-coordinate energy
    import math

    g = max(abs(x) for x in v) / 7.0
    rv_global = [math.floor(x / g + 0.5) * g for x in v]
    assert all(r == 0.0 for r in rv_global[1:])
    # the outlier flattens ONLY its own block: blocks 1-3 reconstruct
    # near-exactly under their own scales, vs total loss globally
    tail_block = sum((x - r) ** 2 for x, r in zip(v[16:], rv[16:]))
    tail_global = sum((x - r) ** 2 for x, r in zip(v[16:], rv_global[16:]))
    assert tail_global > 5.0 and tail_block < tail_global / 100, (
        tail_block, tail_global)
    # and the total error still improves
    err_block = sum((x - r) ** 2 for x, r in zip(v, rv))
    err_global = sum((x - r) ** 2 for x, r in zip(v, rv_global))
    assert err_block < err_global / 2, (err_block, err_global)


def test_minhash_estimate_audit_statistics(spark, sf_dir):
    """d14's estimates behave like 32-trial binomial draws around the
    exact Jaccard: every agreement count is a legal 0..32, the pair set
    matches the exact >= 0.5 pair set, and errors sit within binomial
    noise (max |err| under ~4 sigma at p=0.5, mean under ~1 sigma)."""
    from consumer_loans_analysis_spark.plans import registry

    registry.load_all()
    rows = registry.QUERIES["d14_minhash_estimate_audit"](spark, sf_dir).collect()
    assert rows, "expected candidate pairs at this SF"
    from consumer_loans_analysis_spark.operators import dedup
    from consumer_loans_analysis_spark.sources.readers import read_table

    docs = read_table(spark, sf_dir, "documents")
    exact_pairs = {
        (r["id_a"], r["id_b"])
        for r in dedup.jaccard_near_dupes(docs, threshold=0.5).collect()
    }
    assert {(r["id_a"], r["id_b"]) for r in rows} == exact_pairs
    sigma = (0.25 / 32) ** 0.5  # binomial sd upper bound at p=0.5
    for r in rows:
        assert 0 <= r["n_match"] <= 32
        assert r["jaccard_est"] == r["n_match"] / 32.0
        assert r["abs_err"] <= 4 * sigma + 1e-9, (r["id_a"], r["id_b"], r["abs_err"])
    mean_err = sum(r["abs_err"] for r in rows) / len(rows)
    assert mean_err <= sigma, mean_err


def test_pipe4_dedup_catches_post_clean_duplicates(spark, tmp_path):
    """The reason real pipelines dedup AFTER cleaning: two documents that
    differ only in a line the rules kill become identical once cleaned,
    and pipe4 must collapse them. Planted fixture: doc 11 = doc 10 plus a
    denylist line; doc 12 genuinely differs."""
    import shutil

    from consumer_loans_analysis_spark.plans import registry

    registry.load_all()
    good = lambda tag: " ".join(f"{tag}w{i:03d}" for i in range(10))  # noqa: E731
    base = " ".join(good(t) for t in ("a", "b", "c"))
    killed = "dup " + " ".join(f"x{i:04d}" for i in range(9))
    docs = spark.createDataFrame(
        [
            (10, base, "en", "s0", len(base)),
            (11, " ".join([good("a"), killed, good("b"), good("c")]), "en", "s0",
             0),
            (12, " ".join(good(t) for t in ("d", "e", "f")), "en", "s0", 0),
        ],
        "doc_id long, text string, lang string, source string, n_chars long",
    )
    sf = str(tmp_path / "sf_fixture")
    docs.write.parquet(f"{sf}/documents.parquet")
    try:
        out = registry.QUERIES["pipe4_clean_dedup_shard"](spark, sf).collect()
        # 3 docs clean to 2 distinct texts -> 2 survive dedup
        assert sum(r["n_docs"] for r in out) == 2
        assert sum(r["n_tokens"] for r in out) == 60  # 2 docs x 30 kept words
    finally:
        shutil.rmtree(sf, ignore_errors=True)


def test_hard_negatives_brute_force_fixture(spark):
    """sim7 semantics on a hand-built labeled set: the mined negative is
    the cosine-nearest OTHER-label vector (never a same-label one, never
    the anchor itself), with the cos DESC / id ASC tie-break."""
    from consumer_loans_analysis_spark.operators.similarity import hard_negatives

    emb = spark.createDataFrame(
        [
            (0, [1.0, 0.0], 0),
            (1, [0.99, 0.141], 0),   # same label as 0 — may not be its negative
            (2, [0.9, 0.436], 1),    # nearest other-label to 0
            (3, [0.0, 1.0], 1),
            (4, [0.9, 0.436], 2),    # exact tie with 2 on cos(0,·) — higher id
        ],
        "vec_id long, embedding array<float>, label int",
    )
    got = {
        r["anchor_id"]: r
        for r in hard_negatives(emb, n_anchors=5, seed="t").collect()
    }
    assert len(got) == 5
    r0 = got[0]
    assert r0["neg_id"] == 2 and r0["neg_label"] == 1  # tie -> lowest id
    assert all(r["neg_label"] != r["anchor_label"] for r in got.values())
    assert all(r["neg_id"] != a for a, r in got.items())


def test_hard_negatives_zero_norm_anchor_engine_agreement(spark):
    """r10 ADVICE #1 (latent): an anchor whose EVERY cross-label cosine
    is undefined (zero-norm anchor) must be absent from BOTH the Spark
    output and the DuckDB oracle — the oracle now excludes undefined
    cosines before its window (DuckDB would otherwise rank the NaN row
    first and emit it, while Spark drops it)."""
    import duckdb
    import pandas as pd

    from consumer_loans_analysis_spark.operators.similarity import hard_negatives
    from consumer_loans_analysis_spark.plans import registry

    registry.load_all()
    rows = [
        (0, [0.0, 0.0], 0),   # zero-norm anchor: all its cosines 0/0
        (1, [1.0, 0.0], 0),
        (2, [0.9, 0.436], 1),
        (3, [0.0, 1.0], 1),
        (4, [0.7, 0.714], 2),
    ]
    emb = spark.createDataFrame(rows, "vec_id long, embedding array<float>, label int")
    got = hard_negatives(emb, n_anchors=5, seed="sim7").collect()
    anchors_spark = {r["anchor_id"] for r in got}
    assert 0 not in anchors_spark          # dropped, not emitted with NULL
    assert anchors_spark == {1, 2, 3, 4}

    con = duckdb.connect()
    con.register(
        "embeddings",
        pd.DataFrame(rows, columns=["vec_id", "embedding", "label"]),
    )
    oracle = con.execute(registry.ORACLES["sim7_hard_negatives"]).df()
    anchors_oracle = set(oracle["anchor_id"])
    assert anchors_oracle == anchors_spark
    spark_pairs = {(r["anchor_id"], r["neg_id"]) for r in got}
    oracle_pairs = set(zip(oracle["anchor_id"], oracle["neg_id"]))
    assert spark_pairs == oracle_pairs


def test_hard_negatives_plan_no_nested_loop(spark, sf_dir):
    """sim7's label fan-out must be a map-side explode: NO
    BroadcastNestedLoopJoin (the audited-set invariant), corpus attached
    via broadcast hash join only."""
    from consumer_loans_analysis_spark.plans import registry

    registry.load_all()
    df = registry.QUERIES["sim7_hard_negatives"](spark, sf_dir)
    plan = df._jdf.queryExecution().executedPlan().toString()
    assert "BroadcastNestedLoopJoin" not in plan, plan
    assert "BroadcastHashJoin" in plan, plan


def test_dedup_threshold_sweep_monotone_and_consistent(spark, sf_dir):
    """d15: pair counts are non-increasing in the threshold; docs-removed
    never exceeds pairs; and the 0.8 row equals d2's pair count exactly."""
    from consumer_loans_analysis_spark.operators import dedup
    from consumer_loans_analysis_spark.plans import registry
    from consumer_loans_analysis_spark.sources.readers import read_table

    registry.load_all()
    rows = {
        r["threshold"]: r
        for r in registry.QUERIES["d15_dedup_threshold_sweep"](
            spark, sf_dir
        ).collect()
    }
    ts = sorted(rows)
    assert ts == [0.5, 0.6, 0.7, 0.8, 0.9]
    for lo, hi in zip(ts, ts[1:]):
        assert rows[lo]["n_pairs"] >= rows[hi]["n_pairs"]
    for r in rows.values():
        assert 0 <= r["n_docs_removed"] <= r["n_pairs"]
    docs = read_table(spark, sf_dir, "documents")
    d2_pairs = dedup.jaccard_near_dupes(docs, threshold=0.8).count()
    assert rows[0.8]["n_pairs"] == d2_pairs


def test_word_pmi_hand_computed(spark, tmp_path):
    """t18 on a planted corpus: a pair that always co-occurs scores
    ln(N/ (c1·c2 / c_pair)) exactly; an anti-correlated pair is absent
    (below min support); PMI keys are ordered w1 < w2."""
    import math
    import shutil

    from consumer_loans_analysis_spark.plans import registry

    registry.load_all()
    # 10 docs: 'alpha beta' always together (5 docs), 'gamma' alone (5)
    rows = [(i, "alpha beta filler", "en", "s0", 0) for i in range(5)]
    rows += [(5 + i, "gamma filler pad", "en", "s0", 0) for i in range(5)]
    sf = str(tmp_path / "sf_pmi")
    spark.createDataFrame(
        rows, "doc_id long, text string, lang string, source string, n_chars long"
    ).write.parquet(f"{sf}/documents.parquet")
    try:
        got = {
            (r["w1"], r["w2"]): r
            for r in registry.QUERIES["t18_word_pmi"](spark, sf).collect()
        }
        ab = got[("alpha", "beta")]
        assert ab["c_pair"] == 5
        # PMI = ln(5 * 10 / (5 * 5)) = ln 2
        assert ab["pmi"] == round(math.log(2.0), 6)
        assert ("alpha", "gamma") not in got  # never co-occur
        af = got[("alpha", "filler")]
        assert af["pmi"] == round(math.log(5 * 10 / (5 * 10)), 6) == 0.0
        assert all(w1 < w2 for (w1, w2) in got)
    finally:
        shutil.rmtree(sf, ignore_errors=True)


def test_compaction_plan_conservation_and_fill(spark, sf_dir):
    """maint1: every manifest row lands in exactly one bin (row
    conservation against the source table), bin ids are contiguous from
    0, and each bin's fill respects the straddle relaxation (a bin can
    exceed capacity only by its straddling file: fill ≤ 1 + max_file/C)."""
    from consumer_loans_analysis_spark.plans import registry

    registry.load_all()
    rows = registry.QUERIES["maint1_compaction_plan"](spark, sf_dir).collect()
    li_n = spark.read.parquet(f"{sf_dir}/lineitem.parquet").count()
    assert sum(r["total_rows"] for r in rows) == li_n
    bins = sorted(r["bin_id"] for r in rows)
    assert bins == list(range(len(bins)))
    total = sum(r["total_rows"] for r in rows)
    cap = (total + 5) // 6
    for r in rows:
        assert 0.0 < r["fill_frac"] <= 1.0 + r["max_file"] / cap + 1e-9, r


def test_gopher_repetition_rules_hand_computed(spark):
    """dq7's operator against hand-computed char fractions:
    - doc 0: 'a b' repeats 3x in 23 chars -> top_2gram 9/23; the two
      3-grams tie at count 2 (len 5 each) -> 10/23; 'a b a b' repeats
      (overlapping) -> 14/23; no 5-gram repeats -> dup fracs 0.
    - doc 1: nothing repeats -> ALL fractions 0 (count-1 top n-grams are
      not repetition) and the doc is kept.
    - doc 2: 'p q r s t' x3 -> duplicated 5..10-gram spans cover the
      whole 29-char doc -> dup fracs 1.0, killed."""
    from consumer_loans_analysis_spark.operators.text import (
        gopher_repetition_rules,
    )

    df = spark.createDataFrame(
        [
            (0, "a b a b a b x y z w q r"),
            (1, "u v w x y z"),
            (2, "p q r s t p q r s t p q r s t"),
        ],
        "doc_id long, text string",
    )
    rows = {
        r["doc_id"]: r
        for r in gopher_repetition_rules(df).collect()
    }
    import pytest as _pytest

    assert rows[0]["top_2gram_frac"] == _pytest.approx(round(9 / 23, 6))
    assert rows[0]["top_3gram_frac"] == _pytest.approx(round(10 / 23, 6))
    assert rows[0]["top_4gram_frac"] == _pytest.approx(round(14 / 23, 6))
    assert rows[0]["dup_5gram_frac"] == 0.0
    assert not rows[0]["keep"]

    assert all(
        rows[1][c] == 0.0
        for c in rows[1].asDict()
        if c.endswith("_frac")
    )
    assert rows[1]["keep"]

    assert rows[2]["dup_5gram_frac"] == 1.0
    assert rows[2]["dup_10gram_frac"] == 1.0
    assert not rows[2]["keep"]


def test_gopher_repetition_no_corpus_sized_window(spark, sf_dir):
    """dq7 plan shape: every WindowExec partitions by the doc key — no
    single-partition (corpus-sized) window anywhere in the plan."""
    from consumer_loans_analysis_spark.plans import registry

    registry.load_all()
    df = registry.QUERIES["dq7_gopher_repetition"](spark, sf_dir)
    plan = df._jdf.queryExecution().executedPlan().toString()
    for line in plan.splitlines():
        if "Window" in line and "windowspecdefinition" in line.lower():
            assert "_doc" in line or "doc_id" in line, line


def test_kneser_ney_closed_form(spark):
    """t19's KN arithmetic against a hand-computed fixture:
    corpus 'a b a b a c' -> c(ab)=2, c(ba)=2, c(ac)=1; n1=1, n2=2 ->
    D = 0.2; continuation P_cont = 1/3 for each of a/b/c (each completes
    exactly one context, 3 bigram types)."""
    import math

    import pytest as _pytest

    from consumer_loans_analysis_spark.operators.text import kneser_ney_score

    df = spark.createDataFrame([(0, "a b a b a c")], "doc_id long, text string")
    row = kneser_ney_score(df).head()
    D = 1 / (1 + 2 * 2)
    p_ab = ((2 - D) + D * 2 * (1 / 3)) / 3   # c1(a)=3, N1+(a,.)=2
    p_ba = ((2 - D) + D * 1 * (1 / 3)) / 2   # c1(b)=2, N1+(b,.)=1
    p_ac = ((1 - D) + D * 2 * (1 / 3)) / 3
    expect = -(2 * math.log(p_ab) + 2 * math.log(p_ba) + math.log(p_ac)) / 5
    assert row["n_bigrams"] == 5
    assert row["kn_cross_entropy"] == _pytest.approx(expect, abs=1e-6)
    # interpolated KN over the FULL vocab sums to 1 per context; over the
    # observed-only bigrams it must stay strictly below
    assert p_ab + p_ac < 1.0


def test_kneser_ney_beats_mle_on_rare_bigrams(spark):
    """Smoothing sanity: KN discounts frequent bigrams and lifts the
    rare-continuation term, so a document of singleton bigrams scores a
    LOWER cross-entropy gap vs the frequent-doc than under MLE (the
    discount narrows the spread)."""
    from consumer_loans_analysis_spark.operators.text import kneser_ney_score
    from consumer_loans_analysis_spark.plans import registry

    registry.load_all()
    df = spark.createDataFrame(
        [(0, "x y x y x y x y"), (1, "p q r s t u v w")],
        "doc_id long, text string",
    )
    kn = {r["doc_id"]: r["kn_cross_entropy"] for r in kneser_ney_score(df).collect()}
    # frequent-bigram doc scores lower (more probable) than all-singleton doc
    assert kn[0] < kn[1]
    # every probability is discounted below its MLE, so KN entropy > 0
    # even for the deterministic doc 0 (MLE would give P(y|x)=1, ce ~ 0
    # for its x->y transitions only; KN keeps mass for novel continuations)
    assert kn[0] > 0.0


def test_substring_removal_restores_original(spark, sf_dir):
    """d16's planted-sentinel invariant: appending a fixed 25-word
    sentinel to every 20th doc makes its interior 10-word spans cross-doc
    duplicates whose interval union covers EXACTLY the appended words
    (junction spans stay unique per doc) — so removal provably restores
    the original text, and untouched docs come through unmodified."""
    from pyspark.sql import functions as F

    from consumer_loans_analysis_spark.plans import registry
    from consumer_loans_analysis_spark.sources.readers import read_table

    registry.load_all()
    out = registry.QUERIES["d16_substring_removal"](spark, sf_dir)
    orig = read_table(spark, sf_dir, "documents").select(
        "doc_id", F.md5("text").alias("orig_md5")
    )
    j = out.join(orig, "doc_id").cache()
    planted = j.filter(F.col("doc_id") % 20 == 0)
    # the sentinel's 25 words are ALWAYS removed from every planted doc
    # (its interior spans are cross-doc dups by construction); natural
    # phrase-run dups in this corpus can remove more on top (measured:
    # 41/475 untouched docs lose 10-165 words to genuine shared runs)
    assert planted.count() > 0
    assert planted.filter(F.col("n_removed") < 25).count() == 0
    # a planted doc with EXACTLY 25 removed had no natural dups -> its
    # cleaned text is provably the original document
    exact = planted.filter(F.col("n_removed") == 25)
    assert exact.count() > 0
    assert exact.filter(F.col("cleaned_md5") != F.col("orig_md5")).count() == 0
    # zero-removal docs pass through bit-identically
    noop = j.filter((F.col("doc_id") % 20 != 0) & (F.col("n_removed") == 0))
    assert noop.count() > 0
    assert noop.filter(F.col("cleaned_md5") != F.col("orig_md5")).count() == 0
    j.unpersist()


def test_remove_duplicate_spans_unit(spark):
    """Operator-level: two docs sharing a 10-word run lose exactly that
    run from both; a third unrelated doc is untouched; within-doc repeats
    alone (no second doc) do NOT trigger removal (cross-doc df only)."""
    from consumer_loans_analysis_spark.operators.dedup import (
        remove_duplicate_spans,
    )

    shared = " ".join(f"s{i}" for i in range(10))
    df = spark.createDataFrame(
        [
            (0, f"a b c {shared} d e"),
            (1, f"x y {shared} z"),
            (2, "p q r s t u v w p q r s t u v w"),  # self-repeat only
        ],
        "doc_id long, text string",
    )
    rows = {r["doc_id"]: r for r in remove_duplicate_spans(df, 10).collect()}
    assert rows[0]["n_removed"] == 10 and rows[0]["n_words"] == 15
    assert rows[1]["n_removed"] == 10 and rows[1]["n_words"] == 13
    assert rows[2]["n_removed"] == 0


def test_unigram_viterbi_hand_fixture(spark):
    """t21 semantics on hand-solvable DPs: the cheap split beats the
    whole-word piece (ba|tch 450 < batch 900 — where greedy WordPiece
    would take batch), the cheap whole word beats its split (data 320 <
    da|ta 500), fallback chars price at UNIGRAM_FALLBACK_COST, and an
    exact cost tie resolves to the LONGER piece."""
    import hashlib

    from consumer_loans_analysis_spark.operators.text import (
        UNIGRAM_FALLBACK_COST,
        unigram_encode,
    )

    vocab = [
        ("batch", 900), ("ba", 200), ("tch", 250),
        ("data", 320), ("da", 300), ("ta", 200),
        ("ab", 400), ("a", 200), ("b", 200),
    ]
    docs = spark.createDataFrame(
        [(0, "batch"), (1, "data"), (2, "xy"), (3, "ab"), (4, "batch data")],
        "doc_id long, text string",
    )
    rows = {r["doc_id"]: r for r in unigram_encode(docs, vocab).collect()}

    def d(s: str) -> str:
        return hashlib.md5(s.encode()).hexdigest()

    assert rows[0]["pieces_digest"] == d("ba tch")      # split beats whole
    assert rows[0]["total_cost"] == 450
    assert rows[1]["pieces_digest"] == d("data")        # whole beats split
    assert rows[1]["total_cost"] == 320
    assert rows[2]["pieces_digest"] == d("x y")         # total via fallback
    assert rows[2]["total_cost"] == 2 * UNIGRAM_FALLBACK_COST
    assert rows[3]["pieces_digest"] == d("ab")          # tie -> longer piece
    assert rows[3]["total_cost"] == 400
    assert rows[4]["total_cost"] == 450 + 320 and rows[4]["n_pieces"] == 3


def test_nb_seed_classifier_hand_fixture(spark):
    """dq8's NB arithmetic against a hand computation: 4 docs, seed class
    with a marker token; expected log-odds recomputed in pure python with
    the same Laplace-smoothed formula; MAP decision follows the sign."""
    import math

    from consumer_loans_analysis_spark.operators.curation import nb_seed_classifier
    from pyspark.sql import functions as F

    rows = [
        (0, "seed", "good clean text"),
        (1, "seed", "good text"),
        (2, "web", "spam spam text"),
        (3, "web", "clean spam"),
    ]
    docs = spark.createDataFrame(rows, "doc_id long, source string, text string")
    got = {
        r["doc_id"]: r
        for r in nb_seed_classifier(docs, F.col("source") == "seed").collect()
    }

    # hand model: token counts per class
    toks = {d: t.split() for d, _, t in rows}
    seed_docs = {0, 1}
    c_s, c_all = {}, {}
    for d, ws in toks.items():
        for w in ws:
            c_all[w] = c_all.get(w, 0) + 1
            if d in seed_docs:
                c_s[w] = c_s.get(w, 0) + 1
    n_s = sum(c_s.values())
    n_b = sum(c_all.values()) - n_s
    v = len(c_all)
    prior = math.log(2 / 4) - math.log(2 / 4)
    for d, ws in toks.items():
        llr = sum(
            math.log((c_s.get(w, 0) + 1.0) / (n_s + 1.0 * v))
            - math.log((c_all[w] - c_s.get(w, 0) + 1.0) / (n_b + 1.0 * v))
            for w in ws
        )
        expect = round(prior + llr, 6)
        assert got[d]["log_odds"] == pytest.approx(expect, abs=1e-6), d
        assert got[d]["kept"] == (got[d]["log_odds"] > 0)
    # the marker-heavy seed docs rank above the spam docs
    assert got[0]["log_odds"] > got[2]["log_odds"]
    assert got[1]["log_odds"] > got[3]["log_odds"]


def test_nb_seed_classifier_hashed_hand_fixture(spark):
    """dq8b arithmetic against a pure-python recomputation: same Laplace
    formula as dq8 but over md5-hashed buckets with v = n_buckets — the
    python twin hashes with hashlib the exact portable_hash recipe
    (md5('12:'+w) first 8 hex as int, mod buckets), so a drift in either
    the bucketing or the smoothing denominators fails here."""
    import hashlib
    import math

    from consumer_loans_analysis_spark.operators.curation import (
        nb_seed_classifier_hashed,
    )
    from pyspark.sql import functions as F

    rows = [
        (0, "seed", "good clean text"),
        (1, "seed", "good text"),
        (2, "web", "spam spam text"),
        (3, "web", "clean spam"),
    ]
    n_buckets = 1 << 20
    docs = spark.createDataFrame(rows, "doc_id long, source string, text string")
    got = {
        r["doc_id"]: r
        for r in nb_seed_classifier_hashed(
            docs, F.col("source") == "seed", n_buckets=n_buckets
        ).collect()
    }

    def bucket(w: str) -> int:
        return int(hashlib.md5(f"12:{w}".encode()).hexdigest()[:8], 16) % n_buckets

    seed_docs = {0, 1}
    c_s, c_all = {}, {}
    for d, _, t in rows:
        for w in t.split():
            b = bucket(w)
            c_all[b] = c_all.get(b, 0) + 1
            if d in seed_docs:
                c_s[b] = c_s.get(b, 0) + 1
    n_s = sum(c_s.values())
    n_b = sum(c_all.values()) - n_s
    v = float(n_buckets)
    for d, _, t in rows:
        llr = sum(
            math.log((c_s.get(bucket(w), 0) + 1.0) / (n_s + v))
            - math.log((c_all[bucket(w)] - c_s.get(bucket(w), 0) + 1.0) / (n_b + v))
            for w in t.split()
        )
        assert got[d]["log_odds"] == pytest.approx(round(llr, 6), abs=1e-6), d
        assert got[d]["kept"] == (got[d]["log_odds"] > 0)
    # seed-marker docs still rank above spam through the hashed space
    assert got[0]["log_odds"] > got[2]["log_odds"]


def test_wordpiece_greedy_hand_fixture(spark):
    """t20 semantics on hand-segmentable words: greedy longest-match
    (un|happi|ness, not the also-valid ha|p|p...), whole-word precedence
    (batch stays whole although ba+tch could cover it), single-char
    fallback keeps segmentation total and LOSSLESS (php -> p|h|p with h
    unknown), and the per-doc digest is the in-order piece sequence."""
    import hashlib

    from consumer_loans_analysis_spark.operators.text import wordpiece_encode

    vocab = ["un", "happi", "ness", "happy", "ha", "p", "batch", "ba", "tch"]
    docs = spark.createDataFrame(
        [
            (0, "unhappiness"),
            (1, "php"),
            (2, "batch"),
            (3, "unhappiness php batch"),
        ],
        "doc_id long, text string",
    )
    rows = {r["doc_id"]: r for r in wordpiece_encode(docs, vocab).collect()}

    def d(s: str) -> str:
        return hashlib.md5(s.encode()).hexdigest()

    assert rows[0]["pieces_digest"] == d("un happi ness")
    assert rows[0]["n_pieces"] == 3 and rows[0]["fertility"] == 3.0
    assert rows[1]["pieces_digest"] == d("p h p")  # fallback is lossless
    assert rows[2]["pieces_digest"] == d("batch")  # longest match wins
    assert rows[3]["pieces_digest"] == d("un happi ness p h p batch")
    assert rows[3]["n_words"] == 3 and rows[3]["n_pieces"] == 7


def test_broadcast_encode_twins_equal_column_twins(spark):
    """t20b/t21b contract (r12, VERDICT r11 #1): the mapInPandas
    broadcast-vocab encoders produce EXACTLY the frames of their
    Column-expression twins — same rows, same digests, same costs, same
    HALF_UP fertility rounding — on the real sf0.001 corpus plus the
    hand-fixture edge vocabularies (tie-breaks, fallback, wordless doc).
    Also pins the broadcast plans map-only: zero Exchange."""
    from consumer_loans_analysis_spark.operators.text import (
        unigram_encode,
        unigram_encode_broadcast,
        wordpiece_encode,
        wordpiece_encode_broadcast,
    )
    from consumer_loans_analysis_spark.plans.datapipe_queries import (
        UNI_VOCAB,
        WP_VOCAB,
    )

    docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")

    def frames_equal(a, b, key="doc_id"):
        ra = {r[key]: r.asDict() for r in a.collect()}
        rb = {r[key]: r.asDict() for r in b.collect()}
        assert ra == rb

    frames_equal(wordpiece_encode(docs, WP_VOCAB),
                 wordpiece_encode_broadcast(docs, WP_VOCAB))
    frames_equal(unigram_encode(docs, UNI_VOCAB),
                 unigram_encode_broadcast(docs, UNI_VOCAB))

    # edge vocabularies from the hand fixtures: exact cost ties (longer
    # piece wins), single-char fallback, and a wordless doc that must be
    # DROPPED by both (the Column twin's join drops it)
    edge = spark.createDataFrame(
        [(0, "batch"), (1, "data"), (2, "xy"), (3, "ab"), (4, ""), (5, "  ")],
        "doc_id long, text string",
    )
    uv = [("batch", 900), ("ba", 200), ("tch", 250), ("data", 320),
          ("da", 300), ("ta", 200), ("ab", 400), ("a", 200), ("b", 200)]
    frames_equal(unigram_encode(edge, uv), unigram_encode_broadcast(edge, uv))
    wv = ["un", "happi", "ness", "happy", "ha", "p", "batch", "ba", "tch"]
    wedge = spark.createDataFrame(
        [(0, "unhappiness"), (1, "php"), (2, "batch"), (3, "")],
        "doc_id long, text string",
    )
    frames_equal(wordpiece_encode(wedge, wv),
                 wordpiece_encode_broadcast(wedge, wv))

    # map-only plan: the broadcast twins must shuffle NOTHING
    for plan_df in (wordpiece_encode_broadcast(docs, WP_VOCAB),
                    unigram_encode_broadcast(docs, UNI_VOCAB)):
        plan = plan_df._jdf.queryExecution().executedPlan().toString()
        assert "Exchange" not in plan


def test_vocab_join_side_strategies(spark, monkeypatch):
    """The r12 join-strategy guard (guide §3): the distinct-word encode
    join must BUILD on the vocabulary side. Default = broadcast of the
    vocab side (never the corpus token stream — the un-hinted static
    plan chose BuildLeft over the posexploded corpus, the measured r12
    regression); SPARK_GRAFT_VOCAB_JOIN=shuffle_hash = ShuffledHashJoin
    building on the vocab side, with identical results."""
    import os

    from consumer_loans_analysis_spark.operators.text import wordpiece_encode
    from consumer_loans_analysis_spark.plans.datapipe_queries import WP_VOCAB

    docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")

    monkeypatch.delenv("SPARK_GRAFT_VOCAB_JOIN", raising=False)
    df_bc = wordpiece_encode(docs, WP_VOCAB)
    plan_bc = df_bc._jdf.queryExecution().sparkPlan().toString()
    # the ONE BroadcastExchange must sit over the vocab/encode subtree
    # (contains the distinct-word aggregate), not over the corpus scan's
    # posexplode: BuildRight in tok.join(enc) terms.
    assert "BroadcastHashJoin" in plan_bc
    assert "BuildRight" in plan_bc and "BuildLeft" not in plan_bc

    monkeypatch.setenv("SPARK_GRAFT_VOCAB_JOIN", "shuffle_hash")
    df_sh = wordpiece_encode(docs, WP_VOCAB)
    plan_sh = df_sh._jdf.queryExecution().sparkPlan().toString()
    assert "ShuffledHashJoin" in plan_sh and "BuildRight" in plan_sh

    ra = {r["doc_id"]: r.asDict() for r in df_bc.collect()}
    rb = {r["doc_id"]: r.asDict() for r in df_sh.collect()}
    assert ra == rb


def test_kn_model_build_modes_and_join_side(spark, monkeypatch):
    """r13 (VERDICT r12 next-round #1/#4): kneser_ney_score's model
    statistics (uc/pre/scal) fold into ONE driver-side exact-integer
    pass by default — the plan must feed the scoring join from a local
    relation with NO distributed model aggregations left (exactly the
    final per-doc partial+final aggregate pair remains).
    SPARK_GRAFT_KN_MODEL=dist keeps the r12 distributed build for
    bigram tables past driver memory; the scoring-join build side now
    routes through vocab_join_side, so
    SPARK_GRAFT_VOCAB_JOIN=shuffle_hash gives a ShuffledHashJoin
    BUILDING on the model side (never a corpus sort/broadcast). All
    paths must produce IDENTICAL frames — the shared _logp expression
    makes the scores bit-equal, not just round-equal."""
    from consumer_loans_analysis_spark.operators.text import kneser_ney_score

    docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")

    monkeypatch.delenv("SPARK_GRAFT_KN_MODEL", raising=False)
    monkeypatch.delenv("SPARK_GRAFT_VOCAB_JOIN", raising=False)
    df_drv = kneser_ney_score(docs)
    plan_drv = df_drv._jdf.queryExecution().sparkPlan().toString()
    # fully map-only: both corpus passes are Arrow (counts ran at
    # construction), the model dict rides in the closure — no join, no
    # exchange, no aggregate left in the scoring plan
    assert "MapInPandas" in plan_drv, plan_drv
    assert "Join" not in plan_drv, plan_drv
    assert "Exchange" not in plan_drv, plan_drv

    monkeypatch.setenv("SPARK_GRAFT_KN_MODEL", "dist")
    df_dist = kneser_ney_score(docs)
    plan_dist = df_dist._jdf.queryExecution().sparkPlan().toString()
    # the dist scoring join builds on the MODEL side (BuildRight)
    assert "BroadcastHashJoin" in plan_dist and "BuildRight" in plan_dist

    monkeypatch.setenv("SPARK_GRAFT_VOCAB_JOIN", "shuffle_hash")
    df_shj = kneser_ney_score(docs)
    plan_shj = df_shj._jdf.queryExecution().sparkPlan().toString()
    assert "ShuffledHashJoin" in plan_shj and "BuildRight" in plan_shj
    monkeypatch.delenv("SPARK_GRAFT_VOCAB_JOIN")

    ra = {r["doc_id"]: r.asDict() for r in df_drv.collect()}
    assert ra == {r["doc_id"]: r.asDict() for r in df_shj.collect()}
    assert ra == {r["doc_id"]: r.asDict() for r in df_dist.collect()}
    assert len(ra) > 0


def test_broadcast_encode_large_vocab_smoke(spark):
    """The case the twins exist for: a synthetic 5k-piece vocabulary —
    far past the literal-plan crossover — encodes through the broadcast
    path without plan bloat, losslessly (concat of pieces == word)."""
    from consumer_loans_analysis_spark.operators.text import (
        wordpiece_encode_broadcast,
    )

    vocab = [f"w{i:04d}" for i in range(5000)] + ["alpha", "bet"]
    docs = spark.createDataFrame(
        [(0, "w0042 alphabet w4999x"), (1, "unknown")],
        "doc_id long, text string",
    )
    rows = {r["doc_id"]: r for r in
            wordpiece_encode_broadcast(docs, vocab).collect()}
    # w0042 whole; alphabet -> alpha|bet; w4999x -> w4999... greedy takes
    # w4999 then fallback x; unknown -> all single chars
    assert rows[0]["n_pieces"] == 1 + 2 + 2
    assert rows[1]["n_pieces"] == len("unknown")


def test_remove_duplicate_spans_pathological_full_dup(spark):
    """The r10 verdict #6 pathological shape: two large docs that are
    COMPLETE duplicates of each other, so every 10-word window is
    duplicated and the raw interval list approaches word count (the case
    where the pre-merge fold must collapse ~n intervals into ONE). Output
    must be full removal on both, an interleaved unique doc untouched,
    and a partially-overlapping doc loses exactly its shared prefix."""
    from consumer_loans_analysis_spark.operators.dedup import (
        remove_duplicate_spans,
    )

    n = 400
    body = " ".join(f"w{i}" for i in range(n))
    uniq = " ".join(f"u{i}" for i in range(50))
    # doc 3 shares only the first 120 words of body -> one merged run
    # [0, 120); its tail is unique
    partial = " ".join(f"w{i}" for i in range(120)) + " " + " ".join(
        f"t{i}" for i in range(30)
    )
    df = spark.createDataFrame(
        [(0, body), (1, body), (2, uniq), (3, partial)],
        "doc_id long, text string",
    )
    rows = {r["doc_id"]: r for r in remove_duplicate_spans(df, 10).collect()}
    assert rows[0]["n_removed"] == n and rows[0]["n_words"] == n
    assert rows[1]["n_removed"] == n
    # md5("") convention: fully-emptied docs hash the empty join
    assert rows[0]["cleaned_md5"] == rows[1]["cleaned_md5"]
    assert rows[2]["n_removed"] == 0
    assert rows[3]["n_removed"] == 120 and rows[3]["n_words"] == 150


def test_pipe5_selection_ledger(spark, sf_dir):
    """pipe5's admission arithmetic: per language, n_selected =
    min(40, n_candidates). (Gating of the planted repetitive docs and
    the selected-id set itself are pinned by the oracle's sel_digest.)"""
    from pyspark.sql import functions as F

    from consumer_loans_analysis_spark.plans import registry

    registry.load_all()
    out = registry.QUERIES["pipe5_fluency_curation"](spark, sf_dir).cache()
    bad = out.filter(
        F.col("n_selected")
        != F.least(F.lit(40), F.col("n_candidates"))
    )
    assert bad.count() == 0
    assert out.count() > 0
    out.unpersist()


def test_fit_subspace_codebooks_dispatch_bit_identical(spark):
    """The serial/parallel dispatch in _fit_subspace_codebooks can never
    change a codebook: both modes run the identical _kmeanspp_lloyd call
    per subspace (same slice, same seed), so their outputs must be
    bit-equal — and both must equal the plain serial loop the pre-r12
    code ran (the pinned-literal provenance contract)."""
    import numpy as np

    from consumer_loans_analysis_spark.operators import similarity as sim

    rng = np.random.default_rng(7)
    X = rng.standard_normal((512, 16))
    m_subs, ks, seed = 4, 8, 42
    reference = np.stack(
        [
            sim._kmeanspp_lloyd(X[:, s * 4 : (s + 1) * 4], ks, seed + s)
            for s in range(m_subs)
        ]
    )
    orig = sim._PARALLEL_FIT_MIN_FLOPS
    try:
        sim._PARALLEL_FIT_MIN_FLOPS = float("inf")  # force serial branch
        serial = sim._fit_subspace_codebooks(spark, X, m_subs, ks, seed)
        sim._PARALLEL_FIT_MIN_FLOPS = 0.0  # force the Spark job branch
        parallel = sim._fit_subspace_codebooks(spark, X, m_subs, ks, seed)
    finally:
        sim._PARALLEL_FIT_MIN_FLOPS = orig
    assert (serial == reference).all()
    assert (parallel == reference).all()
