"""Text-analysis operators for large-scale training-data pipelines.

All pure Column expressions (JVM-side, whole-stage-codegen) — no Python in
the hot path. The portable hash is md5-based so results are reproducible
across engines and across Spark versions (murmur3 `F.hash` is
JVM-implementation-specific; md5 is a fixed standard).
"""

from __future__ import annotations

import os

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def vocab_join_side(small: DataFrame) -> DataFrame:
    """Join-strategy hint for a VOCABULARY-sized build side (distinct-word
    encode tables, NB token models): Heaps-bounded — orders of magnitude
    below corpus size, but not broadcast-bounded at 100 TB (~10^8 rows).

    Default is an explicit broadcast of this side. The r12 attempt to drop
    the hint and "let AQE decide" was MEASURED-WRONG both locally and at
    scale: with no hint the static planner sized the aggregated vocab side
    LARGER than the raw scan side and planned ``BroadcastHashJoin
    BuildLeft`` — broadcasting the posexploded CORPUS token stream (see
    plans/r12/t20_*_after pre-fix; paired r11/r12 A/B: t20 1.34×, t21
    1.46×, dq8 1.26× slower). AQE cannot demote a statically planned
    broadcast join, so the un-hinted plan is the scale-killer, not the
    hinted one. For deployments where the vocabulary genuinely outgrows
    the broadcast threshold, set ``SPARK_GRAFT_VOCAB_JOIN=shuffle_hash``:
    a ShuffledHashJoin BUILDING on this (smaller) side — no corpus sort,
    no corpus broadcast. The no-join production encode paths
    (``wordpiece_encode_broadcast`` / ``unigram_encode_broadcast`` /
    ``nb_seed_classifier_hashed``) avoid the question structurally."""
    if os.environ.get("SPARK_GRAFT_VOCAB_JOIN") == "shuffle_hash":
        return small.hint("shuffle_hash")
    return F.broadcast(small)


def portable_hash(col: Column, seed: int | None = None, hex_chars: int = 8) -> Column:
    """Deterministic non-negative integer hash of a string column: first
    ``hex_chars`` hex digits of md5, as a long. Engine-portable (DuckDB:
    ``CAST(concat('0x', substr(md5(x),1,n)) AS BIGINT)``)."""
    x = F.concat(F.lit(f"{seed}:"), col) if seed is not None else col
    return F.conv(F.substring(F.md5(x), 1, hex_chars), 16, 10).cast("long")


def portable_hash64(col: Column, seed: int | None = None) -> Column:
    """Full-width 64-bit engine-portable hash: the first 16 md5 hex digits
    as a SIGNED long bit pattern. A single ``conv(..., 16, 10)`` cast can't
    express this (values ≥ 2⁶³ overflow the long cast), so combine two
    32-bit halves with a bit shift — shifts are defined on the bit pattern
    and never overflow-check. DuckDB equivalent:
    ``CAST(concat('0x', substr(md5(x), 1, 16)) AS UBIGINT)::BIGINT``.

    Use over ``portable_hash`` wherever all 64 bits must be informative
    (e.g. 64-bit SimHash signatures: with a 32-bit hash the top bits are
    constant-zero, and any Manku block covering them matches EVERY pair)."""
    x = F.concat(F.lit(f"{seed}:"), col) if seed is not None else col
    h = F.md5(x)
    hi = F.conv(F.substring(h, 1, 8), 16, 10).cast("long")
    lo = F.conv(F.substring(h, 9, 8), 16, 10).cast("long")
    return F.shiftleft(hi, 32).bitwiseOR(lo)


def words(col: Column) -> Column:
    """Whitespace tokenization (array<string>)."""
    return F.split(col, " ")


def token_stats(df: DataFrame, text_col: str = "text") -> DataFrame:
    """Token counting: whitespace tokens + a BPE-ish subword estimate
    (ceil(len/4) pieces per word — the ~4-chars-per-token heuristic)."""
    w = words(F.col(text_col))
    return df.withColumn("n_tokens", F.size(w)).withColumn(
        "n_subwords",
        F.aggregate(
            w, F.lit(0).cast("long"),
            lambda acc, x: acc + F.ceil(F.length(x) / F.lit(4.0)).cast("long"),
        ),
    )


def quality_features(df: DataFrame, text_col: str = "text") -> DataFrame:
    """Quality scoring features: char/word counts, mean word length,
    type-token ratio, stopword ratio — and a composite score in [0,1].

    The composite mirrors common pretraining-corpus filters (Gopher-style
    length + repetition heuristics) with fixed, documented weights.
    """
    w = words(F.col(text_col))
    stop = F.array(*[F.lit(s) for s in ["the", "a", "and", "of", "to", "in"]])
    n_words = F.size(w).cast("double")
    n_chars = F.length(F.col(text_col)).cast("double")
    # try_divide: a pathological empty document has n_words == 0; NULL
    # features beat a DIVIDE_BY_ZERO abort under ANSI-on sessions.
    mean_word_len = F.try_divide(n_chars - (n_words - 1), n_words)
    ttr = F.try_divide(F.size(F.array_distinct(w)).cast("double"), n_words)
    stop_ratio = F.try_divide(
        F.size(F.filter(w, lambda x: F.array_contains(stop, x))).cast("double"),
        n_words,
    )
    score = (
        F.least(n_words / F.lit(200.0), F.lit(1.0)) * 0.4
        + ttr * 0.4
        + F.least(stop_ratio * 5.0, F.lit(1.0)) * 0.2
    )
    return (
        df.withColumn("n_words", n_words.cast("long"))
        .withColumn("mean_word_len", mean_word_len)
        .withColumn("type_token_ratio", ttr)
        .withColumn("stopword_ratio", stop_ratio)
        .withColumn("quality_score", score)
    )


# Gopher's quality-filter stopword list (Rae et al. 2021, §A1.1: a document
# must contain ≥ 2 of these "must-have" function words).
GOPHER_STOPWORDS = ["the", "be", "to", "of", "and", "that", "have", "with"]


def gopher_quality_rules(
    df: DataFrame,
    text_col: str = "text",
    min_words: int = 50,
    max_words: int = 100_000,
    min_mean_word_len: float = 3.0,
    max_mean_word_len: float = 10.0,
    max_symbol_ratio: float = 0.1,
    min_alpha_word_ratio: float = 0.8,
    min_stopwords: int = 2,
) -> DataFrame:
    """Gopher quality-filter rule battery (Rae et al. 2021, §A1.1) as one
    named per-rule boolean battery — the per-document audit trail real
    curation pipelines keep (which rule killed a document matters as much
    as whether it was killed).

    Rules, each a pure Column expression (map-only, whole-stage codegen;
    at 100 TB this runs at scan rate and composes with o9/dq2/pipe1):
    word count in [min,max]; mean word length in [3,10]; symbol-to-word
    ratio ('#' and '...' occurrences) ≤ 0.1; ≥ 80% of words contain an
    alphabetic character; ≥ 2 Gopher stopwords. The paper's line-shape
    rules (bullet-start/ellipsis-end line fractions) are omitted: this
    corpus is single-line (no newlines in any document — measured), so
    they are vacuously true and would pad the output.

    Defaults are the PAPER's thresholds; callers on short-document
    corpora (like this testdata) pass rescaled word-count bounds the way
    d5/d11 rescale their cosine thresholds.
    """
    w = words(F.col(text_col))
    n_words = F.size(w)
    # sum of word lengths stays integer (exact); the mean divides once at
    # the end — identical IEEE division in any engine. try_divide: NULL
    # on a pathological empty document rather than an ANSI abort.
    sum_wl = F.aggregate(
        w, F.lit(0).cast("long"), lambda acc, x: acc + F.length(x).cast("long")
    )
    mean_wl = F.try_divide(sum_wl.cast("double"), n_words.cast("double"))
    txt = F.col(text_col)
    n_hash = F.length(txt) - F.length(F.replace(txt, F.lit("#"), F.lit("")))
    n_ellipsis = (
        F.length(txt) - F.length(F.replace(txt, F.lit("..."), F.lit("")))
    ) / F.lit(3)
    symbol_ratio = F.try_divide(
        (n_hash + n_ellipsis).cast("double"), n_words.cast("double")
    )
    alpha_ratio = F.try_divide(
        F.size(F.filter(w, lambda x: x.rlike("[a-zA-Z]"))).cast("double"),
        n_words.cast("double"),
    )
    stop = F.array(*[F.lit(s) for s in GOPHER_STOPWORDS])
    n_stop = F.size(F.filter(w, lambda x: F.array_contains(stop, x)))
    ok_words = n_words.between(min_words, max_words)
    ok_mean = mean_wl.between(min_mean_word_len, max_mean_word_len)
    ok_symbol = symbol_ratio <= max_symbol_ratio
    ok_alpha = alpha_ratio >= min_alpha_word_ratio
    ok_stop = n_stop >= min_stopwords
    return df.select(
        "*",
        n_words.cast("long").alias("n_words"),
        mean_wl.alias("mean_word_len"),
        symbol_ratio.alias("symbol_ratio"),
        alpha_ratio.alias("alpha_word_ratio"),
        n_stop.cast("long").alias("n_stopwords"),
        ok_words.alias("ok_word_count"),
        ok_mean.alias("ok_mean_word_len"),
        ok_symbol.alias("ok_symbol_ratio"),
        ok_alpha.alias("ok_alpha_words"),
        ok_stop.alias("ok_stopwords"),
        (ok_words & ok_mean & ok_symbol & ok_alpha & ok_stop).alias("keep"),
    )


def kneser_ney_score(
    df: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    passthrough_cols: tuple = (),
) -> DataFrame:
    """Interpolated Kneser-Ney bigram scoring (t19) — see the
    ``t19_kneser_ney_score`` query docstring for the formula, smoothing
    rationale, and scale shape. Returns (id, n_bigrams,
    kn_cross_entropy); documents with fewer than 2 words score no rows
    (no bigrams), matching the oracle's join semantics.

    Model build (r13): the continuation/discount statistics are exact
    integer aggregations of the bigram-counts table — the table the
    scoring join broadcasts anyway — so by default they are computed in
    ONE driver-side pandas pass (``SPARK_GRAFT_KN_MODEL=driver``),
    deleting three shuffled aggregations, two joins and a checkpoint
    from the plan. ``SPARK_GRAFT_KN_MODEL=dist`` restores the
    distributed build for bigram tables past driver memory; pair it
    with ``SPARK_GRAFT_VOCAB_JOIN=shuffle_hash`` past the broadcast
    threshold. Both paths share the ``_logp`` expression and are
    bit-identical (pytest-pinned).

    ``passthrough_cols`` (r13, the pipe2 precedent): per-doc constant
    columns copied onto the output — zero compute in the driver path
    (they ride the Arrow batch), ``F.first`` in the dist aggregation —
    so callers need no doc-keyed join to re-attach them."""
    w = F.split(F.col(text_col), " ")
    bigrams = F.when(
        F.size(w) >= 2,
        F.transform(
            F.sequence(F.lit(1), F.size(w) - 1),
            lambda i: F.struct(
                F.element_at(w, i).alias("w1"),
                F.element_at(w, i + F.lit(1)).alias("w2"),
            ),
        ),
    ).otherwise(F.array().cast("array<struct<w1:string,w2:string>>"))
    doc_big = df.select(
        F.col(id_col), F.explode(bigrams).alias("b")
    ).select(id_col, F.col("b.w1").alias("w1"), F.col("b.w2").alias("w2"))

    def _logp(disc: Column, types: Column) -> Column:
        # the interpolated-KN log-probability — ONE expression shared by
        # both model-build paths below, so they are the same IEEE754
        # doubles by construction (same implicit casts: c1/n1p_w1/
        # n1p_pre stay LONG, disc/types DOUBLE)
        return F.log(
            (
                F.greatest(F.col("c12").cast("double") - disc, F.lit(0.0))
                + disc * F.col("n1p_w1") * (F.col("n1p_pre") / types)
            )
            / F.col("c1")
        )

    if os.environ.get("SPARK_GRAFT_KN_MODEL", "driver") == "driver":
        # r13 (the VERDICT r12 pipe5 lever), two parts:
        #
        # (1) The model-statistics tables (uc, pre, scal) are pure
        # aggregations of the bigram-counts table — which is EXACTLY the
        # table the r12 scoring join broadcast to every executor, so
        # materializing it on the driver costs no memory the broadcast
        # did not already imply. Folding the three consumers into exact
        # pandas integer aggregations deletes three shuffled
        # aggregations, two joins, a crossJoin, and the counts-table
        # localCheckpoint from the plan (r12: that sequential stage
        # chain ran over a vocab²-bounded table).
        #
        # (2) Both corpus passes become map-only Arrow passes — the r12
        # profile showed each 5M-row bigram explode+hash-agg pass
        # costing ~3 s at sf0.1 while every model stage ran over ≤10³
        # rows. Pass one counts (w1,w2) pairs per batch (C-level dict
        # ops; partials collected and final-summed exactly in pandas
        # int64); pass two scores each doc against the model dict in the
        # closure. ZERO Exchange, zero joins, two corpus reads — the
        # information-theoretic floor for self-trained scoring. The
        # per-doc sum is the same left-to-right accumulation the
        # hash-agg partial performed (explode keeps a doc's bigrams in
        # one partition), and logp itself is still evaluated by Spark's
        # log over the local model relation, so scores stay
        # bit-identical to the dist path (pytest-pinned).
        from collections import Counter

        import pandas as pd

        spark = df.sparkSession
        id_t = df.schema[id_col].dataType.simpleString()

        def count_pairs(batches):
            for pdf in batches:
                cnt: Counter = Counter()
                for txt in pdf[text_col]:
                    ws = txt.split(" ") if txt is not None else []
                    if len(ws) >= 2:
                        cnt.update(zip(ws, ws[1:]))
                if cnt:
                    yield pd.DataFrame(
                        {
                            "w1": [k[0] for k in cnt],
                            "w2": [k[1] for k in cnt],
                            "c": pd.Series(list(cnt.values()), dtype="int64"),
                        }
                    )

        part = df.select(text_col).mapInPandas(
            count_pairs, "w1 string, w2 string, c long"
        )
        pc = part.toPandas()  # ≤ bigram-types × partitions partial rows
        counts = (
            pc.groupby(["w1", "w2"], as_index=False)["c"]
            .sum()
            .rename(columns={"c": "c12"})
        )
        schema = (
            "w1 string, w2 string, c12 long, c1 long, n1p_w1 long, n1p_pre long"
        )
        if len(counts) == 0:
            model_rows = []
        else:
            g1 = counts.groupby("w1")["c12"]
            counts["c1"] = g1.transform("sum")
            counts["n1p_w1"] = g1.transform("size")
            counts["n1p_pre"] = counts.groupby("w2")["c12"].transform("size")
            c12v = counts["c12"]
            n1 = float((c12v == 1).sum())
            n2 = float((c12v == 2).sum())
            types_f = float(len(counts))
            # same guarded count-of-counts discount as the dist path;
            # with literal scalars Catalyst constant-folds the identical
            # double division
            disc = (
                F.lit(n1) / (F.lit(n1) + 2 * F.lit(n2))
                if n1 + 2 * n2 > 0
                else F.lit(0.0)
            )
            model_src = spark.createDataFrame(
                counts[["w1", "w2", "c12", "c1", "n1p_w1", "n1p_pre"]], schema
            )
            model_rows = model_src.select(
                "w1", "w2", _logp(disc, F.lit(types_f)).alias("logp")
            ).collect()  # LocalTableScan — no cluster job
        logp_map = {(r[0], r[1]): r[2] for r in model_rows}

        def score(batches):
            for pdf in batches:
                keep_idx: list = []
                nb: list = []
                ce: list = []
                for i, txt in enumerate(pdf[text_col]):
                    ws = txt.split(" ") if txt is not None else []
                    if len(ws) < 2:
                        continue  # no bigrams -> no row (join semantics)
                    s = 0.0
                    n = 0
                    for pair in zip(ws, ws[1:]):
                        s += logp_map[pair]
                        n += 1
                    keep_idx.append(i)
                    nb.append(n)
                    ce.append(_spark_round6(-(s / n)))
                out = {
                    id_col: pdf[id_col].iloc[keep_idx].reset_index(drop=True),
                    "n_bigrams": pd.Series(nb, dtype="int64"),
                    "kn_cross_entropy": pd.Series(ce, dtype="float64"),
                }
                for c in passthrough_cols:
                    out[c] = pdf[c].iloc[keep_idx].reset_index(drop=True)
                yield pd.DataFrame(out)

        pt_schema = "".join(
            f", {c} {df.schema[c].dataType.simpleString()}"
            for c in passthrough_cols
        )
        return df.select(id_col, text_col, *passthrough_cols).mapInPandas(
            score,
            f"{id_col} {id_t}, n_bigrams long, kn_cross_entropy double"
            + pt_schema,
        )
    else:
        # SPARK_GRAFT_KN_MODEL=dist — the distributed model build, for
        # deployments whose bigram-TYPES table outgrows driver memory
        # (it then also outgrows the broadcast threshold: pair with
        # SPARK_GRAFT_VOCAB_JOIN=shuffle_hash below).
        # The counts table is localCheckpointed DELIBERATELY: its four
        # consumers (uc, pre, scal, the model join) sit in one plan, but
        # column pruning gives each branch a canonically DIFFERENT bc
        # subtree, so ReusedExchange does not fire — measured r12:
        # removing this checkpoint recomputed the explode+count subtree
        # 4x (16 -> 28 Exchanges, pipe5 6.7 s -> 13.3 s) and starved AQE
        # of the size stats that make the model joins broadcast.
        bc = (
            doc_big.groupBy("w1", "w2")
            .agg(F.count(F.lit(1)).alias("c12"))
            .localCheckpoint()
        )
        uc = bc.groupBy("w1").agg(
            F.sum("c12").alias("c1"), F.count(F.lit(1)).alias("n1p_w1")
        )
        pre = bc.groupBy("w2").agg(F.count(F.lit(1)).alias("n1p_pre"))
        scal = bc.agg(
            F.sum((F.col("c12") == 1).cast("int")).cast("double").alias("n1"),
            F.sum((F.col("c12") == 2).cast("int")).cast("double").alias("n2"),
            F.count(F.lit(1)).cast("double").alias("types"),
        )
        # a corpus dense enough that NO bigram has count 1 or 2 gives the
        # count-of-counts estimate no evidence: D = 0/0. The correct limit
        # is D = 0 (no discount -> plain MLE).
        disc = F.when(
            F.col("n1") + 2 * F.col("n2") > 0,
            F.col("n1") / (F.col("n1") + 2 * F.col("n2")),
        ).otherwise(F.lit(0.0))
        model = (
            bc.join(uc, "w1")
            .join(pre, "w2")
            .crossJoin(F.broadcast(scal))
            .select("w1", "w2", _logp(disc, F.col("types")).alias("logp"))
        )
    # The model-side build hint is KEPT deliberately (r12 A/B): un-hinted,
    # the static planner re-plans the scoring join as a SortMergeJoin — a
    # corpus-sized (w1,w2) shuffle+sort of doc_big that AQE's runtime BHJ
    # conversion did not recover (measured: pipe5 6.7 s -> 13.6 s, t19
    # plan 6 BHJ -> 0). The model is bigram-TYPES-sized (vocab²/Heaps-
    # bounded); where it outgrows the broadcast threshold, set
    # SPARK_GRAFT_VOCAB_JOIN=shuffle_hash (r13, VERDICT r12 #4): a
    # ShuffledHashJoin BUILDING on the model side — no corpus sort, no
    # corpus broadcast.
    score_src = df.select(
        F.col(id_col), *passthrough_cols, F.explode(bigrams).alias("b")
    ).select(
        id_col, *passthrough_cols,
        F.col("b.w1").alias("w1"), F.col("b.w2").alias("w2"),
    )
    return (
        score_src.join(vocab_join_side(model), ["w1", "w2"])
        .groupBy(id_col)
        .agg(
            F.count(F.lit(1)).alias("n_bigrams"),
            F.round(-F.avg("logp"), 6).alias("kn_cross_entropy"),
            *[F.first(c).alias(c) for c in passthrough_cols],
        )
    )


GOPHER_TOP_NGRAM_MAX_FRAC = ((2, 0.20), (3, 0.18), (4, 0.16))
GOPHER_DUP_NGRAM_MAX_FRAC = (
    (5, 0.15), (6, 0.14), (7, 0.13), (8, 0.12), (9, 0.11), (10, 0.10)
)


def gopher_repetition_rules(
    df: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    top_ngram_max_frac: tuple = GOPHER_TOP_NGRAM_MAX_FRAC,
    dup_ngram_max_frac: tuple = GOPHER_DUP_NGRAM_MAX_FRAC,
) -> DataFrame:
    """Gopher REPETITION-removal battery (Rae et al. 2021 §A1.2) — the
    companion to ``gopher_quality_rules`` (§A1.1, dq3): repetitive junk
    (boilerplate loops, degenerate generations, scraped nav bars) is the
    other big kill class in LLM curation. Two rule families, both over
    word n-grams with CHARACTER accounting, as the paper specifies:

    - top n-gram fraction (n = 2, 3, 4): characters covered by the most
      frequent n-gram (count × n-gram char length; overlapping
      occurrences may push it past 1.0, faithfully) / total characters,
      capped at the paper's 0.20 / 0.18 / 0.16. A top n-gram occurring
      once is not repetition — the fraction reads 0 then (the standard
      implementation's behavior). Ties on count break to the LONGEST
      n-gram (the conservative read; deterministic in both engines via
      struct-max on (count, char_len) — the fraction value is
      tie-invariant beyond that).
    - duplicate n-gram fraction (n = 5..10): characters covered by at
      least one occurrence of any n-gram appearing more than once in the
      document, counted ONCE per character (interval union over char
      spans — the standard no-double-count reading), / total characters;
      caps 0.15 / 0.14 / 0.13 / 0.12 / 0.11 / 0.10.

    The paper's duplicate line/paragraph rules are omitted for the same
    measured reason as in dq3/dq5: this corpus is single-line.

    Scale shape (r13): the ENTIRE battery is per-document arithmetic, so
    it runs as ONE map-only Arrow pass — ``mapInPandas`` with all nine
    rules computed per doc in-batch — ZERO Exchange, no join against the
    corpus (the r12 shape was one posexplode + four doc-keyed
    window/aggregate exchanges; every value is unchanged — per-rule
    integer char accounting with one half-up-rounded double division,
    pinned by the hand-computed pytest and the dq7/pipe5 hash oracles).
    The n-gram string IS ``text[s:e]`` because split-on-space words
    re-join to the original text exactly, so occurrence counting hashes
    C-level string slices, never building tuples. At 100 TB this is the
    same cost class as a tokenize pass — literally one.
    """
    import pandas as pd

    ns = sorted(
        [n for n, _ in top_ngram_max_frac] + [n for n, _ in dup_ngram_max_frac]
    )
    top_ns = {n for n, _ in top_ngram_max_frac}
    frac_names = [
        f"top_{n}gram_frac" if n in top_ns else f"dup_{n}gram_frac" for n in ns
    ]
    flag_specs = [
        (f"ok_top_{n}gram", f"top_{n}gram_frac", cap)
        for n, cap in top_ngram_max_frac
    ] + [
        (f"ok_dup_{n}gram", f"dup_{n}gram_frac", cap)
        for n, cap in dup_ngram_max_frac
    ]
    id_t = df.schema[id_col].dataType.simpleString()

    def battery(batches):
        from collections import Counter

        for pdf in batches:
            cols: dict = {nm: [] for nm in frac_names}
            for txt in pdf[text_col]:
                ws = txt.split(" ") if txt is not None else []
                m = len(ws)
                # char offset of word i = Σ_{k<i}(len_k + 1); words
                # re-join to txt exactly, so txt[starts[i]:ends[j]] IS
                # concat_ws(" ", words i..j)
                starts = [0] * m
                acc = 0
                for j, wd in enumerate(ws):
                    starts[j] = acc
                    acc += len(wd) + 1
                ends = [starts[j] + len(ws[j]) for j in range(m)]
                total = float(len(txt)) if txt else 0.0
                for n, nm in zip(ns, frac_names):
                    if m < n:
                        cols[nm].append(0.0)
                        continue
                    grams = [
                        txt[starts[i] : ends[i + n - 1]]
                        for i in range(m - n + 1)
                    ]
                    cnt = Counter(grams)
                    if n in top_ns:
                        # (count, char_len)-max; count 1 is not
                        # repetition — the rule reads 0 then (the
                        # standard implementation's `if count == 1:
                        # continue`)
                        c, l = max((c, len(g)) for g, c in cnt.items())
                        cols[nm].append(
                            _spark_round6(float(c * l) / total)
                            if c > 1
                            else 0.0
                        )
                    else:
                        # interval union of duplicated spans: spans come
                        # out in ascending s (positions ascend), so the
                        # running-max union is one pass
                        cov = 0
                        pmax = -1
                        for i, g in enumerate(grams):
                            if cnt[g] > 1:
                                e_i = ends[i + n - 1]
                                lo = max(starts[i], pmax)
                                if e_i > lo:
                                    cov += e_i - lo
                                if e_i > pmax:
                                    pmax = e_i
                        cols[nm].append(_spark_round6(float(cov) / total))
            out = {id_col: pdf[id_col].reset_index(drop=True)}
            for nm in frac_names:
                out[nm] = pd.Series(cols[nm], dtype="float64")
            keep = pd.Series([True] * len(pdf), dtype="bool")
            for flag, frac, cap in flag_specs:
                ok = out[frac] <= cap
                out[flag] = ok
                keep = keep & ok
            out["keep"] = keep
            yield pd.DataFrame(out)

    schema = (
        f"{id_col} {id_t}, "
        + ", ".join(f"{nm} double" for nm in frac_names)
        + ", "
        + ", ".join(f"{flag} boolean" for flag, _, _ in flag_specs)
        + ", keep boolean"
    )
    return df.select(id_col, text_col).mapInPandas(battery, schema)


def c4_line_rules(
    df: DataFrame,
    text_col: str = "text",
    line_words: int = 10,
    min_line_words: int = 5,
    denylist: tuple[str, ...] = ("dup",),
    min_mean_word_len_x10: int = 42,
    min_kept_lines: int = 3,
) -> DataFrame:
    """C4 line-level cleaning (Raffel et al. 2020, §2.2): filter a page
    LINE BY LINE, re-join the survivors in order, and keep the page only
    if enough lines survive — the rule family behind C4/RealNews and the
    line-granular half of most web-corpus cleaners (Gopher's document
    rules are ``gopher_quality_rules``).

    Adaptations for this corpus (no newlines or punctuation in any
    document — measured): a "line" is a fixed ``line_words``-word chunk
    (the chunk1 convention), and C4's terminal-punctuation rule is
    replaced by a mean-word-length floor stated in EXACT integer
    arithmetic (``10·Σlen(word) ≥ min_mean_word_len_x10·n_words`` — no
    float division for engines to disagree on). Per-line rules:
    ≥ ``min_line_words`` words (C4 drops lines under 5 words), no
    denylist token (C4's bad-word / "lorem ipsum" / "javascript" rule),
    and the mean-word-length floor. Page rule: keep the document iff
    ≥ ``min_kept_lines`` lines survive (C4 keeps pages with ≥ 3
    sentences). C4's cross-corpus three-sentence-span dedup is the
    separate ``duplicate_spans`` operator (d7). Exact duplicate LINES
    within a page are statistically impossible on this corpus (random
    10-word chunks over a 31-word vocab), so that rule is omitted
    rather than shipped untestable.

    Scale shape: the whole battery — chunking, per-line rules, audit
    counts, in-order reassembly — is higher-order array Column
    expressions over ONE scan: map-only, zero shuffles, no explode (the
    per-doc line list never leaves the row), so at 100 TB it runs at
    scan rate and composes with dq3/o9/pipe1. Cleaned text is returned
    both verbatim (``cleaned_text``) and as ``cleaned_md5`` so
    downstream dedup can shuffle the 32 B fingerprint instead of bodies.
    """
    w = words(F.col(text_col))
    # ceil(n/line_words) via exact double floor ((n+9)/10 < 2^53 — exact).
    n_lines = F.floor((F.size(w) + F.lit(line_words - 1)) / F.lit(line_words))
    # guard n_lines == 0: Spark's sequence(0, -1) is a DESCENDING [0, -1]
    # (not empty), which would diverge from the oracle's empty
    # generate_series. Unreachable with F.split (empty text -> [""], so
    # n_lines >= 1) but future tokenizers may return empty arrays.
    lines = F.when(
        n_lines > 0,
        F.transform(
            F.sequence(F.lit(0).cast("long"), n_lines - 1),
            lambda i: F.slice(w, (i * line_words + 1).cast("int"), line_words),
        ),
    ).otherwise(F.array().cast("array<array<string>>"))
    deny = F.array(*[F.lit(d) for d in denylist])

    def _sum_len(line: Column) -> Column:
        return F.aggregate(
            line, F.lit(0).cast("long"), lambda a, x: a + F.length(x).cast("long")
        )

    def _short(line: Column) -> Column:
        return F.size(line) < min_line_words

    def _denied(line: Column) -> Column:
        return F.arrays_overlap(line, deny)

    def _low_mwl(line: Column) -> Column:
        return F.lit(10) * _sum_len(line) < F.lit(min_mean_word_len_x10) * F.size(
            line
        ).cast("long")

    kept = F.filter(
        lines, lambda L: ~_short(L) & ~_denied(L) & ~_low_mwl(L)
    )
    n_kept = F.size(kept)
    cleaned = F.array_join(
        F.transform(kept, lambda L: F.array_join(L, " ")), " "
    )
    return df.select(
        "*",
        n_lines.cast("long").alias("n_lines"),
        F.size(F.filter(lines, _short)).cast("long").alias("n_short_lines"),
        F.size(F.filter(lines, _denied)).cast("long").alias("n_denylist_lines"),
        F.size(F.filter(lines, _low_mwl)).cast("long").alias("n_low_mwl_lines"),
        n_kept.cast("long").alias("n_kept_lines"),
        cleaned.alias("cleaned_text"),
        F.md5(cleaned).alias("cleaned_md5"),
        (n_kept >= min_kept_lines).alias("keep"),
    )


# Marker vocabularies for the n-gram/stopword language-ID heuristic. On real
# corpora these are the top function words per language; scoring is
# count-of-markers-present, argmax with lexicographic tie-break.
LANG_MARKERS: dict[str, list[str]] = {
    "en": ["the", "and", "of", "to", "a", "in", "is", "that"],
    "es": ["el", "la", "de", "que", "y", "en", "un", "los"],
    "fr": ["le", "la", "de", "et", "les", "des", "un", "que"],
    "de": ["der", "die", "und", "das", "ist", "nicht", "ein", "mit"],
    "zh": ["的", "是", "了", "在", "我", "有", "和", "不"],
}


def lang_id(df: DataFrame, text_col: str = "text") -> DataFrame:
    """Language-ID heuristic: per-language marker-word hit counts over the
    token set; prediction = argmax (ties broken by language code).

    One projection, no shuffle, no UDF — scales linearly.
    """
    w = F.array_distinct(words(F.col(text_col)))
    scores = {
        lang: F.size(
            F.array_intersect(w, F.array(*[F.lit(m) for m in markers]))
        ).cast("long")
        for lang, markers in LANG_MARKERS.items()
    }
    out = df
    for lang, s in scores.items():
        out = out.withColumn(f"score_{lang}", s)
    # argmax with deterministic lexicographic tie-break
    pred = F.lit("en")
    best = F.col("score_en")
    for lang in sorted(scores):
        if lang == "en":
            continue
        is_better = F.col(f"score_{lang}") > best
        pred = F.when(is_better, F.lit(lang)).otherwise(pred)
        best = F.when(is_better, F.col(f"score_{lang}")).otherwise(best)
    return out.withColumn("lang_pred", pred)


def fingerprint(df: DataFrame, text_col: str = "text") -> DataFrame:
    """Document fingerprint: md5 over the sorted distinct token set — a
    canonical content hash robust to word order (bag-of-words identity).
    Plus a 64-bit numeric prefix for compact joins."""
    canon = F.array_join(F.array_sort(F.array_distinct(words(F.col(text_col)))), " ")
    fp = F.md5(canon)
    return df.withColumn("fingerprint", fp).withColumn(
        "fingerprint64", F.conv(F.substring(fp, 1, 15), 16, 10).cast("long")
    )


# Production PII patterns (documented defaults). The synthetic test corpus
# contains no digits/emails, so the oracle-gated query exercises the same
# code path with a token denylist instead; these patterns are what a real
# deployment would pass. Both Java regex and DuckDB/RE2 support \b and the
# classes used here, so the oracle stays engine-portable.
PII_PATTERNS: dict[str, str] = {
    # order matters: patterns apply sequentially and counts are taken on
    # the already-scrubbed text (see redact), so the more-specific ipv4
    # runs before the broad phone pattern (which also matches dotted IPs)
    "email": r"\b[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}\b",
    "ipv4": r"\b(?:[0-9]{1,3}\.){3}[0-9]{1,3}\b",
    "phone": r"\b\+?[0-9][0-9()\-. ]{7,}[0-9]\b",
}


def redact(
    df: DataFrame,
    patterns: dict[str, str],
    text_col: str = "text",
    replacement: str = "[REDACTED]",
) -> DataFrame:
    """Pattern redaction for corpus scrubbing (PII removal class): replace
    every match of each named pattern with ``replacement`` and count the
    replacements per pattern (audit columns ``n_<name>``) plus a total.

    Patterns apply sequentially, and each pattern's count is taken on the
    text AS ALREADY SCRUBBED by the preceding patterns — so with
    overlapping patterns (e.g. the phone regex also matching an IP) the
    per-pattern counts sum to the number of replacements actually made,
    not to double-counted spans. ORACLE WARNING: any correctness oracle
    must replicate this sequential-scrub counting (count pattern i on the
    text with patterns 0..i-1 already replaced); counting every pattern
    on the ORIGINAL text only agrees when the patterns are pairwise
    disjoint on the data — true for the t7 denylist tokens, NOT true for
    PII_PATTERNS (phone overlaps ipv4).

    Map-only pure Column expressions — ``regexp_replace``/``regexp_count``
    run JVM-side inside whole-stage codegen; at 100 TB this is a scan-rate
    pass with zero shuffle, and the audit counts aggregate with a partial
    (map-side) combine if the caller sums them.
    """
    out = df
    total = F.lit(0).cast("long")
    scrubbed = F.col(text_col)
    for name, pat in patterns.items():
        n = F.regexp_count(scrubbed, F.lit(pat)).cast("long")
        out = out.withColumn(f"n_{name}", n)
        total = total + n
        scrubbed = F.regexp_replace(scrubbed, pat, replacement)
    return out.withColumn("n_redactions", total).withColumn(
        "text_redacted", scrubbed
    )


def bm25_top_terms(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    k: int = 3,
    k1: float = 1.2,
    b: float = 0.75,
) -> DataFrame:
    """Per-document top-``k`` BM25 term weights (Robertson/Sparck Jones):

        idf(t)   = ln( (N - df + 0.5) / (df + 0.5) + 1 )
        w(t, d)  = idf(t) * tf * (k1 + 1) / (tf + k1 * (1 - b + b * dl/avgdl))

    Shape for 100 TB: one token explode → (doc, term) tf aggregate (the only
    big shuffle, combiner-friendly). That tf table feeds FOUR consumers
    (scored rows, doc lengths, document frequencies, corpus scalars), and
    Catalyst does NOT reuse a shuffle across join branches — without
    materialization the tokenize+explode+aggregate runs four times
    (verified via explain). So tf is cached: at ~16 bytes + term per row it
    is roughly the size of the deduplicated corpus vocabulary per doc, far
    smaller than re-reading the text 4×; on a cluster this would be a
    checkpoint/persist to local disk. Materialized via an eager
    ``localCheckpoint`` rather than ``.cache()``: the operator cannot know
    when the caller's last action runs, and cached plans pile up in the
    CacheManager for the life of the session, while checkpoint blocks are
    reclaimed by the ContextCleaner as soon as the returned frame is
    garbage-collected. Eager-materialization tradeoffs: building the
    returned DataFrame runs the tf job immediately, and checkpoint blocks
    are not recomputed on executor loss (persist would be) — on a real
    cluster with flaky executors prefer persist(DISK_ONLY). dl/df/scalars
    are then broadcast-joined back; top-k is a per-doc window with a
    WindowGroupLimit pre-rank. Term ties break lexicographically so
    results are deterministic.
    """
    toks = df.select(
        F.col(id_col).alias("id"), F.explode(words(F.col(text_col))).alias("term")
    )
    tf = toks.groupBy("id", "term").agg(F.count(F.lit(1)).alias("tf")).localCheckpoint()
    dl = tf.groupBy("id").agg(F.sum("tf").alias("dl"))
    dfreq = tf.groupBy("term").agg(F.count(F.lit(1)).alias("df"))
    scalars = dl.agg(
        F.count(F.lit(1)).alias("n_docs"), F.avg("dl").alias("avgdl")
    )
    scored = (
        tf.join(dl, "id")
        .join(dfreq, "term")
        .crossJoin(F.broadcast(scalars))
        .withColumn(
            "idf",
            F.log(
                (F.col("n_docs") - F.col("df") + 0.5) / (F.col("df") + 0.5) + 1.0
            ),
        )
        .withColumn(
            "bm25",
            F.col("idf")
            * (F.col("tf") * (k1 + 1))
            / (
                F.col("tf")
                + k1 * (1.0 - b + b * F.col("dl") / F.col("avgdl"))
            ),
        )
    )
    from pyspark.sql import Window

    w = Window.partitionBy("id").orderBy(F.desc("bm25"), F.asc("term"))
    return (
        scored.withColumn("rk", F.row_number().over(w))
        .filter(F.col("rk") <= k)
        .select(
            F.col("id").alias(id_col),
            F.col("rk").alias("rank"),
            "term",
            F.col("tf").cast("long").alias("tf"),
            F.col("df").cast("long").alias("df"),
            F.round("bm25", 6).alias("bm25"),
        )
    )


def repetition_stats(
    df: DataFrame, text_col: str = "text", id_col: str = "doc_id",
    top_bigram_max: float = 0.18, dup_trigram_max: float = 0.30,
) -> DataFrame:
    """Gopher-style repetition quality signals (Rae et al. 2021, §A1.1):
    the fraction of the document occupied by its most frequent word 2-gram
    and the fraction of word 3-grams that are repeats. High values mark
    boilerplate/spam for corpus filtering (``is_repetitive``).

    Shape: n-gram explode → (doc, gram) count → per-doc aggregate — two
    hash aggregations partitioned by doc id; Catalyst reuses one exchange
    for both gram widths' doc-level re-aggregation. No Python.
    """
    w = F.split(F.col(text_col), " ")

    def grams(n: int) -> Column:
        return F.when(
            F.size(w) >= n,
            F.transform(
                F.sequence(F.lit(1), F.size(w) - (n - 1)),
                lambda i: F.array_join(F.slice(w, i, n), " "),
            ),
        ).otherwise(F.array().cast("array<string>"))

    base = df.select(F.col(id_col).alias("id"), grams(2).alias("g2"), grams(3).alias("g3"))
    b2 = (
        base.select("id", F.explode("g2").alias("g"))
        .groupBy("id", "g")
        .agg(F.count(F.lit(1)).alias("cnt"))
        .groupBy("id")
        .agg(
            (F.max("cnt") / F.sum("cnt")).alias("top_bigram_frac"),
        )
    )
    b3 = (
        base.select("id", F.explode("g3").alias("g"))
        .groupBy("id", "g")
        .agg(F.count(F.lit(1)).alias("cnt"))
        .groupBy("id")
        .agg(
            (
                F.sum(F.when(F.col("cnt") > 1, F.col("cnt")).otherwise(0))
                / F.sum("cnt")
            ).alias("dup_trigram_frac"),
        )
    )
    return (
        df.select(F.col(id_col).alias("id"))
        .join(b2, "id", "left")
        .join(b3, "id", "left")
        .select(
            F.col("id").alias(id_col),
            F.round(F.coalesce("top_bigram_frac", F.lit(0.0)), 6).alias(
                "top_bigram_frac"
            ),
            F.round(F.coalesce("dup_trigram_frac", F.lit(0.0)), 6).alias(
                "dup_trigram_frac"
            ),
            (
                (F.coalesce("top_bigram_frac", F.lit(0.0)) > top_bigram_max)
                | (F.coalesce("dup_trigram_frac", F.lit(0.0)) > dup_trigram_max)
            ).alias("is_repetitive"),
        )
    )


def bm25_search(
    df: DataFrame,
    query_terms: list[str],
    text_col: str = "text",
    id_col: str = "doc_id",
    k: int = 20,
    k1: float = 1.2,
    b: float = 0.75,
) -> DataFrame:
    """Full-corpus BM25 retrieval for a bag-of-terms query: rank documents
    by the sum of their BM25 weights over the query terms (same formula
    as ``bm25_top_terms``), returning the top ``k`` with deterministic
    id tie-break.

    Scale shape: the (doc, term) tf table is filtered to the query terms
    FIRST (isin on a literal list — pushed into the aggregate's input),
    so df/dl/scalars and the scoring join all run on a candidate set
    bounded by documents-containing-a-query-term, not the corpus. At
    100 TB this is the query-time path over a precomputed tf index; the
    global doc count and avgdl still come from the full corpus (one
    1-row aggregate).

    Top-k is ``orderBy(...).limit(k)`` — TakeOrderedAndProject (a
    per-partition k-row heap merged on the driver), NOT an unpartitioned
    ``row_number`` window: for a common query term the matching set is
    corpus-sized, and a global window would funnel all of it through one
    partition. Rank is then derived on the ≤k surviving rows by collapsing
    them into a single sorted array (bounded by k, no window)."""
    toks = df.select(
        F.col(id_col).alias("id"), F.explode(words(F.col(text_col))).alias("term")
    )
    tf_all = toks.groupBy("id", "term").agg(F.count(F.lit(1)).alias("tf"))
    # corpus stats need ALL terms (document length), so compute dl before
    # restricting to the query vocabulary
    dl = tf_all.groupBy("id").agg(F.sum("tf").alias("dl"))
    scalars = dl.agg(
        F.count(F.lit(1)).alias("n_docs"), F.avg("dl").alias("avgdl")
    )
    tf_q = tf_all.filter(F.col("term").isin(query_terms))
    dfreq = tf_q.groupBy("term").agg(F.count(F.lit(1)).alias("df"))
    scored = (
        tf_q.join(dl, "id")
        .join(F.broadcast(dfreq), "term")
        .crossJoin(F.broadcast(scalars))
        .withColumn(
            "w",
            F.log(
                (F.col("n_docs") - F.col("df") + 0.5) / (F.col("df") + 0.5) + 1.0
            )
            * (F.col("tf") * (k1 + 1))
            / (F.col("tf") + k1 * (1.0 - b + b * F.col("dl") / F.col("avgdl"))),
        )
        .groupBy("id")
        .agg(
            F.round(F.sum("w"), 6).alias("score"),
            F.count(F.lit(1)).alias("n_matched"),
        )
    )
    topk = scored.orderBy(F.desc("score"), F.asc("id")).limit(k)
    # rank over ≤k rows without a WindowExec: negated-score-first struct
    # sorts (score desc, id asc) under default struct ordering
    key = F.struct(
        (-F.col("score")).alias("neg_score"),
        F.col("id").alias("id"),
        F.col("score").alias("score"),
        F.col("n_matched").alias("n_matched"),
    )
    return (
        topk.agg(F.array_sort(F.collect_list(key)).alias("xs"))
        .select(F.posexplode("xs").alias("pos", "x"))
        .select(
            F.col("x.id").alias(id_col),
            (F.col("pos") + 1).cast("int").alias("rank"),
            F.col("x.score").alias("score"),
            F.col("x.n_matched").alias("n_matched"),
        )
    )


# --- BPE merge-table application -------------------------------------------

# Default merge table for the synthetic corpus (31 lowercase words): ranks
# chosen so common words tokenize through MULTI-LEVEL merge chains
# (t-a → ta-b → tab-l → tabl-e → "table") and so global-min-rank selection
# is exercised (in "join", rank-18 j-o fires before rank-19 i-n even though
# i-n appears later in the table's build chain for jo-in).
DEFAULT_BPE_MERGES: list[tuple[str, str]] = [
    ("a", "n"), ("e", "r"), ("t", "a"), ("ta", "b"), ("tab", "l"),
    ("tabl", "e"), ("q", "u"), ("qu", "er"), ("quer", "y"), ("g", "g"),
    ("a", "s"), ("as", "h"), ("h", "ash"), ("o", "w"), ("r", "ow"),
    ("s", "t"), ("c", "an"), ("s", "can"), ("j", "o"), ("i", "n"),
    ("jo", "in"),
]


def _require_unique_merge_outputs(merges: list[tuple[str, str]], fn: str) -> None:
    """Two merges with the same output string break the len(merges)-round
    convergence argument (a later merge can recreate a symbol adjacent to a
    previously-retired pair, silently under-merging) — both BPE encode
    paths reject such tables so they can never silently diverge."""
    outs = [left + right for left, right in merges]
    if len(set(outs)) != len(outs):
        raise ValueError(
            f"{fn} requires unique merge outputs; duplicate outputs: "
            f"{sorted({o for o in outs if outs.count(o) > 1})}"
        )


def bpe_vocab(merges: list[tuple[str, str]]) -> dict[str, int]:
    """Token-id vocabulary induced by a merge table: ids 0-25 for a-z,
    then one id per merge output in rank order. Unknown symbols map to -1
    at encode time."""
    vocab = {chr(ord("a") + i): i for i in range(26)}
    for left, right in merges:
        sym = left + right
        if sym not in vocab:
            vocab[sym] = len(vocab)
    return vocab


def bpe_encode(
    df: DataFrame,
    merges: list[tuple[str, str]] | None = None,
    text_col: str = "text",
    id_col: str = "doc_id",
    pretoken_pattern: str = r"[a-zA-Z]+|[0-9]+|[^a-zA-Z0-9\s]+",
    n_rounds: int | None = None,
) -> DataFrame:
    """Greedy BPE merge-table application (GPT-2 ``bpe()`` semantics): per
    pretoken, repeatedly merge ALL left-to-right non-overlapping
    occurrences of the lowest-ranked adjacent symbol pair present, until
    no table pair remains; emit the doc's token-id sequence.

    Output: (doc_id, n_tokens, token_str) — token_str is the
    space-joined id sequence, so the oracle hash-checks the exact
    tokenization (see reference notebooks' sklearn-transformer analogue:
    this engine's tokenize-for-training step has no reference counterpart
    and follows t10's pretokenizer).

    Plan shape — MAP-ONLY, zero shuffles, zero UDFs:
    - each pretoken's symbol state is ONE string: symbols wrapped as
      ``\\x01sym\\x01`` and concatenated, so "merge all non-overlapping
      occurrences of (l, r)" is a single literal
      ``replace(state, \\x01l\\x01\\x01r\\x01 → \\x01lr\\x01)`` — the
      wrappers make boundary corruption impossible (a pattern can never
      match a symbol suffix) and left-to-right literal replacement is
      exactly the BPE non-overlap rule, with identical semantics in the
      JVM and DuckDB (prototyped: ``\\x01a\\x01×3 → [aa, a]``);
    - one merge ROUND = one ``transform`` over the doc's pretoken array
      with a rank-ordered when-chain: the FIRST pattern contained in the
      state is the min-rank pair present, and its branch replaces all its
      occurrences;
    - rounds are staged through successive ``select``s (lambda-built
      arrays are not CSE'd — see t11's lesson), ``len(merges)`` rounds
      total: a round eliminates its fired rank permanently (merging never
      creates new adjacencies between pre-existing symbols, and the
      merged symbol is strictly longer than either side), so after M
      rounds NO table pair can remain — convergence is structural, not
      heuristic (pytest re-applies an extra round and asserts a fixpoint).

    At 100 TB this is scan-rate work: the merge table is a few hundred
    plan literals (a real 50k-merge GPT-2 table would move to an
    Arrow-batched ``mapInPandas`` with the table broadcast once — the
    when-chain's compile cost grows with M, the right tool flips around
    M ≈ 10³).
    """
    if merges is None:
        merges = DEFAULT_BPE_MERGES
    _require_unique_merge_outputs(merges, "bpe_encode")
    sep = "\x01"
    vocab = bpe_vocab(merges)

    pretoks = F.regexp_extract_all(F.col(text_col), F.lit(pretoken_pattern), F.lit(0))
    wrap = lambda w: F.concat(  # noqa: E731
        F.lit(sep), F.array_join(F.split(w, ""), sep + sep), F.lit(sep)
    )
    out = df.select(
        F.col(id_col).alias("doc_id"),
        F.transform(pretoks, wrap).alias("state"),
    )
    pats = [
        (f"{sep}{left}{sep}{sep}{right}{sep}", f"{sep}{left}{right}{sep}")
        for left, right in merges
    ]

    def one_round(x):
        # rank-ordered when-chain: the first contained pattern IS the
        # min-rank pair present; its replace merges all its occurrences
        chain = None
        for pat, rep in pats:
            branch_cond = F.contains(x, F.lit(pat))
            branch_val = F.replace(x, F.lit(pat), F.lit(rep))
            chain = (
                F.when(branch_cond, branch_val)
                if chain is None
                else chain.when(branch_cond, branch_val)
            )
        return chain.otherwise(x)

    # len(merges) rounds always suffice (each round permanently retires
    # one rank — see docstring); n_rounds exists for the fixpoint test
    for _ in range(len(merges) if n_rounds is None else n_rounds):
        out = out.select("doc_id", F.transform("state", one_round).alias("state"))

    id_map = F.create_map(
        *[F.lit(x) for kv in vocab.items() for x in kv]
    )
    ids = F.flatten(
        F.transform(
            "state",
            lambda s: F.transform(
                F.split(F.btrim(s, F.lit(sep)), sep + sep),
                lambda t: F.coalesce(F.element_at(id_map, t), F.lit(-1)),
            ),
        )
    )
    # stage the lambda-built ids array before its two consumers (lambda
    # expressions are not CSE'd — t11's lesson)
    staged = out.select("doc_id", ids.alias("ids"))
    return staged.select(
        "doc_id",
        F.size("ids").cast("long").alias("n_tokens"),
        F.array_join(
            F.transform("ids", lambda i: i.cast("string")), " "
        ).alias("token_str"),
    )


def bpe_decode(
    df: DataFrame,
    merges: list[tuple[str, str]] | None = None,
    ids_col: str = "token_str",
    id_col: str = "doc_id",
    unknown: str = "?",
) -> DataFrame:
    """Detokenize: invert ``bpe_encode`` — map each token id back to its
    vocabulary symbol and concatenate. The pipeline's inspect/debug
    surface (sampling decoded training sequences is how a real corpus
    pipeline is audited). Unknown ids (-1 from out-of-vocab symbols at
    encode time, one per unknown CHARACTER) decode to ``unknown``, the
    standard lossy-detokenize convention.

    Exactness contract: on the known-vocab subset decode∘encode is the
    identity on the pretoken concatenation; with unknowns it equals the
    concatenation with every out-of-vocab character replaced by
    ``unknown`` (encode wraps each character as one symbol, merges only
    ever fire on in-vocab pairs). t16 pins this roundtrip under a DuckDB
    hash oracle. Map-only Column expressions — the id→symbol table is a
    plan-literal map; ``try_element_at``/``try_cast`` keep it ANSI-safe.
    """
    merges = DEFAULT_BPE_MERGES if merges is None else merges
    inv = {tid: sym for sym, tid in bpe_vocab(merges).items()}
    mapping = F.create_map(*[F.lit(v) for pair in inv.items() for v in pair])
    # drop empty fragments: split("", " ") yields [""], which would decode
    # an EMPTY document (whitespace-only → token_str "") to one spurious
    # ``unknown`` instead of "" (caught by the hypothesis roundtrip
    # property; valid space-joined id strings never contain empty tokens)
    ids = F.filter(F.split(F.col(ids_col), " "), lambda s: s != "")
    return df.select(
        F.col(id_col),
        F.array_join(
            F.transform(
                ids,
                lambda s: F.coalesce(
                    F.try_element_at(mapping, s.try_cast("int")), F.lit(unknown)
                ),
            ),
            "",
        ).alias("decoded"),
    )


def bpe_encode_broadcast(
    df: DataFrame,
    merges: list[tuple[str, str]] | None = None,
    text_col: str = "text",
    id_col: str = "doc_id",
    pretoken_pattern: str = r"[a-zA-Z]+|[0-9]+|[^a-zA-Z0-9\s]+",
    passthrough_cols: list[str] | None = None,
) -> DataFrame:
    """``bpe_encode`` for LARGE merge tables: Arrow-batched ``mapInPandas``
    with the rank table broadcast once in the closure, instead of the
    literal-replace when-chain (whose generated-code size grows with M —
    the right tool flips around M ≈ 10³; a real GPT-2 table is 50k merges).

    Same semantics (GPT-2 greedy ``bpe()``: min-rank adjacent pair, merge
    all non-overlapping occurrences left-to-right, repeat) and the SAME
    output schema/values as ``bpe_encode`` — equivalence is pytest-pinned
    on the shared table, and both match the hand-derived golden fixture.

    Plan shape: map-only (one python runner stage, zero Exchange); the
    per-word LRU cache makes the Zipf head free, exactly like GPT-2's
    encoder cache.

    ``passthrough_cols`` copies the named input columns onto the output
    rows inside the same Arrow batch (zero compute, zero shuffle) — the
    "carry the shard key through the encoder" move that lets callers drop
    a corpus-sized join-back to the source table (r12: pipe2's doc-level
    source join removed this way).
    """
    import re
    from functools import lru_cache

    import pandas as pd

    if merges is None:
        merges = DEFAULT_BPE_MERGES
    # the rank-based merge here would actually tolerate duplicate outputs,
    # but this path is documented same-semantics with bpe_encode (and
    # pytest-pinned equal on shared tables) — accept the same input domain
    # so the two can never silently diverge
    _require_unique_merge_outputs(merges, "bpe_encode_broadcast")
    ranks = {pair: r for r, pair in enumerate(merges)}
    vocab = bpe_vocab(merges)
    pat = pretoken_pattern
    id_field = df.schema[id_col]
    extra = list(passthrough_cols or [])

    def encode_batches(batches):
        rx = re.compile(pat)

        @lru_cache(maxsize=65536)
        def word_ids(word: str) -> tuple[int, ...]:
            syms = list(word)
            while len(syms) > 1:
                best, best_rank = None, None
                for i in range(len(syms) - 1):
                    r = ranks.get((syms[i], syms[i + 1]))
                    if r is not None and (best_rank is None or r < best_rank):
                        best, best_rank = (syms[i], syms[i + 1]), r
                if best is None:
                    break
                out, i = [], 0
                while i < len(syms):
                    if i + 1 < len(syms) and (syms[i], syms[i + 1]) == best:
                        out.append(syms[i] + syms[i + 1])
                        i += 2
                    else:
                        out.append(syms[i])
                        i += 1
                syms = out
            return tuple(vocab.get(s, -1) for s in syms)

        for pdf in batches:
            ids = [
                [t for w in rx.findall(text or "") for t in word_ids(w)]
                for text in pdf[text_col]
            ]
            out = {
                "doc_id": pdf[id_col],
                "n_tokens": [len(x) for x in ids],
                "token_str": [" ".join(map(str, x)) for x in ids],
            }
            for c in extra:
                out[c] = pdf[c]
            yield pd.DataFrame(out)

    schema = f"doc_id {id_field.dataType.simpleString()}, n_tokens long, token_str string"
    for c in extra:
        schema += f", {c} {df.schema[c].dataType.simpleString()}"
    return df.select(id_col, text_col, *extra).mapInPandas(
        encode_batches, schema=schema
    )


def bpe_train(
    df: DataFrame,
    n_merges: int = 10,
    text_col: str = "text",
    pretoken_pattern: str = r"[a-zA-Z]+|[0-9]+|[^a-zA-Z0-9\s]+",
) -> list[tuple[str, str, int]]:
    """Learn a BPE merge table from a corpus (the training counterpart of
    ``bpe_encode``): repeat ``n_merges`` times — count all adjacent symbol
    pairs across every pretoken OCCURRENCE (frequency-weighted, the
    Sennrich et al. 2016 objective), take the most frequent (ties broken
    by (left, right) lexicographically, so the table is deterministic in
    any engine), merge it corpus-wide, recurse. Returns
    ``[(left, right, pair_count), ...]`` in rank order.

    Plan shape per round: symbols stay in the same wrapped-string state as
    ``bpe_encode`` (one row per pretoken occurrence); pair counting is one
    explode + groupBy over (8+8)-byte-ish symbol pairs — the ONLY shuffle —
    and the argmax is a 1-row TakeOrdered action; the merge apply is one
    map-side literal replace. Driver holds the merge table only, never
    rows. At 100 TB each round is one scan-rate aggregation — the same
    cost class as a word-count — and rounds chain on a localCheckpoint'ed
    state so lineage stays flat.

    JOB-COUNT BOUND AND THE BATCH-MERGE UPGRADE PATH: this exact loop
    runs ONE Spark job set per merge rank (count + argmax + checkpoint),
    so a production 50k-merge vocabulary is ~50k sequential jobs —
    correct but driver-round-trip-bound (fine for the ≤ 21-rank fixtures
    this repo oracles). The standard fix is batched merging with
    pair-count REUSE (the fastBPE/Hugging-Face-trainer strategy): keep
    the per-pair counts materialized, and after merging pair (l, r)
    update only the counts of pairs ADJACENT to an (l, r) occurrence
    (merging touches no other pair), so one scan amortizes over many
    ranks and the corpus is re-read only when accumulated deltas exceed
    a rescan budget. IMPLEMENTED as ``bpe_train_incremental`` (t15b) in
    the exact rank-by-rank form — counts maintained incrementally,
    argmax per rank, affected-rows-only deltas — which keeps canonical
    Sennrich tie-order at every rank (same oracle as t15, pytest
    equality) while dropping the per-rank shuffle from corpus-scale to
    affected-pairs-scale. This full-recount variant stays as the
    oracle-shaped reference implementation.
    """
    sep = "\x01"
    pretoks = F.regexp_extract_all(F.col(text_col), F.lit(pretoken_pattern), F.lit(0))
    state = df.select(F.explode(pretoks).alias("w")).select(
        F.concat(
            F.lit(sep), F.array_join(F.split("w", ""), sep + sep), F.lit(sep)
        ).alias("state")
    ).localCheckpoint()

    merges: list[tuple[str, str, int]] = []
    for _ in range(n_merges):
        syms = F.split(F.btrim(F.col("state"), F.lit(sep)), sep + sep)
        staged = state.select("state", syms.alias("_syms"))
        pairs = staged.select(
            F.explode(
                F.zip_with(
                    F.slice("_syms", 1, F.size("_syms") - 1),
                    F.slice("_syms", 2, F.size("_syms") - 1),
                    lambda a, b: F.struct(a.alias("l"), b.alias("r")),
                )
            ).alias("p")
        ).select("p.l", "p.r")
        top = (
            pairs.groupBy("l", "r")
            .agg(F.count(F.lit(1)).alias("n"))
            .orderBy(F.desc("n"), "l", "r")
            .limit(1)
            .collect()
        )
        if not top:
            break
        l, r, n = top[0]["l"], top[0]["r"], top[0]["n"]
        merges.append((l, r, int(n)))
        pat, rep = f"{sep}{l}{sep}{sep}{r}{sep}", f"{sep}{l}{r}{sep}"
        state = state.select(
            F.replace("state", F.lit(pat), F.lit(rep)).alias("state")
        ).localCheckpoint()
    return merges


def bpe_train_incremental(
    df: DataFrame,
    n_merges: int = 10,
    text_col: str = "text",
    pretoken_pattern: str = r"[a-zA-Z]+|[0-9]+|[^a-zA-Z0-9\s]+",
) -> list[tuple[str, str, int]]:
    """``bpe_train`` with pair-count REUSE — the batch-merge upgrade path
    its docstring describes, implemented (the fastBPE / HF-trainer
    strategy). Output is IDENTICAL to ``bpe_train`` (same objective, same
    (count desc, l, r) tie-break — pinned by pytest equality and by t15b
    sharing t15's full-value DuckDB oracle).

    Why it scales where ``bpe_train`` doesn't: the per-rank full pair
    count is an explode+groupBy over EVERY adjacent symbol pair in the
    corpus — a corpus-token-scale shuffle per merge rank, ~50k of them
    for a production vocab. Merging pair (l, r) only changes counts of
    pairs ADJACENT to an (l, r) occurrence, so this trainer materializes
    the pair-count table ONCE and then per rank:

    1. argmax from the COUNTS table (tiny TakeOrdered — no corpus scan);
    2. delta-aggregate over the AFFECTED rows only
       (``contains(state, pat)`` filter — a predicate scan, no shuffle of
       unaffected rows): new-state pairs minus old-state pairs;
    3. fold the delta into the counts table (bounded-vocabulary shuffle)
       and apply the merge to the state with one map-side replace.

    Per-rank shuffle volume drops from O(corpus tokens) to O(affected
    pairs) + O(vocab²-bounded counts) — on skewed rank-frequency corpora
    (all real text) affected rows shrink rapidly with rank. Exactness is
    structural, not sampled: the counts table is exact bookkeeping, so
    the argmax sequence — and therefore the merge table — is the
    canonical Sennrich one at every rank.
    """
    sep = "\x01"
    pretoks = F.regexp_extract_all(F.col(text_col), F.lit(pretoken_pattern), F.lit(0))
    state = df.select(F.explode(pretoks).alias("w")).select(
        F.concat(
            F.lit(sep), F.array_join(F.split("w", ""), sep + sep), F.lit(sep)
        ).alias("state")
    ).localCheckpoint()

    def pair_counts(frame: DataFrame, sign: int) -> DataFrame:
        syms = F.split(F.btrim(F.col("state"), F.lit(sep)), sep + sep)
        staged = frame.select(syms.alias("_syms"))
        pairs = staged.select(
            F.explode(
                F.zip_with(
                    F.slice("_syms", 1, F.size("_syms") - 1),
                    F.slice("_syms", 2, F.size("_syms") - 1),
                    lambda a, b: F.struct(a.alias("l"), b.alias("r")),
                )
            ).alias("p")
        )
        return pairs.groupBy("p.l", "p.r").agg(
            (F.count(F.lit(1)) * sign).alias("n")
        )

    counts = pair_counts(state, 1).localCheckpoint()
    merges: list[tuple[str, str, int]] = []
    for _ in range(n_merges):
        top = counts.orderBy(F.desc("n"), "l", "r").limit(1).collect()
        if not top:
            break
        l, r, n = top[0]["l"], top[0]["r"], top[0]["n"]
        merges.append((l, r, int(n)))
        pat, rep = f"{sep}{l}{sep}{sep}{r}{sep}", f"{sep}{l}{r}{sep}"
        affected = state.filter(F.contains(F.col("state"), F.lit(pat)))
        replaced = affected.select(
            F.replace("state", F.lit(pat), F.lit(rep)).alias("state")
        )
        counts = (
            counts.unionByName(pair_counts(replaced, 1))
            .unionByName(pair_counts(affected, -1))
            .groupBy("l", "r")
            .agg(F.sum("n").alias("n"))
            .filter(F.col("n") > 0)
            .localCheckpoint()
        )
        state = state.select(
            F.replace("state", F.lit(pat), F.lit(rep)).alias("state")
        ).localCheckpoint()
    return merges


def bpe_train_local(
    df: DataFrame,
    n_merges: int = 10,
    text_col: str = "text",
    pretoken_pattern: str = r"[a-zA-Z]+|[0-9]+|[^a-zA-Z0-9\s]+",
    min_frequency: int = 1,
) -> list[tuple[str, str, int]]:
    """The PRODUCTION-vocab BPE trainer: ONE distributed aggregation, then
    every merge rank trained driver-side on the distinct-pretoken count
    table — how real trainers (Sennrich's learn_bpe, the Hugging Face
    trainer, SentencePiece's BPE mode) actually operate.

    Why this is the scale path where t15/t15b are the oracle-shaped
    references: pair statistics are a pure function of the
    ``(pretoken, occurrence_count)`` table, which is bounded by WORD
    VOCABULARY, not corpus size — Heaps' law puts it at ~10⁶-10⁷ rows
    for a 100 TB web corpus (vs 10¹³ tokens), and ``min_frequency``
    floors it further (rare pretokens can't win any merge rank whose
    running winner already exceeds their total count; the floor is the
    standard trainer knob, default off here to keep oracle equality).
    So: one explode + one groupBy((pretoken)) — the word-count cost
    class, the ONLY Spark jobs regardless of n_merges — then 50k ranks
    cost zero cluster round-trips. Per rank the driver does the
    fastBPE-style incremental update: merging (l, r) only perturbs
    counts of pairs adjacent to an (l, r) occurrence, so each rank costs
    O(affected words), not O(vocab).

    Output is IDENTICAL to ``bpe_train``/``bpe_train_incremental`` (same
    frequency-weighted Sennrich objective over pretoken OCCURRENCES,
    same (count desc, l, r) lexicographic tie-break, same left-to-right
    non-overlapping merge application) — pinned by pytest equality and
    by t15c sharing t15's full-value DuckDB oracle. Python/Spark string
    comparison agree on the tie-break because UTF-8 byte order equals
    code-point order.
    """
    pretoks = F.regexp_extract_all(F.col(text_col), F.lit(pretoken_pattern), F.lit(0))
    vocab_rows = (
        df.select(F.explode(pretoks).alias("w"))
        .groupBy("w")
        .agg(F.count(F.lit(1)).alias("n"))
        .filter(F.col("n") >= min_frequency)
        .collect()
    )
    return _bpe_train_from_vocab(
        {r["w"]: int(r["n"]) for r in vocab_rows}, n_merges
    )


def _bpe_train_from_vocab(
    vocab: dict[str, int], n_merges: int
) -> list[tuple[str, str, int]]:
    """The driver-side rank loop of ``bpe_train_local`` over a
    ``{pretoken: occurrence_count}`` table — factored out so hypothesis
    can property-test the incremental pair bookkeeping against a naive
    full-recount reference without a SparkSession."""
    from collections import defaultdict

    # driver state: word (as symbol tuple) -> occurrence count. Distinct
    # pretokens stay distinct under merging (a merge preserves the
    # concatenated string), so tuples never collide.
    words: dict[tuple[str, ...], int] = {
        tuple(w): int(n) for w, n in vocab.items() if w
    }
    pair_n: dict[tuple[str, str], int] = defaultdict(int)
    pair_words: dict[tuple[str, str], set] = defaultdict(set)
    for wt, c in words.items():
        for p in zip(wt, wt[1:]):
            pair_n[p] += c
            pair_words[p].add(wt)

    merges: list[tuple[str, str, int]] = []
    for _ in range(n_merges):
        live = [(p, n) for p, n in pair_n.items() if n > 0]
        if not live:
            break
        (l, r), n = min(live, key=lambda kv: (-kv[1], kv[0][0], kv[0][1]))
        merges.append((l, r, int(n)))
        new_sym = l + r
        for wt in list(pair_words.get((l, r), ())):
            c = words.pop(wt, None)
            if c is None:  # stale index entry from an earlier rank
                continue
            for p in zip(wt, wt[1:]):
                pair_n[p] -= c
            out: list[str] = []
            i = 0
            while i < len(wt):  # left-to-right non-overlapping, like replace()
                if i + 1 < len(wt) and wt[i] == l and wt[i + 1] == r:
                    out.append(new_sym)
                    i += 2
                else:
                    out.append(wt[i])
                    i += 1
            nt = tuple(out)
            words[nt] = words.get(nt, 0) + c
            for p in zip(nt, nt[1:]):
                pair_n[p] += c
                pair_words[p].add(nt)
        pair_n.pop((l, r), None)
        pair_words.pop((l, r), None)
    return merges


# --- Misra-Gries heavy-hitter candidates (mergeable summaries) ---------------

def _mg_merge(summary: dict, counts, k: int) -> dict:
    """Merge a batch's exact value counts into a Misra-Gries summary of
    capacity ``k`` (Agarwal et al. 2013, "Mergeable Summaries": add the
    two summaries, subtract the (k+1)-th largest resulting count, drop
    non-positives). Preserves the MG guarantee: any item with true count
    > N/(k+1) over everything merged so far survives with
    ``summary count >= true count − N/(k+1)``.

    The loop is per DISTINCT word in the batch (value_counts is the
    vectorized part), not per token — bounded by batch vocabulary."""
    for w, c in counts.items():
        summary[w] = summary.get(w, 0) + int(c)
    if len(summary) > k:
        t = sorted(summary.values(), reverse=True)[k]  # (k+1)-th largest
        summary = {w: c - t for w, c in summary.items() if c > t}
    return summary


def mg_heavy_hitters(
    df: DataFrame, col: str = "word", phi: float = 0.02, k: int = 64
) -> DataFrame:
    """φ-heavy hitters over an unbounded-vocabulary token stream via
    per-partition Misra-Gries summaries + exact verification — the
    candidate-generation path ``sk3``'s CMS defers to.

    Correctness does NOT depend on partitioning or MG internals. With
    ``k ≥ 1/φ``: if an item kept count ≤ N_p/(k+1) in EVERY partition its
    global count is ≤ N/(k+1) < φN, so every φ-heavy item exceeds the MG
    retention floor in at least one partition and appears in that
    partition's summary. The candidate union (≤ partitions·k rows) is
    therefore a SUPERSET of the φ-heavy set; pass 2 counts candidates
    EXACTLY and filters ≥ φN — output = exactly the φ-heavy items, a
    deterministic, partition-independent (and SQL-expressible) answer.

    100 TB shape: pass 1 is mapInPandas with O(k) driver-free state per
    partition (summaries merge by the same rule across any sharding);
    the exact pass shuffles only rows matching the ≤ P·k broadcast
    candidate set; the stream length is one map-only count.

    Nulls are excluded from the STREAM itself (not just the output):
    pandas ``value_counts`` drops NaN and the equi-join drops null keys,
    so a null "item" could never be reported anyway — filtering up front
    keeps candidates, exact counts, and the total n over the same stream
    (otherwise shares use a null-inflated denominator; r8 ADVICE)."""
    import pandas as pd

    if k < 1.0 / phi:
        raise ValueError(f"k={k} must be >= 1/phi={1.0 / phi:.0f} for the "
                         "superset guarantee")
    toks = df.select(F.col(col).alias("word")).filter(F.col("word").isNotNull())

    def mg_partition(batches):
        summary: dict = {}
        for pdf in batches:
            summary = _mg_merge(summary, pdf["word"].value_counts(), k)
        yield pd.DataFrame(
            {"word": list(summary), "mg_count": list(summary.values())}
        )

    candidates = (
        toks.mapInPandas(mg_partition, "word string, mg_count long")
        .select("word")
        .distinct()
    )
    total = toks.agg(F.count(F.lit(1)).alias("n"))
    return (
        toks.join(F.broadcast(candidates), "word")
        .groupBy("word")
        .agg(F.count(F.lit(1)).alias("exact_n"))
        .crossJoin(F.broadcast(total))
        .filter(F.col("exact_n") >= F.lit(phi) * F.col("n"))
        .select(
            "word",
            "exact_n",
            F.round(F.col("exact_n") / F.col("n"), 6).alias("share"),
        )
    )


def wordpiece_encode(
    df: DataFrame,
    vocab: list[str],
    id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """WordPiece-style GREEDY longest-match subword encoding with a pinned
    vocabulary (Wu et al. 2016 / BERT's tokenizer family — the other
    production tokenizer class next to BPE; HuggingFace WordPiece uses the
    same longest-match-first walk). Per word, repeatedly take the LONGEST
    vocab piece matching at the cursor (length DESC, piece ASC — the
    equal-length tie can only be the identical string, the tie-break is
    belt-and-braces determinism), falling back to the single character when
    nothing matches — so segmentation is total and LOSSLESS (concat of
    pieces == word; no [UNK] information loss), which the roundtrip pytest
    pins.

    Returns per document: (id, n_words, n_pieces, fertility = pieces/word
    rounded 6dp, pieces_digest = md5 of the full in-order piece sequence,
    space-joined) — the digest pins the SEGMENTATION itself under the hash
    oracle, not just its statistics.

    Scale shape (the t14b/t15c tokenizer contract): the greedy walk runs
    once per DISTINCT word (Heaps-bounded table), as pure Column
    expressions — an ``aggregate`` fold over character positions whose step
    is a vocab-literal ``filter`` + ``element_at`` (no UDF, whole-stage
    codegen) — and the corpus only pays one posexplode + a broadcast join
    of the encoded distinct-word table + one per-doc aggregation. Encode
    cost is O(distinct_words × word_len × |vocab|), corpus-size-invariant;
    the corpus-scan side is O(tokens).
    """
    pieces = sorted(set(vocab), key=lambda p: (-len(p), p))
    piece_arr = F.array(
        *[
            F.struct(F.lit(p).alias("p"), F.lit(len(p)).alias("l"))
            for p in pieces
        ]
    )

    tok = df.select(
        F.col(id_col),
        F.posexplode(F.split(F.col(text_col), " ")).alias("pos", "word"),
    ).filter(F.length("word") > 0)
    dw = tok.select("word").distinct().withColumn("_pieces", piece_arr)

    def step(acc, i):
        # act only when the cursor sits at this character position —
        # positions consumed by an earlier multi-char piece no-op through
        matched = F.filter(
            F.col("_pieces"),
            lambda v: F.col("word").substr(acc["pos"], v["l"]) == v["p"],
        )
        # try_element_at: NULL (not an ANSI error) when nothing matched,
        # which is exactly the coalesce-to-fallback case
        best = F.try_element_at(matched, F.lit(1))  # length-DESC order → longest
        piece = F.coalesce(best["p"], F.col("word").substr(acc["pos"], F.lit(1)))
        return F.when(i != acc["pos"], acc).otherwise(
            F.struct(
                (acc["pos"] + F.length(piece)).cast("int").alias("pos"),
                F.concat(acc["ps"], F.array(piece)).alias("ps"),
            )
        )

    enc = dw.select(
        "word",
        F.aggregate(
            F.sequence(F.lit(1), F.length("word")),
            F.struct(
                F.lit(1).cast("int").alias("pos"),
                F.array().cast("array<string>").alias("ps"),
            ),
            step,
            lambda acc: acc["ps"],
        ).alias("ps"),
    ).select(
        "word",
        F.size("ps").cast("long").alias("np"),
        F.array_join("ps", " ").alias("pstr"),
    )

    # deliberate build-side choice (guide §3; see vocab_join_side): the
    # encode table is the vocabulary-sized side — broadcast it (default)
    # or shuffle-hash-build on it (SPARK_GRAFT_VOCAB_JOIN=shuffle_hash).
    # Un-hinted, the static planner broadcast the CORPUS token stream
    # (BuildLeft) — measured 1.34× slower at sf0.1 and a scale-killer.
    joined = tok.join(vocab_join_side(enc), "word")
    return joined.groupBy(F.col(id_col)).agg(
        F.count(F.lit(1)).alias("n_words"),
        F.sum("np").alias("n_pieces"),
        F.round(
            F.sum("np").cast("double") / F.count(F.lit(1)).cast("double"), 6
        ).alias("fertility"),
        F.md5(
            F.array_join(
                F.transform(
                    F.array_sort(F.collect_list(F.struct("pos", "pstr"))),
                    lambda s: s["pstr"],
                ),
                " ",
            )
        ).alias("pieces_digest"),
    )


UNIGRAM_FALLBACK_COST = 1500  # centi-nats for any single char outside the vocab


def unigram_encode(
    df: DataFrame,
    vocab: list[tuple[str, int]],
    id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """Unigram-LM subword encoding with a pinned vocabulary — the
    SentencePiece family (Kudo 2018): per word, the segmentation that
    MINIMIZES the summed piece costs, found by Viterbi dynamic
    programming (vs ``wordpiece_encode``'s greedy longest-match — the
    two genuinely differ: a cheap 2-piece split beats an expensive
    whole-word piece, which the pytest pins). Costs are INTEGER
    centi-nats (the production serving trick: integer-quantized scores
    make the DP exact, deterministic, and engine-portable — no float
    comparison ever happens), with every out-of-vocab single character
    available at ``UNIGRAM_FALLBACK_COST`` so segmentation is total and
    lossless. Tie-break at equal cost: longer piece, then lexicographic.

    Returns per document: (id, n_words, n_pieces, fertility,
    total_cost = Σ word Viterbi costs — an exact BIGINT, so the oracle
    compares the OPTIMUM ITSELF, pieces_digest = md5 of the in-order
    piece sequence, pinning the argmin segmentation too).

    Scale shape: identical to ``wordpiece_encode`` — the DP runs once
    per DISTINCT word as pure Column expressions (forward fold over
    character positions building the best-cost table, backward fold
    reading it; no UDF), the corpus pays one posexplode + broadcast
    join + one aggregation.
    """
    pieces = sorted({(p, int(c)) for p, c in vocab}, key=lambda x: (-len(x[0]), x[0]))
    maxp = max(len(p) for p, _ in pieces) + 2
    piece_arr = F.array(
        *[
            F.struct(
                F.lit(p).alias("p"),
                F.lit(len(p)).alias("l"),
                F.lit(int(c)).cast("long").alias("c"),
            )
            for p, c in pieces
        ]
    )

    tok = df.select(
        F.col(id_col),
        F.posexplode(F.split(F.col(text_col), " ")).alias("pos", "word"),
    ).filter(F.length("word") > 0)
    dw = tok.select("word").distinct().withColumn("_pieces", piece_arr)

    def forward_step(acc, i):
        # candidates: vocab pieces ending at position i (+ the fallback
        # char), each scored best[i - len] + cost; the winner struct's
        # field order (cost, maxp-len, piece) IS the tie-break
        cands = F.transform(
            F.filter(
                F.col("_pieces"),
                lambda v: (v["l"] <= i)
                & (F.col("word").substr(i - v["l"] + 1, v["l"]) == v["p"]),
            ),
            lambda v: F.struct(
                (F.element_at(acc, i - v["l"] + 1)["cost"] + v["c"]).alias("cost"),
                (F.lit(maxp) - v["l"]).alias("nl"),
                v["p"].alias("piece"),
                v["l"].alias("plen"),
            ),
        )
        fallback = F.struct(
            (
                F.element_at(acc, i)["cost"] + F.lit(UNIGRAM_FALLBACK_COST).cast("long")
            ).alias("cost"),
            F.lit(maxp - 1).alias("nl"),
            F.col("word").substr(i, F.lit(1)).alias("piece"),
            F.lit(1).alias("plen"),
        )
        win = F.array_min(F.concat(cands, F.array(fallback)))
        return F.concat(
            acc,
            F.array(
                F.struct(
                    win["cost"].alias("cost"),
                    win["plen"].alias("plen"),
                    win["piece"].alias("piece"),
                )
            ),
        )

    dp_init = F.array(
        F.struct(
            F.lit(0).cast("long").alias("cost"),
            F.lit(0).alias("plen"),
            F.lit("").alias("piece"),
        )
    )
    dw = dw.withColumn(
        "_dp",
        F.aggregate(F.sequence(F.lit(1), F.length("word")), dp_init, forward_step),
    )

    def back_step(acc, _):
        at = F.element_at(F.col("_dp"), acc["pos"] + 1)
        return F.when(acc["pos"] <= 0, acc).otherwise(
            F.struct(
                (acc["pos"] - at["plen"]).alias("pos"),
                F.concat(F.array(at["piece"]), acc["ps"]).alias("ps"),
            )
        )

    enc = dw.select(
        "word",
        F.element_at("_dp", F.length("word") + 1)["cost"].alias("wcost"),
        F.aggregate(
            F.sequence(F.lit(1), F.length("word")),
            F.struct(
                F.length("word").cast("int").alias("pos"),
                F.array().cast("array<string>").alias("ps"),
            ),
            back_step,
            lambda acc: acc["ps"],
        ).alias("ps"),
    ).select(
        "word",
        "wcost",
        F.size("ps").cast("long").alias("np"),
        F.array_join("ps", " ").alias("pstr"),
    )

    # deliberate build-side choice — same rationale and evidence as
    # wordpiece_encode (un-hinted = corpus-side broadcast, 1.46× slower);
    # see vocab_join_side. Production: unigram_encode_broadcast.
    joined = tok.join(vocab_join_side(enc), "word")
    return joined.groupBy(F.col(id_col)).agg(
        F.count(F.lit(1)).alias("n_words"),
        F.sum("np").alias("n_pieces"),
        F.round(
            F.sum("np").cast("double") / F.count(F.lit(1)).cast("double"), 6
        ).alias("fertility"),
        F.sum("wcost").alias("total_cost"),
        F.md5(
            F.array_join(
                F.transform(
                    F.array_sort(F.collect_list(F.struct("pos", "pstr"))),
                    lambda s: s["pstr"],
                ),
                " ",
            )
        ).alias("pieces_digest"),
    )


def _spark_round6(x: float) -> float:
    """Replicate Spark's ``F.round(double, 6)`` exactly: Java
    ``BigDecimal(double).setScale(6, HALF_UP)`` rounds the EXACT decimal
    expansion of the binary double half-up — Python's ``round()`` is
    banker's and would diverge on .5 boundaries. ``Decimal(float)`` is
    that same exact expansion."""
    from decimal import ROUND_HALF_UP, Decimal

    return float(Decimal(x).quantize(Decimal("0.000001"), rounding=ROUND_HALF_UP))


def wordpiece_encode_broadcast(
    df: DataFrame,
    vocab: list[str],
    id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """``wordpiece_encode`` for PRODUCTION-SIZE vocabularies: Arrow-batched
    ``mapInPandas`` with the vocabulary broadcast once in the closure —
    the t14b precedent (``bpe_encode_broadcast``). The Column-expression
    twin embeds |vocab| literal structs in the plan and its per-character
    fold scans all of them (O(word_len x |vocab|) per distinct word):
    fine and fully codegen'd at the <100-piece oracle vocab, a plan-bloat
    + constant-factor scale-killer at a BERT-scale 30k-piece vocab. Here
    the pieces live in per-LENGTH hash sets, so the greedy longest-match
    probe is O(word_len x n_distinct_lengths) hash lookups per word —
    and the per-word LRU cache makes the Zipf head free.

    Same semantics and the SAME output schema/values as
    ``wordpiece_encode`` (greedy longest-match, single-char fallback,
    lossless segmentation; per-doc digest over the in-order piece
    sequence) — equivalence is pytest-pinned on the shared vocab, and
    t20b shares t20's full DuckDB oracle. Fertility replicates Spark's
    HALF_UP ``round(x, 6)`` via exact-decimal quantization.

    Plan shape: map-only — one python runner stage, ZERO Exchange (the
    Column twin pays a distinct + broadcast join + final aggregation);
    per-doc outputs are complete within the batch, so nothing shuffles
    at any corpus size.
    """
    import hashlib
    from functools import lru_cache

    import pandas as pd

    by_len: dict[int, set[str]] = {}
    for p in set(vocab):
        by_len.setdefault(len(p), set()).add(p)
    lengths = sorted(by_len, reverse=True)
    id_field = df.schema[id_col]

    def encode_batches(batches):
        @lru_cache(maxsize=65536)
        def pieces_of(word: str) -> tuple[str, ...]:
            out, i, n = [], 0, len(word)
            while i < n:
                rem = n - i
                for ln in lengths:
                    if ln <= rem and word[i : i + ln] in by_len[ln]:
                        out.append(word[i : i + ln])
                        i += ln
                        break
                else:
                    out.append(word[i])  # single-char fallback
                    i += 1
            return tuple(out)

        for pdf in batches:
            ids, nw, npc, fert, dig = [], [], [], [], []
            for doc_id, txt in zip(pdf[id_col], pdf[text_col]):
                ws = [w for w in (txt or "").split(" ") if w]
                if not ws:
                    continue  # the Column twin's join drops wordless docs
                segs = [pieces_of(w) for w in ws]
                n_pieces = sum(len(s) for s in segs)
                ids.append(doc_id)
                nw.append(len(ws))
                npc.append(n_pieces)
                fert.append(_spark_round6(n_pieces / len(ws)))
                flat = " ".join(p for s in segs for p in s)
                dig.append(hashlib.md5(flat.encode("utf-8")).hexdigest())
            yield pd.DataFrame(
                {
                    id_col: pd.Series(ids, dtype=pdf[id_col].dtype),
                    "n_words": pd.Series(nw, dtype="int64"),
                    "n_pieces": pd.Series(npc, dtype="int64"),
                    "fertility": pd.Series(fert, dtype="float64"),
                    "pieces_digest": pd.Series(dig, dtype=object),
                }
            )

    schema = (
        f"{id_col} {id_field.dataType.simpleString()}, n_words long, "
        "n_pieces long, fertility double, pieces_digest string"
    )
    return df.select(id_col, text_col).mapInPandas(encode_batches, schema=schema)


def unigram_encode_broadcast(
    df: DataFrame,
    vocab: list[tuple[str, int]],
    id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """``unigram_encode`` for PRODUCTION-SIZE vocabularies: the same
    Arrow ``mapInPandas`` broadcast-vocab shape as
    ``wordpiece_encode_broadcast`` (t14b precedent), replacing the
    |vocab|-literal plan + O(|vocab|)-per-character candidate scan with
    a dict probe per (position, length) — O(word_len x max_piece_len)
    per distinct word, vocabulary size out of the cost entirely.

    Same semantics bit-for-bit: integer centi-nat Viterbi DP, the
    out-of-vocab single-char fallback at ``UNIGRAM_FALLBACK_COST``, and
    the IDENTICAL (cost ASC, length DESC, piece ASC) winner tie-break —
    the Python ``min`` key mirrors the Column twin's array_min struct
    field order (cost, maxp-len, piece). Equivalence is pytest-pinned
    and t21b shares t21's full DuckDB oracle; integer costs mean no
    float ever enters the DP in either engine.

    Plan shape: map-only, zero Exchange, per-word LRU cache.
    """
    import hashlib
    from functools import lru_cache

    import pandas as pd

    costs: dict[str, int] = {}
    for p, c in set((p, int(c)) for p, c in vocab):
        # duplicate pieces with different costs: keep the cheaper (the
        # Column twin's (cost, maxp-len, piece) min picks it too)
        if p not in costs or c < costs[p]:
            costs[p] = c
    maxp = max(len(p) for p in costs) + 2
    fb = int(UNIGRAM_FALLBACK_COST)
    id_field = df.schema[id_col]

    def encode_batches(batches):
        @lru_cache(maxsize=65536)
        def viterbi(word: str) -> tuple[int, tuple[str, ...]]:
            n = len(word)
            best = [0] + [0] * n  # best[i] = min cost of word[:i]
            back: list[tuple[int, str]] = [(0, "")] * (n + 1)
            for i in range(1, n + 1):
                # fallback candidate first; vocab pieces ending at i
                ch = word[i - 1]
                win = (best[i - 1] + fb, maxp - 1, ch, 1)
                for ln in range(1, min(maxp - 2, i) + 1):
                    piece = word[i - ln : i]
                    c = costs.get(piece)
                    if c is None:
                        continue
                    cand = (best[i - ln] + c, maxp - ln, piece, ln)
                    if cand[:3] < win[:3]:
                        win = cand
                best[i] = win[0]
                back[i] = (win[3], win[2])
            ps: list[str] = []
            i = n
            while i > 0:
                ln, piece = back[i]
                ps.append(piece)
                i -= ln
            ps.reverse()
            return best[n], tuple(ps)

        for pdf in batches:
            ids, nw, npc, fert, tc, dig = [], [], [], [], [], []
            for doc_id, txt in zip(pdf[id_col], pdf[text_col]):
                ws = [w for w in (txt or "").split(" ") if w]
                if not ws:
                    continue
                segs = [viterbi(w) for w in ws]
                n_pieces = sum(len(s) for _, s in segs)
                ids.append(doc_id)
                nw.append(len(ws))
                npc.append(n_pieces)
                fert.append(_spark_round6(n_pieces / len(ws)))
                tc.append(sum(c for c, _ in segs))
                flat = " ".join(p for _, s in segs for p in s)
                dig.append(hashlib.md5(flat.encode("utf-8")).hexdigest())
            yield pd.DataFrame(
                {
                    id_col: pd.Series(ids, dtype=pdf[id_col].dtype),
                    "n_words": pd.Series(nw, dtype="int64"),
                    "n_pieces": pd.Series(npc, dtype="int64"),
                    "fertility": pd.Series(fert, dtype="float64"),
                    "total_cost": pd.Series(tc, dtype="int64"),
                    "pieces_digest": pd.Series(dig, dtype=object),
                }
            )

    schema = (
        f"{id_col} {id_field.dataType.simpleString()}, n_words long, "
        "n_pieces long, fertility double, total_cost long, pieces_digest string"
    )
    return df.select(id_col, text_col).mapInPandas(encode_batches, schema=schema)
