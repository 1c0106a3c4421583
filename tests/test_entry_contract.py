"""Smoke tests for the driver contract (__spark_entry__.py)."""

from __future__ import annotations

import __spark_entry__ as entry_mod


def test_entry_runs(spark):
    df = entry_mod.entry(spark)
    rows = df.collect()
    assert len(rows) > 0
    assert "sum_qty" in df.columns


def test_contract_shapes(spark):
    q = entry_mod.queries()
    o = entry_mod.oracle_sql()
    assert len(q) >= 60
    assert set(o) <= set(q)
    for sql in o.values():
        assert isinstance(sql, str) and "SELECT" in sql.upper()


def test_queries_run_at_sf0001(spark, sf_dir):
    # every registered query must at least execute on the smallest SF
    q = entry_mod.queries()
    for name in ["q1_pricing_summary", "a4_value_counts", "w1_topn_per_group",
                 "d2_ngram_jaccard_pairs", "sim1_cosine_topk", "t3_lang_id"]:
        df = q[name](spark, sf_dir)
        assert df.columns, name
        df.limit(5).collect()
