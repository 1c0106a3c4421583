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


def test_driver_rotation_orders_unchecked_first(tmp_path, monkeypatch):
    """The self-served sample rotation: never-driver-checked keys order
    first (registry order preserved), checked keys follow rotated by 50
    per recorded round, and the result is always a permutation."""
    import json

    keys = [f"q{i}" for i in range(147)]

    # no CORRECTNESS files at all -> identity order
    monkeypatch.setattr(entry_mod.os.path, "dirname", lambda _: str(tmp_path))
    assert entry_mod._driver_rotation(keys) == keys

    # one round checked the first 50 -> the other 97 move to the front
    (tmp_path / "CORRECTNESS_r01.json").write_text(
        json.dumps({k: {} for k in keys[:50]})
    )
    rot = entry_mod._driver_rotation(keys)
    assert sorted(rot) == sorted(keys)
    assert rot[:97] == keys[50:147]          # unchecked first, order kept
    assert set(rot[97:]) == set(keys[:50])   # checked tail
    # checked tail rotated by 1 file * 50 mod 50 == 0 -> original order
    assert rot[97:] == keys[:50]

    # two rounds checked everything -> pure 50-per-round cycling
    (tmp_path / "CORRECTNESS_r02.json").write_text(
        json.dumps({k: {} for k in keys[50:100]})
    )
    (tmp_path / "CORRECTNESS_r03.json").write_text(
        json.dumps({k: {} for k in keys[100:]})
    )
    rot3 = entry_mod._driver_rotation(keys)
    assert sorted(rot3) == sorted(keys)
    off = (3 * 50) % 147
    assert rot3 == keys[off:] + keys[:off]

    # unreadable file is skipped, not fatal
    (tmp_path / "CORRECTNESS_r04.json").write_text("{not json")
    rot4 = entry_mod._driver_rotation(keys)
    assert sorted(rot4) == sorted(keys)
