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


def test_driver_rotation_orders_unchecked_then_stalest(tmp_path, monkeypatch):
    """The self-served sample rotation (r10 semantics): never-cleanly-
    driver-checked keys order first (registry order preserved), then
    checked keys by STALENESS — oldest clean check first, registry order
    as tie-break — and the result is always a permutation."""
    import json

    keys = [f"q{i}" for i in range(147)]
    ok = {"hash_match": True}

    # no CORRECTNESS files at all -> identity order
    monkeypatch.setattr(entry_mod, "_CORRECTNESS_DIR", str(tmp_path))
    assert entry_mod._driver_rotation(keys) == keys

    # one round cleanly checked the first 50 -> the other 97 move to the front
    (tmp_path / "CORRECTNESS_r01.json").write_text(
        json.dumps({k: ok for k in keys[:50]})
    )
    rot = entry_mod._driver_rotation(keys)
    assert sorted(rot) == sorted(keys)
    assert rot[:97] == keys[50:147]          # unchecked first, order kept
    assert rot[97:] == keys[:50]             # checked tail, registry order

    # two more rounds cleanly checked everything -> stalest (earliest
    # round) first: r01's block, then r02's, then r03's
    (tmp_path / "CORRECTNESS_r02.json").write_text(
        json.dumps({k: ok for k in keys[50:100]})
    )
    (tmp_path / "CORRECTNESS_r03.json").write_text(
        json.dumps({k: ok for k in keys[100:]})
    )
    rot3 = entry_mod._driver_rotation(keys)
    assert rot3 == keys  # r01 block stalest -> front, registry order overall

    # a LATER re-check refreshes staleness: r04 re-checks r01's block, so
    # r02's block becomes the stalest and moves to the front
    (tmp_path / "CORRECTNESS_r04.json").write_text(
        json.dumps({k: ok for k in keys[:50]})
    )
    rot4 = entry_mod._driver_rotation(keys)
    assert rot4 == keys[50:] + keys[:50]

    # unreadable file is skipped entirely — order unchanged
    (tmp_path / "CORRECTNESS_r05.json").write_text("{not json")
    assert entry_mod._driver_rotation(keys) == rot4


def test_driver_rotation_failures_reenter_front(tmp_path, monkeypatch):
    """A failed or no_oracle record does NOT count as checked — the query
    re-enters the front of the next driver sample (r7 ADVICE)."""
    import json

    keys = [f"q{i}" for i in range(10)]
    monkeypatch.setattr(entry_mod, "_CORRECTNESS_DIR", str(tmp_path))

    recs = {k: {"hash_match": True} for k in keys[:5]}
    recs["q1"] = {"hash_match": False, "err": None}            # hash mismatch
    recs["q3"] = {"hash_match": None, "err": "no_oracle"}      # rows-only
    (tmp_path / "CORRECTNESS_r01.json").write_text(json.dumps(recs))

    rot = entry_mod._driver_rotation(keys)
    assert sorted(rot) == sorted(keys)
    # unchecked front: q1 and q3 (non-clean) + q5..q9 (never recorded)
    assert rot[:7] == ["q1", "q3"] + keys[5:]
    # clean tail: all checked in the same round -> registry order
    assert rot[7:] == ["q0", "q2", "q4"]

    # a later clean pass promotes the query back to the checked tail
    (tmp_path / "CORRECTNESS_r02.json").write_text(
        json.dumps({"q1": {"hash_match": True}})
    )
    rot2 = entry_mod._driver_rotation(keys)
    assert rot2[:6] == ["q3"] + keys[5:]
    assert set(rot2[6:]) == {"q0", "q1", "q2", "q4"}


def test_driver_rotation_pass_then_fail_reenters_front(tmp_path, monkeypatch):
    """LAST-RECORD-WINS (r8 ADVICE): a query that passed cleanly in an
    early round but whose most recent driver record is a failure must NOT
    stay hidden in the checked tail — the later failure un-marks it."""
    import json

    keys = [f"q{i}" for i in range(10)]
    monkeypatch.setattr(entry_mod, "_CORRECTNESS_DIR", str(tmp_path))

    (tmp_path / "CORRECTNESS_r01.json").write_text(
        json.dumps({k: {"hash_match": True} for k in keys})
    )
    (tmp_path / "CORRECTNESS_r02.json").write_text(
        json.dumps({"q4": {"hash_match": False, "err": None}})
    )
    rot = entry_mod._driver_rotation(keys)
    assert rot[0] == "q4"  # regressed query re-enters the front
    # checked tail: all last-checked in the same round -> registry order
    assert rot[1:] == [k for k in keys if k != "q4"]


def test_driver_rotation_full_coverage_every_three_rounds(tmp_path, monkeypatch):
    """With all 150 registry queries checked, staleness ordering must put
    every query inside the driver's first-50 sample at least once every
    ceil(150/50) = 3 consecutive rounds — the staleness clock the r8
    VERDICT asked to pin (r10: ordering is oldest-checked-first, which
    makes the 3-round coverage guarantee structural: a query can only
    wait while ≤ 100 strictly-staler queries exist)."""
    import json

    keys = [f"q{i:03d}" for i in range(150)]
    monkeypatch.setattr(entry_mod, "_CORRECTNESS_DIR", str(tmp_path))
    (tmp_path / "CORRECTNESS_r01.json").write_text(
        json.dumps({k: {"hash_match": True} for k in keys})
    )
    samples = []
    for rnd in range(2, 8):
        samples.append(set(entry_mod._driver_rotation(keys)[:50]))
        # each round records a clean re-check of exactly its sample
        (tmp_path / f"CORRECTNESS_r{rnd:02d}.json").write_text(
            json.dumps({k: {"hash_match": True} for k in samples[-1]})
        )
    for i in range(len(samples) - 2):
        assert samples[i] | samples[i + 1] | samples[i + 2] == set(keys), i
    # consecutive samples are disjoint (fresh checks are never stalest)
    assert samples[0] & samples[1] == set()


def test_driver_rotation_edge_cases(tmp_path, monkeypatch):
    """Staleness-ordering edges: empty key list; repeated full re-checks
    keep registry order (equal staleness everywhere); a partial newest
    record demotes exactly its keys."""
    import json

    monkeypatch.setattr(entry_mod, "_CORRECTNESS_DIR", str(tmp_path))
    assert entry_mod._driver_rotation([]) == []

    keys = [f"q{i}" for i in range(7)]
    for i in range(4):
        (tmp_path / f"CORRECTNESS_r0{i + 1}.json").write_text(
            json.dumps({k: {"hash_match": True} for k in keys})
        )
    # every key last-checked in the same (latest) round -> registry order
    assert entry_mod._driver_rotation(keys) == keys
    # a newer record re-checking q2/q5 demotes them behind the rest
    (tmp_path / "CORRECTNESS_r05.json").write_text(
        json.dumps({k: {"hash_match": True} for k in ("q2", "q5")})
    )
    rot = entry_mod._driver_rotation(keys)
    assert rot == ["q0", "q1", "q3", "q4", "q6", "q2", "q5"]
