"""Layer-3 ML harness tests (SURVEY §2.8 M1-M7, §5.2 Tier 3).

Harness mechanics are tested on a small synthetic separable dataset (fast);
full quality parity vs BASELINE.md (NB recall 0.85 / ROC-AUC 0.836) is
exercised in the slower smoke path of test_loans_pipeline and was validated
end-to-end: NB valid recall(class 1) = 0.848, hard ROC-AUC = 0.828.
"""

from __future__ import annotations

import math

import pytest
from pyspark.ml.classification import LogisticRegression, NaiveBayes
from pyspark.ml.linalg import Vectors

from consumer_loans_analysis_spark.ml.cv import add_fold, cross_validate, cv_summary
from consumer_loans_analysis_spark.ml.ensemble import SoftVotingEnsemble
from consumer_loans_analysis_spark.ml.metrics import (
    binary_metrics,
    classification_report,
    confusion_counts,
)
from consumer_loans_analysis_spark.ml.tuning import optimize, sample_params
from consumer_loans_analysis_spark.ml.zoo import UniformRandomClassifier, model_zoo


@pytest.fixture(scope="module")
def toy(spark):
    """Linearly separable 2-feature data, 200 rows, slight noise."""
    rows = []
    for i in range(200):
        x0 = (i % 20) / 10.0 - 1.0
        x1 = ((i * 7) % 13) / 6.5 - 1.0
        label = 1.0 if (x0 + x1 > 0) != (i % 19 == 0) else 0.0
        rows.append((Vectors.dense([x0, x1]), label))
    return spark.createDataFrame(rows, ["features", "label"]).cache()


def test_confusion_and_binary_metrics(spark):
    pred = spark.createDataFrame(
        [(1.0, 1.0)] * 6 + [(0.0, 0.0)] * 8 + [(1.0, 0.0)] * 2 + [(0.0, 1.0)] * 4,
        ["label", "prediction"],
    )
    cm = confusion_counts(pred)
    assert cm == {(1.0, 1.0): 6, (0.0, 0.0): 8, (1.0, 0.0): 2, (0.0, 1.0): 4}
    m = binary_metrics(pred)
    assert m["accuracy"] == pytest.approx(14 / 20)
    assert m["precision"] == pytest.approx(6 / 10)
    assert m["recall"] == pytest.approx(6 / 8)
    assert m["f1"] == pytest.approx(2 * 0.6 * 0.75 / (0.6 + 0.75))
    # hard-pred AUC = (1 + TPR - FPR)/2, reference convention modeling.py:315-319
    assert m["roc_auc_hard"] == pytest.approx((1 + 6 / 8 - 4 / 12) / 2)


def test_classification_report_shape(spark):
    pred = spark.createDataFrame(
        [(0.0, 0.0), (0.0, 1.0), (1.0, 1.0), (1.0, 1.0)], ["label", "prediction"]
    )
    rep = classification_report(pred)
    assert rep[1.0]["recall"] == pytest.approx(1.0)
    assert rep[0.0]["support"] == 2
    assert rep["accuracy"] == pytest.approx(0.75)


def test_fold_assignment_deterministic_and_balanced(toy):
    a = add_fold(toy, 6).groupBy("_fold").count().collect()
    b = add_fold(toy.repartition(7), 6).groupBy("_fold").count().collect()
    # same assignment under a different partitioning
    assert {(r["_fold"], r["count"]) for r in a} == {(r["_fold"], r["count"]) for r in b}
    counts = [r["count"] for r in a]
    assert len(counts) == 6 and min(counts) > 10


def test_fold_assignment_portable_mode(toy, spark):
    # portable (md5) mode: deterministic under repartitioning, matches a
    # hand computation of md5-prefix % k, and stays balanced
    import hashlib

    df = spark.range(0, 500).withColumnRenamed("id", "k")
    a = add_fold(df, 5, cols=["k"], seed=42, method="portable")
    b = add_fold(df.repartition(7), 5, cols=["k"], seed=42, method="portable")
    rows_a = {r["k"]: r["_fold"] for r in a.collect()}
    rows_b = {r["k"]: r["_fold"] for r in b.collect()}
    assert rows_a == rows_b
    for k in (0, 1, 123, 499):
        expect = int(hashlib.md5(f"42:{k}".encode()).hexdigest()[:8], 16) % 5
        assert rows_a[k] == expect
    counts = a.groupBy("_fold").count().collect()
    assert len(counts) == 5 and min(r["count"] for r in counts) > 50


def test_group_fold_purity_and_leakage_audit(spark, sf_dir):
    """m3q2: every customer's orders land in ONE fold (the GroupKFold
    guarantee); c2: content-fingerprint folds put every dup pair in one
    fold (straddle 0) while doc_id folds straddle, demonstrating the
    leakage the audit exists to catch."""
    from pyspark.sql import functions as F

    from consumer_loans_analysis_spark.plans import registry

    registry.load_all()
    folds = registry.QUERIES["m3q2_group_fold_assignment"](spark, sf_dir)
    impure = (
        folds.groupBy("o_custkey")
        .agg(F.countDistinct("fold").alias("nf"))
        .filter(F.col("nf") > 1)
    )
    assert impure.count() == 0
    audit = registry.QUERIES["c2_split_leakage_audit"](spark, sf_dir).head()
    assert audit["n_dup_pairs"] > 0          # the corpus has planted dups
    assert audit["straddle_fp_fold"] == 0    # content folds: leak-free
    assert audit["straddle_id_fold"] > 0     # id folds: leaky, as audited


def test_cross_validate_beats_dummy(toy):
    lr = cv_summary(cross_validate(lambda: LogisticRegression(), toy, k=4))
    dummy = cv_summary(
        cross_validate(lambda: UniformRandomClassifier(seed=1).fit(toy) and UniformRandomClassifier(seed=1), toy, k=4)
    )
    assert lr["f1"] > 0.8 > dummy["f1"]
    assert lr["accuracy"] > dummy["accuracy"]


def test_cv_parallelism_matches_serial(toy):
    serial = cross_validate(lambda: LogisticRegression(), toy, k=3, parallelism=1)
    threaded = cross_validate(lambda: LogisticRegression(), toy, k=3, parallelism=3)
    for s, t in zip(serial, threaded):
        assert s["f1"] == pytest.approx(t["f1"])


def test_sample_params_respects_space():
    import numpy as np

    rng = np.random.default_rng(0)
    space = {"a": ("int", 1, 5), "b": ("loguniform", 0.01, 1.0), "c": ("uniform", -1, 1)}
    for _ in range(50):
        p = sample_params(space, rng)
        assert 1 <= p["a"] <= 5 and isinstance(p["a"], int)
        assert 0.01 <= p["b"] <= 1.0
        assert -1 <= p["c"] <= 1


def test_successive_halving_beats_random_at_equal_budget():
    """At the same total budget (full-evaluation units), SHA screens ~eta×
    more configs than random search and must land at least as close to the
    optimum on a smooth synthetic objective."""
    import numpy as np

    from consumer_loans_analysis_spark.ml.tuning import successive_halving

    space = {"x": ("uniform", 0.0, 1.0), "y": ("uniform", 0.0, 1.0)}

    def true_value(p):
        return -((p["x"] - 0.7) ** 2) - (p["y"] - 0.3) ** 2

    def evaluate(p, fraction):
        # low-fidelity rungs see a deterministic pseudo-noise that vanishes
        # at full fraction — the SHA assumption (cheap evals are noisy but
        # rank-informative)
        noise = 0.05 * (1.0 - fraction) * math.sin(1000.0 * p["x"] + 77.0 * p["y"])
        return true_value(p) + noise

    sha = successive_halving(evaluate, space, n_configs=16, eta=4, seed=7)
    # SHA budget: 16/16 + 4/4 + 1 = 3 full-eval units → random gets 3 trials
    sha_units = sum(t["fraction"] for t in sha["trials"])
    n_random = math.ceil(sha_units)
    rng = np.random.default_rng(7)
    rand_best = max(
        true_value(sample_params(space, rng)) for _ in range(n_random)
    )
    assert true_value(sha["best_params"]) >= rand_best
    assert sha["best_value"] == pytest.approx(true_value(sha["best_params"]))
    # rung bookkeeping: fractions ascend to 1.0, survivors shrink by ~eta
    assert [r["fraction"] for r in sha["rungs"]] == [1 / 16, 1 / 4, 1.0]
    assert [r["n"] for r in sha["rungs"]] == [16, 4, 1]


def test_sha_min_fraction_floors_rungs():
    """min_fraction clamps the early-rung resource (the high-variance-
    estimator guard) without changing survivor bookkeeping."""
    from consumer_loans_analysis_spark.ml.tuning import successive_halving

    space = {"x": ("uniform", 0.0, 1.0)}
    sha = successive_halving(
        lambda p, f: -((p["x"] - 0.5) ** 2), space,
        n_configs=16, eta=4, seed=7, min_fraction=0.25,
    )
    assert [r["fraction"] for r in sha["rungs"]] == [0.25, 0.25, 1.0]
    assert [r["n"] for r in sha["rungs"]] == [16, 4, 1]


def test_tpe_beats_random_at_equal_budget():
    """TPE-lite must land at least as close to the optimum as seeded
    random search with the SAME number of objective evaluations, on a
    smooth fixed synthetic objective (the reference tunes with optuna
    TPE — modeling.py:213-233; this is the substitution's quality gate)."""
    import numpy as np

    from consumer_loans_analysis_spark.ml.tuning import sample_params, tpe_search

    space = {
        "x": ("uniform", 0.0, 1.0),
        "y": ("loguniform", 0.01, 10.0),
        "k": ("int", 1, 20),
        "c": ("choice", ["a", "b", "c"]),
    }

    def true_value(p):
        return (
            -((p["x"] - 0.7) ** 2)
            - (math.log(p["y"]) - math.log(0.5)) ** 2 / 10.0
            - (p["k"] - 13) ** 2 / 400.0
            + (0.1 if p["c"] == "b" else 0.0)
        )

    n_trials = 40
    tpe = tpe_search(true_value, space, n_trials=n_trials, n_startup=10, seed=11)
    rng = np.random.default_rng(11)
    rand_best = max(true_value(sample_params(space, rng)) for _ in range(n_trials))
    assert tpe["best_value"] >= rand_best
    # every proposed config stays inside the declared space
    for t in tpe["trials"]:
        p = t["params"]
        assert 0.0 <= p["x"] <= 1.0 and 0.01 <= p["y"] <= 10.0
        assert 1 <= p["k"] <= 20 and isinstance(p["k"], int)
        assert p["c"] in ("a", "b", "c")


def test_optimize_improves_over_worst_trial(toy):
    result = optimize(
        lambda **kw: LogisticRegression(**kw),
        {"regParam": ("loguniform", 1e-6, 10.0)},
        toy,
        n_trials=4,
        cv_folds=3,
    )
    values = [t["value"] for t in result["trials"]]
    assert result["best_value"] == max(values)
    assert result["best_params"] is not None


def test_soft_voting_ensemble(toy):
    models = [
        NaiveBayes(modelType="gaussian").fit(toy),
        LogisticRegression().fit(toy),
    ]
    out = SoftVotingEnsemble(models).transform(toy)
    assert "probability_pos" in out.columns and "prediction" in out.columns
    m = binary_metrics(out)
    assert m["accuracy"] > 0.8
    probs = [r["probability_pos"] for r in out.limit(50).collect()]
    assert all(0.0 <= p <= 1.0 for p in probs)


def test_model_zoo_instantiable(spark):
    # MLlib estimator __init__ needs an active SparkContext — request the
    # fixture so this test also passes when selected alone
    zoo = model_zoo(mlp_layers=[2, 4, 2])
    for name, factory in zoo.items():
        est = factory()
        assert est is not None, name


def test_feature_importances_named_table(spark, toy):
    from pyspark.ml.classification import RandomForestClassifier

    from consumer_loans_analysis_spark.ml.importance import (
        feature_importances,
        mean_abs_contribution,
    )

    model = RandomForestClassifier(numTrees=5, maxDepth=3, seed=1).fit(toy)
    imp = feature_importances(model, ["x0", "x1"], spark, top_k=2).collect()
    assert len(imp) == 2
    assert {r["feature"] for r in imp} == {"x0", "x1"}
    assert imp[0]["importance"] >= imp[1]["importance"] >= 0.0
    total = sum(r["importance"] for r in imp)
    assert total == pytest.approx(1.0, abs=1e-9)

    contribs = spark.createDataFrame(
        [(0.5, -2.0, 0.1), (-0.5, 1.0, 0.0)], ["a", "b", "c"]
    )
    top = mean_abs_contribution(contribs, ["a", "b", "c"], top_k=2).collect()
    assert [r["feature"] for r in top] == ["b", "a"]
    assert top[0]["mean_abs"] == pytest.approx(1.5)


def test_tree_contributions_sum_to_prediction(spark, toy):
    """Saabas invariant: bias + Σ per-feature contributions == the model's
    P(class 1) exactly, per row (reference per-row SHAP surface M9)."""
    from pyspark.ml.classification import RandomForestClassifier
    from pyspark.ml.functions import vector_to_array

    from consumer_loans_analysis_spark.ml.importance import (
        contributions_table,
        mean_abs_contribution,
    )

    from pyspark.sql import functions as F

    model = RandomForestClassifier(numTrees=7, maxDepth=4, seed=3).fit(toy)
    names = ["x0", "x1"]
    out = contributions_table(model, toy, names)
    scored = model.transform(toy.select("features")).select(
        vector_to_array(F.col("probability"))[1].alias("p1_model")
    )
    rows = out.collect()
    model_p1 = [r["p1_model"] for r in scored.collect()]
    assert len(rows) > 0
    for r, p1 in zip(rows, model_p1):
        total = r["bias"] + sum(r[f"contrib_{n}"] for n in names)
        assert total == pytest.approx(r["pred_contrib"], abs=1e-12)
        assert r["pred_contrib"] == pytest.approx(p1, abs=1e-9)
    # global ranking over the per-row contributions (reference's |SHAP| mean)
    top = mean_abs_contribution(
        out, [f"contrib_{n}" for n in names], top_k=2
    ).collect()
    assert len(top) == 2 and top[0]["mean_abs"] >= top[1]["mean_abs"]


def test_imputer_eval_beats_mode_baseline(spark):
    """E8 evaluation protocol (processing.py:188-233): hide present values,
    recover, score micro-F1 vs the mode floor. Small/fast imputer config —
    the full-size run (0.425 vs 0.279 on ECONOMIC_SECTOR) is recorded in
    BASELINE.md terms in COVERAGE.md."""
    from consumer_loans_analysis_spark.ml.imputer_eval import evaluate_imputer, mode_baseline
    from consumer_loans_analysis_spark.pipeline.model_imputer import ModelImputer
    from consumer_loans_analysis_spark.sources.readers import read_loans_csv

    train = read_loans_csv(spark, "/root/reference/data/orig_train.csv").cache()
    valid = read_loans_csv(spark, "/root/reference/data/orig_valid.csv").cache()
    imp = ModelImputer(targetCol="EDUCATION", sentinel="Missing", numTrees=15, maxDepth=8)
    fitted = imp.fit(train)
    model_f1 = evaluate_imputer(fitted, valid, "EDUCATION")
    floor = mode_baseline(train, valid, "EDUCATION")
    assert 0.0 < floor < 1.0
    assert model_f1 > floor, (model_f1, floor)


def test_imputer_classifier_families(spark):
    """classifierFamily swaps the inner model (rf | lr | mlp) behind the
    same impute semantics: every family recovers hidden EDUCATION values
    above the mode floor, and unknown families raise."""
    import pytest as _pytest

    from consumer_loans_analysis_spark.ml.imputer_eval import evaluate_imputer, mode_baseline
    from consumer_loans_analysis_spark.pipeline.model_imputer import ModelImputer
    from consumer_loans_analysis_spark.sources.readers import read_loans_csv

    train = read_loans_csv(spark, "/root/reference/data/orig_train.csv").cache()
    valid = read_loans_csv(spark, "/root/reference/data/orig_valid.csv").cache()
    floor = mode_baseline(train, valid, "EDUCATION")
    for family, extra in [
        ("lr", {"regParam": 0.01, "maxIter": 40}),
        ("mlp", {"hiddenLayers": [32], "maxIter": 120}),
        ("gbt_ovr", {"maxDepth": 3, "maxIter": 8}),
    ]:
        imp = ModelImputer(
            targetCol="EDUCATION", sentinel="Missing",
            classifierFamily=family, **extra,
        )
        f1 = evaluate_imputer(imp.fit(train), valid, "EDUCATION")
        assert f1 > floor, (family, f1, floor)
    with _pytest.raises(ValueError, match="classifierFamily"):
        ModelImputer(targetCol="EDUCATION", classifierFamily="nope").fit(train)


def test_imputer_forwards_dart_and_colsample(spark):
    """ModelImputer forwards dropoutRate / featureSubsetStrategy to the
    gbt_softmax family (the r5 tuning waves depend on this): the fitted
    inner SoftmaxGBTModel must carry DART weights, and the imputer still
    recovers hidden values above the mode floor."""
    import json

    from consumer_loans_analysis_spark.ml.imputer_eval import evaluate_imputer, mode_baseline
    from consumer_loans_analysis_spark.pipeline.model_imputer import ModelImputer
    from consumer_loans_analysis_spark.sources.readers import read_loans_csv

    train = read_loans_csv(spark, "/root/reference/data/orig_train.csv").cache()
    valid = read_loans_csv(spark, "/root/reference/data/orig_valid.csv").cache()
    imp = ModelImputer(
        targetCol="EDUCATION", sentinel="Missing",
        classifierFamily="gbt_softmax", maxDepth=3, maxIter=6,
        stepSize=0.3, dropoutRate=0.5, featureSubsetStrategy="0.5",
    )
    fitted = imp.fit(train)
    sgbt = fitted.inner.stages[-1]
    st = json.loads(sgbt.getOrDefault(sgbt.modelJson))
    assert len(st["weights"]) == 6  # DART reached the inner estimator
    floor = mode_baseline(train, valid, "EDUCATION")
    assert evaluate_imputer(fitted, valid, "EDUCATION") > floor


def test_tree_shap_matches_hand_computed_shapley():
    """Fixture tree where Saabas and TreeSHAP provably differ, with the
    exact Shapley values computed by hand.

    Tree (AND function): root splits x0<=0.5 (cover 4) -> leaf 0 (cover 2)
    | node x1<=0.5 (cover 2) -> leaf 0 (cover 1) | leaf 1 (cover 1).
    For x=(1,1): v({})=1/4, v({0})=1/2, v({1})=1/2, v({0,1})=1 ->
    phi = (0.375, 0.375). Saabas walks the path and gives (0.25, 0.5) —
    the shallow-split bias TreeSHAP corrects."""
    from consumer_loans_analysis_spark.ml.importance import _tree_shap_single

    tr = {
        "feat": [0, -1, 1, -1, -1],
        "thr": [0.5, 0.0, 0.5, 0.0, 0.0],
        "left": [1, -1, 3, -1, -1],
        "right": [2, -1, 4, -1, -1],
        "value": [0.25, 0.0, 0.5, 0.0, 1.0],
        "cats": [None] * 5,
        "cover": [4.0, 2.0, 2.0, 1.0, 1.0],
    }
    phi, ev = _tree_shap_single(tr, [1.0, 1.0], 2)
    assert ev == pytest.approx(0.25)
    assert phi[0] == pytest.approx(0.375)
    assert phi[1] == pytest.approx(0.375)
    # saabas on the same tree: (0.5-0.25, 1.0-0.5) = (0.25, 0.5) — differs
    assert ev + sum(phi) == pytest.approx(1.0)  # efficiency: == f(x)

    phi2, _ = _tree_shap_single(tr, [0.0, 1.0], 2)
    # v({0}) = 0, v({1}) = 1/2, v({0,1}) = 0 -> phi = (-0.375, 0.125)
    assert phi2[0] == pytest.approx(-0.375)
    assert phi2[1] == pytest.approx(0.125)
    assert 0.25 + sum(phi2) == pytest.approx(0.0)


def test_tree_shap_sums_to_model_probability(spark, toy):
    """TreeSHAP over a real MLlib forest: bias + Σ phi must equal the
    model's own P(class 1) INDEPENDENTLY computed by model.transform —
    per row, exactly (the efficiency axiom, end to end)."""
    from pyspark.ml.classification import RandomForestClassifier
    from pyspark.ml.functions import vector_to_array
    from pyspark.sql import functions as F

    from consumer_loans_analysis_spark.ml.importance import (
        tree_contributions,
        tree_shap_contributions,
    )

    model = RandomForestClassifier(numTrees=5, maxDepth=3, seed=3).fit(toy)
    feats = vector_to_array(F.col("features"))
    out = toy.select(
        tree_shap_contributions(model, feats, ["x0", "x1"]).alias("s"),
        tree_contributions(model, feats, ["x0", "x1"]).alias("sb"),
        vector_to_array(F.col("features")).alias("x"),
    )
    scored = model.transform(toy.select("features")).select(
        vector_to_array(F.col("probability"))[1].alias("p1")
    )
    rows = out.collect()
    p1s = [r["p1"] for r in scored.collect()]
    diff_seen = False
    for r, p1 in zip(rows, p1s):
        s = r["s"]
        assert s["bias"] + sum(s["contrib"]) == pytest.approx(s["pred"], abs=1e-12)
        assert s["pred"] == pytest.approx(p1, abs=1e-9)
        # Saabas predicts the same total but attributes it differently
        assert r["sb"]["pred"] == pytest.approx(p1, abs=1e-9)
        if any(
            abs(a - b) > 1e-6 for a, b in zip(s["contrib"], r["sb"]["contrib"])
        ):
            diff_seen = True
    assert diff_seen, "expected Saabas and TreeSHAP to differ on some row"


def test_calibrated_classifier_improves_nb_calibration(spark, toy):
    """Isotonic OOF calibration: (a) monotone map preserves ranking, so
    ROC is unchanged; (b) calibrated probabilities have lower Brier score
    than raw NB's overconfident outputs on held-out data; (c) plugs into
    SoftVotingEnsemble via probability_pos."""
    from pyspark.ml.classification import NaiveBayes, RandomForestClassifier
    from pyspark.ml.functions import vector_to_array
    from pyspark.sql import functions as F

    from consumer_loans_analysis_spark.ml.calibration import CalibratedClassifier
    from consumer_loans_analysis_spark.ml.ensemble import SoftVotingEnsemble

    train, valid = toy.randomSplit([0.7, 0.3], seed=5)
    nb = NaiveBayes(modelType="gaussian")
    cal = CalibratedClassifier(nb, n_folds=4, seed=11).fit(train)
    out = cal.transform(valid)
    assert {"probability_pos", "prediction"} <= set(out.columns)
    raw_p = nb.fit(train).transform(valid).withColumn(
        "p_raw", vector_to_array(F.col("probability"))[1]
    )
    brier_raw = raw_p.agg(
        F.avg(F.pow(F.col("p_raw") - F.col("label"), 2))
    ).head()[0]
    brier_cal = out.agg(
        F.avg(F.pow(F.col("probability_pos") - F.col("label"), 2))
    ).head()[0]
    assert brier_cal <= brier_raw + 1e-9
    # calibrated probabilities stay in [0, 1]
    mm = out.agg(
        F.min("probability_pos").alias("lo"), F.max("probability_pos").alias("hi")
    ).head()
    assert 0.0 <= mm["lo"] and mm["hi"] <= 1.0
    # mixed ensemble: calibrated NB + raw RF
    rf = RandomForestClassifier(numTrees=5, maxDepth=3, seed=1).fit(train)
    ens = SoftVotingEnsemble([cal, rf])
    eout = ens.transform(valid)
    assert {"probability_pos", "prediction"} <= set(eout.columns)
    assert eout.count() == valid.count()


def test_softmax_gbt_learns_and_roundtrips(spark, tmp_path):
    """SoftmaxGBTClassifier: (a) beats the majority baseline on a
    nonlinear 3-class problem; (b) scoresCol probabilities are a valid
    softmax; (c) save/load round-trip preserves predictions exactly
    (JSON-Param state, no MLlib objects)."""
    from pyspark.ml.feature import VectorAssembler
    from pyspark.sql import functions as F

    from consumer_loans_analysis_spark.ml.softmax_gbt import (
        SoftmaxGBTClassifier,
        SoftmaxGBTModel,
    )

    df = (
        spark.range(2000)
        .select(
            (F.rand(1) * 4 - 2).alias("x0"),
            (F.rand(2) * 4 - 2).alias("x1"),
        )
        .withColumn(
            "label",
            F.when(F.col("x0") * F.col("x1") > 0.5, 2.0)
            .when(F.col("x0") + F.col("x1") < -1, 1.0)
            .otherwise(0.0),
        )
    )
    data = VectorAssembler(inputCols=["x0", "x1"], outputCol="features").transform(df)
    train, valid = data.randomSplit([0.8, 0.2], seed=7)
    model = SoftmaxGBTClassifier(
        maxIter=8, maxDepth=4, stepSize=0.3, scoresCol="probs"
    ).fit(train)
    pred = model.transform(valid).cache()
    acc = pred.agg(
        F.avg((F.col("prediction") == F.col("label")).cast("double"))
    ).head()[0]
    majority = (
        valid.groupBy("label").count().agg(F.max("count")).head()[0] / valid.count()
    )
    assert acc > majority + 0.15, (acc, majority)
    # probabilities: valid simplex, argmax consistent with prediction
    row = pred.select(
        F.aggregate("probs", F.lit(0.0), lambda a, x: a + x).alias("z"),
        F.array_max("probs").alias("mx"),
        (F.array_position("probs", F.array_max("probs")) - 1).cast("double").alias("am"),
        "prediction",
    ).head()
    assert row["z"] == pytest.approx(1.0, abs=1e-9)
    assert row["am"] == row["prediction"]
    # round-trip
    path = str(tmp_path / "sgbt")
    model.write().overwrite().save(path)
    loaded = SoftmaxGBTModel.load(path)
    a = pred.select("prediction").collect()
    b = loaded.transform(valid).select("prediction").collect()
    assert a == b
    pred.unpersist()


def test_weighted_voting_and_probs_array_member(toy):
    """SoftVotingEnsemble extensions: (a) a SoftmaxGBTModel member votes
    through its plain `probs` array column; (b) `weights` blend member
    probabilities as a convex combination — weight 1 on a member
    reproduces that member alone, and a 50/50 weighting equals the
    unweighted average."""
    from pyspark.ml.functions import vector_to_array
    from pyspark.sql import functions as F

    from consumer_loans_analysis_spark.ml.softmax_gbt import SoftmaxGBTClassifier

    lr = LogisticRegression().fit(toy)
    sgbt = SoftmaxGBTClassifier(
        maxIter=3, maxDepth=2, scoresCol="probs", seed=3
    ).fit(toy)

    out = SoftVotingEnsemble([lr, sgbt]).transform(toy)
    assert {"probability_pos", "prediction"} <= set(out.columns)
    assert "probs" not in out.columns  # member plumbing column is dropped

    # weight 1/0 reproduces the lr member's own P(1) exactly
    solo = SoftVotingEnsemble([lr, sgbt], weights=[1.0, 0.0]).transform(toy)
    lr_p = lr.transform(toy).select(
        vector_to_array(F.col("probability"))[1].alias("p")
    )
    diff = (
        solo.select(F.col("probability_pos").alias("p"))
        .join(lr_p, on="p", how="left_anti")
        .count()
    )
    assert diff == 0

    # equal weights == unweighted average
    eq = SoftVotingEnsemble([lr, sgbt], weights=[2.0, 2.0]).transform(toy)
    pair = list(zip(
        [r["probability_pos"] for r in out.collect()],
        [r["probability_pos"] for r in eq.collect()],
    ))
    assert all(abs(a - b) < 1e-12 for a, b in pair)

    with pytest.raises(ValueError):
        SoftVotingEnsemble([lr], weights=[1.0, 2.0])


def test_walk_batch_bit_equal_to_scalar_walk():
    """The vectorized level-order descent must route every row to the SAME
    terminal node as the scalar reference `_walk`, including categorical
    splits, boundary-equal thresholds (x == thr goes left), and rows that
    reach leaves at different depths — and the vectorized score
    accumulation must be bit-equal to the scalar loop."""
    import numpy as np

    from consumer_loans_analysis_spark.ml.softmax_gbt import (
        _tree_arrays,
        _walk,
        _walk_batch,
    )

    # hand-built unbalanced tree: node0 continuous split on f0 (thr 0.5),
    # node1 categorical split on f1 ({1.0, 3.0}), node2 leaf;
    # node1's children: node3 continuous on f0 (thr -1.0), node4 leaf.
    tr = {
        "feat": [0, 1, -1, 0, -1, -1, -1],
        "thr": [0.5, 0.0, 0.0, -1.0, 0.0, 0.0, 0.0],
        "left": [1, 3, -1, 5, -1, -1, -1],
        "right": [2, 4, -1, 6, -1, -1, -1],
        "cats": [None, {1.0, 3.0}, None, None, None, None, None],
        "value": [0.0, 0.0, 7.0, 0.0, 4.0, 1.5, -2.5],
        "cover": [10.0] * 7,
    }
    rng = np.random.default_rng(7)
    X = rng.normal(size=(500, 2))
    # force boundary + categorical coverage
    X[:50, 0] = 0.5          # x == thr → left, exactly like the scalar <=
    X[50:100, 1] = 3.0       # in the cat set
    X[100:150, 1] = 2.0      # not in the cat set
    arrs = _tree_arrays(tr)
    got = _walk_batch(arrs, X)
    want = np.array([_walk(tr, x) for x in X])
    assert (got == want).all()

    # scores: vectorized gather bit-equal to the scalar accumulation
    import pandas as pd

    from consumer_loans_analysis_spark.ml import softmax_gbt as sg

    rounds = [[tr, tr], [tr, tr]]
    priors, lr = [-0.3, -1.2], 0.17
    arrs_r = [[_tree_arrays(t) for t in trees] for trees in rounds]
    Fm = np.tile(np.asarray(priors), (X.shape[0], 1))
    for trees in arrs_r:
        for k, ta in enumerate(trees):
            Fm[:, k] += lr * ta[6][_walk_batch(ta, X)]
    scalar = []
    for x in X:
        f = np.asarray(priors).copy()
        for trees in rounds:
            for k, t in enumerate(trees):
                f[k] += lr * t["value"][_walk(t, x)]
        scalar.append(f)
    assert (Fm == np.stack(scalar)).all()
    assert sg is not None and pd is not None


def test_softmax_gbt_prefix_truncation_equals_shorter_fit(spark):
    """withMaxRounds(n) on a long fit must equal a fresh maxIter=n fit
    bit-for-bit (boosting is prefix-nested; fits are seed-deterministic) —
    the one-fit saturation-curve idiom used by the tuning waves."""
    import random

    from pyspark.ml.linalg import Vectors

    from consumer_loans_analysis_spark.ml.softmax_gbt import SoftmaxGBTClassifier

    rng = random.Random(3)
    rows = []
    for _ in range(400):
        a, b = rng.gauss(0, 1), rng.gauss(0, 1)
        label = float((a + 0.5 * b > 0) + (a - b > 1))
        rows.append((Vectors.dense([a, b, a * b]), label))
    df = spark.createDataFrame(rows, ["features", "label"]).cache()
    long_fit = SoftmaxGBTClassifier(maxIter=5, maxDepth=3, scoresCol="probs").fit(df)
    short_fit = SoftmaxGBTClassifier(maxIter=3, maxDepth=3, scoresCol="probs").fit(df)
    trunc = long_fit.withMaxRounds(3)
    got = trunc.transform(df).select("prediction", "probs").collect()
    want = short_fit.transform(df).select("prediction", "probs").collect()
    assert [r["prediction"] for r in got] == [r["prediction"] for r in want]
    for g, w in zip(got, want):
        assert list(g["probs"]) == list(w["probs"])


def test_softmax_gbt_reg_lambda(spark):
    """regLambda (XGBoost L2 leaf term): 0.0 must reproduce the
    unregularized model bit-for-bit; a positive lambda must shrink leaf
    gammas toward zero (same trees — splits don't depend on lambda, only
    the Newton leaf values do)."""
    import json
    import random

    from pyspark.ml.linalg import Vectors

    from consumer_loans_analysis_spark.ml.softmax_gbt import SoftmaxGBTClassifier

    rng = random.Random(5)
    rows = []
    for _ in range(300):
        a, b = rng.gauss(0, 1), rng.gauss(0, 1)
        rows.append((Vectors.dense([a, b]), float(a + b > 0)))
    df = spark.createDataFrame(rows, ["features", "label"]).cache()
    base = SoftmaxGBTClassifier(maxIter=3, maxDepth=3).fit(df)
    zero = SoftmaxGBTClassifier(maxIter=3, maxDepth=3, regLambda=0.0).fit(df)
    reg = SoftmaxGBTClassifier(maxIter=3, maxDepth=3, regLambda=25.0).fit(df)
    assert base.getOrDefault(base.modelJson) == zero.getOrDefault(zero.modelJson)

    def leaf_l1(m):
        st = json.loads(m.getOrDefault(m.modelJson))
        return sum(
            sum(abs(v) for v in tr["value"]) for trees in st["rounds"] for tr in trees
        )

    assert leaf_l1(reg) < leaf_l1(base)


def _sgbt_toy(spark, n=400, seed=3):
    import random

    from pyspark.ml.linalg import Vectors

    rng = random.Random(seed)
    rows = []
    for _ in range(n):
        a, b = rng.gauss(0, 1), rng.gauss(0, 1)
        label = float((a + 0.5 * b > 0) + (a - b > 1))
        rows.append((Vectors.dense([a, b, a * b]), label))
    return spark.createDataFrame(rows, ["features", "label"]).cache()


def test_softmax_gbt_dart(spark):
    """DART dropout (XGBoost normalize_type='tree' weights):

    (a) dropoutRate=0.0 keeps the serialized state byte-identical to the
        pre-DART format (no 'weights' key — old persisted models and the
        plain-boosting bit-equality tests are untouched);
    (b) a DART fit records per-round weights that actually deviate from
        uniform shrinkage, and total weight mass is conserved by the
        tree-normalization identity (k·k/(k+lr) + 1/(k+lr) = k — each
        dropout round preserves the dropped mass while adding lr-worth);
    (c) withMaxRounds(n) on a DART fit equals a fresh maxIter=n DART fit
        bit-for-bit — the weight_history snapshot restores the rescaled
        weights as they stood at round n (the dropout draw at round m
        depends only on (seed, m), so prefixes are nested)."""
    import json

    from consumer_loans_analysis_spark.ml.softmax_gbt import SoftmaxGBTClassifier

    df = _sgbt_toy(spark)
    plain = SoftmaxGBTClassifier(maxIter=3, maxDepth=3).fit(df)
    st_plain = json.loads(plain.getOrDefault(plain.modelJson))
    assert "weights" not in st_plain and "weight_history" not in st_plain

    dart = SoftmaxGBTClassifier(
        maxIter=6, maxDepth=3, stepSize=0.2, dropoutRate=0.6, scoresCol="probs"
    ).fit(df)
    st = json.loads(dart.getOrDefault(dart.modelJson))
    assert len(st["weights"]) == 6
    assert len(st["weight_history"]) == 6
    assert st["weight_history"][-1] == st["weights"]
    # with rate 0.6 over 6 rounds some draw must have fired → weights
    # cannot all equal the uniform shrinkage
    assert any(abs(w - 0.2) > 1e-12 for w in st["weights"])

    short = SoftmaxGBTClassifier(
        maxIter=4, maxDepth=3, stepSize=0.2, dropoutRate=0.6, scoresCol="probs"
    ).fit(df)
    trunc = dart.withMaxRounds(4)
    got = trunc.transform(df).select("prediction", "probs").collect()
    want = short.transform(df).select("prediction", "probs").collect()
    assert [r["prediction"] for r in got] == [r["prediction"] for r in want]
    for g, w in zip(got, want):
        assert list(g["probs"]) == list(w["probs"])


def test_softmax_gbt_feature_subset(spark):
    """featureSubsetStrategy routes tree fits through a single-tree
    RandomForestRegressor: with strategy '1' every internal node sees one
    random feature, so across rounds the split-feature set must differ
    from the greedy all-features fit; the model still learns (beats
    majority) and prefix truncation stays exact (fit is seed-
    deterministic per round)."""
    from pyspark.sql import functions as F

    from consumer_loans_analysis_spark.ml.softmax_gbt import SoftmaxGBTClassifier

    df = _sgbt_toy(spark)
    model = SoftmaxGBTClassifier(
        maxIter=6, maxDepth=3, stepSize=0.3, featureSubsetStrategy="1"
    ).fit(df)
    pred = model.transform(df)
    acc = pred.agg(
        F.avg((F.col("prediction") == F.col("label")).cast("double"))
    ).head()[0]
    majority = df.groupBy("label").count().agg(F.max("count")).head()[0] / df.count()
    assert acc > majority + 0.1, (acc, majority)

    short = SoftmaxGBTClassifier(
        maxIter=3, maxDepth=3, stepSize=0.3, featureSubsetStrategy="1"
    ).fit(df)
    assert (
        model.withMaxRounds(3).transform(df).select("prediction").collect()
        == short.transform(df).select("prediction").collect()
    )


# --- engine-native Gaussian NB (var_smoothing; reference final model) ----


def _gnb_fixture(spark):
    rows = [
        (Vectors.dense([1.0, 10.0]), 0.0),
        (Vectors.dense([2.0, 11.0]), 0.0),
        (Vectors.dense([3.0, 9.0]), 0.0),
        (Vectors.dense([6.0, 2.0]), 1.0),
        (Vectors.dense([7.0, 4.0]), 1.0),
        (Vectors.dense([8.5, 3.0]), 1.0),
    ]
    return spark.createDataFrame(rows, ["features", "label"])


def _gnb_expected(xs, vs):
    """sklearn-convention Gaussian NB posteriors, pure Python: ddof=0
    variances, epsilon = vs * max_i Var_global(x_i) added to every
    variance at scoring time."""
    data = {
        0.0: [[1.0, 10.0], [2.0, 11.0], [3.0, 9.0]],
        1.0: [[6.0, 2.0], [7.0, 4.0], [8.5, 3.0]],
    }
    n_tot = sum(len(v) for v in data.values())
    all_rows = [r for v in data.values() for r in v]
    d = 2
    g_var = []
    for i in range(d):
        col = [r[i] for r in all_rows]
        m = sum(col) / len(col)
        g_var.append(sum((x - m) ** 2 for x in col) / len(col))
    eps = vs * max(g_var)
    stats = {}
    for c, rowsc in data.items():
        mus, var = [], []
        for i in range(d):
            col = [r[i] for r in rowsc]
            m = sum(col) / len(col)
            mus.append(m)
            var.append(sum((x - m) ** 2 for x in col) / len(col) + eps)
        stats[c] = (math.log(len(rowsc) / n_tot), mus, var)
    out = []
    for x in xs:
        lls = {}
        for c, (lp, mus, var) in stats.items():
            ll = lp
            for i in range(d):
                ll += -0.5 * (math.log(2 * math.pi * var[i])) \
                      - (x[i] - mus[i]) ** 2 / (2 * var[i])
            lls[c] = ll
        mx = max(lls.values())
        z = sum(math.exp(v - mx) for v in lls.values())
        out.append({c: math.exp(v - mx) / z for c, v in lls.items()})
    return out


def test_gaussian_nb_matches_hand_computation(spark):
    from consumer_loans_analysis_spark.ml.gaussian_nb import GaussianNBClassifier

    df = _gnb_fixture(spark)
    vs = 1e-3
    model = GaussianNBClassifier(varSmoothing=vs).fit(df)
    got = model.transform(df).select("label", "prediction", "probs").collect()
    xs = [[1.0, 10.0], [2.0, 11.0], [3.0, 9.0], [6.0, 2.0], [7.0, 4.0], [8.5, 3.0]]
    want = _gnb_expected(xs, vs)
    for row, exp in zip(got, want):
        assert row["prediction"] == row["label"]
        assert abs(row["probs"][0] - exp[0.0]) < 1e-9
        assert abs(row["probs"][1] - exp[1.0]) < 1e-9
        assert abs(sum(row["probs"]) - 1.0) < 1e-12


def test_gaussian_nb_with_var_smoothing_no_refit(spark):
    """withVarSmoothing(ε) must equal a fresh fit at ε (stats are
    ε-independent), and a large ε must actually change the posteriors."""
    from consumer_loans_analysis_spark.ml.gaussian_nb import GaussianNBClassifier

    df = _gnb_fixture(spark)
    base = GaussianNBClassifier(varSmoothing=1e-9).fit(df)
    refit = GaussianNBClassifier(varSmoothing=0.5).fit(df)
    swapped = base.withVarSmoothing(0.5)
    a = swapped.transform(df).select("probs").collect()
    b = refit.transform(df).select("probs").collect()
    for ra, rb in zip(a, b):
        assert list(ra["probs"]) == list(rb["probs"])
    c = base.transform(df).select("probs").collect()
    assert any(abs(ra["probs"][0] - rc["probs"][0]) > 1e-6 for ra, rc in zip(a, c))


def test_gaussian_nb_toy_accuracy_and_persistence(spark, toy, tmp_path):
    from consumer_loans_analysis_spark.ml.gaussian_nb import (
        GaussianNBClassifier,
        GaussianNBModel,
    )

    model = GaussianNBClassifier(varSmoothing=1e-6).fit(toy)
    pred = model.transform(toy)
    m = binary_metrics(pred)
    assert m["accuracy"] > 0.8, m
    path = str(tmp_path / "gnb")
    model.save(path)
    loaded = GaussianNBModel.load(path)
    got = loaded.transform(toy).select("probs").collect()
    want = model.transform(toy).select("probs").collect()
    for g, w in zip(got, want):
        assert list(g["probs"]) == list(w["probs"])


def test_extract_tree_from_save_bit_equal_to_py4j_walk(spark):
    """The parquet-persistence tree extractor must reproduce the py4j
    recursive walk EXACTLY -- every array, including categorical split
    sets, covers, and full-precision thresholds/predictions -- on both
    the DecisionTreeRegressor path and the single-tree
    RandomForestRegressor (featureSubsetStrategy) path."""
    import random

    from pyspark.ml.feature import StringIndexer, VectorAssembler
    from pyspark.ml.regression import DecisionTreeRegressor, RandomForestRegressor

    from consumer_loans_analysis_spark.ml.importance import _extract_tree
    from consumer_loans_analysis_spark.ml.softmax_gbt import _extract_tree_from_save

    rng = random.Random(42)
    rows = [
        (
            rng.uniform(-3, 3),
            rng.choice(["a", "b", "c", "d", "e"]),
            rng.uniform(0, 1),
        )
        for _ in range(800)
    ]
    # label depends on BOTH the numeric and the categorical column so the
    # fitted tree contains continuous AND categorical splits
    data = [
        (x, c, 2.5 * x + {"a": 0, "b": 3, "c": -2, "d": 1, "e": 5}[c] + 0.1 * n, n)
        for x, c, n in rows
    ]
    df = spark.createDataFrame(data, "x double, c string, label double, noise double")
    idx = StringIndexer(inputCol="c", outputCol="c_idx").fit(df)
    assembled = VectorAssembler(
        inputCols=["x", "c_idx", "noise"], outputCol="features"
    ).transform(idx.transform(df))

    dt = DecisionTreeRegressor(
        featuresCol="features", labelCol="label", maxDepth=8, seed=1
    ).fit(assembled)
    rf = RandomForestRegressor(
        featuresCol="features", labelCol="label", numTrees=1, bootstrap=False,
        subsamplingRate=1.0, featureSubsetStrategy="0.9", maxDepth=8, seed=2,
    ).fit(assembled)

    # degenerate single-leaf tree (constant label — the shape late boosting
    # rounds produce when residuals vanish): n=1 NodeData row, no splits
    from pyspark.sql import functions as F

    stump = DecisionTreeRegressor(
        featuresCol="features", labelCol="label", maxDepth=3, seed=3
    ).fit(assembled.select("features", F.lit(2.5).alias("label")))

    for mod in (dt, rf.trees[0], stump):
        want = _extract_tree(mod._call_java("rootNode"), 0, False)
        got = _extract_tree_from_save(mod)
        assert got.keys() == want.keys()
        for key in want:
            assert got[key] == want[key], key
    # sanity: the main fixture actually exercised a categorical split
    want = _extract_tree(dt._call_java("rootNode"), 0, False)
    assert any(c is not None for c in want["cats"]), "no categorical split in fixture"
    assert _extract_tree_from_save(stump)["left"] == [-1], "stump fixture split"


def test_rff_kernel_approximation_and_persistence(spark, tmp_path):
    """z(x)ᵀz(y) must approximate exp(−γ‖x−y‖²) (Rahimi–Recht) — checked
    pairwise on a small random set at D=4096 where the O(1/√D) error is
    well under 0.05 — plus determinism (same seed ⇒ identical output) and
    a save/load round-trip through the JSON-Param persistence."""
    import random

    import numpy as np

    from consumer_loans_analysis_spark.ml.rff import RandomFourierFeatures

    rng = random.Random(7)
    pts = [[rng.uniform(-1, 1) for _ in range(6)] for _ in range(12)]
    df = spark.createDataFrame([(i, v) for i, v in enumerate(pts)],
                               "id long, features array<double>")

    gamma = 0.5
    est = RandomFourierFeatures(nComponents=4096, gamma=gamma, seed=3)
    model = est.fit(df)
    assert abs(model.gamma - gamma) < 1e-12

    from pyspark.ml.functions import vector_to_array

    out = {
        r["id"]: np.asarray(r["z"])
        for r in model.transform(df).select(
            "id", vector_to_array("rff_features").alias("z")
        ).collect()
    }
    X = np.asarray(pts)
    for i in range(len(pts)):
        for j in range(i + 1, len(pts)):
            want = np.exp(-gamma * np.sum((X[i] - X[j]) ** 2))
            got = float(out[i] @ out[j])
            assert abs(got - want) < 0.05, (i, j, got, want)

    # determinism: a fresh fit with the same seed produces the same map
    out2 = {
        r["id"]: np.asarray(r["z"])
        for r in est.fit(df).transform(df).select(
            "id", vector_to_array("rff_features").alias("z")
        ).collect()
    }
    assert all(np.array_equal(out[i], out2[i]) for i in out)

    # persistence round-trip
    path = str(tmp_path / "rff_model")
    model.write().overwrite().save(path)
    from consumer_loans_analysis_spark.ml.rff import RandomFourierFeaturesModel

    loaded = RandomFourierFeaturesModel.load(path)
    out3 = {
        r["id"]: np.asarray(r["z"])
        for r in loaded.transform(df).select(
            "id", vector_to_array("rff_features").alias("z")
        ).collect()
    }
    assert all(np.array_equal(out[i], out3[i]) for i in out)


def test_rff_gamma_scale_matches_sklearn_convention(spark):
    """gamma=0.0 resolves to 1/(d·Var[X]) with the variance over ALL
    matrix entries — sklearn's gamma='scale'. Checked against a direct
    numpy computation."""
    import numpy as np

    from consumer_loans_analysis_spark.ml.rff import RandomFourierFeatures

    rng = np.random.default_rng(11)
    X = rng.normal(2.0, 3.0, size=(40, 5))
    df = spark.createDataFrame(
        [(v.tolist(),) for v in X], "features array<double>"
    )
    model = RandomFourierFeatures(nComponents=8, gamma=0.0, seed=1).fit(df)
    want = 1.0 / (X.shape[1] * X.var())
    assert abs(model.gamma - want) / want < 1e-9


def test_pin_layout_is_layout_invariant(spark):
    """pin_layout must place identical rows in identical (partition, order)
    slots regardless of the input frame's incoming layout — the property
    that makes seeded MLlib fits replayable (VERDICT r06 task 5)."""
    from consumer_loans_analysis_spark.ml.cv import pin_layout

    rows = [(i, f"v{i % 7}", float(i) * 0.5) for i in range(500)]
    df1 = spark.createDataFrame(rows, "id long, s string, x double").repartition(3)
    df2 = (
        spark.createDataFrame(list(reversed(rows)), "id long, s string, x double")
        .repartition(11, "s")
    )

    def layout(df):
        return (
            pin_layout(df, parts=4)
            .rdd.mapPartitionsWithIndex(
                lambda pid, it: [(pid, [tuple(r) for r in it])]
            )
            .collect()
        )

    l1 = dict(layout(df1))
    l2 = dict(layout(df2))
    assert l1 == l2
    assert sum(len(v) for v in l1.values()) == 500


def test_rbf_svc_rff_zoo_entry_learns_toy(spark, toy):
    """The rbf-SVC stand-in (RFF → LinearSVC pipeline) must fit/transform
    through the standard zoo contract and beat chance comfortably on the
    linearly separable toy set (an rbf approximation subsumes linear)."""
    from consumer_loans_analysis_spark.ml.metrics import binary_metrics
    from consumer_loans_analysis_spark.ml.zoo import model_zoo

    model = model_zoo()["rbf_svc_rff"]().fit(toy)
    m = binary_metrics(model.transform(toy))
    assert m["micro_f1"] > 0.85, m


def test_early_stopping_equals_truncated_fit(spark):
    """OOF early stopping (r9): (a) a fit with earlyStoppingRounds stops
    before maxIter on an overfit-prone config and truncates to the best
    OOF round; (b) the result is BIT-IDENTICAL to fitting the same params
    with maxIter = rounds_kept and no stopping (prefix-nesting — the
    truncation is exact, not approximate); (c) the param-contract errors
    fire."""
    import pytest as _pytest
    from pyspark.ml.feature import VectorAssembler
    from pyspark.sql import functions as F

    from consumer_loans_analysis_spark.ml.softmax_gbt import SoftmaxGBTClassifier

    df = (
        spark.range(400)
        .select(
            (F.rand(1) * 4 - 2).alias("x0"),
            (F.rand(2) * 4 - 2).alias("x1"),
        )
        .withColumn(
            "label",
            # noisy labels -> holdout deviance bottoms out early
            F.when(F.rand(3) < 0.25, (F.floor(F.rand(4) * 3)).cast("double"))
            .when(F.col("x0") * F.col("x1") > 0.5, 2.0)
            .when(F.col("x0") + F.col("x1") < -1, 1.0)
            .otherwise(0.0),
        )
    )
    data = VectorAssembler(inputCols=["x0", "x1"], outputCol="features").transform(df)
    common = dict(maxDepth=4, stepSize=0.6, seed=11, validationFraction=0.3)
    a = SoftmaxGBTClassifier(maxIter=20, earlyStoppingRounds=2, **common).fit(data)
    kept = a._oof_rounds_kept
    assert kept < 20, "expected the noisy fixture to stop early"
    assert kept == a._oof_best_round + 1
    b = SoftmaxGBTClassifier(maxIter=kept, earlyStoppingRounds=0, **common).fit(data)
    assert a.getOrDefault(a.modelJson) == b.getOrDefault(b.modelJson)

    with _pytest.raises(ValueError, match="validationFraction"):
        SoftmaxGBTClassifier(earlyStoppingRounds=3).fit(data)
    with _pytest.raises(ValueError, match="DART"):
        SoftmaxGBTClassifier(
            validationFraction=0.2, dropoutRate=0.5
        ).fit(data)


def test_early_stopping_error_metric(spark):
    """validationMetric='error' stops on holdout error rate instead of
    deviance (the deviance/accuracy divergence fix — measured on the ECON
    imputer, deviance bottoms ~24 rounds while accuracy still climbs).
    Same exactness contract: truncation equals the shorter plain fit."""
    import pytest as _pytest
    from pyspark.ml.feature import VectorAssembler
    from pyspark.sql import functions as F

    from consumer_loans_analysis_spark.ml.softmax_gbt import SoftmaxGBTClassifier

    df = (
        spark.range(400)
        .select((F.rand(1) * 4 - 2).alias("x0"), (F.rand(2) * 4 - 2).alias("x1"))
        .withColumn(
            "label",
            F.when(F.rand(3) < 0.25, (F.floor(F.rand(4) * 3)).cast("double"))
            .when(F.col("x0") * F.col("x1") > 0.5, 2.0)
            .when(F.col("x0") + F.col("x1") < -1, 1.0)
            .otherwise(0.0),
        )
    )
    data = VectorAssembler(inputCols=["x0", "x1"], outputCol="features").transform(df)
    common = dict(maxDepth=4, stepSize=0.6, seed=11, validationFraction=0.3,
                  validationMetric="error")
    a = SoftmaxGBTClassifier(maxIter=15, earlyStoppingRounds=3, **common).fit(data)
    kept = a._oof_rounds_kept
    assert 1 <= kept <= 15
    b = SoftmaxGBTClassifier(maxIter=kept, earlyStoppingRounds=0, **common).fit(data)
    assert a.getOrDefault(a.modelJson) == b.getOrDefault(b.modelJson)

    with _pytest.raises(ValueError, match="deviance \\| error"):
        SoftmaxGBTClassifier(
            validationFraction=0.2, validationMetric="f1"
        ).fit(data)
