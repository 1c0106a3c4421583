"""S3 persistence: PipelineModel save/load round-trip for every custom
stage (SURVEY §2.1 S3, §7.2 step 7 — the joblib.dump/load equivalent).

Round-trip contract: `load(save(model)).transform(df)` must equal
`model.transform(df)` exactly (the learned state is JSON-encoded Params,
so no float drift is acceptable).
"""

from __future__ import annotations

import pytest
from pyspark.ml import PipelineModel
from pyspark.sql import functions as F

from consumer_loans_analysis_spark.pipeline.loans import build_processing_pipeline
from consumer_loans_analysis_spark.pipeline.model_imputer import ModelImputer, ModelImputerModel
from consumer_loans_analysis_spark.sources.readers import read_loans_csv

ORIG_TRAIN = "/root/reference/data/orig_train.csv"
ORIG_VALID = "/root/reference/data/orig_valid.csv"


@pytest.fixture(scope="module")
def loans(spark):
    train = read_loans_csv(spark, ORIG_TRAIN).cache()
    valid = read_loans_csv(spark, ORIG_VALID).cache()
    return train, valid


def _frame_equal(a, b):
    pa = a.toPandas().sort_index(axis=1)
    pb = b.toPandas().sort_index(axis=1)
    assert list(pa.columns) == list(pb.columns)
    key = [c for c in pa.columns]
    pa = pa.sort_values(key).reset_index(drop=True)
    pb = pb.sort_values(key).reset_index(drop=True)
    assert pa.equals(pb)


def test_processing_pipeline_roundtrip(spark, loans, tmp_path):
    train, valid = loans
    fitted = build_processing_pipeline(with_model_imputers=False).fit(train)
    path = str(tmp_path / "proc_pipe")
    fitted.write().overwrite().save(path)
    loaded = PipelineModel.load(path)
    assert [type(s).__name__ for s in loaded.stages] == [
        type(s).__name__ for s in fitted.stages
    ]
    _frame_equal(fitted.transform(valid), loaded.transform(valid))


def test_model_imputer_roundtrip(spark, loans, tmp_path):
    train, valid = loans
    # small fast imputer: predict AREA from the raw numeric columns
    imp = ModelImputer(targetCol="AREA", sentinel="Missing", numTrees=5, maxDepth=3)
    model = imp.fit(train)
    path = str(tmp_path / "imp")
    model.write().overwrite().save(path)
    loaded = ModelImputerModel.load(path)
    a = model.transform(valid).select("AREA")
    b = loaded.transform(valid).select("AREA")
    _frame_equal(a, b)
    # no sentinel survives
    assert b.filter(F.col("AREA") == "Missing").count() == 0
