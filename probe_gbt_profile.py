"""Per-phase wall breakdown of one deep softmax-GBT fit round (VERDICT r05
task 7: profile before optimizing). Runs 3 rounds of the emp_d14 config
with SPARK_GRAFT_GBT_PROFILE=1 and prints the phase timings."""

from __future__ import annotations

import os
import sys
import time

os.environ["SPARK_GRAFT_GBT_PROFILE"] = "1"

from pyspark.ml import Pipeline

from consumer_loans_analysis_spark.pipeline.loans import EMPLOYEE_NO_MAP, build_processing_pipeline
from consumer_loans_analysis_spark.pipeline.model_imputer import ModelImputer
from consumer_loans_analysis_spark.pipeline.stages import BucketOrdinalEncoder
from consumer_loans_analysis_spark.session import get_spark
from consumer_loans_analysis_spark.sources.readers import read_loans_csv

TARGET = "EMPLOYEE_NO_NUM"


def main() -> None:
    depth = int(sys.argv[1]) if len(sys.argv) > 1 else 14
    iters = int(sys.argv[2]) if len(sys.argv) > 2 else 3
    spark = get_spark("probe_gbt_profile", extra_configs={"spark.sql.shuffle.partitions": "8"})
    train = read_loans_csv(spark, "/root/reference/data/orig_train.csv")
    base = build_processing_pipeline(with_model_imputers=False)
    prep = Pipeline(
        stages=base.getStages()[:-1]
        + [BucketOrdinalEncoder(inputCol="EMPLOYEE_NO", outputCol=TARGET, mapping=EMPLOYEE_NO_MAP)]
    ).fit(train)
    ptrain = prep.transform(train).cache()
    ptrain.count()
    imp = ModelImputer(
        targetCol=TARGET, sentinel=None, excludePrefixes=["ECONOMIC_SECTOR_"],
        classifierFamily="gbt_softmax", maxDepth=depth, maxIter=iters, stepSize=0.2,
    )
    t0 = time.perf_counter()
    imp.fit(ptrain)
    print(f"total fit {time.perf_counter() - t0:.1f}s for {iters} rounds at depth {depth}")


if __name__ == "__main__":
    main()
