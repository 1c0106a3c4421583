"""consumer_loans_analysis_spark — a PySpark-native analytics engine.

A brand-new engine with the query and data-processing capabilities of the
reference repo Michael-Pytel/Consumer-Loans-Analysis, re-expressed Spark-first:

- ``sources``   — typed readers/writers (CSV with explicit schemas, Parquet).
- ``functions`` — relational operators (profiles, crosstabs, quantiles, corr,
  mutual information, top-k, unpivot) as thin, tested DataFrame functions.
- ``operators`` — scale extensions: dedup (exact / MinHash-LSH / SimHash /
  n-gram Jaccard / embedding cosine), similarity search, text analysis,
  multimodal column plumbing, as-of & range joins.
- ``pipeline``  — custom MLlib Estimator/Transformer stages mirroring the
  reference's sklearn pipeline (winsorize, sentinel-mode impute, ordinal &
  one-hot encode, scale, model-based impute, corr-max combiner).
- ``ml``        — model zoo, multi-metric CV harness, metrics, ensembling.
- ``streaming`` — Structured Streaming surface over the events table.

Everything is DataFrame/Catalyst-first: fit-state is collected once and baked
into plans as literals, so transform paths stay shuffle-free and
whole-stage-codegen friendly at 100 TB scale.
"""

from consumer_loans_analysis_spark.session import get_spark

__all__ = ["get_spark"]
__version__ = "0.1.0"
