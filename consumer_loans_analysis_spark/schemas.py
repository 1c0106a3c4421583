"""Explicit StructType schemas.

The reference infers schemas with ``pd.read_csv`` (no dtype spec —
reference notebooks/eda_processing.ipynb:63); we pin them for determinism
(SURVEY §1.3). ``LOANS_RAW_SCHEMA`` mirrors the 23-column raw loans CSV,
including the column name ``BUSINESS AGE`` with an embedded space.
Testdata schemas mirror the driver's parquet tables (TESTDATA.md).
"""

from __future__ import annotations

from pyspark.sql import types as T

# --- raw loans schema (FIXTURES.md §1; reference data/orig_train.csv header) ---
LOANS_RAW_SCHEMA = T.StructType(
    [
        T.StructField("PRODUCT", T.StringType()),
        T.StructField("AGE", T.LongType()),
        T.StructField("AREA", T.StringType()),
        T.StructField("RESIDENTIAL_PLACE", T.StringType()),
        T.StructField("EDUCATION", T.StringType()),
        T.StructField("MARITAL_STATUS", T.StringType()),
        T.StructField("HOUSEHOLD_MEMBERS", T.LongType()),
        T.StructField("NO_OF_DEPENDENTS", T.LongType()),
        T.StructField("INCOME", T.DoubleType()),
        T.StructField("WORK_SENIORITY", T.LongType()),
        T.StructField("BUSINESS AGE", T.LongType()),
        T.StructField("ECONOMIC_SECTOR", T.StringType()),
        T.StructField("EMPLOYEE_NO", T.StringType()),
        T.StructField("LENGTH_RELATIONSHIP_WITH_CLIENT", T.LongType()),
        T.StructField("DEBIT_CARD", T.LongType()),
        T.StructField("CURRENT_ACCOUNT", T.LongType()),
        T.StructField("SAVING_ACCOUNT", T.LongType()),
        T.StructField("SALARY_ACCOUNT", T.LongType()),
        T.StructField("FOREIGN_ACCOUNT", T.LongType()),
        T.StructField("FINALIZED_LOAN", T.LongType()),
        T.StructField("DEPOSIT", T.LongType()),
        T.StructField("PENSION_FUNDS", T.LongType()),
        T.StructField("DEFAULT_FLAG", T.LongType()),
    ]
)

# The string sentinel the reference uses for missing categoricals
# (reference notebooks/eda_processing.ipynb:837) — data, not SQL NULL.
MISSING_SENTINEL = "Missing"

# Columns the reference drops: label leakage + near-constant flags
# (reference notebooks/eda_processing.ipynb:64,1118-1120,1387-1390).
LEAKAGE_COLUMNS = ["DEFAULT_FLAG"]
NEAR_CONSTANT_COLUMNS = ["PENSION_FUNDS", "SAVING_ACCOUNT", "FOREIGN_ACCOUNT", "DEPOSIT"]

# The education ordinal ladder lives in pipeline/loans.py (EDUCATION_LADDER)
# in the reference-exact order — keep a single source of truth there.

# EMPLOYEE_NO bucket → ordinal map (reference notebooks/processing.py:112-136).
EMPLOYEE_NO_ORDER = [
    "between 0-10",
    "between 11-20",
    "between 21-50",
    "between 51-100",
    "between 101-250",
    "between 251-500",
    "between 501-1.000",
    "> 1.000",
]

# --- driver testdata schemas (TESTDATA.md) ---
TESTDATA_TABLES = [
    "region",
    "nation",
    "customer",
    "supplier",
    "part",
    "orders",
    "lineitem",
    "events",
    "documents",
    "embeddings",
]
