"""Driver contract for the spark-graft builder (PySpark target).

The driver's verify runs ``entry(spark)`` as a smoke check, runs
each ``queries()[name]`` at sf=0.01 and compares it against the
matching ``oracle_sql()[name]`` via DuckDB (row-count + schema +
order-insensitive value-hash -> CORRECTNESS_r{N}.json).

Queries live in image_feature_extraction_spark/plans/queries.py; this module
is a thin adapter that also makes the package importable by the driver's
Python workers (addPyFile), since the driver creates its own SparkSession.
"""

from __future__ import annotations

import os
import sys
from collections.abc import Callable

_REPO_ROOT = os.path.dirname(os.path.abspath(__file__))
if _REPO_ROOT not in sys.path:
    sys.path.insert(0, _REPO_ROOT)

from pyspark.sql import DataFrame, SparkSession  # noqa: E402


def _prepared(spark: SparkSession) -> None:
    from image_feature_extraction_spark.session import ensure_workers_can_import

    ensure_workers_can_import(spark)
    # TZ-pin at runtime: timestamp<->epoch casts inside the window/as-of
    # operators assume a DST-free session zone (the oracle SQL is TZ-free).
    spark.conf.set("spark.sql.session.timeZone", "UTC")


def entry(spark: SparkSession) -> DataFrame:
    """Flagship query: deterministic token table -> eigenvalue-of-Hessian +
    histogram feature vectors (8 features x 2 scales) per document, token
    arrays passed through unchanged. Driver checks rows>0 + stable schema."""
    _prepared(spark)
    from image_feature_extraction_spark.plans.queries import QUERIES

    return QUERIES["q_flagship_features"](spark, "/root/testdata/sf0.001")


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    """One entry per implemented operator from SURVEY.md §2."""
    from image_feature_extraction_spark.plans.queries import QUERIES

    def wrap(fn):
        def run(spark: SparkSession, sf_dir: str) -> DataFrame:
            _prepared(spark)
            return fn(spark, sf_dir)

        return run

    return {name: wrap(fn) for name, fn in QUERIES.items()}


def oracle_sql() -> dict[str, str]:
    """DuckDB-runnable oracle SQL per query. Non-SQL-expressible queries
    (flagship kernel, equalized edges, multimodal fake codec) carry
    VALUES-literal oracles computed from the independent numpy generators
    — resolved lazily here so plain imports stay cheap."""
    from image_feature_extraction_spark.plans.queries import resolve_oracle_sql

    return resolve_oracle_sql()
