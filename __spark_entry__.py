"""Driver contract for the spark-graft builder (PySpark target).

``entry(spark)`` runs the flagship query at sf0.001; ``queries()`` and
``oracle_sql()`` expose the registry in ``h3ron_spark.queries`` (one
entry per implemented operator from SURVEY.md §2, with an exact DuckDB
oracle wherever the semantics are ANSI-SQL-expressible).
"""

from __future__ import annotations

import os
import sys
from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

from h3ron_spark import queries as Q  # noqa: E402


def entry(spark: SparkSession) -> DataFrame:
    """Flagship query on /root/testdata/sf0.001: synthesize H3 cells
    from the events table, filter to valid cells, roll up to the res-1
    parent, and aggregate — the canonical index-and-aggregate H3
    workload (SURVEY §7 M1 slice), all in JVM-side bit expressions."""
    return Q.h3_parent_rollup(spark, "/root/testdata/sf0.001")


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    return Q.queries()


def oracle_sql() -> dict[str, str]:
    return Q.oracles()
