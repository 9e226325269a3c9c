"""Pure-SQL surface: register the H3 bit accessors as SQL functions.

`spark.sql` users (BI tools, SQL-only pipelines, the `%%sql` crowd)
get the same H3 bit layer the DataFrame API exposes — as SQL scalar
functions (Spark 3.5+ ``CREATE TEMPORARY FUNCTION ... RETURN <expr>``)
whose bodies stay inside whole-stage codegen exactly like the Column
expressions they mirror.

No drift by construction: each function body is DERIVED from the
``functions/bits.py`` Column expression at registration time —
the Column is resolved against a dummy frame and Catalyst's
``Expression.sql()`` renders it back to SQL text. There is exactly
one implementation of each accessor in this repo; the SQL surface is
a rendering of it, and the parity test exercises both layers over
the full validity battery anyway.
"""

from __future__ import annotations

from pyspark.sql import SparkSession
from pyspark.sql import functions as F

from h3ron_spark.functions import bits as B


def _body_sql(spark: SparkSession, col) -> str:
    """Render a Column (over columns named c/r) to SQL text via the
    analyzed plan's Expression.sql()."""
    df = spark.range(1).selectExpr(
        "CAST(0 AS BIGINT) AS c", "CAST(0 AS INT) AS r"
    )
    alias_expr = (
        df.select(col.alias("_x"))
        ._jdf.queryExecution()
        .analyzed()
        .expressions()
        .apply(0)
    )
    return alias_expr.children().apply(0).sql()


_FUNCS = [
    # (name, params sql, return type, builder)
    ("h3_resolution", "c BIGINT", "INT",
     lambda: B.h3_get_resolution(F.col("c"))),
    ("h3_base_cell", "c BIGINT", "INT",
     lambda: B.h3_get_base_cell(F.col("c"))),
    ("h3_is_valid_cell", "c BIGINT", "BOOLEAN",
     lambda: B.h3_is_valid_cell(F.col("c"))),
    ("h3_is_pentagon", "c BIGINT", "BOOLEAN",
     lambda: B.h3_is_pentagon(F.col("c"))),
    ("h3_to_parent", "c BIGINT, r INT", "BIGINT",
     lambda: B.h3_to_parent(F.col("c"), F.col("r"))),
    ("h3_center_child", "c BIGINT, r INT", "BIGINT",
     lambda: B.h3_to_center_child(F.col("c"), F.col("r"))),
    ("h3_digit", "c BIGINT, r INT", "INT",
     lambda: B.h3_get_index_digit(F.col("c"), F.col("r"))),
]


def register_h3_sql(spark: SparkSession) -> list[str]:
    """Register the H3 SQL functions in the current session; returns
    the registered names. Idempotent (CREATE OR REPLACE)."""
    names = []
    for name, params, rtype, builder in _FUNCS:
        body = _body_sql(spark, builder())
        spark.sql(
            f"CREATE OR REPLACE TEMPORARY FUNCTION {name}({params}) "
            f"RETURNS {rtype} RETURN {body}"
        )
        names.append(name)
    return names
