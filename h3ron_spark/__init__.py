"""h3ron_spark — PySpark-native H3 geospatial analytics engine.

A from-scratch re-expression of the query and data-processing
capabilities of the reference library nmandery/h3ron (see SURVEY.md)
as idiomatic PySpark: cells are ``LongType`` columns, bit-level H3
accessors are pure Spark SQL expressions (whole-stage codegen),
geodesic kernels are vectorized numpy inside Arrow pandas UDFs,
multi-cell producers are ``ArrayType`` columns + ``explode``,
compaction is groupBy + grouped-UDF aggregation, uncompaction is an
inner equi-join, and spatial predicates are polyfill semi-joins.
"""

__version__ = "0.1.0"

from h3ron_spark.session import get_spark  # noqa: F401
