"""Small shared helpers."""

from __future__ import annotations

import pandas as pd
from pyspark.sql import DataFrame, SparkSession


def local_df(spark: SparkSession, rows, schema: str) -> DataFrame:
    """Create a small driver-side DataFrame through the pandas->Arrow
    path.

    ``createDataFrame`` from a plain Python list parallelizes into
    defaultParallelism RDD slices, and every downstream action pays a
    Python-serialization round per slice (~seconds of overhead for a
    100-row probe table). The Arrow path materializes a JVM
    LocalRelation once — ~100x faster for the broadcast-probe /
    origin-list tables this engine builds constantly.

    ``schema`` is a DDL string of flat columns (e.g. "cell long").
    """
    names = [f.split()[0] for f in schema.split(",")]
    pdf = pd.DataFrame(list(rows), columns=names)
    return spark.createDataFrame(pdf, schema=schema)
