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

    ``schema`` is a DDL string of columns (e.g. "cell long"); nested
    types are fine — the column split ignores commas inside <...>.
    """
    fields, depth, start = [], 0, 0
    for i, ch in enumerate(schema):
        if ch == "<":
            depth += 1
        elif ch == ">":
            depth -= 1
        elif ch == "," and depth == 0:
            fields.append(schema[start:i])
            start = i + 1
    fields.append(schema[start:])
    names = [f.split()[0] for f in fields]
    pdf = pd.DataFrame(list(rows), columns=names)
    return spark.createDataFrame(pdf, schema=schema)
