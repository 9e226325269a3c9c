"""Local replica of the driver's t2 correctness gate: run every
registered query on Spark and its DuckDB oracle on the same parquet,
then compare row counts + order-insensitive values (columns sorted by
name, rows sorted by all columns) at sf0.001.
"""

from __future__ import annotations

import math

import duckdb
import pytest

from h3ron_spark import queries as Q

SF_DIR = "/root/testdata/sf0.001"
TABLES = (
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
)


def duck_run(sql: str):
    con = duckdb.connect()
    for t in TABLES:
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{SF_DIR}/{t}.parquet')"
        )
    return con.execute(sql).fetchdf()


def normalize(pdf):
    pdf = pdf[sorted(pdf.columns)].copy()
    # bool -> int for cross-engine comparability
    for c in pdf.columns:
        if pdf[c].dtype == "bool":
            pdf[c] = pdf[c].astype("int64")
        if pdf[c].dtype == "object" and len(pdf) and isinstance(pdf[c].iloc[0], bool):
            pdf[c] = pdf[c].astype("int64")
    return pdf.sort_values(by=list(pdf.columns)).reset_index(drop=True)


def assert_frames_match(spark_pdf, duck_pdf, name):
    assert len(spark_pdf) == len(duck_pdf), f"{name}: row count mismatch"
    a, b = normalize(spark_pdf), normalize(duck_pdf)
    assert list(a.columns) == list(b.columns), f"{name}: column mismatch {list(a.columns)} vs {list(b.columns)}"
    for col in a.columns:
        av, bv = a[col].tolist(), b[col].tolist()
        for i, (x, y) in enumerate(zip(av, bv)):
            if isinstance(x, float) and isinstance(y, float):
                if math.isnan(x) and math.isnan(y):
                    continue
                assert x == pytest.approx(y, abs=1e-9), f"{name}.{col}[{i}]: {x} != {y}"
            else:
                assert x == y, f"{name}.{col}[{i}]: {x!r} != {y!r}"


@pytest.mark.parametrize("name", sorted(Q.oracles().keys()))
def test_query_matches_oracle(spark, name):
    fn = Q.queries()[name]
    sdf = fn(spark, SF_DIR).toPandas()
    ddf = duck_run(Q.oracles()[name])
    assert_frames_match(sdf, ddf, name)


def test_all_queries_run(spark):
    for name, fn in Q.queries().items():
        df = fn(spark, SF_DIR)
        assert df.count() >= 0, name
