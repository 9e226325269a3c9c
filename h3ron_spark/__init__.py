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

# Curated lazy surface (PEP 562): `import h3ron_spark as hs` then
# hs.bits / hs.geo / hs.graph / ... without paying import cost for
# unused subsystems (and without import cycles).
_LAZY_MODULES = {
    "bits": "h3ron_spark.functions.bits",
    "geo": "h3ron_spark.functions.geo",
    "operators": "h3ron_spark.operators",
    "graph": "h3ron_spark.graph",
    "raster": "h3ron_spark.raster",
    "sources": "h3ron_spark.sources",
    "streaming": "h3ron_spark.streaming",
    "dedup": "h3ron_spark.pipeline.dedup",
    "similarity": "h3ron_spark.pipeline.similarity",
    "text": "h3ron_spark.pipeline.text",
    "sampling": "h3ron_spark.pipeline.sampling",
    "multimodal": "h3ron_spark.pipeline.multimodal",
    "sketch": "h3ron_spark.pipeline.sketch",
    "drift": "h3ron_spark.pipeline.drift",
    "components": "h3ron_spark.pipeline.components",
    "jpeg": "h3ron_spark.pipeline.jpeg",
    "skew": "h3ron_spark.operators.skew",
    "layout": "h3ron_spark.operators.layout",
    "maintenance": "h3ron_spark.operators.maintenance",
    "history": "h3ron_spark.operators.history",
    "convolve": "h3ron_spark.operators.convolve",
    "rollup": "h3ron_spark.streaming.rollup",
    "bpe": "h3ron_spark.pipeline.bpe",
    "pagerank": "h3ron_spark.graph.pagerank",
    "motifs": "h3ron_spark.graph.motifs",
    "mapmatch": "h3ron_spark.graph.mapmatch",
    "h3core": "h3ron_spark.h3core",
}


def __getattr__(name: str):
    target = _LAZY_MODULES.get(name)
    if target is None:
        raise AttributeError(f"module 'h3ron_spark' has no attribute {name!r}")
    import importlib

    mod = importlib.import_module(target)
    globals()[name] = mod
    return mod


def __dir__():
    return sorted(set(globals()) | set(_LAZY_MODULES))
