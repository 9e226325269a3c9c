"""Training-data pipeline operators (beyond the reference's surface).

Deduplication, similarity search, text analysis, and multimodal-column
plumbing — the operations a large-scale training-data pipeline needs,
designed Spark-first for 100 TB inputs (JVM-side expressions in the
hot path, broadcast/LSH-bucketed joins instead of cross joins).
"""
