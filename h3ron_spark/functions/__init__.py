"""Spark-level H3 functions.

- ``bits``: pure Spark SQL Column expressions (no UDF, whole-stage
  codegen) for every bit-level H3 accessor.
- ``geo``: Arrow pandas UDFs wrapping the vectorized numpy H3 core
  (``h3ron_spark.h3core``) for the geodesic kernels.
"""

from h3ron_spark.functions.bits import (  # noqa: F401
    h3_get_resolution,
    h3_get_base_cell,
    h3_get_mode,
    h3_get_reserved,
    h3_get_index_digit,
    h3_to_parent,
    h3_to_center_child,
    h3_to_children_nextres,
    h3_is_pentagon,
    h3_is_valid_cell,
    h3_is_res_class_iii,
    h3_to_string,
    h3_from_string,
    h3_build_cell,
    h3_is_parent_of,
    h3_is_child_of,
    h3_edge_origin,
    h3_edge_direction,
    h3_is_valid_directed_edge,
)
