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
from h3ron_spark.functions.geo import (  # noqa: F401
    h3_latlng_to_cell,
    h3_cell_to_latlng,
    h3_cell_to_lat,
    h3_cell_to_lng,
    h3_cell_to_boundary,
    h3_cell_to_boundary_wkt,
    h3_cell_to_children,
    h3_change_resolution,
    h3_grid_disk,
    h3_grid_ring,
    h3_grid_disk_distances,
    h3_grid_distance,
    h3_grid_path,
    h3_are_neighbor_cells,
    h3_cell_area_km2,
    h3_cell_area_m2,
    h3_cell_area_rads2,
    h3_cell_to_directed_edges,
    h3_cells_to_directed_edge,
    h3_directed_edge_to_cells,
    h3_edge_destination,
    h3_edge_reverse,
    h3_edge_length_km,
    h3_edge_length_m,
    h3_edge_length_rads,
    h3_edge_boundary_wkt,
    h3_cell_centroid_distance_m,
    h3_great_circle_distance_km,
    h3_cell_to_local_ij,
    h3_local_ij_to_cell,
    h3_compact_cells,
    h3_uncompact_cells,
)
