"""Pure-Python/numpy implementation of the H3 hexagonal hierarchical
geospatial indexing system (the public Uber H3 algorithm), used as the
kernel inside Arrow pandas UDFs.

No C/FFI: this container has no ``h3`` wheel, so the icosahedral math
is implemented from the published algorithm. Design notes:

- The three small constant tables (icosahedron face centers, face
  axis azimuths, base cell home positions) are transcribed from the
  public H3 spec (Apache-2.0, Uber). Everything else — the
  face→base-cell lookup and the face-neighbor coordinate transforms —
  is *derived numerically* at import time from those constants, then
  cross-checked against published H3 test vectors in
  tests/test_h3core.py.
- Grid traversal (neighbors, disks, paths) is geometric: step one
  hex-unit in the cell's face-gnomonic plane and re-index the stepped
  point, instead of transcribing libh3's digit-rotation tables.
  Results agree with libh3 by construction (a cell is defined by
  containment).
- Documented divergence: cell boundaries are computed in the home
  face gnomonic plane, so Class III cells crossing icosahedron edges
  return 6 vertices (libh3 may return 7 with a split point on the
  edge); vertex positions deviate by O(1e-9 .. 1e-6) degrees near
  icosahedron edges only.
"""

from h3ron_spark.h3core.cells import (  # noqa: F401
    latlng_to_cell,
    cell_to_latlng,
    cell_to_boundary,
    grid_disk,
    grid_disk_distances,
    grid_ring,
    grid_distance,
    grid_path_cells,
    are_neighbor_cells,
    neighbors,
    cell_to_parent,
    cell_to_children,
    cell_to_center_child,
    compact_cells,
    uncompact_cells,
    get_resolution,
    is_valid_cell,
    is_pentagon,
    get_base_cell,
    cell_area_rads2,
    cell_area_km2,
    cell_area_m2,
    res0_cells,
    get_num_cells,
    average_hexagon_area_km2,
    origin_to_directed_edges,
    cells_to_directed_edge,
    directed_edge_to_cells,
    edge_origin,
    edge_destination,
    edge_reverse,
    is_valid_directed_edge,
    edge_length_rads,
    edge_length_km,
    edge_length_m,
    edge_boundary,
    cell_to_local_ij,
    local_ij_to_cell,
    great_circle_distance_rads,
    great_circle_distance_km,
    great_circle_distance_m,
)
