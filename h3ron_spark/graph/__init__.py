"""Routing graphs on H3 edges (h3ron-graph re-expressed for Spark)."""

from h3ron_spark.graph.build import (  # noqa: F401
    downsample_graph,
    edge_graph_from_cell_pairs,
    graph_from_linestrings,
    graph_nodes,
    load_graph,
    save_graph,
)
from h3ron_spark.graph.path import (  # noqa: F401
    order_paths,
    path_cells_col,
    path_edge_count,
    path_is_empty,
    path_length_m,
    path_linestring_wkt,
)
from h3ron_spark.graph.algorithms import (  # noqa: F401
    backtrack_paths,
    covered_area,
    differential_shortest_path,
    nearest_graph_nodes,
    prepare_routing_graph,
    prepare_sssp_edges,
    shortest_path_many_to_many,
    sssp_frontier,
    within_weight_threshold,
)
