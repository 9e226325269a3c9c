"""Connected-component labeling over pair graphs (pipeline.components).

Pins: (a) the driver union-find path and the distributed
pointer-jumping path produce identical labels, (b) labels are the
component-minimum id, (c) adversarial chain shapes converge within
the O(log diameter) round budget.
"""

from __future__ import annotations

from h3ron_spark.pipeline.components import dedup_cluster_members, label_components


def _labels(df):
    return {(r["id"], r["component"]) for r in df.collect()}


def test_label_components_union_find_and_distributed_agree(spark):
    # triangle {1,2,3}, pair {10,11}, chain {20..23}, plus a
    # redundant duplicate edge
    pairs = spark.createDataFrame(
        [(2, 1), (2, 3), (1, 3), (10, 11), (20, 21), (21, 22), (22, 23), (21, 20)],
        "id_a long, id_b long",
    )
    expected = {
        (1, 1), (2, 1), (3, 1),
        (10, 10), (11, 10),
        (20, 20), (21, 20), (22, 20), (23, 20),
    }
    assert _labels(label_components(pairs)) == expected
    # force the distributed pointer-jumping path
    assert _labels(label_components(pairs, edge_limit=0)) == expected


def test_label_components_long_chain_pointer_jumping(spark):
    # 33-node chain: plain propagation needs 32 rounds; pointer
    # jumping must land it well inside max_iter=8 (log2(32) = 5)
    n = 33
    pairs = spark.createDataFrame(
        [(i, i + 1) for i in range(100, 100 + n - 1)], "id_a long, id_b long"
    )
    out = _labels(label_components(pairs, edge_limit=0, max_iter=8))
    assert out == {(100 + i, 100) for i in range(n)}


def test_dedup_cluster_members_canonical_flag(spark):
    pairs = spark.createDataFrame([(7, 5), (5, 9)], "id_a long, id_b long")
    rows = {
        (r["id"], r["cluster"], r["is_canonical"])
        for r in dedup_cluster_members(pairs).collect()
    }
    assert rows == {(5, 5, True), (7, 5, False), (9, 5, False)}


def test_label_components_string_ids_both_paths(spark):
    # string ids (e.g. md5 fingerprints) must work and agree on
    # schema/labels in BOTH paths (the union-find path once
    # hard-coded a long schema)
    pairs = spark.createDataFrame(
        [("b", "a"), ("b", "c"), ("x", "y")], "id_a string, id_b string"
    )
    expected = {("a", "a"), ("b", "a"), ("c", "a"), ("x", "x"), ("y", "x")}
    small = label_components(pairs)
    big = label_components(pairs, edge_limit=0)
    assert _labels(small) == expected and _labels(big) == expected
    assert dict(small.dtypes) == dict(big.dtypes)


def test_label_components_mixed_id_types_raise(spark):
    # ADVICE r3: the two paths would disagree on schema for a
    # mixed-type pair graph — reject it up front
    import pytest as _pytest

    pairs = spark.createDataFrame(
        [(1, 2)], "id_a int, id_b int"
    ).selectExpr("id_a", "cast(id_b as long) as id_b")
    with _pytest.raises(ValueError, match="share a type"):
        label_components(pairs)


def test_label_components_raises_when_unconverged(spark):
    import pytest as _pytest

    pairs = spark.createDataFrame(
        [(i, i + 1) for i in range(50)], "id_a long, id_b long"
    )
    with _pytest.raises(RuntimeError, match="did not converge"):
        label_components(pairs, edge_limit=0, max_iter=2)
