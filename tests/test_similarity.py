"""Similarity-search pipeline units: IVF list assignment, probe
semantics, recall vs the brute-force baseline, and embedding near-dup
blocking — at sf0.001 (500 vectors, dim 64)."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from h3ron_spark.pipeline import similarity as SIM
from h3ron_spark.testdata import load

SF_DIR = "/root/testdata/sf0.001"


@pytest.fixture(scope="module")
def emb(spark):
    return load(spark, SF_DIR, "embeddings")


def test_ivf_assignment_is_exhaustive_and_unique(spark, emb):
    cents = SIM.ivf_centroid_rows(emb, 16)
    assert [c for c, _ in cents] == list(range(16))
    assigned = emb.select(
        "vec_id", SIM.ivf_best_lists("embedding", cents, 1)[0].alias("list_id")
    )
    pdf = assigned.toPandas()
    assert len(pdf) == emb.count()
    assert pdf["list_id"].between(0, 15).all()
    # a centroid's own vector always lands in its own list (cosine 1)
    own = pdf[pdf.vec_id < 16]
    assert (own.list_id == own.vec_id).all()


def test_ivf_probes_are_ordered_prefix(spark, emb):
    cents = SIM.ivf_centroid_rows(emb, 16)
    one = emb.select(SIM.ivf_best_lists("embedding", cents, 1).alias("p"))
    three = emb.select(SIM.ivf_best_lists("embedding", cents, 3).alias("p"))
    for r1, r3 in zip(one.collect(), three.collect()):
        assert len(r1.p) == 1 and len(r3.p) == 3
        assert r3.p[0] == r1.p[0]
        assert len(set(r3.p)) == 3


def test_ivf_topk_subset_of_bruteforce_candidates(spark, emb):
    queries = emb.filter(F.col("vec_id") % 100 == 0).select(
        F.col("vec_id").alias("query_id"), "embedding"
    )
    ivf = SIM.ivf_topk(emb, queries, n_lists=16, nprobe=4, k=5).toPandas()
    exact = SIM.brute_force_topk(emb, queries, k=50).toPandas()
    assert set(ivf.query_id) == set(exact.query_id)
    for qid, grp in ivf.groupby("query_id"):
        assert len(grp) == 5
        assert grp["rank"].tolist() == [1, 2, 3, 4, 5]
        # IVF cosines are exact for the candidates it returns: every
        # returned (vec, cosine) must appear identically in the exact
        # scoring of the same query
        ex = exact[exact.query_id == qid].set_index("vec_id")["cosine"]
        for _, row in grp.iterrows():
            if row.vec_id in ex.index:
                assert abs(ex[row.vec_id] - row.cosine) < 1e-9


def test_embedding_near_dup_pairs_blocked(spark, emb):
    pairs = SIM.embedding_near_dup_pairs(
        emb, 0.2, dim=64, planes=8, bands=3
    ).toPandas()
    assert (pairs.id_a < pairs.id_b).all()
    assert (pairs.cosine >= 0.2).all()
    # no duplicate pairs despite multi-band collisions
    assert not pairs.duplicated(["id_a", "id_b"]).any()
    # blocking: every returned pair shares a bucket in SOME band
    bands = emb.select(
        "vec_id",
        SIM.lsh_band_buckets("embedding", 64, 8, 3).alias("bs"),
    ).toPandas().set_index("vec_id")["bs"]
    for _, r in pairs.iterrows():
        assert any(
            x == y for x, y in zip(bands[r.id_a], bands[r.id_b])
        )


def test_banded_lsh_recall_superset(spark, emb):
    """More bands can only ADD candidate pairs (OR-construction)."""
    one = SIM.embedding_near_dup_pairs(
        emb, 0.2, dim=64, planes=8, bands=1
    ).toPandas()
    three = SIM.embedding_near_dup_pairs(
        emb, 0.2, dim=64, planes=8, bands=3
    ).toPandas()
    got1 = set(zip(one.id_a, one.id_b))
    got3 = set(zip(three.id_a, three.id_b))
    assert got1 <= got3


def test_ivf_arrow_assignment_matches_expression(spark, emb):
    """The Arrow-kernel centroid assignment reproduces the literal
    expression tree's choices exactly (6-dp rounded cosine, ties to
    the smaller cid) — and stays usable at n_lists=256 where the
    expression tree's analysis cost blows up."""
    from pyspark.sql import functions as F

    cents = SIM.ivf_centroid_rows(emb, 16)
    expr = emb.select(
        "vec_id", SIM.ivf_best_lists("embedding", cents, 2).alias("lists")
    ).toPandas().set_index("vec_id")["lists"]
    arrow = emb.select(
        "vec_id",
        SIM.ivf_best_lists_arrow(cents, 2)("embedding").alias("lists"),
    ).toPandas().set_index("vec_id")["lists"]
    for vid in expr.index:
        assert list(expr[vid]) == list(arrow[vid]), vid

    big = SIM.ivf_centroid_rows(emb, 256)
    assigned = emb.select(
        F.element_at(
            SIM.ivf_best_lists_arrow(big, 1)("embedding"), 1
        ).alias("list_id")
    ).toPandas()
    assert assigned.list_id.notna().all()
    assert assigned.list_id.nunique() > 50


def test_semantic_dedup_pairs_blocking_and_threshold(spark):
    """SemDeDup blocking: pairs only form within a cluster, cosine is
    exact, and a vector pair straddling two clusters is NOT emitted
    even when very similar (the documented blocking approximation)."""
    import numpy as np
    from pyspark.sql import functions as F

    from h3ron_spark.pipeline import similarity as SIM

    rng = np.random.default_rng(9)
    # two well-separated cluster directions + near-dup pairs inside
    c0 = rng.normal(0, 1, 16)
    c1 = rng.normal(0, 1, 16)
    c1 -= c1 @ c0 / (c0 @ c0) * c0  # orthogonalize
    rows = []
    for i in range(8):
        base = c0 if i % 2 == 0 else c1
        v = base + rng.normal(0, 0.05, 16)
        rows.append((i, [float(x) for x in v]))
    # 8,9: an exact near-dup pair in cluster 0
    v = c0 + rng.normal(0, 0.01, 16)
    rows.append((8, [float(x) for x in v]))
    rows.append((9, [float(x) for x in v + 1e-4]))
    df = spark.createDataFrame(rows, "vec_id long, embedding array<double>")
    cents = [(0, rows[0][1]), (1, rows[1][1])]
    out = SIM.semantic_dedup_pairs(
        df, 0.99, n_lists=2, centroids=cents
    ).collect()
    got = {(r["id_a"], r["id_b"]) for r in out}
    assert (8, 9) in got
    for ia, ib in got:
        # no cross-cluster pair: members of c0 have even parity ids
        # (plus 8/9), members of c1 odd parity (minus 8/9)
        side = lambda t: 0 if (t in (8, 9) or t % 2 == 0) else 1
        assert side(ia) == side(ib)
    for r in out:
        assert r["cosine"] >= 0.99


def test_kmeans_fit_trains_and_improves(spark):
    """Lloyd's iterations move centroids off the lowest-id init and
    do not increase mean distance-to-centroid (cosine inertia)."""
    import numpy as np

    from h3ron_spark.pipeline import similarity as SIM

    rng = np.random.default_rng(4)
    centers = rng.normal(0, 1, (4, 16))
    rows = []
    for i in range(160):
        v = centers[i % 4] + rng.normal(0, 0.15, 16)
        rows.append((i, [float(x) for x in v]))
    df = spark.createDataFrame(rows, "vec_id long, embedding array<double>")

    def inertia(cents):
        C = np.array([cv for _, cv in cents])
        Cn = C / np.linalg.norm(C, axis=1, keepdims=True)
        M = np.array([r[1] for r in rows])
        Mn = M / np.linalg.norm(M, axis=1, keepdims=True)
        return float((1.0 - (Mn @ Cn.T).max(axis=1)).mean())

    init = SIM.ivf_centroid_rows(df, 4)
    trained = SIM.kmeans_fit(df, 4, n_iter=3)
    assert [cid for cid, _ in trained] == [cid for cid, _ in init]
    assert any(
        tuple(a[1]) != tuple(b[1]) for a, b in zip(init, trained)
    )
    assert inertia(trained) <= inertia(init) + 1e-9


def _pq_quant_error(vecs, books):
    """Mean squared reconstruction error of encoding vecs with books."""
    import numpy as np

    cb = np.array([[cv for _, cv in b] for b in books])  # (m, k, sub)
    m, k, sub = cb.shape
    X = np.array(vecs, dtype=np.float64).reshape(len(vecs), m, sub)
    d = ((X[:, :, None, :] - cb[None]) ** 2).sum(-1)  # (n, m, k)
    return float(d.min(axis=2).sum(axis=1).mean())


def test_pq_codes_shape_and_cid_domain(spark, emb):
    books = SIM.pq_fit(emb, m=8, k=16, n_iter=1)
    assert len(books) == 8 and all(len(b) == 16 for b in books)
    kern = SIM.pq_assign_arrow(books)
    rows = emb.select(kern("embedding").alias("c")).collect()
    cids = {cid for b in books for cid, _ in b}
    assert all(len(r.c) == 8 and set(r.c) <= cids for r in rows)


def test_pq_training_reduces_quantization_error(spark, emb):
    vecs = [r.embedding for r in emb.select("embedding").collect()]
    untrained = SIM.pq_init_books(emb, m=8, k=16)
    trained = SIM.pq_fit(emb, m=8, k=16, n_iter=2)
    assert _pq_quant_error(vecs, trained) < _pq_quant_error(vecs, untrained)


def test_pq_adc_topk_is_deterministic_and_ranked(spark, emb):
    books = SIM.pq_fit(emb, m=8, k=16, n_iter=1)
    queries = emb.filter(F.col("vec_id") % 100 == 0).select(
        F.col("vec_id").alias("query_id"), "embedding"
    )
    out = SIM.pq_adc_topk(emb, queries, books, k_top=3).collect()
    per_q = {}
    for r in out:
        per_q.setdefault(r.query_id, []).append((r.rank, r.adc_dist, r.vec_id))
    for q, rows in per_q.items():
        rows.sort()
        assert [r[0] for r in rows] == list(range(1, len(rows) + 1))
        dists = [r[1] for r in rows]
        assert dists == sorted(dists)
        assert all(r[2] != q for r in rows)


def test_blocked_exact_topk_equals_brute(spark):
    """The blocked prefilter+rescore path returns row-identical
    results to brute_force_topk (same rounding, same tie-breaks) —
    including rounded near-ties around the k-th score."""
    from pyspark.sql import functions as F2

    from h3ron_spark.pipeline.similarity import (
        blocked_exact_topk,
        brute_force_topk,
    )

    # deterministic corpus with many near-tie scores: low-dim lattice
    corpus = spark.range(400).select(
        F2.col("id").alias("vec_id"),
        F2.array(
            (F2.col("id") % 7).cast("float"),
            (F2.col("id") % 5).cast("float"),
            (F2.col("id") % 3 + 1).cast("float"),
        ).alias("embedding"),
    )
    queries = corpus.filter(F2.col("vec_id") % 40 == 0).select(
        F2.col("vec_id").alias("query_id"), "embedding"
    )
    a = brute_force_topk(corpus, queries, k=5).collect()
    b = blocked_exact_topk(corpus, queries, k=5).collect()
    key = lambda r: (r.query_id, r.rank)  # noqa: E731
    assert sorted(map(tuple, a), key=lambda t: (t[0], t[3])) == sorted(
        map(tuple, b), key=lambda t: (t[0], t[3])
    )


def test_blocked_exact_topk_plan_no_cartesian(spark):
    """Plan pin: the rescore stage joins via broadcast only — no
    cartesian/nested-loop row explosion anywhere, no corpus shuffle."""
    from pyspark.sql import functions as F2

    from h3ron_spark.pipeline.similarity import blocked_exact_topk

    corpus = spark.range(300).select(
        F2.col("id").alias("vec_id"),
        F2.array(
            (F2.col("id") % 9).cast("float"), (F2.col("id") % 4).cast("float")
        ).alias("embedding"),
    )
    queries = corpus.filter(F2.col("vec_id") % 60 == 0).select(
        F2.col("vec_id").alias("query_id"), "embedding"
    )
    plan = (
        blocked_exact_topk(corpus, queries, k=3)
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    assert "CartesianProduct" not in plan
    assert "BroadcastNestedLoopJoin" not in plan
    assert "SortMergeJoin" not in plan
    assert "BroadcastHashJoin" in plan


def test_blocked_exact_topk_query_limit_guard(spark, monkeypatch):
    """An oversized query set raises a clear ValueError BEFORE the
    driver materializes it (limit(N+1) + raise, mirroring
    prepare_routing_graph's _BROADCAST_EDGE_LIMIT) — never an OOM
    mid-toPandas."""
    import pytest
    from pyspark.sql import functions as F2

    from h3ron_spark.pipeline import similarity as sim

    corpus = spark.range(50).select(
        F2.col("id").alias("vec_id"),
        F2.array(
            (F2.col("id") % 3).cast("float"), F2.lit(1.0).cast("float")
        ).alias("embedding"),
    )
    queries = corpus.select(F2.col("vec_id").alias("query_id"), "embedding")
    monkeypatch.setattr(sim, "_QUERY_BROADCAST_LIMIT", 10)
    with pytest.raises(ValueError, match="query count exceeds"):
        sim.blocked_exact_topk(corpus, queries, k=3)
    # at/under the limit still works
    monkeypatch.setattr(sim, "_QUERY_BROADCAST_LIMIT", 50)
    assert sim.blocked_exact_topk(corpus, queries, k=1).count() > 0


def test_quantizer_save_load_bit_identical_search(spark, tmp_path, emb):
    """Persisted IVF centroids + PQ codebooks round-trip exactly
    (parquet doubles are lossless), and a search with the LOADED
    model returns row-identical results to the fresh model."""
    from h3ron_spark.pipeline.similarity import (
        ivf_centroid_rows,
        ivfpq_topk,
        load_quantizer,
        pq_fit,
        save_quantizer,
    )

    cents = ivf_centroid_rows(emb, 8)
    books = pq_fit(emb, m=4, k=8, n_iter=1)
    path = str(tmp_path / "model")
    save_quantizer(spark, path, centroids=cents, books=books)
    lc, lb = load_quantizer(spark, path)
    assert lc == sorted((int(c), [float(x) for x in v]) for c, v in cents)
    assert lb == [sorted((int(c), [float(x) for x in v]) for c, v in b) for b in books]

    queries = emb.filter("vec_id % 40 = 0").selectExpr(
        "vec_id AS query_id", "embedding"
    )
    fresh = ivfpq_topk(
        emb, queries, books, n_lists=8, nprobe=2, k_top=3, centroids=cents
    ).collect()
    loaded = ivfpq_topk(
        emb, queries, lb, n_lists=8, nprobe=2, k_top=3, centroids=lc
    ).collect()
    assert sorted(map(tuple, fresh)) == sorted(map(tuple, loaded))
