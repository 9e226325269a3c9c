"""Similarity search over embedding columns (array<float>).

Baseline: brute-force cosine top-k with a broadcast query set (the
100 TB-safe shape: the corpus scan is a single pass, queries are
broadcast, the only shuffle is the per-query top-k aggregation).
Scale path: LSH bucketing via random hyperplanes (SimHash for vectors)
so candidate generation is a bucket equi-join instead of a full scan
per query.

All dot products run as JVM higher-order functions (zip_with +
aggregate) — no Python in the scan.
"""

from __future__ import annotations

import math

import numpy as np
import pyarrow as pa
from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F
from pyspark.sql.functions import arrow_udf
from pyspark.sql.types import ArrayType, LongType

# blocked_exact_topk collects + broadcasts the query vectors as one
# dense float64 matrix; 200k rows x 256 dims is already ~400 MiB of
# broadcast — beyond that the query set itself must be blocked
_QUERY_BROADCAST_LIMIT = 200_000


def dot(a, b) -> Column:
    """Dot product as a JVM higher-order aggregate. String inputs
    take the one-parse generated-SQL path (sqlexpr.dot_sql — ~15 py4j
    round trips saved per call site; bit-identity pinned by
    tests/test_sqlexpr_identity.py); Columns keep the classic
    builder, value-identical."""
    if isinstance(a, str) and isinstance(b, str):
        from h3ron_spark.pipeline.sqlexpr import dot_sql

        return F.expr(dot_sql(a, b))
    a = F.col(a) if isinstance(a, str) else a
    b = F.col(b) if isinstance(b, str) else b
    return F.aggregate(
        F.zip_with(a, b, lambda x, y: x.cast("double") * y.cast("double")),
        F.lit(0.0),
        lambda acc, x: acc + x,
    )


def l2_norm(a) -> Column:
    """L2 norm via the same dual path as :func:`dot`."""
    if isinstance(a, str):
        from h3ron_spark.pipeline.sqlexpr import l2_norm_sql

        return F.expr(l2_norm_sql(a))
    return F.sqrt(
        F.aggregate(
            F.transform(a, lambda x: x.cast("double") * x.cast("double")),
            F.lit(0.0),
            lambda acc, x: acc + x,
        )
    )


def cosine(a, b) -> Column:
    return dot(a, b) / (l2_norm(a) * l2_norm(b))


def brute_force_topk(
    corpus: DataFrame,
    queries: DataFrame,
    k: int = 5,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    query_id_col: str = "query_id",
) -> DataFrame:
    """Exact cosine top-k per query over the corpus.

    ``queries`` is expected to be small — it is broadcast so the plan
    is BroadcastNestedLoopJoin over one corpus scan; the row_number
    window shuffles only (query, corpus) pairs, i.e. |Q| * |corpus|.
    For large |Q| use :func:`lsh_topk`.
    """
    q = queries.select(
        F.col(query_id_col).alias("query_id"),
        F.col(vec_col).alias("q_vec"),
        l2_norm(vec_col).alias("q_norm"),
    )
    c = corpus.select(
        F.col(id_col).alias("vec_id"),
        F.col(vec_col).alias("c_vec"),
        l2_norm(vec_col).alias("c_norm"),
    )
    scored = (
        c.crossJoin(F.broadcast(q))
        .filter(F.col("vec_id") != F.col("query_id"))
        .withColumn(
            "cosine",
            F.round(
                dot("q_vec", "c_vec") / (F.col("q_norm") * F.col("c_norm")), 6
            ),
        )
    )
    w = Window.partitionBy("query_id").orderBy(F.col("cosine").desc(), F.col("vec_id").asc())
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select("query_id", "vec_id", "cosine", "rank")
    )


def _hyperplanes(dim: int, planes: int, seed: int = 42) -> list[list[float]]:
    """Deterministic pseudo-random unit hyperplanes (pure python, no
    numpy state) — same constants on driver and in oracle generation."""
    out = []
    x = seed
    for _ in range(planes):
        v = []
        for _ in range(dim):
            # xorshift64*
            x ^= (x << 13) & 0xFFFFFFFFFFFFFFFF
            x ^= x >> 7
            x ^= (x << 17) & 0xFFFFFFFFFFFFFFFF
            v.append(((x % 2000001) / 1000000.0) - 1.0)
        n = math.sqrt(sum(t * t for t in v)) or 1.0
        out.append([t / n for t in v])
    return out


def lsh_bucket(vec, dim: int, planes: int = 8, seed: int = 42) -> Column:
    """Random-hyperplane LSH bucket id (int in [0, 2^planes))."""
    vec = F.col(vec) if isinstance(vec, str) else vec
    hps = _hyperplanes(dim, planes, seed)
    # ONE nested array literal for all hyperplanes: per-element F.lit
    # made planes x dim Literal nodes and Catalyst analysis (not
    # execution) dominated the plan cost
    H = F.lit([list(h) for h in hps])
    acc = F.lit(0)
    for i in range(planes):
        proj = F.aggregate(
            F.zip_with(
                vec, F.element_at(H, i + 1), lambda x, y: x.cast("double") * y
            ),
            F.lit(0.0),
            lambda a, x: a + x,
        )
        acc = acc.bitwiseOR(F.shiftleft((proj > 0).cast("int"), i))
    return acc


def planes_for_corpus(
    n_rows: int, target_bucket_width: int = 8, lo: int = 8, hi: int = 24
) -> int:
    """Size hyperplane count so bucket cardinality tracks the corpus:
    2^planes ≈ n_rows / target_bucket_width, clamped to [lo, hi].
    At 2k rows -> 8 planes (256 buckets); at 10^9 rows -> 24 planes
    (16M buckets). Keeping bucket width roughly constant is what makes
    the candidate join near-linear in corpus size instead of
    O(n^2 / buckets)."""
    import math as _m

    if n_rows <= 0:
        return lo
    return max(lo, min(hi, int(_m.ceil(_m.log2(max(2, n_rows / target_bucket_width))))))


def lsh_band_buckets(
    vec, dim: int, planes: int = 16, bands: int = 4, seed: int = 42
) -> Column:
    """Array of ``bands`` independent hyperplane-LSH bucket ids (one
    per plane set, seeds ``seed+band``). The banded OR-construction
    mirrors the MinHash band scheme (dedup.py): a candidate pair only
    needs to collide in ONE band, so per-band bucket cardinality can be
    high (2^planes buckets) without losing near-dup recall — the fix
    for the single-band small-bucket skew (n^2/buckets pair blowup) at
    corpus scale."""
    return F.array(
        *[lsh_bucket(vec, dim, planes, seed + b) for b in range(bands)]
    )


def lsh_band_buckets_arrow(
    dim: int, planes: int = 16, bands: int = 4, seed: int = 42
):
    """Arrow-kernel variant of ``lsh_band_buckets``: ONE numpy matmul
    per batch against the stacked (bands*planes, dim) hyperplane
    matrix. The Catalyst higher-order-function version evaluates
    bands*planes interpreted aggregate lambdas PER ROW (~1.8 ms/row —
    the hot-path anti-pattern); this kernel is BLAS-vectorized and
    O(1) in plan complexity, which is what a 100 TB corpus needs.

    Sign parity: projections whose |value| is below 1e-9 are
    recomputed with strict sequential float64 accumulation — the exact
    order both the expression version and DuckDB's list_dot_product
    use — so bucket ids stay bit-identical to the oracle even on
    borderline dots where blocked BLAS summation could flip a sign."""
    Hs = [
        np.array(_hyperplanes(dim, planes, seed + b), dtype=np.float64)
        for b in range(bands)
    ]
    H = np.vstack(Hs)  # (bands*planes, dim)
    weights = (np.int64(1) << np.arange(planes, dtype=np.int64))
    nb, npl = bands, planes

    @arrow_udf(ArrayType(LongType()))
    def kernel(vec: pa.Array) -> pa.Array:
        if isinstance(vec, pa.ChunkedArray):
            vec = vec.combine_chunks()
        n = len(vec)
        if n == 0:
            return pa.array([], pa.list_(pa.int64()))
        flat = np.asarray(
            vec.flatten().to_numpy(zero_copy_only=False), dtype=np.float64
        )
        M = flat.reshape(n, dim)
        P = M @ H.T
        close = np.nonzero(np.abs(P) < 1e-9)
        for r, c in zip(*close):
            s = 0.0
            for t in range(dim):
                s += M[r, t] * H[c, t]
            P[r, c] = s
        bits = (P > 0.0).reshape(n, nb, npl)
        buckets = (bits * weights[None, None, :]).sum(axis=2)
        offsets = np.arange(0, (n + 1) * nb, nb, dtype=np.int32)
        return pa.ListArray.from_arrays(
            pa.array(offsets), pa.array(buckets.ravel(), pa.int64())
        )

    return kernel


def ivf_centroid_rows(
    corpus: DataFrame,
    n_lists: int,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> list[tuple[int, list[float]]]:
    """Deterministic coarse quantizer: the ``n_lists`` corpus vectors
    with the smallest ids. A bounded-size model parameter (like k-means
    centroids after training) — collecting it to the driver is O(n_lists),
    independent of corpus size, and lets the assignment step run as a
    pure JVM column expression with zero shuffle."""
    rows = (
        corpus.select(F.col(id_col).alias("cid"), F.col(vec_col).alias("v"))
        .filter(F.col("cid") < n_lists)
        .orderBy("cid")
        .collect()
    )
    return [(r.cid, [float(t) for t in r.v]) for r in rows]


def ivf_best_lists(vec, centroids, nprobe: int = 1) -> Column:
    """Array of the ``nprobe`` nearest centroid ids for ``vec`` (by
    cosine, ties to the smaller cid), as a single JVM expression —
    map-side, no shuffle, no Python.

    Shape matters for plan cost: one literal array-of-centroid-structs
    traversed by ONE transform lambda, not N independent cosine
    subtrees (N trees each embedding three aggregates made
    analysis+codegen the dominant cost). Centroid norms are
    precomputed in Python — a sequential float64 sum + sqrt, bit-equal
    to what the JVM aggregate would produce — and the vector's own
    norm is computed once and shared across all centroids. Cosines
    are rounded to 6 dp so tie-breaking is reproducible across
    engines."""
    vec = F.col(vec) if isinstance(vec, str) else vec
    # three plain nested literals (vectors / norms / negated ids)
    # instead of an array of per-element-lit structs: collapses
    # n_lists x dim Literal nodes to three, which removes the Catalyst
    # analysis cost that dominated this expression
    cent_vecs = F.lit([[float(t) for t in cv] for _, cv in centroids])
    cent_norms = F.lit(
        [math.sqrt(sum(t * t for t in cv)) for _, cv in centroids]
    )
    cent_negids = F.lit([-cid for cid, _ in centroids])
    vnorm = l2_norm(vec)

    def score(cv, i):
        d = F.aggregate(
            F.zip_with(vec, cv, lambda x, y: x.cast("double") * y),
            F.lit(0.0),
            lambda acc, x: acc + x,
        )
        return F.struct(
            F.round(d / (vnorm * F.get(cent_norms, i)), 6).alias("sim"),
            F.get(cent_negids, i).alias("negcid"),
        )

    ranked = F.reverse(F.array_sort(F.transform(cent_vecs, score)))
    return F.transform(F.slice(ranked, 1, nprobe), lambda s: -s["negcid"])


def ivf_best_lists_arrow(centroids, nprobe: int = 1):
    """Arrow-kernel centroid assignment: one numpy matmul per batch
    against the (n_lists, dim) centroid matrix shipped in the UDF
    closure. Replaces the literal-expression tree for large
    quantizers — Catalyst analysis/codegen cost is O(1) in n_lists and
    the flop count is BLAS-vectorized, so n_lists in the hundreds+
    (what a 100 TB corpus needs) is flat. Tie-break parity with
    ivf_best_lists: cosine rounded to 6 dp, ties to the smaller cid
    (stable argsort over the cid-ascending centroid matrix)."""
    cents = np.array([cv for _, cv in centroids], dtype=np.float64)
    cids = np.array([cid for cid, _ in centroids], dtype=np.int64)
    order_c = np.argsort(cids, kind="stable")
    cents = cents[order_c]
    cids = cids[order_c]
    cnorm = np.sqrt((cents * cents).sum(axis=1))
    take = int(nprobe)

    @arrow_udf(ArrayType(LongType()))
    def kernel(vec: pa.Array) -> pa.Array:
        if isinstance(vec, pa.ChunkedArray):
            vec = vec.combine_chunks()
        n = len(vec)
        if n == 0:
            return pa.array([], pa.list_(pa.int64()))
        flat = np.asarray(vec.flatten().to_numpy(zero_copy_only=False), dtype=np.float64)
        M = flat.reshape(n, cents.shape[1])
        vnorm = np.sqrt((M * M).sum(axis=1))
        vnorm[vnorm == 0.0] = 1.0
        sims = np.round(
            (M @ cents.T) / (vnorm[:, None] * cnorm[None, :]), 6
        )
        top = np.argsort(-sims, axis=1, kind="stable")[:, :take]
        out = cids[top]
        offsets = np.arange(0, (n + 1) * take, take, dtype=np.int32)
        return pa.ListArray.from_arrays(
            pa.array(offsets), pa.array(out.ravel(), pa.int64())
        )

    return kernel


def ivf_topk(
    corpus: DataFrame,
    queries: DataFrame,
    n_lists: int = 16,
    nprobe: int = 2,
    k: int = 5,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    query_id_col: str = "query_id",
    centroids: list[tuple[int, list[float]]] | None = None,
) -> DataFrame:
    """IVF approximate top-k: assign every corpus vector to its nearest
    coarse-quantizer centroid (its inverted list), probe the ``nprobe``
    nearest lists per query, exact-cosine rerank inside the probed
    lists.

    Scale shape: the quantizer is a bounded model (``n_lists`` rows)
    embedded as literals, so list assignment is one map-side projection
    over the corpus scan — no shuffle, no Python. Candidate generation
    is a broadcast equi-join on ``list_id`` (queries are the small
    side); the only shuffle is the per-query top-k window over
    candidates, ~``nprobe/n_lists`` of the corpus instead of all of it.
    """
    cents = centroids or ivf_centroid_rows(corpus, n_lists, id_col, vec_col)
    # centroid assignment runs as an Arrow kernel (numpy matmul per
    # batch) — flat in n_lists for both Catalyst analysis and runtime,
    # unlike the previous literal expression tree (fine at 16 lists,
    # pathological in the hundreds). Still map-side: no shuffle, no
    # join, the kernel is a stateless projection over the scan.
    assign1 = ivf_best_lists_arrow(cents, 1)
    assignp = ivf_best_lists_arrow(cents, nprobe)
    # norms once per VECTOR before the join — the per-pair cosine then
    # costs one dot, not dot + two norm aggregates (at corpus scale the
    # candidate set is ~nprobe/n_lists of corpus x queries; recomputing
    # norms per pair would multiply that work)
    assigned = corpus.select(
        F.col(id_col).alias("vec_id"),
        F.col(vec_col).alias("c_vec"),
        l2_norm(vec_col).alias("c_norm"),
        F.element_at(assign1(vec_col), 1).alias("list_id"),
    )
    probes = queries.select(
        F.col(query_id_col).alias("query_id"),
        F.col(vec_col).alias("q_vec"),
        l2_norm(vec_col).alias("q_norm"),
        F.explode(assignp(vec_col)).alias("list_id"),
    )
    scored = (
        assigned.join(F.broadcast(probes), "list_id")
        .filter(F.col("vec_id") != F.col("query_id"))
        .withColumn(
            "cosine",
            F.round(
                dot("q_vec", "c_vec") / (F.col("q_norm") * F.col("c_norm")), 6
            ),
        )
    )
    w = Window.partitionBy("query_id").orderBy(F.col("cosine").desc(), F.col("vec_id").asc())
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select("query_id", "vec_id", "cosine", "rank")
    )


def embedding_near_dup_pairs(
    df: DataFrame,
    threshold: float,
    dim: int,
    planes: int = 16,
    bands: int = 4,
    seed: int = 42,
    bucket_cap: int = 1024,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """Embedding-cosine near-duplicate pairs with BANDED hyperplane-LSH
    blocking.

    Candidates come from a self equi-join on (band, bucket) across
    ``bands`` independent plane sets — never an O(n^2) cross join. With
    2^planes buckets per band the join key cardinality scales with the
    corpus (65k buckets at planes=16), so within-bucket pair counts
    stay near-linear; ``bucket_cap`` bounds the worst case anyway by
    keeping only the first ``bucket_cap`` rows per (band, bucket) in id
    order (deterministic). Pairs colliding in several bands are
    de-duplicated before output. The blocking is the documented
    approximation (same-bucket recall), mirroring the reference's
    MinHash band scheme. Output ``(id_a, id_b, cosine)`` with
    ``id_a < id_b``, cosine >= threshold.
    """
    bucketer = lsh_band_buckets_arrow(dim, planes, bands, seed)
    side = df.select(
        F.col(id_col).alias("_id"),
        F.col(vec_col).alias("_v"),
        l2_norm(vec_col).alias("_n"),
        F.posexplode(bucketer(vec_col)).alias("band", "bucket"),
    )
    if bucket_cap is not None:
        w = Window.partitionBy("band", "bucket").orderBy("_id")
        side = (
            side.withColumn("_rn", F.row_number().over(w))
            .filter(F.col("_rn") <= bucket_cap)
            .drop("_rn")
        )
    a = side.select(
        F.col("_id").alias("id_a"),
        F.col("_v").alias("v_a"),
        F.col("_n").alias("n_a"),
        "band",
        "bucket",
    )
    b = side.select(
        F.col("_id").alias("id_b"),
        F.col("_v").alias("v_b"),
        F.col("_n").alias("n_b"),
        "band",
        "bucket",
    )
    return (
        a.join(b, ["band", "bucket"])
        .filter(F.col("id_a") < F.col("id_b"))
        .withColumn(
            "cosine",
            F.round(dot("v_a", "v_b") / (F.col("n_a") * F.col("n_b")), 6),
        )
        .filter(F.col("cosine") >= threshold)
        .select("id_a", "id_b", "cosine")
        .distinct()
    )


def lsh_topk(
    corpus: DataFrame,
    queries: DataFrame,
    dim: int,
    k: int = 5,
    planes: int = 16,
    bands: int = 4,
    seed: int = 42,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    query_id_col: str = "query_id",
) -> DataFrame:
    """Approximate top-k with banded hyperplane LSH: equi-join on
    (band, bucket) across independent plane sets, de-duplicate the
    candidate pairs, exact cosine + window top-k. The join key is
    (band, bucket) with 2^planes buckets per band, so the blocking
    scales to large corpora and query sets (no nested-loop, no
    low-cardinality skew key)."""
    bucketer = lsh_band_buckets_arrow(dim, planes, bands, seed)
    c = corpus.select(
        F.col(id_col).alias("vec_id"),
        F.col(vec_col).alias("c_vec"),
        l2_norm(vec_col).alias("c_norm"),
        F.posexplode(bucketer(vec_col)).alias("band", "bucket"),
    )
    q = queries.select(
        F.col(query_id_col).alias("query_id"),
        F.col(vec_col).alias("q_vec"),
        l2_norm(vec_col).alias("q_norm"),
        F.posexplode(bucketer(vec_col)).alias("band", "bucket"),
    )
    scored = (
        c.join(q, ["band", "bucket"])
        .filter(F.col("vec_id") != F.col("query_id"))
        .withColumn(
            "cosine",
            F.round(
                dot("q_vec", "c_vec") / (F.col("q_norm") * F.col("c_norm")), 6
            ),
        )
        .select("query_id", "vec_id", "cosine")
        .dropDuplicates(["query_id", "vec_id"])
    )
    w = Window.partitionBy("query_id").orderBy(F.col("cosine").desc(), F.col("vec_id").asc())
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select("query_id", "vec_id", "cosine", "rank")
    )


def semantic_dedup_pairs(
    corpus: DataFrame,
    threshold: float,
    n_lists: int = 16,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    centroids: list[tuple[int, list[float]]] | None = None,
) -> DataFrame:
    """SemDeDup-style semantic near-duplicate pairs: cluster the
    corpus with the IVF coarse quantizer (Arrow-kernel assignment, one
    map-side projection), then generate candidate pairs ONLY within a
    cluster and keep exact cosine >= threshold.

    Scale shape: like the LSH blocking, never an all-pairs join — the
    equi-join key is the cluster id, whose cardinality is the model's
    ``n_lists`` knob (set ~corpus/10k at 100 TB via a trained
    quantizer); within-cluster membership is the semantic blocking
    SemDeDup relies on. Output (id_a, id_b, cosine, list_id) with
    id_a < id_b."""
    if centroids is None:
        centroids = ivf_centroid_rows(corpus, n_lists, id_col, vec_col)
    assign1 = ivf_best_lists_arrow(centroids, 1)
    side = corpus.select(
        F.col(id_col).alias("_id"),
        F.col(vec_col).alias("_v"),
        l2_norm(vec_col).alias("_n"),
        F.element_at(assign1(vec_col), 1).alias("list_id"),
    )
    a = side.select(
        F.col("_id").alias("id_a"),
        F.col("_v").alias("v_a"),
        F.col("_n").alias("n_a"),
        "list_id",
    )
    b = side.select(
        F.col("_id").alias("id_b"),
        F.col("_v").alias("v_b"),
        F.col("_n").alias("n_b"),
        "list_id",
    )
    return (
        a.join(b, "list_id")
        .filter(F.col("id_a") < F.col("id_b"))
        .withColumn(
            "cosine",
            F.round(dot("v_a", "v_b") / (F.col("n_a") * F.col("n_b")), 6),
        )
        .filter(F.col("cosine") >= threshold)
        .select("id_a", "id_b", "cosine", "list_id")
    )


def _train_slice(
    corpus: DataFrame, train_fraction: float | None, id_col: str
) -> DataFrame:
    """Deterministic training sample: keep rows whose md5-derived u32
    of the id lands under the fraction (the same cross-engine recipe
    as pipeline.sampling — ('0x'||substr(md5(id),1,8))::BIGINT %
    10000 < fraction*10000 in DuckDB). Chosen over seeded
    ``df.sample`` because it is reproducible under ANY partition
    layout — at 100-TB corpus scale the layout is never stable —
    and because an oracle can replicate it exactly."""
    if train_fraction is None:
        return corpus
    if not 0.0 < train_fraction <= 1.0:
        raise ValueError(
            f"train_fraction must be in (0, 1], got {train_fraction}"
        )
    from h3ron_spark.pipeline.sampling import hash_u32

    keep = int(round(train_fraction * 10_000))
    return corpus.filter(hash_u32(id_col) % 10_000 < keep)


def kmeans_fit(
    corpus: DataFrame,
    k: int,
    n_iter: int = 3,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    centroids: list[tuple[int, list[float]]] | None = None,
    train_fraction: float | None = None,
) -> list[tuple[int, list[float]]]:
    """Deterministic Lloyd's k-means for the IVF coarse quantizer.

    Init = the ``k`` lowest-id vectors (the untrained quantizer);
    each iteration assigns every vector to its nearest centroid by
    6-dp-rounded cosine (ties to the smaller cid — the exact
    ``ivf_best_lists_arrow`` semantics) and recomputes centroids as
    the per-dimension mean, rounded to 6 dp so the trained model is
    bit-reproducible across engines (the DuckDB oracle unrolls the
    same iterations). Empty clusters keep their previous centroid.

    Scale shape: assignment is the Arrow matmul kernel (map-side);
    the mean is a (list_id, dim) partial-agg'd groupBy; only the
    k x dim model ever reaches the driver — Lloyd's on 100 TB is
    n_iter linear scans. ``train_fraction`` decouples training cost
    from corpus size: the iterations run on a deterministic md5-slice
    of the corpus (see :func:`_train_slice`) while the init still
    takes ids < k from the full corpus (a k-row pushdown-pruned
    collect), so the model stays deterministic and the downstream
    assignment/search over the FULL corpus is unaffected in shape."""
    if centroids is None:
        centroids = ivf_centroid_rows(corpus, k, id_col, vec_col)
    cents = list(centroids)
    corpus = _train_slice(corpus, train_fraction, id_col)
    # materialize the slice once: without this every iteration re-runs
    # the md5 filter over the FULL corpus, so at scale the sampled path
    # would pay n_iter full scans anyway (MEMORY_AND_DISK — the slice
    # is train_fraction * corpus and spills if it must)
    cached = corpus.persist() if train_fraction is not None else None
    if cached is not None:
        corpus = cached
    try:
        cents = _lloyd_iterations(corpus, cents, n_iter, vec_col)
    finally:
        if cached is not None:
            cached.unpersist()
    return cents


def _lloyd_iterations(
    corpus: DataFrame,
    cents: list[tuple[int, list[float]]],
    n_iter: int,
    vec_col: str,
) -> list[tuple[int, list[float]]]:
    for _ in range(n_iter):
        assign1 = ivf_best_lists_arrow(cents, 1)
        assigned = corpus.select(
            F.element_at(assign1(vec_col), 1).alias("list_id"),
            F.posexplode(vec_col).alias("pos", "val"),
        )
        means = (
            assigned.groupBy("list_id", "pos")
            .agg(F.round(F.avg("val"), 6).alias("m"))
            .groupBy("list_id")
            .agg(
                F.array_sort(
                    F.collect_list(F.struct("pos", "m"))
                ).alias("pm")
            )
            .select(
                "list_id",
                F.transform("pm", lambda s: s["m"]).alias("cv"),
            )
            .collect()
        )
        new = {int(r["list_id"]): [float(x) for x in r["cv"]] for r in means}
        cents = [(cid, new.get(cid, cv)) for cid, cv in cents]
    return cents


# ---------------------------------------------------------------------
# Product quantization (PQ) — the compressed-domain ANN path
# ---------------------------------------------------------------------

def pq_init_books(
    corpus: DataFrame,
    m: int,
    k: int,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> list[list[tuple[int, list[float]]]]:
    """Deterministic PQ codebook init: the subvectors of the corpus
    vectors with id < k (same convention as ivf_centroid_rows), one
    independent codebook per subspace. Returns m lists of (cid,
    centroid) with centroids of length dim/m."""
    rows = ivf_centroid_rows(corpus, k, id_col, vec_col)
    if not rows:
        raise ValueError(
            f"pq_init_books: no corpus rows with {id_col} < {k} — the "
            "deterministic init convention needs the k lowest ids "
            "present (same as ivf_centroid_rows)"
        )
    dim = len(rows[0][1])
    if dim % m != 0:
        raise ValueError(
            f"pq_init_books: dim {dim} not divisible by m={m} — the "
            f"trailing {dim % m} coordinates would silently never be "
            "encoded or scored"
        )
    sub = dim // m
    return [
        [(cid, cv[s * sub : (s + 1) * sub]) for cid, cv in rows]
        for s in range(m)
    ]


def pq_assign_arrow(books: list[list[tuple[int, list[float]]]]):
    """Arrow-kernel PQ encoding: per subspace, the code (centroid id)
    minimizing the 6-dp-rounded squared L2 distance, ties to the
    smaller cid. One batched numpy pass per Arrow batch; the
    (m, k, dim/m) codebook rides in the closure — map-side only, no
    shuffle, the encode path a 100-TB corpus compresses through.

    The per-subspace distance accumulates coordinate-by-coordinate
    (left-to-right) to match the SQL oracle's explicit `+` chain."""
    cb = np.array(
        [[cv for _, cv in book] for book in books], dtype=np.float64
    )  # (m, k, sub)
    cids = np.array([[cid for cid, _ in book] for book in books])
    m, k, sub = cb.shape

    @arrow_udf(ArrayType(LongType()))
    def kernel(vec: pa.Array) -> pa.Array:
        if isinstance(vec, pa.ChunkedArray):
            vec = vec.combine_chunks()
        n = len(vec)
        if n == 0:
            return pa.array([], pa.list_(pa.int64()))
        flat = np.asarray(
            vec.flatten().to_numpy(zero_copy_only=False), dtype=np.float64
        )
        M = flat.reshape(n, m, sub)
        d = np.zeros((n, m, k), dtype=np.float64)
        for i in range(sub):
            diff = M[:, :, None, i] - cb[None, :, :, i]
            d += diff * diff
        d = np.round(d, 6)
        idx = np.argmin(d, axis=2)  # first min = smallest cid (cid-sorted)
        out = np.take_along_axis(
            np.broadcast_to(cids[None], (n, m, k)), idx[:, :, None], axis=2
        )[:, :, 0]
        offsets = np.arange(0, (n + 1) * m, m, dtype=np.int32)
        return pa.ListArray.from_arrays(
            pa.array(offsets), pa.array(out.ravel().astype(np.int64))
        )

    return kernel


def pq_fit(
    corpus: DataFrame,
    m: int = 8,
    k: int = 16,
    n_iter: int = 2,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    train_fraction: float | None = None,
) -> list[list[tuple[int, list[float]]]]:
    """Deterministic per-subspace Lloyd's for PQ codebooks (the same
    bit-reproducible recipe as kmeans_fit: 6-dp-rounded assignment
    distance with smaller-cid ties, per-coordinate means rounded to
    6 dp, empty codes keep their previous centroid — so the DuckDB
    oracle can unroll the identical iterations).

    Scale shape: assignment is the map-side Arrow kernel; the means
    are one (subspace, code, coord) partial-agg'd groupBy per
    iteration (m*k*dim/m rows to the driver — model-sized).
    ``train_fraction``: run the Lloyd iterations on a deterministic
    md5-slice (init still ids < k from the full corpus) — training
    cost decoupled from corpus size, same recipe as kmeans_fit."""
    books = pq_init_books(corpus, m, k, id_col, vec_col)
    sub = len(books[0][0][1])
    corpus = _train_slice(corpus, train_fraction, id_col)
    # same slice-materialization rationale as kmeans_fit
    cached = corpus.persist() if train_fraction is not None else None
    if cached is not None:
        corpus = cached
    try:
        return _pq_iterations(corpus, books, sub, n_iter, vec_col)
    finally:
        if cached is not None:
            cached.unpersist()


def _pq_iterations(
    corpus: DataFrame,
    books: list[list[tuple[int, list[float]]]],
    sub: int,
    n_iter: int,
    vec_col: str,
) -> list[list[tuple[int, list[float]]]]:
    for _ in range(n_iter):
        kern = pq_assign_arrow(books)
        pos_s = F.expr(f"pos div {sub}").cast("int")
        assigned = corpus.select(
            kern(vec_col).alias("codes"),
            F.posexplode(vec_col).alias("pos", "val"),
        ).select(
            pos_s.alias("s"),
            F.element_at("codes", (pos_s + 1).cast("int")).alias("code"),
            F.expr(f"pos % {sub}").cast("int").alias("i"),
            "val",
        )
        means = (
            assigned.groupBy("s", "code", "i")
            .agg(F.round(F.avg("val"), 6).alias("mv"))
            .collect()
        )
        new = {(int(r.s), int(r.code), int(r.i)): float(r.mv) for r in means}
        books = [
            [
                (
                    cid,
                    [
                        new.get((s, cid, i), cv[i])
                        for i in range(sub)
                    ],
                )
                for cid, cv in book
            ]
            for s, book in enumerate(books)
        ]
    return books


def pq_adc_dist(
    books: list[list[tuple[int, list[float]]]],
    qv_col: str = "qv",
    codes_col: str = "codes",
) -> Column:
    """Asymmetric PQ distance expression: squared L2 between the raw
    ``qv_col`` vector (array<double>) and the codeword chain selected
    by ``codes_col``, with the (m, k, dim/m) codebook embedded as
    nested literals — pure JVM arithmetic, term order matching the
    oracle's explicit left-assoc `+` chain.

    Built as ONE generated SQL string parsed by a single
    ``F.expr`` call. The previous Column-by-Column construction made
    ~m*k*(dim/m) py4j round trips for the codebook literals alone —
    ~2.1 s of driver time per invocation at (m=8, k=16, dim=64),
    re-paid on EVERY query build since the expression embeds the
    trained model (measured r10; the string build+parse is ~10 ms,
    bit-identical tree, 0 value mismatches across the full
    query-candidate cross product). Rows still carry only the m
    small-int codes — the compressed-domain scan shape at 100 TB is
    unchanged; only the driver-side expression assembly got cheap.

    ``qv_col``/``codes_col`` must be plain column identifiers (they
    are interpolated into the generated SQL verbatim), and the
    codebook must be finite — a NaN/Inf centroid from degenerate
    training would emit 'nanD'/'infD' and fail at parse time with an
    opaque error, so ``float_lit`` rejects it at build time with a
    clear one (ADVICE r10)."""
    from h3ron_spark.pipeline.sqlexpr import _is_ident, float_lit

    for cname in (qv_col, codes_col):
        if not _is_ident(cname):
            raise ValueError(
                f"pq_adc_dist: column name {cname!r} is not a plain "
                "identifier — alias the column first (names are "
                "spliced into generated SQL)"
            )
    sub = len(books[0][0][1])
    terms = []
    for s, book in enumerate(books):
        cid_arr = (
            "array(" + ",".join(f"{int(cid)}L" for cid, _ in book) + ")"
        )
        cb_s = "array(" + ",".join(
            "array(" + ",".join(float_lit(x) for x in cv) + ")"
            for _, cv in book
        ) + ")"
        pos = (
            f"array_position({cid_arr}, "
            f"cast(element_at({codes_col}, {s + 1}) as int))"
        )
        cw = f"element_at({cb_s}, cast({pos} as int))"
        for i in range(sub):
            terms.append(
                f"(element_at({qv_col}, {s * sub + i + 1}) - "
                f"element_at({cw}, {i + 1}))"
            )
    # identical left-assoc chain to the old construction:
    # ((t0*t0 + t1*t1) + t2*t2) + ... — float addition order is part
    # of the oracle contract
    expr = f"{terms[0]} * {terms[0]}"
    for t in terms[1:]:
        expr = f"({expr} + {t} * {t})"
    return F.expr(expr)


def _with_adc_dist(
    df: DataFrame,
    books: list[list[tuple[int, list[float]]]],
    qv_col: str = "qv",
    codes_col: str = "codes",
    out_col: str = "adc_dist",
) -> DataFrame:
    """Attach the 6-dp asymmetric PQ distance as ``out_col`` — same
    arithmetic as :func:`pq_adc_dist`, restructured for analyzer
    cost: the single-expression form inlines each subspace's (k, sub)
    codebook literal once PER COORDINATE (m * sub copies — the
    Catalyst analyzer walks ~8k literal nodes per query build, ~1.4 s
    of the old fresh-build time at m=8, k=16, dim=64). Here the
    selected codeword chain is projected ONCE into a temp column
    (m codebook literals total) and the distance chain references it,
    then the temp is dropped. Term order and rounding are identical,
    so the value is bit-equal and the DuckDB oracles are untouched;
    rows still carry only the m small-int codes.

    Same input contract as :func:`pq_adc_dist`: plain-identifier
    column names, finite codebook (float_lit raises otherwise)."""
    from h3ron_spark.pipeline.sqlexpr import _is_ident, float_lit

    for cname in (qv_col, codes_col):
        if not _is_ident(cname):
            raise ValueError(
                f"_with_adc_dist: column name {cname!r} is not a plain "
                "identifier — alias the column first (names are "
                "spliced into generated SQL)"
            )
    sub = len(books[0][0][1])
    tmp = f"_pq_cw_{out_col}"
    cw_terms = []
    for s, book in enumerate(books):
        cid_arr = (
            "array(" + ",".join(f"{int(cid)}L" for cid, _ in book) + ")"
        )
        cb_s = "array(" + ",".join(
            "array(" + ",".join(float_lit(x) for x in cv) + ")"
            for _, cv in book
        ) + ")"
        pos = (
            f"array_position({cid_arr}, "
            f"cast(element_at({codes_col}, {s + 1}) as int))"
        )
        cw_terms.append(f"element_at({cb_s}, cast({pos} as int))")
    terms = []
    for s in range(len(books)):
        for i in range(sub):
            terms.append(
                f"(element_at({qv_col}, {s * sub + i + 1}) - "
                f"element_at(element_at({tmp}, {s + 1}), {i + 1}))"
            )
    expr = f"{terms[0]} * {terms[0]}"
    for t in terms[1:]:
        expr = f"({expr} + {t} * {t})"
    return (
        df.withColumn(tmp, F.expr("array(" + ",".join(cw_terms) + ")"))
        .withColumn(out_col, F.expr(f"round({expr}, 6)"))
        .drop(tmp)
    )


def ivfpq_topk(
    corpus: DataFrame,
    queries: DataFrame,
    books: list[list[tuple[int, list[float]]]],
    n_lists: int = 16,
    nprobe: int = 2,
    k_top: int = 5,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    query_id_col: str = "query_id",
    centroids: list[tuple[int, list[float]]] | None = None,
) -> DataFrame:
    """IVF-PQ: the composed billion-scale ANN shape (Jegou et al.
    2011) — the coarse quantizer prunes candidates to ~nprobe/n_lists
    of the corpus (same inverted-list semantics as ivf_topk), then
    the asymmetric PQ distance scores only the probed candidates from
    their 32x-compressed codes. Both the list assignment and the PQ
    encode are map-side projections over one corpus scan; the only
    shuffle is the per-query top-k window."""
    cents = centroids or ivf_centroid_rows(corpus, n_lists, id_col, vec_col)
    assign1 = ivf_best_lists_arrow(cents, 1)
    assignp = ivf_best_lists_arrow(cents, nprobe)
    kern = pq_assign_arrow(books)
    assigned = corpus.select(
        F.col(id_col).alias("vec_id"),
        F.element_at(assign1(vec_col), 1).alias("list_id"),
        kern(vec_col).alias("codes"),
    )
    probes = queries.select(
        F.col(query_id_col).alias("query_id"),
        F.col(vec_col).cast("array<double>").alias("qv"),
        F.explode(assignp(vec_col)).alias("list_id"),
    )
    scored = _with_adc_dist(
        assigned.join(F.broadcast(probes), "list_id").filter(
            F.col("vec_id") != F.col("query_id")
        ),
        books,
    )
    w = Window.partitionBy("query_id").orderBy(
        F.asc("adc_dist"), F.asc("vec_id")
    )
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k_top)
        .select("query_id", "vec_id", "adc_dist", "rank")
    )


def pq_adc_topk(
    corpus: DataFrame,
    queries: DataFrame,
    books: list[list[tuple[int, list[float]]]],
    k_top: int = 5,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    query_id_col: str = "query_id",
) -> DataFrame:
    """Asymmetric-distance (ADC) top-k over PQ codes: candidates are
    scored by the squared L2 between the raw query and each
    candidate's RECONSTRUCTED codeword chain — the compressed-domain
    scan that makes billion-vector rerank feasible (codes are m small
    ints instead of dim floats; at 100 TB this pairs with IVF list
    pruning, here it scans all candidates to keep the oracle exact).

    Output: (query_id, vec_id, adc_dist, rank), rank by
    (6-dp-rounded distance asc, vec_id asc)."""
    kern = pq_assign_arrow(books)
    enc = corpus.select(
        F.col(id_col).alias("vec_id"), kern(vec_col).alias("codes")
    )
    q = queries.select(
        F.col(query_id_col),
        F.col(vec_col).cast("array<double>").alias("qv"),
    )
    scored = _with_adc_dist(
        q.join(F.broadcast(enc), F.col(query_id_col) != F.col("vec_id")),
        books,
    )
    w = Window.partitionBy(query_id_col).orderBy(
        F.asc("adc_dist"), F.asc("vec_id")
    )
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k_top)
        .select(query_id_col, "vec_id", "adc_dist", "rank")
    )


def blocked_exact_topk(
    corpus: DataFrame,
    queries: DataFrame,
    k: int = 5,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    query_id_col: str = "query_id",
) -> DataFrame:
    """EXACT cosine top-k with the scalable plan: a vectorized numpy
    matmul PREFILTER inside ``mapInPandas`` (one C @ Q.T per Arrow
    batch — BLAS, not |corpus| x |Q| SQL expression rows) keeps, per
    query and batch, every row within 2e-6 of the batch's (k+1)-th
    unrounded score; the surviving candidate set (~batches * |Q| * k
    rows) is then RESCORED with the exact same JVM expressions and
    6-dp rounding the brute-force path uses, so results are
    bit-identical to :func:`brute_force_topk` by construction — any
    row that could enter the final rounded, tie-broken top-k is within
    1e-6 of the true k-th unrounded score and therefore survives the
    prefilter margin (2e-6 also covers numpy-vs-JVM summation-order
    noise, ~1e-15 relative).

    This is the 100-TB exact-search shape: two linear corpus scans
    (matmul prefilter + broadcast-semi-join rescore), no cartesian
    row explosion, no shuffle wider than the candidate set. Replaces
    the deliberately-quadratic :func:`brute_force_topk` baseline
    whenever exactness is required at scale."""
    import numpy as np

    spark = corpus.sparkSession
    # the query side is collected and broadcast as a dense matrix —
    # guard it exactly like prepare_routing_graph guards its edge
    # collect (algorithms.py _BROADCAST_EDGE_LIMIT): limit(N+1) so an
    # oversized query set raises a clear error instead of OOMing the
    # driver mid-toPandas
    qp = (
        queries.select(
            F.col(query_id_col).alias("query_id"), F.col(vec_col).alias("v")
        )
        .limit(_QUERY_BROADCAST_LIMIT + 1)
        .toPandas()
    )
    if len(qp) > _QUERY_BROADCAST_LIMIT:
        raise ValueError(
            f"query count exceeds the broadcast limit "
            f"({_QUERY_BROADCAST_LIMIT}); block the query set and run "
            "blocked_exact_topk per block (results concatenate exactly "
            "— each query's top-k is independent)"
        )
    Q = np.stack(qp["v"].to_numpy()).astype(np.float64)
    qids = qp["query_id"].to_numpy(np.int64)
    qn = np.sqrt((Q * Q).sum(axis=1))
    bq = spark.sparkContext.broadcast((qids, Q, qn))

    take = k + 1  # +1: self-matches are filtered at rescore time

    def prefilter(batches):
        import pyarrow as pa

        qids_, Q_, qn_ = bq.value
        for rb in batches:
            n = rb.num_rows
            if n == 0:
                continue
            # mapInArrow: the list column flattens to one contiguous
            # float buffer — no pandas object-array of python lists
            # (measured ~2.3x on this kernel shape)
            vec = rb.column(rb.schema.get_field_index(vec_col))
            flat = pa.chunked_array([vec]).combine_chunks().flatten()
            C = (
                flat.to_numpy(zero_copy_only=False)
                .astype(np.float64)
                .reshape(n, -1)
            )
            ids = (
                rb.column(rb.schema.get_field_index(id_col))
                .to_numpy(zero_copy_only=False)
                .astype(np.int64)
            )
            cn = np.sqrt((C * C).sum(axis=1))
            cn[cn == 0.0] = 1.0
            S = (C @ Q_.T) / (cn[:, None] * qn_[None, :])
            out_ids, out_q = [], []
            for j in range(S.shape[1]):
                col = S[:, j]
                if len(col) > take:
                    kth = np.partition(col, -take)[-take]
                else:
                    kth = -np.inf
                sel = np.nonzero(col >= kth - 2e-6)[0]
                out_ids.append(ids[sel])
                out_q.append(np.full(len(sel), qids_[j], np.int64))
            yield pa.RecordBatch.from_pydict(
                {
                    "vec_id": pa.array(np.concatenate(out_ids)),
                    "query_id": pa.array(np.concatenate(out_q)),
                }
            )

    cand = corpus.mapInArrow(
        prefilter, "vec_id long, query_id long"
    )
    c = corpus.select(
        F.col(id_col).alias("vec_id"),
        F.col(vec_col).alias("c_vec"),
        l2_norm(vec_col).alias("c_norm"),
    )
    q = queries.select(
        F.col(query_id_col).alias("query_id"),
        F.col(vec_col).alias("q_vec"),
        l2_norm(vec_col).alias("q_norm"),
    )
    # broadcast the SMALL candidate set into the corpus scan (map-side
    # join) — never shuffle the corpus on vec_id
    scored = (
        c.join(F.broadcast(cand), "vec_id")
        .join(F.broadcast(q), "query_id")
        .filter(F.col("vec_id") != F.col("query_id"))
        .withColumn(
            "cosine",
            F.round(
                dot("q_vec", "c_vec") / (F.col("q_norm") * F.col("c_norm")),
                6,
            ),
        )
    )
    w = Window.partitionBy("query_id").orderBy(
        F.col("cosine").desc(), F.col("vec_id").asc()
    )
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select("query_id", "vec_id", "cosine", "rank")
    )


def ivfpq_rerank_topk(
    corpus: DataFrame,
    queries: DataFrame,
    books: list[list[tuple[int, list[float]]]],
    n_lists: int = 16,
    nprobe: int = 2,
    k_short: int = 20,
    k_top: int = 5,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    query_id_col: str = "query_id",
    centroids: list[tuple[int, list[float]]] | None = None,
) -> DataFrame:
    """Two-stage retrieval (the standard production shape): the
    compressed-domain IVF-PQ scan shortlists ``k_short`` candidates
    per query from 8-byte codes, then ONLY those rows are rescored
    with the exact cosine against the raw vectors — quantization
    error affects recall (which ``k_short`` headroom buys back), not
    the final ordering. The rescore joins the tiny candidate set into
    the corpus scan by broadcast; cost is |Q| * k_short exact
    distances regardless of corpus size."""
    shortlist = ivfpq_topk(
        corpus, queries, books,
        n_lists=n_lists, nprobe=nprobe, k_top=k_short,
        id_col=id_col, vec_col=vec_col, query_id_col=query_id_col,
        centroids=centroids,
    ).select("query_id", "vec_id")
    c = corpus.select(
        F.col(id_col).alias("vec_id"),
        F.col(vec_col).alias("c_vec"),
        l2_norm(vec_col).alias("c_norm"),
    )
    q = queries.select(
        F.col(query_id_col).alias("query_id"),
        F.col(vec_col).alias("q_vec"),
        l2_norm(vec_col).alias("q_norm"),
    )
    rescored = (
        c.join(F.broadcast(shortlist), "vec_id")
        .join(F.broadcast(q), "query_id")
        .withColumn(
            "cosine",
            F.round(
                dot("q_vec", "c_vec") / (F.col("q_norm") * F.col("c_norm")),
                6,
            ),
        )
    )
    w = Window.partitionBy("query_id").orderBy(
        F.col("cosine").desc(), F.col("vec_id").asc()
    )
    return (
        rescored.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k_top)
        .select("query_id", "vec_id", "cosine", "rank")
    )


def save_quantizer(
    spark,
    path: str,
    centroids: list[tuple[int, list[float]]] | None = None,
    books: list[list[tuple[int, list[float]]]] | None = None,
) -> None:
    """Persist a trained retrieval model (IVF coarse centroids and/or
    PQ codebooks) as one parquet table: (kind, subspace, cid, vec).
    Train-once/search-many is the operational shape at corpus scale —
    quantizer training is the expensive, sampled, offline step
    (kmeans_fit/pq_fit train_fraction) while search jobs just load
    kilobytes of model and broadcast it."""
    rows = []
    for cid, vec in centroids or []:
        rows.append(("ivf", -1, int(cid), [float(x) for x in vec]))
    for s, book in enumerate(books or []):
        for cid, vec in book:
            rows.append(("pq", s, int(cid), [float(x) for x in vec]))
    spark.createDataFrame(
        rows, "kind string, subspace int, cid int, vec array<double>"
    ).coalesce(1).write.mode("errorifexists").parquet(path)


def load_quantizer(spark, path: str):
    """Load a model saved by :func:`save_quantizer`. Returns
    (centroids, books) with the exact list/tuple shapes kmeans_fit /
    pq_fit produce (floats round-trip exactly through parquet
    doubles, so searches with a loaded model are bit-identical)."""
    rows = spark.read.parquet(path).collect()
    centroids = sorted(
        (int(r.cid), [float(x) for x in r.vec])
        for r in rows
        if r.kind == "ivf"
    )
    pq_rows = [r for r in rows if r.kind == "pq"]
    books: list[list[tuple[int, list[float]]]] = []
    if pq_rows:
        n_sub = max(int(r.subspace) for r in pq_rows) + 1
        books = [[] for _ in range(n_sub)]
        for r in pq_rows:
            books[int(r.subspace)].append(
                (int(r.cid), [float(x) for x in r.vec])
            )
        books = [sorted(b) for b in books]
    return (centroids or None), (books or None)
