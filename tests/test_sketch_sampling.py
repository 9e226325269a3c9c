"""Unit tests for pipeline/sketch.py (deterministic HLL) and
sampling.weighted_sample (A-ES weighted reservoir)."""

from __future__ import annotations

from pyspark.sql import functions as F

from h3ron_spark.pipeline import sampling as SA
from h3ron_spark.pipeline import sketch as SK


def _corpus(spark, n=2000, groups=2):
    return spark.range(n * groups).select(
        (F.col("id") % groups).cast("string").alias("g"),
        F.concat(F.lit("value-"), F.col("id")).alias("v"),
    )


def test_hll_estimate_within_error_envelope(spark):
    # 2000 distinct values per group, 256 registers: stderr is
    # 1.04/sqrt(256) ~ 6.5%; 3 sigma ~ 20%. Deterministic hash, so
    # this is a fixed number, not a flaky statistical bound.
    out = SK.hll_distinct(_corpus(spark), "v", ["g"]).collect()
    assert len(out) == 2
    for r in out:
        assert abs(r.hll_est - 2000) / 2000 < 0.2


def test_hll_duplicate_invariance(spark):
    """Cardinality sketches must ignore multiplicity: feeding every
    row twice cannot move a single register."""
    df = _corpus(spark, n=500, groups=1)
    once = SK.hll_distinct(df, "v", ["g"]).collect()[0]
    twice = SK.hll_distinct(df.union(df), "v", ["g"]).collect()[0]
    assert once.hll_est == twice.hll_est
    assert once.regs_used == twice.regs_used


def test_hll_small_range_correction(spark):
    # 5 distinct values: raw HLL over-corrects tiny sets; linear
    # counting must kick in and land near-exact.
    df = spark.range(5).select(
        F.lit("g").alias("g"), F.col("id").cast("string").alias("v")
    )
    r = SK.hll_distinct(df, "v", ["g"]).collect()[0]
    assert abs(r.hll_est - 5) < 1.0
    assert r.regs_used <= 5


def test_weighted_sample_k_per_group_and_deterministic(spark):
    docs = spark.range(300).select(
        F.col("id").alias("doc_id"),
        (F.col("id") % 3).cast("string").alias("src"),
        (F.col("id") % 7 + 1).alias("w"),
    )
    a = SA.weighted_sample(docs, 10, "w", ["src"]).orderBy(
        "src", "sample_rank"
    )
    b = SA.weighted_sample(docs, 10, "w", ["src"]).orderBy(
        "src", "sample_rank"
    )
    rows_a, rows_b = a.collect(), b.collect()
    assert rows_a == rows_b
    per = {}
    for r in rows_a:
        per.setdefault(r.src, []).append(r.sample_rank)
    assert set(per) == {"0", "1", "2"}
    for ranks in per.values():
        assert ranks == list(range(1, 11))


def test_weighted_sample_prefers_heavy_rows(spark):
    # 500 rows of weight 1000 vs 500 of weight 1: a 100-row draw
    # should be dominated by the heavy half (the expected heavy share
    # is ~99.9%; the hash draw is deterministic so the count is fixed)
    docs = spark.range(1000).select(
        F.col("id").alias("doc_id"),
        F.lit("s").alias("src"),
        F.when(F.col("id") < 500, F.lit(1000)).otherwise(F.lit(1)).alias("w"),
    )
    picked = SA.weighted_sample(docs, 100, "w", ["src"]).collect()
    heavy = sum(1 for r in picked if r.doc_id < 500)
    assert heavy >= 90


def test_weighted_sample_zero_weight_clamped(spark):
    docs = spark.range(20).select(
        F.col("id").alias("doc_id"),
        F.lit("s").alias("src"),
        F.lit(0).alias("w"),
    )
    out = SA.weighted_sample(docs, 5, "w", ["src"]).collect()
    assert len(out) == 5
    assert all(r.aes_key >= 0 for r in out)


def test_kmv_sketch_bounded_and_sorted(spark):
    from pyspark.sql import functions as F2

    df = spark.range(5000).select(
        (F2.col("id") % 2).cast("string").alias("src"),
        F2.concat(F2.lit("tok-"), F2.col("id")).alias("v"),
    )
    sk = SK.kmv_sketch(df, "v", "src", k=32)
    rows = sk.collect()
    per = {}
    for r in rows:
        per.setdefault(r.g, []).append(r.h)
    assert set(per) == {"0", "1"}
    for hs in per.values():
        assert len(hs) == 32
        assert hs == sorted(hs)  # the k MINIMUM values


def test_kmv_overlap_exact_on_unsaturated_sets(spark):
    # two groups sharing exactly 10 of 30 values each, k large enough
    # to hold everything: the estimator must return the EXACT jaccard
    from pyspark.sql import functions as F2

    a = spark.range(30).select(
        F2.lit("A").alias("src"), F2.concat(F2.lit("v"), F2.col("id")).alias("v")
    )
    b = spark.range(20, 50).select(
        F2.lit("B").alias("src"), F2.concat(F2.lit("v"), F2.col("id")).alias("v")
    )
    sk = SK.kmv_sketch(a.union(b), "v", "src", k=64)
    out = SK.kmv_pair_overlap(sk, k=64).collect()
    assert len(out) == 1
    r = out[0]
    assert (r.g1, r.g2) == ("A", "B")
    assert r.inter_k == 10 and r.union_k == 50
    assert r.jaccard_est == 10 / 50


def test_kmv_overlap_duplicate_invariance(spark):
    from pyspark.sql import functions as F2

    a = spark.range(100).select(
        (F2.col("id") % 2).cast("string").alias("src"),
        F2.concat(F2.lit("v"), (F2.col("id") % 40)).alias("v"),
    )
    once = SK.kmv_pair_overlap(SK.kmv_sketch(a, "v", "src", k=16), k=16)
    twice = SK.kmv_pair_overlap(
        SK.kmv_sketch(a.union(a), "v", "src", k=16), k=16
    )
    assert once.collect() == twice.collect()


def test_hll_merge_equals_direct(spark):
    """Register-wise max merge of per-shard sketches must equal the
    sketch built directly over the union (max is associative) — the
    mergeability contract hierarchical 100 TB roll-ups rely on."""
    df = _corpus(spark, n=800, groups=4)  # 'g' plays the shard role
    per_shard = SK.hll_registers(df, "v", ["g"])
    merged = SK.hll_estimate(SK.hll_merge(per_shard, []), []).collect()[0]
    direct = SK.hll_estimate(SK.hll_registers(df, "v", []), []).collect()[0]
    assert merged.hll_est == direct.hll_est
    assert merged.regs_used == direct.regs_used


def test_cms_overestimate_guarantee_and_exactness(spark):
    """With w=8 on 200 distinct values, collisions are forced: every
    estimate must be >= the true count (one-sided CMS guarantee), and
    hot items must still be separated from the long tail."""
    from pyspark.sql import functions as F2

    # value i appears i+1 times, i in 0..49
    df = spark.range(50).select(
        F2.explode(
            F2.transform(
                F2.sequence(F2.lit(0), F2.col("id").cast("int")),
                lambda _: F2.concat(F2.lit("w"), F2.col("id")),
            )
        ).alias("v")
    )
    cms = SK.cms_build(df, "v", w=8)
    items = df.groupBy("v").agg(F2.count(F2.lit(1)).alias("n"))
    out = SK.cms_lookup(cms, items, "v", w=8).collect()
    assert len(out) == 50
    for r in out:
        assert r.cms_est >= r.n


def test_cms_shard_merge_by_sum(spark):
    """Sketches of two shards summed counter-wise must equal the
    sketch of the union — the mergeability contract."""
    from pyspark.sql import functions as F2

    df = spark.range(400).select(
        F2.concat(F2.lit("t"), (F2.col("id") % 37)).alias("v"),
        (F2.col("id") % 2).alias("shard"),
    )
    whole = SK.cms_build(df, "v")
    a = SK.cms_build(df.filter("shard = 0"), "v")
    b = SK.cms_build(df.filter("shard = 1"), "v")
    summed = (
        a.union(b)
        .groupBy("j", "bucket")
        .agg(F2.sum("cnt").alias("cnt"))
    )
    assert sorted(map(tuple, whole.collect())) == sorted(
        map(tuple, summed.collect())
    )


def test_bloom_no_false_negatives(spark):
    """The Bloom guarantee: every inserted value probes maybe=True,
    regardless of filter load."""
    from pyspark.sql import functions as F2

    from h3ron_spark.pipeline.sketch import bloom_build, bloom_contains

    vals = spark.range(500).select(
        F2.concat(F2.lit("item-"), F2.col("id")).alias("v")
    )
    bloom = bloom_build(vals, "v", m_words=8)  # deliberately tiny
    probed = bloom_contains(bloom, vals, "v", m_words=8)
    assert probed.filter(~F2.col("bloom_maybe")).count() == 0


def test_bloom_definitely_absent_and_one_sided(spark):
    """Values never inserted can come back maybe=True (false positive)
    but a maybe=False answer is always correct; at sane load the
    false-positive rate is near the (1-e^-kn/m)^k envelope."""
    from pyspark.sql import functions as F2

    from h3ron_spark.pipeline.sketch import bloom_build, bloom_contains

    ins = spark.range(300).select(
        F2.concat(F2.lit("in-"), F2.col("id")).alias("v")
    )
    out = spark.range(2000).select(
        F2.concat(F2.lit("out-"), F2.col("id")).alias("v")
    )
    bloom = bloom_build(ins, "v", m_words=64)  # n=300, m=4032, k=3
    probed = bloom_contains(bloom, out, "v", m_words=64).collect()
    fp = sum(1 for r in probed if r.bloom_maybe)
    # envelope ~ (1 - e^(-900/4032))^3 ~ 0.8%; allow 4x headroom
    assert fp / len(probed) < 0.035
    # definite-absent rows truly are absent (trivially true here, but
    # asserts the column isn't inverted)
    assert all(r.v.startswith("out-") for r in probed)


def test_bloom_shard_merge_equals_whole(spark):
    """bit_or merge of per-shard filters == the filter of the union
    (same grid, same seeds) — the 100-TB shard-then-merge path."""
    from pyspark.sql import functions as F2

    from h3ron_spark.pipeline.sketch import bloom_build, bloom_merge

    vals = spark.range(400).select(
        F2.concat(F2.lit("x"), F2.col("id")).alias("v"),
        (F2.col("id") % 3).alias("shard"),
    )
    whole = bloom_build(vals, "v", m_words=32)
    shards = [
        bloom_build(vals.filter(F2.col("shard") == s), "v", m_words=32)
        for s in range(3)
    ]
    merged = bloom_merge(shards[0].union(shards[1]).union(shards[2]))
    assert sorted(map(tuple, whole.collect())) == sorted(
        map(tuple, merged.collect())
    )


def test_bloom_contains_broadcasts_filter(spark):
    """Plan pin: the probe side never shuffles — the filter joins in
    via BroadcastHashJoin (the corpus-scale contract)."""
    from pyspark.sql import functions as F2

    from h3ron_spark.pipeline.sketch import bloom_build, bloom_contains

    vals = spark.range(100).select(F2.col("id").cast("string").alias("v"))
    bloom = bloom_build(vals, "v", m_words=16)
    plan = bloom_contains(bloom, vals, "v", m_words=16)._jdf.queryExecution().executedPlan().toString()
    assert "BroadcastHashJoin" in plan
    assert "SortMergeJoin" not in plan


def test_hdr_bucket_exact_small_range(spark):
    """Values below 2^sub_bits are their own bucket: quantiles in the
    small range are EXACT, and bucket lower bounds invert the id."""
    from pyspark.sql import functions as F2

    from h3ron_spark.pipeline.sketch import hdr_bucket, hdr_bucket_low

    rows = (
        spark.range(32)
        .select(
            F2.col("id").alias("v"),
            hdr_bucket("id").alias("b"),
        )
        .withColumn("lo", hdr_bucket_low("b"))
        .collect()
    )
    assert all(r.b == r.v and r.lo == r.v for r in rows)


def test_hdr_bucket_monotone_and_bound(spark):
    """Bucket ids are monotone in v and bucket_low(b) <= v holds with
    relative gap < 2^-5 — the sketch's accuracy envelope."""
    from pyspark.sql import functions as F2

    from h3ron_spark.pipeline.sketch import hdr_bucket, hdr_bucket_low

    vals = spark.createDataFrame(
        [(v,) for v in [0, 1, 31, 32, 33, 100, 999, 12345, 2**20 + 7,
                        2**40 + 123, 2**62]],
        ["v"],
    )
    rows = (
        vals.select("v", hdr_bucket("v").alias("b"))
        .withColumn("lo", hdr_bucket_low("b"))
        .orderBy("v")
        .collect()
    )
    prev_b = -1
    for r in rows:
        assert r.b >= prev_b
        prev_b = r.b
        assert r.lo <= r.v
        if r.v >= 32:
            assert (r.v - r.lo) / r.v < 2 ** -5 * 2  # one bucket width


def test_hdr_quantiles_close_to_exact(spark):
    """p50/p90/p99 from the sketch land within one bucket width of
    numpy's exact higher-interpolation percentiles."""
    import numpy as np
    from pyspark.sql import functions as F2

    from h3ron_spark.pipeline.sketch import hdr_histogram, hdr_quantiles

    data = [(int(7 + (i * i) % 5000),) for i in range(4000)]
    df = spark.createDataFrame(data, ["v"]).withColumn("g", F2.lit("x"))
    hist = hdr_histogram(df, "v", ["g"])
    got = {r.q: r.q_low for r in hdr_quantiles(hist, ["g"]).collect()}
    arr = np.array([d[0] for d in data])
    for q in (0.5, 0.9, 0.99):
        exact = np.percentile(arr, q * 100, method="lower")
        assert got[q] <= exact * 1.001
        assert got[q] >= exact * (1 - 2 ** -4), (q, got[q], exact)


def test_hdr_merge_equals_whole_and_bounded_state(spark):
    from pyspark.sql import functions as F2

    from h3ron_spark.pipeline.sketch import (
        hdr_histogram,
        hdr_merge,
        hdr_quantiles,
    )

    df = spark.range(5000).select(
        (F2.col("id") % 4).alias("shard"),
        ((F2.col("id") * 37) % 100000).alias("v"),
    ).withColumn("g", F2.lit("all"))
    whole = hdr_histogram(df, "v", ["g"])
    shards = hdr_histogram(df, "v", ["g", "shard"]).drop("shard")
    merged = hdr_merge(shards, ["g"])
    assert sorted(map(tuple, whole.collect())) == sorted(
        map(tuple, merged.collect())
    )
    # bounded state: far fewer buckets than distinct values
    assert whole.count() < 600
    q_w = sorted(map(tuple, hdr_quantiles(whole, ["g"]).collect()))
    q_m = sorted(map(tuple, hdr_quantiles(merged, ["g"]).collect()))
    assert q_w == q_m


def test_kmv_set_cardinalities_envelope_and_exact_when_unsaturated(spark):
    """Saturated pair: union/intersection estimates land within the
    ~1/sqrt(k-2) KMV envelope of truth. Unsaturated pair: est_union
    equals the exact distinct union (the sketch IS the set)."""
    from pyspark.sql import functions as F2

    from h3ron_spark.pipeline.sketch import (
        kmv_set_cardinalities,
        kmv_sketch,
    )

    rows = (
        [("A", f"x{i}") for i in range(1000)]
        + [("B", f"x{i}") for i in range(500, 1500)]
        + [("C", f"x{i}") for i in range(990, 1010)]  # tiny: unsaturated with B
    )
    df = spark.createDataFrame(rows, ["g", "v"])
    sk = kmv_sketch(df, "v", "g", k=64)
    out = {(r.g1, r.g2): r for r in kmv_set_cardinalities(sk, k=64).collect()}
    ab = out[("A", "B")]
    assert abs(ab.est_union - 1500) / 1500 < 0.30
    assert abs(ab.est_inter - 500) / 500 < 0.35
    # A-C / B-C: C has only 20 values; union with a saturated sketch
    # still saturates, but C alone vs itself isn't a pair — check the
    # unsaturated branch directly with two tiny groups
    tiny = spark.createDataFrame(
        [("X", f"a{i}") for i in range(30)]
        + [("Y", f"a{i}") for i in range(20, 50)],
        ["g", "v"],
    )
    sk2 = kmv_sketch(tiny, "v", "g", k=64)
    xy = kmv_set_cardinalities(sk2, k=64).collect()[0]
    assert xy.est_union == 50  # exact: sketch unsaturated
    assert xy.est_inter == 10  # jaccard exact too (10/50)


def test_incremental_rollup_merge_equals_direct(spark):
    """The monoid property behind pipeline_incremental_rollup: partial
    HLL registers + count/sum state from two disjoint shards, merged,
    equals the direct whole-table rollup bit-for-bit."""
    from pyspark.sql import functions as F2

    from h3ron_spark.pipeline import sketch as SK

    df = spark.range(3000).select(
        (F2.col("id") % 7).alias("g"),
        (F2.col("id") * 37 % 211).alias("u"),
        (F2.col("id") % 100).alias("v"),
    )
    base, delta = df.filter("id % 5 < 4"), df.filter("id % 5 = 4")

    def est(regs):
        return {
            tuple(r)
            for r in SK.hll_estimate(SK.hll_merge(regs, ["g"]), ["g"], p=8)
            .select("g", "hll_est", "regs_used")
            .collect()
        }

    merged = est(
        SK.hll_registers(base, "u", ["g"], p=8).unionByName(
            SK.hll_registers(delta, "u", ["g"], p=8)
        )
    )
    direct = est(SK.hll_registers(df, "u", ["g"], p=8))
    assert merged == direct

    def partial(d):
        return d.groupBy("g").agg(
            F2.count(F2.lit(1)).alias("n"), F2.sum("v").alias("s")
        )

    two_phase = {
        tuple(r)
        for r in partial(base)
        .unionByName(partial(delta))
        .groupBy("g")
        .agg(F2.sum("n").alias("n"), F2.sum("s").alias("s"))
        .collect()
    }
    whole = {tuple(r) for r in partial(df).collect()}
    assert two_phase == whole


def test_chunk_documents_coverage_and_overlap(spark):
    """text.chunk_documents: every token covered exactly once outside
    overlaps, consecutive chunks share exactly `overlap` tokens,
    short docs give one chunk, reconstruction round-trips."""
    import pytest as _pytest
    from pyspark.sql import functions as F2

    from h3ron_spark.pipeline.text import chunk_documents

    docs = [
        (1, " ".join(f"w{i}" for i in range(10))),   # 10 toks: 1 chunk
        (2, " ".join(f"x{i}" for i in range(12))),   # 12: 12<=ct -> 1
        (3, " ".join(f"y{i}" for i in range(13))),   # 13: 2 chunks
        (4, " ".join(f"z{i}" for i in range(40))),   # 40: ceil(28/8)+1=5
        (5, "single"),
    ]
    df = spark.createDataFrame(docs, "doc_id long, text string")
    out = chunk_documents(df, chunk_tokens=12, overlap=4).collect()
    by_doc = {}
    for r in out:
        by_doc.setdefault(r["id"], []).append(r)
    for d in by_doc.values():
        d.sort(key=lambda r: r["chunk_id"])
    assert [len(by_doc[i]) for i in (1, 2, 3, 4, 5)] == [1, 1, 2, 5, 1]
    # consecutive chunks overlap by exactly 4 tokens; stride 8
    for r1, r2 in zip(by_doc[4], by_doc[4][1:]):
        t1, t2 = r1["chunk_text"].split(), r2["chunk_text"].split()
        assert t1[8:] == t2[: len(t1) - 8]
    # reconstruction: first chunk whole, subsequent chunks minus the
    # 4-token overlap = the original token stream exactly
    for i, text in docs:
        rec = by_doc[i][0]["chunk_text"].split()
        for r in by_doc[i][1:]:
            rec.extend(r["chunk_text"].split()[4:])
        assert rec == text.split(), i
    # n_tokens matches the actual window sizes
    for r in out:
        assert r["n_tokens"] == len(r["chunk_text"].split())
    with _pytest.raises(ValueError):
        chunk_documents(df, chunk_tokens=8, overlap=8)


def _reference_bpe(word_counts, num_merges):
    """Independent single-process BPE (Sennrich et al.): word-freq
    dict in, ordered merge list out. Same tie-break contract as
    pipeline/bpe.py: count desc, then lexicographic pair."""
    from h3ron_spark.pipeline.bpe import END

    vocab = {tuple(list(w) + [END]): n for w, n in word_counts.items()}
    merges = []
    for _ in range(num_merges):
        counts = {}
        for syms, n in vocab.items():
            for p in zip(syms, syms[1:]):
                counts[p] = counts.get(p, 0) + n
        if not counts:
            break
        best = min(counts.items(), key=lambda kv: (-kv[1], kv[0]))
        if best[1] < 2:
            break
        (a, b) = best[0]
        merges.append((a, b))
        nv = {}
        for syms, n in vocab.items():
            out, i = [], 0
            while i < len(syms):
                if i + 1 < len(syms) and syms[i] == a and syms[i + 1] == b:
                    out.append(a + b)
                    i += 2
                else:
                    out.append(syms[i])
                    i += 1
            nv[tuple(out)] = nv.get(tuple(out), 0) + n
        vocab = nv
    return merges


def test_bpe_train_matches_reference_and_encode_roundtrips(spark):
    """Distributed BPE training == the independent reference on the
    same corpus (merge list equality — order and all), and encoding
    is lossless: concatenating a word's BPE tokens (end sentinel
    stripped) reconstructs the word."""
    from collections import Counter

    from h3ron_spark.pipeline.bpe import END, bpe_encode, bpe_train

    texts = [
        "the quick brown fox jumps over the lazy dog",
        "the quicker the better said the brown bear",
        "low lower lowest newer newest wider widest",
        "low low low lower lower newest newest newest",
        "hugging faces hug huge hugs hugely",
    ] * 3
    df = spark.createDataFrame([(t,) for t in texts], "text string")

    got = bpe_train(df, num_merges=25)
    wc = Counter(w for t in texts for w in t.split())
    want = _reference_bpe(wc, 25)
    assert got == want and len(got) == 25

    enc = bpe_encode(df.limit(5), got).collect()
    for r in enc:
        rebuilt = "".join(r["bpe_tokens"]).replace(END, " ").strip()
        assert rebuilt == " ".join(r["text"].split())
        # every token is either learned vocab or a residual char
        assert all(len(t) >= 1 for t in r["bpe_tokens"])


def test_bpe_train_partitioning_invariant(spark):
    """The merge list is bit-identical regardless of input layout —
    integer counts + total tie-break leave nothing to shuffle order."""
    from h3ron_spark.pipeline.bpe import bpe_train

    texts = [("ab ab abc abcd " * 4,), ("xy xyz ab abc " * 3,)] * 4
    df1 = spark.createDataFrame(texts, "text string").coalesce(1)
    df2 = spark.createDataFrame(texts, "text string").repartition(16)
    assert bpe_train(df1, num_merges=10) == bpe_train(df2, num_merges=10)


def test_chunk_documents_degenerate_inputs(spark):
    """Empty / whitespace-only / tab-led docs: zero real tokens emit
    ZERO chunks (not one empty chunk), and non-space whitespace does
    not inflate token counts."""
    from h3ron_spark.pipeline.text import chunk_documents

    df = spark.createDataFrame(
        [(1, ""), (2, "   "), (3, "\t\n "), (4, "\thello\nworld")],
        "doc_id long, text string",
    )
    out = chunk_documents(df, chunk_tokens=8, overlap=2).collect()
    assert {r["id"] for r in out} == {4}
    assert len(out) == 1
    assert out[0]["chunk_text"] == "hello world" and out[0]["n_tokens"] == 2


def test_redact_pii_battery(spark):
    """text.redact_pii: each kind redacted with its sentinel and
    counted; SSN wins over phone; emails keep embedded dotted quads
    from matching ipv4 twice; clean text untouched with zero counts;
    plan stays JVM-only."""
    from pyspark.sql import functions as F2

    from h3ron_spark.pipeline.text import redact_pii

    rows = [
        (1, "mail me at jane.doe+x@corp.example.org today"),
        (2, "server 10.0.255.7 and 999.1.1.1 are not both IPs"),
        (3, "ssn 123-45-6789 vs phone +1 (415) 555-0199 ok"),
        (4, "totally clean text with no identifiers"),
        (5, "two mails: a@b.io c@d.co and ip 192.168.0.1"),
    ]
    df = spark.createDataFrame(rows, "id long, text string")
    out = {
        r["id"]: r["pii"]
        for r in df.select("id", redact_pii("text").alias("pii")).collect()
    }
    assert out[1]["n_email"] == 1 and "<EMAIL>" in out[1]["clean_text"]
    assert "jane" not in out[1]["clean_text"]
    assert out[2]["n_ipv4"] == 1  # 999.1.1.1 is not a valid dotted quad
    assert out[3]["n_ssn"] == 1 and out[3]["n_phone"] == 1
    assert "<SSN>" in out[3]["clean_text"] and "<PHONE>" in out[3]["clean_text"]
    assert out[4]["clean_text"] == rows[3][1]
    assert all(out[4][f"n_{k}"] == 0 for k in ("ssn", "email", "phone", "ipv4"))
    assert out[5]["n_email"] == 2 and out[5]["n_ipv4"] == 1

    plan = (
        df.select(redact_pii("text"))
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    assert "EvalPython" not in plan

    import pytest as _pytest

    with _pytest.raises(ValueError):
        redact_pii("text", kinds=["email", "dna"])


def test_bpe_merges_persist_roundtrip(spark, tmp_path):
    """save_merges/load_merges: the model round-trips exactly and the
    loaded model encodes identically to the in-memory one."""
    from h3ron_spark.pipeline.bpe import (
        bpe_encode,
        bpe_train,
        load_merges,
        save_merges,
    )

    df = spark.createDataFrame(
        [("low lower lowest low low newer newest",)] * 4, "text string"
    )
    merges = bpe_train(df, num_merges=8)
    save_merges(spark, merges, f"{tmp_path}/bpe_model")
    loaded = load_merges(spark, f"{tmp_path}/bpe_model")
    assert loaded == merges
    a = bpe_encode(df.limit(1), merges).collect()[0]["bpe_tokens"]
    b = bpe_encode(df.limit(1), loaded).collect()[0]["bpe_tokens"]
    assert a == b
