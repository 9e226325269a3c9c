"""Unit tests for the pure-SQL bit-level H3 functions.

Ground truth: hand-computed indexes per the public H3 bit layout, plus
known constants from the spec (12 pentagon base cells, 122 base cells).
Mirrors the reference's known-value test idiom (SURVEY §5).
"""

from __future__ import annotations

from pyspark.sql import functions as F

from h3ron_spark.functions import bits as B


def make_cell(base: int, digits: list[int], res: int) -> int:
    c = (1 << 59) | (res << 52) | (base << 45)
    for i, d in enumerate(digits, start=1):
        c |= d << (3 * (15 - i))
    c |= (1 << (3 * (15 - res))) - 1
    return c


def one_value(spark, col):
    return spark.range(1).select(col.alias("v")).collect()[0]["v"]


def test_resolution_and_base_cell(spark):
    c = make_cell(20, [3, 5], 2)
    assert one_value(spark, B.h3_get_resolution(F.lit(c))) == 2
    assert one_value(spark, B.h3_get_base_cell(F.lit(c))) == 20
    assert one_value(spark, B.h3_get_mode(F.lit(c))) == 1


def test_index_digits(spark):
    c = make_cell(20, [3, 5, 1], 3)
    assert one_value(spark, B.h3_get_index_digit(F.lit(c), 1)) == 3
    assert one_value(spark, B.h3_get_index_digit(F.lit(c), 2)) == 5
    assert one_value(spark, B.h3_get_index_digit(F.lit(c), 3)) == 1
    assert one_value(spark, B.h3_get_index_digit(F.lit(c), 4)) == 7  # unused
    # column-res variant must agree
    assert one_value(spark, B.h3_get_index_digit(F.lit(c), F.lit(2))) == 5


def test_parent_and_center_child_roundtrip(spark):
    child = make_cell(33, [1, 2, 3, 4], 4)
    parent2 = make_cell(33, [1, 2], 2)
    assert one_value(spark, B.h3_to_parent(F.lit(child), 2)) == parent2
    # parent deeper than res -> NULL
    assert one_value(spark, B.h3_to_parent(F.lit(parent2), 3)) is None
    # center child of the parent at res 4 has digits 1,2,0,0
    cc = make_cell(33, [1, 2, 0, 0], 4)
    assert one_value(spark, B.h3_to_center_child(F.lit(parent2), 4)) == cc
    # center child shallower than res -> NULL
    assert one_value(spark, B.h3_to_center_child(F.lit(child), 2)) is None
    # roundtrip: parent(center_child(c)) == c
    assert one_value(
        spark, B.h3_to_parent(B.h3_to_center_child(F.lit(parent2), 9), 2)
    ) == parent2


def test_children_nextres(spark):
    c = make_cell(33, [1], 1)
    kids = one_value(spark, B.h3_to_children_nextres(F.lit(c)))
    assert len(kids) == 7
    assert kids[0] == make_cell(33, [1, 0], 2)
    assert kids[6] == make_cell(33, [1, 6], 2)
    # every child's parent is c
    for k in kids:
        assert one_value(spark, B.h3_to_parent(F.lit(k), 1)) == c
    # pentagon: 6 children, digit 1 skipped
    p = make_cell(38, [0], 1)
    pkids = one_value(spark, B.h3_to_children_nextres(F.lit(p)))
    assert len(pkids) == 6
    assert make_cell(38, [0, 1], 2) not in pkids


def test_pentagon_predicate(spark):
    assert one_value(spark, B.h3_is_pentagon(F.lit(make_cell(38, [0, 0], 2))))
    assert not one_value(spark, B.h3_is_pentagon(F.lit(make_cell(38, [0, 2], 2))))
    assert not one_value(spark, B.h3_is_pentagon(F.lit(make_cell(33, [0, 0], 2))))


def test_validity(spark):
    assert one_value(spark, B.h3_is_valid_cell(F.lit(make_cell(33, [1, 2], 2))))
    # digit 7 in used range -> invalid
    bad = make_cell(33, [1, 2], 2) | (7 << 42)
    assert not one_value(spark, B.h3_is_valid_cell(F.lit(bad)))
    # base cell >= 122 -> invalid
    assert not one_value(spark, B.h3_is_valid_cell(F.lit(make_cell(123, [0], 1))))
    # pentagon with leading digit 1 (K axis) -> invalid
    assert not one_value(spark, B.h3_is_valid_cell(F.lit(make_cell(38, [1], 1))))
    # non-pentagon with leading digit 1 -> valid
    assert one_value(spark, B.h3_is_valid_cell(F.lit(make_cell(33, [1], 1))))
    # trailing digits not 7 -> invalid
    notrail = make_cell(33, [1], 1) & ~(1 << 30)
    assert not one_value(spark, B.h3_is_valid_cell(F.lit(notrail)))
    # wrong mode -> invalid; int 55 and NULL propagate
    assert not one_value(spark, B.h3_is_valid_cell(F.lit(55)))
    assert one_value(spark, B.h3_is_valid_cell(F.lit(None).cast("long"))) is None


def test_hierarchy_predicates(spark):
    parent = make_cell(33, [1], 1)
    child = make_cell(33, [1, 4, 2], 3)
    other = make_cell(33, [2], 1)
    assert one_value(spark, B.h3_is_parent_of(F.lit(parent), F.lit(child)))
    assert one_value(spark, B.h3_is_parent_of(F.lit(parent), F.lit(parent)))
    assert not one_value(spark, B.h3_is_parent_of(F.lit(other), F.lit(child)))
    assert not one_value(spark, B.h3_is_parent_of(F.lit(child), F.lit(parent)))


def test_string_roundtrip(spark):
    c = make_cell(20, [3, 5], 2)
    s = one_value(spark, B.h3_to_string(F.lit(c)))
    assert len(s) == 15 and s == s.lower()
    assert one_value(spark, B.h3_from_string(F.lit(s))) == c


def test_parse_numeric_forms(spark):
    """S28 FromStr precedence (cell.rs:375-397): hex first, then
    decimal u64, each gated on cell validity."""
    c = make_cell(20, [3, 5], 2)
    hex_s = format(c, "x")
    assert one_value(spark, B.h3_parse_numeric(F.lit(hex_s))) == c
    assert one_value(spark, B.h3_parse_numeric(F.lit(str(c)))) == c
    # doc example (cell.rs:363-371): the decimal form of a real cell
    assert (
        one_value(spark, B.h3_parse_numeric(F.lit("617700169518678015")))
        == 0x89283080DDBFFFF
    )
    # invalid everything -> NULL
    for bad in ["zzz", "", "123", str((1 << 63) + 5), "ffffffffffffffff"]:
        assert one_value(spark, B.h3_parse_numeric(F.lit(bad))) is None


def test_parse_coordinate_form(spark):
    """S28 "x,y,res" form (cell.rs:425-437): x=lng, y=lat, "," or ";"
    separators, optional blanks, trailing rest ignored (nom parity)."""
    from h3ron_spark.functions import geo as G
    from h3ron_spark.h3core import cells as h3c

    expect = h3c.latlng_to_cell(12.3, 23.3, 6)
    for s in [
        "23.3,12.3,6",
        " 23.3 ; 12.3 , 6",
        "23.3,12.3,6 with trailing garbage",
    ]:
        assert one_value(spark, G.h3_parse(F.lit(s))) == expect
    # numeric forms via the combined parser
    c = make_cell(20, [3, 5], 2)
    assert one_value(spark, G.h3_parse(F.lit(format(c, "x")))) == c
    assert one_value(spark, G.h3_parse(F.lit(str(c)))) == c
    # res out of range / missing fields -> NULL
    for bad in ["1,2,99", "12,34", "a,b,5", None]:
        assert (
            one_value(spark, G.h3_parse(F.lit(bad).cast("string"))) is None
        )
    # nom parity quirk, pinned deliberately: u8_str is
    # take_while_m_n(1, 2, digit) (cell.rs:419-423) — it consumes AT
    # MOST two digits and the rest is ignored trailing input, so
    # "...,015" parses res "01" = 1 and "...,123" parses res 12
    r1 = h3c.latlng_to_cell(12.3, 23.3, 1)
    r12 = h3c.latlng_to_cell(12.3, 23.3, 12)
    assert one_value(spark, G.h3_parse(F.lit("23.3,12.3,015"))) == r1
    assert one_value(spark, G.h3_parse(F.lit("23.3,12.3,123"))) == r12


def test_edge_bits(spark):
    origin = make_cell(33, [1, 2], 2)
    edge = (origin & ~(15 << 59)) | (2 << 59) | (3 << 56)
    assert one_value(spark, B.h3_edge_origin(F.lit(edge))) == origin
    assert one_value(spark, B.h3_edge_direction(F.lit(edge))) == 3
    assert one_value(spark, B.h3_is_valid_directed_edge(F.lit(edge)))
    assert not one_value(spark, B.h3_is_valid_directed_edge(F.lit(origin)))
    # direction 0 or 7 invalid
    for d in (0, 7):
        e = (origin & ~(15 << 59)) | (2 << 59) | (d << 56)
        assert not one_value(spark, B.h3_is_valid_directed_edge(F.lit(e)))


def test_direction_digits_and_avg_lookups(spark):
    import h3ron_spark.h3core as h3c

    cell = h3c.latlng_to_cell(37.76, -122.44, 6)
    df = spark.range(1).select(F.lit(cell).alias("cell"))
    row = df.select(
        B.h3_directions_over_resolutions("cell").alias("dirs"),
        B.h3_direction_to_parent("cell").alias("d_par"),
        B.h3_direction_to_parent("cell", 2).alias("d_par3"),
        B.h3_hexagon_area_avg_km2(B.h3_get_resolution("cell")).alias("a_km2"),
        B.h3_edge_length_avg_m(B.h3_get_resolution("cell")).alias("e_m"),
        B.h3_cell_centroid_distance_avg_m(
            B.h3_get_resolution("cell")
        ).alias("cd_m"),
    ).collect()[0]
    # digits match direct bit extraction per resolution
    want = [(cell >> (3 * (15 - r))) & 7 for r in range(1, 7)]
    assert row.dirs == want
    # reference semantics (direction.rs:62-117): direction_to_parent
    # reads the digit AT the target res; default target is res-1
    assert row.d_par == want[4]
    assert row.d_par3 == want[1]
    # public H3 4.1 table values
    assert abs(row.a_km2 - 36.129062164) < 1e-9
    assert abs(row.e_m - 3724.532667) < 1e-6
    assert abs(row.cd_m - 3724.532667 * 1.7320508075688772) < 1e-6
    # target == cell res is direction() (valid); beyond it -> NULL
    # (ResMismatch parity, direction.rs:89-96)
    row2 = df.select(
        B.h3_direction_to_parent("cell", 6).alias("at_res"),
        B.h3_direction_to_parent("cell", 7).alias("beyond"),
    ).collect()[0]
    assert row2.at_res == want[5]
    assert row2.beyond is None


def test_bpe_ish_tokens_match_duckdb(spark):
    """Training-pipeline token counting: the BPE-pre-tokenizer regex
    must split identically in Spark (Java regex) and DuckDB (RE2)."""
    import duckdb

    from h3ron_spark.pipeline import text as TX

    samples = [
        ("Hello, world! it's 42 deg.",),
        ("  multi   space\ttab\nnewline  ",),
        ("no-punct",),
        ("1+1=2; x_y",),
    ]
    df = spark.createDataFrame(samples, "text string")
    got = [
        (r.t, r.n)
        for r in df.select(
            TX.bpe_ish_tokens("text").alias("t"),
            TX.bpe_ish_token_count("text").alias("n"),
        ).collect()
    ]
    con = duckdb.connect()
    for (text,), (toks, n) in zip(samples, got):
        exp = con.execute(
            r"SELECT regexp_extract_all(?, '[A-Za-z0-9]+|[^A-Za-z0-9\s]')",
            [text],
        ).fetchone()[0]
        assert toks == exp and n == len(exp)


def test_repetition_fractions_discriminate(spark):
    """Gopher-style gates: a degenerate repeated-token doc and a
    repeated-bigram doc FAIL; a diverse doc passes. (The synthetic
    corpus is diverse, so this is the discriminating fixture.)"""
    from pyspark.sql import functions as F

    from h3ron_spark.pipeline import text as TX

    rows = [
        (1, "spam " * 50),                      # one token repeated
        (2, "tick tock " * 30),                 # one bigram repeated
        (3, " ".join(f"w{i}" for i in range(60))),  # fully diverse
        (4, "solo"),                            # 1 token: bigram frac 0
    ]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    out = {
        r["doc_id"]: r
        for r in df.select(
            "doc_id",
            TX.top_token_fraction("text").alias("tt"),
            TX.top_bigram_fraction("text").alias("tb"),
            TX.repetition_flags("text").alias("ok"),
        ).collect()
    }
    assert out[1]["tt"] == 1.0 and not out[1]["ok"]
    assert out[2]["tb"] > 0.49 and not out[2]["ok"]
    assert out[3]["tt"] < 0.05 and out[3]["tb"] == 0.0169 and out[3]["ok"]
    assert out[4]["tt"] == 1.0 and out[4]["tb"] == 0.0 and not out[4]["ok"]


def test_paragraph_dedup_keep_first_and_null_when_empty(spark):
    from h3ron_spark.pipeline import dedup as DD

    rows = [
        (1, "alpha\nbeta\nalpha"),   # within-doc duplicate of alpha
        (2, "beta\ngamma"),          # beta already seen in doc 1
        (3, "alpha\nbeta"),          # fully duplicated -> NULL text
    ]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    out = {
        r["id"]: r for r in DD.paragraph_dedup(df).collect()
    }
    assert (out[1]["n_lines"], out[1]["n_kept"]) == (3, 2)
    assert out[1]["text"] == "alpha\nbeta"
    assert (out[2]["n_lines"], out[2]["n_kept"]) == (2, 1)
    assert out[2]["text"] == "gamma"
    assert (out[3]["n_lines"], out[3]["n_kept"]) == (2, 0)
    assert out[3]["text"] is None


def test_paragraph_dedup_corpus_hot_key(spark):
    """A boilerplate paragraph shared by EVERY document (the skew case
    the groupBy-min design exists for): exactly one global survivor,
    every doc keeps its unique lines, and no per-key window sort is in
    the plan."""
    from pyspark.sql import functions as F

    from h3ron_spark.pipeline import dedup as DD

    docs = spark.range(2000).select(
        F.col("id").alias("doc_id"),
        F.concat(
            F.lit("shared boilerplate line\nunique-"),
            F.col("id").cast("string"),
        ).alias("text"),
    )
    out = DD.paragraph_dedup(docs)
    agg = out.agg(
        F.sum("n_lines").alias("nl"),
        F.sum("n_kept").alias("nk"),
        F.sum((F.col("n_kept") == 2).cast("int")).alias("full"),
    ).collect()[0]
    assert agg["nl"] == 4000
    assert agg["nk"] == 2001  # 2000 unique + ONE boilerplate survivor
    assert agg["full"] == 1   # only doc 0 keeps both lines
    plan = out._jdf.queryExecution().explainString(
        spark._jvm.org.apache.spark.sql.execution.ExplainMode.fromString(
            "formatted"
        )
    )
    assert "Window" not in plan


def test_sql_function_surface_matches_column_layer(spark):
    """The registered SQL functions (bodies DERIVED from the bits.py
    Column expressions) agree with the Column layer over the full
    battery: valid cells of several resolutions, pentagons, corrupted
    digits, and NULLs — both layers are the same implementation
    rendered two ways, and this pins the rendering."""
    from pyspark.sql import functions as F2

    from h3ron_spark.functions import bits as B2
    from h3ron_spark.functions.sql import register_h3_sql

    names = register_h3_sql(spark)
    assert "h3_is_valid_cell" in names

    cells = spark.range(4000).select(
        F2.when(F2.col("id") % 29 == 0, None)
        .otherwise(
            B2.h3_build_cell(
                F2.when(F2.col("id") % 20 == 0, F2.lit(38)).otherwise(
                    25 + F2.col("id") % 13
                ),
                [
                    F2.when(F2.col("id") % 20 == 0, F2.lit(0)).otherwise(
                        F2.col("id") % 7
                    ),
                    F2.when(F2.col("id") % 20 == 0, F2.lit(0)).otherwise(
                        (F2.col("id") + 3) % 7
                    ),
                ],
                2,
            ).bitwiseOR(
                F2.when(F2.col("id") % 31 == 0, F2.lit(7 << 39)).otherwise(
                    F2.lit(0)
                )
            )
        )
        .alias("c")
    )
    cells.createOrReplaceTempView("sqlfn_cells")
    via_sql = spark.sql(
        """SELECT c, h3_resolution(c) AS r, h3_base_cell(c) AS b,
                  h3_is_valid_cell(c) AS v, h3_is_pentagon(c) AS p,
                  h3_to_parent(c, 1) AS par, h3_center_child(c, 4) AS ch,
                  h3_digit(c, 2) AS d
           FROM sqlfn_cells"""
    ).collect()
    via_col = cells.select(
        "c",
        B2.h3_get_resolution("c").alias("r"),
        B2.h3_get_base_cell("c").alias("b"),
        B2.h3_is_valid_cell("c").alias("v"),
        B2.h3_is_pentagon("c").alias("p"),
        B2.h3_to_parent("c", 1).alias("par"),
        B2.h3_to_center_child("c", 4).alias("ch"),
        B2.h3_get_index_digit("c", 2).alias("d"),
    ).collect()
    assert sorted(map(tuple, via_sql), key=str) == sorted(
        map(tuple, via_col), key=str
    )
