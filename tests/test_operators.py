"""Unit invariants for operator-level primitives (no Spark needed)."""

import itertools

from presto_copy_spark.operators.similarity import SIGN_BITS, _sign_matrix


def test_sign_matrix_rows_distinct_and_balanced():
    """Regression for the power-of-two-LCG low-bit trap: x & 1 alternates
    with period 2, which made all 16 hyperplane rows identical and
    collapsed the 2^16 bucket space to {0, 65535}."""
    m = _sign_matrix()
    assert len({tuple(r) for r in m}) == SIGN_BITS  # all rows distinct
    for row in m:
        assert abs(sum(row)) <= len(row) // 2  # roughly balanced +/-
    # hyperplanes should be near-orthogonal, not copies of each other
    for a, b in itertools.combinations(m, 2):
        corr = abs(sum(x * y for x, y in zip(a, b))) / len(a)
        assert corr < 0.6


def test_classification_thresholds_values(spark):
    from presto_copy_spark.functions.presto import classification_thresholds

    row = spark.range(1).select(classification_thresholds(4).alias("t")).first()
    assert row["t"] == [0.0, 0.25, 0.5, 0.75]


def test_noisy_gaussian_seeded_deterministic(spark):
    from pyspark.sql import functions as F

    from presto_copy_spark.functions.presto import (
        gaussian_noise,
        noisy_count_gaussian,
        noisy_sum_gaussian,
    )

    df = spark.range(1000).withColumn("g", F.col("id") % 10)

    def run():
        return sorted(
            (r["g"], r["nc"], r["ns"])
            for r in df.groupBy("g")
            .agg(
                noisy_count_gaussian("id", 5.0, 42, F.first("g")).alias("nc"),
                noisy_sum_gaussian("id", 100.0, 42, F.first("g")).alias("ns"),
            )
            .collect()
        )

    a, b = run(), run()
    assert a == b  # seeded noise is deterministic across runs
    # noise actually perturbs but stays within 6 sigma of exact
    exact = {r["g"]: (r["n"], r["s"]) for r in
             df.groupBy("g").agg(F.count("id").alias("n"), F.sum("id").alias("s")).collect()}
    assert any(nc != exact[g][0] for g, nc, _ in a)
    for g, nc, ns in a:
        assert abs(nc - exact[g][0]) <= 30  # 6 sigma at scale 5
        assert abs(ns - exact[g][1]) <= 600  # 6 sigma at scale 100
    # distribution sanity: 20k seeded draws ~ N(0,1)
    z = spark.range(20000).select(gaussian_noise(1.0, 3, F.col("id")).alias("z"))
    st = z.agg(F.avg("z").alias("m"), F.stddev("z").alias("s")).first()
    assert abs(st["m"]) < 0.05 and abs(st["s"] - 1.0) < 0.05


def test_noisy_count_clips_at_zero(spark):
    from pyspark.sql import functions as F

    from presto_copy_spark.functions.presto import noisy_count_gaussian

    # 1-row groups + huge scale: some draws go negative, all clip to >= 0
    df = spark.range(200).withColumn("g", F.col("id"))
    rows = df.groupBy("g").agg(
        noisy_count_gaussian("id", 50.0, 7, F.first("g")).alias("nc")
    ).collect()
    assert all(r["nc"] >= 0 for r in rows)
    assert any(r["nc"] == 0 for r in rows)


def test_qdigest_accessor_invariants(spark):
    from pyspark.sql import functions as F

    from presto_copy_spark.functions.presto import (
        merge_qdigest,
        quantile_at_value,
        value_at_quantile,
        values_at_quantiles,
    )

    df = spark.range(10000).select((F.col("id") % 1000).cast("double").alias("x"))
    sk = df.agg(F.kll_sketch_agg_double("x").alias("sk"))
    row = sk.select(
        value_at_quantile("sk", 0.5).alias("med"),
        values_at_quantiles("sk", [0.1, 0.9]).alias("vq"),
        quantile_at_value("sk", 250.0).alias("rank_250"),
    ).first()
    assert abs(row["med"] - 500) < 30  # uniform 0..999
    assert abs(row["vq"][0] - 100) < 30 and abs(row["vq"][1] - 900) < 30
    assert abs(row["rank_250"] - 0.25) < 0.02  # rank(v) ~= quantile of v
    # scalar merge of two halves ~= sketch of the whole
    lo = df.filter("x < 500").agg(F.kll_sketch_agg_double("x").alias("a"))
    hi = df.filter("x >= 500").agg(F.kll_sketch_agg_double("x").alias("b"))
    m = lo.crossJoin(hi).select(
        value_at_quantile(merge_qdigest("a", "b"), 0.5).alias("med")
    ).first()
    assert abs(m["med"] - 500) < 30


def test_array_map_lambda_helpers(spark):
    from pyspark.sql import functions as F

    from presto_copy_spark.functions.presto import (
        combinations_2,
        find_first,
        find_first_index,
        map_top_n,
    )

    row = spark.range(1).select(
        find_first(F.array(F.lit(3), F.lit(8), F.lit(12)), lambda x: x > 5).alias("ff"),
        find_first(F.array(F.lit(3)), lambda x: x > 5).alias("ff_none"),
        find_first_index(F.array(F.lit(3), F.lit(8)), lambda x: x > 5).alias("ffi"),
        find_first_index(F.array(F.lit(3)), lambda x: x > 5).alias("ffi_none"),
        combinations_2(F.array(F.lit("a"), F.lit("b"), F.lit("c"))).alias("c2"),
        map_top_n(
            F.create_map(
                F.lit("a"), F.lit(1.0), F.lit("b"), F.lit(3.0), F.lit("c"), F.lit(2.0)
            ),
            2,
        ).alias("topn"),
    ).first()
    assert row["ff"] == 8 and row["ff_none"] is None
    assert row["ffi"] == 2 and row["ffi_none"] is None
    assert [list(p) for p in row["c2"]] == [["a", "b"], ["a", "c"], ["b", "c"]]
    assert row["topn"] == {"b": 3.0, "c": 2.0}


def test_set_digest_merge_and_estimator(spark):
    from pyspark.sql import functions as F

    from presto_copy_spark.operators.aggregates import (
        SET_DIGEST_K,
        digest_cardinality,
        digest_jaccard,
        merge_set_digests,
        set_digest,
    )

    # 3 disjoint groups of 200 distinct values each (21k mod 600 cycles)
    df = spark.range(1200).select(
        (F.col("id") % 3).alias("g"), ((F.col("id") * 7) % 600).alias("v")
    )
    dig = set_digest(df, ["g"], F.col("v").cast("string"))
    rows = {r["g"]: r["digest"] for r in dig.collect()}
    for d in rows.values():
        assert len(d) == SET_DIGEST_K and d == sorted(d)

    # estimator sanity: K=32 gives ~1/sqrt(31) ~ 18% relative sigma, and
    # the md5 draw is deterministic per value set — one of these fixed
    # groups lands ~1.8x over, so the bound is a 2.2x sanity check, not a
    # confidence interval
    est = {
        r["g"]: r["e"]
        for r in dig.select("g", digest_cardinality(F.col("digest")).alias("e")).collect()
    }
    true_n = {
        r["g"]: r["n"]
        for r in df.groupBy("g").agg(F.countDistinct("v").alias("n")).collect()
    }
    for g, e in est.items():
        assert 0.45 * true_n[g] < e < 2.2 * true_n[g]

    # merging the per-group digests == digest built over the whole set
    merged = merge_set_digests(dig.withColumn("all", F.lit(1)), ["all"])
    whole = set_digest(
        df.withColumn("all", F.lit(1)), ["all"], F.col("v").cast("string")
    )
    assert merged.select("digest").first()["digest"] == whole.select("digest").first()["digest"]

    # jaccard of identical digests is 1.0; of disjoint sets near 0
    a = dig.filter("g = 0").select(F.col("digest").alias("da"))
    j_self = a.crossJoin(a.select(F.col("da").alias("db"))).select(
        digest_jaccard(F.col("da"), F.col("db")).alias("j")
    ).first()["j"]
    assert j_self == 1.0


def test_ipv6_ip_functions(spark):
    from pyspark.sql import functions as F

    from presto_copy_spark.functions.presto import (
        ip_prefix_any,
        ip_subnet_max_any,
        ip_subnet_min_any,
        is_subnet_of_any,
    )

    df = spark.createDataFrame(
        [("2001:db8:85a3::8a2e:370:7334", 48), ("192.168.1.17", 24), (None, 8)],
        "ip string, bits int",
    )
    rows = df.select(
        ip_prefix_any("ip", "bits").alias("pfx"),
        ip_subnet_min_any(ip_prefix_any("ip", "bits")).alias("lo"),
        ip_subnet_max_any(ip_prefix_any("ip", "bits")).alias("hi"),
        is_subnet_of_any(ip_prefix_any("ip", "bits"), F.col("ip")).alias("inn"),
    ).collect()
    v6, v4, nul = rows
    assert v6["pfx"] == "2001:db8:85a3::/48"
    assert v6["lo"] == "2001:db8:85a3::"
    assert v6["hi"] == "2001:db8:85a3:ffff:ffff:ffff:ffff:ffff"
    assert v6["inn"] is True
    assert v4["pfx"] == "192.168.1.0/24"
    assert v4["lo"] == "192.168.1.0" and v4["hi"] == "192.168.1.255"
    assert v4["inn"] is True
    assert nul["pfx"] is None and nul["inn"] is None


def test_salted_join_matches_plain_join(spark):
    from pyspark.sql import functions as F

    from presto_copy_spark.operators.join import salted_join

    # heavily skewed fact: 90% of rows share key 0
    fact = spark.range(10000).select(
        F.when(F.col("id") % 10 < 9, 0).otherwise(F.col("id") % 100).alias("k"),
        F.col("id").alias("v"),
    )
    dim = spark.range(100).select(F.col("id").alias("k"), (F.col("id") * 10).alias("d"))

    plain = fact.join(dim, "k").groupBy("k").agg(
        F.count(F.lit(1)).alias("n"), F.sum("v").alias("sv"), F.first("d").alias("d")
    )
    salted = salted_join(fact, dim, "k", n_salt=8).groupBy("k").agg(
        F.count(F.lit(1)).alias("n"), F.sum("v").alias("sv"), F.first("d").alias("d")
    )
    assert sorted(map(tuple, plain.collect())) == sorted(map(tuple, salted.collect()))

    # left join keeps unmatched fact rows exactly once
    dim_small = dim.filter("k < 50")
    pl = fact.join(dim_small, "k", "left").count()
    sl = salted_join(fact, dim_small, "k", n_salt=4, how="left").count()
    assert pl == sl == fact.count()

    # the join really runs on (k, _salt)
    j = salted_join(fact, dim, "k", n_salt=8)
    plan = j._jdf.queryExecution().analyzed().toString()
    assert "_salt" in plan


def test_tier2_array_functions(spark):
    from pyspark.sql import functions as F

    from presto_copy_spark.functions.presto import (
        array_frequency,
        array_least_frequent,
        array_max_by,
        array_min_by,
        array_sort_desc,
        array_top_n,
        remove_nulls,
    )

    arr = F.array(
        F.lit(3), F.lit(1), F.lit(None).cast("int"), F.lit(1), F.lit(7), F.lit(1)
    )
    row = spark.range(1).select(
        remove_nulls(arr).alias("rn"),
        array_sort_desc(arr).alias("sd"),
        array_top_n(arr, 2).alias("top2"),
        array_max_by(F.array(F.lit("aa"), F.lit("b"), F.lit("cccc")), lambda s: F.length(s)).alias("mx"),
        array_min_by(F.array(F.lit("aa"), F.lit("b"), F.lit("cccc")), lambda s: F.length(s)).alias("mn"),
        array_frequency(arr).alias("freq"),
        array_least_frequent(arr, 2).alias("lf2"),
    ).first()
    assert row["rn"] == [3, 1, 1, 7, 1]
    assert row["sd"] == [7, 3, 1, 1, 1, None]
    assert row["top2"] == [7, 3]
    assert row["mx"] == "cccc" and row["mn"] == "b"
    assert row["freq"] == {3: 1, 1: 3, 7: 1}
    # rarest first, ties by value ascending: 3 and 7 both count 1
    assert row["lf2"] == [3, 7]


def test_tier2_map_string_sampling_functions(spark):
    from pyspark.sql import functions as F

    from presto_copy_spark.functions.presto import (
        all_keys_match,
        any_keys_match,
        any_values_match,
        key_sampling_percent,
        map_keys_by_top_n_values,
        map_remove_null_values,
        map_top_n_keys,
        map_top_n_values,
        no_keys_match,
        no_values_match,
        replace_first,
        trail,
    )

    m = F.create_map(
        F.lit("a"), F.lit(1), F.lit("b"), F.lit(3), F.lit("c"), F.lit(2)
    )
    mn = F.map_from_arrays(
        F.array(F.lit("x"), F.lit("y")),
        F.array(F.lit(5), F.lit(None).cast("int")),
    )
    row = spark.range(1).select(
        map_top_n_keys(m, 2).alias("tk"),
        map_top_n_values(m, 2).alias("tv"),
        map_keys_by_top_n_values(m, 2).alias("kbv"),
        map_remove_null_values(mn).alias("rmn"),
        all_keys_match(m, lambda k: F.length(k) == 1).alias("akm"),
        any_keys_match(m, lambda k: k == "b").alias("anym"),
        any_values_match(m, lambda v: v > 2).alias("avm"),
        no_keys_match(m, lambda k: k == "z").alias("nkm"),
        no_values_match(m, lambda v: v > 10).alias("nvm"),
        replace_first(F.lit("abcabc"), "bc", "X").alias("rf"),
        replace_first(F.lit("abc"), "zz", "X").alias("rf_none"),
        trail(F.lit("abcdef"), 3).alias("tr"),
        trail(F.lit("ab"), 5).alias("tr_all"),
        key_sampling_percent(F.lit("hello")).alias("ksp"),
    ).first()
    assert row["tk"] == ["c", "b"]
    assert row["tv"] == [3, 2]
    assert sorted(row["kbv"]) == ["b", "c"]
    assert row["rmn"] == {"x": 5}
    assert row["akm"] and row["anym"] and row["avm"] and row["nkm"] and row["nvm"]
    assert row["rf"] == "aXabc" and row["rf_none"] == "abc"
    assert row["tr"] == "def" and row["tr_all"] == "ab"
    assert 0.0 <= row["ksp"] < 1.0
    # cross-engine twin agrees
    import duckdb

    from presto_copy_spark.functions.presto import sql_key_sampling_percent

    duck = duckdb.sql(f"SELECT {sql_key_sampling_percent(chr(39)+'hello'+chr(39))} AS k").fetchone()[0]
    assert abs(duck - row["ksp"]) < 1e-12


def test_compat_aggregates_large_group_loglinear(spark):
    """VERDICT r2 item 5: the Presto-named compat aggregates must handle
    a 100k-element group in bounded time/memory through the compat NAME.
    The old distinct-then-refilter forms were O(group * distinct) —
    100k rows * 1k distinct = 10^8 comparisons per group; the
    sorted-runs forms are O(n log n) and finish in seconds."""
    from pyspark.sql import functions as F

    from presto_copy_spark.functions.presto import (
        approx_most_frequent,
        histogram,
        map_union,
        multimap_agg,
    )

    n, d = 100_000, 1_000
    df = spark.range(n).select(
        F.lit("g").alias("g"),
        (F.col("id") % d).alias("v"),
        F.concat(F.lit("k"), (F.col("id") % d).cast("string")).alias("k"),
    )
    row = (
        df.groupBy("g")
        .agg(
            histogram("v").alias("h"),
            approx_most_frequent(3, "v").alias("amf"),
            multimap_agg("k", "v").alias("mm"),
        )
        .collect()[0]
    )
    assert len(row.h) == d and all(c == n // d for c in row.h.values())
    assert len(row.amf) == 3 and all(c == n // d for c in row.amf.values())
    assert len(row.mm) == d and sorted(row.mm["k7"]) == [7] * (n // d)

    # map_union over 10k single-entry maps with 1k distinct keys
    maps = spark.range(10_000).select(
        F.lit("g").alias("g"),
        F.create_map(
            F.concat(F.lit("k"), (F.col("id") % d).cast("string")), F.col("id")
        ).alias("m"),
    )
    [mu] = maps.groupBy("g").agg(map_union("m").alias("u")).collect()
    assert len(mu.u) == d
    # deterministic winner: smallest (key, value) entry per key
    assert mu.u["k7"] == 7


def test_compat_aggregate_values_match_reference_semantics(spark):
    """Small-group value checks for the rewritten sorted-runs forms."""
    from pyspark.sql import functions as F

    from presto_copy_spark.functions.presto import (
        approx_most_frequent,
        histogram,
        map_union,
        multimap_agg,
        numeric_histogram,
    )

    df = spark.createDataFrame(
        [("g", x, k) for x, k in [(1, "a"), (1, "a"), (2, "a"), (3, "b"), (3, "b"), (3, "b")]],
        "g string, v int, k string",
    )
    row = (
        df.groupBy("g")
        .agg(
            histogram("v").alias("h"),
            approx_most_frequent(2, "v").alias("amf"),
            multimap_agg("k", "v").alias("mm"),
            numeric_histogram(2, "v", 1, 4).alias("nh"),
        )
        .collect()[0]
    )
    assert dict(row.h) == {1: 2, 2: 1, 3: 3}
    assert dict(row.amf) == {3: 3, 1: 2}  # top-2 by count
    assert sorted(row.mm["a"]) == [1, 1, 2] and sorted(row.mm["b"]) == [3, 3, 3]
    assert dict(row.nh) == {1: 3, 2: 3}  # width_bucket(v, 1, 4, 2)

    maps = spark.createDataFrame(
        [("g", {"a": 1, "b": 9}), ("g", {"b": 2, "c": 3})],
        "g string, m map<string,int>",
    )
    [mu] = maps.groupBy("g").agg(map_union("m").alias("u")).collect()
    assert dict(mu.u) == {"a": 1, "b": 2, "c": 3}


def test_streaming_batch_parity_twins(spark, sf_dir):
    """bench.py prices the streaming rows via their batch-parity twins
    (same DataFrame plan, batch source) — prove row-for-row equality so
    the substitution is sound (streaming machinery is reported
    separately in the bench JSON)."""
    from presto_copy_spark.queries import registry
    from presto_copy_spark.streaming.jobs import BATCH_PARITY

    registry.load_all()
    assert set(BATCH_PARITY) == {
        "events_streaming_tumbling",
        "events_streaming_session",
        "events_stateful_profile",
        "events_streaming_dedup",
    }
    for name, parity in BATCH_PARITY.items():
        a = registry.QUERIES[name](spark, sf_dir)
        b = parity(spark, sf_dir)
        assert a.columns == b.columns, name
        # sorted-rows compare, not exceptAll: Spark 4.1 hits
        # INTERNAL_ERROR_ATTRIBUTE_NOT_FOUND resolving exceptAll over a
        # countDistinct aggregate, and these results are tiny
        ra = sorted(map(tuple, a.collect()))
        rb = sorted(map(tuple, b.collect()))
        assert ra == rb, name


def test_ml_sql_learn_classify_multigroup(spark):
    """SQL-surface ML functions: learn_classifier per group, classify
    against the model (functions/ml_sql.py; presto-ml MLFunctions)."""
    from presto_copy_spark.functions import register_all

    register_all(spark)
    spark.createDataFrame(
        [("a", [0.0, 0.0]), ("a", [0.2, 0.2]), ("b", [10.0, 10.0]), ("b", [9.0, 11.0])],
        "label string, f array<double>",
    ).createOrReplaceTempView("ml_train")
    [m] = spark.sql(
        "SELECT learn_classifier(label, f) AS model FROM ml_train"
    ).collect()
    assert sorted(m.model) == ["a", "b"]
    assert m.model["a"] == [0.1, 0.1] and m.model["b"] == [9.5, 10.5]
    rows = spark.sql(
        """
        SELECT classify(q.f, t.model) AS p FROM
          (SELECT learn_classifier(label, f) AS model FROM ml_train) t,
          (SELECT array(0.05D, 0.0D) AS f UNION ALL SELECT array(9.9D, 10.0D)) q
        """
    ).collect()
    assert sorted(r.p for r in rows) == ["a", "b"]


def test_wkt_geometry_functions(spark):
    """WKT geometry subset (functions/geometry.py; GeoFunctions.java
    stGeometryFromText/stArea/stCentroid/stContains/stLength): known
    shapes incl. a polygon with a hole, and WKT round-trip."""
    from pyspark.sql import functions as F

    from presto_copy_spark.functions import geometry as G

    df = spark.createDataFrame(
        [
            ("POLYGON ((0 0, 4 0, 4 4, 0 4, 0 0))",),
            ("POLYGON ((0 0, 6 0, 6 6, 0 6, 0 0), (2 2, 4 2, 4 4, 2 4, 2 2))",),
            ("LINESTRING (0 0, 3 4, 3 10)",),
            ("POINT (2.5 -3)",),
        ],
        "wkt string",
    )
    g = G.st_geometry_from_text(F.col("wkt"))
    rows = df.select(
        G.st_geometry_type(g).alias("t"),
        G.st_area(g).alias("area"),
        G.st_length(g).alias("length"),
        G.st_num_points(g).alias("np"),
        G.st_centroid(g).alias("c"),
        G.st_polygon_contains_point(g, F.lit(3.0), F.lit(3.0)).alias("has33"),
        G.st_envelope_of(g).alias("env"),
    ).collect()
    sq, hole, line, pt = rows
    assert (sq.t, sq.area, sq.np, (sq.c.x, sq.c.y), sq.has33) == (
        "ST_Polygon", 16.0, 5, (2.0, 2.0), True)
    # hole subtracts area; the (3,3) probe falls INSIDE the hole
    assert (hole.area, hole.has33, (hole.c.x, hole.c.y)) == (32.0, False, (3.0, 3.0))
    assert (line.t, line.length, line.area) == ("ST_Linestring", 11.0, 0.0)
    assert (pt.c.x, pt.c.y, pt.env.xmin, pt.env.ymax) == (2.5, -3.0, 2.5, -3.0)
    # round-trip: parse(st_as_text(parse(wkt))) preserves area
    rt = df.select(
        G.st_area(
            G.st_geometry_from_text(G.st_as_text(G.st_geometry_from_text(F.col("wkt"))))
        ).alias("a")
    ).collect()
    assert [r.a for r in rt] == [16.0, 32.0, 0.0, 0.0]


def test_wkt_geometry_sql_surface(spark):
    """The ST_* names through SQL text (Engine.transpile path) with
    Presto signatures: ST_GeometryFromText / ST_Area / ST_Contains
    (point probe) / ST_Point / ST_Length / ST_X/Y."""
    from presto_copy_spark.engine import Engine
    from presto_copy_spark.functions import register_all

    register_all(spark)
    [r] = spark.sql(
        Engine.transpile(
            "SELECT"
            " ST_Area(ST_GeometryFromText('POLYGON ((0 0, 6 0, 6 6, 0 6, 0 0),"
            " (2 2, 4 2, 4 4, 2 4, 2 2))')) AS area,"
            " ST_Contains(ST_GeometryFromText('POLYGON ((0 0, 4 0, 4 4, 0 4, 0 0))'),"
            "   ST_Point(1, 1)) AS inside,"
            " ST_Contains(ST_GeometryFromText('POLYGON ((0 0, 4 0, 4 4, 0 4, 0 0))'),"
            "   ST_Point(9, 9)) AS outside,"
            " ST_Length(ST_GeometryFromText('LINESTRING (0 0, 3 4)')) AS len,"
            " ST_X(ST_Point(2.5, -3)) AS px,"
            " ST_GeometryType(ST_GeometryFromText('MULTIPOINT ((1 1), (2 2))')) AS t"
        )
    ).collect()
    assert (r.area, r.inside, r.outside, r.len, r.px, r.t) == (
        32.0, True, False, 5.0, 2.5, "ST_Multipoint")


def test_bmp_codec_round_trip():
    """Real uncompressed-image path (operators/multimodal.py): BMP
    encode/decode round-trip incl. odd widths (row padding), nearest
    resize, real feature vector, honest stub for compressed magics."""
    import numpy as np

    from presto_copy_spark.operators.multimodal import (
        FEATURE_DIM,
        _bmp_features,
        decode_image,
        encode_bmp,
        resize_nearest,
    )

    rng = np.random.default_rng(7)
    for h, w in [(1, 1), (5, 3), (8, 8), (11, 17)]:
        px = rng.integers(0, 256, (h, w, 3), dtype=np.uint8)
        assert (decode_image(encode_bmp(px)) == px).all()
    img = np.zeros((4, 4, 3), dtype=np.uint8)
    img[0, 0] = 255
    r = resize_nearest(img, 8, 8)
    assert r.shape == (8, 8, 3) and (r[:2, :2] == 255).all() and r[4, 4].sum() == 0
    f = _bmp_features(encode_bmp(px))
    assert len(f) == FEATURE_DIM and abs(sum(f[4:]) - 1.0) < 1e-9
    import pytest

    with pytest.raises(NotImplementedError, match="pillow"):
        decode_image(b"\x89PNG....")


def test_bmp_media_pipeline(spark, sf_dir):
    """End-to-end: synthesize real BMP media executor-side, run the
    mapInPandas feature extractor — image rows get REAL channel
    statistics (means in [0,1], histogram sums to 1), and the same
    extractor still handles non-BMP bytes via the fake-embedding
    fallback."""
    from pyspark.sql import functions as F

    from presto_copy_spark.operators.multimodal import (
        bmp_media_from_documents,
        blob_table_from_documents,
        extract_features,
    )

    media = bmp_media_from_documents(spark, sf_dir).limit(50)
    feats = extract_features(media)
    rows = feats.collect()
    assert rows and all(len(r.feature) == 16 for r in rows)
    for r in rows:
        mr, mg, mb, std = r.feature[:4]
        assert 0.0 <= mr <= 1.0 and 0.0 <= mg <= 1.0 and 0.0 <= mb <= 1.0
        assert abs(sum(r.feature[4:]) - 1.0) < 1e-6  # real histogram
    # fallback path still live for non-BMP payloads
    fake = extract_features(blob_table_from_documents(spark, sf_dir).limit(5))
    frow = fake.collect()[0]
    assert any(v < 0 for v in frow.feature)  # fake embeddings span [-1,1)


def test_geometry_polygon_predicates(spark):
    """ST_Intersects / ST_Within polygon-polygon (round-4 addition):
    the pure-crossing case (a plus-sign of two rectangles, NO vertex of
    either inside the other) must be caught by the segment test alone;
    containment, partial overlap and disjoint shapes complete the truth
    table.  Both the Column helpers and the SQL twins agree."""
    from presto_copy_spark.functions.geometry import (
        st_geometry_from_text,
        st_intersects,
        st_within,
    )

    cases = [
        # (A, B, intersects, b_within_a, a_within_b)
        # plus-sign: horizontal bar x vertical bar — edges cross, no
        # vertex containment either way
        ("POLYGON ((0 4, 10 4, 10 6, 0 6, 0 4))",
         "POLYGON ((4 0, 6 0, 6 10, 4 10, 4 0))", True, False, False),
        # B strictly inside A
        ("POLYGON ((0 0, 10 0, 10 10, 0 10, 0 0))",
         "POLYGON ((2 2, 4 2, 4 4, 2 4, 2 2))", True, True, False),
        # partial overlap
        ("POLYGON ((0 0, 4 0, 4 4, 0 4, 0 0))",
         "POLYGON ((2 2, 6 2, 6 6, 2 6, 2 2))", True, False, False),
        # disjoint
        ("POLYGON ((0 0, 2 0, 2 2, 0 2, 0 0))",
         "POLYGON ((5 5, 7 5, 7 7, 5 7, 5 5))", False, False, False),
    ]
    df = spark.createDataFrame(cases, "wa string, wb string, ei boolean, ebw boolean, eaw boolean")
    ga = st_geometry_from_text("wa")
    gb = st_geometry_from_text("wb")
    rows = df.select(
        "ei", "ebw", "eaw",
        st_intersects(ga, gb).alias("i"),
        st_within(gb, ga).alias("bw"),
        st_within(ga, gb).alias("aw"),
    ).collect()
    for r in rows:
        assert (r.i, r.bw, r.aw) == (r.ei, r.ebw, r.eaw), r
    # SQL twins agree on the same shapes
    df.createOrReplaceTempView("_geo_pred_t")
    sql_rows = spark.sql(
        "SELECT ei, ebw, st_intersects(st_geometryfromtext(wa), st_geometryfromtext(wb)) i,"
        " st_within(st_geometryfromtext(wb), st_geometryfromtext(wa)) bw"
        " FROM _geo_pred_t"
    ).collect()
    for r in sql_rows:
        assert (r.i, r.bw) == (r.ei, r.ebw), r


def test_geo_longtail_raises_typed_unsupported(spark):
    """Every OGC long-tail name raises PrestoFeatureUnsupportedError
    with its own name at transpile time — a clear one-line diagnosis
    instead of Spark's unresolved-routine error (VERDICT r3 item 7)."""
    import pytest as _pytest

    from presto_copy_spark import dialect
    from presto_copy_spark.dialect import PrestoFeatureUnsupportedError

    for name in sorted(dialect._GEO_UNSUPPORTED):
        with _pytest.raises(PrestoFeatureUnsupportedError, match=name):
            dialect.transpile(f"SELECT {name}(g) FROM t")


def test_wav_codec_roundtrip():
    """RIFF/WAVE PCM16 codec (operators/multimodal.py): byte-exact
    round-trip, correct header fields, honest NotImplementedError for
    payloads the container has no codec for."""
    import numpy as np
    import pytest as _pytest

    from presto_copy_spark.operators.multimodal import decode_wav, encode_wav

    s = np.array([0, 1, -1, 32767, -32768, 123, -456], dtype=np.int16)
    blob = encode_wav(s, rate=12345)
    assert blob[:4] == b"RIFF" and blob[8:12] == b"WAVE"
    rate, out = decode_wav(blob)
    assert rate == 12345
    assert np.array_equal(out, s)
    with _pytest.raises(NotImplementedError):
        decode_wav(b"ID3\x04not a wav")
    with _pytest.raises(NotImplementedError):
        # stereo fmt chunk -> unsupported variant, not silent garbage
        import struct
        fmt = struct.pack("<4sIHHIIHH", b"fmt ", 16, 1, 2, 8000, 32000, 4, 16)
        data = struct.pack("<4sI", b"data", 0)
        decode_wav(struct.pack("<4sI4s", b"RIFF", 4 + len(fmt) + len(data), b"WAVE") + fmt + data)


def test_remote_project_against_loopback_function_server(spark):
    """RemoteProjectOperator analogue (operators/remote_udf.py): an
    Arrow-batched stage POSTs executor-side batches to a function
    endpoint.  Demoed against a stdlib http.server on loopback — the
    'remote' function doubles a value and upper-cases a string — and
    the failure mode (unreachable endpoint) surfaces a typed error."""
    import json
    import threading
    from http.server import BaseHTTPRequestHandler, HTTPServer

    from pyspark.sql import functions as F

    from presto_copy_spark.operators.remote_udf import (
        RemoteFunctionError,
        remote_project,
    )

    class Handler(BaseHTTPRequestHandler):
        def do_POST(self):
            body = json.loads(self.rfile.read(int(self.headers["Content-Length"])))
            assert body["function"] == "double_and_upper"
            rows = [[v * 2, s.upper()] for v, s in body["rows"]]
            out = json.dumps({"rows": rows}).encode()
            self.send_response(200)
            self.send_header("Content-Length", str(len(out)))
            self.end_headers()
            self.wfile.write(out)

        def log_message(self, *a):  # quiet
            pass

    srv = HTTPServer(("127.0.0.1", 0), Handler)
    port = srv.server_address[1]
    t = threading.Thread(target=srv.serve_forever, daemon=True)
    t.start()
    try:
        df = spark.createDataFrame(
            [(i, f"s{i}") for i in range(100)], "v long, s string"
        ).repartition(4)
        out = remote_project(
            df,
            f"http://127.0.0.1:{port}/",
            "double_and_upper",
            ["v", "s"],
            "v2 long, s_up string",
        )
        rows = {r.v2: r.s_up for r in out.collect()}
        assert rows == {i * 2: f"S{i}" for i in range(100)}
    finally:
        srv.shutdown()
        srv.server_close()

    # unreachable endpoint -> typed error, not a bare worker trace
    bad = remote_project(
        spark.createDataFrame([(1,)], "v long"),
        "http://127.0.0.1:9/",  # discard port, nothing listens
        "f",
        ["v"],
        "x long",
    )
    import pytest as _pytest

    with _pytest.raises(Exception) as ei:
        bad.collect()
    assert "RemoteFunctionError" in str(ei.value) or isinstance(
        ei.value, RemoteFunctionError
    )


def test_remote_project_pipelined_overlaps_inflight_batches(spark):
    """RemoteProjectOperator is ASYNC — it keeps multiple pages in
    flight at the function server (RemoteProjectOperator.java
    isBlocked()/processingPage futures).  remote_project_pipelined
    reproduces that: with a slow endpoint (25 ms/request) and a
    sliding window of 4, the loopback server must OBSERVE overlapping
    requests (max concurrent >= 2), and results still come back
    row-for-row correct and in order."""
    import json
    import threading
    import time
    from http.server import BaseHTTPRequestHandler, ThreadingHTTPServer

    from presto_copy_spark.operators.remote_udf import remote_project_pipelined

    lock = threading.Lock()
    gauge = {"now": 0, "max": 0, "requests": 0}

    class Handler(BaseHTTPRequestHandler):
        def do_POST(self):
            with lock:
                gauge["now"] += 1
                gauge["requests"] += 1
                gauge["max"] = max(gauge["max"], gauge["now"])
            try:
                body = json.loads(
                    self.rfile.read(int(self.headers["Content-Length"]))
                )
                time.sleep(0.025)  # slow function server
                rows = [[v * 3] for (v,) in body["rows"]]
                out = json.dumps({"rows": rows}).encode()
                self.send_response(200)
                self.send_header("Content-Length", str(len(out)))
                self.end_headers()
                self.wfile.write(out)
            finally:
                with lock:
                    gauge["now"] -= 1

        def log_message(self, *a):  # quiet
            pass

    srv = ThreadingHTTPServer(("127.0.0.1", 0), Handler)
    port = srv.server_address[1]
    threading.Thread(target=srv.serve_forever, daemon=True).start()
    try:
        # ONE partition, 16 chunks of 4 rows: any observed overlap is
        # the operator's window, not Spark task parallelism.
        df = spark.createDataFrame(
            [(i,) for i in range(64)], "v long"
        ).coalesce(1)
        out = remote_project_pipelined(
            df,
            f"http://127.0.0.1:{port}/",
            "triple",
            ["v"],
            "v3 long",
            batch_rows=4,
            max_inflight=4,
        )
        got = [r.v3 for r in out.collect()]
        assert got == [i * 3 for i in range(64)]  # order preserved
        assert gauge["requests"] == 16
        assert gauge["max"] >= 2, f"no overlap observed: {gauge}"
    finally:
        srv.shutdown()
        srv.server_close()

    import pytest as _pytest

    with _pytest.raises(ValueError):
        remote_project_pipelined(
            spark.createDataFrame([(1,)], "v long"),
            "http://127.0.0.1:9/",
            "f",
            ["v"],
            "x long",
            max_inflight=0,
        )


def test_ogc_closures_round5(spark):
    """Round-5 OGC closures (GeoFunctions.java stConvexHull /
    geometryUnion / geometryNearestPoints / lineInterpolatePoint /
    lineLocatePoint / GeoJSON) — closed-form checks of the registered
    pure-Catalyst macros."""
    from presto_copy_spark.functions import register_all

    register_all(spark)

    def one(sql):
        return spark.sql(f"SELECT ({sql}) AS v").collect()[0].v

    # convex hull: interior point dropped, square recovered
    assert one(
        "st_area(st_convexhull(st_geometryfromtext("
        "'MULTIPOINT (0 0, 1 0, 1 1, 0 1, 0.5 0.5)')))"
    ) == 1.0
    # degenerate hulls
    assert one(
        "st_convexhull(st_geometryfromtext('MULTIPOINT (0 0, 1 1, 2 2)')).gtype"
    ) == "LINESTRING"
    assert one(
        "st_convexhull(st_geometryfromtext('POINT (3 4)')).gtype"
    ) == "POINT"
    # union: overlap (inclusion-exclusion), disjoint, containment
    assert one(
        "st_area(st_union("
        "st_geometryfromtext('POLYGON ((0 0, 1 0, 1 1, 0 1, 0 0))'),"
        "st_geometryfromtext('POLYGON ((0.5 0.5, 1.5 0.5, 1.5 1.5, 0.5 1.5, 0.5 0.5))')))"
    ) == 1.75
    assert one(
        "st_union("
        "st_geometryfromtext('POLYGON ((0 0, 1 0, 1 1, 0 1, 0 0))'),"
        "st_geometryfromtext('POLYGON ((5 5, 6 5, 6 6, 5 6, 5 5))')).gtype"
    ) == "MULTIPOLYGON"
    assert one(
        "st_area(st_union("
        "st_geometryfromtext('POLYGON ((0 0, 4 0, 4 4, 0 4, 0 0))'),"
        "st_geometryfromtext('POLYGON ((1 1, 2 1, 2 2, 1 2, 1 1))')))"
    ) == 16.0
    # nearest points between disjoint squares: (1,0)-(4,0)
    np_ = one(
        "transform(geometry_nearest_points("
        "st_geometryfromtext('POLYGON ((0 0, 1 0, 1 1, 0 1, 0 0))'),"
        "st_geometryfromtext('POLYGON ((4 0, 5 0, 5 1, 4 1, 4 0))')),"
        "g -> array(g.rings[0][0].x, g.rings[0][0].y))"
    )
    assert [list(p) for p in np_] == [[1.0, 0.0], [4.0, 0.0]]
    # line interpolate / locate
    p = one(
        "line_interpolate_point("
        "st_geometryfromtext('LINESTRING (0 0, 10 0)'), 0.25).rings[0][0]"
    )
    assert (p.x, p.y) == (2.5, 0.0)
    assert one(
        "line_locate_point(st_geometryfromtext('LINESTRING (0 0, 10 0)'),"
        " st_geometryfromtext('POINT (2.5 3)'))"
    ) == 0.25
    # clamped beyond the end
    assert one(
        "line_locate_point(st_geometryfromtext('LINESTRING (0 0, 10 0)'),"
        " st_geometryfromtext('POINT (99 0)'))"
    ) == 1.0
    # GeoJSON round-trip preserves area; text form is strict GeoJSON
    assert one(
        "st_area(from_geojson_geometry(to_geojson_geometry("
        "st_geometryfromtext('POLYGON ((0 0, 2 0, 2 2, 0 2, 0 0))'))))"
    ) == 4.0
    assert one(
        "get_json_object(to_geojson_geometry("
        "st_geometryfromtext('POINT (1.5 2.5)')), '$.type')"
    ) == "Point"
    # aggregates via the Engine/dialect path
    from presto_copy_spark.dialect import transpile

    spark.createDataFrame(
        [
            ("POLYGON ((0 0, 2 0, 2 2, 0 2, 0 0))",),
            ("POLYGON ((1 1, 3 1, 3 3, 1 3, 1 1))",),
        ],
        "w string",
    ).createOrReplaceTempView("_ogc_geoms")
    r = spark.sql(
        transpile(
            "SELECT ST_Area(geometry_union_agg(ST_GeometryFromText(w))) AS a,"
            " ST_Area(convex_hull_agg(ST_GeometryFromText(w))) AS h"
            " FROM _ogc_geoms"
        )
    ).collect()[0]
    assert r.a == 7.0  # 4 + 4 - 1 overlap
    assert r.h == 8.0  # hull (0,0),(2,0),(3,1),(3,3),(1,3),(0,2)
    # st_equals: canonical-ring comparison (rotation + orientation)
    assert one(
        "st_equals("
        "st_geometryfromtext('POLYGON ((0 0, 2 0, 2 2, 0 2, 0 0))'),"
        "st_geometryfromtext('POLYGON ((2 2, 2 0, 0 0, 0 2, 2 2))'))"
    ) is True
    assert one(
        "st_equals("
        "st_geometryfromtext('POLYGON ((0 0, 2 0, 2 2, 0 2, 0 0))'),"
        "st_geometryfromtext('POLYGON ((0 0, 3 0, 3 3, 0 3, 0 0))'))"
    ) is False
    assert one(
        "st_equals(st_geometryfromtext('LINESTRING (0 0, 1 1, 2 0)'),"
        " st_geometryfromtext('LINESTRING (2 0, 1 1, 0 0)'))"
    ) is True
    # geometry_to_bing_tiles: envelope cover spans exactly the corner
    # tiles (NW corner -> smallest tile y)
    tiles = one(
        "geometry_to_bing_tiles(st_geometryfromtext("
        "'POLYGON ((10 50, 10.5 50, 10.5 50.3, 10 50.3, 10 50))'), 10)"
    )
    nw = one("bing_tile_at(50.3, 10.0, 10)")
    se = one("bing_tile_at(50.0, 10.5, 10)")
    xs = sorted({t.x for t in tiles})
    ys = sorted({t.y for t in tiles})
    assert xs == list(range(nw.x, se.x + 1))
    assert ys == list(range(nw.y, se.y + 1))
    assert len(tiles) == len(xs) * len(ys)
    # st_overlaps / st_crosses subsets
    assert one(
        "st_overlaps("
        "st_geometryfromtext('POLYGON ((0 0, 2 0, 2 2, 0 2, 0 0))'),"
        "st_geometryfromtext('POLYGON ((1 1, 3 1, 3 3, 1 3, 1 1))'))"
    ) is True
    assert one(
        "st_overlaps("
        "st_geometryfromtext('POLYGON ((0 0, 4 0, 4 4, 0 4, 0 0))'),"
        "st_geometryfromtext('POLYGON ((1 1, 2 1, 2 2, 1 2, 1 1))'))"
    ) is False
    assert one(
        "st_crosses(st_geometryfromtext('LINESTRING (0 0, 2 2)'),"
        " st_geometryfromtext('LINESTRING (0 2, 2 0)'))"
    ) is True
    assert one(
        "st_crosses(st_geometryfromtext('LINESTRING (0 0, 1 1)'),"
        " st_geometryfromtext('LINESTRING (5 5, 6 6)'))"
    ) is False


def test_classification_aggregates_round5(spark):
    """classification_* family as literal-bucket histogram expansions —
    hand-verified against PrecisionRecallAggregation.java semantics
    (bucket = floor(min(pred, 0.99999999999) * B); entry i uses
    prefix/suffix weights; output truncated after the last non-empty
    true bucket)."""
    from presto_copy_spark.dialect import transpile

    rows = [(0.1, True), (0.3, False), (0.55, True), (0.7, True), (0.9, False)]
    spark.createDataFrame(rows, "pred double, outcome boolean").createOrReplaceTempView(
        "_cls_r5"
    )

    def run(fn):
        return spark.sql(
            transpile(f"SELECT {fn}(5, outcome, pred) AS v FROM _cls_r5")
        ).collect()[0].v

    assert run("classification_precision") == [0.6, 0.5, 2 / 3, 0.5]
    assert run("classification_recall") == [1.0, 2 / 3, 2 / 3, 1 / 3]
    assert run("classification_fall_out") == [1.0, 1.0, 0.5, 0.5]
    assert run("classification_miss_rate") == [0.0, 1 / 3, 1 / 3, 2 / 3]
    assert run("classification_thresholds") == [0.0, 0.2, 0.4, 0.6]
    # weighted variant: doubling one true weight shifts precision
    wrows = [(0.1, True, 2.0), (0.9, False, 1.0)]
    spark.createDataFrame(
        wrows, "pred double, outcome boolean, w double"
    ).createOrReplaceTempView("_cls_r5w")
    assert spark.sql(
        transpile(
            "SELECT classification_precision(2, outcome, pred, w) AS v FROM _cls_r5w"
        )
    ).collect()[0].v == [2 / 3]
    # geometric_mean identity
    assert spark.sql(
        transpile("SELECT geometric_mean(x) AS v FROM (VALUES (2.0), (8.0)) t(x)")
    ).collect()[0].v == 4.0


def test_sketch_accessor_names_round5(spark):
    """Sketch accessor SQL names over the Datasketches twins: merge_hll
    / merge_tdigest fold pairwise unions, intersection_cardinality /
    jaccard_index / sketch_theta_estimate over theta binaries; the
    serialization internals raise the typed unsupported error."""
    import pytest as _pytest

    from presto_copy_spark import dialect
    from presto_copy_spark.functions import register_all

    register_all(spark)
    spark.range(0, 1000).selectExpr(
        "id", "id % 2 AS half"
    ).createOrReplaceTempView("_sk_t")
    # merge_hll of two half-range HLLs estimates the full range
    est = spark.sql(
        "SELECT hll_sketch_estimate(merge_hll(hlls)) AS v FROM ("
        " SELECT collect_list(h) AS hlls FROM ("
        "  SELECT half, hll_sketch_agg(id) AS h FROM _sk_t GROUP BY half))"
    ).collect()[0].v
    assert abs(est - 1000) / 1000 < 0.05
    # merge_tdigest: median of the merged halves ~ global median
    med = spark.sql(
        "SELECT kll_sketch_get_quantile_double(merge_tdigest(ds), 0.5) AS v"
        " FROM (SELECT collect_list(d) AS ds FROM ("
        "  SELECT half, kll_sketch_agg_double(CAST(id AS DOUBLE)) AS d"
        "  FROM _sk_t GROUP BY half))"
    ).collect()[0].v
    assert 400 <= med <= 600
    # theta set ops: [0,1000) vs [500,1500) -> |intersection| ~ 500,
    # jaccard ~ 1/3
    r = spark.sql(
        "SELECT intersection_cardinality(a, b) AS ic, jaccard_index(a, b) AS j"
        " FROM (SELECT"
        "  (SELECT theta_sketch_agg(id) FROM range(0, 1000)) AS a,"
        "  (SELECT theta_sketch_agg(id) FROM range(500, 1500)) AS b)"
    ).collect()[0]
    assert abs(r.ic - 500) / 500 < 0.1
    assert abs(r.j - 1 / 3) < 0.05
    # alias + typed errors
    t = dialect.transpile("SELECT sketch_theta_estimate(x) FROM t")
    assert "theta_sketch_estimate" in t
    for name in sorted(dialect._SKETCH_UNSUPPORTED):
        with _pytest.raises(
            dialect.PrestoFeatureUnsupportedError, match=name
        ):
            dialect.transpile(f"SELECT {name}(x) FROM t")


def test_geometry_randomized_properties(spark):
    """Randomized property checks for the round-5 OGC core, evaluated
    as ONE DataFrame per property with an INDEPENDENT Python oracle.

    - st_union of two axis-aligned rectangles on mis-aligned grids
      (A on integers, B on quarter-offsets, so boundaries can never be
      collinear and every boundary contact is a proper crossing):
      union area must equal the inclusion-exclusion closed form;
      disjoint pairs must come back MULTIPOLYGON.
    - st_hull_of_points vs an independently implemented monotone chain.
    - line_locate_point(line_interpolate_point(f)) == f round-trip on
      strictly monotone polylines.
    """
    import random

    from presto_copy_spark.functions import register_all
    from pyspark.sql import functions as F

    register_all(spark)
    rng = random.Random(0xC0FFEE)

    # --- rectangle union vs closed form --------------------------------
    cases = []
    for i in range(200):
        wa, ha = rng.randint(2, 6), rng.randint(2, 6)
        dx = rng.randint(-8, 8) + 0.25
        dy = rng.randint(-8, 8) + 0.25
        wb, hb = rng.randint(1, 6), rng.randint(1, 6)
        iw = min(wa, dx + wb) - max(0, dx)
        ih = min(ha, dy + hb) - max(0, dy)
        inter = float(iw * ih) if (iw > 0 and ih > 0) else 0.0
        expect = float(wa * ha + wb * hb - inter) if inter > 0 else -1.0
        wkt_a = (
            f"POLYGON ((0 0, {wa} 0, {wa} {ha}, 0 {ha}, 0 0))"
        )
        wkt_b = (
            f"POLYGON (({dx} {dy}, {dx + wb} {dy}, {dx + wb} {dy + hb},"
            f" {dx} {dy + hb}, {dx} {dy}))"
        )
        cases.append((i, wkt_a, wkt_b, expect))
    df = spark.createDataFrame(cases, "i long, wa string, wb string, expect double")
    rows = (
        df.selectExpr(
            "i",
            "expect",
            "st_union(st_geometryfromtext(wa), st_geometryfromtext(wb)) AS u",
        )
        .selectExpr(
            "i",
            "expect",
            "CASE WHEN u.gtype = 'POLYGON' THEN st_area(u) ELSE -1.0D END AS got",
        )
        .collect()
    )
    bad = [(r.i, r.got, r.expect) for r in rows if abs(r.got - r.expect) > 1e-9]
    assert not bad, f"union mismatches: {bad[:5]}"

    # --- convex hull vs independent monotone chain ---------------------
    def py_hull_area(pts):
        pts = sorted(set(pts))
        if len(pts) < 3:
            return 0.0
        def half(seq):
            h = []
            for p in seq:
                while len(h) >= 2 and (
                    (h[-1][0] - h[-2][0]) * (p[1] - h[-2][1])
                    - (h[-1][1] - h[-2][1]) * (p[0] - h[-2][0])
                ) <= 0:
                    h.pop()
                h.append(p)
            return h
        lower, upper = half(pts), half(pts[::-1])
        ring = lower[:-1] + upper[:-1]
        area2 = sum(
            ring[k][0] * ring[(k + 1) % len(ring)][1]
            - ring[(k + 1) % len(ring)][0] * ring[k][1]
            for k in range(len(ring))
        )
        return abs(area2) / 2.0

    hcases = []
    for i in range(150):
        n = rng.randint(3, 12)
        pts = [
            (rng.randint(0, 40) / 4.0, rng.randint(0, 40) / 4.0)
            for _ in range(n)
        ]
        wkt = "MULTIPOINT (" + ", ".join(f"{x} {y}" for x, y in pts) + ")"
        hcases.append((i, wkt, py_hull_area(pts)))
    hdf = spark.createDataFrame(hcases, "i long, w string, expect double")
    hrows = hdf.selectExpr(
        "i",
        "expect",
        "st_area(st_convexhull(st_geometryfromtext(w))) AS got",
    ).collect()
    hbad = [(r.i, r.got, r.expect) for r in hrows if abs(r.got - r.expect) > 1e-9]
    assert not hbad, f"hull mismatches: {hbad[:5]}"

    # --- interpolate/locate round-trip ---------------------------------
    lcases = []
    for i in range(100):
        n = rng.randint(2, 6)
        xs = sorted(rng.sample(range(0, 50), n))
        ys = [rng.randint(0, 10) for _ in range(n)]
        wkt = "LINESTRING (" + ", ".join(f"{x} {y}" for x, y in zip(xs, ys)) + ")"
        f = rng.randint(1, 9) / 10.0
        lcases.append((i, wkt, f))
    ldf = spark.createDataFrame(lcases, "i long, w string, f double")
    lrows = ldf.selectExpr(
        "i",
        "f",
        "line_locate_point(st_geometryfromtext(w),"
        " line_interpolate_point(st_geometryfromtext(w), f)) AS got",
    ).collect()
    lbad = [(r.i, r.got, r.f) for r in lrows if abs(r.got - r.f) > 1e-9]
    assert not lbad, f"roundtrip mismatches: {lbad[:5]}"

    # --- st_distance vs the axis-aligned closed form -------------------
    # min distance between two AABBs = hypot(max(0, x_gap), max(0, y_gap))
    import math

    dcases = []
    for i in range(150):
        wa, ha = rng.randint(1, 5), rng.randint(1, 5)
        dx = rng.randint(-10, 10) + 0.25
        dy = rng.randint(-10, 10) + 0.25
        wb, hb = rng.randint(1, 5), rng.randint(1, 5)
        xgap = max(0.0, max(dx - wa, 0 - (dx + wb)))
        ygap = max(0.0, max(dy - ha, 0 - (dy + hb)))
        if xgap == 0 and ygap == 0:
            continue  # touching/overlapping: boundary-distance semantics differ
        wkt_a = f"POLYGON ((0 0, {wa} 0, {wa} {ha}, 0 {ha}, 0 0))"
        wkt_b = (
            f"POLYGON (({dx} {dy}, {dx + wb} {dy}, {dx + wb} {dy + hb},"
            f" {dx} {dy + hb}, {dx} {dy}))"
        )
        dcases.append((i, wkt_a, wkt_b, math.hypot(xgap, ygap)))
    assert len(dcases) > 30
    ddf = spark.createDataFrame(dcases, "i long, wa string, wb string, expect double")
    drows = ddf.selectExpr(
        "i",
        "expect",
        "st_distance(st_geometryfromtext(wa), st_geometryfromtext(wb)) AS got",
    ).collect()
    dbad = [(r.i, r.got, r.expect) for r in drows if abs(r.got - r.expect) > 1e-9]
    assert not dbad, f"distance mismatches: {dbad[:5]}"


def test_classification_randomized_vs_python(spark):
    """Randomized check of the classification_* literal-bucket
    expansions against an independent Python implementation of
    PrecisionRecallAggregation.java (histogram + prefix/suffix sums,
    0.99999999999 clamp, truncated-tail output length)."""
    import math
    import random

    from presto_copy_spark.dialect import transpile

    rng = random.Random(0xBEEF)

    def py_classification(rows, b):
        th, fh = [0.0] * b, [0.0] * b
        for pred, outcome, w in rows:
            i = int(math.floor(min(pred, 0.99999999999) * b))
            if outcome:
                th[i] += w
            else:
                fh[i] += w
        tt, tf = sum(th), sum(fh)
        out = {k: [] for k in ("precision", "recall", "fall_out", "miss_rate", "thresholds")}
        run_t = run_f = 0.0
        for i in range(b):
            if tt <= run_t:
                break
            tp, fp = tt - run_t, tf - run_f
            out["precision"].append(tp / (tp + fp) if tp + fp else float("nan"))
            out["recall"].append(tp / tt)
            out["fall_out"].append(fp / tf if tf else float("nan"))
            out["miss_rate"].append(run_t / tt)
            out["thresholds"].append(i / b)
            run_t += th[i]
            run_f += fh[i]
        return out

    for trial in range(5):
        b = rng.choice([3, 5, 8, 16])
        n = rng.randint(5, 60)
        rows = [
            (rng.random(), rng.random() < 0.6, float(rng.randint(1, 4)))
            for _ in range(n)
        ]
        spark.createDataFrame(
            rows, "pred double, outcome boolean, w double"
        ).createOrReplaceTempView("_cls_rand")
        expect = py_classification(rows, b)
        got = spark.sql(
            transpile(
                "SELECT "
                + ", ".join(
                    f"classification_{k}({b}, outcome, pred, w) AS {k}"
                    for k in expect
                )
                + " FROM _cls_rand"
            )
        ).collect()[0]
        for k, ev in expect.items():
            gv = got[k]
            assert len(gv) == len(ev), (trial, k, gv, ev)
            for g, e in zip(gv, ev):
                if math.isnan(e):
                    assert g is None or math.isnan(g), (trial, k)
                else:
                    assert abs(g - e) < 1e-12, (trial, k, g, e)


def test_geometry_relate_round6(spark):
    """Round-6 relate-class: st_touches (boundary contact, disjoint
    interiors), st_intersection (convex-convex exact hull-of-candidates),
    including the partial-edge-overlap case where neither polygon has a
    vertex strictly inside the other (GeoFunctions.java stTouches:1142,
    stIntersection:986)."""
    from presto_copy_spark.functions import register_all

    register_all(spark)

    def one(expr):
        return spark.sql(f"SELECT {expr} AS v").collect()[0].v

    def touch(a, b):
        return one(
            f"st_touches(st_geometryfromtext('{a}'), st_geometryfromtext('{b}'))"
        )

    def inter_wkt(a, b):
        return one(
            "st_astext(st_intersection(st_geometryfromtext"
            f"('{a}'), st_geometryfromtext('{b}')))"
        )

    sq = "POLYGON ((0 0, 1 0, 1 1, 0 1, 0 0))"
    assert touch(sq, "POLYGON ((1 0, 2 0, 2 1, 1 1, 1 0))") is True  # edge
    assert touch(sq, "POLYGON ((1 1, 2 1, 2 2, 1 2, 1 1))") is True  # corner
    assert touch(sq, sq) is False  # equal -> interiors overlap
    assert touch(sq, "POLYGON ((5 5, 6 5, 6 6, 5 6, 5 5))") is False
    assert (
        touch(
            "POLYGON ((0 0, 2 0, 2 2, 0 2, 0 0))",
            "POLYGON ((1 1, 3 1, 3 3, 1 3, 1 1))",
        )
        is False
    )  # overlap
    # partial-edge overlap: no vertex strictly inside, interiors overlap
    assert (
        touch(
            "POLYGON ((0 0, 2 0, 2 2, 0 2, 0 0))",
            "POLYGON ((1 0, 3 0, 3 2, 1 2, 1 0))",
        )
        is False
    )
    # containment (no boundary contact)
    assert (
        touch(
            "POLYGON ((0 0, 10 0, 10 10, 0 10, 0 0))",
            "POLYGON ((2 2, 4 2, 4 4, 2 4, 2 2))",
        )
        is False
    )
    # degenerate axis (ADVICE r10): a duplicate consecutive ring vertex
    # is a zero-length edge whose orient() is 0 for every vertex — if
    # used as a SAT axis it vacuously separates, flipping st_touches to
    # true on overlapping pairs.  Repeated vertex on each side in turn.
    assert (
        touch(
            "POLYGON ((0 0, 2 0, 2 0, 2 2, 0 2, 0 0))",
            "POLYGON ((1 1, 3 1, 3 3, 1 3, 1 1))",
        )
        is False
    )
    assert (
        touch(
            "POLYGON ((0 0, 2 0, 2 2, 0 2, 0 0))",
            "POLYGON ((1 1, 3 1, 3 3, 3 3, 1 3, 1 1))",
        )
        is False
    )
    # ...and the degenerate vertex must not break a TRUE touch
    assert (
        touch(
            "POLYGON ((0 0, 1 0, 1 0, 1 1, 0 1, 0 0))",
            "POLYGON ((1 0, 2 0, 2 1, 1 1, 1 0))",
        )
        is True
    )
    # point / linestring branches
    assert touch("POINT (1 0.5)", sq) is True
    assert touch("POINT (0.5 0.5)", sq) is False
    assert touch("POINT (1 1)", "POINT (1 1)") is False
    assert touch("POINT (0 0)", "LINESTRING (0 0, 1 1)") is True
    assert touch("POINT (0.5 0.5)", "LINESTRING (0 0, 1 1)") is False
    # intersection shapes
    assert inter_wkt(
        "POLYGON ((0 0, 2 0, 2 2, 0 2, 0 0))",
        "POLYGON ((1 1, 3 1, 3 3, 1 3, 1 1))",
    ) == "POLYGON ((1.0 1.0, 2.0 1.0, 2.0 2.0, 1.0 2.0, 1.0 1.0))"
    assert inter_wkt(sq, "POLYGON ((1 0, 2 0, 2 1, 1 1, 1 0))") == (
        "LINESTRING (1.0 0.0, 1.0 1.0)"
    )
    assert inter_wkt(sq, "POLYGON ((1 1, 2 1, 2 2, 1 2, 1 1))") == "POINT (1.0 1.0)"
    assert inter_wkt(sq, "POLYGON ((5 5, 6 5, 6 6, 5 6, 5 5))") is None  # EMPTY
    # square x diamond -> octagon, area check 16 - 4*(1/2) = 14
    area = spark.sql(
        "SELECT st_area(st_intersection("
        " st_geometryfromtext('POLYGON ((0 0, 4 0, 4 4, 0 4, 0 0))'),"
        " st_geometryfromtext('POLYGON ((2 -1, 5 2, 2 5, -1 2, 2 -1))'))) AS v"
    ).collect()[0].v
    assert area == 14.0
    # transpiler routes st_intersection now (was _GEO_UNSUPPORTED)
    from presto_copy_spark.dialect import transpile

    assert "st_intersection" in transpile(
        "SELECT st_intersection(a, b) FROM t"
    ).lower()


def test_geometry_wkb_decode_round6(spark):
    """st_geomfrombinary: bit-exact NDR WKB decode, property-tested
    against Python struct round-trips (150 random doubles incl.
    denormals), plus LINESTRING/POLYGON/MULTIPOINT layouts and the
    big-endian / unknown-type error paths (GeoFunctions.java
    stGeomFromBinary:250)."""
    import math
    import random
    import struct

    import pytest as _pytest

    from presto_copy_spark.functions import register_all

    register_all(spark)
    rng = random.Random(606)
    vals = [0.0, -0.0, 1.0, -1.0, 5e-324, -5e-324, 2.2250738585072014e-308,
            1.7976931348623157e308, 123.456, -7.25e-300]
    for _ in range(140):
        kind = rng.randrange(3)
        if kind == 0:
            vals.append(rng.uniform(-1e6, 1e6))
        elif kind == 1:
            vals.append(rng.uniform(-1, 1) * 10 ** rng.randrange(-300, 300))
        else:
            vals.append(struct.unpack("<d", struct.pack("<Q", rng.getrandbits(63)))[0])
    vals = [v for v in vals if not math.isnan(v)]
    rows = [(struct.pack("<BI2d", 1, 1, v, -v),) for v in vals]
    df = spark.createDataFrame(rows, "wkb binary")
    got = [
        (r.x, r.y)
        for r in df.selectExpr(
            "st_x(st_geomfrombinary(wkb)) AS x",
            "st_y(st_geomfrombinary(wkb)) AS y",
        ).collect()
    ]
    for v, (x, y) in zip(vals, got):
        assert struct.pack("<d", x) == struct.pack("<d", v), (v, x)
        assert struct.pack("<d", y) == struct.pack("<d", -v), (v, y)

    def one(expr):
        return spark.sql(f"SELECT {expr} AS v").collect()[0].v

    line = struct.pack("<BII", 1, 2, 3) + struct.pack("<6d", 0, 0, 1.5, 2.5, -3.25, 4.0)
    assert one(
        f"st_astext(st_geomfrombinary(unhex('{line.hex()}')))"
    ) == "LINESTRING (0.0 0.0, 1.5 2.5, -3.25 4.0)"
    poly = (
        struct.pack("<BII", 1, 3, 2)
        + struct.pack("<I", 4)
        + struct.pack("<8d", 0, 0, 4, 0, 4, 4, 0, 0)
        + struct.pack("<I", 4)
        + struct.pack("<8d", 1, 1, 2, 1, 2, 2, 1, 1)
    )
    assert one(f"st_area(st_geomfrombinary(unhex('{poly.hex()}')))") == 7.5
    mp = (
        struct.pack("<BII", 1, 4, 2)
        + struct.pack("<BI2d", 1, 1, 1, 2)
        + struct.pack("<BI2d", 1, 1, 3, 4)
    )
    assert one(
        f"st_astext(st_geomfrombinary(unhex('{mp.hex()}')))"
    ) == "MULTIPOINT (1.0 2.0, 3.0 4.0)"
    # NaN decodes as NaN
    nanpt = struct.pack("<BI2d", 1, 1, float("nan"), 1.0)
    assert math.isnan(one(f"st_x(st_geomfrombinary(unhex('{nanpt.hex()}')))"))
    # error paths
    big = struct.pack(">BI2d", 0, 1, 1.0, 2.0)
    with _pytest.raises(Exception, match="big-endian"):
        spark.sql(
            f"SELECT st_geomfrombinary(unhex('{big.hex()}')) AS v"
        ).collect()
    badtype = struct.pack("<BI2d", 1, 99, 1.0, 2.0)
    with _pytest.raises(Exception, match="type code 99"):
        spark.sql(
            f"SELECT st_geomfrombinary(unhex('{badtype.hex()}')) AS v"
        ).collect()
    # alias
    pt = struct.pack("<BI2d", 1, 1, 9.0, -2.0)
    assert one(
        f"st_astext(st_geometryfrombinary(unhex('{pt.hex()}')))"
    ) == "POINT (9.0 -2.0)"


def test_khll_privacy_names_round6(spark):
    """khyperloglog_agg / uniqueness_distribution /
    reidentification_potential / merge_khll SQL names (round-6 twin;
    KHyperLogLogFunctions.java, KHyperLogLog.java:297,312).  The twin is
    exact in the bottom-K regime, so every value is checked exactly."""
    from presto_copy_spark.dialect import transpile
    from presto_copy_spark.functions import register_all

    register_all(spark)
    rows = [(v, u) for v in range(1, 9) for u in range(v % 4 + 1)]
    spark.createDataFrame(rows, "v int, uii int").createOrReplaceTempView(
        "_khll_r6"
    )
    # v % 4 + 1 distinct uii per v: sizes {1: x2, 2: x2, 3: x2, 4: x2}
    r = spark.sql(
        transpile(
            """
WITH s AS (SELECT khyperloglog_agg(v, uii) AS k FROM _khll_r6)
SELECT size(map_keys(k)) AS nk,
       uniqueness_distribution(k, 3) AS ud,
       reidentification_potential(k, 2) AS reid,
       uniqueness_distribution(k)[CAST(4 AS BIGINT)] AS ud4
FROM s
"""
        )
    ).collect()[0]
    assert r.nk == 8
    assert dict(sorted(r.ud.items())) == {1: 0.25, 2: 0.25, 3: 0.5}
    assert r.reid == 0.5
    assert r.ud4 == 0.25  # default 256-bucket histogram, bucket 4
    # merge of per-group sketches == sketch of the union
    r2 = spark.sql(
        transpile(
            """
WITH s AS (SELECT v % 2 AS g, khyperloglog_agg(v, uii) AS k
           FROM _khll_r6 GROUP BY v % 2),
     m AS (SELECT merge_khll(collect_list(k)) AS k FROM s),
     w AS (SELECT khyperloglog_agg(v, uii) AS k FROM _khll_r6)
SELECT (SELECT array_sort(map_entries(k)) FROM m)
     = (SELECT array_sort(map_entries(k)) FROM w) AS same
"""
        )
    ).collect()[0]
    assert r2.same is True
    # merge skips NULL entries / returns NULL for all-NULL
    assert (
        spark.sql(
            "SELECT merge_khll(CAST(array(NULL) AS"
            " ARRAY<MAP<BIGINT, ARRAY<BIGINT>>>)) AS v"
        ).collect()[0].v
        is None
    )


def test_trimmed_mean_round6(spark):
    """trimmed_mean(tdigest, lo, hi) twin (TDigestFunctions.java:142 /
    TDigest.java:589): exact on the 200-probe grid in KLL exact mode —
    oracled against the closed-form mean of the bounded order
    statistics."""
    import math
    import statistics

    from presto_copy_spark.functions import register_all

    register_all(spark)
    r = spark.sql(
        """
WITH s AS (SELECT kll_sketch_agg_double(CAST(id AS DOUBLE)) AS t
           FROM range(1, 101))
SELECT trimmed_mean(t, 0.1D, 0.9D) AS tm,
       trimmed_mean(t, 0.25D, 0.75D) AS iqm,
       trimmed_mean(t, 0D, 1D) AS full,
       trimmed_mean(t, 0.6D, 0.6D) AS degen
FROM s
"""
    ).collect()[0]
    assert r.tm == statistics.mean(range(11, 91))
    assert r.iqm == statistics.mean(range(26, 76))
    assert r.full == statistics.mean(range(1, 101))
    assert math.isnan(r.degen)
    import pytest as _pytest

    with _pytest.raises(Exception, match=r"\[0, 1\]"):
        spark.sql(
            "SELECT trimmed_mean((SELECT kll_sketch_agg_double(CAST(id AS"
            " DOUBLE)) FROM range(1, 5)), 0.2D, 1.5D) AS v"
        ).collect()


def test_ansi_display_names_round6(spark):
    """bar / color / render as SQL names over non-literal args (round 6;
    ColorFunctions.java): Arrow-batched UDFs must agree with the literal
    constant-fold Python ports byte-for-byte."""
    from presto_copy_spark.dialect import transpile
    from presto_copy_spark.functions import register_all
    from presto_copy_spark.functions.presto import (
        _py_color,
        py_bar,
        py_render,
        py_render_bool,
    )

    register_all(spark)
    spark.createDataFrame(
        [(0.3, "#abc", True), (0.9, "red", False)], "p double, c string, b boolean"
    ).createOrReplaceTempView("_ansi_r6")
    rows = spark.sql(
        transpile(
            "SELECT bar(p, 7) AS b, color(c) AS ci,"
            " render(CAST(p AS STRING), color(c)) AS r, render(b) AS rb"
            " FROM _ansi_r6 ORDER BY p"
        )
    ).collect()
    assert rows[0].b == py_bar(0.3, 7)
    assert rows[1].b == py_bar(0.9, 7)
    assert rows[0].ci == _py_color("#abc")
    assert rows[1].ci == _py_color("red")
    assert rows[0].r == py_render("0.3", _py_color("#abc"))
    assert rows[0].rb == py_render_bool(True)
    assert rows[1].rb == py_render_bool(False)
    # inverse_fcdf (reference spelling) registers alongside inverse_f_cdf
    v = spark.sql(
        "SELECT inverse_fcdf(4.0, 7.0, f_cdf(4.0, 7.0, 1.75)) AS v"
    ).collect()[0].v
    assert abs(v - 1.75) < 1e-9


def test_spherical_geography_round6(spark):
    """to_spherical_geography / to_geometry / spherical ST_Distance /
    ST_Area / ST_AsText (SphericalGeoFunctions.java:74-163,340-433;
    SphericalGeographyUtils.java Vincenty, EARTH_RADIUS_KM 6371.01):
    the tag-prefix twin must validate ranges, dispatch distance to the
    great-circle formula in meters, and compute the pole-corrected
    spherical excess area."""
    import math

    import pytest as _pytest

    from presto_copy_spark.functions import register_all

    register_all(spark)

    def one(e):
        return spark.sql(f"SELECT {e} AS v").collect()[0].v

    # Vincenty reference (python port of SphericalGeographyUtils.java)
    def ref_gc(lat1, lon1, lat2, lon2):
        rl1, rl2 = math.radians(lat1), math.radians(lat2)
        dl = math.radians(lon1) - math.radians(lon2)
        t1 = math.cos(rl2) * math.sin(dl)
        t2 = math.cos(rl1) * math.sin(rl2) - math.sin(rl1) * math.cos(
            rl2
        ) * math.cos(dl)
        t3 = math.sin(rl1) * math.sin(rl2) + math.cos(rl1) * math.cos(
            rl2
        ) * math.cos(dl)
        return math.atan2(math.sqrt(t1 * t1 + t2 * t2), t3) * 6371.01 * 1000

    d = one(
        "st_distance(to_spherical_geography(st_point(13.405, 52.52)),"
        " to_spherical_geography(st_point(2.3522, 48.8566)))"
    )
    assert abs(d - ref_gc(52.52, 13.405, 48.8566, 2.3522)) < 1e-6  # ~878 km
    # planar path untouched
    assert one("st_distance(st_point(0, 0), st_point(3, 4))") == 5.0
    # 1-degree equatorial square ~ (111.2 km)^2
    a = one(
        "st_area(to_spherical_geography(st_geometryfromtext("
        "'POLYGON ((0 0, 1 0, 1 1, 0 1, 0 0))')))"
    )
    assert 1.2e10 < a < 1.25e10
    # hole subtracts
    ah = one(
        "st_area(to_spherical_geography(st_geometryfromtext("
        "'POLYGON ((0 0, 1 0, 1 1, 0 1, 0 0),"
        " (0.25 0.25, 0.75 0.25, 0.75 0.75, 0.25 0.75, 0.25 0.25))')))"
    )
    assert 0.70 < ah / a < 0.80  # shell minus quarter-area hole
    # same square away from the equator covers less area
    a60 = one(
        "st_area(to_spherical_geography(st_geometryfromtext("
        "'POLYGON ((0 60, 1 60, 1 61, 0 61, 0 60))')))"
    )
    assert a60 < 0.55 * a
    # round-trips
    assert one(
        "st_astext(to_spherical_geography(st_point(1.5, -2.5)))"
    ) == "POINT (1.5 -2.5)"
    assert one(
        "st_geometrytype(to_geometry(to_spherical_geography(st_point(1, 2))))"
    ) == "ST_Point"
    # validation + type restrictions
    with _pytest.raises(Exception, match="Longitude must be"):
        one("to_spherical_geography(st_point(200, 0))")
    with _pytest.raises(Exception, match="Latitude must be"):
        one("to_spherical_geography(st_point(0, 95))")
    with _pytest.raises(Exception, match="only supports Point"):
        one(
            "st_distance(to_spherical_geography(st_geometryfromtext("
            "'POLYGON ((0 0, 1 0, 1 1, 0 1, 0 0))')),"
            " to_spherical_geography(st_point(0, 0)))"
        )
    with _pytest.raises(Exception, match="only supports Polygon"):
        one("st_area(to_spherical_geography(st_point(0, 0)))")
    with _pytest.raises(Exception, match="identical consecutive"):
        one(
            "st_area(to_spherical_geography(st_geometryfromtext("
            "'POLYGON ((0 0, 1 0, 1 0, 1 1, 0 0))')))"
        )


def test_st_relate_round6(spark):
    """st_relate DE-9IM pattern matching, convex POLYGON x POLYGON
    subset (GeoFunctions.java:1130): the synthesized matrix must equal
    the canonical DE-9IM for every relation class, and pattern
    semantics (T = non-F, * = any, exact digit) must hold — including
    that polygon edge-touch matches the OGC touches disjunct F***T****
    and NOT FT******* (the shared edge is on both boundaries)."""
    import pytest as _pytest

    from presto_copy_spark.functions import register_all

    register_all(spark)

    def rel(a, b, pat):
        return spark.sql(
            f"SELECT st_relate(st_geometryfromtext('{a}'),"
            f" st_geometryfromtext('{b}'), '{pat}') AS v"
        ).collect()[0].v

    sq = "POLYGON ((0 0, 2 0, 2 2, 0 2, 0 0))"
    big = "POLYGON ((0 0, 10 0, 10 10, 0 10, 0 0))"
    cases = [
        (sq, sq, "2FFF1FFF2", True),
        (sq, sq, "T*F**FFF*", True),  # OGC equals
        (sq, "POLYGON ((5 5, 6 5, 6 6, 5 6, 5 5))", "FF2FF1212", True),
        (sq, "POLYGON ((5 5, 6 5, 6 6, 5 6, 5 5))", "FF*FF****", True),
        (sq, "POLYGON ((2 2, 3 2, 3 3, 2 3, 2 2))", "FF2F01212", True),
        (sq, "POLYGON ((2 0, 4 0, 4 2, 2 2, 2 0))", "FF2F11212", True),
        (sq, "POLYGON ((2 0, 4 0, 4 2, 2 2, 2 0))", "F***T****", True),
        (sq, "POLYGON ((2 0, 4 0, 4 2, 2 2, 2 0))", "FT*******", False),
        (sq, "POLYGON ((1 1, 3 1, 3 3, 1 3, 1 1))", "212101212", True),
        (sq, "POLYGON ((1 1, 3 1, 3 3, 1 3, 1 1))", "T*T***T**", True),  # overlaps
        (sq, "POLYGON ((1 0, 3 0, 3 2, 1 2, 1 0))", "212111212", True),
        (big, "POLYGON ((2 2, 4 2, 4 4, 2 4, 2 2))", "212FF1FF2", True),
        (big, "POLYGON ((2 2, 4 2, 4 4, 2 4, 2 2))", "T*****FF*", True),  # contains
        ("POLYGON ((2 2, 4 2, 4 4, 2 4, 2 2))", big, "2FF1FF212", True),
        ("POLYGON ((2 2, 4 2, 4 4, 2 4, 2 2))", big, "T*F**F***", True),  # within
        (big, "POLYGON ((0 0, 4 0, 4 4, 0 4, 0 0))", "212F11FF2", True),
        (sq, "POLYGON ((1 1, 3 1, 3 3, 1 3, 1 1))", "2FFF1FFF2", False),
        (sq, sq, "FF2FF1212", False),
    ]
    for a, b, p, want in cases:
        assert rel(a, b, p) is want, (a[:30], b[:30], p, want)
    with _pytest.raises(Exception, match="invalid DE-9IM"):
        rel(sq, sq, "XYZ")
    # non-polygon combos: NULL (documented subset)
    assert rel("POINT (1 1)", sq, "T********") is None


def test_constructive_geometry_round6(spark):
    """geometry_invalid_reason / flatten_geometry_collections /
    simplify_geometry (chord-distance twin) / st_buffer (POINT 32-gon)
    — GeoFunctions.java:414,1179,763,280, validation contracts
    included."""
    import math

    import pytest as _pytest

    from presto_copy_spark.functions import register_all

    register_all(spark)

    def one(e):
        return spark.sql(f"SELECT {e} AS v").collect()[0].v

    assert (
        one(
            "geometry_invalid_reason(st_geometryfromtext("
            "'POLYGON ((0 0, 1 0, 1 1, 0 1, 0 0))'))"
        )
        is None
    )
    assert one(
        "geometry_invalid_reason(st_geometryfromtext("
        "'POLYGON ((0 0, 1 1, 1 0, 0 1, 0 0))'))"
    ) == "Polygon ring self-intersects"
    assert one("size(flatten_geometry_collections(st_point(1, 2)))") == 1
    # simplify: near-collinear vertex within tolerance drops, a real
    # corner survives, tolerance 0 is the identity, and a ring that
    # would collapse below 4 points keeps its vertices
    assert one(
        "st_astext(simplify_geometry(st_geometryfromtext("
        "'LINESTRING (0 0, 1 0.001, 2 0, 4 3)'), 0.01))"
    ) == "LINESTRING (0.0 0.0, 2.0 0.0, 4.0 3.0)"
    assert one(
        "st_astext(simplify_geometry(st_geometryfromtext("
        "'LINESTRING (0 0, 1 0.5, 2 0)'), 0.01))"
    ) == "LINESTRING (0.0 0.0, 1.0 0.5, 2.0 0.0)"
    assert one(
        "st_numpoints(simplify_geometry(st_geometryfromtext("
        "'POLYGON ((0 0, 2 0.001, 4 0, 4 4, 0 4, 0 0))'), 0.01))"
    ) == 5
    assert one(
        "st_numpoints(simplify_geometry(st_geometryfromtext("
        "'POLYGON ((0 0, 2 0.001, 4 0, 0 0))'), 0.01))"
    ) == 4  # would collapse below a ring -> unchanged
    # st_buffer POINT: JTS 32-gon, area = 1/2 * n * d^2 * sin(2pi/n)
    a = one("st_area(st_buffer(st_point(5, 5), 2))")
    assert abs(a - 0.5 * 32 * 4 * math.sin(2 * math.pi / 32)) < 1e-9
    assert one("st_isvalid(st_buffer(st_point(0, 0), 1))") is True
    assert one("st_astext(st_buffer(st_point(1, 2), 0D))") == "POINT (1.0 2.0)"
    for expr, msg in [
        ("simplify_geometry(st_point(0,0), CAST('NaN' AS DOUBLE))", "NaN"),
        ("simplify_geometry(st_point(0,0), -1D)", "negative"),
        ("st_buffer(st_point(0,0), -1D)", "negative"),
        (
            "st_buffer(st_geometryfromtext("
            "'POLYGON ((0 0, 1 0, 1 1, 0 1, 0 0))'), 1D)",
            "only POINT",
        ),
    ]:
        with _pytest.raises(Exception, match=msg):
            one(expr)
    # transpiler routes all four now (were _GEO_UNSUPPORTED)
    from presto_copy_spark.dialect import transpile

    for n in (
        "st_buffer(a, 1)",
        "simplify_geometry(a, 0.5)",
        "geometry_invalid_reason(a)",
        "flatten_geometry_collections(a)",
    ):
        assert transpile(f"SELECT {n} FROM t")


def test_relate_intersection_randomized_round6(spark):
    """150 random integer-coordinate convex polygon pairs: st_touches /
    st_intersection / st_relate checked against two INDEPENDENT exact
    oracles — a separating-axis test (disjoint/touch/overlap trichotomy
    over edge normals, exact in Fractions) and Sutherland-Hodgman
    half-plane clipping (intersection area, exact in Fractions).  The
    SQL st_intersection / st_relate are hull-of-candidates +
    area-algebra — different algorithms, so their agreement is
    evidence, not tautology.  st_touches' interiors-disjoint leg IS an
    in-plan SAT since round 10 (double arithmetic over engine-parsed
    WKT vs this oracle's exact Fractions over the raw tuples), so for
    it this test checks the parse + sign pipeline, while its contact
    leg and st_relate's matrix stay algorithm-independent."""
    from fractions import Fraction

    import random

    from pyspark.sql import functions as F

    from presto_copy_spark.functions import register_all

    register_all(spark)
    rng = random.Random(4242)

    def convex_poly(cx, cy, r):
        # integer points on a loose circle -> convex hull (int coords)
        pts = set()
        while len(pts) < 3:
            pts = {
                (
                    cx + round(r * __import__("math").cos(a)),
                    cy + round(r * __import__("math").sin(a)),
                )
                for a in [rng.uniform(0, 6.283) for _ in range(rng.randint(3, 8))]
            }
        pts = sorted(pts)

        def half(seq):
            h = []
            for p in seq:
                while (
                    len(h) >= 2
                    and (h[-1][0] - h[-2][0]) * (p[1] - h[-2][1])
                    - (h[-1][1] - h[-2][1]) * (p[0] - h[-2][0])
                    <= 0
                ):
                    h.pop()
                h.append(p)
            return h

        lo, hi = half(pts), half(list(reversed(pts)))
        hull = lo[:-1] + hi[:-1]
        return hull if len(hull) >= 3 else None

    def sat(pa, pb):
        """max separation over edge normals: >0 disjoint, =0 touch,
        <0 interiors overlap (convex pairs; exact integers)."""
        best = None
        for poly, other in ((pa, pb), (pb, pa)):
            n = len(poly)
            for i in range(n):
                ex = poly[(i + 1) % n][0] - poly[i][0]
                ey = poly[(i + 1) % n][1] - poly[i][1]
                ax, ay = -ey, ex  # outward-ish normal (orientation-free)
                p1 = [ax * x + ay * y for x, y in poly]
                p2 = [ax * x + ay * y for x, y in other]
                gap = max(min(p2) - max(p1), min(p1) - max(p2))
                # normalize by axis length? comparisons to 0 only - no
                if best is None or gap > best:
                    best = gap
        return best

    def sh_clip_area(pa, pb):
        """Sutherland-Hodgman clip of pb by pa's half-planes; area as
        an exact Fraction (CCW input)."""
        def ccw(p):
            s = sum(
                (p[i][0] * p[(i + 1) % len(p)][1] - p[(i + 1) % len(p)][0] * p[i][1])
                for i in range(len(p))
            )
            return p if s > 0 else list(reversed(p))

        subj = [(Fraction(x), Fraction(y)) for x, y in ccw(pb)]
        clip = ccw(pa)
        for i in range(len(clip)):
            a, b = clip[i], clip[(i + 1) % len(clip)]
            inside = lambda q: (b[0] - a[0]) * (q[1] - a[1]) - (b[1] - a[1]) * (
                q[0] - a[0]
            ) >= 0
            out = []
            for j in range(len(subj)):
                cur, prv = subj[j], subj[j - 1]
                ic, ip = inside(cur), inside(prv)
                if ic != ip:
                    dx, dy = cur[0] - prv[0], cur[1] - prv[1]
                    den = (b[0] - a[0]) * dy - (b[1] - a[1]) * dx
                    t = (
                        (b[1] - a[1]) * (prv[0] - a[0])
                        - (b[0] - a[0]) * (prv[1] - a[1])
                    ) / den
                    out.append((prv[0] + t * dx, prv[1] + t * dy))
                if ic:
                    out.append(cur)
            subj = out
            if not subj:
                return Fraction(0)
        area2 = sum(
            subj[i][0] * subj[(i + 1) % len(subj)][1]
            - subj[(i + 1) % len(subj)][0] * subj[i][1]
            for i in range(len(subj))
        )
        return abs(area2) / 2

    def wkt(p, dup_at=None):
        # dup_at: duplicate the vertex at that index — a zero-length
        # edge, legal WKT, same geometry (ADVICE r10's degenerate-axis
        # class, here randomized end-to-end: the engine parses the
        # dup-vertex ring while the exact oracles see the clean tuples)
        ring = list(p) + [p[0]]
        if dup_at is not None:
            ring.insert(dup_at % len(p), ring[dup_at % len(p)])
        return "POLYGON ((" + ", ".join(f"{x} {y}" for x, y in ring) + "))"

    cases = []
    n_dup = 0
    while len(cases) < 150:
        pa = convex_poly(rng.randint(-5, 5), rng.randint(-5, 5), rng.randint(2, 8))
        # bias toward contact/overlap: B near A
        pb = convex_poly(rng.randint(-8, 12), rng.randint(-8, 12), rng.randint(2, 8))
        if pa and pb:
            da = rng.randrange(len(pa)) if rng.random() < 0.3 else None
            db = rng.randrange(len(pb)) if rng.random() < 0.3 else None
            n_dup += (da is not None) + (db is not None)
            cases.append((len(cases), wkt(pa, da), wkt(pb, db), pa, pb))
    assert n_dup >= 30, n_dup  # the degenerate class must be exercised
    df = spark.createDataFrame(
        [(i, wa, wb) for i, wa, wb, _, _ in cases], "i int, wa string, wb string"
    )
    rows = {
        r.i: r
        for r in df.selectExpr(
            "i",
            "st_touches(st_geometryfromtext(wa), st_geometryfromtext(wb)) AS t",
            "st_area(st_intersection(st_geometryfromtext(wa),"
            " st_geometryfromtext(wb))) AS ia",
            "st_relate(st_geometryfromtext(wa), st_geometryfromtext(wb),"
            " 'FF*FF****') AS disj",
            "st_relate(st_geometryfromtext(wa), st_geometryfromtext(wb),"
            " 'T********') AS ii",
        ).collect()
    }
    n_touch = n_overlap = 0
    for i, wa, wb, pa, pb in cases:
        gap = sat(pa, pb)
        ref_area = sh_clip_area(pa, pb)
        r = rows[i]
        assert abs(r.ia - float(ref_area)) < 1e-9, (wa, wb, r.ia, float(ref_area))
        assert r.t == (gap == 0), (wa, wb, gap, r.t)
        assert r.disj == (gap > 0), (wa, wb, gap, r.disj)
        assert r.ii == (gap < 0), (wa, wb, gap, r.ii)
        n_touch += gap == 0
        n_overlap += gap < 0
    # the generator must actually exercise the interesting classes
    assert n_overlap >= 20, n_overlap


def test_dissolved_bing_tiles_round6(spark):
    """geometry_to_dissolved_bing_tiles (BingTileFunctions.java:444):
    quadtree dissolve over the envelope cover — complete 4-child quads
    merge into parents recursively; partial quads stay at max zoom."""
    from presto_copy_spark.functions import register_all

    register_all(spark)

    def tiles(wkt, zoom):
        r = spark.sql(
            "SELECT geometry_to_dissolved_bing_tiles("
            f"st_geometryfromtext('{wkt}'), {zoom}) AS v"
        ).collect()[0].v
        return sorted((t.x, t.y, t.zoom) for t in r)

    # full 2x2 quad at zoom 2 -> the single zoom-1 parent
    assert tiles(
        "POLYGON ((-170 10, -10 10, -10 80, -170 80, -170 10))", 2
    ) == [(0, 0, 1)]
    # half-quad: no dissolve
    assert tiles(
        "POLYGON ((-170 50, -100 50, -100 80, -170 80, -170 50))", 2
    ) == [(0, 0, 2), (0, 1, 2)]
    # full 4x4 block at zoom 3 dissolves recursively to zoom 1
    assert tiles(
        "POLYGON ((-179 1, -1 1, -1 84, -179 84, -179 1))", 3
    ) == [(0, 0, 1)]
    # dissolved cover equals the flat cover as a region: expanding
    # every dissolved tile back to max zoom reproduces the flat cover
    r = spark.sql(
        """
SELECT array_sort(flatten(transform(
         geometry_to_dissolved_bing_tiles(g, 3),
         t -> flatten(transform(sequence(t.x * CAST(pow(2, 3 - t.zoom) AS BIGINT),
                                 (t.x + 1) * CAST(pow(2, 3 - t.zoom) AS BIGINT) - 1),
           xx -> transform(sequence(t.y * CAST(pow(2, 3 - t.zoom) AS BIGINT),
                                 (t.y + 1) * CAST(pow(2, 3 - t.zoom) AS BIGINT) - 1),
           yy -> named_struct('x', xx, 'y', yy, 'zoom', 3))))))) =
       array_sort(geometry_to_bing_tiles(g, 3)) AS same
FROM (SELECT st_geometryfromtext(
  'POLYGON ((-179 -80, 100 -80, 100 84, -179 84, -179 -80))') AS g)
"""
    ).collect()[0].same
    assert r is True


def test_st_difference_round6(spark):
    """st_difference / st_symdifference (convex fan decomposition —
    exact point set as a MULTIPOLYGON of disjoint convex pieces) plus
    the MULTIPOLYGON st_area branch; randomized area identities
    area(A\\B) = area(A) - area(A n B) and
    area(A xor B) = area(A) + area(B) - 2*area(A n B) over 60 random
    convex pairs (the SAME generator as the relate property test)."""
    import math
    import random

    from presto_copy_spark.functions import register_all

    register_all(spark)

    def one(e):
        return spark.sql(f"SELECT {e} AS v").collect()[0].v

    def g(w):
        return f"st_geometryfromtext('{w}')"

    sq = "POLYGON ((0 0, 2 0, 2 2, 0 2, 0 0))"
    ov = "POLYGON ((1 1, 3 1, 3 3, 1 3, 1 1))"
    assert one(f"st_area(st_difference({g(sq)}, {g(ov)}))") == 3.0
    assert one(f"st_area(st_symdifference({g(sq)}, {g(ov)}))") == 6.0
    assert one(f"st_astext(st_difference({g(sq)}, {g(sq)}))") is None
    # touching removes nothing
    assert (
        one(
            f"st_area(st_difference({g(sq)},"
            f" {g('POLYGON ((2 0, 4 0, 4 2, 2 2, 2 0))')}))"
        )
        == 4.0
    )
    # strict containment leaves the ring region (as convex pieces)
    assert (
        one(
            f"st_area(st_difference({g(sq)},"
            f" {g('POLYGON ((0.5 0.5, 1 0.5, 1 1, 0.5 1, 0.5 0.5))')}))"
        )
        == 3.75
    )
    # square minus 45-degree diamond: 4 corner pieces, area 2
    d = one(
        "st_difference("
        f" {g('POLYGON ((0 0, 4 0, 4 4, 0 4, 0 0))')},"
        f" {g('POLYGON ((2 -1, 5 2, 2 5, -1 2, 2 -1))')})"
    )
    assert abs(
        one(
            "st_area(st_difference("
            f" {g('POLYGON ((0 0, 4 0, 4 4, 0 4, 0 0))')},"
            f" {g('POLYGON ((2 -1, 5 2, 2 5, -1 2, 2 -1))')}))"
        )
        - 2.0
    ) < 1e-9
    # randomized area identities
    rng = random.Random(777)

    def convex_poly(cx, cy, r):
        pts = set()
        while len(pts) < 3:
            pts = {
                (
                    cx + round(r * math.cos(a)),
                    cy + round(r * math.sin(a)),
                )
                for a in [rng.uniform(0, 6.283) for _ in range(rng.randint(3, 8))]
            }
        pts = sorted(pts)

        def half(seq):
            h = []
            for p in seq:
                while (
                    len(h) >= 2
                    and (h[-1][0] - h[-2][0]) * (p[1] - h[-2][1])
                    - (h[-1][1] - h[-2][1]) * (p[0] - h[-2][0])
                    <= 0
                ):
                    h.pop()
                h.append(p)
            return h

        lo, hi = half(pts), half(list(reversed(pts)))
        hull = lo[:-1] + hi[:-1]
        return hull if len(hull) >= 3 else None

    def wkt(p):
        ring = list(p) + [p[0]]
        return "POLYGON ((" + ", ".join(f"{x} {y}" for x, y in ring) + "))"

    cases = []
    while len(cases) < 60:
        pa = convex_poly(rng.randint(-5, 5), rng.randint(-5, 5), rng.randint(2, 7))
        pb = convex_poly(rng.randint(-7, 9), rng.randint(-7, 9), rng.randint(2, 7))
        if pa and pb:
            cases.append((len(cases), wkt(pa), wkt(pb)))
    df = spark.createDataFrame(cases, "i int, wa string, wb string")
    rows = df.selectExpr(
        "st_area(st_geometryfromtext(wa)) AS aa",
        "st_area(st_geometryfromtext(wb)) AS ab",
        "st_area(st_intersection(st_geometryfromtext(wa),"
        " st_geometryfromtext(wb))) AS ia",
        "st_area(st_difference(st_geometryfromtext(wa),"
        " st_geometryfromtext(wb))) AS da",
        "st_area(st_symdifference(st_geometryfromtext(wa),"
        " st_geometryfromtext(wb))) AS sa",
    ).collect()
    for r in rows:
        assert abs(r.da - (r.aa - r.ia)) < 1e-7, (r.aa, r.ia, r.da)
        assert abs(r.sa - (r.aa + r.ab - 2 * r.ia)) < 1e-7, r


def test_khll_truncation_randomized_round6(spark):
    """khyperloglog_agg's bottom-K truncation (K = 4096) against a
    brute-force Python reference on 6000 distinct values (so the
    truncation path actually executes): the kept keys must be exactly
    the 4096 smallest value-hashes, each mapped to its exact distinct
    uii-hash set, and uniqueness_distribution / merge_khll must agree
    with the reference computed from the truncated map."""
    import hashlib
    import random

    from presto_copy_spark.dialect import transpile
    from presto_copy_spark.functions import register_all

    register_all(spark)
    rng = random.Random(991)
    rows = []
    for v in range(6000):
        for u in range(rng.randint(1, 3)):
            rows.append((v, v * 10 + u))
    rng.shuffle(rows)
    spark.createDataFrame(rows, "v int, uii int").createOrReplaceTempView(
        "_khll_trunc"
    )

    def h60(x) -> int:
        return int(hashlib.md5(str(x).encode()).hexdigest()[:15], 16)

    # brute-force reference
    pairs = sorted({(h60(v), h60(u)) for v, u in rows})
    keys = sorted({h for h, _ in pairs})[:4096]
    kept = set(keys)
    ref = {}
    for h, u in pairs:
        if h in kept:
            ref.setdefault(h, set()).add(u)

    got = spark.sql(
        transpile("SELECT khyperloglog_agg(v, uii) AS k FROM _khll_trunc")
    ).collect()[0].k
    assert len(got) == 4096
    assert sorted(got) == keys
    for h, us in got.items():
        assert sorted(us) == sorted(ref[h]), h
    # accessor consistency on the truncated sketch
    r = spark.sql(
        transpile(
            """
WITH s AS (SELECT khyperloglog_agg(v, uii) AS k FROM _khll_trunc)
SELECT uniqueness_distribution(k, 3) AS ud,
       reidentification_potential(k, 1) AS reid
FROM s
"""
        )
    ).collect()[0]
    import collections

    hist = collections.Counter(min(len(us), 3) for us in ref.values())
    for b in (1, 2, 3):
        assert abs(r.ud[b] - hist.get(b, 0) / 4096) < 1e-12
    assert abs(
        r.reid - sum(1 for us in ref.values() if len(us) <= 1) / 4096
    ) < 1e-12
    # merging two disjoint halves re-truncates to the global bottom-K
    r2 = spark.sql(
        transpile(
            """
WITH s AS (SELECT v % 2 AS g, khyperloglog_agg(v, uii) AS k
           FROM _khll_trunc GROUP BY v % 2)
SELECT merge_khll(collect_list(k)) AS k FROM s
"""
        )
    ).collect()[0].k
    assert sorted(r2) == keys


def test_user_profile_stream_agg_parity(spark, sf_dir):
    """user_profile_stream_agg (round 13, the scale path): the built-in
    streaming aggregation must emit the same final per-user profile as
    BOTH the custom-state form (applyInPandasWithState) and the batch
    twin — three independent formulations, one result.  The JVM form's
    machinery premium is flat across decades where the per-key pandas
    form's grows (streaming/jobs.py premium-scaling note)."""
    from presto_copy_spark.catalog import load_table
    from presto_copy_spark.streaming.jobs import run_stream_to_batch, stream_events
    from presto_copy_spark.streaming.stateful import (
        user_profile_batch,
        user_profile_state,
        user_profile_stream_agg,
    )

    cols = ["user_id", "n_events", "sum_value_cents", "last_event_type"]
    # collect each streamed result BEFORE starting the next stream:
    # run_stream_to_batch reaps prior sink dirs on entry (documented
    # tmpfs hygiene), so a lazily-held result would read a deleted dir
    a = sorted(
        map(
            tuple,
            run_stream_to_batch(
                user_profile_stream_agg(stream_events(spark, sf_dir)),
                mode="update",
                keys=["user_id"],
            )
            .select(*cols)
            .collect(),
        )
    )
    b = sorted(
        map(
            tuple,
            run_stream_to_batch(
                user_profile_state(stream_events(spark, sf_dir)),
                mode="update",
                keys=["user_id"],
            )
            .select(*cols)
            .collect(),
        )
    )
    c = sorted(
        map(
            tuple,
            user_profile_batch(load_table(spark, sf_dir, "events"))
            .select(*cols)
            .collect(),
        )
    )
    assert a == b == c and a


def test_user_profile_tie_cents_parity(spark, tmp_path):
    """Values whose cents land on an exact .5 in float (0.125 -> 12.5,
    -0.625 -> -62.5) must round HALF_UP away from zero on ALL THREE
    profile paths — the events fixture has no tie values, so the
    three-way parity test above could not catch _reduce using pandas
    round() (banker's half-to-even: 12.5 -> 12, -62.5 -> -62) while
    its twins and the DuckDB oracle round half away from zero
    (ADVICE r13, medium)."""
    import datetime as dt

    from presto_copy_spark.streaming.jobs import run_stream_to_batch, stream_events
    from presto_copy_spark.streaming.stateful import (
        user_profile_batch,
        user_profile_state,
        user_profile_stream_agg,
    )

    t0 = dt.datetime(2024, 1, 1)
    rows = [
        (1, t0, 10, "a", 0.125),                          # 12.5 -> 13
        (1, t0 + dt.timedelta(seconds=1), 11, "b", 2.0),  # 200
        (2, t0, 20, "c", -0.625),                         # -62.5 -> -63
        (2, t0 + dt.timedelta(seconds=1), 21, "d", 1.0),  # 100
    ]
    schema = (
        "user_id long, ts timestamp, event_id long, "
        "event_type string, value double"
    )
    events = spark.createDataFrame(rows, schema)
    events.coalesce(1).write.parquet(str(tmp_path / "events.parquet"))
    sf = str(tmp_path)

    expected = [(1, 2, 213, "b"), (2, 2, 37, "d")]
    cols = ["user_id", "n_events", "sum_value_cents", "last_event_type"]
    batch = sorted(map(tuple, user_profile_batch(events).select(*cols).collect()))
    assert batch == expected
    # collect each streamed result before starting the next (sink reap)
    agg = sorted(
        map(
            tuple,
            run_stream_to_batch(
                user_profile_stream_agg(stream_events(spark, sf)),
                mode="update",
                keys=["user_id"],
            )
            .select(*cols)
            .collect(),
        )
    )
    assert agg == expected
    state = sorted(
        map(
            tuple,
            run_stream_to_batch(
                user_profile_state(stream_events(spark, sf)),
                mode="update",
                keys=["user_id"],
            )
            .select(*cols)
            .collect(),
        )
    )
    assert state == expected
