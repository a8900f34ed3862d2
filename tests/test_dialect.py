"""Presto->Spark dialect transpiler unit tests (presto_copy_spark/dialect.py).

Covers the lexical rules (quoting, literals untouched) plus live
execution of the rewritten constructs on the test session.
"""

from __future__ import annotations

from presto_copy_spark.dialect import transpile


def test_quoted_identifiers_and_escapes():
    assert transpile('SELECT "a" FROM t') == "SELECT `a` FROM t"
    assert transpile('SELECT "a""b" FROM t') == "SELECT `a\"b` FROM t"


def test_string_literals_never_rewritten():
    # the old regex shim rewrote function names inside string literals
    sql = "SELECT 'variance(x)' AS s, variance(x) AS v FROM t"
    out = transpile(sql)
    assert "'variance(x)'" in out
    assert "var_samp(x)" in out


def test_agg_renames_only_at_call_sites():
    out = transpile("SELECT arbitrary(x), array_agg(y), approx_distinct(z) FROM t")
    assert out == "SELECT any_value(x), collect_list(y), approx_count_distinct(z) FROM t"
    # a column merely NAMED like a function is untouched
    assert transpile("SELECT variance FROM t") == "SELECT variance FROM t"


def test_unit_first_datetime():
    assert (
        transpile("SELECT date_add('day', 3, ts) FROM t")
        == "SELECT timestampadd(DAY, 3, ts) FROM t"
    )
    assert (
        transpile("SELECT date_diff('month', a, b) FROM t")
        == "SELECT timestampdiff(MONTH, a, b) FROM t"
    )
    # Spark's own 2-arg date_add must pass through untouched
    assert transpile("SELECT date_add(d, 3) FROM t") == "SELECT date_add(d, 3) FROM t"


def test_mysql_format_strings():
    assert (
        transpile("SELECT date_format(ts, '%Y-%m-%d %H:%i:%s') FROM t")
        == "SELECT date_format(ts, 'yyyy-MM-dd HH:mm:ss') FROM t"
    )
    assert (
        transpile("SELECT date_parse(s, '%Y%m%d') FROM t")
        == "SELECT to_timestamp(s, 'yyyyMMdd') FROM t"
    )


def test_try_shapes():
    assert (
        transpile("SELECT TRY(CAST(x AS BIGINT)) FROM t")
        == "SELECT try_cast(x AS BIGINT) FROM t"
    )
    assert transpile("SELECT TRY(a / b) FROM t") == "SELECT try_divide(a, b) FROM t"
    assert transpile("SELECT TRY(a + b) FROM t") == "SELECT try_add(a, b) FROM t"
    assert (
        transpile("SELECT TRY(element_at(m, k)) FROM t")
        == "SELECT try_element_at(m, k) FROM t"
    )
    # nested parens keep inner ops out of the top-level scan
    assert (
        transpile("SELECT TRY(CAST(100 AS DOUBLE) / (p - 1)) FROM t")
        == "SELECT try_divide(CAST(100 AS DOUBLE), (p - 1)) FROM t"
    )


def test_unnest_rewrites():
    out = transpile(
        "SELECT x FROM t CROSS JOIN UNNEST(arr) AS u(x)"
    )
    assert "LATERAL VIEW explode(arr) u AS x" in out
    assert "CROSS JOIN" not in out
    out = transpile(
        "SELECT w, i FROM t CROSS JOIN UNNEST(arr) WITH ORDINALITY AS u(w, i)"
    )
    assert "LATERAL VIEW inline(transform(arr" in out
    assert "u AS w, i" in out


def test_nested_calls_rewritten():
    out = transpile("SELECT array_agg(date_add('day', 1, ts)) FROM t")
    assert out == "SELECT collect_list(timestampadd(DAY, 1, ts)) FROM t"


# ---- live execution --------------------------------------------------------
def test_transpiled_sql_executes(spark):
    from presto_copy_spark.engine import Engine

    rows = spark.sql(
        transpile(
            "SELECT date_diff('month', TIMESTAMP '2024-01-31 00:00:00',"
            " TIMESTAMP '2024-02-01 00:00:00') AS md,"
            " TRY(CAST('zz' AS BIGINT)) AS t1,"
            " TRY(1 / 0) AS t2"
        )
    ).collect()
    assert rows[0].md == 0  # day-aware truncation, Presto semantics
    assert rows[0].t1 is None and rows[0].t2 is None


def test_unnest_ordinality_live(spark):
    rows = spark.sql(
        transpile(
            "SELECT x, i FROM (SELECT array('a','b','c') AS arr) t"
            " CROSS JOIN UNNEST(arr) WITH ORDINALITY AS u(x, i)"
        )
    ).collect()
    assert [(r.x, r.i) for r in rows] == [("a", 1), ("b", 2), ("c", 3)]


def test_unnest_empty_array_drops_row(spark):
    rows = spark.sql(
        transpile(
            "SELECT x, i FROM (SELECT CAST(array() AS ARRAY<STRING>) AS arr) t"
            " CROSS JOIN UNNEST(arr) WITH ORDINALITY AS u(x, i)"
        )
    ).collect()
    assert rows == []


def test_view_ddl_rewrite():
    out = transpile(
        "CREATE VIEW v SECURITY DEFINER AS SELECT date_add('day', 1, ts) AS d FROM t"
    )
    assert out == (
        "CREATE TEMPORARY VIEW v AS SELECT timestampadd(DAY, 1, ts) AS d FROM t"
    )
    out = transpile("CREATE OR REPLACE VIEW v COMMENT 'c' AS SELECT 1 AS one")
    assert out == "CREATE OR REPLACE TEMPORARY VIEW v AS SELECT 1 AS one"
    # DROP VIEW passes through (Spark resolves temp views first)
    assert transpile("DROP VIEW IF EXISTS v") == "DROP VIEW IF EXISTS v"
    # non-view CREATE is untouched
    assert transpile("CREATE TABLE t (x INT)") == "CREATE TABLE t (x INT)"


def test_decimal_typed_literal():
    out = transpile("SELECT decimal '0.06' + decimal '0.01' FROM t")
    assert out == (
        "SELECT CAST('0.06' AS DECIMAL(2,2)) + CAST('0.01' AS DECIMAL(2,2)) FROM t"
    )
    assert transpile("SELECT DECIMAL '123'") == "SELECT CAST('123' AS DECIMAL(3,0))"
    # a column named decimal is untouched
    assert transpile("SELECT decimal FROM t") == "SELECT decimal FROM t"


def test_catalog_qualified_names_stripped():
    assert (
        transpile("SELECT name FROM tpch.tiny.nation WHERE name LIKE '%AN'")
        == "SELECT name FROM nation WHERE name LIKE '%AN'"
    )
    assert transpile("SELECT * FROM hive.default.orders") == "SELECT * FROM orders"
    # bare tpch as an identifier survives
    assert transpile("SELECT tpch FROM t") == "SELECT tpch FROM t"


def test_array_literal_and_map_constructor():
    assert (
        transpile("SELECT MAP(ARRAY ['a', 'b'], ARRAY[1, 2])['b']")
        == "SELECT map_from_arrays(array('a', 'b'), array(1, 2))['b']"
    )
    # subscripts are never touched; Spark-style map(k, v) passes through
    assert transpile("SELECT a[1] FROM t") == "SELECT a[1] FROM t"
    assert transpile("SELECT map(k, v) FROM t") == "SELECT map(k, v) FROM t"


def test_bare_varchar_cast():
    assert transpile("SELECT CAST(10 AS VARCHAR)") == "SELECT CAST(10 AS STRING)"
    assert (
        transpile("SELECT TRY_CAST(x AS VARCHAR) FROM t")
        == "SELECT TRY_CAST(x AS STRING) FROM t"
    )
    # sized varchar and identifiers named varchar survive
    assert (
        transpile("SELECT CAST(x AS VARCHAR(10)) FROM t")
        == "SELECT CAST(x AS VARCHAR(10)) FROM t"
    )
    assert transpile("SELECT varchar FROM t") == "SELECT varchar FROM t"


def test_tablesample_rewrite(spark):
    assert (
        transpile("SELECT * FROM t TABLESAMPLE BERNOULLI (10)")
        == "SELECT * FROM t TABLESAMPLE (10 PERCENT)"
    )
    assert (
        transpile("SELECT * FROM t TABLESAMPLE SYSTEM(50)")
        == "SELECT * FROM t TABLESAMPLE (50 PERCENT)"
    )
    # executes end-to-end
    spark.range(100).createOrReplaceTempView("ts_t")
    n = spark.sql(
        transpile("SELECT count(*) AS n FROM ts_t TABLESAMPLE BERNOULLI (50)")
    ).first()["n"]
    assert 0 <= n <= 100


def test_order_by_null_ordering_normalized(spark):
    # Presto: NULL sorts as larger than any value (ASC->LAST, DESC->FIRST)
    assert (
        transpile("SELECT * FROM t ORDER BY a, b DESC LIMIT 5")
        == "SELECT * FROM t ORDER BY a NULLS LAST, b DESC NULLS FIRST LIMIT 5"
    )
    # explicit modifiers survive; window ORDER BY is normalized too
    assert (
        transpile("SELECT * FROM t ORDER BY a NULLS FIRST, b ASC")
        == "SELECT * FROM t ORDER BY a NULLS FIRST, b ASC NULLS LAST"
    )
    assert (
        transpile("SELECT rank() OVER (ORDER BY x DESC) FROM t")
        == "SELECT rank() OVER (ORDER BY x DESC NULLS FIRST) FROM t"
    )
    # live semantics: nulls come LAST ascending, FIRST descending
    rows = spark.sql(
        transpile("SELECT x FROM (VALUES (2), (NULL), (1)) AS v(x) ORDER BY x")
    ).collect()
    assert [r["x"] for r in rows] == [1, 2, None]
    rows = spark.sql(
        transpile("SELECT x FROM (VALUES (2), (NULL), (1)) AS v(x) ORDER BY x DESC")
    ).collect()
    assert [r["x"] for r in rows] == [None, 2, 1]


def test_window_frame_fixups(spark):
    # Presto ignores frames on ranking/offset functions; Spark rejects them
    assert (
        transpile("SELECT lag(d) OVER (PARTITION BY s ORDER BY o ROWS BETWEEN 2 PRECEDING AND CURRENT ROW) FROM t")
        == "SELECT lag(d) OVER (PARTITION BY s ORDER BY o NULLS LAST) FROM t"
    )
    assert (
        transpile("SELECT rank() OVER (ORDER BY d RANGE BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) FROM t")
        == "SELECT rank() OVER (ORDER BY d NULLS LAST) FROM t"
    )
    # rank with no ORDER BY: all rows are peers in Presto
    assert (
        transpile("SELECT rank() OVER (PARTITION BY s) FROM t")
        == "SELECT rank() OVER (PARTITION BY s ORDER BY 1) FROM t"
    )
    # aggregate window frames pass through untouched
    out = transpile("SELECT sum(x) OVER (ORDER BY o ROWS BETWEEN 1 PRECEDING AND CURRENT ROW) FROM t")
    assert "ROWS BETWEEN 1 PRECEDING AND CURRENT ROW" in out
    # live: all-peers rank is 1 everywhere
    rows = spark.sql(
        transpile("SELECT x, rank() OVER (PARTITION BY x % 2) AS r FROM (VALUES (1),(2),(3),(4)) v(x)")
    ).collect()
    assert all(r["r"] == 1 for r in rows)


def test_unsupported_type_gaps_raise_clear_errors():
    """Documented type gaps (SURVEY §1.2) produce a clear transpiler
    message, not Spark's downstream parse error (VERDICT r2 item 8).
    Reference: StandardTypes.java:42-43,55-57."""
    import pytest

    from presto_copy_spark.dialect import PrestoFeatureUnsupportedError, transpile

    for bad, frag in [
        ("SELECT TIME '01:00'", "TIME literal"),
        ("SELECT CAST(x AS TIME) FROM t", "CAST to time type"),
        ("SELECT CAST(x AS TIME WITH TIME ZONE) FROM t", "with time zone"),
        ("SELECT CAST(x AS TIMESTAMP WITH TIME ZONE) FROM t", "with time zone"),
        ("SELECT x AT TIME ZONE 'UTC' FROM t", "AT TIME ZONE"),
    ]:
        with pytest.raises(PrestoFeatureUnsupportedError, match="unsupported"):
            transpile(bad)
        try:
            transpile(bad)
        except PrestoFeatureUnsupportedError as e:
            assert frag.lower() in str(e).lower(), (bad, str(e))
            assert "documented gap" in str(e)


def test_at_time_zone_offset_rewrite(spark):
    """timezone_hour/minute over AT TIME ZONE compute the zone offset at
    the instant (positive, negative, and half-hour zones)."""
    from presto_copy_spark.dialect import transpile

    sql = transpile(
        "SELECT timezone_hour(TIMESTAMP '2001-08-22 03:04:05' AT TIME ZONE 'Asia/Oral') h1,"
        " timezone_minute(TIMESTAMP '2001-08-22 03:04:05' AT TIME ZONE 'Asia/Oral') m1,"
        " timezone_hour(TIMESTAMP '2001-08-22 03:04:05' AT TIME ZONE 'America/St_Johns') h2,"
        " timezone_minute(TIMESTAMP '2001-08-22 03:04:05' AT TIME ZONE 'America/St_Johns') m2,"
        " timezone_hour(TIMESTAMP '2001-08-22 03:04:05' AT TIME ZONE 'Asia/Kolkata') h3,"
        " timezone_minute(TIMESTAMP '2001-08-22 03:04:05' AT TIME ZONE 'Asia/Kolkata') m3"
    )
    [r] = spark.sql(sql).collect()
    assert (r.h1, r.m1) == (5, 0)
    assert (r.h2, r.m2) == (-2, -30)  # NDT in August
    assert (r.h3, r.m3) == (5, 30)


def test_quantified_comparisons_and_row(spark):
    """= ANY/SOME -> IN, <> ALL -> NOT IN (exact 3-valued equivalents);
    other quantifier combos raise the documented-gap error; ROW
    constructor -> struct and ROW type -> STRUCT<> incl. nesting
    (SqlBase.g4 comparisonQuantifier / rowConstructor)."""
    import pytest

    from presto_copy_spark.dialect import PrestoFeatureUnsupportedError, transpile

    spark.range(3).createOrReplaceTempView("qt1")
    spark.range(2).selectExpr("id + 1 AS k").createOrReplaceTempView("qt2")
    rows = spark.sql(
        transpile("SELECT id FROM qt1 WHERE id = ANY (SELECT k FROM qt2)")
    ).collect()
    assert sorted(r.id for r in rows) == [1, 2]
    rows = spark.sql(
        transpile("SELECT id FROM qt1 WHERE id <> ALL (SELECT k FROM qt2)")
    ).collect()
    assert [r.id for r in rows] == [0]
    with pytest.raises(PrestoFeatureUnsupportedError):
        transpile("SELECT id FROM qt1 WHERE id > ALL (SELECT k FROM qt2)")
    [r] = spark.sql(
        transpile(
            "SELECT CAST(ROW(1, ROW(2,3)) AS ROW(a int, b ROW(c int, d int))).b.d AS d"
        )
    ).collect()
    assert r.d == 3
    # Spark's any() aggregate must pass through untouched
    assert "any(" in transpile("SELECT any(id > 1) FROM qt1")


def test_review_regressions_row_quantifier_time_alias(spark):
    """r3 code-review regressions: ROW type with whitespace before the
    paren, a comment between the comparison operator and ANY, and an
    alias literally named `time` (must NOT be rejected — only CAST's
    type position is the documented gap)."""
    from presto_copy_spark.dialect import transpile

    assert "STRUCT<x: int, y: int>" in transpile(
        "SELECT CAST(ROW(1, 2) AS ROW (x int, y int)).x"
    )
    t = transpile("SELECT x FROM t WHERE y = /*c*/ ANY(SELECT k FROM u)")
    assert " IN " in t and "=" not in t.split("WHERE")[1]
    spark.range(1).createOrReplaceTempView("qt3")
    [r] = spark.sql(transpile("SELECT (SELECT 7 AS time) AS v FROM qt3")).collect()
    assert r.v == 7


def test_lambda_match_functions(spark):
    """ArrayFunctions.java anyMatch/allMatch/noneMatch -> Spark
    exists/forall/NOT exists, with Presto null propagation."""
    from presto_copy_spark.dialect import transpile

    out = transpile("SELECT any_match(a, x -> x > 1), none_match(a, x -> x > 0) FROM t")
    assert "exists(a, x -> x > 1)" in out
    assert "(NOT exists(a, x -> x > 0))" in out
    row = spark.sql(
        transpile(
            "SELECT any_match(array(1,2,3), x -> x > 2) AS a,"
            " all_match(array(1,2,3), x -> x > 0) AS b,"
            " none_match(array(1,2,3), x -> x > 1) AS c,"
            " none_match(CAST(NULL AS ARRAY<INT>), x -> x > 1) AS d"
        )
    ).collect()[0]
    assert (row.a, row.b, row.c, row.d) == (True, True, False, None)


def test_string_map_and_normalize_names(spark):
    """split_to_map/ends_with/contains renames + normalize forms
    (StringFunctions.java, ArrayContains.java)."""
    from presto_copy_spark.dialect import transpile
    from presto_copy_spark.functions import register_all

    register_all(spark)
    row = spark.sql(
        transpile(
            "SELECT split_to_map('a=1,b=2', ',', '=')['b'] AS m,"
            " ends_with('abc', 'bc') AS e,"
            " contains(ARRAY[1,2], 2) AS c,"
            " normalize('①', NFKC) AS n,"
            " word_stem('running') AS w"
        )
    ).collect()[0]
    assert (row.m, row.e, row.c, row.n, row.w) == ("2", True, True, "1", "runn")


def test_aggregate_name_rewrites(spark):
    """bitwise_xor_agg -> bit_xor; set_union -> distinct-flatten over
    collected arrays (SetUnionFunction.java)."""
    from presto_copy_spark.dialect import transpile

    assert spark.sql(
        transpile("SELECT bitwise_xor_agg(x) a FROM (VALUES 5, 3) t(x)")
    ).collect()[0].a == 6
    u = spark.sql(
        transpile("SELECT set_union(a) u FROM (VALUES ARRAY[1,2], ARRAY[2,3]) t(a)")
    ).collect()[0].u
    assert sorted(u) == [1, 2, 3]


def test_entropy_and_approx_set_rewrites(spark, duck):
    """entropy(c) -> single-pass Shannon entropy of the count
    distribution (EntropyAggregation.java), checked against DuckDB
    computing the same formula; approx_set -> hll_sketch_agg."""
    from presto_copy_spark.dialect import transpile

    got = spark.sql(
        transpile("SELECT entropy(c) e FROM (VALUES 1, 1, 2) t(c)")
    ).collect()[0].e
    want = duck.sql(
        "SELECT log2(sum(c)) - sum(CASE WHEN c > 0 THEN c * log2(c) END)"
        " / sum(c) FROM (VALUES (1), (1), (2)) t(c)"
    ).fetchone()[0]
    assert abs(got - want) < 1e-12 and abs(got - 1.5) < 1e-12
    n = spark.sql(
        transpile(
            "SELECT cardinality(a) + hll_sketch_estimate(approx_set(x)) n"
            " FROM (VALUES (ARRAY[9], 1), (ARRAY[9], 2)) t(a, x)"
            " GROUP BY a"
        )
    ).collect()[0].n
    assert n == 3  # cardinality still array-length; approx_set is HLL


def test_combinations_rewrite(spark):
    """combinations(array, n) (ArrayCombinationsFunction.java) expands
    for literal n as nested index-tuple transforms — matches
    itertools.combinations ordering for every n in the 0..5 contract."""
    import itertools

    from presto_copy_spark.dialect import transpile

    for arr, n in [([1, 2, 3], 2), ([1, 2, 3, 4], 3), ([1, 2], 5), ([1, 2, 3], 1)]:
        lit = "ARRAY[" + ",".join(map(str, arr)) + "]"
        got = spark.sql(transpile(f"SELECT combinations({lit}, {n}) x")).collect()[0].x
        want = [list(c) for c in itertools.combinations(arr, n)]
        assert [list(g) for g in got] == want, (arr, n)


def test_qdigest_names_transpile_and_run(spark):
    """QuantileDigestFunctions.java SQL names route to the KLL-backed
    digest model at transpile time; the literal rank survives the
    rewrite (Spark's accessor demands a foldable rank, which blocked
    the CREATE FUNCTION macro form).  In KLL exact mode (n <= 200) the
    quantile is the ceil(q*n)-th order statistic."""
    from presto_copy_spark import dialect

    out = dialect.transpile(
        "SELECT value_at_quantile(qdigest_agg(x), 0.5),"
        " quantile_at_value(tdigest_agg(x), 7.0),"
        " values_at_quantiles(qdigest_agg(x), ARRAY[0.1, 0.9]) FROM t"
    )
    assert "kll_sketch_get_quantile_double(kll_sketch_agg_double(x), 0.5)" in out
    assert "kll_sketch_get_rank_double(kll_sketch_agg_double(x), 7.0)" in out
    assert out.count("kll_sketch_get_quantile_double") == 3  # array expanded

    spark.createDataFrame(
        [(float(v),) for v in range(1, 101)], "x double"
    ).createOrReplaceTempView("_qd_t")
    row = spark.sql(
        dialect.transpile(
            "SELECT value_at_quantile(qdigest_agg(x), 0.5) AS med,"
            " values_at_quantiles(qdigest_agg(x), ARRAY[0.25, 0.75]) AS qs,"
            " quantile_at_value(qdigest_agg(x), 80.0) AS r FROM _qd_t"
        )
    ).collect()[0]
    assert row.med == 50.0
    assert row.qs == [25.0, 75.0]
    assert row.r == 0.8


def test_datetime_format_rewrites_round5(spark):
    """date_parse (MySQL %-format) / format_datetime / parse_datetime
    (Joda) with LITERAL formats translate at transpile time."""
    from presto_copy_spark.dialect import transpile

    r = spark.sql(
        transpile(
            "SELECT date_parse('2023-07-15 10:30:45', '%Y-%m-%d %H:%i:%s') AS a,"
            " format_datetime(TIMESTAMP '2023-07-15 10:30:45', 'yyyy/MM/dd HH:mm') AS b,"
            " parse_datetime('2023-07-15', 'yyyy-MM-dd') AS c,"
            " rgb(255, 136, 0) AS d"
        )
    ).collect()[0]
    assert str(r.a) == "2023-07-15 10:30:45"
    assert r.b == "2023/07/15 10:30"
    assert str(r.c) == "2023-07-15 00:00:00"
    assert r.d == 0xFF8800
    # non-literal format: no rewrite (stays unresolved -> caller sees
    # the honest resolution error, not silent misparse)
    t = transpile("SELECT date_parse(x, f) FROM t")
    assert "date_parse(" in t


def test_set_digest_and_noisy_renames_round5(spark):
    """make_set_digest/merge_set_digest route to the theta twins;
    noisy_count_if_gaussian's unseeded form is exact at scale 0."""
    from presto_copy_spark.dialect import transpile

    est = spark.sql(
        transpile(
            "SELECT sketch_theta_estimate(merge_set_digest(d)) AS est FROM ("
            " SELECT make_set_digest(id) AS d FROM range(0, 500) GROUP BY id % 4)"
        )
    ).collect()[0].est
    assert abs(est - 500) / 500 < 0.05
    assert (
        spark.sql(
            transpile(
                "SELECT noisy_count_if_gaussian(id % 2 = 0, 0.0) AS c"
                " FROM range(0, 100)"
            )
        ).collect()[0].c
        == 50
    )


def test_differential_entropy_fixed_histogram_mle(spark):
    """differential_entropy 6-arg fixed_histogram_mle form: exact
    FixedHistogramMleStateStrategy formula over a literal histogram."""
    import math

    import pytest as _pytest

    from presto_copy_spark.dialect import (
        PrestoFeatureUnsupportedError,
        transpile,
    )

    rows = [(0.5, 1.0), (0.7, 1.0), (0.9, 1.0), (2.5, 1.0)]
    spark.createDataFrame(rows, "x double, w double").createOrReplaceTempView(
        "_de_t"
    )
    got = spark.sql(
        transpile(
            "SELECT differential_entropy(4, x, w, 'fixed_histogram_mle',"
            " 0.0, 4.0) AS e FROM _de_t"
        )
    ).collect()[0].e
    p = [3 / 4, 1 / 4]
    expect = (-(sum(pi * math.log(pi) for pi in p)) + math.log(1.0)) / math.log(2)
    assert abs(got - expect) < 1e-12
    # uniform over [0,1) has 0 bits of differential entropy
    spark.createDataFrame(
        [((i + 0.5) / 8, 1.0) for i in range(8)], "x double, w double"
    ).createOrReplaceTempView("_de_u")
    assert (
        spark.sql(
            transpile(
                "SELECT differential_entropy(8, x, w, 'fixed_histogram_mle',"
                " 0.0, 1.0) AS e FROM _de_u"
            )
        ).collect()[0].e
        == 0.0
    )
    # reservoir/Vasicek forms: typed unsupported
    with _pytest.raises(PrestoFeatureUnsupportedError, match="differential_entropy"):
        transpile(
            "SELECT differential_entropy(100, x, w, 'unknown', 0.0, 1.0) FROM t"
        )


def test_numeric_histogram_equidepth_twin(spark):
    """numeric_histogram -> the deterministic equi-depth twin: B bins
    at the mid-quantiles, each carrying total_weight/B (the reference's
    adaptive bin-merge is insertion-order-dependent — engine-specific
    by nature; twin semantics documented like qdigest -> KLL)."""
    from presto_copy_spark.dialect import transpile

    h = spark.sql(
        transpile(
            "SELECT numeric_histogram(4, CAST(id AS DOUBLE)) AS h"
            " FROM range(0, 100)"
        )
    ).collect()[0].h
    assert len(h) == 4
    assert all(v == 25.0 for v in h.values())
    cents = sorted(h)
    # mid-quantile centers of uniform 0..99
    assert cents[0] < 25 < cents[1] < 50 < cents[2] < 75 < cents[3]
    hw = spark.sql(
        transpile(
            "SELECT numeric_histogram(2, x, w) AS h"
            " FROM (VALUES (1.0, 3), (10.0, 1)) t(x, w)"
        )
    ).collect()[0].h
    assert sorted(hw.values()) == [2.0, 2.0]
