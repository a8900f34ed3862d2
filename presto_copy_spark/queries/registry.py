"""Central query registry: every implemented operator/query from
SURVEY §2 registers (name, spark_fn, oracle_sql) here.

- spark_fn(spark, sf_dir) -> DataFrame — the Spark-first implementation.
- oracle_sql — equivalent ANSI SQL for the DuckDB oracle (None for ops
  not SQL-expressible; the driver then records a weaker rows-only check).

Determinism contract (driver hashes sorted values): every aggregate /
computed column is aliased identically on both sides; floating-point
aggregates are rounded (sums to 2dp, ratios to 6dp) so partial-agg
ordering differences between Spark and DuckDB can't flip the hash.
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

QUERIES: dict[str, Callable[[SparkSession, str], DataFrame]] = {}
ORACLES: dict[str, str] = {}


def query(name: str, oracle: str | None = None):
    """Decorator: register a query implementation + its oracle SQL."""

    def deco(fn: Callable[[SparkSession, str], DataFrame]):
        QUERIES[name] = fn
        if oracle is not None:
            ORACLES[name] = oracle
        return fn

    return deco


# The driver's CORRECTNESS check verifies only the FIRST 50 registry
# entries (dict insertion order). Curate that budget explicitly so the 50
# checked entries span every SURVEY §2 family: all 22 TPC-H shapes, all 9
# window queries, the dedup/similarity suites, and this round's new
# queries. Everything after slot 50 is still verified by
# tests/test_queries_vs_oracle.py against the same DuckDB oracle.
DRIVER_PRIORITY: list[str] = [
    # ---- Round-12 rotation (VERDICT r11 ask #6: advance the window's
    # median last-held round past r9).  In: the 13 stalest rows — all
    # rotated out in r11 after their r10 green (the join family,
    # cube/rollup/variance aggs, func_math/binary_hash, lateral_view,
    # subquery_scalar, setop_intersect) — plus first-time driver row
    # dedup_urls (round-12 URL canonicalize + URL-level dedup) and
    # re-proof slots for the three queries this round re-planned
    # (tpch_q03/q07/q12: orders de-broadcast -> shuffled hash join).
    # Out (all r11 driver-green, every family keeps >=1 window row,
    # all still DuckDB-oracled on every pytest run):
    # agg_kll_quantile_rollup, agg_theta_sketch_setops,
    # agg_percentiles, agg_skew_kurt, docs_lm_quality,
    # docs_temperature_mix, multimodal_frame_sample, sim_ivf_probe,
    # subquery_in, sql_recursive_cte, distinct_limit, setop_except_all,
    # join_full_outer, win_sliding_frame, win_first_last_nth,
    # events_streaming_session, geo_hull_union.
    "join_inner",  # r10-vintage joins family
    "join_left_outer",
    "join_right_outer",
    "join_semi",
    "join_anti",
    "agg_cube",  # r10-vintage grouping-sets family
    "agg_rollup",
    "agg_variance_stddev",
    "func_math",  # r10-vintage scalar families
    "func_binary_hash",
    "lateral_view",  # r10-vintage §2.8
    "subquery_scalar",
    "setop_intersect",
    "dedup_urls",  # NEW r12: URL canonicalize + URL-level dedup
    "tpch_q03",  # re-proof: r12 orders de-broadcast re-plan
    "tpch_q07",  # re-proof: r12 orders de-broadcast re-plan
    "tpch_q12",  # re-proof: r12 orders de-broadcast re-plan
    "multimodal_audio_features",  # multimodal family canary
    "try_cast_absorbs",  # §2.2 TRY representative
    "sort_limit_offset",  # §2.6 representative
    "tpch_q18",  # pinned perf row (r10 re-plan, r12 floor-final)
    "text_lang_id",  # text-analysis family canary
    "events_stateful_profile",
    "geo_wkt_polygon_ops",
    "geo_polygon_predicates",
    "dedup_semantic",
    "geo_relate_ops",
    "agg_khll_privacy",
    "docs_chunk_windows",
    "tpch_q17",  # re-proof: r12 threshold-pushdown rewrite (swapped for
    # r11-green floor-final tpch_q02; TPC-H keeps 7 window rows)
    "ml_kmeans",
    "sim_pq_adc",
    "sim_ivfadc",
    "tpch_q09",  # re-proof: r12 orders de-broadcast re-plan
    "tpch_q21",
    "win_topn_row_number",
    "dedup_keep_best",  # NEW r12: quality-aware canonical selection
    # (first driver row; swapped for r11-green dedup_exact, whose
    # keep-first rule is this operator's degenerate case)
    "dedup_minhash_lsh",
    "dedup_connected_components",
    "sim_topk_bruteforce",
    "sql_presto_aggregates",
    "geo_distance_join",
    "events_asof_join",
    "events_streaming_dedup",
    "func_i18n_color",
    "func_qdigest_quantile",
    "subquery_exists_correlated",
    "docs_pack_sequences",
    "docs_filter_funnel",
    "dedup_lines",
    # ---- the 50-entry cut lands here ----
    # (Rotation ledgers for rounds 5-11 live in git history of this
    # block; every name above and every rotated-out name stays
    # DuckDB-value-oracled on each pytest run via
    # tests/test_queries_vs_oracle.py.)
]


def load_all() -> None:
    """Import all query modules so their registrations run, then reorder
    the registries so the driver's 50-entry CORRECTNESS budget covers
    every SURVEY §2 family (see DRIVER_PRIORITY)."""
    from . import (  # noqa: F401
        aggregates,
        events,
        functions_sql,
        geo,
        ml,
        multimodal,
        pipeline,
        relational,
        similarity,
        sqltext,
        text,
        tpch,
        tpch_extra,
        windows,
    )

    ordered = [n for n in DRIVER_PRIORITY if n in QUERIES]
    ordered += [n for n in QUERIES if n not in set(ordered)]
    for registry_dict in (QUERIES, ORACLES):
        snapshot = dict(registry_dict)
        registry_dict.clear()
        registry_dict.update(
            {n: snapshot[n] for n in ordered if n in snapshot}
        )
