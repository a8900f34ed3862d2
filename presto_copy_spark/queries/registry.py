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
    # ---- Round-4 rotation (VERDICT r3 item 2): spend the 50-slot
    # driver budget on (a) a per-family regression canary sample of
    # r2 ∪ r3-green rows — including every query touched by this
    # round's perf pass, which MUST re-prove green — and (b) the 26
    # registry entries that have never had a driver row (the r3
    # training-data-pipeline suite plus this round's new queries).
    # Everything rotated out stays DuckDB-oracle-verified on every
    # pytest run (tests/test_queries_vs_oracle.py).
    #
    # Canaries + perf-pass re-proofs (24):
    "tpch_q01",
    "tpch_q03",
    "tpch_q09",
    "tpch_q13",  # perf item r4 (shared-shuffle pass) — must stay green
    "tpch_q18",
    "tpch_q21",
    "tpch_q22",  # perf item r4 (fold scalar subqueries) — re-prove
    "win_topn_row_number",
    "dedup_exact",
    "dedup_minhash_lsh",
    "text_quality",
    "sim_topk_bruteforce",
    "sql_presto_aggregates",  # r2's one red row — keep regression-guarded
    "agg_histogram_map",  # r1's red row, regression-guard the fix class
    "agg_percentiles",
    "geo_wkt_polygon_ops",
    "geo_distance_join",
    "events_asof_join",
    "events_json_props",  # perf item r4
    "func_specialty",  # register_all hoisted out of body r4 — re-prove
    "func_i18n_color",  # perf item r4
    "join_full_outer",
    "subquery_exists_correlated",
    "multimodal_frame_sample",
    # Never driver-checked until now (23) — the r3 pipeline suite first:
    "docs_mix_sample",
    "docs_pack_sequences",
    "docs_decontaminate",
    "docs_vocab_coverage",
    "docs_filter_funnel",
    "pii_scrub",
    "text_repetition",
    "sim_pq_adc",
    "sim_quantized_cosine",
    "events_streaming_dedup",
    "ml_kmeans",
    "dedup_connected_components",
    "sql_recursive_cte",
    "case_when_buckets",
    "distinct_limit",
    "setop_except",
    "setop_intersect_all",
    "subquery_in",
    "subquery_scalar",
    "text_bpe_tokens",
    "text_lang_id",
    "text_token_stats",
    "try_cast_absorbs",
    # New this round (3):
    "sim_ivfadc",  # IVF coarse quantizer composed with PQ-ADC (r3 item 3)
    "func_qdigest_quantile",  # value_at_quantile SQL names (r3 item 6)
    "geo_polygon_predicates",  # ST_Intersects/ST_Within poly-poly (r3 item 7)
    # ---- the 50-entry cut lands here ----
    # Round-5 rotation plan: promote the r4-proven, never-driver-checked
    # queries — dedup_semantic (SemDeDup), docs_lm_quality (bigram LM
    # gate), multimodal_audio_features (WAV codec path),
    # docs_temperature_mix — plus regression canaries for whatever r5
    # touches; retire r2∪r3∪r4-green slots (keep one per family).
    # Rotated out this round (all r2 ∪ r3 driver-green, still pytest-
    # oracled): tpch_q20, win_groups_frame, agg_classification,
    # agg_noisy_zero_scale, agg_min_max_by, agg_corr_covar,
    # agg_grouping_sets, agg_top_k_frequent, agg_numeric_histogram,
    # agg_setdigest_jaccard, agg_khll_uniqueness, geo_point_functions,
    # geo_bing_tiles, events_session, events_tumbling,
    # events_streaming_session, func_string, func_array, func_map_json,
    # func_tier2_arrays_maps, ml_learn_classify, join_cross_theta,
    # setop_except_all, unnest_with_ordinality, lateral_view,
    # sort_limit_offset, sample_systematic.
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
