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
    # ---- Round-11 rotation (VERDICT r10 ask #5: advance the window's
    # median last-held round past r7).  In: the 16 rows rotated out in
    # r10 (the stalest r5-r9 one-time rows), two r2-stale win siblings,
    # and re-proof slots for everything this round touches (tpch_q18's
    # r10 re-plan, text_lang_id / events_streaming_session /
    # docs_pack_sequences perf passes, the geo SAT degenerate-axis
    # fix).  Out (all r10 driver-green, every family keeps at least one
    # driver row, all 158 still DuckDB-oracled on every pytest run):
    # join_inner, join_left_outer, join_right_outer, join_semi,
    # join_anti, agg_cube, agg_rollup, agg_variance_stddev, func_math,
    # func_binary_hash, multimodal_meta_stats, setop_intersect,
    # events_sliding, multimodal_features, agg_approx_distinct,
    # agg_hll_sketch_merge, agg_approx_percentile,
    # geo_kdb_partition_join, ml_learn_classify, lateral_view,
    # subquery_scalar.
    "agg_kll_quantile_rollup",  # r7-stale
    "agg_theta_sketch_setops",  # r7-stale
    "agg_percentiles",  # r3-stale
    "agg_skew_kurt",  # r3-stale
    "docs_lm_quality",  # r5-stale
    "docs_temperature_mix",  # r5-stale
    "multimodal_audio_features",  # r5-stale
    "multimodal_frame_sample",  # r6-stale
    "sim_ivf_probe",  # r5-stale
    "subquery_in",  # r5-stale
    "sql_recursive_cte",  # r5-stale
    "try_cast_absorbs",  # r8-stale
    "distinct_limit",  # r8-stale
    "sort_limit_offset",  # r9-stale
    "setop_except_all",  # r9-stale
    "join_full_outer",  # r8-stale; joins family canary
    "win_sliding_frame",  # r2-stale win sibling
    "win_first_last_nth",  # r2-stale win sibling
    "tpch_q18",  # re-proof: r10 shuffle-hash re-plan + r11 pin
    "text_lang_id",  # re-proof: r11 perf pass
    "events_streaming_session",  # re-proof: r11 perf pass
    "events_stateful_profile",  # r10-green; big bench row, keep hot
    "geo_wkt_polygon_ops",  # re-proof: SAT fix + plan-cache r11
    "geo_polygon_predicates",  # re-proof: SAT fix + plan-cache r11
    # ---- Round-5 rotation (VERDICT r4 item 1): (a) the 9 registry
    # entries that had NEVER held a driver row — completing driver
    # coverage of every oracle-able entry — plus the round-5 query
    # geo_hull_union; (b) a re-proof slot for EVERY query this round's
    # perf/structure pass touched; (c) one canary per family.
    # Everything rotated out stays DuckDB-oracle-verified on every
    # pytest run (tests/test_queries_vs_oracle.py).
    #
    # First-time driver rows (10):
    "dedup_semantic",  # SemDeDup — r4 pytest-oracled, never driver-run
    "geo_hull_union",  # r5: OGC hull/union/nearest/interp/GeoJSON
    # ---- Round-9 rotation (VERDICT r8 ask #3): the four queries that
    # gained real oracles in round 8 (tolerance oracles for the approx
    # family; closed-form BMP round-trip for multimodal_features) plus
    # the NEW geo_kdb_partition_join take their first driver rows.
    # Rotated out (all r8 driver-green, families keep sibling rows,
    # still DuckDB-oracled on every pytest run): sample_systematic,
    # values_inline, unnest_explode, geo_polygon_predicates,
    # func_specialty.
    # (r9 first-driver-row block — multimodal_features,
    # agg_approx_distinct, agg_hll_sketch_merge, agg_approx_percentile,
    # geo_kdb_partition_join — rotated out r11 after their r10 green.)
    "geo_relate_ops",  # re-proof: SAT degenerate-axis fix r11
    "agg_khll_privacy",  # NEW r6: KHLL privacy SQL names end-to-end
    "docs_chunk_windows",  # re-proof: r11 perf pass
    # Touched by round 5 — must re-prove green:
    "tpch_q02",  # one-shuffle agg+window fold
    "ml_kmeans",  # one-pass mean_update fold
    "sim_pq_adc",  # pq_code_sub_structs train fold + model checkpoint
    "sim_ivfadc",  # coarse+PQ train folds + model checkpoints
    # Family canaries:
    "tpch_q09",
    "tpch_q21",
    "win_topn_row_number",
    "dedup_exact",
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
    "dedup_lines",  # r11 new operator: first-time driver row
    # ---- the 50-entry cut lands here ----
    # Rotated out round 11 (late): pii_scrub (r10 driver-green; docs/
    # pipeline family keeps four sibling rows in-window) makes room for
    # dedup_lines' first driver row; still DuckDB-oracled every pytest.
    # Rotated out round 8: tpch_q01, tpch_q11, tpch_q15, tpch_q22
    # (driver-green r5-r7; TPC-H family keeps q02/q09/q21 canaries;
    # all four stay DuckDB-oracled on every pytest run).
    # Rotated out round 6: geo_wkt_polygon_ops, agg_histogram_map,
    # text_quality, docs_mix_sample (all driver-green in r5, families
    # still held by sibling driver rows + pytest oracles).
    # Rotated out round 5 (all r2 ∪ r3 ∪ r4 driver-green, still
    # pytest-oracled): tpch_q03, tpch_q13, tpch_q18, text_repetition,
    # text_bpe_tokens, text_lang_id, text_token_stats,
    # sim_quantized_cosine, events_json_props, docs_decontaminate,
    # docs_vocab_coverage, case_when_buckets, setop_except,
    # setop_intersect_all, subquery_scalar, plus the r4 rotation list.
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
