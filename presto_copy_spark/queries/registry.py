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
    # TPC-H (22) — the canonical relational coverage set
    *[f"tpch_q{i:02d}" for i in range(1, 23)],
    # Window functions (9)
    "win_topn_row_number",
    "win_ranks",
    "win_lag_lead",
    "win_running_sum",
    "win_sliding_frame",
    "win_range_frame",
    "win_first_last_nth",
    "win_ntile",
    "win_share_of_partition",
    "win_groups_frame",
    # Dedup (4) + text (3 representatives)
    "dedup_exact",
    "dedup_ngram_jaccard",
    "dedup_minhash_lsh",
    "dedup_simhash",
    "text_quality",
    "text_fingerprint",
    "text_top_bigrams",
    # Similarity / ANN (4)
    "sim_topk_bruteforce",
    "sim_ann_lsh_neardup",
    "sim_ivf_probe",
    "sim_norm_histogram",
    # Round-2 fixes / additions that need a driver row (slots 44-50)
    "agg_histogram_map",
    "agg_entropy",
    "agg_decimal_exact",
    "sql_presto_datetime",
    "sql_presto_try_unnest",
    "sql_presto_aggregates",
    "sql_presto_view",
    # ---- the 50-entry cut lands here ----
    # Below: pytest-oracle-proven this round; rotate above the cut next
    # round once the entries above have green driver rows.  Round-3
    # rotation candidates (new-in-r2, oracle-proven, no driver row yet):
    # ml_learn_classify, events_asof_join, agg_setdigest_jaccard,
    # agg_khll_uniqueness, func_i18n_color, func_tier2_arrays_maps,
    # events_streaming_session, agg_percentiles (weighted form).
    "agg_classification",
    "agg_noisy_zero_scale",
    "geo_point_functions",
    "geo_bing_tiles",
    "geo_distance_join",
    "func_specialty",
    "agg_kll_quantile_rollup",  # rows-only (no oracle): weak row either way
    "events_session",
    "multimodal_frame_sample",
    "join_full_outer",
    "setop_except_all",
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
