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
# entries (dict insertion order). Curate that budget explicitly, rotating
# by staleness (oldest driver check first) while keeping the round's new
# operators, re-proof slots for anything re-planned, and at least one
# representative per SURVEY §2 family across consecutive windows.
# Everything after slot 50 is still verified by
# tests/test_queries_vs_oracle.py against the same DuckDB oracle on every
# pytest run.
DRIVER_PRIORITY: list[str] = [
    # ---- Round-13 rotation (VERDICT r12 ask #4: retire the r1/r2-
    # vintage tail).  In: ALL 39 rows whose last driver check was
    # round 1 or 2 — after this window no registry row's last driver
    # check predates r3 — plus re-proof slots for the three events
    # queries round 13 re-planned (events_json_props JSON fast path,
    # events_stateful_profile JVM twin, events_streaming_dedup one-
    # shuffle twin), sample_bernoulli (stalest seeded row, r5), and one
    # representative each for the families the r1/r2 tail doesn't
    # touch (joins, geo, spatial-join, multimodal, docs-pipeline,
    # unnest).  Out (all r12 driver-green): the entire r12 window —
    # §2.2 TRY, §2.6 sort/limit, subquery and sketch families rotate
    # back next round; the whole registry stays DuckDB-value-oracled
    # on every pytest run via tests/test_queries_vs_oracle.py.
    # -- r01 vintage --
    "agg_arbitrary",
    "agg_array_collect",
    "agg_bool_bit",
    "agg_checksum",
    "agg_distinct_mixed",
    "agg_geometric_mean",
    "agg_global",
    "events_hourly_top_type",
    "events_streaming_tumbling",
    "func_datetime",
    "func_presto_compat",
    "func_url",
    "setop_union_all",
    "setop_union_distinct",
    # -- r02 vintage --
    "agg_decimal_exact",
    "agg_entropy",
    "dedup_ngram_jaccard",
    "dedup_simhash",
    "sim_ann_lsh_neardup",
    "sim_norm_histogram",
    "sql_presto_datetime",
    "sql_presto_try_unnest",
    "sql_presto_view",
    "text_fingerprint",
    "text_top_bigrams",
    "tpch_q04",
    "tpch_q05",
    "tpch_q06",
    "tpch_q08",
    "tpch_q10",
    "tpch_q14",
    "tpch_q16",
    "tpch_q19",
    "win_lag_lead",
    "win_ntile",
    "win_range_frame",
    "win_ranks",
    "win_running_sum",
    "win_share_of_partition",
    # -- round-13 re-proof slots --
    "events_json_props",  # r13 re-plan: guarded JSON fast path
    "events_stateful_profile",  # r13 re-plan: JVM max_by twin
    "events_streaming_dedup",  # r13 re-plan: one-shuffle twin
    # -- staleness + family representatives --
    "sample_bernoulli",  # stalest seeded row (r5)
    "dedup_exact_substring",  # NEW r13: variable-offset ExactSubstr
    # (first driver row; takes the join-family slot — all five join
    # rows were r12-green two weeks fresher than anything else here)
    "geo_bing_tiles",  # geo functions family (r03)
    "geo_kdb_partition_join",  # spatial-join family (r9)
    "multimodal_frame_sample",  # multimodal family (r11)
    "docs_decontaminate",  # docs-pipeline family (r04)
    "unnest_with_ordinality",  # §2.8 unnest (r03)
    "dedup_incremental",  # NEW r13: cross-snapshot dedup (new crawl
    # vs frozen prior corpus) — first driver row
    # ---- the 50-entry cut lands here ----
    # (Rotation ledgers for rounds 5-12 live in git history of this
    # block.)
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
