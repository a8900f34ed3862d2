"""Physical-plan inspection utilities (SURVEY §4).

Presto exposes EXPLAIN/EXPLAIN ANALYZE through ExplainAnalyzeOperator
(presto-main/.../operator/ExplainAnalyzeOperator.java); on Spark the
analogue is ``df.explain`` + the executed-plan string.  This module
turns the interesting plan properties into assertable predicates so
tests can LOCK IN the plan shapes that make queries scale:

- filters/projections reach the parquet scan (PushedFilters/ReadSchema
  — Presto: PickTableLayout/ScanFilterAndProjectOperator)
- small dimensions broadcast (BroadcastHashJoin — Presto REPLICATED
  distribution, DetermineJoinDistributionType.java:59)
- aggregations split partial/final (HashAggregate x2 — Presto
  PushPartialAggregationThroughExchange)
- row_number top-k runs as WindowGroupLimit (Presto
  TopNRowNumberOperator.java:37)
- expressions stay inside WholeStageCodegen spans

A plan regression (e.g. a filter that stops reaching the scan) then
fails CI instead of silently costing 100x at 100 TB.
"""

from __future__ import annotations

import re

from pyspark.sql import DataFrame

__all__ = [
    "plan_string",
    "pushed_filters",
    "read_schema_columns",
    "has_broadcast_join",
    "has_sort_merge_join",
    "partial_final_agg_count",
    "has_window_group_limit",
    "wholestage_codegen_spans",
    "has_exchange",
    "join_build_sides",
    "broadcast_builds_containing",
]


def plan_string(df: DataFrame, mode: str = "formatted") -> str:
    """The physical plan as text (df.explain output, not printed)."""
    return df._sc._jvm.PythonSQLUtils.explainString(  # type: ignore[attr-defined]
        df._jdf.queryExecution(), mode
    )


def pushed_filters(df: DataFrame) -> list[str]:
    """Filter expressions the parquet scan will evaluate (pushdown)."""
    plan = plan_string(df)
    out: list[str] = []
    for m in re.finditer(r"PushedFilters: \[([^\]]*)\]", plan):
        frag = m.group(1).strip()
        if frag:
            out.extend(p.strip() for p in frag.split(","))
    return out


def read_schema_columns(df: DataFrame) -> list[str]:
    """Columns actually read from parquet (column pruning evidence)."""
    plan = plan_string(df)
    cols: list[str] = []
    for m in re.finditer(r"ReadSchema: struct<([^>]*)>", plan):
        cols.extend(c.split(":")[0].strip() for c in m.group(1).split(",") if c.strip())
    return sorted(set(cols))


def has_broadcast_join(df: DataFrame) -> bool:
    return "BroadcastHashJoin" in plan_string(df) or "BroadcastNestedLoopJoin" in plan_string(df)


def has_sort_merge_join(df: DataFrame) -> bool:
    return "SortMergeJoin" in plan_string(df)


def partial_final_agg_count(df: DataFrame) -> tuple[int, int]:
    """(# partial, # final) hash/sort/object aggregates in the plan."""
    plan = plan_string(df)
    partial = len(re.findall(r"partial_", plan))
    final = len(re.findall(r"(?:HashAggregate|SortAggregate|ObjectHashAggregate)", plan))
    return partial, final


def has_window_group_limit(df: DataFrame) -> bool:
    return "WindowGroupLimit" in plan_string(df)


def wholestage_codegen_spans(df: DataFrame) -> int:
    """Number of fused codegen subtrees in the FINAL adaptive plan.

    Under AQE the plan is only finalized by execution, so this runs the
    query (collect on the same Dataset) and inspects executedPlan —
    intended for tests at small SF, not production paths."""
    df.collect()
    final = df._jdf.queryExecution().executedPlan().toString()
    # codegen'd operators print as "*(N) OperatorName"; N is the span id
    return len(set(re.findall(r"\*\((\d+)\)", final)))


def has_exchange(df: DataFrame) -> bool:
    return "Exchange" in plan_string(df, "simple")


def _jvm_children(node):
    seq = node.children()
    return [seq.apply(i) for i in range(seq.size())]


def join_build_sides(df: DataFrame) -> list[dict]:
    """Every hash-ish join in the (pre-AQE) physical plan with the
    treeString of its BUILD-side subtree.

    Returns [{"node": "BroadcastHashJoin", "side": "BuildRight",
    "build_tree": "..."}]. Walks queryExecution().sparkPlan() via the
    JVM tree, so build-side identity is exact (which subtree feeds the
    hash relation), not a regex over the flattened explain output.

    This exists to make the round-12 fact-broadcast defect class
    mechanically assertable: a pruned-column FACT table can sneak under
    spark.sql.autoBroadcastJoinThreshold at mid scales and get single-
    thread broadcast-built (BASELINE.md §r12 floor decomposition). The
    shuffle_hash hints that forbid it are honored by the STATIC planner
    — so asserting on sparkPlan is exactly the surface where dropping a
    hint reverts the plan (at test SF every fact fits the threshold,
    making the regression maximally visible)."""
    out: list[dict] = []
    stack = [df._jdf.queryExecution().sparkPlan()]
    while stack:
        node = stack.pop()
        kids = _jvm_children(node)
        name = node.nodeName()
        if name in (
            "BroadcastHashJoin",
            "BroadcastNestedLoopJoin",
            "ShuffledHashJoin",
        ):
            side = node.buildSide().toString()
            build = kids[0] if side == "BuildLeft" else kids[1]
            out.append(
                {"node": name, "side": side, "build_tree": build.treeString()}
            )
        stack.extend(kids)
    return out


def broadcast_builds_containing(df: DataFrame, *needles: str) -> list[str]:
    """Node names of broadcast joins whose BUILD side scans/contains any
    of the given substrings (e.g. "orders." for the fact scan, or
    "HashAggregate" for an aggregate build). Empty list == the plan
    never broadcast-builds that relation — the 100 TB-safe shape."""
    hits: list[str] = []
    for j in join_build_sides(df):
        if j["node"].startswith("Broadcast") and any(
            n in j["build_tree"] for n in needles
        ):
            hits.append(f'{j["node"]}({j["side"]})')
    return hits
