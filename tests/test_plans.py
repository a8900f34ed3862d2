"""Plan-shape regression tests: the properties that make queries scale
must be visible in the physical plan (SURVEY §4; plans/inspect.py).

These intentionally test PLANS, not results — a query can stay correct
while silently losing its pushdown/broadcast/partial-agg shape, which
at 100 TB is the difference between minutes and days.
"""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from presto_copy_spark.catalog import load_table
from presto_copy_spark.plans.inspect import (
    broadcast_builds_containing,
    has_broadcast_join,
    has_sort_merge_join,
    has_window_group_limit,
    join_build_sides,
    partial_final_agg_count,
    plan_string,
    pushed_filters,
    read_schema_columns,
    wholestage_codegen_spans,
)
from presto_copy_spark.queries import registry

registry.load_all()


def test_q06_filter_pushdown_and_pruning(spark, sf_dir):
    """tpch_q06: shipdate/discount/quantity predicates must reach the
    parquet scan, and only the 4 referenced columns may be read."""
    df = registry.QUERIES["tpch_q06"](spark, sf_dir)
    pf = " ".join(pushed_filters(df))
    assert "l_shipdate" in pf and "l_discount" in pf and "l_quantity" in pf
    cols = read_schema_columns(df)
    assert set(cols) <= {"l_shipdate", "l_discount", "l_quantity", "l_extendedprice"}


def test_projection_pruning_two_columns(spark, sf_dir):
    """A 2-column projection must scan exactly 2 columns."""
    l = load_table(spark, sf_dir, "lineitem").select("l_orderkey", "l_quantity")
    assert read_schema_columns(l) == ["l_orderkey", "l_quantity"]


def test_q03_broadcasts_dimension(spark, sf_dir):
    """tpch_q03: customer-side join should be broadcast, not shuffled."""
    assert has_broadcast_join(registry.QUERIES["tpch_q03"](spark, sf_dir))


# ---------------------------------------------------------------------------
# Round-12 re-plan pins (VERDICT r12 ask #2): the fact-broadcast defect
# class — a pruned-column FACT table or fact-sized aggregate sneaking
# under the auto-broadcast threshold and getting single-thread built —
# must stay mechanically impossible in the queries round 12 re-planned.
# At test SF every relation fits the 10 MB threshold, so if a
# shuffle_hash hint is dropped the static planner immediately reverts
# to the broadcast build and these go red.
# ---------------------------------------------------------------------------
@pytest.mark.parametrize(
    "qname", ["tpch_q03", "tpch_q07", "tpch_q09", "tpch_q12", "tpch_q18"]
)
def test_orders_never_broadcast_built(spark, sf_dir, qname):
    """q03/q07/q09/q12/q18: the orders join must be a shuffled hash
    join — NO broadcast join may build a hash relation containing the
    orders scan (orders grows with SF; its broadcast cannot exist at
    100 TB — tpch.py:102, :294, :365; tpch_extra.py q07/q09)."""
    df = registry.QUERIES[qname](spark, sf_dir)
    hits = broadcast_builds_containing(df, "orders.parquet")
    assert hits == [], f"{qname} broadcast-builds orders: {hits}"
    assert any(
        j["node"] == "ShuffledHashJoin" and "orders.parquet" not in j["build_tree"]
        for j in join_build_sides(df)
    ), f"{qname} lost its shuffled-hash orders join"


def test_q18_aggregate_build_not_broadcast(spark, sf_dir):
    """q18's HAVING aggregate (per-orderkey sums over ALL of lineitem)
    is fact-sized pre-filter; it must never be a broadcast build either
    (the r12 experiment measured the broadcast variant scale-inverted —
    BASELINE.md §q18)."""
    df = registry.QUERIES["tpch_q18"](spark, sf_dir)
    assert broadcast_builds_containing(df, "lineitem.parquet") == []


def test_q13_counts_aggregate_not_broadcast(spark, sf_dir):
    """q13: the per-custkey order-counts aggregate is |customer|-sized
    and scales with SF — it must build via shuffled hash join
    (tpch_extra.py:336), never broadcast."""
    df = registry.QUERIES["tpch_q13"](spark, sf_dir)
    hits = broadcast_builds_containing(df, "orders.parquet", "HashAggregate")
    assert hits == [], hits
    assert any(j["node"] == "ShuffledHashJoin" for j in join_build_sides(df))


def test_q17_threshold_pushdown_pinned(spark, sf_dir):
    """q17 (r12 threshold pushdown, tpch_extra.py:443): the per-partkey
    quantity aggregate must be computed over Brand#1-RESTRICTED
    lineitem — every broadcast build that touches lineitem must also
    contain the part-scan restriction inside it. If the pushdown
    reverts (aggregate all of lineitem, join the brand filter in
    afterwards — the r12 fact-broadcast class), the aggregate's build
    tree loses the part scan and this goes red. The restricted
    aggregate itself stays threshold-auto-governed deliberately: while
    small, broadcasting it avoids shuffling the fact side at all; once
    it outgrows the threshold Spark shuffles it (the sf10x A/B decade
    measured exactly that shape at −72%)."""
    df = registry.QUERIES["tpch_q17"](spark, sf_dir)
    for j in join_build_sides(df):
        if j["node"].startswith("Broadcast") and "lineitem.parquet" in j["build_tree"]:
            assert "part.parquet" in j["build_tree"], (
                "q17 broadcast-builds an UNRESTRICTED lineitem aggregate",
                j["build_tree"][:500],
            )
    key_broadcasts = broadcast_builds_containing(df, "part.parquet")
    assert key_broadcasts, "q17 lost its broadcast partkey restriction"


def test_dedup_incremental_prior_never_broadcast(spark, sf_dir):
    """dedup_incremental (round 13): both cross-snapshot joins probe a
    corpus-sized prior side (fingerprints, then bands) — neither may
    ever be a broadcast build (the prior corpus scales with the whole
    dataset; at 100 TB it's a persisted bucketed table). Same defect
    class as the orders pins above: at test SF everything fits the
    threshold, so a dropped hint reverts to broadcast and goes red
    here."""
    df = registry.QUERIES["dedup_incremental"](spark, sf_dir)
    hits = broadcast_builds_containing(df, "documents.parquet")
    assert hits == [], hits
    assert any(j["node"] == "ShuffledHashJoin" for j in join_build_sides(df))


def test_q05_all_dims_broadcast(spark, sf_dir):
    """Five-way star join: every dimension join is broadcast — zero
    shuffled joins (REPLICATED distribution for all dims)."""
    plan = plan_string(registry.QUERIES["tpch_q05"](spark, sf_dir), "simple")
    assert "BroadcastHashJoin" in plan
    assert "SortMergeJoin" not in plan or plan.count("SortMergeJoin") <= 1


def test_q01_partial_aggregation(spark, sf_dir):
    """tpch_q01 must plan map-side partial aggregation before the
    exchange (Presto PARTIAL/FINAL split)."""
    partial, total = partial_final_agg_count(registry.QUERIES["tpch_q01"](spark, sf_dir))
    assert partial >= 1 and total >= 2


def test_topn_row_number_uses_window_group_limit(spark, sf_dir):
    """row_number()<=k pattern must plan as WindowGroupLimit (per-task
    top-k before the shuffle — TopNRowNumberOperator analogue)."""
    assert has_window_group_limit(registry.QUERIES["win_topn_row_number"](spark, sf_dir))


def test_q06_wholestage_codegen(spark, sf_dir):
    """Scan+filter+project+partial-agg fuse into codegen spans."""
    assert wholestage_codegen_spans(registry.QUERIES["tpch_q06"](spark, sf_dir)) >= 1


def test_orderby_limit_plans_take_ordered(spark, sf_dir):
    """ORDER BY + LIMIT must plan TakeOrderedAndProject (TopNOperator),
    not a global sort."""
    o = load_table(spark, sf_dir, "orders")
    df = o.orderBy(F.col("o_totalprice").desc()).limit(5)
    assert "TakeOrderedAndProject" in plan_string(df, "simple")


def test_semi_join_planned_for_in_subquery(spark, sf_dir):
    """IN (subquery) lowers to a semi join (HashSemiJoinOperator)."""
    o = load_table(spark, sf_dir, "orders")
    o.createOrReplaceTempView("orders")
    load_table(spark, sf_dir, "customer").createOrReplaceTempView("customer")
    df = spark.sql(
        "SELECT o_orderkey FROM orders WHERE o_custkey IN "
        "(SELECT c_custkey FROM customer WHERE c_acctbal > 0)"
    )
    assert "LeftSemi" in plan_string(df, "simple")


def test_scan_respects_explicit_filter_on_partitioned_data(spark, sf_dir, tmp_path):
    """Partition pruning on hive-layout data: the pruned scan must list
    only matching partition directories."""
    src = load_table(spark, sf_dir, "nation")
    path = str(tmp_path / "nation_p")
    src.write.partitionBy("n_regionkey").mode("overwrite").parquet(path)
    df = spark.read.parquet(path).filter(F.col("n_regionkey") == 2)
    plan = plan_string(df)
    assert "PartitionFilters" in plan
    # no row-group filter needed: pruning happens at partition level
    assert df.count() == src.filter("n_regionkey = 2").count()


def test_index_join_dynamic_partition_pruning(spark, sf_dir, tmp_path):
    """IndexJoin analogue (reference sql/planner/plan/IndexJoinNode.java:
    probe-side lookups against an indexed source): Spark's distributed
    equivalent is dynamic partition pruning — the dimension filter is
    evaluated at runtime and only matching fact partitions are scanned.
    The plan must carry a dynamicpruning subquery on the fact scan."""
    fact = load_table(spark, sf_dir, "orders").withColumn(
        "o_year", F.year("o_orderdate")
    )
    path = str(tmp_path / "orders_by_year")
    fact.write.partitionBy("o_year").mode("overwrite").parquet(path)
    part_fact = spark.read.parquet(path)

    # The dim filter must be on a NON-join column: a literal filter on
    # the join key itself would constant-fold into static pruning and
    # never need the runtime subquery.
    dim = (
        load_table(spark, sf_dir, "orders")
        .groupBy(F.year("o_orderdate").alias("d_year"))
        .agg(F.max("o_totalprice").alias("mx"))
        .filter(F.col("mx") > 0)
    )
    joined = part_fact.join(dim, part_fact["o_year"] == dim["d_year"]).agg(
        F.count(F.lit(1)).alias("n")
    )
    plan = plan_string(joined)
    assert "dynamicpruning" in plan.lower(), plan[:2000]
    want = fact.count()  # every year survives mx > 0; values must agree
    assert joined.first()["n"] == want


def test_bucketed_join_is_shuffle_free(spark, sf_dir):
    """Co-located join via bucketing (Presto bucketed_by/bucket_count,
    HiveBucketing.java): both sides bucketed on the join key with equal
    bucket counts must SortMergeJoin with ZERO exchanges — the layout
    IS the distribution."""
    from presto_copy_spark.sources.connectors import create_bucketed_table

    o = load_table(spark, sf_dir, "orders")
    l = load_table(spark, sf_dir, "lineitem")
    create_bucketed_table(spark, "b_orders", o, ["o_orderkey"], 4, ["o_orderkey"])
    create_bucketed_table(spark, "b_lineitem", l, ["l_orderkey"], 4, ["l_orderkey"])
    prev = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    prev_smj = spark.conf.get("spark.sql.join.preferSortMergeJoin")
    try:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
        # the engine default prefers hash joins (session.py, Presto
        # posture); this test proves the sorted-bucket MERGE join
        # capability specifically, so prefer SMJ within its scope
        spark.conf.set("spark.sql.join.preferSortMergeJoin", "true")
        j = (
            spark.table("b_lineitem")
            .join(spark.table("b_orders"), F.col("l_orderkey") == F.col("o_orderkey"))
            .groupBy("o_orderpriority")
            .agg(F.count(F.lit(1)).alias("n"))
        )
        plan = plan_string(j, "simple")
        assert "SortMergeJoin" in plan
        assert "SelectedBucketsCount" in plan
        # in the simple tree, everything after the join node is its
        # subtree: the ONLY exchange allowed is the aggregation's above
        join_part = plan.split("SortMergeJoin", 1)[1]
        assert "Exchange" not in join_part, plan
        # values agree with the unbucketed join
        want = (
            l.join(o, F.col("l_orderkey") == F.col("o_orderkey"))
            .groupBy("o_orderpriority")
            .count()
            .collect()
        )
        got = {r["o_orderpriority"]: r["n"] for r in j.collect()}
        assert got == {r["o_orderpriority"]: r["count"] for r in want}
    finally:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prev)
        spark.conf.set("spark.sql.join.preferSortMergeJoin", prev_smj)
        spark.sql("DROP TABLE IF EXISTS b_orders")
        spark.sql("DROP TABLE IF EXISTS b_lineitem")


def test_khll_sample_avoids_global_window(spark, sf_dir):
    """agg_khll_uniqueness bottom-K sampler (VERDICT r2 item 4): the
    sample must plan as TakeOrderedAndProject (per-partition partial
    top-K), never a partition-less Window that funnels every distinct
    key into one task."""
    df = registry.QUERIES["agg_khll_uniqueness"](spark, sf_dir)
    plan = plan_string(df, "simple")
    assert "TakeOrderedAndProject" in plan
    assert "Window" not in plan


# ---------------------------------------------------------------------------
# Pipeline-operator plan shapes (queries/pipeline.py; the scale claims in
# those docstrings, proven against the optimized physical plan).
# ---------------------------------------------------------------------------
def test_mix_sample_has_single_exchange(spark, sf_dir):
    """docs_mix_sample's keep/drop is row-local: the ONLY exchange in
    the plan is the final per-source aggregation shuffle."""
    df = registry.QUERIES["docs_mix_sample"](spark, sf_dir)
    plan = plan_string(df, "simple")
    assert plan.count("Exchange hashpartitioning") == 1, plan


def test_decontaminate_broadcasts_eval_side(spark, sf_dir):
    """docs_decontaminate: eval shingles broadcast; the train side must
    NOT go through a sort-merge join."""
    df = registry.QUERIES["docs_decontaminate"](spark, sf_dir)
    assert has_broadcast_join(df)
    assert not has_sort_merge_join(df)


def test_vocab_coverage_uses_take_ordered_and_broadcast(spark, sf_dir):
    """docs_vocab_coverage: vocab selection is TakeOrderedAndProject
    (partial top-K per partition), never a global single-partition
    window; the OOV join is broadcast."""
    df = registry.QUERIES["docs_vocab_coverage"](spark, sf_dir)
    plan = plan_string(df, "simple")
    assert "TakeOrderedAndProject" in plan
    assert "Exchange SinglePartition" not in plan
    assert has_broadcast_join(df)


def test_pq_adc_codebook_joins_are_broadcast(spark, sf_dir):
    """sim_pq_adc: every codebook/LUT join is broadcast — the corpus
    side never shuffles for a join (only for its aggregations)."""
    df = registry.QUERIES["sim_pq_adc"](spark, sf_dir)
    assert has_broadcast_join(df)
    assert not has_sort_merge_join(df)


def test_pii_scrub_is_scan_project_only(spark, sf_dir):
    """pii_scrub must stay row-local: no HASH exchange anywhere (the
    regex scrub needs no co-partitioning).  The one allowed exchange is
    the round-robin parallelism floor qutil.spread_scan inserts for the
    single-row-group local fixture — a no-op once the table splits."""
    df = registry.QUERIES["pii_scrub"](spark, sf_dir)
    plan = plan_string(df, "simple")
    assert "hashpartitioning" not in plan, plan
    assert plan.count("Exchange") <= 1, plan
    assert "RoundRobinPartitioning" in plan or "Exchange" not in plan, plan


def test_compile_once_reexecutes_without_materializing(spark, sf_dir):
    """qutil.compile_once (round 10): the prepared-plan cache must (a)
    return the exact same rows as the raw plan, (b) collapse the
    re-optimized tree to a LogicalRDD leaf, and (c) re-EXECUTE the
    pipeline per action rather than materializing — nothing may be
    cached/persisted, so an accumulator inside the pipeline counts
    every row AGAIN on the second collect."""
    from pyspark.sql import functions as F

    from presto_copy_spark.catalog import load_table
    from presto_copy_spark.queries.qutil import compile_once

    raw = (
        load_table(spark, sf_dir, "supplier")
        .select("s_suppkey", (F.col("s_suppkey") % 7).alias("m"))
        .filter(F.col("s_suppkey") % 3 == 0)
    )
    compiled = compile_once(raw)
    # (a) row parity
    assert sorted(map(tuple, compiled.collect())) == sorted(
        map(tuple, raw.collect())
    )
    # (b) the per-action plan is a leaf — no re-optimization surface
    plan = compiled._jdf.queryExecution().optimizedPlan().toString()
    assert "LogicalRDD" in plan and "Project" not in plan, plan
    # (c) re-execution, not materialization: an in-pipeline accumulator
    # counts every row again on the second action
    acc = spark.sparkContext.accumulator(0)

    def bump(x):
        acc.add(1)
        return x

    bump_udf = F.udf(bump, "long")
    fresh = compile_once(
        load_table(spark, sf_dir, "supplier").select(
            bump_udf(F.col("s_suppkey")).alias("v")
        )
    )
    n = fresh.count()
    first = acc.value
    fresh.count()
    assert first >= n > 0, (first, n)
    assert acc.value == 2 * first, (
        "compile_once must re-execute the pipeline per action",
        acc.value,
        first,
    )
    # (d) KNOWN LIMIT (ADVICE r10): stages BEFORE an exchange are NOT
    # re-executed — pinning one RDD means the DAGScheduler reuses the
    # shuffle map outputs across actions, so an accumulator placed
    # before a repartition fires only on the first action.  This is the
    # documented shuffle-stage-reuse behavior (compile_once docstring +
    # bench.py "plan_cached" protocol note); if Spark's semantics ever
    # change, this assertion flags the protocol note as stale.
    acc2 = spark.sparkContext.accumulator(0)

    def bump2(x):
        acc2.add(1)
        return x

    bump2_udf = F.udf(bump2, "long")
    shuffled = compile_once(
        load_table(spark, sf_dir, "supplier")
        .select(bump2_udf(F.col("s_suppkey")).alias("v"))
        .repartition(4)
        .select((F.col("v") * 2).alias("w"))
    )
    n2 = shuffled.count()
    pre_shuffle_first = acc2.value
    shuffled.count()
    assert pre_shuffle_first >= n2 > 0, (pre_shuffle_first, n2)
    assert acc2.value == pre_shuffle_first, (
        "shuffle map outputs are expected to be REUSED across actions on"
        " a compile_once plan (documented protocol limit); a change here"
        " means the docstring and bench protocol notes need updating",
        acc2.value,
        pre_shuffle_first,
    )


def test_quality_classifier_scoring_is_map_only(spark, sf_dir):
    """docs_quality_classifier (round 14): with the trained weights
    frozen as plan literals, the corpus SCORING pass must be map-only —
    no hash exchange, no Python evaluator, margins folded by a JVM HOF
    (the 100 TB contract: gate a corpus with one scan).  The only
    allowed exchange below the final 8-row confusion aggregation is the
    spread_scan round-robin parallelism floor; the confusion groupBy
    itself hashes <= corpus-partitions x 8 partial rows."""
    from presto_copy_spark.queries.pipeline import (
        _QC_D,
        qc_featurize,
        qc_score,
    )
    from presto_copy_spark.queries.qutil import spread_scan
    from presto_copy_spark.catalog import load_table

    d = spread_scan(
        spark, load_table(spark, sf_dir, "documents").select("doc_id", "text")
    )
    scored = qc_score(qc_featurize(d), [1] * (_QC_D + 1))
    plan = plan_string(scored, "simple")
    assert "hashpartitioning" not in plan, plan
    assert "BatchEvalPython" not in plan and "ArrowEval" not in plan, plan
    # gradient pass: exactly one hash exchange, carrying only the
    # (bucket, partial-sum) rows of the D+1-key aggregation
    from pyspark.sql import functions as F
    from presto_copy_spark.queries.pipeline import _qc_margin, _qc_residual

    feats = qc_featurize(d).filter(F.col("is_train"))
    warr = F.array(*[F.lit(0).cast("long") for _ in range(_QC_D + 1)])
    staged = feats.select(
        "barr", _qc_residual(_qc_margin(warr), F.col("y")).alias("rq")
    )
    grad = (
        staged.select(F.explode("barr").alias("b"), "rq")
        .groupBy("b")
        .agg(F.sum("rq").alias("g"))
    )
    gplan = plan_string(grad, "simple")
    assert gplan.count("hashpartitioning") == 1, gplan
    assert "BatchEvalPython" not in gplan and "ArrowEval" not in gplan, gplan
