"""ML function family over the ``embeddings`` fixture (SURVEY §2.4 ML
row; reference presto-ml MLFunctions.java learn_classifier/classify).

Train-on-aggregate + predict-per-row, as a nearest-centroid classifier
(operators/ml.py — see its docstring for why the SVM's float solver is
replaced by a cross-engine-deterministic integer formulation).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..catalog import load_table
from ..operators.ml import classify_nearest_centroid, learn_nearest_centroid
from ..operators.similarity import CSCALE
from .registry import query


def _spread_corpus(df: DataFrame) -> DataFrame:
    """Parallelism floor for the (small) embeddings corpus, sized to the
    work: the unconditional repartition(defaultParallelism) this
    replaces re-shuffled 2,000 rows into 32 near-empty tasks in EVERY
    Lloyd/classify job — per-task overhead beat the HOF argmin compute
    by an order of magnitude (measured 0.565 s -> 0.452 s per kmeans
    run at 8 tasks).  Like qutil.spread_scan this is a structural no-op
    once the scan splits on its own (at corpus scale embeddings arrives
    as thousands of row groups), so the plan never COLLAPSES a parallel
    scan."""
    goal = min(8, df.sparkSession.sparkContext.defaultParallelism)
    if df.rdd.getNumPartitions() >= max(2, goal // 2):
        return df
    return df.repartition(goal)


@query(
    "ml_learn_classify",
    oracle=f"""
WITH coords AS (
  SELECT vec_id, label, i,
         CAST(floor(embedding[i]::DOUBLE * {CSCALE}) AS BIGINT) AS qv
  FROM embeddings, unnest(generate_series(1, len(embedding))) AS g(i)
),
centroids AS (
  SELECT label AS cand, i,
         CAST(floor(CAST(sum(qv) AS DOUBLE) / count(*)) AS BIGINT) AS cv
  FROM coords GROUP BY label, i
),
dists AS (
  SELECT c.vec_id, c.label, ct.cand,
         CAST(sum((c.qv - ct.cv) * (c.qv - ct.cv)) AS BIGINT) AS dist
  FROM coords c JOIN centroids ct ON c.i = ct.i
  GROUP BY 1, 2, 3
),
pred AS (
  SELECT vec_id, label, cand AS predicted
  FROM (SELECT d.*, row_number() OVER (PARTITION BY vec_id ORDER BY dist, cand) AS rn
        FROM dists d) t
  WHERE rn = 1
)
SELECT label, predicted, count(*) AS n
FROM pred GROUP BY label, predicted
""",
)
def ml_learn_classify(spark: SparkSession, sf_dir: str) -> DataFrame:
    """learn_classifier + classify parity: train per-label centroids in
    one aggregation pass, classify the full corpus against the broadcast
    model, return the confusion matrix (label, predicted, n).

    At 100 TB (round-6 collapse, 7 shuffle stages -> 4, three of them
    KB-sized): training is ONE map-side-combined hash agg with `dim`
    sum buffers per label (the ml_kmeans round-5 update shape — no
    coordinate explode into the shuffle); the centroid table packs into
    a one-row broadcast; and classification + the confusion matrix are
    a single corpus pass — per-row HOF argmin against the packed model
    (label rides the same row, so the former truth-side shuffle join
    disappears entirely), then one K*K-row output agg."""
    from ..operators.similarity import EMB_DIM, hof_argmin, quantize_arr

    corpus = _spread_corpus(load_table(spark, sf_dir, "embeddings")).select(
        "label", quantize_arr(F.col("embedding")).alias("qarr")
    )
    dim = EMB_DIM
    sums = corpus.groupBy("label").agg(
        F.count(F.lit(1)).alias("cnt"),
        *[F.sum(F.element_at("qarr", i + 1)).alias(f"s{i}") for i in range(dim)],
    )
    cent = sums.select(
        "label",
        F.array(
            *[
                F.floor(F.col(f"s{i}").cast("double") / F.col("cnt")).cast(
                    "long"
                )
                for i in range(dim)
            ]
        ).alias("cv_arr"),
    )
    packed = cent.agg(
        F.array_sort(
            F.collect_list(
                F.struct(F.col("label").alias("k"), F.col("cv_arr"))
            )
        ).alias("cents")
        # one-row MODEL table: lineage-truncated so the classify branch
        # doesn't re-run the training agg (the sim_* model pattern;
        # bench.py's accounting note covers the protocol implication)
    ).localCheckpoint(eager=False)
    pred = corpus.crossJoin(F.broadcast(packed)).select(
        "label",
        hof_argmin(F.col("qarr"), F.col("cents")).alias("predicted"),
    )
    return pred.groupBy("label", "predicted").agg(
        F.count(F.lit(1)).alias("n")
    )


_K = 4  # clusters
_ITERS = 2  # unrolled Lloyd iterations


def _sql_kmeans_oracle() -> str:
    """Unrolled deterministic Lloyd's iterations as CTEs (integer
    arithmetic identical to the Spark plan)."""
    coords = f"""
coords AS (
  SELECT vec_id, i,
         CAST(floor(embedding[i]::DOUBLE * {CSCALE}) AS BIGINT) AS qv
  FROM embeddings, unnest(generate_series(1, len(embedding))) AS g(i)
),
cent0 AS (
  SELECT vec_id AS cluster, i, qv AS cv FROM coords WHERE vec_id < {_K}
)"""
    steps = []
    for it in range(_ITERS):
        steps.append(f"""
dist{it} AS (
  SELECT c.vec_id, ct.cluster,
         CAST(sum((c.qv - ct.cv) * (c.qv - ct.cv)) AS BIGINT) AS dist
  FROM coords c JOIN cent{it} ct ON c.i = ct.i
  GROUP BY 1, 2
),
assign{it} AS (
  SELECT vec_id, cluster
  FROM (SELECT d.*, row_number() OVER (PARTITION BY vec_id
                                       ORDER BY dist, cluster) AS rn
        FROM dist{it} d) t
  WHERE rn = 1
),
cent{it + 1} AS (
  SELECT a.cluster, c.i,
         CAST(floor(CAST(sum(c.qv) AS DOUBLE) / count(*)) AS BIGINT) AS cv
  FROM coords c JOIN assign{it} a USING (vec_id)
  GROUP BY 1, 2
)""")
    last = _ITERS - 1
    return (
        "WITH " + coords + "," + ",".join(steps) + f"""
SELECT a.cluster,
       count(DISTINCT a.vec_id) AS n_members,
       (SELECT CAST(sum(abs(cv)) AS BIGINT) FROM cent{_ITERS} c
        WHERE c.cluster = a.cluster) AS centroid_l1
FROM assign{last} a
GROUP BY a.cluster
"""
    )


@query("ml_kmeans", oracle=_sql_kmeans_oracle())
def ml_kmeans(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Deterministic k-means (Lloyd's, {K=4, 2 iterations} unrolled):
    the ITERATIVE-algorithm shape on Spark — assignment is one corpus
    pass joined to a KB-sized broadcast centroid table with a min_by
    hash-agg argmin, update is a map-side-combined hash agg;
    each iteration adds one shuffle, centroids never leave the
    executors.  All arithmetic is quantized-integer (same CSCALE as the
    IVF operator) so the DuckDB oracle — the identical iterations
    unrolled as CTEs — matches bit-for-bit, including the (dist,
    cluster) tie-break.  Returns per-cluster size + centroid L1 norm
    (scalar columns only, per the driver canonicalizer contract).

    At 100 TB: the per-iteration shuffle is on vec_id (already the
    scan order) and the broadcast is k x dim x 8 bytes; this is the
    standard distributed Lloyd's layout (MLlib's KMeans does the same
    per-iteration broadcast-join + tree-aggregate)."""
    from ..operators.similarity import EMB_DIM, hof_argmin, quantize_arr

    corpus = _spread_corpus(load_table(spark, sf_dir, "embeddings")).select(
        "vec_id", quantize_arr(F.col("embedding")).alias("qarr")
    )
    # round-4 rewrite: vector-at-a-time assignment against a packed
    # one-row broadcast centroid table (operators/similarity) — the
    # corpus never explodes and never shuffles to learn its cluster.
    # Round-5 rewrite of the UPDATE step: instead of posexplode to
    # (cluster, i, qv) rows (64x row inflation into the shuffle) + a
    # re-pack groupBy, the mean update is ONE hash agg with `dim` sum
    # buffers — groupBy(cluster).agg(count, sum(qarr[1]), ...,
    # sum(qarr[dim])) — map-side combined, shuffling exactly K rows of
    # dim+1 longs per partition.  The per-coordinate arithmetic
    # (BIGINT sum, floor(sum/count)) is unchanged, so the unrolled
    # DuckDB CTE oracle stays bit-exact.  This is literally MLlib's
    # layout: broadcast centroids, map-side assignment, tree-aggregated
    # per-dimension sums.
    dim = EMB_DIM
    packed = corpus.filter(F.col("vec_id") < _K).agg(
        F.array_sort(
            F.collect_list(
                F.struct(F.col("vec_id").alias("k"), F.col("qarr").alias("cv_arr"))
            )
        ).alias("cents")
    )
    assign = cent_arr = None
    for _ in range(_ITERS):
        assign = corpus.crossJoin(F.broadcast(packed)).select(
            "vec_id",
            "qarr",
            hof_argmin(F.col("qarr"), F.col("cents")).alias("cluster"),
        )
        sums = assign.groupBy("cluster").agg(
            F.count(F.lit(1)).alias("n"),
            *[
                F.sum(F.element_at("qarr", i + 1)).alias(f"s{i}")
                for i in range(dim)
            ],
        )
        cent_arr = sums.select(
            "cluster",
            "n",
            F.array(
                *[
                    F.floor(F.col(f"s{i}").cast("double") / F.col("n")).cast(
                        "long"
                    )
                    for i in range(dim)
                ]
            ).alias("cv_arr"),
        )
        packed = cent_arr.agg(
            F.array_sort(
                F.collect_list(
                    F.struct(F.col("cluster").alias("k"), F.col("cv_arr"))
                )
            ).alias("cents")
        )
    # The final update agg already carries the member count (`n`) and
    # the centroid array: sizes + L1 fall out of the SAME shuffle — no
    # second groupBy over the assignment, so the argmin corpus pass is
    # evaluated exactly once per iteration.
    return cent_arr.select(
        "cluster",
        F.col("n").alias("n_members"),
        F.aggregate(
            F.col("cv_arr"),
            F.lit(0).cast("long"),
            lambda acc, v: acc + F.abs(v),
        ).alias("centroid_l1"),
    )
