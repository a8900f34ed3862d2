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

    At 100 TB: training is a map-side-combined hash agg over the
    exploded coordinates; prediction is one corpus pass joined to a
    KB-sized broadcast model with a WindowGroupLimit argmin — the same
    train/apply split the reference plans for learn_classifier inside
    an aggregation and classify as a scalar."""
    e = load_table(spark, sf_dir, "embeddings")
    e = e.repartition(e.sparkSession.sparkContext.defaultParallelism)
    model = learn_nearest_centroid(e, "label", "embedding")
    pred = classify_nearest_centroid(e, "vec_id", "embedding", model, "label")
    truth = e.select("vec_id", "label")
    return (
        truth.join(pred, "vec_id")
        .groupBy("label", "predicted")
        .agg(F.count(F.lit(1)).alias("n"))
    )
