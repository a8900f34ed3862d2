"""ML function family (reference presto-ml: MLFunctions.java
learn_classifier / classify, LearnClassifierAggregation.java).

The reference trains a libsvm SVM inside an aggregation and applies it
with a scalar.  That shape — TRAIN as one aggregation pass, PREDICT as
a per-row scalar against the (broadcast) model — is re-expressed here
as a nearest-centroid classifier over quantized-integer coordinates:

- ``learn_nearest_centroid``: one posexplode + hash aggregation computes
  per-(label, dimension) integer centroids — map-side partial agg, no
  per-group state beyond d longs, any corpus size.
- ``classify_nearest_centroid``: centroids broadcast, distances are
  integer sums per (row, candidate label), argmin per row via
  WindowGroupLimit — a single corpus pass.

All coordinates go through floor(x * CSCALE) longs (the
operators/similarity.py determinism contract), so training and
prediction are bit-identical on Spark and the DuckDB oracle — an SVM's
floating-point dual solver could never be cross-engine deterministic.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F

from .similarity import CSCALE

__all__ = ["learn_nearest_centroid", "classify_nearest_centroid"]


def _coords(df: DataFrame, features: str) -> DataFrame:
    """(row cols..., i, qv): 1-based dimension index + quantized value."""
    return df.select(
        "*", F.posexplode(features).alias("pos", "val")
    ).select(
        *df.columns,
        (F.col("pos") + 1).alias("i"),
        F.floor(F.col("val").cast("double") * CSCALE).cast("long").alias("qv"),
    ).drop(features)


def learn_nearest_centroid(df: DataFrame, label: str, features: str) -> DataFrame:
    """learn_classifier(label, features) -> (label, i, cv) centroid table."""
    return (
        _coords(df.select(label, features), features)
        .groupBy(label, "i")
        .agg(
            F.floor(F.sum("qv").cast("double") / F.count(F.lit(1)))
            .cast("long")
            .alias("cv")
        )
    )


def classify_nearest_centroid(
    df: DataFrame, id_col: str, features: str, centroids: DataFrame, label: str
) -> DataFrame:
    """classify(features, model) -> (id_col, predicted).

    Distances are exact integer sums; ties break on label order so the
    prediction is total-order deterministic.
    """
    cent = centroids.select(F.col(label).alias("_cand"), "i", "cv")
    dists = (
        _coords(df.select(id_col, features), features)
        .join(F.broadcast(cent), "i")
        .groupBy(id_col, "_cand")
        .agg(F.sum((F.col("qv") - F.col("cv")) * (F.col("qv") - F.col("cv"))).alias("dist"))
    )
    # argmin via min_by over the (dist, cand) struct, not a row_number
    # window: lexicographic struct order preserves the tie-break, and the
    # hash aggregation's map-side partials collapse the K candidate rows
    # per id BEFORE the exchange (the window form ships all K and sorts
    # each partition).  Measured parity at sf0.1 (noise-dominated); the
    # partial-agg form is the one that wins at scale.
    return dists.groupBy(id_col).agg(
        F.min_by("_cand", F.struct("dist", "_cand")).alias("predicted")
    )
