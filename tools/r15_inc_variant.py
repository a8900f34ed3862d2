"""Round-15 experiment: dedup_incremental near-branch restructure.

Hypothesis (guide §2.3 shuffle-fewer-bytes / §8 decide-with-small-rows):
the near-dup branch currently profiles SURVIVORS — which forces the
full (doc_id, text, fp) rows of the new snapshot through the exact-join
exchange (full text shuffled) before shingling.  Banding ALL new docs
instead is output-identical (a doc that is both exact and near is
labeled dropped_exact by the CASE precedence either way) and drops that
text-carrying exchange + the join + one md5-per-doc from the plan.

Build both forms for paired in-window A/B in the perf_iter REPL.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from presto_copy_spark.queries.text import (
    JACCARD_T,
    N_BANDS,
    N_HASHES,
    _minhash_profile,
    inc_snapshots,
    spark_band_exprs,
)
from presto_copy_spark.operators.text import hash60


def variant(spark: SparkSession, sf_dir: str) -> DataFrame:
    prior, newc = inc_snapshots(spark, sf_dir)
    pfp = prior.select(hash60(F.col("text")).alias("fp")).distinct()
    nf = newc.select("doc_id", "text", hash60(F.col("text")).alias("fp"))
    flagged = nf.join(
        pfp.hint("shuffle_hash").withColumnRenamed("fp", "pfp"),
        F.col("fp") == F.col("pfp"),
        "left",
    ).select("doc_id", F.col("pfp").isNotNull().alias("is_exact"))

    # near branch: band ALL new docs (no exact pre-filter, no text
    # through the join exchange)
    prof_new = _minhash_profile(spark, newc)
    prof_prior = _minhash_profile(spark, prior)
    band_exprs = spark_band_exprs(N_HASHES, N_BANDS)

    def bands(prof: DataFrame) -> DataFrame:
        return prof.select(
            "doc_id",
            "n",
            "sh_set",
            F.explode(
                F.array(*[
                    F.struct(F.lit(i).alias("band_idx"), e.alias("band_sig"))
                    for i, e in enumerate(band_exprs)
                ])
            ).alias("band"),
        ).select("doc_id", "n", "sh_set", "band.band_idx", "band.band_sig")

    bn, bp = bands(prof_new).alias("bn"), bands(prof_prior).alias("bp")
    inter = F.size(F.array_intersect(F.col("bn.sh_set"), F.col("bp.sh_set")))
    j = inter.cast("double") / (F.col("bn.n") + F.col("bp.n") - inter)
    near_ids = (
        bn.join(
            bp.hint("shuffle_hash"),
            (F.col("bn.band_idx") == F.col("bp.band_idx"))
            & (F.col("bn.band_sig") == F.col("bp.band_sig")),
        )
        .select(F.col("bn.doc_id").alias("doc_id"), j.alias("jaccard"))
        .filter(F.col("jaccard") >= JACCARD_T)
        .select("doc_id")
        .distinct()
    )
    labeled = flagged.join(
        near_ids.hint("shuffle_hash").withColumn("is_near", F.lit(True)),
        "doc_id",
        "left",
    ).select(
        "doc_id",
        F.when(F.col("is_exact"), "dropped_exact")
        .when(F.col("is_near"), "dropped_near")
        .otherwise("kept")
        .alias("outcome"),
    )
    return labeled.groupBy("outcome").agg(
        F.count(F.lit(1)).alias("n_docs"),
        F.sum("doc_id").alias("id_sum"),
    )
