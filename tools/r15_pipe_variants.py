"""Round-15 experiments: single-scan restructures of docs_filter_funnel
and docs_vocab_coverage (guide §2.4 remove-shuffles / §2.3 aggregate-
before-shuffle).

funnel_variant: explode_outer carries the row-local gates through the
bigram aggregation, so the corpus is scanned+repartitioned ONCE and the
rep<->per_doc join disappears.

vocab_variant: aggregate occurrences to (source, token, cnt) ONCE; the
vocabulary and the per-source OOV report both derive from that compact
aggregate, so the second full-corpus explode+join happens on the
aggregate, not the occurrence stream.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from presto_copy_spark.queries.pipeline import (
    FUNNEL_MIN_DIVERSITY,
    FUNNEL_MIN_TOKENS,
    REP_THRESHOLD,
    VOCAB_SIZE,
    _docs,
)
from presto_copy_spark.operators.text import tokens


def funnel_variant(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = _docs(spark, sf_dir)
    d = d.repartition(d.sparkSession.sparkContext.defaultParallelism)
    tok = tokens(F.col("text"))
    n = F.size(tok)
    bigrams = F.zip_with(
        F.slice(tok, 1, F.greatest(n - 1, F.lit(0))),
        F.slice(tok, 2, F.greatest(n - 1, F.lit(0))),
        lambda a, b: F.concat_ws(" ", a, b),
    )
    occ = d.select(
        "doc_id",
        (n >= FUNNEL_MIN_TOKENS).alias("pass_len"),
        (
            F.size(F.array_distinct(tok)).cast("double") / n
            >= FUNNEL_MIN_DIVERSITY
        ).alias("pass_div"),
        F.explode_outer(bigrams).alias("bigram"),
    )
    per_doc = (
        occ.groupBy("doc_id", "bigram")
        .agg(
            F.count(F.lit(1)).alias("bn"),
            F.first("pass_len").alias("pass_len"),
            F.first("pass_div").alias("pass_div"),
        )
        .groupBy("doc_id")
        .agg(
            (
                F.max(F.when(F.col("bigram").isNotNull(), F.col("bn"))).cast(
                    "double"
                )
                / F.sum(F.when(F.col("bigram").isNotNull(), F.col("bn")))
            ).alias("top_frac"),
            F.first("pass_len").alias("pass_len"),
            F.first("pass_div").alias("pass_div"),
        )
        .withColumn(
            "pass_rep",
            F.coalesce(F.col("top_frac") <= REP_THRESHOLD, F.lit(False)),
        )
    )
    c = lambda cond: F.coalesce(F.sum(F.when(cond, 1)), F.lit(0)).cast("long")  # noqa: E731
    return per_doc.agg(
        F.count(F.lit(1)).alias("n_total"),
        c(F.col("pass_len")).alias("n_len"),
        c(F.col("pass_len") & F.col("pass_div")).alias("n_quality"),
        c(F.col("pass_len") & F.col("pass_div") & F.col("pass_rep")).alias(
            "n_clean"
        ),
    )


def vocab_variant(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = _docs(spark, sf_dir)
    par = spark.sparkContext.defaultParallelism
    occ = d.repartition(par).select(
        "source", F.explode(tokens(F.col("text"))).alias("token")
    )
    stc = occ.groupBy("source", "token").agg(F.count(F.lit(1)).alias("cnt"))
    vocab = (
        stc.groupBy("token")
        .agg(F.sum("cnt").alias("n"))
        .orderBy(F.col("n").desc(), "token")
        .limit(VOCAB_SIZE)
        .select("token", F.lit(True).alias("in_vocab"))
    )
    oov = F.sum(F.when(F.col("in_vocab").isNull(), F.col("cnt")))
    return (
        stc.join(F.broadcast(vocab), "token", "left")
        .groupBy("source")
        .agg(
            F.sum("cnt").cast("long").alias("total_tokens"),
            F.coalesce(oov, F.lit(0)).cast("long").alias("oov_tokens"),
            F.round(
                F.coalesce(oov, F.lit(0)).cast("double") / F.sum("cnt"), 6
            ).alias("oov_rate"),
        )
    )
