"""Training-data pipeline operators over the ``documents`` fixture:
corpus mixing (stratified hash sampling), sequence packing, eval-set
decontamination, repetition filtering (Gopher-style), PII redaction.

These extend the dedup/similarity/text suite (queries/text.py) with the
remaining stages a 100 TB LLM-data pipeline runs between "raw crawl"
and "training batches".  No Presto counterpart — this is the
§"beyond the reference" surface (SURVEY §2 addendum); the designs are
the published ones (Gopher/MassiveText data quality rules, Rae et al.
2021 §A1; GPT-style concat-then-chunk sequence packing; n-gram-overlap
decontamination as in GPT-3 appendix C / PaLM §7).

Scale design (100 TB corpus):
- docs_mix_sample: the keep/drop decision is a row-local hash
  comparison — zero shuffle before the (tiny) per-source aggregate.
  This is THE sampling primitive that survives any scale: no window,
  no count-then-sample second pass, deterministic across reruns and
  engine (md5-based hash60, identical in the DuckDB oracle).
- docs_pack_sequences: packing needs a running position, which is a
  window cumsum — the partition key (source, shard) bounds each window
  to one writer's worth of docs, so partitions stay task-sized at any
  corpus size (increase SHARDS with corpus growth; each shard is an
  independent deterministic packer, matching multi-writer reality).
- docs_decontaminate: the eval-side shingle set is small by
  construction (eval benchmarks are thousands of docs, not billions),
  so it broadcasts; the train side stays a single scan + broadcast
  semi-join — no shuffle of the 100 TB side at all.
- text_repetition: two hash aggregations keyed on doc_id — map-side
  partial aggregation collapses each doc's bigrams before exchange.
- pii_scrub: pure row-local projection (regexp_count/regexp_replace
  compile once per task); zero shuffle.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from ..catalog import load_table
from ..operators.text import (
    bpe_token_count,
    hash60,
    shingles,
    sql_bpe_token_count,
    sql_hash60,
    sql_shingles_cte,
    sql_tokens,
    tokens,
)
from .qutil import spread_scan
from .qutil import compile_once_scalar
from .registry import BENCH_ORACLE_BUILDERS, query


def _docs(spark: SparkSession, sf_dir: str) -> DataFrame:
    # NOT spread here (see text.py._docs): the loader-level floor lost
    # more on cheap queries than it won on heavy ones in full-bench
    # conditions; pii_scrub applies spread_scan itself.
    return load_table(spark, sf_dir, "documents")


# ---------------------------------------------------------------------------
# Corpus mixing: deterministic stratified hash sampling.
# Per-source keep-rate derived from the source id (src7 -> (7%4+1)*25% =
# 100%) stands in for the mixing-weights table a real pipeline joins in.
@query(
    "docs_mix_sample",
    oracle=f"""
WITH scored AS (
  SELECT source, doc_id,
         (CAST(substr(source, 4) AS INT) % 4 + 1) * 250 AS keep_pm,
         {sql_hash60('CAST(doc_id AS VARCHAR)')} % 1000 AS slot
  FROM documents
)
SELECT source,
       count(*) AS n_total,
       CAST(coalesce(sum(CASE WHEN slot < keep_pm THEN 1 END), 0)
            AS BIGINT) AS n_kept,
       round(coalesce(sum(CASE WHEN slot < keep_pm THEN 1 END), 0)::DOUBLE
             / count(*), 6) AS kept_frac,
       CAST(coalesce(sum(CASE WHEN slot < keep_pm THEN doc_id END), 0)
            AS BIGINT) AS kept_id_sum
FROM scored GROUP BY source
""",
)
def docs_mix_sample(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Deterministic stratified sampling for corpus mixing: keep a
    source-dependent fraction of documents by comparing a row-local
    md5 hash slot against the source's keep-rate (per-mille).

    The keep decision needs no count, no window, no second pass — the
    property that makes it THE mixing primitive at 100 TB (rerunnable,
    resumable, engine-portable).  Output aggregates per source so the
    driver hash stays scalar."""
    d = _docs(spark, sf_dir)
    keep_pm = (
        F.substring(F.col("source"), 4, 10).cast("int") % 4 + 1
    ) * 250
    slot = hash60(F.col("doc_id").cast("string")) % 1000
    kept = F.col("slot") < F.col("keep_pm")
    return (
        d.select("source", "doc_id", keep_pm.alias("keep_pm"), slot.alias("slot"))
        .groupBy("source")
        .agg(
            F.count(F.lit(1)).alias("n_total"),
            F.coalesce(F.sum(F.when(kept, 1)), F.lit(0)).alias("n_kept"),
            F.round(
                F.coalesce(F.sum(F.when(kept, 1)), F.lit(0)).cast("double")
                / F.count(F.lit(1)),
                6,
            ).alias("kept_frac"),
            F.coalesce(F.sum(F.when(kept, F.col("doc_id"))), F.lit(0))
            .cast("long")
            .alias("kept_id_sum"),
        )
    )


# ---------------------------------------------------------------------------
# Sequence packing: concat-then-chunk at a fixed token budget.  The
# shard is DERIVED from the doc id (round 9 — the fixture-pinned
# PACK_SHARDS=2 was the same anti-pattern as SemDeDup's old fixed K:
# window-partition count frozen while the corpus grows).  shard =
# floor(doc_id / PACK_DOCS_PER_SHARD) gives every writer a CONTIGUOUS
# ~2500-doc range — partition size is bounded by construction at ANY
# corpus scale, needs no corpus count (zero extra jobs, unlike a
# derived-N 1-row agg), and matches how real multi-writer packers
# split work (contiguous id ranges per writer).
PACK_BUDGET = 256
PACK_DOCS_PER_SHARD = 2500


@query(
    "docs_pack_sequences",
    oracle=f"""
WITH t AS (
  SELECT source, doc_id,
         CAST(floor(doc_id / {PACK_DOCS_PER_SHARD}.0) AS BIGINT) AS shard,
         {sql_bpe_token_count('text')} AS n_tok
  FROM documents
),
packed AS (
  SELECT source, shard, doc_id, n_tok,
         sum(n_tok) OVER (PARTITION BY source, shard ORDER BY doc_id
                          ROWS UNBOUNDED PRECEDING) AS cum
  FROM t
)
SELECT source, shard,
       CAST(floor((cum - n_tok) / {PACK_BUDGET}.0) AS BIGINT) AS seq_id,
       count(*) AS n_docs,
       CAST(sum(n_tok) AS BIGINT) AS seq_tokens,
       min(doc_id) AS first_doc
FROM packed GROUP BY 1, 2, 3
""",
)
def docs_pack_sequences(spark: SparkSession, sf_dir: str) -> DataFrame:
    """GPT-style sequence packing: documents are concatenated in
    deterministic (doc_id) order within each (source, shard) writer and
    chunked at PACK_BUDGET BPE tokens; a document belongs to the chunk
    where it STARTS (concat-then-chunk semantics — chunks may straddle
    document boundaries, exactly like the real pretraining layout).

    The running position is a window cumsum partitioned by
    (source, shard): each partition is one writer's worth of documents.
    The shard is floor(doc_id / PACK_DOCS_PER_SHARD) — a contiguous
    ~2500-doc range per writer, so window-partition size is bounded by
    CONSTRUCTION at any corpus scale (the round-9 fix for the
    fixture-pinned 2-shard constant), row-locally and with no corpus
    count."""
    d = _docs(spark, sf_dir)
    n_tok = bpe_token_count(F.col("text"))
    t = d.select(
        "source",
        "doc_id",
        F.floor(F.col("doc_id") / float(PACK_DOCS_PER_SHARD)).alias("shard"),
        n_tok.alias("n_tok"),
    )
    w = (
        Window.partitionBy("source", "shard")
        .orderBy("doc_id")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    packed = t.withColumn("cum", F.sum("n_tok").over(w))
    seq_id = F.floor((F.col("cum") - F.col("n_tok")) / float(PACK_BUDGET))
    return (
        packed.select("source", "shard", seq_id.alias("seq_id"), "n_tok", "doc_id")
        .groupBy("source", "shard", "seq_id")
        .agg(
            F.count(F.lit(1)).alias("n_docs"),
            F.sum("n_tok").cast("long").alias("seq_tokens"),
            F.min("doc_id").alias("first_doc"),
        )
    )


# ---------------------------------------------------------------------------
# Eval-set decontamination: n-gram overlap against a held-out set.
DECON_K = 5  # shingle width: long enough that chance overlap is evidence
DECON_MOD = 97  # every 97th doc plays the "eval benchmark" role


@query(
    "docs_decontaminate",
    oracle=f"""
WITH sh AS ({sql_shingles_cte(k=DECON_K)}),
ev AS (SELECT DISTINCT shingle FROM sh WHERE doc_id % {DECON_MOD} = 0)
SELECT s.doc_id, count(*) AS n_hits
FROM sh s JOIN ev USING (shingle)
WHERE s.doc_id % {DECON_MOD} <> 0
GROUP BY 1
""",
)
def docs_decontaminate(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Training-set decontamination (GPT-3 appendix C style): flag
    training documents sharing any DECON_K-token shingle with the eval
    set, with the per-doc overlapping-shingle count as evidence.

    The eval shingle set is broadcast — eval benchmarks are tiny
    relative to the corpus — so the 100 TB train side is ONE scan into
    a broadcast hash join; no shuffle of the big side exists in the
    plan.  At sf0.01 exactly one planted near-dup crosses the split,
    so the output is small but non-empty by construction."""
    d = _docs(spark, sf_dir)
    par = spark.sparkContext.defaultParallelism
    sh = d.repartition(par).select(
        "doc_id",
        F.explode(shingles(tokens(F.col("text")), k=DECON_K)).alias("shingle"),
    )
    ev = (
        sh.filter(F.col("doc_id") % DECON_MOD == 0)
        .select("shingle")
        .distinct()
    )
    return (
        sh.filter(F.col("doc_id") % DECON_MOD != 0)
        .join(F.broadcast(ev), "shingle")
        .groupBy("doc_id")
        .agg(F.count(F.lit(1)).alias("n_hits"))
    )


# ---------------------------------------------------------------------------
# Repetition filtering: Gopher/MassiveText top-bigram fraction rule.
REP_THRESHOLD = 0.06


@query(
    "text_repetition",
    oracle=f"""
WITH toks AS (SELECT doc_id, {sql_tokens('text')} AS tk FROM documents),
grams AS (
  SELECT doc_id, tk[i] || ' ' || tk[i+1] AS bigram
  FROM toks, unnest(generate_series(1, len(tk) - 1)) AS g(i)
),
counted AS (SELECT doc_id, bigram, count(*) AS n FROM grams GROUP BY 1, 2)
SELECT doc_id,
       CAST(sum(n) AS BIGINT) AS n_bigrams,
       max(n) AS top_n,
       round(max(n)::DOUBLE / sum(n), 6) AS top_frac,
       CAST(max(n)::DOUBLE / sum(n) > {REP_THRESHOLD} AS INT) AS repetitive
FROM counted GROUP BY 1
""",
)
def text_repetition(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Repetition quality rule (Gopher §A1.1): fraction of all bigram
    occurrences taken by the single most frequent bigram; documents
    above REP_THRESHOLD are flagged as degenerate/boilerplate.

    Two hash aggregations keyed on doc_id — the bigram explode
    preserves document partitioning, so partial aggregation collapses
    each doc's grams map-side before the exchange."""
    d = _docs(spark, sf_dir)
    d = d.repartition(d.sparkSession.sparkContext.defaultParallelism)
    tok = tokens(F.col("text"))
    n = F.size(tok)
    # greatest(.., 0) guards empty token arrays: slice() with a negative
    # length throws at runtime, and a whitespace-only document tokenizes
    # to [] (n - 1 == -1)
    bigrams = F.zip_with(
        F.slice(tok, 1, F.greatest(n - 1, F.lit(0))),
        F.slice(tok, 2, F.greatest(n - 1, F.lit(0))),
        lambda a, b: F.concat_ws(" ", a, b),
    )
    counted = (
        d.select("doc_id", F.explode(bigrams).alias("bigram"))
        .groupBy("doc_id", "bigram")
        .agg(F.count(F.lit(1)).alias("n"))
    )
    top_frac = F.col("top_n").cast("double") / F.col("n_bigrams")
    return (
        counted.groupBy("doc_id")
        .agg(
            F.sum("n").cast("long").alias("n_bigrams"),
            F.max("n").alias("top_n"),
        )
        .select(
            "doc_id",
            "n_bigrams",
            "top_n",
            F.round(top_frac, 6).alias("top_frac"),
            (top_frac > REP_THRESHOLD).cast("int").alias("repetitive"),
        )
    )


# ---------------------------------------------------------------------------
# PII redaction: regex detect + scrub, fingerprint-verified.
_EMAIL_RE = "[a-z0-9]+@[a-z]+\\.[a-z]+"
_PHONE_RE = "\\+1-555-[0-9]{4}"


@query(
    "pii_scrub",
    oracle=f"""
WITH injected AS (
  SELECT doc_id,
         text || ' contact user' || doc_id || '@example.com or +1-555-' ||
         lpad(CAST(doc_id % 10000 AS VARCHAR), 4, '0') AS s
  FROM documents
)
SELECT doc_id,
       len(regexp_extract_all(s, '{_EMAIL_RE}')) AS n_emails,
       len(regexp_extract_all(s, '{_PHONE_RE}')) AS n_phones,
       {sql_hash60(
           "regexp_replace(regexp_replace(s, '" + _EMAIL_RE + "', '<EMAIL>', 'g'), '"
           + _PHONE_RE + "', '<PHONE>', 'g')"
       )} AS redacted_fp,
       len(regexp_extract_all(
           regexp_replace(regexp_replace(s, '{_EMAIL_RE}', '<EMAIL>', 'g'),
                          '{_PHONE_RE}', '<PHONE>', 'g'),
           '{_EMAIL_RE}')) AS residual_pii
FROM injected
""",
)
def pii_scrub(spark: SparkSession, sf_dir: str) -> DataFrame:
    """PII detection + redaction: count and scrub email/phone patterns,
    returning the redacted-text fingerprint (so the oracle proves the
    SCRUBBED BYTES match, not just the counts) and a residual-PII
    recount as the pipeline's own safety assertion.

    The fixture text carries no PII, so a deterministic synthetic
    email+phone per document is appended on BOTH engine and oracle
    sides before scrubbing — the operator under test is the regex
    detect/redact stage, which is a pure row-local projection (zero
    shuffle; the regex compiles once per task, not per row).  The five
    regex sweeps per doc are CPU-bound: the scan gets the spread_scan
    parallelism floor (measured 0.26 -> 0.09 s at sf0.1 in full-bench
    conditions; no-op once the table splits naturally)."""
    d = spread_scan(spark, _docs(spark, sf_dir))
    injected = F.concat(
        F.col("text"),
        F.lit(" contact user"),
        F.col("doc_id").cast("string"),
        F.lit("@example.com or +1-555-"),
        F.lpad((F.col("doc_id") % 10000).cast("string"), 4, "0"),
    )
    redacted = F.regexp_replace(
        F.regexp_replace(injected, _EMAIL_RE, "<EMAIL>"), _PHONE_RE, "<PHONE>"
    )
    return d.select(
        "doc_id",
        F.regexp_count(injected, F.lit(_EMAIL_RE)).alias("n_emails"),
        F.regexp_count(injected, F.lit(_PHONE_RE)).alias("n_phones"),
        hash60(redacted).alias("redacted_fp"),
        F.regexp_count(redacted, F.lit(_EMAIL_RE)).alias("residual_pii"),
    )


# ---------------------------------------------------------------------------
# Tokenizer vocabulary induction + out-of-vocabulary profiling.
VOCAB_SIZE = 25


@query(
    "docs_vocab_coverage",
    oracle=f"""
WITH occ AS (
  SELECT source, unnest({sql_tokens('text')}) AS token FROM documents
),
vocab AS (
  SELECT token FROM (
    SELECT token, count(*) AS n,
           row_number() OVER (ORDER BY count(*) DESC, token) AS rn
    FROM occ GROUP BY token) t
  WHERE rn <= {VOCAB_SIZE}
)
SELECT source,
       count(*) AS total_tokens,
       CAST(coalesce(sum(CASE WHEN v.token IS NULL THEN 1 END), 0)
            AS BIGINT) AS oov_tokens,
       round(coalesce(sum(CASE WHEN v.token IS NULL THEN 1 END), 0)::DOUBLE
             / count(*), 6) AS oov_rate
FROM occ o LEFT JOIN vocab v USING (token)
GROUP BY source
""",
)
def docs_vocab_coverage(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Tokenizer vocabulary induction: take the corpus-frequency top
    VOCAB_SIZE tokens as the vocabulary, then profile each source's
    out-of-vocabulary token rate — the coverage report that drives
    vocab-size / tokenizer decisions before a training run.

    Vocab selection is sort-limit over the token-frequency aggregate
    (TakeOrderedAndProject: per-partition partial top-K, never a global
    single-partition window), and the OOV pass is one occurrence scan
    left-joined to the broadcast vocabulary — at 100 TB the vocab is
    KBs while the corpus side never shuffles."""
    d = _docs(spark, sf_dir)
    par = spark.sparkContext.defaultParallelism
    occ = d.repartition(par).select(
        "source", F.explode(tokens(F.col("text"))).alias("token")
    )
    # Round 15 (guide §2.3 aggregate-before-you-shuffle): both the
    # vocabulary and the per-source OOV report derive from the compact
    # (source, token, cnt) aggregate instead of the raw occurrence
    # stream — the broadcast-vocab probe and the final per-source agg
    # then touch |sources| x |distinct tokens| rows, not every token
    # occurrence in the corpus.  Output-identical (sum of counts ==
    # count of occurrences); measured 0.275 -> 0.226 s paired at sf0.1
    # (-18%), and at 100 TB the OOV join input shrinks from the corpus
    # token stream to the vocabulary-sized aggregate.
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


# ---------------------------------------------------------------------------
# Quality-filter funnel: the pipeline's yield report.
FUNNEL_MIN_TOKENS = 40
FUNNEL_MIN_DIVERSITY = 0.45


@query(
    "docs_filter_funnel",
    oracle=f"""
WITH toks AS (SELECT doc_id, {sql_tokens('text')} AS tk FROM documents),
grams AS (
  SELECT doc_id, tk[i] || ' ' || tk[i+1] AS bigram
  FROM toks, unnest(generate_series(1, len(tk) - 1)) AS g(i)
),
rep AS (
  SELECT doc_id, max(n)::DOUBLE / sum(n) AS top_frac
  FROM (SELECT doc_id, bigram, count(*) AS n FROM grams GROUP BY 1, 2) c
  GROUP BY doc_id
),
per_doc AS (
  SELECT t.doc_id,
         len(tk) >= {FUNNEL_MIN_TOKENS} AS pass_len,
         len(list_distinct(tk))::DOUBLE / len(tk)
           >= {FUNNEL_MIN_DIVERSITY} AS pass_div,
         coalesce(r.top_frac <= {REP_THRESHOLD}, FALSE) AS pass_rep
  FROM toks t LEFT JOIN rep r USING (doc_id)
)
SELECT count(*) AS n_total,
       CAST(coalesce(sum(CASE WHEN pass_len THEN 1 END), 0) AS BIGINT) AS n_len,
       CAST(coalesce(sum(CASE WHEN pass_len AND pass_div THEN 1 END), 0)
            AS BIGINT) AS n_quality,
       CAST(coalesce(sum(CASE WHEN pass_len AND pass_div AND pass_rep
                          THEN 1 END), 0) AS BIGINT) AS n_clean
FROM per_doc
""",
)
def docs_filter_funnel(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Composed quality-filter funnel with per-stage survivor counts —
    the yield report every data pipeline publishes: length gate, then
    lexical-diversity gate, then the Gopher top-bigram repetition gate,
    counted CUMULATIVELY so each stage's marginal cost is visible.

    One corpus scan computes the row-local gates; the repetition gate
    reuses text_repetition's two doc-keyed hash aggs; everything meets
    in a single global aggregate (4 scalar outputs)."""
    d = _docs(spark, sf_dir)
    d = d.repartition(d.sparkSession.sparkContext.defaultParallelism)
    tok = tokens(F.col("text"))
    n = F.size(tok)
    # greatest(.., 0) guards empty token arrays: slice() with a negative
    # length throws at runtime, and a whitespace-only document tokenizes
    # to [] (n - 1 == -1)
    bigrams = F.zip_with(
        F.slice(tok, 1, F.greatest(n - 1, F.lit(0))),
        F.slice(tok, 2, F.greatest(n - 1, F.lit(0))),
        lambda a, b: F.concat_ws(" ", a, b),
    )
    rep = (
        d.select("doc_id", F.explode(bigrams).alias("bigram"))
        .groupBy("doc_id", "bigram")
        .agg(F.count(F.lit(1)).alias("bn"))
        .groupBy("doc_id")
        .agg(
            (F.max("bn").cast("double") / F.sum("bn")).alias("top_frac")
        )
    )
    per_doc = (
        d.select(
            "doc_id",
            (n >= FUNNEL_MIN_TOKENS).alias("pass_len"),
            (
                F.size(F.array_distinct(tok)).cast("double") / n
                >= FUNNEL_MIN_DIVERSITY
            ).alias("pass_div"),
        )
        .join(rep, "doc_id", "left")
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


# ---------------------------------------------------------------------------
# Statistical LM quality scoring (the perplexity-style gate of
# CCNet/Gopher pipelines — Wenzek et al. 2019 train a 5-gram LM and
# drop high-perplexity documents; the deterministic stand-in here
# self-trains a bigram model on the corpus and scores each document by
# its mean scaled bigram probability, all integer so both engines
# agree bit-for-bit).
LM_PSCALE = 1_000_000


@query(
    "docs_lm_quality",
    oracle=f"""
WITH tk AS (
  SELECT doc_id, {sql_tokens('text')} AS t FROM documents
),
bg AS (
  SELECT doc_id, t[i] AS w1, t[i+1] AS w2
  FROM tk, unnest(generate_series(1, len(t) - 1)) AS g(i)
  WHERE len(t) >= 2
),
uni AS (SELECT w1, count(*) AS n1 FROM bg GROUP BY w1),
bi AS (SELECT w1, w2, count(*) AS n2 FROM bg GROUP BY w1, w2),
scored AS (
  SELECT b.doc_id,
         CAST(floor({LM_PSCALE}.0 * bi.n2 / uni.n1) AS BIGINT) AS p
  FROM bg b JOIN bi USING (w1, w2) JOIN uni USING (w1)
)
SELECT doc_id,
       CAST(count(*) AS BIGINT) AS n_bigrams,
       CAST(floor(CAST(sum(p) AS DOUBLE) / count(*)) AS BIGINT) AS lm_score
FROM scored GROUP BY doc_id
""",
)
def docs_lm_quality(spark: SparkSession, sf_dir: str) -> DataFrame:
    """LM-style quality score: self-train corpus bigram statistics, then
    score every document by its mean scaled bigram probability
    floor(1e6 * n(w1 w2) / n(w1 ·)) — boilerplate and templated text
    scores high, character soup scores near zero; the deterministic
    integer twin of the CCNet perplexity gate.

    Scale shape (round-6 collapse, 6 shuffle stages -> 4): the bigram
    model is one map-side-combined agg over the occurrence stream; the
    unigram totals ride a window over the VOCABULARY-sized model (no
    second corpus aggregation); and scoring is a BROADCAST of the model
    back onto the occurrences — the corpus never sort-merge-joins, and
    its only shuffle is the final per-doc agg, partial-aggregated to
    one row per document before it moves.  Stopword-headed w1 skew
    lands in a broadcast hash table instead of a skewed shuffle (the
    same "model tables broadcast" shape as docs_vocab_coverage)."""
    d = _docs(spark, sf_dir)
    d = d.repartition(d.sparkSession.sparkContext.defaultParallelism)
    tok = tokens(F.col("text"))
    n = F.size(tok)
    pairs = F.zip_with(
        F.slice(tok, 1, F.greatest(n - 1, F.lit(0))),
        F.slice(tok, 2, F.greatest(n - 1, F.lit(0))),
        lambda a, b: F.struct(a.alias("w1"), b.alias("w2")),
    )
    bg = d.select("doc_id", F.explode(pairs).alias("b")).select(
        "doc_id", F.col("b")["w1"].alias("w1"), F.col("b")["w2"].alias("w2")
    )
    # the bigram model: one map-side-combined agg over the occurrence
    # stream; the unigram totals ride a window over the (vocabulary-
    # sized) model instead of a second corpus aggregation
    bi = bg.groupBy("w1", "w2").agg(F.count(F.lit(1)).alias("n2"))
    # vocabulary-sized MODEL table: localCheckpoint truncates the
    # lineage so the probe branch below doesn't re-tokenize the corpus
    # to rebuild it (the sim_ivfadc/sim_pq_adc model pattern; the
    # BENCH accounting note in bench.py covers the protocol implication)
    model = bi.withColumn(
        "n1", F.sum("n2").over(Window.partitionBy("w1")).cast("long")
    ).localCheckpoint(eager=False)
    # scoring: broadcast the model onto the raw occurrences (map-only),
    # then ONE corpus shuffle — partial-aggregated to per-doc rows
    # before it moves
    scored = bg.join(F.broadcast(model), ["w1", "w2"]).select(
        "doc_id",
        F.floor(F.lit(float(LM_PSCALE)) * F.col("n2") / F.col("n1"))
        .cast("long")
        .alias("p"),
    )
    return scored.groupBy("doc_id").agg(
        F.count(F.lit(1)).cast("long").alias("n_bigrams"),
        F.floor(F.sum("p").cast("double") / F.count(F.lit(1)))
        .cast("long")
        .alias("lm_score"),
    )


# ---------------------------------------------------------------------------
# Temperature-based source reweighting (the multilingual alpha-sampling
# of mBERT / XLM-R §3.1: sample sources proportional to p^alpha so
# low-resource sources are up-weighted).  alpha = 0.5 here because
# sqrt is the one power IEEE 754 rounds correctly — floor(sqrt(n)) is
# bit-identical on both engines, and everything after it is integer, so
# the oracle matches exactly (a general pow(x, 0.3) could drift in the
# last ulp between runtimes).
MIX_TARGET_DIV = 2  # target corpus = N / 2 documents


@query(
    "docs_temperature_mix",
    oracle=f"""
WITH counts AS (
  SELECT source, count(*) AS n,
         CAST(floor(sqrt(count(*))) AS BIGINT) AS isq
  FROM documents GROUP BY source
),
tot AS (
  SELECT CAST(sum(n) AS BIGINT) AS big_n, CAST(sum(isq) AS BIGINT) AS ssum
  FROM counts
),
rates AS (
  SELECT source, n,
         least(1000, (1000 * (big_n // {MIX_TARGET_DIV}) * isq)
                       // (ssum * n)) AS keep_pm
  FROM counts, tot
),
kept AS (
  SELECT d.source, r.keep_pm, d.doc_id,
         CASE WHEN {sql_hash60('CAST(doc_id AS VARCHAR)')} % 1000 < r.keep_pm
              THEN 1 ELSE 0 END AS k
  FROM documents d JOIN rates r USING (source)
)
SELECT source,
       CAST(count(*) AS BIGINT) AS n_total,
       CAST(max(keep_pm) AS BIGINT) AS keep_pm,
       CAST(sum(k) AS BIGINT) AS n_kept,
       CAST(sum(CASE WHEN k = 1 THEN doc_id ELSE 0 END) AS BIGINT)
         AS kept_id_sum
FROM kept GROUP BY source
""",
)
def docs_temperature_mix(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Temperature sampling across sources: keep-rate per source is
    min(1, T * q_s / n_s) with q_s proportional to sqrt(n_s)
    (alpha = 0.5) and T = N / MIX_TARGET_DIV — low-volume sources keep
    a larger fraction, exactly the smoothing multilingual pipelines use
    so dominant sources don't swamp the mixture.

    Scale shape: per-source counts are one map-side-combined hash agg
    over a column the scan already carries; the rate table (a handful
    of rows) broadcasts back, and the keep decision is the row-local
    hash threshold of docs_mix_sample — the 100 TB side never shuffles.
    Integer note: the per-mille rate arithmetic stays in BIGINTs
    (floor-sqrt, integer divides); at extreme corpus sizes the
    1000 * T * isq product needs the same widening care as any
    fixed-point pipeline (documented rather than hidden in a double)."""
    d = _docs(spark, sf_dir)
    counts = d.groupBy("source").agg(F.count(F.lit(1)).alias("n")).select(
        "source", "n", F.floor(F.sqrt(F.col("n"))).cast("long").alias("isq")
    )
    # corpus totals ride an unpartitioned window over the HANDFUL of
    # per-source rows instead of a separate global agg + cross join —
    # one tiny single-partition exchange, 4 shuffle stages -> 3
    # (round-6 collapse)
    w0 = Window.partitionBy(F.lit(1))
    totals = counts.select(
        "source",
        "n",
        "isq",
        F.sum("n").over(w0).cast("long").alias("big_n"),
        F.sum("isq").over(w0).cast("long").alias("ssum"),
    )
    # floor-division spelled as floor(a / b): exact for these
    # magnitudes (numerator <= 1000 * N * sqrt(N), far under 2^53) and
    # identical to DuckDB's // on non-negative operands
    num = (
        F.lit(1000).cast("long")
        * F.floor(F.col("big_n") / MIX_TARGET_DIV).cast("long")
        * F.col("isq")
    )
    rates = totals.select(
        "source",
        F.least(
            F.lit(1000).cast("long"),
            F.floor(num / (F.col("ssum") * F.col("n"))).cast("long"),
        ).alias("keep_pm"),
    )
    kept = d.join(F.broadcast(rates), "source").select(
        "source",
        "keep_pm",
        "doc_id",
        F.when(
            hash60(F.col("doc_id").cast("string")) % 1000 < F.col("keep_pm"), 1
        )
        .otherwise(0)
        .alias("k"),
    )
    return kept.groupBy("source").agg(
        F.count(F.lit(1)).cast("long").alias("n_total"),
        F.max("keep_pm").cast("long").alias("keep_pm"),
        F.sum("k").cast("long").alias("n_kept"),
        F.sum(F.when(F.col("k") == 1, F.col("doc_id")).otherwise(0))
        .cast("long")
        .alias("kept_id_sum"),
    )


# ---------------------------------------------------------------------------
# Context-window chunking (round 6): split every document into
# fixed-size token windows with overlap — the packing-adjacent shape
# every pretraining pipeline runs between cleaning and tokenization
# (e.g. long-document splitting with stride so no boundary context is
# lost).  W = 64 tokens, stride S = 48 (16-token overlap).
# ---------------------------------------------------------------------------
_CHUNK_W = 64
_CHUNK_S = 48


@query(
    "docs_chunk_windows",
    # chunk count = 1 + ceil(max(0, n - W) / S); chunk i (0-based)
    # covers tokens [1 + i*S, 1 + i*S + min(W, n - i*S)).  The
    # fingerprint hashes the space-joined token slice with the
    # engine's md5 hash60 — bit-identical across engines.
    oracle=f"""
WITH toks AS (
  SELECT doc_id, regexp_split_to_array(trim(text), '\\s+') AS tk
  FROM documents WHERE doc_id % 5 = 0
),
sized AS (
  SELECT doc_id, tk, len(tk) AS n,
         1 + CAST(ceil(greatest(0, len(tk) - {_CHUNK_W})
                       / CAST({_CHUNK_S} AS DOUBLE)) AS BIGINT) AS n_chunks
  FROM toks
)
SELECT doc_id,
       CAST(i AS BIGINT) AS chunk_idx,
       CAST(1 + i * {_CHUNK_S} AS BIGINT) AS start_tok,
       CAST(least({_CHUNK_W}, n - i * {_CHUNK_S}) AS BIGINT) AS n_tok,
       {sql_hash60(f"array_to_string(tk[1 + i * {_CHUNK_S} : i * {_CHUNK_S} + least({_CHUNK_W}, n - i * {_CHUNK_S})], ' ')")}
         AS fp
FROM sized, unnest(generate_series(0, n_chunks - 1)) AS g(i)
""",
)
def docs_chunk_windows(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Sliding context-window chunking: one row per (doc, window) with
    the token span and a cross-engine fingerprint of the chunk text.

    Scale shape: pure row-local work — tokenize once, explode
    sequence(0, n_chunks-1), slice + hash per chunk.  No shuffle at
    all (the plan is scan -> project -> generate); at 100 TB this is
    the map-only stage between cleaning and tokenizer sharding, and
    the fingerprint column feeds chunk-level exact dedup downstream
    (dedup_exact's groupBy shape)."""
    d = _docs(spark, sf_dir).filter(F.col("doc_id") % 5 == 0)
    tk = tokens(F.col("text"))
    sized = d.select(
        "doc_id",
        tk.alias("tk"),
        F.size(tk).alias("n"),
        (
            1
            + F.ceil(
                F.greatest(F.size(tk) - _CHUNK_W, F.lit(0))
                / float(_CHUNK_S)
            ).cast("long")
        ).alias("n_chunks"),
    )
    return compile_once_scalar(sized.select(
        "doc_id",
        F.explode(F.sequence(F.lit(0), F.col("n_chunks") - 1)).alias("chunk_idx"),
        "tk",
        "n",
    ).select(
        "doc_id",
        F.col("chunk_idx").cast("long").alias("chunk_idx"),
        (1 + F.col("chunk_idx") * _CHUNK_S).cast("long").alias("start_tok"),
        F.least(
            F.lit(_CHUNK_W), F.col("n") - F.col("chunk_idx") * _CHUNK_S
        )
        .cast("long")
        .alias("n_tok"),
        hash60(
            F.array_join(
                F.slice(
                    F.col("tk"),
                    (1 + F.col("chunk_idx") * _CHUNK_S).cast("int"),
                    F.least(
                        F.lit(_CHUNK_W),
                        F.col("n") - F.col("chunk_idx") * _CHUNK_S,
                    ).cast("int"),
                ),
                " ",
            )
        ).alias("fp"),
    ))


# ---------------------------------------------------------------------------
# Learned quality-classifier gate (round 14): the fastText/CCNet-style
# pipeline stage (Wenzek et al. 2020 §4.3; Joulin et al. 2017) — train a
# hashed-bag-of-words LINEAR classifier on a labeled split, freeze the
# weights, and gate the corpus with a MAP-ONLY scoring pass against the
# broadcast weight vector.  The learned complement of docs_lm_quality's
# count-based bigram LM.  Reference parity: presto-ml
# MLFunctions.java learn_classifier/classify is the same
# train-on-aggregate + predict-per-row surface (see ml.py).
#
# Cross-engine determinism (the ml_kmeans recipe): every float step is
# limited to IEEE +,-,*,/ and floor — both engines execute those
# bit-identically — and each iteration re-quantizes to integers.  The
# one transcendental in logistic regression, sigmoid's exp(), is NOT
# IEEE-exact across libms (java.lang.Math vs C libm differ in the last
# ulp), so training uses the ALGEBRAIC sigmoid
#     sigma(z) = 0.5 + z / (2 * (1 + |z|))
# (same shape, same [0,1] range, rational arithmetic only).  The DuckDB
# oracle replays the identical unrolled iterations as CTEs and matches
# bit-for-bit.
_QC_D = 64  # hashed feature buckets; slot _QC_D is the bias
_QC_WS = 1 << 20  # residual/weight integer scale
_QC_ZN = 64  # margin normalizer: z_real = z / (_QC_WS * _QC_ZN)
_QC_T = 8  # unrolled full-batch gradient-descent steps
_QC_LRK = 128  # integer learning rate: step = floor(LRK * g / n_train)
# bias rides as _QC_BC pseudo-count "tokens" of bucket _QC_D, so the
# intercept moves at the same rate as the ~2-3/doc word-count features
# and the gradient/margin code paths need no special bias branch
_QC_BC = 8
# weak-supervision label (same thresholds as text_quality's 'good'):
# y = 1 iff len >= 40 tokens AND distinct-token ratio >= 0.2
_QC_MIN_TOK, _QC_MIN_RATIO = 40, 0.2


def qc_featurize(d: DataFrame) -> DataFrame:
    """(doc_id, text) -> (doc_id, y, is_train, barr): weak-supervision
    label, 80/20 deterministic split (doc_id % 5), and the hashed
    bucket ids of every token occurrence with the bias pseudo-counts
    appended.  md5-based bucketing (operators/text.hash60) is the
    engine-portable choice every dedup/sampling oracle here uses; a
    real deployment would swap in xxhash64 (one line, same shape)."""
    staged = d.select("doc_id", tokens(F.col("text")).alias("tk"))
    # when/otherwise, not a bare boolean cast: NULL text makes the
    # condition NULL, and the oracle's CASE maps that to 0, not NULL
    y = F.when(
        (F.size("tk") >= _QC_MIN_TOK)
        & (
            F.size(F.array_distinct("tk")).cast("double") / F.size("tk")
            >= _QC_MIN_RATIO
        ),
        F.lit(1),
    ).otherwise(F.lit(0))
    barr = F.concat(
        # coalesce: a NULL text tokenizes to a NULL array, and
        # concat(NULL, bias) would null the whole feature vector —
        # while the oracle's unnest(NULL) emits zero token rows but
        # keeps the bias rows.  Empty-array coalesce makes both
        # engines score NULL docs on the bias alone.
        F.coalesce(
            F.transform("tk", lambda t: (hash60(t) % _QC_D).cast("int")),
            F.array().cast("array<int>"),
        ),
        F.array_repeat(F.lit(_QC_D).cast("int"), _QC_BC),
    )
    return staged.select(
        "doc_id",
        y.alias("y"),
        (F.col("doc_id") % 5 != 0).alias("is_train"),
        barr.alias("barr"),
    )


def _qc_margin(w: "F.Column") -> "F.Column":
    """Integer margin of one doc against the packed weight array — a
    JVM HOF fold over the bucket ids, zero Python, zero shuffle."""
    return F.aggregate(
        F.col("barr"),
        F.lit(0).cast("long"),
        lambda acc, b: acc + F.element_at(w, b + 1),
    )


def _qc_residual(z: "F.Column", y: "F.Column") -> "F.Column":
    """floor((sigma(z_real) - y) * WS) — quantized logistic residual
    under the algebraic sigmoid; all IEEE-exact ops."""
    zd = z.cast("double") / F.lit(float(_QC_WS * _QC_ZN))
    p = F.lit(0.5) + zd / (F.lit(2.0) * (F.lit(1.0) + F.abs(zd)))
    return F.floor((p - y.cast("double")) * F.lit(float(_QC_WS))).cast("long")


def qc_learn_weights(feats: DataFrame) -> list[int]:
    """Full-batch gradient descent, _QC_T steps, returning the frozen
    model as a Python list of _QC_D + 1 integer weights.

    This is MLlib's LogisticRegression iteration layout verbatim:
    coefficients ship to the executors (as plan literals — even
    cheaper than a broadcast), the gradient tree-aggregates back to
    the driver, and ONLY the model-sized gradient (65 longs — the
    bounded-collect class of engine.py's ANALYZE stats) ever crosses.
    Each step is one corpus pass: margin/residual map against the
    literal weights fused with explode(bucket ids) into ONE
    map-side-combined hash agg whose shuffle carries at most D+1 rows
    per partition.  The train split is localCheckpointed ONCE so the
    tokenize+hash featurize pass feeds all T iterations (at 100 TB:
    persist the featurized corpus the same way).  A first draft kept
    the weights relational (one-row DataFrame, crossJoin + zip_with +
    per-iteration lineage checkpoint); it was ~2.5x slower at sf0.1 —
    ~17 jobs of checkpoint machinery to avoid a 520-byte collect the
    reference implementation (and MLlib) happily does."""
    import math

    spark = feats.sparkSession
    tr = (
        feats.filter(F.col("is_train"))
        .select("y", "barr")
        # the sf-scale fixture arrives as ONE row group -> spread the
        # checkpointed featurized split so every iteration's pass is
        # parallel (structural no-op once the scan splits on its own)
        .repartition(min(8, spark.sparkContext.defaultParallelism))
        .localCheckpoint(eager=False)
    )
    n = tr.count()
    w = [0] * (_QC_D + 1)
    if n == 0:
        # empty train split (e.g. every doc_id % 5 == 0, or an empty
        # fixture): the zero model is the only defined answer — the
        # update below would divide by n
        return w
    for _ in range(_QC_T):
        warr = F.array(*[F.lit(v).cast("long") for v in w])
        # rq is STAGED in its own projection: inlined next to the
        # generator it would be re-evaluated once per EXPLODED token
        # (the Generate output projection), a measured 4x on the
        # iteration pass — staged, the margin fold runs once per doc
        staged = tr.select(
            "barr", _qc_residual(_qc_margin(warr), F.col("y")).alias("rq")
        )
        g_rows = (
            staged.select(F.explode("barr").alias("b"), "rq")
            .groupBy("b")
            .agg(F.sum("rq").alias("g"))
            .collect()
        )
        g = {r["b"]: r["g"] for r in g_rows}
        # floor((LRK * g) / n) in driver floats is the same IEEE
        # double division + floor both engines execute.  Exactness
        # bound: Python's int/int division rounds the EXACT integer
        # quotient while the oracle casts the BIGINT product to DOUBLE
        # first, so bit-identity holds only while |LRK*g| <= 2^53 —
        # i.e. n_train up to ~2^26 docs at this residual scale.  Past
        # that, switch BOTH sides to integer floor-division
        # (LRK*g // n, BIGINT // in DuckDB) to stay exact at any n.
        w = [
            w[j] - math.floor(_QC_LRK * g.get(j, 0) / n)
            for j in range(_QC_D + 1)
        ]
    return w


def qc_score(feats: DataFrame, weights: list[int]) -> DataFrame:
    """Gate the corpus against the frozen weights — map-only: one JVM
    HOF fold per doc against the literal weight array, no shuffle, no
    Python."""
    warr = F.array(*[F.lit(v).cast("long") for v in weights])
    return feats.select(
        "doc_id",
        "y",
        "is_train",
        _qc_margin(warr).alias("z"),
    ).withColumn("predicted", (F.col("z") > 0).cast("int"))


def _qc_feat_ctes() -> str:
    """The featurize CTEs (label + hashed bucket ids) shared by the
    train-inclusive correctness oracle and the score-only bench
    denominator."""
    return f"""
lab AS MATERIALIZED (
  SELECT doc_id, tk,
         CASE WHEN len(tk) >= {_QC_MIN_TOK}
               AND len(list_distinct(tk))::DOUBLE / len(tk) >= {_QC_MIN_RATIO}
              THEN 1 ELSE 0 END AS y,
         (doc_id % 5 <> 0) AS is_train
  FROM (SELECT doc_id, {sql_tokens('text')} AS tk FROM documents) d
),
tok AS MATERIALIZED (
  SELECT doc_id, CAST({sql_hash60('t')} % {_QC_D} AS INT) AS b
  FROM lab, unnest(tk) AS u(t)
  UNION ALL
  SELECT doc_id, {_QC_D} AS b
  FROM lab, unnest(generate_series(1, {_QC_BC})) AS g(i)
)"""


_QC_CONFUSION_TAIL = """
SELECT CASE WHEN is_train THEN 'train' ELSE 'holdout' END AS split,
       y AS label,
       CASE WHEN z > 0 THEN 1 ELSE 0 END AS predicted,
       CAST(count(*) AS BIGINT) AS n,
       CAST(sum(z) AS BIGINT) AS sum_margin
FROM zf GROUP BY 1, 2, 3
"""


def _qc_train_parts() -> list[str]:
    """Unrolled gradient-descent CTEs through the final weights w{T}."""
    zd = f"{_QC_WS * _QC_ZN}.0"

    def sig(z: str) -> str:
        return f"(0.5 + ({z}/{zd})/(2*(1+abs({z}/{zd}))))"

    parts = [
        _qc_feat_ctes()
        + f""",
ntr AS MATERIALIZED (SELECT count(*) AS n FROM lab WHERE is_train),
r0 AS MATERIALIZED (SELECT doc_id, CAST(floor((0.5 - y) * {_QC_WS}) AS BIGINT) AS rq
       FROM lab WHERE is_train),
g0 AS MATERIALIZED (SELECT b, CAST(sum(rq) AS BIGINT) AS g
       FROM tok JOIN r0 USING (doc_id) GROUP BY b),
w1 AS MATERIALIZED (SELECT b, CAST(-floor(({_QC_LRK} * g)::DOUBLE / n) AS BIGINT) AS w
       FROM g0, ntr)"""
    ]
    for i in range(1, _QC_T):
        parts.append(
            f"""
zt{i} AS MATERIALIZED (SELECT t.doc_id, CAST(sum(w.w) AS BIGINT) AS z
          FROM tok t JOIN w{i} w USING (b)
          JOIN lab l ON l.doc_id = t.doc_id AND l.is_train
          GROUP BY t.doc_id),
r{i} AS MATERIALIZED (SELECT l.doc_id,
                CAST(floor(({sig('COALESCE(z, 0)')} - y) * {_QC_WS})
                     AS BIGINT) AS rq
         FROM lab l LEFT JOIN zt{i} USING (doc_id) WHERE l.is_train),
g{i} AS MATERIALIZED (SELECT b, CAST(sum(rq) AS BIGINT) AS g
         FROM tok JOIN r{i} USING (doc_id) GROUP BY b),
w{i + 1} AS MATERIALIZED (SELECT b, CAST(w - floor(({_QC_LRK} * g)::DOUBLE / n)
                            AS BIGINT) AS w
             FROM g{i} JOIN w{i} USING (b), ntr)"""
        )
    return parts


def _sql_quality_clf_oracle() -> str:
    """The identical unrolled iterations as DuckDB CTEs (the
    _sql_kmeans_oracle pattern): weights live as a (bucket, w)
    relation, margins as LEFT-JOIN sums — relationally different from
    the Spark HOF form, arithmetically bit-identical."""
    parts = _qc_train_parts()
    parts.append(
        f"""
ztf AS MATERIALIZED (SELECT t.doc_id, CAST(sum(w.w) AS BIGINT) AS z
        FROM tok t JOIN w{_QC_T} w USING (b) GROUP BY t.doc_id),
zf AS MATERIALIZED (SELECT l.doc_id, l.y, l.is_train, COALESCE(z, 0) AS z
       FROM lab l LEFT JOIN ztf USING (doc_id))"""
    )
    return "WITH " + ",".join(parts) + _QC_CONFUSION_TAIL


def _qc_bench_score_oracle(con) -> str:
    """Bench-denominator SYMMETRY (VERDICT r14 Wrong #2): Spark's timed
    classifier row is the map-only scoring pass against weights frozen
    at DataFrame build, so the DuckDB row it is priced against must
    measure the SAME work.  This builder runs the training CTEs ONCE,
    untimed (exactly what qc_learn_weights does outside bench.py's
    timed region), freezes the final weights as literals, and returns
    the score-only SQL — featurize + a 65-row literal weight join +
    the confusion aggregate — for refresh_baseline to time.  The
    correctness oracle (ORACLES entry) stays train-inclusive and
    bit-exact; only the denominator's timed region changes."""
    train_sql = (
        "WITH "
        + ",".join(_qc_train_parts())
        + f" SELECT b, w FROM w{_QC_T} ORDER BY b"
    )
    rows = con.sql(train_sql).fetchall()
    vals = ",".join(f"({int(b)},{int(w)})" for b, w in rows)
    return (
        "WITH "
        + _qc_feat_ctes()
        + f""",
wf AS (SELECT CAST(b AS INT) AS b, CAST(w AS BIGINT) AS w
       FROM (VALUES {vals}) AS v(b, w)),
ztf AS (SELECT t.doc_id, CAST(sum(w.w) AS BIGINT) AS z
        FROM tok t JOIN wf w USING (b) GROUP BY t.doc_id),
zf AS (SELECT l.doc_id, l.y, l.is_train, COALESCE(z, 0) AS z
       FROM lab l LEFT JOIN ztf USING (doc_id))"""
        + _QC_CONFUSION_TAIL
    )


BENCH_ORACLE_BUILDERS["docs_quality_classifier"] = _qc_bench_score_oracle


@query("docs_quality_classifier", oracle=_sql_quality_clf_oracle())
def docs_quality_classifier(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Train the hashed-n-gram quality gate on the 80% split, score the
    whole corpus map-only against the frozen broadcast weights, return
    the per-split confusion matrix with exact integer margin sums
    (97-98% holdout accuracy on the fixture label at sf0.01/sf0.1;
    tests/test_pipeline.py pins the accuracy floor and the
    planted-document invariants)."""
    feats = qc_featurize(spread_scan(spark, _docs(spark, sf_dir)))
    scored = qc_score(feats, qc_learn_weights(feats))
    return scored.groupBy(
        F.when(F.col("is_train"), "train").otherwise("holdout").alias("split"),
        F.col("y").alias("label"),
        "predicted",
    ).agg(
        F.count(F.lit(1)).cast("long").alias("n"),
        F.sum("z").alias("sum_margin"),
    )


def qc_gate_stream(stream_docs: DataFrame, weights: list[int]) -> DataFrame:
    """Streaming ingest form of the quality gate: score an arriving
    document stream against the FROZEN classifier weights and keep only
    passing docs.  Stateless by construction — featurize + the literal-
    weight margin fold are pure projections, so Structured Streaming
    runs the identical plan per micro-batch with no state store, no
    watermark, no shuffle (the same map-only contract the batch scorer
    pins in tests/test_plans.py).  This is the deployment shape of a
    CCNet-style gate: train once per corpus generation offline, gate
    every incoming dump with one scan (Wenzek et al. 2020 §4.3)."""
    scored = qc_score(qc_featurize(stream_docs), weights)
    return scored.filter(F.col("predicted") == 1).select("doc_id", "z")
