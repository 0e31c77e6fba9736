"""Round-15 text-analysis additions: word-length profiles, intra-doc
n-gram repetition, and first-half/second-half self-similarity —
corpus-quality screens a training-data pipeline runs beside the
dedup/curation passes (the reference delegates all analytics to
external SQL, reference README.md:27-31; these are the LLM-era
operators SURVEY.md §6 adds on top).

Determinism: per-doc statistics are exact integer arithmetic in
row-local expressions (codegen, no UDFs); per-doc doubles that must
be AVERAGED across docs are DECIMAL-cast first (decimal addition is
exact and order-free); single ratios are one double division rounded
to 9dp.

Scale: one explode+aggregate (or purely row-local array) pass per
query — token- or gram-grain, corpus-linear; nothing windows over
unbounded input; outputs are |langs|/|sources|-sized.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from .text import _docs

DEC = "decimal(18,6)"


def word_length_profile_by_lang(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    """Word-length profile per language: token count, average word
    length, and the share of LONG words (> 7 chars) — the
    morphology fingerprint (German-like languages skew long) that
    complements ``sentence_length_percentiles_by_lang`` at the word
    grain.

    Plan: ONE token-explode + |langs|-sized aggregate; every sum is
    an exact integer (character counts), so the averages are raw
    double divisions of exact longs."""
    docs = _docs(spark, sf_dir)
    toks = docs.select(
        "lang",
        F.explode(
            F.filter(F.split(F.col("text"), " "), lambda t: t != "")
        ).alias("tok"),
    )
    ln = F.length("tok")
    return (
        toks.groupBy("lang")
        .agg(
            F.count(F.lit(1)).alias("n_tokens"),
            F.round(
                F.sum(ln.cast("long")).cast("double")
                / F.count(F.lit(1)).cast("double"),
                9,
            ).alias("avg_word_len"),
            F.round(
                F.sum((ln > 7).cast("long")).cast("double")
                / F.count(F.lit(1)).cast("double"),
                9,
            ).alias("long_word_share"),
        )
        .orderBy("lang")
    )


WORD_LENGTH_ORACLE = """
WITH toks AS (
  SELECT lang, t.tok
  FROM documents,
       LATERAL unnest(list_filter(string_split(text, ' '),
                                  x -> x <> '')) t(tok)
)
SELECT lang,
       CAST(COUNT(*) AS BIGINT) AS n_tokens,
       round(CAST(SUM(CAST(len(tok) AS BIGINT)) AS DOUBLE)
             / CAST(COUNT(*) AS DOUBLE), 9) AS avg_word_len,
       round(CAST(SUM(CASE WHEN len(tok) > 7 THEN 1 ELSE 0 END) AS DOUBLE)
             / CAST(COUNT(*) AS DOUBLE), 9) AS long_word_share
FROM toks
GROUP BY lang
ORDER BY lang
"""


def intra_doc_repetition_by_source(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    """Within-document boilerplate: each doc's word-5-gram repetition
    rate (1 − distinct/total 5-grams), averaged per source — the
    degenerate-generation/template screen that catches docs whose
    DUPLICATION is internal (cross-doc dedup can't see it; the
    ``doc_prefix_duplication`` sibling for repeats anywhere in the
    body).  Docs under 5 tokens are excluded (no 5-gram exists).

    Plan: 5-grams via one row-local sequence+slice transform then ONE
    explode + (doc) aggregate (count + distinct count), a row-local
    repetition rate DECIMAL-cast before the per-source average (an
    avg of doubles would be order-dependent), |sources|-sized
    output."""
    docs = _docs(spark, sf_dir).withColumn(
        "_toks", F.filter(F.split(F.col("text"), " "), lambda t: t != "")
    )
    grams = docs.where(F.size("_toks") >= 5).select(
        "doc_id",
        "source",
        F.explode(
            F.expr(
                "transform(sequence(1, size(_toks) - 4),"
                " i -> concat_ws(' ', slice(_toks, i, 5)))"
            )
        ).alias("g"),
    )
    per_doc = grams.groupBy("doc_id", "source").agg(
        F.count(F.lit(1)).alias("_n"),
        F.countDistinct("g").alias("_d"),
    )
    rep = F.round(
        (F.col("_n") - F.col("_d")).cast("double") / F.col("_n").cast("double"),
        9,
    ).cast(DEC)
    return (
        per_doc.select("source", rep.alias("_rep"))
        .groupBy("source")
        .agg(
            F.count(F.lit(1)).alias("n_docs"),
            F.round(
                F.sum("_rep").cast("double") / F.count(F.lit(1)).cast("double"),
                9,
            ).alias("avg_repetition"),
        )
        .orderBy("source")
    )


INTRA_DOC_REPETITION_ORACLE = """
WITH toks AS (
  SELECT doc_id, source,
         list_filter(string_split(text, ' '), x -> x <> '') AS t
  FROM documents
),
grams AS (
  SELECT doc_id, source, array_to_string(t[i:i+4], ' ') AS g
  FROM toks, LATERAL unnest(range(1, len(t) - 3)) s(i)
  WHERE len(t) >= 5
),
per_doc AS (
  SELECT doc_id, source, COUNT(*) AS _n, COUNT(DISTINCT g) AS _d
  FROM grams GROUP BY 1, 2
),
rated AS (
  SELECT source,
         CAST(round(CAST(_n - _d AS DOUBLE) / CAST(_n AS DOUBLE), 9)
              AS DECIMAL(18,6)) AS _rep
  FROM per_doc
)
SELECT source,
       CAST(COUNT(*) AS BIGINT) AS n_docs,
       round(CAST(SUM(_rep) AS DOUBLE) / CAST(COUNT(*) AS DOUBLE), 9)
         AS avg_repetition
FROM rated
GROUP BY source
ORDER BY source
"""


def doc_half_jaccard_by_lang(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Within-document topical drift: the Jaccard similarity between
    the DISTINCT token sets of each doc's first and second half,
    averaged per language — uniform word-stream docs score high,
    docs that change subject mid-body score low (the intra-doc
    sibling of ``source_vocab_overlap``).  Docs under 2 tokens are
    excluded.

    Plan: purely ROW-LOCAL array arithmetic (slice + array_distinct +
    array_intersect sizes — no explode, no join), a DECIMAL-cast
    per-doc score, then one |langs|-sized aggregate."""
    docs = _docs(spark, sf_dir).withColumn(
        "_toks", F.filter(F.split(F.col("text"), " "), lambda t: t != "")
    )
    # integer div for the split point: Spark's double->int cast
    # TRUNCATES while DuckDB's ROUNDS, so the halves must come from
    # `div` on both engines
    half = F.expr("size(_toks) div 2")
    scored = (
        docs.where(F.size("_toks") >= 2)
        .withColumn("_a", F.array_distinct(F.slice("_toks", F.lit(1), half)))
        .withColumn(
            "_b",
            F.array_distinct(
                F.expr("slice(_toks, (size(_toks) div 2) + 1, size(_toks))")
            ),
        )
        .select(
            "lang",
            F.round(
                F.size(F.array_intersect("_a", "_b")).cast("double")
                / (
                    F.size("_a") + F.size("_b")
                    - F.size(F.array_intersect("_a", "_b"))
                ).cast("double"),
                9,
            )
            .cast(DEC)
            .alias("_j"),
        )
    )
    return (
        scored.groupBy("lang")
        .agg(
            F.count(F.lit(1)).alias("n_docs"),
            F.round(
                F.sum("_j").cast("double") / F.count(F.lit(1)).cast("double"),
                9,
            ).alias("avg_half_jaccard"),
        )
        .orderBy("lang")
    )


HALF_JACCARD_ORACLE = """
WITH toks AS (
  SELECT lang, list_filter(string_split(text, ' '), x -> x <> '') AS t
  FROM documents
),
halves AS (
  SELECT lang,
         list_distinct(t[1:len(t) // 2]) AS a,
         list_distinct(t[len(t) // 2 + 1:len(t)]) AS b
  FROM toks WHERE len(t) >= 2
),
scored AS (
  SELECT lang,
         CAST(round(CAST(len(list_intersect(a, b)) AS DOUBLE)
                    / CAST(len(a) + len(b) - len(list_intersect(a, b))
                           AS DOUBLE), 9) AS DECIMAL(18,6)) AS _j
  FROM halves
)
SELECT lang,
       CAST(COUNT(*) AS BIGINT) AS n_docs,
       round(CAST(SUM(_j) AS DOUBLE) / CAST(COUNT(*) AS DOUBLE), 9)
         AS avg_half_jaccard
FROM scored
GROUP BY lang
ORDER BY lang
"""


QUERIES = {
    "word_length_profile_by_lang": word_length_profile_by_lang,
    "intra_doc_repetition_by_source": intra_doc_repetition_by_source,
    "doc_half_jaccard_by_lang": doc_half_jaccard_by_lang,
}

ORACLES = {
    "word_length_profile_by_lang": WORD_LENGTH_ORACLE,
    "intra_doc_repetition_by_source": INTRA_DOC_REPETITION_ORACLE,
    "doc_half_jaccard_by_lang": HALF_JACCARD_ORACLE,
}
