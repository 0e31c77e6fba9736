"""Round-14 text-analysis additions: stopword-density bands,
sentence-length percentiles, a readability composite, and
character-trigram out-of-vocabulary rates — corpus-quality screens a
training-data pipeline runs beside the dedup/curation passes (the
reference delegates all analytics to external SQL, reference
README.md:27-31; these are the LLM-era operators SURVEY.md §6 adds on
top).

Determinism: every per-doc statistic is exact integer arithmetic in a
row-local expression (codegen, no UDFs); single ratios are one double
division rounded to 9dp; multi-term float chains round to 6dp; top-k
cuts order by (exact count DESC, token ASC) so the boundary is
deterministic.

Scale: one explode+aggregate pass per query (token- or trigram-grain,
corpus-linear); profiles/caps are bounded frames broadcast back;
nothing windows over unbounded input (top-k is TakeOrdered, not a
rank window).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from .text import STOPWORDS, _docs

def _words():
    """Non-empty space-split tokens of ``text`` (built lazily — a
    module-level Column would need an active session at import)."""
    return F.filter(F.split(F.col("text"), " "), lambda t: t != "")


def stopword_density_bands(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Stopword-density histogram: per-document stopword ratio
    (STOPWORDS hits / tokens) in 0.05-wide bands (clamped at 10),
    with doc counts, average length, and corpus share — natural text
    sits in a mid band; near-zero means code/tables/non-English,
    saturated means boilerplate — the filter-threshold design view
    behind ``text_quality``'s pass/fail rule.

    Plan: row-local integer counts (codegen), one enum-sized band
    aggregate, share via the cell-total idiom."""
    docs = _docs(spark, sf_dir)
    n_tok = F.size(_words())
    n_stop = F.size(F.filter(_words(), lambda t: t.isin(*STOPWORDS)))
    ratio = n_stop.cast("double") / n_tok.cast("double")
    band = F.least(F.floor(ratio / 0.05), F.lit(10)).cast("int")
    cell = (
        docs.where(n_tok > 0)
        .groupBy(band.alias("density_band"))
        .agg(
            F.count(F.lit(1)).alias("n_docs"),
            F.sum("n_chars").alias("_chars"),
        )
    )
    tot = cell.agg(F.sum("n_docs").alias("_t"))
    return (
        cell.crossJoin(F.broadcast(tot))
        .select(
            "density_band",
            "n_docs",
            F.round(
                F.col("_chars").cast("double") / F.col("n_docs").cast("double"),
                9,
            ).alias("avg_chars"),
            F.round(
                F.col("n_docs").cast("double") / F.col("_t").cast("double"), 9
            ).alias("share_of_docs"),
        )
        .orderBy("density_band")
    )


_STOP_SQL = ", ".join(f"'{s}'" for s in STOPWORDS)

STOPWORD_DENSITY_ORACLE = f"""
WITH d AS (
  SELECT n_chars,
         len(list_filter(string_split(text, ' '), x -> x <> '')) AS n_tok,
         len(list_filter(string_split(text, ' '),
                         x -> x IN ({_STOP_SQL}))) AS n_stop
  FROM documents
),
cell AS (
  SELECT CAST(least(floor((CAST(n_stop AS DOUBLE) / CAST(n_tok AS DOUBLE))
                          / 0.05), 10) AS INT) AS density_band,
         COUNT(*) AS n_docs, SUM(n_chars) AS _chars
  FROM d WHERE n_tok > 0 GROUP BY 1
)
SELECT density_band, CAST(n_docs AS BIGINT) AS n_docs,
       round(CAST(_chars AS DOUBLE) / CAST(n_docs AS DOUBLE), 9) AS avg_chars,
       round(CAST(n_docs AS DOUBLE)
             / CAST((SELECT SUM(n_docs) FROM cell) AS DOUBLE), 9)
         AS share_of_docs
FROM cell ORDER BY density_band
"""


def sentence_length_percentiles_by_lang(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    """Sentence-length distribution per language: p25/p50/p75 of
    words-per-sentence (split on ``[.!?]+``), plus sentence counts —
    the segmentation sanity check (a language whose "sentences" run
    hundreds of words signals markup/boilerplate, not prose) feeding
    chunking and packing parameters.

    Plan: one regex-split explode to sentence grain, row-local word
    counts, one |langs|-sized exact-percentile aggregate (at 100 TB
    swap ``approx_percentile`` — same call shape)."""
    docs = _docs(spark, sf_dir)
    sent = docs.select(
        "lang", F.explode(F.split(F.col("text"), "[.!?]+")).alias("s")
    )
    words = F.size(
        F.filter(F.split(F.trim(F.col("s")), " "), lambda t: t != "")
    )
    return (
        sent.select("lang", words.alias("w"))
        .where(F.col("w") > 0)
        .groupBy("lang")
        .agg(
            F.count(F.lit(1)).alias("n_sentences"),
            F.expr("percentile(w, 0.25)").alias("p25_words"),
            F.expr("percentile(w, 0.5)").alias("p50_words"),
            F.expr("percentile(w, 0.75)").alias("p75_words"),
        )
        .orderBy("lang")
    )


SENTENCE_LENGTH_ORACLE = """
WITH sent AS (
  SELECT lang,
         len(list_filter(string_split(trim(s), ' '), x -> x <> '')) AS w
  FROM documents, LATERAL unnest(string_split_regex(text, '[.!?]+')) t(s)
)
SELECT lang, CAST(COUNT(*) AS BIGINT) AS n_sentences,
       quantile_cont(w, 0.25) AS p25_words,
       quantile_cont(w, 0.5) AS p50_words,
       quantile_cont(w, 0.75) AS p75_words
FROM sent WHERE w > 0 GROUP BY lang ORDER BY lang
"""


def readability_composite_by_source(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    """Readability proxy per source: average sentence length (words),
    average word length (chars), and the Flesch-Kincaid-style
    composite ``0.39·wps + 11.8·cpw − 15.59`` computed on those
    proxies — the one-number "grade level" used to stratify corpora
    before sampling (syllable counts need a dictionary; chars-per-
    word is the standard proxy).

    Plan: all three totals are row-local integer expressions summed
    in ONE source-grain aggregate; the composite is a final float
    chain over |sources| rows (round 6)."""
    docs = _docs(spark, sf_dir)
    n_words = F.size(_words())
    n_word_chars = F.aggregate(
        _words(), F.lit(0).cast("long"), lambda acc, x: acc + F.length(x)
    )
    n_sents = F.size(
        F.filter(
            F.transform(F.split(F.col("text"), "[.!?]+"), lambda s: F.trim(s)),
            lambda s: s != "",
        )
    )
    agg = docs.groupBy("source").agg(
        F.sum(n_words).alias("tw"),
        F.sum(n_word_chars).alias("twc"),
        F.sum(n_sents).alias("ts"),
    )
    wps = F.col("tw").cast("double") / F.col("ts").cast("double")
    cpw = F.col("twc").cast("double") / F.col("tw").cast("double")
    return (
        agg.where((F.col("ts") > 0) & (F.col("tw") > 0))
        .select(
            "source",
            F.col("tw").alias("n_words"),
            F.col("ts").alias("n_sentences"),
            F.round(wps, 6).alias("words_per_sentence"),
            F.round(cpw, 6).alias("chars_per_word"),
            F.round(wps * 0.39 + cpw * 11.8 - 15.59, 6).alias(
                "fk_composite"
            ),
        )
        .orderBy("source")
    )


READABILITY_ORACLE = """
WITH d AS (
  SELECT source,
         len(list_filter(string_split(text, ' '), x -> x <> '')) AS nw,
         CAST(list_sum(list_transform(
                list_filter(string_split(text, ' '), x -> x <> ''),
                x -> len(x))) AS BIGINT) AS nwc,
         len(list_filter(
               list_transform(string_split_regex(text, '[.!?]+'),
                              s -> trim(s)),
               s -> s <> '')) AS ns
  FROM documents
),
agg AS (
  SELECT source, SUM(nw) AS tw, SUM(nwc) AS twc, SUM(ns) AS ts
  FROM d GROUP BY 1
)
SELECT source, CAST(tw AS BIGINT) AS n_words, CAST(ts AS BIGINT) AS n_sentences,
       round(CAST(tw AS DOUBLE) / CAST(ts AS DOUBLE), 6)
         AS words_per_sentence,
       round(CAST(twc AS DOUBLE) / CAST(tw AS DOUBLE), 6) AS chars_per_word,
       round((CAST(tw AS DOUBLE) / CAST(ts AS DOUBLE)) * 0.39
             + (CAST(twc AS DOUBLE) / CAST(tw AS DOUBLE)) * 11.8 - 15.59, 6)
         AS fk_composite
FROM agg WHERE ts > 0 AND tw > 0 ORDER BY source
"""


def char_trigram_oov_by_source(
    spark: SparkSession, sf_dir: str, profile_k: int = 500
) -> DataFrame:
    """Character-trigram OOV rate: the share of each source's
    trigram OCCURRENCES falling outside the English reference
    profile (the ``profile_k`` most frequent trigrams of the
    ``lang='en'`` slice, count-desc/trigram-asc cut) — a cheap
    domain-shift detector: a source drifting away from the profile
    needs its own tokenizer/quality calibration.

    Plan: ONE trigram explode (corpus-linear, codegen substring);
    the profile is a TakeOrdered top-k (never a rank window)
    broadcast back; per-source rates are one cell aggregate."""
    docs = _docs(spark, sf_dir)
    tri = docs.where(F.length("text") >= 3).select(
        "lang",
        "source",
        F.explode(
            F.expr(
                "transform(sequence(1, length(text) - 2),"
                " i -> substring(text, i, 3))"
            )
        ).alias("g"),
    )
    profile = (
        tri.where(F.col("lang") == "en")
        .groupBy("g")
        .agg(F.count(F.lit(1)).alias("_c"))
        .orderBy(F.desc("_c"), F.asc("g"))
        .limit(profile_k)
        .select("g", F.lit(1).alias("_known"))
    )
    cell = tri.groupBy("source", "g").agg(F.count(F.lit(1)).alias("n"))
    return (
        cell.join(F.broadcast(profile), "g", "left")
        .groupBy("source")
        .agg(
            F.sum("n").alias("n_trigrams"),
            F.sum(F.when(F.col("_known").isNull(), F.col("n")).otherwise(0)).alias(
                "n_oov"
            ),
        )
        .select(
            "source",
            "n_trigrams",
            "n_oov",
            F.round(
                F.col("n_oov").cast("double") / F.col("n_trigrams").cast("double"),
                9,
            ).alias("oov_rate"),
        )
        .orderBy("source")
    )


CHAR_TRIGRAM_OOV_ORACLE = """
WITH tri AS (
  SELECT lang, source, substr(text, CAST(i AS INT), 3) AS g
  FROM documents, LATERAL unnest(range(1, len(text) - 1)) t(i)
  WHERE len(text) >= 3
),
profile AS (
  SELECT g FROM (
    SELECT g, COUNT(*) AS _c FROM tri WHERE lang = 'en' GROUP BY 1
    ORDER BY _c DESC, g ASC LIMIT 500
  )
),
cell AS (SELECT source, g, COUNT(*) AS n FROM tri GROUP BY 1, 2)
SELECT c.source, CAST(SUM(c.n) AS BIGINT) AS n_trigrams,
       CAST(SUM(CASE WHEN p.g IS NULL THEN c.n ELSE 0 END) AS BIGINT)
         AS n_oov,
       round(CAST(SUM(CASE WHEN p.g IS NULL THEN c.n ELSE 0 END) AS DOUBLE)
             / CAST(SUM(c.n) AS DOUBLE), 9) AS oov_rate
FROM cell c LEFT JOIN profile p USING (g)
GROUP BY c.source ORDER BY c.source
"""


QUERIES = {
    "stopword_density_bands": stopword_density_bands,
    "sentence_length_percentiles_by_lang": sentence_length_percentiles_by_lang,
    "readability_composite_by_source": readability_composite_by_source,
    "char_trigram_oov_by_source": char_trigram_oov_by_source,
}

ORACLES = {
    "stopword_density_bands": STOPWORD_DENSITY_ORACLE,
    "sentence_length_percentiles_by_lang": SENTENCE_LENGTH_ORACLE,
    "readability_composite_by_source": READABILITY_ORACLE,
    "char_trigram_oov_by_source": CHAR_TRIGRAM_OOV_ORACLE,
}
