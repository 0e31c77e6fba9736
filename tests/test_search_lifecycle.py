"""Plan-shape and semantic assertions for the round-5 operator
families: BM25 search, repeated-span mining, chunking, lifecycle
grid, exclusion funnel, source dup matrix, vocab coverage."""

from pyspark.sql import functions as F

from rakam_api_spark.analytics import events as ev
from rakam_api_spark.llm import curation, search, text

SF = "/root/testdata/sf0.001"


def _plan(df) -> str:
    return df._jdf.queryExecution().executedPlan().toString()


def test_bm25_no_token_explode_and_take_ordered(spark):
    plan = _plan(search.bm25_search(spark, SF))
    # tf is computed doc-locally via array filter — no Generate
    # (explode) node anywhere in the plan
    assert "Generate" not in plan
    assert "TakeOrderedAndProject" in plan


def test_bm25_scores_monotone_in_rank(spark):
    rows = search.bm25_search(spark, SF).collect()
    assert len(rows) > 0
    scores = [r.score for r in rows]
    assert scores == sorted(scores, reverse=True)
    assert all(s > 0 for s in scores)


def test_dup_ngram_spans_all_cross_document(spark):
    rows = search.dup_ngram_spans(spark, SF).collect()
    assert len(rows) > 0
    assert all(r.n_docs >= 2 for r in rows)
    assert all(r.n_occurrences >= r.n_docs for r in rows)


def test_doc_chunking_no_exchange_before_output(spark):
    """Chunking is doc-local: the only exchange is the final
    presentation sort."""
    plan = _plan(curation.doc_chunking(spark, SF))
    assert plan.count("Exchange") <= 1


def test_doc_chunking_covers_every_token(spark):
    """Stride < chunk ⇒ consecutive chunks overlap and the union of
    chunk spans covers [1, n_tokens] for every document."""
    chunks = curation.doc_chunking(spark, SF)
    per_doc = chunks.groupBy("doc_id").agg(
        F.min("start_tok").alias("first_start"),
        F.max(F.col("start_tok") + F.col("n_tokens") - 1).alias("last_end"),
        F.count(F.lit(1)).alias("n_chunks"),
    )
    docs = spark.read.parquet(f"{SF}/documents.parquet").select(
        "doc_id", F.size(F.split("text", " ")).alias("n_tok")
    )
    joined = per_doc.join(docs, "doc_id")
    bad = joined.where(
        (F.col("first_start") != 1) | (F.col("last_end") != F.col("n_tok"))
    ).count()
    assert bad == 0


def test_lifecycle_grid_accounting_identity(spark):
    """new + retained + resurrected per week == distinct active users
    that week (every active user gets exactly one class)."""
    grid = ev.user_lifecycle_grid(spark, SF)
    events = ev._events(spark, SF)
    actual = (
        events.select(
            F.date_trunc("week", F.col("ts")).cast("date").alias("week"), "user_id"
        )
        .distinct()
        .groupBy("week")
        .agg(F.count(F.lit(1)).alias("n_active"))
    )
    joined = grid.join(actual, "week")
    bad = joined.where(
        F.col("n_new") + F.col("n_retained") + F.col("n_resurrected") != F.col("n_active")
    ).count()
    assert bad == 0
    assert joined.count() == grid.count()


def test_exclusion_funnel_bounds(spark):
    row = ev.funnel_with_exclusion(spark, SF).collect()[0]
    assert row.n_signup >= row.n_purchase_after >= row.n_clean_converted >= 0


def test_source_dup_matrix_symmetric_key_order(spark):
    rows = text.source_dup_matrix(spark, SF).collect()
    assert len(rows) > 0
    assert all(r.s1 < r.s2 for r in rows)


def test_vocab_coverage_cumulative_monotone(spark):
    rows = text.vocab_coverage(spark, SF).collect()
    assert len(rows) > 0
    cov = [r.cum_coverage for r in rows]
    assert cov == sorted(cov)
    assert cov[-1] <= 1.0 + 1e-12
