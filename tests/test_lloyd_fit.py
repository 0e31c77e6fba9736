"""The materialized Lloyd/PQ fits (_lloyd_fit/_pq_fit) must be
value-identical to the hand-unrolled lazy chains they replaced —
localCheckpoint is a physical materialization, never a semantic
change.  Pins the refactor that cut the ANN family's re-evaluated
fit DAGs (round 12)."""

import sys

sys.path.insert(0, "/root/repo")

from pyspark.sql import functions as F

from rakam_api_spark.llm.similarity import (
    _assign_cells,
    _lloyd_fit,
    _pq_assign,
    _pq_comp,
    _pq_fit,
    _quantized_components,
)

SF_DIR = "/root/testdata/sf0.001"


def _unrolled_lloyd(comp, k, iters):
    cents = comp.where(F.col("vec_id") < k).select(
        F.col("vec_id").alias("label"), "pos", F.col("q").alias("cq")
    )
    for _ in range(iters):
        assign = _assign_cells(comp, cents)
        cents = (
            comp.join(assign, "vec_id")
            .groupBy("label", "pos")
            .agg(F.floor(F.avg("q")).cast("long").alias("cq"))
        )
    return cents, _assign_cells(comp, cents)


def _rows(df, *order):
    return [tuple(r) for r in df.orderBy(*order).collect()]


def test_lloyd_fit_matches_unrolled_chain(spark):
    emb = spark.read.parquet(f"{SF_DIR}/embeddings.parquet")
    comp = _quantized_components(emb).cache()
    comp.count()
    try:
        want_c, want_a = _unrolled_lloyd(comp, k=8, iters=2)
        got_c, got_a = _lloyd_fit(comp, k=8, iters=2)
        assert _rows(got_c, "label", "pos") == _rows(want_c, "label", "pos")
        assert _rows(got_a, "vec_id") == _rows(want_a, "vec_id")
    finally:
        comp.unpersist()


def test_lloyd_fit_assign_materialization_is_value_neutral(spark):
    emb = spark.read.parquet(f"{SF_DIR}/embeddings.parquet")
    comp = _quantized_components(emb).cache()
    comp.count()
    try:
        _, lazy_a = _lloyd_fit(comp, k=8, iters=2)
        _, eager_a = _lloyd_fit(comp, k=8, iters=2, materialize_assign=True)
        assert _rows(eager_a, "vec_id") == _rows(lazy_a, "vec_id")
    finally:
        comp.unpersist()


def test_pq_fit_matches_unrolled_chain(spark):
    emb = spark.read.parquet(f"{SF_DIR}/embeddings.parquet")
    comp = _pq_comp(emb, m=8).cache()
    comp.count()
    try:
        cents = comp.where(F.col("vec_id") < 16).select(
            "m", F.col("vec_id").alias("label"), "spos", F.col("q").alias("cq")
        )
        for _ in range(2):
            a = _pq_assign(comp, cents)
            cents = (
                comp.join(a, ["vec_id", "m"])
                .groupBy("m", "label", "spos")
                .agg(F.floor(F.avg("q")).cast("long").alias("cq"))
            )
        want_codes = _pq_assign(comp, cents)
        got_cents, got_codes = _pq_fit(comp, kc=16, iters=2)
        assert _rows(got_cents, "m", "label", "spos") == _rows(
            cents, "m", "label", "spos"
        )
        assert _rows(got_codes, "vec_id", "m") == _rows(want_codes, "vec_id", "m")
    finally:
        comp.unpersist()
