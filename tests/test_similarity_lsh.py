"""Random-hyperplane LSH for embedding near-dup: planted near-
duplicate vectors are recovered through the sign-pattern buckets
(the sf0.01 table has no pairs above cosine 0.46, so the oracle row
alone only proves the trivially-empty case — this test proves the
positive path)."""

import math
import random

import pytest

from rakam_api_spark.llm.similarity import embedding_cosine_dedup


@pytest.fixture(scope="module")
def planted_dir(spark, tmp_path_factory):
    """embeddings.parquet: 60 random base vectors (dim 16), plus 10
    near-duplicates of bases 0..9 (tiny perturbation → cosine ≈
    0.9999); random bases are near-orthogonal (expected |cos| ≈
    1/√16 = 0.25), far below the 0.95 threshold."""
    d = tmp_path_factory.mktemp("planted")
    rng = random.Random(7)
    rows = []
    base = []
    for i in range(60):
        v = [rng.gauss(0.0, 1.0) for _ in range(16)]
        n = math.sqrt(sum(x * x for x in v))
        v = [x / n for x in v]
        base.append(v)
        rows.append((i, v, i % 5))
    for j in range(10):
        v = [x + rng.gauss(0.0, 0.005) for x in base[j]]
        rows.append((60 + j, v, j % 5))
    spark.createDataFrame(
        rows, "vec_id long, embedding array<float>, label int"
    ).write.mode("overwrite").parquet(str(d / "embeddings.parquet"))
    return str(d)


def test_hyperplane_lsh_recovers_planted_pairs(spark, planted_dir):
    out = embedding_cosine_dedup(spark, planted_dir, threshold=0.95)
    pairs = {(r["v1"], r["v2"]): r["cosine"] for r in out.collect()}
    # every planted near-dup pair is recovered through the buckets
    assert set(pairs) == {(j, 60 + j) for j in range(10)}
    assert all(c >= 0.99 for c in pairs.values())


def test_hyperplane_star_fallback_on_degenerate_bucket(spark, tmp_path_factory):
    """A cluster of near-identical vectors larger than max_bucket
    takes the O(k) star path and still marks every member as a dup
    of the keeper."""
    d = tmp_path_factory.mktemp("degenerate")
    rng = random.Random(11)
    v0 = [rng.gauss(0.0, 1.0) for _ in range(16)]
    rows = [(i, [x + rng.gauss(0.0, 0.003) for x in v0], 0) for i in range(40)]
    spark.createDataFrame(
        rows, "vec_id long, embedding array<float>, label int"
    ).write.mode("overwrite").parquet(str(d / "embeddings.parquet"))
    out = embedding_cosine_dedup(spark, str(d), threshold=0.95, max_bucket=10)
    pairs = {(r["v1"], r["v2"]) for r in out.collect()}
    assert pairs == {(0, i) for i in range(1, 40)}  # star: keeper ↔ member
