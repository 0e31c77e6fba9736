"""Round-14 embedding-geometry additions: a per-label silhouette
proxy, norm percentiles by label, and top-variance dimensions — the
embedding-space QA battery a training-data pipeline runs before
trusting labels or distance thresholds (companions to
``similarity.py``'s centroid diagnostics; same integer-quantized
kernel, so every distance is exact until the final sqrt).

Determinism: all moments/distances accumulate as EXACT integers over
the QUANT-quantized components; sqrt/means of sqrt round to 6dp (the
float-chain convention); percentile interpolation is bit-identical
between Spark ``percentile`` and DuckDB ``quantile_cont``; top-k cuts
order by an exact integer key.

Scale: the corpus is posexploded ONCE per query; centroids are
|labels|·d rows (broadcastable by construction); no corpus-grain
frame is ever broadcast (the r13 ANN-family rule, enforced by
tests/test_plan_hygiene.py).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.functions import broadcast

from ..tables import load_table
from .similarity import QUANT, _compl_for, _label_cents_for, _norms_for

_COMP_SQL = """
comp AS (
  SELECT vec_id, label, CAST(i AS INT) AS pos,
         CAST(round(CAST(embedding[CAST(i AS INT)+1] AS DOUBLE) * 10000, 0)
              AS BIGINT) AS q
  FROM embeddings, LATERAL unnest(range(0, len(embedding))) t(i)
),
cents AS (
  SELECT label, pos, CAST(floor(avg(q)) AS BIGINT) AS cq
  FROM comp GROUP BY 1, 2
)
"""


def label_silhouette_proxy(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-label silhouette proxy: mean member→own-centroid distance
    (cohesion ``a``), distance to the nearest OTHER centroid
    (separation ``b``), and ``(b − a) / max(a, b)`` — the one-number
    label-geometry health check (negative ⇒ the label's members sit
    closer to a rival centroid than their own;
    ``centroid_nearest_rival`` reports the rival, this scores it).

    Plan: corpus posexploded once; member distances join the
    broadcast |labels|·d centroid frame and reduce to vector grain as
    exact integers; the centroid-pair matrix is |labels|² cells.
    Means of sqrt → round 6."""
    compl = _compl_for(spark, sf_dir)
    cents = _label_cents_for(spark, sf_dir)
    diff = F.col("q") - F.col("cq")
    own = (
        compl.join(broadcast(cents), ["label", "pos"])
        .groupBy("vec_id", "label")
        .agg(F.sum(diff * diff).alias("d2"))
    )
    a = own.groupBy("label").agg(
        F.count(F.lit(1)).alias("n_members"),
        (
            F.sum(F.sqrt(F.col("d2").cast("double")))
            / F.count(F.lit(1)).cast("double")
        ).alias("_a"),
    )
    x = cents.alias("x")
    y = cents.select(
        F.col("label").alias("rival"),
        "pos",
        F.col("cq").alias("rq"),
    ).alias("y")
    cc = (
        x.join(broadcast(y), "pos")
        .where(F.col("x.label") != F.col("rival"))
        .groupBy(F.col("x.label").alias("label"), "rival")
        .agg(F.sum((F.col("cq") - F.col("rq")) * (F.col("cq") - F.col("rq"))).alias("d2"))
    )
    b = cc.groupBy("label").agg(
        F.min(F.sqrt(F.col("d2").cast("double"))).alias("_b")
    )
    q = float(QUANT)
    return (
        a.join(b, "label")
        .select(
            "label",
            "n_members",
            F.round(F.col("_a") / q, 6).alias("a_intra"),
            F.round(F.col("_b") / q, 6).alias("b_nearest"),
            F.round(
                (F.col("_b") - F.col("_a"))
                / F.greatest(F.col("_a"), F.col("_b")),
                6,
            ).alias("silhouette"),
        )
        .orderBy("label")
    )


LABEL_SILHOUETTE_ORACLE = f"""
WITH {_COMP_SQL},
own AS (
  SELECT c.vec_id, c.label, SUM((c.q - t.cq) * (c.q - t.cq)) AS d2
  FROM comp c JOIN cents t ON c.label = t.label AND c.pos = t.pos
  GROUP BY 1, 2
),
a AS (
  SELECT label, COUNT(*) AS n_members,
         SUM(sqrt(CAST(d2 AS DOUBLE))) / COUNT(*) AS _a
  FROM own GROUP BY 1
),
cc AS (
  SELECT x.label AS label, y.label AS rival,
         SUM((x.cq - y.cq) * (x.cq - y.cq)) AS d2
  FROM cents x JOIN cents y ON x.pos = y.pos AND x.label <> y.label
  GROUP BY 1, 2
),
b AS (SELECT label, MIN(sqrt(CAST(d2 AS DOUBLE))) AS _b FROM cc GROUP BY 1)
SELECT a.label, CAST(a.n_members AS BIGINT) AS n_members,
       round(a._a / 10000.0, 6) AS a_intra,
       round(b._b / 10000.0, 6) AS b_nearest,
       round((b._b - a._a) / greatest(a._a, b._b), 6) AS silhouette
FROM a JOIN b USING (label) ORDER BY a.label
"""


def embedding_norm_percentiles_by_label(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    """Norm distribution per label: p10/p50/p90 of vector L2 norms —
    labels whose norm bands don't overlap make cosine-vs-dot choices
    matter, and a collapsed p10 flags near-zero junk vectors (the
    banded companion to ``embedding_norm_audit``'s global outliers).

    Plan: one vector-grain exact integer norm² reduce, one
    |labels|-sized percentile aggregate."""
    compl = _compl_for(spark, sf_dir)
    norms = compl.groupBy("vec_id", "label").agg(
        F.sum(F.col("q") * F.col("q")).alias("n2")
    )
    norm = F.sqrt(F.col("n2").cast("double")) / F.lit(float(QUANT))
    return (
        norms.select("label", norm.alias("nrm"))
        .groupBy("label")
        .agg(
            F.count(F.lit(1)).alias("n_vectors"),
            F.round(F.expr("percentile(nrm, 0.1)"), 9).alias("p10_norm"),
            F.round(F.expr("percentile(nrm, 0.5)"), 9).alias("p50_norm"),
            F.round(F.expr("percentile(nrm, 0.9)"), 9).alias("p90_norm"),
        )
        .orderBy("label")
    )


NORM_PERCENTILES_ORACLE = f"""
WITH {_COMP_SQL},
norms AS (
  SELECT vec_id, label, SUM(q * q) AS n2 FROM comp GROUP BY 1, 2
),
n AS (
  SELECT label, sqrt(CAST(n2 AS DOUBLE)) / 10000.0 AS nrm FROM norms
)
SELECT label, CAST(COUNT(*) AS BIGINT) AS n_vectors,
       round(quantile_cont(nrm, 0.1), 9) AS p10_norm,
       round(quantile_cont(nrm, 0.5), 9) AS p50_norm,
       round(quantile_cont(nrm, 0.9), 9) AS p90_norm
FROM n GROUP BY label ORDER BY label
"""


def dimension_variance_topk(
    spark: SparkSession, sf_dir: str, k: int = 20
) -> DataFrame:
    """Top-``k`` embedding dimensions by population variance of the
    quantized components — the axes carrying the signal; a variance
    profile collapsing onto a few dimensions says the embedding is
    effectively low-rank (PQ/IVF parameters should follow;
    ``embedding_intrinsic_dim`` estimates the rank, this names the
    axes).

    Plan: ONE d-row exact integer moment aggregate over the
    posexploded corpus; the cut is a TakeOrdered over d rows on the
    exact integer variance numerator (never a rank window)."""
    compl = _compl_for(spark, sf_dir)
    mom = compl.groupBy("pos").agg(
        F.count(F.lit(1)).alias("n"),
        F.sum("q").alias("s1"),
        F.sum(F.col("q") * F.col("q")).alias("s2"),
    )
    num = F.col("n") * F.col("s2") - F.col("s1") * F.col("s1")  # exact long
    return (
        mom.select(
            "pos",
            num.alias("_num"),
            F.col("n"),
            F.round(
                F.col("s1").cast("double") / F.col("n").cast("double"), 9
            ).alias("mean_q"),
            F.round(
                num.cast("double")
                / (F.col("n") * F.col("n")).cast("double"),
                9,
            ).alias("variance_q"),
        )
        .orderBy(F.desc("_num"), F.asc("pos"))
        .limit(k)
        .select("pos", "mean_q", "variance_q")
    )


DIMENSION_VARIANCE_ORACLE = f"""
WITH {_COMP_SQL},
mom AS (
  SELECT pos, COUNT(*) AS n, SUM(q) AS s1, SUM(q * q) AS s2
  FROM comp GROUP BY 1
)
SELECT pos,
       round(CAST(s1 AS DOUBLE) / CAST(n AS DOUBLE), 9) AS mean_q,
       round(CAST(n * s2 - s1 * s1 AS DOUBLE)
             / CAST(n * n AS DOUBLE), 9) AS variance_q
FROM mom
ORDER BY (n * s2 - s1 * s1) DESC, pos ASC
LIMIT 20
"""


QUERIES = {
    "label_silhouette_proxy": label_silhouette_proxy,
    "embedding_norm_percentiles_by_label": embedding_norm_percentiles_by_label,
    "dimension_variance_topk": dimension_variance_topk,
}

ORACLES = {
    "label_silhouette_proxy": LABEL_SILHOUETTE_ORACLE,
    "embedding_norm_percentiles_by_label": NORM_PERCENTILES_ORACLE,
    "dimension_variance_topk": DIMENSION_VARIANCE_ORACLE,
}


def adjacent_vector_angle_bands(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    """Corpus-order geometry drift: the cosine between every vector
    and its successor (vec_id, vec_id+1), banded over [-1, 1] in
    eighths — adjacent-id vectors sharing ingestion context should
    skew similar, so a flat histogram flags shuffled/mismatched
    embedding batches (the ordering-sensitive sibling of
    ``label_centroid_similarity``).

    Plan: the successor pairing is declared as a component-grain
    equi-join on (vec_id+1, pos), and Catalyst pushes it BELOW the
    posexplode — the executed join pairs whole vectors on vec_id
    (d× fewer join rows) and explodes after; no broadcast HINT
    anywhere (AQE's size check picks the build side at test scale
    and shuffle-joins a 100 TB corpus — the ANN-family rule).  Dot
    and norms accumulate as exact integers over the quantized
    components, so only the final cosine is float (round 6, and the
    BAND is cut on the rounded value so the boundary decision is
    identical cross-engine)."""
    comp = _compl_for(spark, sf_dir)
    a = comp.select("vec_id", "pos", F.col("q").alias("qa"))
    b = comp.select(
        (F.col("vec_id") - 1).alias("vec_id"),
        "pos",
        F.col("q").alias("qb"),
    )
    pair = (
        a.join(b, ["vec_id", "pos"])
        .groupBy("vec_id")
        .agg(
            F.sum(F.col("qa") * F.col("qb")).alias("_dot"),
            F.sum(F.col("qa") * F.col("qa")).alias("_na2"),
            F.sum(F.col("qb") * F.col("qb")).alias("_nb2"),
        )
    )
    cos = F.round(
        F.col("_dot").cast("double")
        / (
            F.sqrt(F.col("_na2").cast("double"))
            * F.sqrt(F.col("_nb2").cast("double"))
        ),
        6,
    )
    band = F.least(F.floor((cos + 1.0) * 4.0).cast("int"), F.lit(7))
    scored = pair.select(
        band.alias("_band"), cos.cast("decimal(18,6)").alias("_c")
    )
    return (
        scored.groupBy(F.col("_band").alias("cos_band"))
        .agg(
            F.count(F.lit(1)).alias("n_pairs"),
            F.round(
                F.sum("_c").cast("double") / F.count(F.lit(1)).cast("double"),
                6,
            ).alias("avg_cos"),
        )
        .orderBy("cos_band")
    )


ADJACENT_ANGLE_ORACLE = f"""
WITH {_COMP_SQL},
pair AS (
  SELECT a.vec_id,
         SUM(a.q * b.q) AS _dot,
         SUM(a.q * a.q) AS _na2,
         SUM(b.q * b.q) AS _nb2
  FROM comp a JOIN comp b
    ON b.vec_id = a.vec_id + 1 AND b.pos = a.pos
  GROUP BY 1
),
scored AS (
  SELECT least(CAST(floor((round(CAST(_dot AS DOUBLE)
                   / (sqrt(CAST(_na2 AS DOUBLE)) * sqrt(CAST(_nb2 AS DOUBLE))),
                   6) + 1.0) * 4.0) AS INT), 7) AS cos_band,
         CAST(round(CAST(_dot AS DOUBLE)
              / (sqrt(CAST(_na2 AS DOUBLE)) * sqrt(CAST(_nb2 AS DOUBLE))), 6)
              AS DECIMAL(18,6)) AS _c
  FROM pair
)
SELECT cos_band,
       CAST(COUNT(*) AS BIGINT) AS n_pairs,
       round(CAST(SUM(_c) AS DOUBLE) / CAST(COUNT(*) AS DOUBLE), 6)
         AS avg_cos
FROM scored
GROUP BY cos_band
ORDER BY cos_band
"""


QUERIES["adjacent_vector_angle_bands"] = adjacent_vector_angle_bands
ORACLES["adjacent_vector_angle_bands"] = ADJACENT_ANGLE_ORACLE


def doc_length_norm_correlation(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    """Cross-modal embedding QA: Pearson correlation between document
    length (``n_chars``) and embedding norm², per language — a
    normalized encoder should show near-zero correlation; a strong
    positive one means raw pooled sums leaked through and cosine
    thresholds will be length-biased (the cross-table sibling of
    ``embedding_norm_audit``; first query to join the documents and
    embeddings tables at row grain outside hybrid retrieval,
    reference README.md:27-31 — corpus QA the warehouse would run).

    Plan: the corpus posexplodes ONCE into the shared quantized-norm
    kernel (vec_id-grain exact integer norm²), one id-grain equi-join
    to documents (vec_id = doc_id, both id-partitioned — never a
    corpus broadcast), then ONE |langs| aggregate of exact DECIMAL
    cross-moments (norm² ~1e9 would overflow BIGINT squares; operands
    DECIMAL(18,0) keep every product exact in both engines); Pearson
    r assembles row-local, round 9."""
    docs = load_table(spark, sf_dir, "documents")
    norms = _norms_for(spark, sf_dir)
    j = norms.join(
        docs.select(
            F.col("doc_id").alias("vec_id"), "lang", "n_chars"
        ),
        "vec_id",
    )
    x = F.col("n_chars").cast("decimal(18,0)")
    y = F.col("norm2").cast("decimal(18,0)")
    m = j.groupBy("lang").agg(
        F.count(F.lit(1)).alias("n_docs"),
        F.sum(x).alias("_sx"),
        F.sum(y).alias("_sy"),
        F.sum(x * y).alias("_sxy"),
        F.sum(x * x).alias("_sxx"),
        F.sum(y * y).alias("_syy"),
    )
    n = F.col("n_docs").cast("double")
    sx, sy = F.col("_sx").cast("double"), F.col("_sy").cast("double")
    sxy = F.col("_sxy").cast("double")
    sxx, syy = F.col("_sxx").cast("double"), F.col("_syy").cast("double")
    r = (n * sxy - sx * sy) / (
        F.sqrt(n * sxx - sx * sx) * F.sqrt(n * syy - sy * sy)
    )
    return m.select(
        "lang",
        "n_docs",
        F.round(r, 9).alias("length_norm_corr"),
    ).orderBy("lang")


LENGTH_NORM_CORR_ORACLE = """
WITH comp AS (
  SELECT vec_id,
         CAST(round(CAST(embedding[CAST(i AS INT)+1] AS DOUBLE) * 10000, 0)
              AS BIGINT) AS q
  FROM embeddings, LATERAL unnest(range(0, len(embedding))) t(i)
),
norms AS (SELECT vec_id, SUM(q*q) AS norm2 FROM comp GROUP BY 1),
j AS (
  SELECT d.lang,
         CAST(d.n_chars AS DECIMAL(18,0)) AS x,
         CAST(n.norm2 AS DECIMAL(18,0)) AS y
  FROM norms n JOIN documents d ON n.vec_id = d.doc_id
),
m AS (
  SELECT lang, COUNT(*) AS n,
         SUM(x) AS sx, SUM(y) AS sy, SUM(x * y) AS sxy,
         SUM(x * x) AS sxx, SUM(y * y) AS syy
  FROM j GROUP BY 1
)
SELECT lang,
       CAST(n AS BIGINT) AS n_docs,
       round((CAST(n AS DOUBLE) * CAST(sxy AS DOUBLE)
              - CAST(sx AS DOUBLE) * CAST(sy AS DOUBLE))
             / (sqrt(CAST(n AS DOUBLE) * CAST(sxx AS DOUBLE)
                     - CAST(sx AS DOUBLE) * CAST(sx AS DOUBLE))
                * sqrt(CAST(n AS DOUBLE) * CAST(syy AS DOUBLE)
                       - CAST(sy AS DOUBLE) * CAST(sy AS DOUBLE))), 9)
         AS length_norm_corr
FROM m
ORDER BY lang
"""


QUERIES["doc_length_norm_correlation"] = doc_length_norm_correlation
ORACLES["doc_length_norm_correlation"] = LENGTH_NORM_CORR_ORACLE
