"""Round-13 memo infrastructure: footer-metadata row counts
(tables.table_rowcount), the bounded LRU on the IVF/PQ fit memo, and
the shared corpus shingle memo."""

import sys

sys.path.insert(0, "/root/repo")

from rakam_api_spark.llm import similarity as sim
from rakam_api_spark.tables import _ROWCOUNT_MEMO, table_rowcount

SF = "/root/testdata/sf0.001"


def test_table_rowcount_reads_footer_without_session(spark):
    _ROWCOUNT_MEMO.clear()
    # spark=None proves no Spark job is needed on the local-file path
    n = table_rowcount(None, SF, "customer")
    assert n > 0
    # memo hit: same value, still no session required
    assert table_rowcount(None, SF, "customer") == n
    # matches the real count
    assert n == spark.read.parquet(f"{SF}/customer.parquet").count()


def test_fit_memo_lru_bounds_and_refreshes():
    per = {}
    class _Frame:
        def __init__(self):
            self.unpersisted = False
        def unpersist(self):
            self.unpersisted = True

    frames = {}
    for i in range(sim._FIT_MEMO_MAX + 2):
        frames[i] = (_Frame(),)
        sim._memo_put(per, ("k", i), frames[i])
    assert len(per) == sim._FIT_MEMO_MAX
    # the two oldest were evicted AND unpersisted
    assert frames[0][0].unpersisted and frames[1][0].unpersisted
    assert not frames[2][0].unpersisted
    # a hit refreshes recency: key 2 survives the next insert, key 3
    # (now oldest) is evicted instead
    assert sim._memo_get(per, ("k", 2)) is frames[2]
    sim._memo_put(per, ("k", 99), (_Frame(),))
    assert ("k", 2) in per and ("k", 3) not in per
    assert frames[3][0].unpersisted


def test_corpus_shingle_memo_returns_same_frame(spark):
    from rakam_api_spark.llm.dedup import _SHINGLE_MEMO, _corpus_shingles

    _SHINGLE_MEMO.pop(spark, None)
    a = _corpus_shingles(spark, SF)
    b = _corpus_shingles(spark, SF)
    assert a is b


def test_embedding_artifact_memos_identity_and_values(spark):
    """r17 batch 10: the shared embedding-family artifacts are
    memoized per (session, sf_dir) AND value-identical to the inline
    derivations they replaced."""
    from pyspark.sql import functions as F

    from rakam_api_spark.tables import load_table

    sim._FIT_MEMO.pop(spark, None)
    # memo identity: second call returns the same frame object
    compl = sim._compl_for(spark, SF)
    assert sim._compl_for(spark, SF) is compl
    norms = sim._norms_for(spark, SF)
    assert sim._norms_for(spark, SF) is norms
    cents = sim._label_cents_for(spark, SF)
    assert sim._label_cents_for(spark, SF) is cents
    members = sim._ivf_members_for(spark, SF)
    assert sim._ivf_members_for(spark, SF) is members

    # value identity vs the raw per-call derivations
    emb = load_table(spark, SF, "embeddings")
    raw = sim._quantized_components_labeled(emb)
    assert compl.exceptAll(raw).count() == 0 and raw.exceptAll(compl).count() == 0
    raw_norms = sim._norms(raw.drop("label"), "vec_id")
    assert norms.exceptAll(raw_norms).count() == 0
    raw_cents = raw.groupBy("label", "pos").agg(
        F.floor(F.avg("q")).cast("long").alias("cq")
    )
    assert cents.exceptAll(raw_cents).count() == 0

    # members == comp joined to the memoized fit's assignment
    comp, _c, assign = sim._ivf_fit_for(spark, SF)
    raw_members = comp.join(assign, "vec_id")
    assert members.exceptAll(raw_members).count() == 0
    assert members.count() == raw.count()  # one row per component
