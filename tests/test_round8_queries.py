"""Invariant tests for the round-8 query additions beyond the oracle
hash gate: properties the DuckDB comparison can't state (zero-leak
guarantees, probability-mass closure, LM discrimination, market-basket
bounds)."""

import sys

sys.path.insert(0, "/root/repo")

from pyspark.sql import functions as F

from rakam_api_spark.analytics import events as events_mod
from rakam_api_spark.analytics import relational2
from rakam_api_spark.llm import curation, similarity, text
from rakam_api_spark.tables import load_table

SF = "/root/testdata/sf0.001"


def test_cluster_safe_splits_zero_leak_and_conservation(spark):
    rows = curation.cluster_safe_splits(spark, SF).collect()
    by_strategy = {}
    for r in rows:
        by_strategy.setdefault(r["strategy"], []).append(r)
    assert set(by_strategy) == {"doc_hash", "cluster_hash"}
    n_docs = load_table(spark, SF, "documents").count()
    for strategy, srows in by_strategy.items():
        # every doc lands in exactly one split under each strategy
        assert sum(r["n_docs"] for r in srows) == n_docs
        leak = srows[0]["leaky_pairs"]
        assert all(r["leaky_pairs"] == leak for r in srows)
    # the guarantee the operator exists for: cluster-keyed assignment
    # can never put a near-dup pair across a split boundary
    assert by_strategy["cluster_hash"][0]["leaky_pairs"] == 0


def test_lm_bigram_quality_discriminates_reference_language(spark):
    rows = text.lm_bigram_quality(spark, SF).collect()
    assert len(rows) > 0
    en = [r for r in rows if r["lang"] == "en"]
    other = [r for r in rows if r["lang"] != "en"]
    assert en and other
    mean_en = sum(r["avg_logp"] for r in en) / len(en)
    mean_other = sum(r["avg_logp"] for r in other) / len(other)
    # the LM is trained on the English slice: English docs must score
    # strictly higher on average, with lower OOV mass
    assert mean_en > mean_other
    oov_en = sum(r["oov_bigram_frac"] for r in en) / len(en)
    oov_other = sum(r["oov_bigram_frac"] for r in other) / len(other)
    assert oov_en < oov_other
    for r in rows:
        assert 0.0 <= r["oov_bigram_frac"] <= 1.0
        assert r["avg_logp"] < 0.0


def test_event_transition_probability_mass_closes(spark):
    rows = events_mod.event_transition_probs(spark, SF).collect()
    assert rows
    mass = {}
    for r in rows:
        assert r["n_transitions"] > 0
        assert 0.0 < r["p_transition"] <= 1.0
        mass[r["curr_event"]] = mass.get(r["curr_event"], 0.0) + r["p_transition"]
    for curr, total in mass.items():
        assert abs(total - 1.0) < 1e-9, (curr, total)


def test_rfm_quartiles_cover_all_customers(spark):
    rows = relational2.rfm_quartiles(spark, SF).collect()
    n_cust = (
        load_table(spark, SF, "orders").select("o_custkey").distinct().count()
    )
    assert sum(r["n_customers"] for r in rows) == n_cust
    for r in rows:
        for q in ("r_q", "f_q", "m_q"):
            assert 1 <= r[q] <= 4
        assert r["total_monetary"] > 0


def test_copurchase_bounds(spark):
    rows = relational2.part_copurchase_pairs(spark, SF).collect()
    assert len(rows) == 20
    for r in rows:
        assert r["p1"] < r["p2"]
        assert r["c12"] <= min(r["c1"], r["c2"])
        assert 0.0 < r["support"] <= 1.0
        assert r["lift"] > 0.0
    # ranked by co-occurrence count
    counts = [r["c12"] for r in rows]
    assert counts == sorted(counts, reverse=True)


def test_embedding_drift_bounds_and_coverage(spark):
    rows = similarity.embedding_drift_by_label(spark, SF).collect()
    emb = load_table(spark, SF, "embeddings")
    n_labels = emb.select("label").distinct().count()
    assert len(rows) == n_labels
    for r in rows:
        assert -1.0 <= r["drift_cosine"] <= 1.0
        assert r["n_ref"] > 0 and r["n_cur"] > 0
    # the synthetic labels are not geometric clusters, so |drift| ~ 0
    # is the expected signal here; what matters is that the monitor is
    # exactly reproducible (quantized integer sums + rounded cosine)
    again = similarity.embedding_drift_by_label(spark, SF).collect()
    assert [(r["label"], r["drift_cosine"]) for r in rows] == [
        (r["label"], r["drift_cosine"]) for r in again
    ]


def test_customer_migration_conserves_customers(spark):
    rows = relational2.customer_migration_matrix(spark, SF).collect()
    n_cust = (
        load_table(spark, SF, "orders").select("o_custkey").distinct().count()
    )
    assert sum(r["n_customers"] for r in rows) == n_cust
    assert abs(sum(r["share"] for r in rows) - 1.0) < 1e-9
    for r in rows:
        assert 0 <= r["tier_p1"] <= 4 and 0 <= r["tier_p2"] <= 4
        # tier 0 rows are the new/churned cells: absent from one period
        if r["tier_p1"] == 0:
            assert r["tier_p2"] >= 1


def test_dedup_threshold_curve_is_monotone(spark):
    from rakam_api_spark.llm import dedup

    rows = sorted(
        dedup.dedup_threshold_curve(spark, SF).collect(),
        key=lambda r: r["threshold"],
    )
    assert rows
    pair_counts = [r["n_pairs"] for r in rows]
    assert pair_counts == sorted(pair_counts, reverse=True)
    means = [r["mean_jaccard"] for r in rows]
    assert means == sorted(means)  # surviving pairs only get more similar


def test_session_gap_curve_monotone(spark):
    rows = sorted(
        events_mod.session_gap_curve(spark, SF).collect(),
        key=lambda r: r["gap_minutes"],
    )
    assert [r["gap_minutes"] for r in rows] == [5, 15, 30, 60]
    sessions = [r["n_sessions"] for r in rows]
    # a longer inactivity gap can only merge sessions, never split them
    assert sessions == sorted(sessions, reverse=True)
    n_users = (
        load_table(spark, SF, "events").select("user_id").distinct().count()
    )
    assert all(s >= n_users for s in sessions)
    eps = [r["events_per_session"] for r in rows]
    assert eps == sorted(eps)


def test_session_gap_curve_matches_real_sessionization(spark):
    """Cross-validation: the curve's closed form (#sessions(g) =
    #active users + #(deltas > g)) must equal what the actual
    sessionizer produces at every grid gap."""
    curve = {
        r["gap_minutes"]: r["n_sessions"]
        for r in events_mod.session_gap_curve(spark, SF).collect()
    }
    ev = load_table(spark, SF, "events")
    for gap_min, expected in curve.items():
        sess = events_mod.sessionize(ev, gap_seconds=gap_min * 60)
        actual = sess.select("user_id", "session_id").distinct().count()
        assert actual == expected, (gap_min, actual, expected)


def test_unordered_funnel_bounds(spark):
    row = events_mod.unordered_funnel_completion(spark, SF).collect()[0]
    assert row["n_completed_7d"] <= row["n_all_steps"] <= row["n_any_step"] <= row["n_users"]
    assert 0.0 <= row["completion_rate"] <= 1.0


def test_knn_label_propagation_contract(spark):
    rows = similarity.knn_label_propagation(spark, SF).collect()
    assert len(rows) == 20  # one prediction per query vector
    emb = load_table(spark, SF, "embeddings")
    truth = {
        r["vec_id"]: r["label"]
        for r in emb.where(F.col("vec_id") < 20).collect()
    }
    labels = {r["label"] for r in emb.collect()}
    for r in rows:
        assert r["q_id"] in truth
        assert r["true_label"] == truth[r["q_id"]]
        assert r["predicted_label"] in labels
        assert 1 <= r["votes"] <= 5
        assert r["correct"] == (r["predicted_label"] == r["true_label"])
