"""Scale-path operators: salted aggregation must equal the direct plan;
approx distinct must be within its error bound of exact."""

import pyspark.sql.functions as F

from big_data_recommendation_system_spark.operators.skew import (
    approx_distinct_daily,
    user_engagement_salted,
)
from big_data_recommendation_system_spark.operators.similarity import (
    ann_cosine_topk,
    cosine_topk_fast,
)
from big_data_recommendation_system_spark.plans.silver import silver_events
from big_data_recommendation_system_spark.sources.tables import load_table


def test_salted_agg_equals_direct(spark, sf_dir):
    salted = {r.user_id: r for r in user_engagement_salted(spark, sf_dir).collect()}
    direct = {
        r.user_id: r
        for r in silver_events(spark, sf_dir)
        .groupBy("user_id")
        .agg(
            F.count(F.lit(1)).alias("total_events"),
            F.sum("event_weight").alias("total_engagement"),
            F.sum(F.col("value").cast("decimal(38,6)")).cast("double").alias(
                "total_value"
            ),
        )
        .collect()
    }
    assert salted.keys() == direct.keys()
    for uid, row in direct.items():
        s = salted[uid]
        assert s.total_events == row.total_events
        assert s.total_engagement == row.total_engagement
        assert s.total_value == row.total_value  # decimal partials → exact


def test_salted_join_equals_plain_join(spark, sf_dir):
    """salted_join must be row-identical to the plain join for every
    supported `how`, and refuse the modes the dim-side replication would
    corrupt (right/full duplicate unmatched small rows n_salts times)."""
    import pytest

    from big_data_recommendation_system_spark.operators.skew import salted_join

    silver = silver_events(spark, sf_dir)
    fact = silver.select("user_id", "event_id", "event_type").limit(2000)
    # dim missing some keys so left-join null paths and anti/semi are
    # exercised: keep only even user_ids
    dim = (
        silver.groupBy("user_id")
        .agg(F.min("event_date").alias("first_seen"))
        .filter(F.col("user_id") % 2 == 0)
    )
    for how in ("inner", "left", "left_semi", "left_anti"):
        got = sorted(
            map(tuple, salted_join(fact, dim, ["user_id"], ["event_id"], how=how).collect())
        )
        want = sorted(map(tuple, fact.join(dim, ["user_id"], how).collect()))
        assert got == want, how
    with pytest.raises(ValueError, match="unsupported"):
        salted_join(fact, dim, ["user_id"], ["event_id"], how="full")


def test_approx_distinct_within_bound(spark, sf_dir):
    rows = approx_distinct_daily(spark, sf_dir).collect()
    # the query's own certificate columns must hold and agree with an
    # independently computed exact count
    for r in rows:
        assert r.rel_err_within_5pct, r
        assert abs(r.approx_daily_active_users - r.exact_daily_active_users) <= max(
            3, 0.05 * r.exact_daily_active_users
        ), r
    approx = {str(r.event_date): r.approx_daily_active_users for r in rows}
    exact_in_row = {
        str(r.event_date): r.exact_daily_active_users for r in rows
    }
    exact = {
        str(r.event_date): r.dau
        for r in silver_events(spark, sf_dir)
        .groupBy("event_date")
        .agg(F.countDistinct("user_id").alias("dau"))
        .collect()
    }
    assert approx.keys() == exact.keys()
    assert exact_in_row == exact  # query's exact column == independent exact
    for day, e in exact.items():
        assert abs(approx[day] - e) <= max(3, 0.05 * e), (day, approx[day], e)


def test_fast_cosine_matches_exact(spark, sf_dir):
    """Array-native fast path must agree with the decimal-exact oracle
    path on neighbor sets (scores can differ in final ulps)."""
    emb = load_table(spark, sf_dir, "embeddings")
    queries = emb.filter(F.col("vec_id") < 10)
    fast = {
        (r.query_id, r.rank): r.neighbor_id
        for r in cosine_topk_fast(emb, queries).collect()
    }
    exact = {
        (r.query_id, r.rank): r.neighbor_id
        for r in ann_cosine_topk(spark, sf_dir).collect()
    }
    agree = sum(1 for k, v in exact.items() if fast.get(k) == v)
    assert agree >= 0.95 * len(exact)  # ulp-level ties may swap adjacent ranks


def test_embedding_near_dup_subset_of_bruteforce(spark, sf_dir):
    """Cell-blocked near-dup pairs must be a SUBSET of the brute-force
    cosine>=tau pairs with identical scores (no false positives; missed
    cross-cell pairs are the documented recall trade-off), and non-empty
    at this sf."""
    from big_data_recommendation_system_spark.operators.similarity import (
        NEAR_DUP_TAU,
        _dims,
        _norms,
        embedding_near_dup_pairs,
    )

    got = {
        (r.vec_a, r.vec_b): r.cosine
        for r in embedding_near_dup_pairs(spark, sf_dir).collect()
    }
    assert got, "expected some near-dup pairs at this sf"

    emb = load_table(spark, sf_dir, "embeddings")
    a, b = _dims(emb, "vec_a"), _dims(emb, "vec_b")
    dots = (
        a.join(b, "pos")
        .filter(F.col("vec_a") < F.col("vec_b"))
        .groupBy("vec_a", "vec_b")
        .agg(
            F.sum((a.x * b.x).cast("decimal(38,12)")).cast("double").alias("dot")
        )
    )
    nrm = _norms(emb, "nid", "nrm")
    brute = {
        (r.vec_a, r.vec_b): r.cosine
        for r in dots.join(
            nrm.withColumnRenamed("nid", "vec_a").withColumnRenamed("nrm", "na"),
            "vec_a",
        )
        .join(
            nrm.withColumnRenamed("nid", "vec_b").withColumnRenamed("nrm", "nb"),
            "vec_b",
        )
        .withColumn("cosine", F.col("dot") / (F.col("na") * F.col("nb")))
        .filter(F.col("cosine") >= NEAR_DUP_TAU)
        .collect()
    }
    assert set(got) <= set(brute)
    for k, v in got.items():
        assert abs(v - brute[k]) < 1e-12


def test_cap_baskets_drops_power_user(spark):
    """The co-occurrence skew guard must exclude a power user's basket
    entirely (and leave normal baskets untouched) before the self-join."""
    from big_data_recommendation_system_spark.ml.recommend import cap_baskets

    rows = [("power", i) for i in range(300)] + [("normal", i) for i in range(5)]
    ui = spark.createDataFrame(rows, ["user_id", "item_id"])
    kept = cap_baskets(ui, max_basket=200).collect()
    users = {r.user_id for r in kept}
    assert users == {"normal"}
    assert len(kept) == 5


def test_mllib_minhash_recall_vs_exact(spark, sf_dir):
    """MLlib MinHashLSH path (no oracle possible — internal seeds) must
    recover the exact-jaccard pairs with high recall after verification."""
    from big_data_recommendation_system_spark.ml.similarity import mllib_minhash_pairs
    from big_data_recommendation_system_spark.operators.text_dedup import (
        ngram_jaccard_pairs,
    )

    got = {(r.doc_a, r.doc_b) for r in mllib_minhash_pairs(spark, sf_dir).collect()}
    truth = {(r.doc_a, r.doc_b) for r in ngram_jaccard_pairs(spark, sf_dir).collect()}
    assert truth, "baseline should find pairs"
    recall = len(got & truth) / len(truth)
    assert recall >= 0.9, (recall, len(got), len(truth))
    # verification guarantees no false positives above threshold
    assert got <= truth, got - truth
    # the driver-visible agreement row must say exactly what the sets say
    from big_data_recommendation_system_spark.ml.similarity import (
        mllib_minhash_agreement,
    )

    row = mllib_minhash_agreement(spark, sf_dir).collect()[0]
    assert row.n_exact_pairs == len(truth)
    assert row.recall_ge_90pct == int(10 * len(got & truth) >= 9 * len(truth))
    assert row.verified_subset == int(got <= truth) == 1


def test_approx_percentiles_certified(spark, sf_dir):
    """Every rank certificate must hold, and the approx medians must sit
    close to the exact hash-verified percentiles (rank error 1% of the
    group translates to a small value gap on this distribution)."""
    from big_data_recommendation_system_spark.plans.profiling import (
        approx_percentiles_by_type,
        value_percentiles_by_type,
    )

    rows = {r.event_type: r for r in approx_percentiles_by_type(spark, sf_dir).collect()}
    exact = {r.event_type: r for r in value_percentiles_by_type(spark, sf_dir).collect()}
    assert rows.keys() == exact.keys() and rows
    for et, r in rows.items():
        assert r.p25_rank_ok and r.p50_rank_ok and r.p90_rank_ok, r
        e = exact[et]
        # value-space sanity: within 5% relative of the exact quantile
        for a, b in ((r.p25_approx, e.p25), (r.p50_approx, e.p50), (r.p90_approx, e.p90)):
            assert abs(a - b) <= 0.05 * max(abs(b), 1.0), (et, a, b)


def test_r10_ops_partitioning_invariant(spark, sf_dir):
    """Partitioning-independence for the round-10 operators whose shapes
    involve rank/window/island machinery: identical results under a
    deliberately awkward shuffle-partition count (7) vs the default.
    This is the classic distributed failure mode — per-partition logic
    leaking into results — and the property the 1000-executor story
    rests on."""
    from big_data_recommendation_system_spark.registry import QUERIES

    names = [
        "dup_span_removal_plan",
        "incremental_dup_spans",
        "ccnet_perplexity_buckets",
        "winnowing_fingerprints",
        "pca_invariants",
    ]
    prev = spark.conf.get("spark.sql.shuffle.partitions")
    try:
        baseline = {}
        for n in names:
            spark.conf.set("spark.sql.shuffle.partitions", prev)
            baseline[n] = sorted(map(tuple, QUERIES[n](spark, sf_dir).collect()))
        spark.catalog.clearCache()  # drop substrates so they rebuild at 7
        spark.conf.set("spark.sql.shuffle.partitions", "7")
        for n in names:
            got = sorted(map(tuple, QUERIES[n](spark, sf_dir).collect()))
            assert got == baseline[n], n
    finally:
        spark.conf.set("spark.sql.shuffle.partitions", prev)
        spark.catalog.clearCache()


def test_r11_ops_partitioning_invariant(spark, sf_dir):
    """Same property as the r10 twin above, for the round-11 operators:
    the fixed-point log/exp level lookups, the global ranker behind the
    log-weight ranking, the multi-n island merge, the asymmetric
    in-cell SemDeDup join and the agreement aggregates must all return
    identical rows under a deliberately awkward shuffle-partition count
    (7) vs the default, with substrates rebuilt at the perturbed
    parallelism."""
    from big_data_recommendation_system_spark.registry import QUERIES

    names = [
        "dsir_log_weights",
        "doremi_domain_weights",
        "dup_span_calibration",
        "semdedup_incremental",
        "mllib_minhash_agreement",
        "unimax_mixture_plan",
    ]
    prev = spark.conf.get("spark.sql.shuffle.partitions")
    try:
        baseline = {}
        for n in names:
            spark.conf.set("spark.sql.shuffle.partitions", prev)
            baseline[n] = sorted(map(tuple, QUERIES[n](spark, sf_dir).collect()))
        spark.catalog.clearCache()  # drop substrates so they rebuild at 7
        spark.conf.set("spark.sql.shuffle.partitions", "7")
        for n in names:
            got = sorted(map(tuple, QUERIES[n](spark, sf_dir).collect()))
            assert got == baseline[n], n
    finally:
        spark.conf.set("spark.sql.shuffle.partitions", prev)
        spark.catalog.clearCache()


def test_r12_ops_partitioning_invariant(spark, sf_dir):
    """Same property as the r10/r11 twins, for the round-12 sampler
    operators: the decimal budget-share rate derivation, the salted
    bucket gate, and the range-repartitioned per-source prefix walk must
    return identical rows under a deliberately awkward shuffle-partition
    count (7) vs the default, with substrates rebuilt at the perturbed
    parallelism."""
    from big_data_recommendation_system_spark.registry import QUERIES

    names = [
        "doremi_mixture_sample",
        "unimax_budget_draw",
        "bounded_cc_certificate",
        "winnowing_dup_pairs",
        "incremental_winnow_matches",
    ]
    prev = spark.conf.get("spark.sql.shuffle.partitions")
    try:
        baseline = {}
        for n in names:
            spark.conf.set("spark.sql.shuffle.partitions", prev)
            baseline[n] = sorted(map(tuple, QUERIES[n](spark, sf_dir).collect()))
        spark.catalog.clearCache()  # drop substrates so they rebuild at 7
        spark.conf.set("spark.sql.shuffle.partitions", "7")
        for n in names:
            got = sorted(map(tuple, QUERIES[n](spark, sf_dir).collect()))
            assert got == baseline[n], n
    finally:
        spark.conf.set("spark.sql.shuffle.partitions", prev)
        spark.catalog.clearCache()
