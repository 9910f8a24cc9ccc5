"""Semantic pins for the model-based curation family
(plans/quality_models.py) — the oracle gate proves Spark/DuckDB parity;
these tests pin the SEMANTICS both engines implement: NB vote algebra,
LM branch selection (hit / backoff / OOV, including branches the real
corpus never exercises), DSIR's target preference and sample size, and
the hash-bucket primitive's cross-engine parity."""

from __future__ import annotations

import hashlib
import math

import duckdb

from big_data_recommendation_system_spark.plans import quality_models as qm


def _py_split_bucket(doc_id: int) -> int:
    """Pure-Python twin of corpus_prep.split_bucket (md5 of the decimal
    string, first 4 hex digits, mod 100)."""
    return int(hashlib.md5(str(doc_id).encode()).hexdigest()[:4], 16) % 100


def test_hash_bucket_parity_and_range(spark):
    from pyspark.sql import functions as F

    from big_data_recommendation_system_spark.functions.text import (
        hash_bucket,
        hash_bucket_sql,
    )

    feats = [f"tok{i}" for i in range(100)] + ["hello world", "", "ümläut"]
    df = spark.createDataFrame([(f,) for f in feats], "feat string")
    got = {
        r["feat"]: r["b"]
        for r in df.select(
            "feat", hash_bucket(F.col("feat"), qm.DSIR_BUCKETS).alias("b")
        ).collect()
    }
    lst = ", ".join("'" + f.replace("'", "''") + "'" for f in feats)
    oracle = dict(
        duckdb.connect()
        .execute(
            f"SELECT feat, {hash_bucket_sql('feat', qm.DSIR_BUCKETS)} "
            f"FROM (SELECT unnest([{lst}]) AS feat)"
        )
        .fetchall()
    )
    assert got == oracle
    assert all(0 <= b < qm.DSIR_BUCKETS for b in got.values())


def test_nb_model_vote_algebra(spark, sf_dir_small):
    """vote/odds/disc must equal the Laplace-smoothed odds comparison
    recomputed in Python from the emitted class counts and the train
    totals."""
    model = qm.nb_model_table(spark, sf_dir_small).toPandas()
    tot_hi, tot_lo, vocab_n = (
        int(model.cnt_hi.sum()),
        int(model.cnt_lo.sum()),
        len(model),
    )
    for row in model.sample(n=min(200, len(model)), random_state=7).itertuples():
        hi_mass = float(row.cnt_hi + 1) * float(tot_lo + vocab_n)
        lo_mass = float(row.cnt_lo + 1) * float(tot_hi + vocab_n)
        assert row.vote == (1 if hi_mass > lo_mass else -1 if hi_mass < lo_mass else 0)
        assert row.odds == hi_mass / lo_mass
        assert row.disc == (
            hi_mass / lo_mass if hi_mass >= lo_mass else lo_mass / hi_mass
        )


def test_nb_scores_manual_recompute(spark, sf_dir_small):
    """vote_sum / n_scored / n_oov recomputed from the model and the raw
    token streams for a handful of documents."""
    model = qm.nb_model_table(spark, sf_dir_small).toPandas()
    votes = dict(zip(model.token, model.vote))
    lab = (
        qm.labeled_docs_table(spark, sf_dir_small)
        .select("doc_id", "tok", "seed_hi")
        .limit(5)
        .collect()
    )
    scores = {
        r["doc_id"]: r
        for r in qm.nb_classifier_scores(spark, sf_dir_small)
        .filter(f"doc_id IN ({','.join(str(r['doc_id']) for r in lab)})")
        .collect()
    }
    for r in lab:
        exp_sum = sum(votes.get(t, 0) for t in r["tok"])
        exp_oov = sum(1 for t in r["tok"] if t not in votes)
        got = scores[r["doc_id"]]
        assert got["vote_sum"] == exp_sum
        assert got["n_oov"] == exp_oov
        assert got["n_scored"] == len(r["tok"]) - exp_oov
        assert got["predicted_hi"] == (exp_sum > 0)
        assert got["is_correct"] == ((exp_sum > 0) == r["seed_hi"])


def test_nb_eval_is_a_partition_of_the_corpus(spark, sf_dir_small):
    ev = qm.nb_classifier_eval(spark, sf_dir_small).toPandas()
    n_docs = qm.labeled_docs_table(spark, sf_dir_small).count()
    assert int(ev.n_docs.sum()) == n_docs
    for _, grp in ev.groupby("is_train"):
        assert math.isclose(grp.share_of_split.sum(), 1.0, rel_tol=1e-12)


def test_lm_train_docs_fully_hit(spark, sf_dir_small):
    """Every bigram of every TRAIN document is, by construction, in the
    trained bigram table — so train docs must score 100% on the hit
    branch with zero backoff/OOV, and every mean probability must be a
    valid probability."""
    lm = qm.ngram_lm_scores(spark, sf_dir_small).toPandas()
    tr = lm[lm.is_train]
    assert len(tr) > 0 and len(lm) > len(tr)
    assert (tr.n_bigram_hits == tr.n_bigrams).all()
    assert (tr.n_unigram_backoff == 0).all() and (tr.n_oov == 0).all()
    assert (lm.n_bigrams == lm.n_bigram_hits + lm.n_unigram_backoff + lm.n_oov).all()
    scored = lm[lm.n_bigrams > 0]
    assert ((scored.mean_bigram_prob > 0) | (scored.n_oov == scored.n_bigrams)).all()
    assert (scored.mean_bigram_prob <= 1.0).all()


def test_lm_backoff_and_oov_branches(spark, tmp_path):
    """Constructed corpus exercising the branches the synthetic corpus
    never hits: a held-out doc with an unseen-bigram-of-seen-unigrams
    (backoff) and an unseen token (OOV). Scores recomputed exactly,
    including the fixed-point floor arithmetic."""
    train_ids = [i for i in range(100) if _py_split_bucket(i) < 80]
    test_id = next(i for i in range(100) if _py_split_bucket(i) >= 80)
    rows = [
        (train_ids[0], "alpha beta gamma", "en", "s0", 16),
        (train_ids[1], "gamma delta alpha beta", "en", "s0", 22),
        # held-out: "beta gamma" IS a train bigram (hit); "gamma zebra"
        # has an unseen w2 (OOV); "zebra delta" backs off to c1(delta)
        (test_id, "beta gamma zebra delta", "en", "s0", 22),
    ]
    spark.createDataFrame(
        rows, ["doc_id", "text", "lang", "source", "n_chars"]
    ).write.parquet(str(tmp_path / "documents.parquet"))
    out = {
        r["doc_id"]: r
        for r in qm.ngram_lm_scores(spark, str(tmp_path)).collect()
    }
    held = out[test_id]
    assert held["n_bigrams"] == 3
    assert held["n_bigram_hits"] == 1
    assert held["n_oov"] == 1
    assert held["n_unigram_backoff"] == 1
    # exact fixed-point recompute: c2("beta gamma")=1, c1("beta")=2;
    # backoff: c1("delta")=1, N=7 train tokens; OOV contributes 0
    hit_fp = math.floor((1.0 / 2.0) * qm.LM_FP_SCALE)
    backoff_fp = math.floor(qm.LM_ALPHA * (1.0 / 7.0) * qm.LM_FP_SCALE)
    assert held["lm_score_fp"] == hit_fp + backoff_fp
    for tid in train_ids[:2]:
        assert out[tid]["n_bigram_hits"] == out[tid]["n_bigrams"]


def test_dsir_sample_size_rank_and_target_preference(spark, sf_dir_small):
    """The sampling plan keeps exactly ceil(share · n) docs, the rank is
    a permutation of 1..n, and the importance weights actually prefer
    the target (seed-hi) distribution — the point of DSIR."""
    ds = qm.dsir_importance_sample(spark, sf_dir_small).toPandas()
    n = len(ds)
    assert sorted(ds.dsir_rank) == list(range(1, n + 1))
    assert int(ds.selected.sum()) == math.ceil(qm.DSIR_KEEP_SHARE * n)
    # selected set == the rank-prefix (no gaps)
    assert set(ds[ds.selected].dsir_rank) == set(
        range(1, math.ceil(qm.DSIR_KEEP_SHARE * n) + 1)
    )
    hi = ds[ds.seed_hi].weight_fp.mean()
    lo = ds[~ds.seed_hi].weight_fp.mean()
    assert hi > lo, f"target docs should out-weigh non-target: {hi} <= {lo}"


def test_dsir_log_level_table_accuracy_and_coverage():
    """The literal geometric level table is exhaustive over the clamp
    range (contiguous, no gaps) and its looked-up fixed-point ln is
    within the documented ±ln(2)/32 quantization of the true
    ln(ratio_fp / FP_SCALE) for ratio values across the whole range."""
    lv = qm._LOG_LEVELS
    assert lv[0][0] == 1 and lv[-1][1] > qm._LOG_CLAMP_MAX
    for (lo, hi, _), (lo2, _, _) in zip(lv, lv[1:]):
        assert hi == lo2 and lo < hi  # contiguous, increasing
    tol = math.log(2) / (2 * qm._LOG_LEVELS_PER_OCTAVE) + 1e-9
    import bisect

    los = [lo for lo, _, _ in lv]
    for rfp in [1, 2, 3, 7, 99, 1000, 10**6, 10**6 + 1, 5 * 10**8,
                10**12, qm._LOG_CLAMP_MAX]:
        i = bisect.bisect_right(los, rfp) - 1
        lo, hi, ln_fp = lv[i]
        assert lo <= rfp < hi
        true_ln = math.log(rfp / qm.DSIR_FP_SCALE)
        # midpoint of level (lo, hi) is within half a level width of
        # any member; allow one extra ulp of the fixed-pointing
        assert abs(ln_fp / qm.LOG_FP_SCALE - true_ln) <= tol + 1.0 / (
            min(lo, 10**6)  # integer boundaries are coarse below FP_SCALE
        ), (rfp, ln_fp)


def test_dsir_log_weights_paper_semantics(spark, sf_dir_small):
    """Pins WHY dsir_log_weights exists: (a) plan shape — keeps exactly
    ceil(share·n), rank is a permutation, target preference holds (same
    pins as the linear form); (b) the log ranking is the log of the
    SAME per-bucket ratios the linear form uses — per-doc recompute from
    the two broadcast tables agrees; (c) the semantic difference is
    real: a single dominant-ratio bucket outweighs many moderate buckets
    linearly but NOT logarithmically (the Xie et al. motivation)."""
    ds = qm.dsir_log_weights(spark, sf_dir_small).toPandas()
    n = len(ds)
    assert sorted(ds.dsir_log_rank) == list(range(1, n + 1))
    assert int(ds.selected.sum()) == math.ceil(qm.DSIR_KEEP_SHARE * n)
    hi = ds[ds.seed_hi].log_weight_fp.mean()
    lo = ds[~ds.seed_hi].log_weight_fp.mean()
    assert hi > lo, f"target docs should out-weigh non-target: {hi} <= {lo}"

    # (b) recompute a sample of docs from the two model tables
    ratios = qm.dsir_log_ratio_table(spark, sf_dir_small).toPandas()
    lookup = dict(zip(ratios.bucket, ratios.log_ratio_fp))
    from pyspark.sql import functions as F
    from big_data_recommendation_system_spark.functions.text import (
        hash_bucket,
        ngrams as _ng,
    )

    lab = qm.labeled_docs_table(spark, sf_dir_small)
    occ = (
        lab.select(
            "doc_id",
            F.explode(F.concat(F.col("tok"), _ng("tok", 2))).alias("feat"),
        )
        .select(
            "doc_id", hash_bucket(F.col("feat"), qm.DSIR_BUCKETS).alias("b")
        )
        .groupBy("doc_id", "b")
        .count()
        .toPandas()
    )
    want = occ.assign(w=lambda d: d["count"] * d.b.map(lookup)).groupby(
        "doc_id"
    ).w.sum()
    got = dict(zip(ds.doc_id, ds.log_weight_fp))
    sample = list(want.items())[:50]
    assert sample and all(got[d] == w for d, w in sample)

    # (c) ordering flip: doc A = 1 occurrence in a ratio-e^8 bucket;
    # doc B = 4 occurrences in ratio-e^3 buckets. Linear: A(e^8=2981)
    # beats B(4·e^3=80). Log: B(12) beats A(8).
    import math as _m

    def lvl_ln(rfp):
        import bisect

        los = [lo for lo, _, _ in qm._LOG_LEVELS]
        i = bisect.bisect_right(los, max(1, min(rfp, qm._LOG_CLAMP_MAX))) - 1
        return qm._LOG_LEVELS[i][2]

    r_hot = int(_m.e**8 * qm.DSIR_FP_SCALE)
    r_mod = int(_m.e**3 * qm.DSIR_FP_SCALE)
    lin_a, lin_b = 1 * r_hot, 4 * r_mod
    log_a, log_b = 1 * lvl_ln(r_hot), 4 * lvl_ln(r_mod)
    assert lin_a > lin_b and log_b > log_a


def test_lm_model_substrate_consistency(spark, sf_dir_small):
    """The pre-joined context count in the bigram table must equal the
    unigram table's count for the bigram's first word."""
    bi = qm.lm_bigram_table(spark, sf_dir_small).toPandas()
    uni_pd = qm.lm_unigram_table(spark, sf_dir_small).toPandas()
    uni = dict(zip(uni_pd.token, uni_pd.c1))
    sample = bi.sample(n=min(100, len(bi)), random_state=3)
    for row in sample.itertuples():
        assert uni[row.pair.split(" ")[0]] == row.c1_w1


def test_dsir_ratio_table_is_dense_over_all_buckets(spark, sf_dir_small):
    """The ratio table is DENSE: exactly one row per possible bucket
    (unseen buckets carry the Laplace default), so the frozen-model
    serving join can never drop a feature — even for a later snapshot
    whose features hash to buckets the training snapshot never saw."""
    ratios = qm.dsir_ratio_table(spark, sf_dir_small).toPandas()
    assert sorted(ratios.bucket) == list(range(qm.DSIR_BUCKETS))
    assert (ratios.ratio_fp >= 0).all()
    # every bucket any document hashes into joins a ratio row
    from pyspark.sql import functions as F
    from big_data_recommendation_system_spark.functions.text import hash_bucket
    from big_data_recommendation_system_spark.functions.text import ngrams as _ng

    lab = qm.labeled_docs_table(spark, sf_dir_small)
    seen = {
        r.bucket
        for r in lab.select(
            F.explode(F.concat(F.col("tok"), _ng("tok", 2))).alias("feat")
        )
        .select(hash_bucket(F.col("feat"), qm.DSIR_BUCKETS).alias("bucket"))
        .distinct()
        .collect()
    }
    assert seen <= set(ratios.bucket)


def test_semdedup_keeps_exactly_the_centroid_outlier(spark, sf_dir_small):
    """SemDeDup keep rule: one survivor per dup group, and it is the
    member with the LOWEST cosine to its assigned k-means centroid
    (tie-break lowest vec_id); singletons always survive."""
    from big_data_recommendation_system_spark.operators.similarity import (
        semdedup_plan,
    )

    pd = semdedup_plan(spark, sf_dir_small).toPandas()
    for cid, grp in pd.groupby("cluster_id"):
        kept = grp[grp.is_kept]
        assert len(kept) == 1, f"cluster {cid}: {len(kept)} kept"
        want = grp.sort_values(["centroid_cos", "vec_id"]).iloc[0]
        assert kept.iloc[0].vec_id == want.vec_id
    singles = pd[pd.cluster_size == 1]
    assert singles.is_kept.all()
    # the plan actually deduplicates something on this corpus
    assert (~pd.is_kept).sum() > 0


def test_model_gate_report_consistent_with_parts(spark, sf_dir_small):
    """The composed gate rollup must agree with the three serving
    queries it composes: per-source NB pass counts, DSIR pass counts,
    and the all-gates intersection recomputed from the parts."""
    gates = qm.model_gate_report(spark, sf_dir_small).toPandas().set_index("source")
    nb = qm.nb_classifier_scores(spark, sf_dir_small).toPandas()
    lm = qm.ngram_lm_scores(spark, sf_dir_small).toPandas()
    ds = qm.dsir_importance_sample(spark, sf_dir_small).toPandas()
    nb_by_src = nb[nb.predicted_hi].groupby(nb[nb.predicted_hi].source).size()
    ds_by_src = ds[ds.selected].groupby(ds[ds.selected].source).size()
    for src, row in gates.iterrows():
        assert row.n_nb_pass == nb_by_src.get(src, 0)
        assert row.n_dsir_pass == ds_by_src.get(src, 0)
    # intersection check over the joined per-doc frames
    m = nb.merge(lm, on="doc_id").merge(ds, on="doc_id")
    lm_ok = (m.n_bigrams > 0) & (
        m.lm_score_fp >= m.n_bigrams * qm.LM_GATE_MIN_FP_PER_BIGRAM
    )
    assert int((m.predicted_hi & lm_ok & m.selected).sum()) == int(
        gates.n_pass_all.sum()
    )


def test_short_docs_fail_gates_not_vanish(spark, tmp_path):
    """Review regression pin: documents too short to score (one token →
    no LM row) must stay in the model_gate_report denominator and FAIL
    the LM gate, not silently disappear through an inner join."""
    train_ids = [i for i in range(100) if _py_split_bucket(i) < 80]
    rows = [
        (train_ids[0], "alpha beta gamma", "en", "s0", 16),
        (train_ids[1], "gamma delta alpha beta", "en", "s0", 22),
        (train_ids[2], "alpha", "en", "s1", 5),  # 1 token: no bigrams
    ]
    spark.createDataFrame(
        rows, ["doc_id", "text", "lang", "source", "n_chars"]
    ).write.parquet(str(tmp_path / "documents.parquet"))
    rep = qm.model_gate_report(spark, str(tmp_path)).toPandas().set_index("source")
    assert int(rep.n_docs.sum()) == 3  # nobody vanished
    assert rep.loc["s1"].n_docs == 1
    assert rep.loc["s1"].n_lm_pass == 0  # short doc FAILS the LM gate


def test_contrastive_triplets_mining_rule(spark, sf_dir_small):
    """Triplet semantics: every positive is a near-dup pair (cos >= tau),
    every negative is the anchor's HIGHEST in-cell cosine below tau, and
    pos_cos > neg_cos for every triplet (the margin a contrastive loss
    trains against)."""
    from big_data_recommendation_system_spark.operators.similarity import (
        NEAR_DUP_TAU,
        _in_cell_cosines,
        contrastive_triplets,
    )

    t = contrastive_triplets(spark, sf_dir_small).toPandas()
    assert len(t) > 0
    assert (t.pos_cos >= NEAR_DUP_TAU).all()
    assert (t.neg_cos < NEAR_DUP_TAU).all()
    assert (t.pos_cos > t.neg_cos).all()
    # negative is the argmax sub-tau in-cell neighbor, recomputed in pandas
    allc = _in_cell_cosines(spark, sf_dir_small).toPandas()
    import pandas as pd

    neigh = pd.concat([
        allc.rename(columns={"vec_a": "src", "vec_b": "dst"}),
        allc.rename(columns={"vec_b": "src", "vec_a": "dst"}),
    ])
    sub = neigh[neigh.cosine < NEAR_DUP_TAU]
    for anchor in t.anchor_id.unique()[:20]:
        cand = sub[sub.src == anchor].sort_values(
            ["cosine", "dst"], ascending=[False, True]
        )
        got = t[t.anchor_id == anchor].iloc[0]
        assert got.negative_id == cand.iloc[0].dst
        assert got.neg_cos == cand.iloc[0].cosine


def test_ccnet_buckets_are_ordered_terciles(spark, sf_dir_small):
    """Per source: bucket sizes match SQL NTILE arithmetic (first n%3
    buckets get the extra row), head/middle/tail are ordered by the
    ranking key (every head mean >= every middle mean >= every tail
    mean, up to the doc_id tiebreak on equal means), kept == bucket !=
    'tail', and source_rank is a 1..n permutation."""
    import collections

    from big_data_recommendation_system_spark.plans.quality_models import (
        ccnet_perplexity_buckets,
    )

    rows = ccnet_perplexity_buckets(spark, sf_dir_small).collect()
    by_src = collections.defaultdict(list)
    for r in rows:
        assert r.kept == (r.bucket != "tail")
        by_src[r.source].append(r)
    assert by_src
    for src, rs in by_src.items():
        n = len(rs)
        ranks = sorted(r.source_rank for r in rs)
        assert ranks == list(range(1, n + 1)), src
        sizes = collections.Counter(r.bucket for r in rs)
        base, rem = divmod(n, 3)
        want = {
            "head": base + (1 if rem >= 1 else 0),
            "middle": base + (1 if rem >= 2 else 0),
            "tail": base,
        }
        assert {k: v for k, v in sizes.items() if v} == {
            k: v for k, v in want.items() if v
        }, src
        means = {b: [r.mean_bigram_prob for r in rs if r.bucket == b] for b in want}
        if means["head"] and means["middle"]:
            assert min(means["head"]) >= max(means["middle"]) - 1e-15
        if means["middle"] and means["tail"]:
            assert min(means["middle"]) >= max(means["tail"]) - 1e-15


def test_doremi_weights_semantics(spark, sf_dir_small):
    """Pins the DoReMi-lite contract: weights form a distribution;
    exp_w is monotone in excess (harder domain ⇒ weight up, eta > 0);
    the weight recomputes from (n_tokens, exp_w_fp); and the domain
    rates recompute from a per-doc LM-score rollup."""
    import pandas as pd

    ds = qm.doremi_domain_weights(spark, sf_dir_small).toPandas()
    assert len(ds) > 1
    assert abs(ds.doremi_weight.sum() - 1.0) < 1e-9
    assert (ds.doremi_weight > 0).all()
    srt = ds.sort_values("excess_fp")
    assert srt.exp_w_fp.is_monotonic_increasing
    w = ds.n_tokens * ds.exp_w_fp
    pd.testing.assert_series_equal(
        ds.doremi_weight, w / w.sum(), check_names=False
    )
    # rates from a per-doc recompute
    lab = qm.labeled_docs_table(spark, sf_dir_small).toPandas()
    lm = qm.lm_score_docs(
        qm.labeled_docs_table(spark, sf_dir_small),
        qm.lm_bigram_table(spark, sf_dir_small),
        qm.lm_unigram_table(spark, sf_dir_small),
    ).toPandas()
    j = lab[["doc_id", "source", "n_tokens"]].merge(lm, on="doc_id", how="left")
    g = j.groupby("source").agg(
        sum_fp=("lm_score_fp", lambda s: int(s.fillna(0).sum())),
        sum_big=("n_bigrams", lambda s: int(s.fillna(0).sum())),
        n_tok=("n_tokens", "sum"),
    )
    for r in ds.itertuples():
        grow = g.loc[r.source]
        assert r.domain_rate_fp == grow.sum_fp // grow.sum_big
        assert r.n_tokens == grow.n_tok


def test_gate_disagreement_partitions_and_matches_report(spark, sf_dir_small):
    """The joint-cell breakdown must PARTITION each source's documents
    (cell doc counts sum to the report's n_docs) and its marginals/
    all-pass cell must recompose model_gate_report exactly."""
    cells = qm.model_gate_disagreement(spark, sf_dir_small).toPandas()
    rep = {
        r.source: r
        for r in qm.model_gate_report(spark, sf_dir_small).collect()
    }
    assert (
        cells.n_gates_passed
        == cells.nb_pass.astype(int)
        + cells.lm_pass.astype(int)
        + cells.dsir_pass.astype(int)
    ).all()
    for src, grp in cells.groupby("source"):
        r = rep[src]
        assert int(grp.n_docs.sum()) == r.n_docs
        assert int(grp[grp.nb_pass].n_docs.sum()) == r.n_nb_pass
        assert int(grp[grp.lm_pass].n_docs.sum()) == r.n_lm_pass
        assert int(grp[grp.dsir_pass].n_docs.sum()) == r.n_dsir_pass
        allp = grp[grp.n_gates_passed == 3]
        assert int(allp.n_docs.sum()) == r.n_pass_all
        assert int(allp.n_tokens.sum()) == r.n_tokens_pass_all
        # no duplicate cells
        assert not grp.duplicated(["nb_pass", "lm_pass", "dsir_pass"]).any()
