"""Unit tests for the pandas-parity semantic traps (SURVEY.md §7.3) and
the DQ compiler, on tiny in-memory frames."""

from datetime import datetime

import pyspark.sql.functions as F

from big_data_recommendation_system_spark.config import (
    PRICE_TIER_BINS,
    PRICE_TIER_LABELS,
)
from big_data_recommendation_system_spark.functions.pandas_parity import (
    cut_right_closed,
    dayofweek_monday0,
    is_weekend,
)
from big_data_recommendation_system_spark.operators.dedup import keep_latest
from big_data_recommendation_system_spark.quality.compiler import with_quality
from big_data_recommendation_system_spark.quality.rules import EVENTS_RULES


def test_cut_right_closed_bin_edges(spark):
    """pd.cut parity: right-closed (lo, hi] — 50.0 is 'budget', 0 is null."""
    df = spark.createDataFrame(
        [(0.0,), (0.01,), (50.0,), (50.01,), (200.0,), (1000.0,), (1000.01,), (-3.0,)],
        ["price"],
    )
    got = {
        r.price: r.tier
        for r in df.select(
            "price",
            cut_right_closed(F.col("price"), PRICE_TIER_BINS, PRICE_TIER_LABELS).alias(
                "tier"
            ),
        ).collect()
    }
    assert got[0.0] is None  # left-open: 0 excluded, like pd.cut
    assert got[0.01] == "budget"
    assert got[50.0] == "budget"  # right-closed boundary
    assert got[50.01] == "low"
    assert got[200.0] == "low"
    assert got[1000.0] == "high"
    assert got[1000.01] == "premium"
    assert got[-3.0] is None


def test_dayofweek_monday0(spark):
    # 2025-09-01 is a Monday; 2025-09-06 Saturday; 2025-09-07 Sunday
    df = spark.createDataFrame(
        [(datetime(2025, 9, 1),), (datetime(2025, 9, 6),), (datetime(2025, 9, 7),)],
        ["ts"],
    )
    rows = df.select(
        dayofweek_monday0(F.col("ts")).alias("dow"), is_weekend(F.col("ts")).alias("we")
    ).collect()
    assert [r.dow for r in rows] == [0, 5, 6]
    assert [r.we for r in rows] == [False, True, True]


def test_keep_latest_deterministic(spark):
    df = spark.createDataFrame(
        [
            ("u1", 1, datetime(2025, 1, 1)),
            ("u1", 2, datetime(2025, 1, 2)),
            ("u1", 3, datetime(2025, 1, 2)),  # ts tie → higher event_id wins
            ("u2", 4, datetime(2025, 1, 1)),
        ],
        ["user_id", "event_id", "ts"],
    )
    got = {
        r.user_id: r.event_id
        for r in keep_latest(
            df, ["user_id"], [F.col("ts").desc(), F.col("event_id").desc()]
        ).collect()
    }
    assert got == {"u1": 3, "u2": 4}


def test_quality_compiler_scoring(spark):
    df = spark.createDataFrame(
        [
            # (event_id, ts, user_id, event_type, value, props)
            (1, datetime(2024, 2, 1), 10, "view", 5.0, '{"k": 1}'),  # clean
            (2, datetime(2024, 2, 1), None, "view", 5.0, '{"k": 1}'),  # CRITICAL fail
            (3, datetime(2024, 2, 1), 10, "error", 5.0, '{"k": 1}'),  # ERROR (enum)
            (4, datetime(2024, 2, 1), 10, "view", -1.0, '{"k": 1}'),  # ERROR (range)
            (5, datetime(2023, 1, 1), 10, "view", 5.0, "oops"),  # 2 WARNINGs only
        ],
        ["event_id", "ts", "user_id", "event_type", "value", "props"],
    )
    from big_data_recommendation_system_spark.quality.report import derive_dq_columns

    rows = {
        r.event_id: r
        for r in with_quality(derive_dq_columns(df), EVENTS_RULES).collect()
    }
    assert rows[1].is_valid and rows[1].quality_score == 100
    assert not rows[2].is_valid and rows[2].quality_score == 90
    assert not rows[3].is_valid and rows[3].quality_score == 95
    assert not rows[4].is_valid and rows[4].quality_score == 95
    assert rows[5].is_valid and rows[5].quality_score == 100
    # row 5: props_format + ts_range, plus the derived props_length
    # ('oops' is 4 chars) — WARNINGs never flip is_valid or the score
    assert rows[5].dq_warnings == 3


def test_quality_rule_types_url_email_country_length(spark):
    """The four rule types no default table uses — compile paths for
    url_valid / email_valid / country_code / string_length
    (reference data_quality.py:440-510)."""
    from big_data_recommendation_system_spark.quality.compiler import compile_rule
    from big_data_recommendation_system_spark.quality.rules import Rule, Severity

    df = spark.createDataFrame(
        [
            ("https://x.io/p", "a@b.com", "US", "abc"),
            ("notaurl", "nope", "XX", "toolongvalue"),
            (None, None, None, None),
        ],
        ["url", "email", "cc", "s"],
    )
    rules = {
        "u": Rule("u", "url", "url_valid", Severity.WARNING),
        "e": Rule("e", "email", "email_valid", Severity.WARNING),
        "c": Rule(
            "c", "cc", "country_code", Severity.WARNING, {"allowed": ["US", "DE", "FR"]}
        ),
        "l": Rule("l", "s", "string_length", Severity.WARNING, {"min": 1, "max": 5}),
    }
    out = df.select(
        *[compile_rule(r).alias(k) for k, r in rules.items()]
    ).collect()
    assert [tuple(r) for r in out] == [
        (True, True, True, True),
        (False, False, False, False),
        (True, True, True, True),  # nulls pass non-required rules
    ]


def test_asof_join_edges(spark):
    """As-of join: no prior right row → null payload; equal timestamps
    match the right row (DuckDB ASOF >= convention)."""
    from datetime import datetime

    from big_data_recommendation_system_spark.operators.asof import asof_join_backward

    left = spark.createDataFrame(
        [
            ("k", 1, datetime(2025, 1, 1)),  # before any right row
            ("k", 2, datetime(2025, 1, 2)),  # exactly at right ts -> match
            ("k", 3, datetime(2025, 1, 5)),  # carries latest right
            ("z", 4, datetime(2025, 1, 9)),  # key with no right rows
        ],
        ["key", "id", "ts"],
    )
    right = spark.createDataFrame(
        [
            ("k", datetime(2025, 1, 2), 10.0),
            ("k", datetime(2025, 1, 4), 20.0),
        ],
        ["key", "rts", "payload"],
    )
    got = {
        r.id: r.payload
        for r in asof_join_backward(
            left, right, key="key", left_ts="ts", right_ts="rts", payload=["payload"]
        ).collect()
    }
    assert got == {1: None, 2: 10.0, 3: 20.0, 4: None}


def test_asof_join_null_payload_from_matched_row(spark):
    """A matched right row whose payload is legitimately NULL must yield
    NULL (DuckDB ASOF convention), not an older row's value — and with
    multiple payload columns, both must come from the SAME matched row."""
    from datetime import datetime

    from big_data_recommendation_system_spark.operators.asof import asof_join_backward

    left = spark.createDataFrame(
        [("k", 1, datetime(2025, 1, 5))], ["key", "id", "ts"]
    )
    right = spark.createDataFrame(
        [
            ("k", datetime(2025, 1, 2), 10.0, "old"),
            ("k", datetime(2025, 1, 4), None, "new"),  # matched; a is NULL
        ],
        ["key", "rts", "a", "b"],
    )
    row = asof_join_backward(
        left, right, key="key", left_ts="ts", right_ts="rts", payload=["a", "b"]
    ).first()
    assert row.a is None and row.b == "new"


def test_bucketed_write_join_without_exchange(spark, sf_dir_small, tmp_path):
    """S7 scale extension: two tables bucketed on the same key must join
    with ZERO Exchange in the physical plan (the shuffle was paid at
    write time), and bucketed aggregation needs no re-shuffle either."""
    from big_data_recommendation_system_spark.plans.silver import silver_events
    from big_data_recommendation_system_spark.sources.sinks import write_bucketed

    spark.conf.set("spark.sql.sources.bucketing.enabled", "true")
    prev_thresh = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    # force the shuffle-join path (what bucketing optimizes away) — with
    # broadcast on, the planner ignores bucketing for these tiny tables
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    silver = silver_events(spark, sf_dir_small)
    write_bucketed(
        silver.select("user_id", "event_id", "event_weight"),
        "bkt_events",
        ["user_id"],
        n_buckets=8,
    )
    write_bucketed(
        silver.groupBy("user_id").count(), "bkt_users", ["user_id"], n_buckets=8
    )
    try:
        a = spark.table("bkt_events")
        b = spark.table("bkt_users")
        joined = a.join(b, "user_id")
        plan = joined._jdf.queryExecution().executedPlan().toString()
        # no shuffle exchange: the bucketed layout satisfies the join's
        # required distribution (BroadcastExchange would be fine; hash
        # repartitioning is what bucketing exists to eliminate)
        assert "Exchange hashpartitioning" not in plan, plan
        assert "Bucketed: true" in plan, plan
        agg_plan = (
            a.groupBy("user_id")
            .sum("event_weight")
            ._jdf.queryExecution()
            .executedPlan()
            .toString()
        )
        assert "Exchange hashpartitioning" not in agg_plan, agg_plan
        assert joined.count() == a.count()
    finally:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prev_thresh)
        spark.sql("DROP TABLE IF EXISTS bkt_events")
        spark.sql("DROP TABLE IF EXISTS bkt_users")


def test_date_partitioned_write_prunes_partitions(spark, sf_dir_small, tmp_path):
    """write_silver's date layout must give readers partition PRUNING:
    a date filter appears as a PartitionFilter, not a data filter, and
    only the matching directory is read."""
    import os

    from big_data_recommendation_system_spark.plans.silver import silver_events
    from big_data_recommendation_system_spark.sources.sinks import write_silver

    path = os.path.join(str(tmp_path), "silver_dated")
    silver = silver_events(spark, sf_dir_small).withColumnRenamed(
        "event_date", "date"
    )
    write_silver(silver, path, mode="overwrite")
    day = sorted(
        d.split("=", 1)[1] for d in os.listdir(path) if d.startswith("date=")
    )[0]
    rd = spark.read.parquet(path).filter(F.col("date") == day)
    plan = rd._jdf.queryExecution().executedPlan().toString()
    assert "PartitionFilters: [" in plan and "date" in plan.split(
        "PartitionFilters"
    )[1].split("]")[0], plan
    on_disk = spark.read.parquet(os.path.join(path, f"date={day}"))
    assert rd.count() == on_disk.count() > 0


def test_corpus_split_stable_and_fractioned(spark, sf_dir_small):
    """Hash-based split must be invariant to partitioning (the property
    randomSplit lacks) and must land near the declared 80/10/10
    fractions."""
    from big_data_recommendation_system_spark.plans.corpus_prep import (
        corpus_split,
    )

    base = corpus_split(spark, sf_dir_small)
    a = {r.doc_id: r.split for r in base.collect()}
    b = {
        r.doc_id: r.split
        for r in corpus_split(spark, sf_dir_small).repartition(17).collect()
    }
    assert a == b  # same doc -> same split, regardless of layout
    n = len(a)
    frac_train = sum(1 for s in a.values() if s == "train") / n
    frac_val = sum(1 for s in a.values() if s == "validation") / n
    frac_test = sum(1 for s in a.values() if s == "test") / n
    assert abs(frac_train - 0.80) < 0.06, frac_train
    assert abs(frac_val - 0.10) < 0.05, frac_val
    assert abs(frac_test - 0.10) < 0.05, frac_test


def test_corpus_prep_dedup_keeps_lowest_doc_id(spark):
    """corpus_prep's content dedup must keep exactly the lowest doc_id
    per identical text and count tokens once per kept doc."""
    import pandas as pd

    from big_data_recommendation_system_spark.plans import corpus_prep as cp

    text = "alpha beta gamma delta " * 10  # 40 words, distinct ratio 0.1
    good = " ".join(f"w{i}" for i in range(40))  # distinct ratio 1.0
    pdf = pd.DataFrame(
        {
            "doc_id": [3, 1, 2, 7],
            "text": [good, good, text, good + " tail"],
            "lang": ["en", "en", "en", "fr"],
            "source": ["s"] * 4,
            "n_chars": [len(good), len(good), len(text), len(good) + 5],
        }
    )
    import os
    import tempfile

    with tempfile.TemporaryDirectory() as td:
        spark.createDataFrame(pdf).write.parquet(os.path.join(td, "documents.parquet"))
        out = cp.corpus_prep_summary(spark, td).collect()
    # doc 2 fails the distinct-ratio gate; docs 1/3 are dupes -> keep 1;
    # doc 7 unique -> 2 docs survive, grouped by (split, lang)
    total_docs = sum(r.n_docs for r in out)
    assert total_docs == 2, out
    assert sum(r.total_words for r in out) == 40 + 41, out


def test_global_prefix_sum_matches_plain_window(spark):
    """with_global_prefix_sum must be bit-identical to the plain
    single-task ordered-window cumsum it replaces, including across an
    adversarial repartition of the input."""
    from pyspark.sql.window import Window

    from big_data_recommendation_system_spark.operators.ranking import (
        PREFIX_COL,
        with_global_prefix_sum,
    )

    rows = [(i * 7919 % 1000, (i * 31 % 97) + 1) for i in range(1000)]
    df = (
        spark.createDataFrame(rows, ["k", "v"])
        .dropDuplicates(["k"])
        .repartition(13)
    )
    got = {
        r.k: r[PREFIX_COL]
        for r in with_global_prefix_sum(df, ["k"], "v").collect()
    }
    w = (
        Window.orderBy("k").rowsBetween(Window.unboundedPreceding, -1)
    )
    want = {
        r.k: r.p
        for r in df.withColumn(
            "p", F.coalesce(F.sum("v").over(w), F.lit(0))
        ).collect()
    }
    assert got == want


def test_sequence_packing_invariants(spark, sf_dir_small):
    """Pack assignment must tile the corpus: offsets contiguous in
    doc_id order, pack_id monotone, every pack's start derived from the
    exclusive prefix."""
    from big_data_recommendation_system_spark.plans.packing import (
        PACK_BUDGET,
        sequence_packing,
    )

    rows = sequence_packing(spark, sf_dir_small).collect()
    run = 0
    prev_pack = 0
    for r in rows:  # already ordered by doc_id
        assert r.start_offset == run, (r.doc_id, r.start_offset, run)
        assert r.pack_id == r.start_offset // PACK_BUDGET
        assert r.offset_in_pack == r.start_offset % PACK_BUDGET
        assert r.pack_id >= prev_pack
        prev_pack = r.pack_id
        run += r.n_tokens
    assert prev_pack > 0  # sf0.001 corpus spans multiple packs


def test_mixture_sample_deterministic_and_weighted(spark, sf_dir_small):
    """Keep decision must be stable under repartitioning; realized rates
    must track the configured per-language rates; weights = 1/rate."""
    from big_data_recommendation_system_spark.plans.packing import (
        MIXTURE_RATES,
        mixture_sample,
    )
    from big_data_recommendation_system_spark.sources.tables import load_table

    kept = mixture_sample(spark, sf_dir_small).collect()
    kept_again = {
        r.doc_id
        for r in mixture_sample(spark, sf_dir_small).repartition(11).collect()
    }
    assert {r.doc_id for r in kept} == kept_again
    totals = {
        r.lang: r.n
        for r in load_table(spark, sf_dir_small, "documents")
        .groupBy("lang")
        .agg(F.count(F.lit(1)).alias("n"))
        .collect()
    }
    for lang, rate in MIXTURE_RATES.items():
        got = sum(1 for r in kept if r.lang == lang) / totals[lang]
        assert abs(got - rate) < 0.18, (lang, got, rate)
    for r in kept:
        assert r.sample_weight == 1.0 / MIXTURE_RATES[r.lang]


def test_pii_scrub_redacts_everything_it_counts(spark, sf_dir_small):
    """After redaction no detector pattern may still match, every doc
    with an injected span must be counted, and clean docs pass through
    with has_pii = false."""
    from big_data_recommendation_system_spark.plans.pii import (
        EMAIL_RE,
        IPV4_RE,
        PHONE_RE,
        pii_scrub,
    )

    out = pii_scrub(spark, sf_dir_small)
    leftovers = out.filter(
        (F.size(F.regexp_extract_all("redacted", F.lit(EMAIL_RE), F.lit(0))) > 0)
        | (F.size(F.regexp_extract_all("redacted", F.lit(PHONE_RE), F.lit(0))) > 0)
        | (F.size(F.regexp_extract_all("redacted", F.lit(IPV4_RE), F.lit(0))) > 0)
    ).count()
    assert leftovers == 0
    rows = out.collect()
    for r in rows:
        if r.doc_id % 7 == 0:
            assert r.n_emails >= 1 and "<EMAIL>" in r.redacted, r.doc_id
        if r.doc_id % 11 == 0:
            assert r.n_phones >= 1 and "<PHONE>" in r.redacted, r.doc_id
        if r.doc_id % 13 == 0:
            assert r.n_ipv4 >= 1 and "<IP>" in r.redacted, r.doc_id
        if r.doc_id % 7 and r.doc_id % 11 and r.doc_id % 13:
            assert not r.has_pii and r.pii_total == 0, r.doc_id
    assert any(r.has_pii for r in rows)


def test_bpe_pattern_segments_like_gpt2_subset(spark):
    """The RE2∩Java-subset pre-tokenizer must produce the classic GPT-2
    segmentation on contractions / digits / punctuation (minus the
    lookahead-dependent space handling, which the subset drops)."""
    from big_data_recommendation_system_spark.plans.text_analysis import (
        BPE_SPLIT_PATTERN,
    )

    df = spark.createDataFrame(
        [("it's 2024, don't panic!!",)], ["text"]
    ).select(
        F.regexp_extract_all(
            "text", F.lit(BPE_SPLIT_PATTERN), F.lit(0)
        ).alias("p")
    )
    got = df.collect()[0].p
    assert got == [
        "it", "'s", " 2024", ",", " don", "'t", " panic", "!!",
    ], got


def test_daily_gapfill_fills_and_carries(spark, tmp_path):
    """Gap days must appear with n_events=0, NULL observed mean, the
    last observed mean carried forward, and leading gaps (before any
    observation for that type) must stay NULL."""
    import big_data_recommendation_system_spark.plans.timeseries as ts

    rows = [
        # type a: days 1,2 then gap 3,4 then 5
        ("a", "2024-01-01 10:00:00", 10.0),
        ("a", "2024-01-02 10:00:00", 20.0),
        ("a", "2024-01-05 10:00:00", 50.0),
        # type b: starts at day 3 -> leading gaps on 1,2
        ("b", "2024-01-03 10:00:00", 7.0),
    ]
    df = spark.createDataFrame(rows, ["event_type", "ts", "value"]).select(
        "event_type",
        # events.parquet stores nanosecond longs (see sources/tables.py)
        (F.col("ts").cast("timestamp").cast("long") * 1_000_000_000).alias("ts"),
        "value",
        F.lit(1).alias("event_id"), F.lit(1).alias("user_id"),
        F.lit("{}").alias("props"),
    )
    path = str(tmp_path / "events.parquet")
    df.write.parquet(path)
    out = {
        (r.event_type, str(r.day)): r
        for r in ts.daily_gapfill(spark, str(tmp_path)).collect()
    }
    assert len(out) == 10  # 2 types x 5 days
    g = out[("a", "2024-01-03")]
    assert g.is_gap and g.n_events == 0 and g.avg_value is None
    assert g.avg_value_ff == 20.0
    assert out[("a", "2024-01-04")].avg_value_ff == 20.0
    assert out[("a", "2024-01-05")].avg_value_ff == 50.0
    lead = out[("b", "2024-01-01")]
    assert lead.is_gap and lead.avg_value_ff is None
    assert out[("b", "2024-01-03")].avg_value_ff == 7.0


def test_chunk_documents_cover_with_overlap(spark, tmp_path):
    """Chunks must start every stride chars, overlap by CHUNK_OVERLAP,
    cover the full doc, and short docs must yield exactly one chunk."""
    from big_data_recommendation_system_spark.plans import packing as pk

    text = "".join(chr(97 + (i * 7) % 26) for i in range(1000))
    rows = [(1, text, "en", "s0", len(text)), (2, "tiny", "en", "s0", 4)]
    spark.createDataFrame(
        rows, ["doc_id", "text", "lang", "source", "n_chars"]
    ).write.parquet(str(tmp_path / "documents.parquet"))
    out = pk.chunk_documents(spark, str(tmp_path)).collect()
    doc1 = [r for r in out if r.doc_id == 1]
    stride = pk.CHUNK_SIZE - pk.CHUNK_OVERLAP
    import hashlib

    assert len(doc1) == -(-(1000 - pk.CHUNK_OVERLAP) // stride)
    for r in doc1:
        assert r.chunk_start == r.chunk_idx * stride + 1
        expect = text[r.chunk_start - 1 : r.chunk_start - 1 + pk.CHUNK_SIZE]
        assert r.chunk_len == len(expect)
        assert r.chunk_hash == hashlib.md5(expect.encode()).hexdigest()
    # coverage: last chunk reaches the end of the doc
    last = doc1[-1]
    assert last.chunk_start - 1 + last.chunk_len == 1000
    doc2 = [r for r in out if r.doc_id == 2]
    assert len(doc2) == 1 and doc2[0].chunk_len == 4


def test_balanced_sample_exactly_k_per_source(spark, sf_dir_small):
    from big_data_recommendation_system_spark.plans import packing as pk
    from big_data_recommendation_system_spark.sources.tables import load_table

    out = pk.balanced_sample(spark, sf_dir_small).collect()
    per = {}
    for r in out:
        per.setdefault(r.source, []).append(r.sample_rank)
    totals = {
        r.source: r.n
        for r in load_table(spark, sf_dir_small, "documents")
        .groupBy("source")
        .agg(F.count(F.lit(1)).alias("n"))
        .collect()
    }
    for src, ranks in per.items():
        k = min(pk.SAMPLE_K, totals[src])
        assert sorted(ranks) == list(range(1, k + 1)), (src, ranks)
    assert set(per) == set(totals)
    again = {
        (r.doc_id, r.sample_rank)
        for r in pk.balanced_sample(spark, sf_dir_small).collect()
    }
    assert {(r.doc_id, r.sample_rank) for r in out} == again


def test_simhash_banded_pairs_complete_for_threshold(spark, sf_dir_small):
    """Pigeonhole completeness: with 4 bands over 48 bits, every pair at
    hamming <= 3 shares at least one whole band, so the banded join must
    find exactly the brute-force all-pairs answer (no bucket at sf0.001
    exceeds the stop-bucket cap, so the cap cannot hide pairs here)."""
    from big_data_recommendation_system_spark.operators import text_dedup as td

    fp = td.simhash_fingerprints(spark, sf_dir_small)
    a = fp.select(F.col("doc_id").alias("doc_a"), F.col("simhash").alias("sa"))
    b = fp.select(F.col("doc_id").alias("doc_b"), F.col("simhash").alias("sb"))
    brute = (
        a.crossJoin(b)
        .filter(F.col("doc_a") < F.col("doc_b"))
        .withColumn(
            "hamming", F.bit_count(F.col("sa").bitwiseXOR(F.col("sb"))).cast("int")
        )
        .filter(F.col("hamming") <= td.SIMHASH_HAM_MAX)
    )
    # precondition for the completeness claim: no stop bucket triggered
    max_bucket = (
        fp.select(
            F.explode(
                F.array(
                    *[
                        F.shiftright("simhash", i * td._SIMHASH_BAND_BITS)
                        .bitwiseAND(F.lit(td._SIMHASH_BAND_MASK))
                        + F.lit(i * (td._SIMHASH_BAND_MASK + 1))
                        for i in range(td.SIMHASH_BANDS)
                    ]
                )
            ).alias("k")
        )
        .groupBy("k")
        .count()
        .agg(F.max("count"))
        .first()[0]
    )
    assert max_bucket <= td.SIMHASH_MAX_BUCKET
    got = {
        (r.doc_a, r.doc_b, r.hamming)
        for r in td.simhash_near_dup_pairs(spark, sf_dir_small).collect()
    }
    want = {(r.doc_a, r.doc_b, r.hamming) for r in brute.collect()}
    assert got == want and len(want) > 0


def test_table_loader_dtypes_canary(spark, sf_dir_small):
    """Spark-version canary: load every table and pin the dtypes the rest
    of the engine assumes. Round 2 broke because PySpark 4.1 started
    reading the events table's nanosecond parquet timestamps natively
    (TIMESTAMP_NTZ) where 4.0 needed the nanosAsLong workaround — this
    test turns any such upstream read-behavior change into one obvious
    failure instead of 25 opaque query errors."""
    from big_data_recommendation_system_spark.sources.tables import (
        TABLE_NAMES,
        load_tables,
    )

    tables = load_tables(spark, sf_dir_small)
    assert set(tables) == set(TABLE_NAMES)

    expected = {
        "events": {
            "event_id": "bigint",
            "ts": "timestamp",  # LTZ micros whatever the parquet encoding
            "user_id": "bigint",
            "event_type": "string",
            "value": "double",
            "props": "string",
        },
        "documents": {"doc_id": "bigint", "text": "string"},
        # date columns infer as NTZ under Spark 4.1 parquet reads; the
        # relational plans only compare them against literals, so NTZ is
        # acceptable there — events.ts is the one that MUST be LTZ
        # (unix_micros in the session operators rejects NTZ).
        "orders": {"o_orderdate": "timestamp_ntz"},
        "lineitem": {"l_shipdate": "timestamp_ntz", "l_quantity": "double"},
        "embeddings": {"vec_id": "bigint", "embedding": "array<float>"},
    }
    for name, cols in expected.items():
        dtypes = dict(tables[name].dtypes)
        for col, want in cols.items():
            assert dtypes.get(col) == want, (
                f"{name}.{col}: expected {want}, loaded {dtypes.get(col)} "
                f"(all: {dtypes})"
            )
    # every table must be non-empty and scannable
    for name, df in tables.items():
        assert df.limit(1).count() == 1, f"{name} empty or unreadable"


def test_decontamination_invariants(spark, sf_dir_small):
    """Eval-decontamination semantics: only non-train docs appear, overlap
    is bounded by the shingle count, and the ratio/flag are consistent."""
    from big_data_recommendation_system_spark.plans.corpus_prep import (
        DECON_TAU,
        decontamination_report,
    )

    rows = decontamination_report(spark, sf_dir_small).collect()
    assert rows, "expected at least one validation/test document"
    assert {r.split for r in rows} <= {"validation", "test"}
    for r in rows:
        assert 0 <= r.n_overlap <= r.n_shingles
        expected = (r.n_overlap / r.n_shingles) if r.n_shingles else 0.0
        assert abs(r.overlap_ratio - expected) < 1e-12
        assert r.is_contaminated == (expected >= DECON_TAU)


def test_incremental_near_dup_matches_symmetric_pipeline(spark, sf_dir_small):
    """The asymmetric batch×index join must find exactly the
    cross-boundary subset of the symmetric LSH pipeline's verified pairs
    (same stop-bucket stats, same verification), re-oriented to the
    incoming side."""
    from big_data_recommendation_system_spark.operators.text_dedup import (
        INCREMENTAL_BATCH_MOD,
        INCREMENTAL_BATCH_REM,
        incremental_near_dup,
        minhash_lsh_pairs,
    )

    def is_batch(i):
        return i % INCREMENTAL_BATCH_MOD == INCREMENTAL_BATCH_REM

    sym = {}
    for r in minhash_lsh_pairs(spark, sf_dir_small).collect():
        if is_batch(r.doc_a) != is_batch(r.doc_b):
            doc, match = (r.doc_a, r.doc_b) if is_batch(r.doc_a) else (r.doc_b, r.doc_a)
            sym.setdefault(doc, []).append((match, r.jaccard))

    inc = {r.doc_id: r for r in incremental_near_dup(spark, sf_dir_small).collect()}
    # every incoming doc is reported exactly once
    assert all(is_batch(d) for d in inc)
    for doc, row in inc.items():
        want = sorted(sym.get(doc, []), key=lambda m: (-m[1], m[0]))
        assert row.n_matches == len(want)
        assert row.is_dup == bool(want)
        if want:
            assert (row.best_match_id, row.best_jaccard) == want[0]
        else:
            assert row.best_match_id is None and row.best_jaccard is None
    assert set(inc) >= set(sym)  # no cross pair lost


def test_semdedup_incremental_sound_and_consistent(spark, sf_dir_small):
    """Cross-boundary equivalence pins for the incremental SemDeDup:
    (a) its matches are exactly the cross-boundary subset of the full
    pair substrate (same cells, same tau, re-oriented to the batch
    side); (b) DROP SOUNDNESS vs the full plan — an incremental drop
    means a direct match outranks the batch vector in (centroid_cos,
    vec_id), which puts that match in the same CC group of
    semdedup_plan, so the full plan cannot keep the batch vector
    either; (c) a batch vector with no matches AT ALL in the substrate
    (not even batch×batch) is a singleton group and kept by BOTH."""
    from big_data_recommendation_system_spark.operators.similarity import (
        embedding_near_dup_pairs,
        semdedup_incremental,
        semdedup_plan,
    )
    from big_data_recommendation_system_spark.operators.srp import (
        SRP_BATCH_MOD,
        SRP_BATCH_REM,
    )

    def is_batch(i):
        return i % SRP_BATCH_MOD == SRP_BATCH_REM

    cross, touched = {}, set()
    for r in embedding_near_dup_pairs(spark, sf_dir_small).collect():
        touched.update((r.vec_a, r.vec_b))
        if is_batch(r.vec_a) != is_batch(r.vec_b):
            v, m = (r.vec_a, r.vec_b) if is_batch(r.vec_a) else (r.vec_b, r.vec_a)
            cross.setdefault(v, []).append((m, r.cosine))

    inc = {r.vec_id: r for r in semdedup_incremental(spark, sf_dir_small).collect()}
    full = {r.vec_id: r for r in semdedup_plan(spark, sf_dir_small).collect()}
    assert all(is_batch(v) for v in inc) and inc
    assert any(r.is_dup for r in inc.values()), "slice should exercise matches"
    for v, row in inc.items():
        want = sorted(cross.get(v, []), key=lambda m: (-m[1], m[0]))
        assert row.n_matches == len(want)
        assert row.is_dup == bool(want)
        if want:
            assert (row.best_match_id, row.best_match_cos) == want[0]
        else:
            assert row.best_match_id is None and row.best_match_cos is None
        if not row.keep:  # (b) drop soundness
            assert not full[v].is_kept, v
        if v not in touched:  # (c) fully-clean vectors kept by both
            assert row.keep and full[v].is_kept and full[v].cluster_size == 1


def test_registry_window_integrity():
    """The driver hash-checks only the first 50 registry entries; guard
    the properties that make that window worth its slots: no duplicates,
    every windowed query exists, and every in-window entry either has an
    oracle or is one of the known rows-only exceptions."""
    from big_data_recommendation_system_spark.registry import ORACLES, QUERIES

    names = list(QUERIES)
    window = names[:50]
    assert len(set(window)) == 50
    missing = [n for n in window if n not in ORACLES]
    assert not missing, f"in-window queries without oracle: {missing}"
    # every oracle key must have a query (no orphan SQL)
    assert set(ORACLES) <= set(QUERIES)


def test_embedding_quantize_invariants(spark, sf_dir_small):
    """int8 code range, error bound (quantization error <= scale/2 per
    dim by construction of round), and full-corpus coverage."""
    from big_data_recommendation_system_spark.operators.similarity import (
        QUANT_LEVELS,
        embedding_quantize,
    )
    from big_data_recommendation_system_spark.sources.tables import load_table

    out = embedding_quantize(spark, sf_dir_small)
    rows = out.collect()
    assert len(rows) == load_table(spark, sf_dir_small, "embeddings").count()
    for r in rows:
        # quantized is serialized as a comma-joined string since round 5
        # (the driver's hash canonicalizer rejects top-level array columns)
        codes = [int(x) for x in r.quantized.split(",")]
        assert r.n_dims == len(codes)
        assert all(abs(q) <= QUANT_LEVELS for q in codes)
        # per-dim error <= scale/2, so L1 <= n_dims * scale / 2
        assert r.max_abs_err <= r.scale / 2 + 1e-12
        assert r.l1_err <= r.n_dims * r.scale / 2 + 1e-9


def test_sentence_dedup_flags_copied_sentences(spark, sf_dir_small, tmp_path):
    """A sentence occurring verbatim in >= 2 documents must be counted as
    duplicated in every host document (case/whitespace-insensitively),
    short fragments must be ignored, and ratios stay in [0, 1]."""
    from big_data_recommendation_system_spark.plans.packing import (
        sentence_dedup_stats,
    )

    shared = "this sentence is copied between both documents verbatim"
    docs = spark.createDataFrame(
        [
            (0, f"Unique opening line number zero. {shared}.", "en", "a", 1),
            (1, f"{shared.upper()}!  A different unique closing line.", "en", "a", 1),
            (2, "Nothing shared here at all, a fully unique doc.", "en", "a", 1),
            (3, "tiny. bits. only.", "en", "a", 1),  # all below the length gate
        ],
        ["doc_id", "text", "lang", "source", "n_chars"],
    )
    docs.write.parquet(str(tmp_path / "documents.parquet"))
    out = {r.doc_id: r for r in sentence_dedup_stats(spark, str(tmp_path)).collect()}
    assert 3 not in out  # every sentence under SENT_MIN_CHARS
    assert out[0].n_sentences == 2 and out[0].n_dup_sentences == 1
    assert out[1].n_sentences == 2 and out[1].n_dup_sentences == 1
    assert out[2].n_dup_sentences == 0
    for r in out.values():
        assert 0 <= r.n_dup_sentences <= r.n_sentences
        assert 0.0 <= r.dup_sentence_ratio <= 1.0
    # the driver corpus runs clean end-to-end too
    real = sentence_dedup_stats(spark, sf_dir_small).collect()
    assert real and all(0.0 <= r.dup_sentence_ratio <= 1.0 for r in real)


def test_rare_token_quality_bounds(spark, sf_dir_small):
    from big_data_recommendation_system_spark.plans.text_analysis import (
        rare_token_quality,
    )

    out = rare_token_quality(spark, sf_dir_small).collect()
    assert out
    for r in out:
        assert 0 <= r.n_rare_tokens <= r.n_tokens
        assert 0.0 <= r.rare_ratio <= 1.0
        # every token occurs at least once (itself)
        assert r.avg_token_cf >= 1.0


def test_lang_confusion_shares_sum_to_one(spark, sf_dir_small):
    from collections import defaultdict

    from big_data_recommendation_system_spark.plans.text_analysis import (
        lang_confusion,
    )

    rows = lang_confusion(spark, sf_dir_small).collect()
    by_label = defaultdict(float)
    for r in rows:
        by_label[r.labeled_lang] += r.share_of_labeled
    for lang, total in by_label.items():
        assert abs(total - 1.0) < 1e-9, (lang, total)


def test_kmeans_objective_monotone_descent(spark, sf_dir_small):
    """Lloyd's algorithm never increases the squared-L2 objective; pin
    that across KMEANS_ITERS iterations (tolerance covers the 1e-12
    fixed-point quantization) and that every vector stays assigned."""
    from pyspark.sql import functions as F

    from big_data_recommendation_system_spark.operators.similarity import (
        IVF_CENTROIDS,
        KMEANS_ITERS,
        _dims,
        _kmeans_assign,
        _kmeans_new_centroids,
        _kmeans_stats,
    )
    from big_data_recommendation_system_spark.sources.tables import load_table

    emb = load_table(spark, sf_dir_small, "embeddings")
    n_vecs = emb.count()
    dims = _dims(emb, "vid").cache()
    cdims = dims.filter(F.col("vid") < IVF_CENTROIDS).select(
        F.col("vid").alias("cid"), "pos", F.col("x").alias("cx")
    )
    objectives = []
    for _ in range(KMEANS_ITERS):
        assign = _kmeans_assign(dims, cdims)
        stats = _kmeans_stats(assign).collect()
        assert sum(r.n_members for r in stats) == n_vecs
        objectives.append(sum(r.objective for r in stats))
        cdims = _kmeans_new_centroids(assign, dims).localCheckpoint(eager=True)
    for prev, cur in zip(objectives, objectives[1:]):
        assert cur <= prev + 1e-6, objectives
    assert objectives[-1] < objectives[0]  # refinement actually moved


def test_kmeans_refine_descent_report(spark, sf_dir_small):
    """kmeans_refine's self-evidencing report: one row per iteration,
    every descended flag true, all vectors assigned each round."""
    from big_data_recommendation_system_spark.operators.similarity import (
        KMEANS_ITERS,
        kmeans_refine,
    )
    from big_data_recommendation_system_spark.sources.tables import load_table

    n_vecs = load_table(spark, sf_dir_small, "embeddings").count()
    rows = kmeans_refine(spark, sf_dir_small).collect()
    assert [r.iteration for r in rows] == list(range(1, KMEANS_ITERS + 1))
    assert all(r.descended for r in rows), rows
    assert all(r.n_members == n_vecs for r in rows), rows
    assert rows[-1].total_objective < rows[0].total_objective


def test_containment_catches_embedded_doc_jaccard_misses(spark, tmp_path):
    """A small document fully embedded in a much larger one must be
    flagged by shingle containment (C = 1.0) even though its jaccard is
    far below the LSH threshold (union dominated by the big doc) — the
    asymmetric-inclusion case this operator exists for."""
    small = "alpha beta gamma delta epsilon zeta eta theta"
    filler = " ".join(f"word{i} word{i + 1}" for i in range(0, 400, 2))
    docs = spark.createDataFrame(
        [
            (0, small, "en", "a", len(small)),
            (1, f"{filler} {small} {filler}", "en", "a", 1),
            (2, "totally unrelated content about nothing shared", "en", "a", 1),
        ],
        ["doc_id", "text", "lang", "source", "n_chars"],
    )
    docs.write.parquet(str(tmp_path / "documents.parquet"))
    from big_data_recommendation_system_spark.operators.text_dedup import (
        JACCARD_THRESHOLD,
        shingle_containment_pairs,
    )

    rows = shingle_containment_pairs(spark, str(tmp_path)).collect()
    pairs = {(r.doc_a, r.doc_b): r for r in rows}
    assert (0, 1) in pairs
    hit = pairs[(0, 1)]
    assert hit.containment == 1.0  # every small-doc shingle is in the big doc
    jaccard = hit.n_shared / (hit.n_a + hit.n_b - hit.n_shared)
    assert jaccard < JACCARD_THRESHOLD  # the jaccard/LSH path would miss it
    assert not any(2 in p for p in pairs)
    for r in rows:
        assert r.n_shared <= min(r.n_a, r.n_b)
        assert 0.0 < r.containment <= 1.0


def test_pca_spectrum_invariants(spark, sf_dir_small):
    """Eigen-spectrum must preserve the covariance trace, be descending
    and non-negative (covariance is PSD up to fp noise), and the
    explained ratios must accumulate to exactly 1."""
    from big_data_recommendation_system_spark.operators.linalg import (
        embedding_covariance,
        pca_explained_variance,
    )

    cov = {
        (r["i"], r["j"]): r["cov"]
        for r in embedding_covariance(spark, sf_dir_small).collect()
    }
    trace = sum(cov[(i, i)] for i in range(64))
    rows = pca_explained_variance(spark, sf_dir_small).collect()
    assert len(rows) == 64
    eig = [r["eigenvalue"] for r in rows]
    assert abs(sum(eig) - trace) < 1e-9 * max(1.0, abs(trace))
    assert all(eig[k] >= eig[k + 1] for k in range(63))
    assert all(v >= -1e-12 for v in eig)
    assert abs(rows[-1]["cumulative_ratio"] - 1.0) < 1e-9


def test_pca_certificates_can_fail(spark, sf_dir_small):
    """The pca_invariants certificates must actually reject a corrupted
    eigensolve, not be vacuous constants: a fake spectrum (all-zero
    eigenvalues) breaks trace preservation + reconstruction + (with a
    negative value) PSD, while the honest solve passes all four."""
    from big_data_recommendation_system_spark.operators.linalg import (
        eigensolve_certificates,
        embedding_covariance,
    )

    cov_rows = embedding_covariance(spark, sf_dir_small).collect()
    assert eigensolve_certificates(cov_rows) == (1, 1, 1, 1)
    fake = [0.0] * 63 + [-1.0]
    tr_ok, ortho_ok, recon_ok, psd_ok = eigensolve_certificates(
        cov_rows, eig_override=fake
    )
    assert tr_ok == 0 and recon_ok == 0 and psd_ok == 0
    assert ortho_ok == 1  # eigenvectors untouched — stays green


def test_winnowing_matches_brute_force(spark, sf_dir_small):
    """Winnowing digest equality against a direct per-document recompute
    of Schleimer et al.'s rule: slide windows of W consecutive 3-gram
    md5 hashes, pick each window's minimum (rightmost on ties), dedupe
    picks — plus the density guarantee n_fingerprints >= n_windows/(W)
    ... at least one pick per W consecutive windows (every window
    contributes one, picks repeat at most across overlapping windows)."""
    import hashlib

    from big_data_recommendation_system_spark.plans.text_analysis import (
        WINNOW_K,
        WINNOW_W,
        winnowing_fingerprints,
    )
    from big_data_recommendation_system_spark.sources.tables import load_table

    def md5(s: str) -> str:
        return hashlib.md5(s.encode()).hexdigest()

    docs = {
        r["doc_id"]: r["text"].lower().split()
        for r in load_table(spark, sf_dir_small, "documents").collect()
    }
    got = {r["doc_id"]: r for r in winnowing_fingerprints(spark, sf_dir_small).collect()}
    assert set(got) == set(docs)
    checked = 0
    for d, toks in sorted(docs.items()):
        hs = [md5(" ".join(toks[i : i + WINNOW_K])) for i in range(len(toks) - WINNOW_K + 1)]
        picks = set()
        for e in range(WINNOW_W - 1, len(hs)):
            window = hs[e - WINNOW_W + 1 : e + 1]
            m = min(window)
            # rightmost occurrence of the min in this window
            off = max(i for i, h in enumerate(window) if h == m)
            picks.add((e - WINNOW_W + 1 + off, m))
        r = got[d]
        assert r["n_grams"] == len(hs)
        assert r["n_fingerprints"] == len(picks), d
        digest = md5("|".join(f"{p}:{h}" for p, h in sorted(picks))) if picks else ""
        assert r["fp_digest"] == digest, d
        if picks:
            assert len(picks) >= (len(hs) - WINNOW_W + 1) / WINNOW_W
            checked += 1
    assert checked > 100


def test_dup_span_removal_plan_matches_brute_force(spark, sf_dir_small):
    """The n-gram-anchored span merge must equal a per-document
    brute-force recompute (mark every duplicated anchor position, union
    the [p, p+k-1] windows, take maximal runs), and its structural
    invariants must hold: spans within a doc are disjoint and ordered,
    every span covers >= k tokens, and span_tokens == end-start+1."""
    import collections

    from big_data_recommendation_system_spark.plans.packing import (
        DUP_SPAN_MIN_DOCS,
        DUP_SPAN_NGRAM,
        dup_span_removal_plan,
    )
    from big_data_recommendation_system_spark.sources.tables import load_table

    k = DUP_SPAN_NGRAM
    docs = {
        r["doc_id"]: r["text"].lower().split()
        for r in load_table(spark, sf_dir_small, "documents").collect()
    }
    gram_docs = collections.defaultdict(set)
    for d, toks in docs.items():
        for i in range(len(toks) - k + 1):
            gram_docs[" ".join(toks[i : i + k])].add(d)
    expected = {}
    for d, toks in docs.items():
        covered = set()
        for i in range(len(toks) - k + 1):
            if len(gram_docs[" ".join(toks[i : i + k])]) >= DUP_SPAN_MIN_DOCS:
                covered.update(range(i, i + k))
        runs, start = [], None
        for p in range(len(toks) + 1):
            if p in covered and start is None:
                start = p
            elif p not in covered and start is not None:
                runs.append((start, p - 1))
                start = None
        if runs:
            expected[d] = runs
    got = collections.defaultdict(list)
    for r in dup_span_removal_plan(spark, sf_dir_small).collect():
        assert r["span_tokens"] == r["span_end"] - r["span_start"] + 1
        assert r["span_tokens"] >= k and r["n_anchors"] >= 1
        got[r["doc_id"]].append((r["span_start"], r["span_end"]))
    assert dict(got) == expected
    for spans in got.values():  # disjoint + ordered within each doc
        assert all(a2 > b1 for (_, b1), (a2, _) in zip(spans, spans[1:]))


def test_incremental_dup_spans_contained_in_full(spark, sf_dir_small):
    """Cross-boundary containment: an incremental anchor (batch gram
    present in the index) is necessarily a full-detector anchor (gram in
    >= 2 docs), so every incremental span must lie inside the union of
    the full plan's spans for that document — and only batch documents
    may appear."""
    from big_data_recommendation_system_spark.operators.text_dedup import (
        INCREMENTAL_BATCH_MOD,
        INCREMENTAL_BATCH_REM,
    )
    from big_data_recommendation_system_spark.plans.packing import (
        dup_span_removal_plan,
        incremental_dup_spans,
    )

    full = {}
    for r in dup_span_removal_plan(spark, sf_dir_small).collect():
        full.setdefault(r["doc_id"], set()).update(
            range(r["span_start"], r["span_end"] + 1)
        )
    inc = incremental_dup_spans(spark, sf_dir_small).collect()
    assert inc, "sf0.001 must contain cross-boundary dup spans"
    for r in inc:
        assert r["doc_id"] % INCREMENTAL_BATCH_MOD == INCREMENTAL_BATCH_REM
        covered = set(range(r["span_start"], r["span_end"] + 1))
        assert covered <= full.get(r["doc_id"], set()), r["doc_id"]


def test_scrub_dup_spans_consistent_with_plan(spark, sf_dir_small):
    """plan→apply consistency: per document, the scrub's removed-token
    count must equal the removal plan's span_tokens sum, the kept text
    must re-tokenize to exactly n_kept_tokens, and kept+removed must
    total the document's token count."""
    from big_data_recommendation_system_spark.plans.packing import (
        dup_span_removal_plan,
        scrub_dup_spans,
    )

    plan = {}
    for r in dup_span_removal_plan(spark, sf_dir_small).collect():
        plan[r["doc_id"]] = plan.get(r["doc_id"], 0) + r["span_tokens"]
    for r in scrub_dup_spans(spark, sf_dir_small).collect():
        assert r["n_removed_tokens"] == plan.get(r["doc_id"], 0), r["doc_id"]
        toks = [t for t in r["scrubbed_text"].split(" ") if t]
        assert len(toks) == r["n_kept_tokens"], r["doc_id"]
        assert r["n_kept_tokens"] + r["n_removed_tokens"] == r["n_tokens"]


def test_dup_span_calibration_consistent_with_plan(spark, sf_dir_small):
    """The calibration grid's ngram_n = DUP_SPAN_NGRAM column must equal
    what filtering the production removal plan by each min-span-length
    gives (same anchors, same island merge — only the threshold moves),
    and each (n fixed) column must be monotone non-increasing in
    min_span_len."""
    from big_data_recommendation_system_spark.plans.packing import (
        DUP_SPAN_NGRAM,
        SPAN_CAL_MIN_LENS,
        SPAN_CAL_NGRAMS,
        dup_span_calibration,
        dup_span_removal_plan,
    )

    assert DUP_SPAN_NGRAM in SPAN_CAL_NGRAMS
    spans = [
        r["span_tokens"]
        for r in dup_span_removal_plan(spark, sf_dir_small).collect()
    ]
    docs = {}
    for r in dup_span_removal_plan(spark, sf_dir_small).collect():
        docs.setdefault(r["doc_id"], []).append(r["span_tokens"])
    grid = {
        (r.ngram_n, r.min_span_len): r
        for r in dup_span_calibration(spark, sf_dir_small).collect()
    }
    assert set(grid) == {
        (n, l) for n in SPAN_CAL_NGRAMS for l in SPAN_CAL_MIN_LENS
    }
    for l in SPAN_CAL_MIN_LENS:
        cell = grid[(DUP_SPAN_NGRAM, l)]
        want = [s for s in spans if s >= l]
        assert cell.n_spans == len(want)
        assert cell.scrubbed_tokens == sum(want)
        assert cell.docs_affected == sum(
            1 for ss in docs.values() if any(s >= l for s in ss)
        )
    for n in SPAN_CAL_NGRAMS:
        col = [grid[(n, l)] for l in sorted(SPAN_CAL_MIN_LENS)]
        for a, b in zip(col, col[1:]):
            assert a.n_spans >= b.n_spans
            assert a.scrubbed_tokens >= b.scrubbed_tokens


def test_dedup_retention_keeps_longest_per_cluster(spark, sf_dir_small):
    """Exactly one survivor per cluster; the survivor is a member of its
    own cluster and has the maximal n_chars (ties to lowest doc_id);
    singletons keep themselves."""
    from pyspark.sql import functions as F

    from big_data_recommendation_system_spark.operators.text_dedup import (
        dedup_retention_plan,
    )
    from big_data_recommendation_system_spark.sources.tables import load_table

    plan = dedup_retention_plan(spark, sf_dir_small).cache()
    per_cluster = (
        plan.groupBy("cluster_id")
        .agg(
            F.sum(F.col("keep").cast("int")).alias("n_keep"),
            F.countDistinct("kept_doc_id").alias("n_kept_ids"),
        )
        .collect()
    )
    assert all(r["n_keep"] == 1 and r["n_kept_ids"] == 1 for r in per_cluster)
    docs = load_table(spark, sf_dir_small, "documents").select(
        "doc_id", "n_chars"
    )
    joined = plan.join(docs, "doc_id")
    best = joined.groupBy("cluster_id").agg(
        F.max(
            F.struct(F.col("n_chars"), (-F.col("doc_id")).alias("neg"))
        ).alias("m")
    )
    bad = (
        joined.filter("keep")
        .join(best, "cluster_id")
        .filter(
            (F.col("n_chars") != F.col("m.n_chars"))
            | (F.col("doc_id") != -F.col("m.neg"))
        )
        .count()
    )
    assert bad == 0
    singleton_selfkeep = (
        plan.filter("cluster_size = 1")
        .filter(~F.col("keep") | (F.col("kept_doc_id") != F.col("doc_id")))
        .count()
    )
    assert singleton_selfkeep == 0


def test_frequent_ngrams_counts_within_doc_repeats(spark, tmp_path):
    """Occurrence count must include within-doc repeats (what shingle
    dedup collapses) and doc frequency must not."""
    import os

    import pandas as pd

    from big_data_recommendation_system_spark.plans.text_analysis import (
        frequent_ngrams,
    )

    d = str(tmp_path / "sf")
    os.makedirs(d)
    pd.DataFrame(
        {
            "doc_id": [1, 2, 3],
            "text": [
                "alpha beta gamma alpha beta gamma",  # phrase twice in one doc
                "alpha beta gamma delta",
                "nothing shared here at all",
            ],
            "lang": ["en"] * 3,
            "source": ["s"] * 3,
            "n_chars": [33, 22, 26],
        }
    ).to_parquet(os.path.join(d, "documents.parquet"))
    for t in ["region", "nation", "customer", "supplier", "part", "orders",
              "lineitem", "events", "embeddings"]:
        src = os.path.join("/root/testdata/sf0.001", f"{t}.parquet")
        dst = os.path.join(d, f"{t}.parquet")
        os.symlink(src, dst)
    out = {
        r["gram"]: (r["n_occ"], r["n_docs"])
        for r in frequent_ngrams(spark, d).collect()
    }
    assert out["alpha beta gamma"] == (3, 2)


def test_ngrams_and_shingles_short_inputs_empty(spark):
    """Docs with fewer than n tokens must yield an empty gram array.
    Unguarded, Spark's sequence(1, 0) descends to [1, 0] and
    slice(toks, 0, n) throws INVALID_PARAMETER_VALUE.START — DuckDB's
    range(1, 1) mirror is empty, so the guard is a cross-engine fix."""
    from big_data_recommendation_system_spark.functions.text import (
        ngrams,
        shingles,
    )

    df = spark.createDataFrame(
        [(["one"],), (["one", "two"],), (["one", "two", "three"],), ([],)],
        "toks array<string>",
    )
    grams = df.select(
        ngrams("toks", 3).alias("g"), shingles("toks", 3).alias("s")
    ).collect()
    sizes = sorted((len(r["g"]), len(r["s"])) for r in grams)
    assert sizes == [(0, 0), (0, 0), (0, 0), (1, 1)]


def test_bpe_pair_counts_no_single_char_phantoms(spark, tmp_path):
    """Single-char words must contribute NO pairs: the unguarded
    sequence(1, greatest(len-1, 0)) form emitted phantom 'x x' / 'x '
    pairs weighted by freq('x') because substring(word, 0, 1) silently
    reads index 1 (ADVICE r3, high)."""
    import os

    import pandas as pd

    from big_data_recommendation_system_spark.plans.text_analysis import (
        bpe_pair_counts,
    )

    d = str(tmp_path / "sf")
    os.makedirs(d)
    pd.DataFrame(
        {
            "doc_id": [1, 2],
            # 'a' and 'i' are high-frequency single-char words; 'go' is the
            # only word contributing a real pair.
            "text": ["a a a a a i i i go", "a a i go"],
            "lang": ["en"] * 2,
            "source": ["s"] * 2,
            "n_chars": [18, 8],
        }
    ).to_parquet(os.path.join(d, "documents.parquet"))
    for t in ["region", "nation", "customer", "supplier", "part", "orders",
              "lineitem", "events", "embeddings"]:
        os.symlink(
            os.path.join("/root/testdata/sf0.001", f"{t}.parquet"),
            os.path.join(d, f"{t}.parquet"),
        )
    rows = bpe_pair_counts(spark, d).collect()
    pairs = {r["pair"]: r["n_weighted"] for r in rows}
    assert pairs == {"g o": 2}


def test_pagerank_mass_conserved(spark, sf_dir_small):
    """Ranks must stay positive and sum to ~1 (teleport + damping
    conserve mass up to the 1e-12 fixed-point rounding per node)."""
    from big_data_recommendation_system_spark.operators.graph import (
        dup_graph_pagerank,
    )

    rows = dup_graph_pagerank(spark, sf_dir_small).collect()
    assert rows, "pair graph should be non-empty at sf0.001"
    total = sum(r["pagerank"] for r in rows)
    assert abs(total - 1.0) < 1e-6 * len(rows) + 1e-9
    assert all(r["pagerank"] > 0 for r in rows)


def test_dup_graph_degrees_consistent_with_pairs(spark, sf_dir_small):
    """Σ(degree × n_docs) must equal 2×|pairs| (handshake lemma)."""
    from big_data_recommendation_system_spark.operators.graph import (
        dup_graph_degrees,
    )
    from big_data_recommendation_system_spark.operators.text_dedup import (
        minhash_lsh_pairs,
    )

    n_pairs = minhash_lsh_pairs(spark, sf_dir_small).count()
    rows = dup_graph_degrees(spark, sf_dir_small).collect()
    assert sum(r["degree"] * r["n_docs"] for r in rows) == 2 * n_pairs


def test_pagerank_matches_pure_python_model(spark, sf_dir_small):
    """The distributed fixed-point PageRank must match an independent
    plain-Python implementation of the same recurrence (same fixed-point
    rounding) node-for-node."""
    from collections import defaultdict

    from big_data_recommendation_system_spark.operators.graph import (
        PAGERANK_DAMP,
        PAGERANK_ITERS,
        dup_graph_pagerank,
    )
    from big_data_recommendation_system_spark.operators.text_dedup import (
        minhash_lsh_pairs,
    )

    pairs = [
        (r["doc_a"], r["doc_b"])
        for r in minhash_lsh_pairs(spark, sf_dir_small).collect()
    ]
    adj = defaultdict(list)
    for a, b in pairs:
        adj[a].append(b)
        adj[b].append(a)
    nodes = sorted(adj)
    n = len(nodes)

    def away(x: float) -> int:  # round half away from zero, like SQL round
        import math

        return int(math.floor(x + 0.5)) if x >= 0 else -int(math.floor(-x + 0.5))

    fp = {u: away(1e12 / n) for u in nodes}
    for _ in range(PAGERANK_ITERS):
        contrib = defaultdict(int)
        for u in nodes:
            c = fp[u] // len(adj[u])
            for v in adj[u]:
                contrib[v] += c
        fp = {
            u: away(0.15 * 1e12 / n) + away(PAGERANK_DAMP * contrib[u])
            for u in nodes
        }
    expected = {u: fp[u] / 1e12 for u in nodes}
    got = {
        r["doc_id"]: r["pagerank"]
        for r in dup_graph_pagerank(spark, sf_dir_small).collect()
    }
    assert got.keys() == expected.keys()
    for u in nodes:
        assert got[u] == expected[u], (u, got[u], expected[u])


def test_epoch_repeat_plan_invariants(spark, sf_dir_small):
    """n_repeats is floor(w) or floor(w)+1, and the realized mean per
    language tracks the configured weight (hash buckets are uniform)."""
    import math
    from collections import defaultdict

    from big_data_recommendation_system_spark.plans.packing import (
        EPOCH_WEIGHTS,
        epoch_repeat_plan,
    )

    rows = epoch_repeat_plan(spark, sf_dir_small).collect()
    agg = defaultdict(lambda: [0, 0])
    for r in rows:
        w = EPOCH_WEIGHTS.get(r["lang"], 1.0)
        assert r["n_repeats"] in (math.floor(w), math.floor(w) + 1), r
        agg[r["lang"]][0] += r["n_repeats"]
        agg[r["lang"]][1] += 1
    for lang, (tot, cnt) in agg.items():
        w = EPOCH_WEIGHTS.get(lang, 1.0)
        # 500 docs split over 5 langs → ~100 Bernoulli draws per lang;
        # allow 5 sigma on the fractional part
        frac = w - math.floor(w)
        sigma = (frac * (1 - frac) / cnt) ** 0.5 if 0 < frac < 1 else 0.0
        assert abs(tot / cnt - w) <= 5 * sigma + 1e-9, (lang, tot / cnt, w)


def test_srp_pairs_subset_and_recall(spark, sf_dir_small):
    """SRP-LSH detected pairs must be a subset of the brute-force
    cosine>=tau pair set (verification is exact, so no false positives),
    with recall in line with the band structure: p = 1 - acos(tau)/pi
    ~= 0.63 at tau=0.4, P[detect] = 1-(1-p^4)^4 ~= 0.50 — assert >= 0.3
    to leave noise margin. Brute force computed in-test over the sf0.001
    slice (500 vectors)."""
    from pyspark.sql import functions as F

    from big_data_recommendation_system_spark.operators.srp import (
        SRP_TAU,
        srp_lsh_pairs,
    )
    from big_data_recommendation_system_spark.sources.tables import load_table

    got = {
        (r["vec_a"], r["vec_b"])
        for r in srp_lsh_pairs(spark, sf_dir_small).collect()
    }
    emb = load_table(spark, sf_dir_small, "embeddings")
    dims = emb.select(
        "vec_id", F.posexplode("embedding").alias("pos", "xf")
    ).select("vec_id", "pos", F.col("xf").cast("double").alias("x")).cache()
    norms = dims.groupBy("vec_id").agg(
        F.sqrt(F.sum(F.col("x") * F.col("x"))).alias("nrm")
    )
    a = dims.select(F.col("vec_id").alias("va"), "pos", F.col("x").alias("xa"))
    b = dims.select(F.col("vec_id").alias("vb"), "pos", F.col("x").alias("xb"))
    dots = (
        a.join(b, "pos")
        .filter(F.col("va") < F.col("vb"))
        .groupBy("va", "vb")
        .agg(F.sum(F.col("xa") * F.col("xb")).alias("dot"))
    )
    exact = {
        (r["va"], r["vb"])
        for r in dots.join(
            norms.select(F.col("vec_id").alias("va"), F.col("nrm").alias("na")),
            "va",
        )
        .join(
            norms.select(F.col("vec_id").alias("vb"), F.col("nrm").alias("nb")),
            "vb",
        )
        .filter(F.col("dot") / (F.col("na") * F.col("nb")) >= SRP_TAU)
        .collect()
    }
    assert got, "SRP should detect pairs at sf0.001"
    assert got <= exact, got - exact
    assert len(got) / len(exact) >= 0.3, (len(got), len(exact))


def test_als_eval_metrics_invariants(spark, sf_dir_small):
    """The ALS offline-eval row (rows-only driver entry): exactly one
    row; top-5 hit rate on the engaged matrix must beat the global
    popularity baseline (lift > 1) — the invariant that catches a broken
    model pipeline (wrong matrix, wrong explode, cold-start regression)
    without needing a value hash for the iterative solver."""
    from big_data_recommendation_system_spark.ml.recommend import als_eval_metrics

    rows = als_eval_metrics(spark, sf_dir_small).collect()
    assert len(rows) == 1
    r = rows[0]
    assert r.n_users > 0
    assert 0.0 <= r.pop_hit_rate <= 1.0 and 0.0 <= r.als_hit_rate <= 1.0
    assert r.als_hit_rate >= 0.5, r  # implicit ALS reconstructs engagement
    assert r.lift > 1.0, r  # and beats raw popularity


def test_run_dedup_cli_end_to_end(spark, sf_dir_small, tmp_path):
    """cli/run_dedup.py (S7/S9 over the dedup substrate): build writes
    dup_pairs/dup_clusters/retention_plan Parquet, report READS them back
    and its written outputs must equal the registered (oracle-hashed)
    queries computed inline — the written snapshot is a faithful
    substrate, not a divergent copy."""
    import argparse
    import importlib
    import os
    import sys

    sys.path.insert(0, os.path.join(os.path.dirname(__file__), "..", "cli"))
    run_dedup = importlib.import_module("run_dedup")
    from big_data_recommendation_system_spark.operators import text_dedup

    out = str(tmp_path / "dedup_out")
    ns = argparse.Namespace(
        sf_dir=sf_dir_small,
        out_dir=out,
        tuning_report=True,
        scrub=True,
        calibration=True,
    )
    run_dedup.run_build(ns)
    run_dedup.run_report(ns)

    tuning_written = {
        (r.n_bands, r.rows_per_band): (r.candidate_pairs, r.stop_buckets)
        for r in spark.read.parquet(os.path.join(out, "lsh_band_tuning")).collect()
    }
    tuning_inline = {
        (r.n_bands, r.rows_per_band): (r.candidate_pairs, r.stop_buckets)
        for r in text_dedup.lsh_band_tuning_report(spark, sf_dir_small).collect()
    }
    assert tuning_written == tuning_inline and tuning_written

    pairs = spark.read.parquet(os.path.join(out, "dup_pairs"))
    want_pairs = {
        (r.doc_a, r.doc_b)
        for r in text_dedup.minhash_lsh_pairs(spark, sf_dir_small).collect()
    }
    assert {(r.doc_a, r.doc_b) for r in pairs.collect()} == want_pairs
    assert want_pairs, "sf0.001 must contain near-dups"

    rate_written = {
        r.source: (r.n_docs, r.n_kept, r.n_dropped)
        for r in spark.read.parquet(
            os.path.join(out, "reports", "dedup_rate_by_source")
        ).collect()
    }
    rate_inline = {
        r.source: (r.n_docs, r.n_kept, r.n_dropped)
        for r in text_dedup.dedup_rate_by_source(spark, sf_dir_small).collect()
    }
    assert rate_written == rate_inline

    tok_written = {
        r.source: (r.tokens_total, r.tokens_kept, r.tokens_dropped)
        for r in spark.read.parquet(
            os.path.join(out, "reports", "dedup_token_savings")
        ).collect()
    }
    tok_inline = {
        r.source: (r.tokens_total, r.tokens_kept, r.tokens_dropped)
        for r in text_dedup.dedup_token_savings(spark, sf_dir_small).collect()
    }
    assert tok_written == tok_inline

    hist = spark.read.parquet(
        os.path.join(out, "reports", "cluster_size_histogram")
    ).collect()
    clusters = spark.read.parquet(os.path.join(out, "dup_clusters"))
    assert sum(r.cluster_size * r.n_clusters for r in hist) == clusters.count()

    # substring-granularity artifacts: written spans == registered plan,
    # disk-served savings report == inline query, scrubbed_docs == the
    # registered scrub query row-for-row
    from big_data_recommendation_system_spark.plans import packing

    spans_written = {
        (r.doc_id, r.span_start, r.span_end)
        for r in spark.read.parquet(os.path.join(out, "dup_spans")).collect()
    }
    spans_inline = {
        (r.doc_id, r.span_start, r.span_end)
        for r in packing.dup_span_removal_plan(spark, sf_dir_small).collect()
    }
    assert spans_written == spans_inline and spans_written

    sav_written = {
        r.source: (r.removable_tokens, r.n_spans, r.docs_with_spans)
        for r in spark.read.parquet(
            os.path.join(out, "reports", "dup_span_savings")
        ).collect()
    }
    sav_inline = {
        r.source: (r.removable_tokens, r.n_spans, r.docs_with_spans)
        for r in packing.dup_span_savings(spark, sf_dir_small).collect()
    }
    assert sav_written == sav_inline

    scrub_written = {
        r.doc_id: (r.n_removed_tokens, r.scrubbed_text)
        for r in spark.read.parquet(os.path.join(out, "scrubbed_docs")).collect()
    }
    scrub_inline = {
        r.doc_id: (r.n_removed_tokens, r.scrubbed_text)
        for r in packing.scrub_dup_spans(spark, sf_dir_small).collect()
    }
    assert scrub_written == scrub_inline

    cal_written = {
        (r.ngram_n, r.min_span_len): (
            r.n_spans,
            r.docs_affected,
            r.scrubbed_tokens,
            r.total_tokens,
        )
        for r in spark.read.parquet(
            os.path.join(out, "span_calibration")
        ).collect()
    }
    cal_inline = {
        (r.ngram_n, r.min_span_len): (
            r.n_spans,
            r.docs_affected,
            r.scrubbed_tokens,
            r.total_tokens,
        )
        for r in packing.dup_span_calibration(spark, sf_dir_small).collect()
    }
    assert cal_written == cal_inline and cal_written

    runs = spark.read.parquet(os.path.join(out, "_pipeline_runs"))
    stages = {r.stage for r in runs.collect()}
    assert stages == {"dedup_build", "dedup_report"}


def test_run_corpus_cli_end_to_end(spark, sf_dir_small, tmp_path):
    """cli/run_corpus.py: the written manifest must satisfy every funnel
    stage's invariant when recomputed inline — survivors are exact-dup
    free, near-dup cluster representatives only, quality-kept,
    decontaminated at DECON_TAU, and the per-split pack assignment is
    the exact exclusive prefix sum of the kept token counts."""
    import argparse
    import importlib
    import os
    import sys

    sys.path.insert(0, os.path.join(os.path.dirname(__file__), "..", "cli"))
    run_corpus = importlib.import_module("run_corpus")
    from big_data_recommendation_system_spark.operators.text_dedup import (
        dup_clusters,
        retention_plan_from,
    )
    from big_data_recommendation_system_spark.plans.assembly import (
        FUNNEL_STAGES,
    )
    from big_data_recommendation_system_spark.plans.corpus_prep import (
        DECON_TAU,
        train_eval_hits_from,
    )
    from big_data_recommendation_system_spark.plans.packing import (
        PACK_BUDGET,
        funnel_doc_gates,
    )
    from big_data_recommendation_system_spark.sources.tables import load_table

    out = str(tmp_path / "corpus_out")
    ns = argparse.Namespace(sf_dir=sf_dir_small, out_dir=out, dedup_dir=None)
    run_corpus.run_build(ns)
    run_corpus.run_report(ns)

    docs = load_table(spark, sf_dir_small, "documents")
    funnel = spark.read.parquet(os.path.join(out, "funnel")).collect()
    counts = {r.drop_reason: r.n_docs for r in funnel}
    assert sum(counts.values()) == docs.count()
    assert set(counts) <= set(FUNNEL_STAGES)

    manifest = spark.read.parquet(os.path.join(out, "corpus_manifest"))
    rows = manifest.collect()
    kept_ids = [r.doc_id for r in rows]
    assert len(kept_ids) == len(set(kept_ids)) == counts["kept"]

    # stage 1: no two survivors share exact content
    hashes = [
        r.h
        for r in docs.filter(F.col("doc_id").isin(kept_ids))
        .select(F.md5("text").alias("h"))
        .collect()
    ]
    assert len(hashes) == len(set(hashes))

    # stage 2: every survivor is its near-dup cluster's representative
    plan = retention_plan_from(
        dup_clusters(spark, sf_dir_small), docs.select("doc_id", "n_chars")
    )
    losers = {r.doc_id for r in plan.filter(~F.col("keep")).collect()}
    assert not losers.intersection(kept_ids)
    assert losers, "sf0.001 must contain near-dups for this test to bite"

    # stage 3: every survivor passes every quality gate
    gates = {
        r.doc_id: r.gate for r in funnel_doc_gates(spark, sf_dir_small).collect()
    }
    assert all(gates[i] == "kept" for i in kept_ids)

    # stage 4: no kept train doc crosses the contamination threshold
    # when hits are recomputed over the shipped corpus itself
    shipped = docs.select("doc_id", "text").join(
        manifest.select("doc_id", "split"), "doc_id"
    )
    hits = train_eval_hits_from(shipped).collect()
    assert all(
        r.n_eval_hits < DECON_TAU * r.n_shingles
        for r in hits
        if r.n_shingles > 0 and r.doc_id in set(kept_ids)
    )

    # stage 5: pack assignment == exclusive prefix sum per split
    by_split = {}
    for r in sorted(rows, key=lambda r: (r.split, r.doc_id)):
        run = by_split.setdefault(r.split, [0])
        assert r.start_offset == run[0], (r.split, r.doc_id)
        assert r.pack_id == r.start_offset // PACK_BUDGET
        assert r.offset_in_pack == r.start_offset % PACK_BUDGET
        run[0] += r.n_tokens

    # reports read back consistently
    card = spark.read.parquet(os.path.join(out, "reports", "corpus_card"))
    assert card.agg(F.sum("n_docs")).first()[0] == counts["kept"]
    pstats = {
        r.split: r
        for r in spark.read.parquet(
            os.path.join(out, "reports", "packing_stats")
        ).collect()
    }
    for s, docs_tokens in by_split.items():
        assert pstats[s].total_tokens == docs_tokens[0]
        assert pstats[s].utilization > 0

    runs = spark.read.parquet(os.path.join(out, "_pipeline_runs"))
    assert {r.stage for r in runs.collect()} == {
        "corpus_build",
        "corpus_report",
    }


def test_bloom_prefilter_never_misses(spark, sf_dir_small):
    """The defining Bloom property: ZERO false negatives. Every true
    train∩eval shingle must survive the bitmap pre-filter, so the
    report's n_exact_hits equals an independently computed exact-join
    count per source, and positives bracket: exact ≤ bloom ≤ total."""
    from big_data_recommendation_system_spark.functions.text import (
        shingles,
        tokens,
    )
    from big_data_recommendation_system_spark.plans.bloom import (
        bloom_decon_prefilter,
    )
    from big_data_recommendation_system_spark.plans.corpus_prep import (
        DECON_NGRAM,
        split_bucket,
        split_label,
    )
    from big_data_recommendation_system_spark.sources.tables import load_table

    report = {r.source: r for r in
              bloom_decon_prefilter(spark, sf_dir_small).collect()}
    assert report, "empty report"

    labeled = (
        load_table(spark, sf_dir_small, "documents")
        .select(
            "source",
            split_label(split_bucket(F.col("doc_id"))).alias("split"),
            tokens(F.col("text")).alias("tok"),
        )
        .select("source", "split",
                F.explode(shingles("tok", DECON_NGRAM)).alias("s"))
    )
    eval_s = labeled.filter(F.col("split") != "train").select("s").distinct()
    truth = {
        r.source: r.n
        for r in (
            labeled.filter(F.col("split") == "train")
            .select("source", "s")
            .distinct()
            .join(eval_s, "s")
            .groupBy("source")
            .agg(F.count(F.lit(1)).alias("n"))
            .collect()
        )
    }
    for src, row in report.items():
        assert row.n_exact_hits == truth.get(src, 0), src
        assert row.n_exact_hits <= row.n_bloom_pos <= row.n_train_shingles, src
        assert row.n_false_pos == row.n_bloom_pos - row.n_exact_hits, src


def test_pq_rerank_dominates_adc(spark, sf_dir):
    """Two provable PQ-search invariants: (1) per query, the exact
    re-rank of the ADC shortlist recovers at least as many true top-k
    neighbors as raw ADC (any exact-top-k member inside the shortlist
    re-ranks into the top-k by its exact distance); (2) the shortlist
    stage gives materially usable recall on this corpus (>= 0.5 summed,
    measured ~0.7) while raw 8-byte ADC alone is allowed to be weak."""
    from big_data_recommendation_system_spark.operators.similarity import (
        TOP_K,
        pq_topk_agreement,
    )

    rows = pq_topk_agreement(spark, sf_dir).collect()
    assert len(rows) > 0
    for r in rows:
        assert 0 <= r.n_common_adc <= r.n_common_rerank <= TOP_K, r
    total = TOP_K * len(rows)
    assert sum(r.n_common_rerank for r in rows) >= 0.5 * total


def test_bpe_merge_greedy_overlap_matches_pure_python(spark):
    """The declarative gaps-and-islands merge in _bpe_merge_step must
    implement canonical BPE greedy left-to-right non-overlapping
    application — the hard case is an identical-symbol merge over a run
    ('aaaa' + merge (a,a) -> ['aa','aa'], 'aaa' -> ['aa','a'], never
    ['a','aa',...]). Compared against a character-exact pure-Python BPE
    step over a corpus engineered so step 1 learns exactly that merge."""
    from pyspark.sql import functions as F

    from big_data_recommendation_system_spark.plans.text_analysis import (
        _bpe_merge_step,
    )

    corpus = {  # word -> freq; 'a a' dominates every other pair
        "aaaa": 10,
        "aaa": 7,
        "aa": 5,
        "banana": 4,
        "aab": 3,
        "baa": 2,
    }

    def py_bpe_step(vocab):
        counts = {}
        for syms, freq in vocab:
            for x, y in zip(syms, syms[1:]):
                counts[(x, y)] = counts.get((x, y), 0) + freq
        (pa, pb), n = min(
            counts.items(), key=lambda kv: (-kv[1], kv[0][0], kv[0][1])
        )
        out = []
        for syms, freq in vocab:
            merged, i = [], 0
            while i < len(syms):
                if i + 1 < len(syms) and syms[i] == pa and syms[i + 1] == pb:
                    merged.append(pa + pb)
                    i += 2
                else:
                    merged.append(syms[i])
                    i += 1
            out.append((merged, freq))
        return out, (pa, pb), n

    vocab_rows = [(w, f, list(w)) for w, f in corpus.items()]
    vocab = spark.createDataFrame(vocab_rows, "word string, freq long, syms array<string>")
    py_vocab = [(list(w), f) for w, f in corpus.items()]

    for step in (1, 2, 3):
        vocab, rep = _bpe_merge_step(vocab, step)
        py_vocab, (pa, pb), n = py_bpe_step(py_vocab)
        r = rep.collect()[0]
        assert r.pair == f"{pa} {pb}", (step, r.pair, pa, pb)
        assert r.n_weighted == n, (step, r)
        got = {
            row.word: row.syms for row in vocab.select("word", "syms").collect()
        }
        want = {"".join(s): s for s, _ in py_vocab}
        assert got == want, (step, got, want)


def test_run_pipeline_cli_skew_report(spark, tmp_path):
    """cli/run_pipeline.py gold --skew-report: the written _skew_report
    diagnostic must equal key_skew_frame computed inline over the same
    silver clickstream (the operational measure-skew-then-salt loop as a
    CLI artifact, mirroring run_dedup/run_corpus)."""
    import argparse
    import importlib
    import json
    import os
    import sys

    sys.path.insert(0, os.path.join(os.path.dirname(__file__), "..", "cli"))
    run_pipeline = importlib.import_module("run_pipeline")
    from big_data_recommendation_system_spark.operators.skew import key_skew_frame

    from .test_reference_parity import (
        CLICKSTREAM_LINES,
        PRODUCT_LINES,
        USER_LINES,
    )

    bronze = tmp_path / "bronze"
    for topic, lines in [
        ("clickstream", CLICKSTREAM_LINES),
        ("user_events", USER_LINES),
        ("product_events", PRODUCT_LINES),
    ]:
        (bronze / topic).mkdir(parents=True)
        with open(bronze / topic / "part-0.json", "w") as f:
            for rec in lines:
                f.write(json.dumps(rec) + "\n")

    silver_dir, gold_dir = str(tmp_path / "silver"), str(tmp_path / "gold")
    run_pipeline.run_silver(
        argparse.Namespace(
            bronze_dir=str(bronze),
            silver_dir=silver_dir,
            topics="clickstream,user_events,product_events",
        )
    )
    run_pipeline.run_gold(
        argparse.Namespace(
            silver_dir=silver_dir,
            gold_dir=gold_dir,
            skew_report=True,
            skew_keys="user_id,product_id",
        )
    )

    written = spark.read.parquet(os.path.join(gold_dir, "_skew_report"))
    inline = key_skew_frame(
        spark.read.parquet(os.path.join(silver_dir, "clickstream_silver")),
        ("user_id", "product_id"),
    )
    key = lambda r: (r.key_col, r.rank)  # noqa: E731
    got = {key(r): tuple(r) for r in written.collect()}
    want = {key(r): tuple(r) for r in inline.collect()}
    assert got == want and got, (got, want)
    assert {r.key_col for r in written.collect()} == {"user_id", "product_id"}


def _write_docs(spark, tmp_path, rows):
    """Materialize a tiny documents table so table-loading queries can be
    pointed at a synthetic corpus (schema matches the driver testdata)."""
    df = spark.createDataFrame(
        rows, "doc_id long, text string, lang string, source string, n_chars long"
    )
    df.coalesce(1).write.mode("overwrite").parquet(
        str(tmp_path / "documents.parquet")
    )
    return str(tmp_path)


def test_gopher_repetition_tie_break_and_edges(spark, tmp_path):
    """Pin the defined semantics: argmax ties break to the alphabetically
    first gram; empty docs emit all-zero fractions and pass; overlapping
    grams may push char fractions past 1 (count x len is the defined
    numerator)."""
    from big_data_recommendation_system_spark.plans.text_analysis import (
        gopher_repetition_rules,
    )

    sf = _write_docs(
        spark,
        tmp_path,
        [
            # all 2-grams count 1 -> top = 'yy xx' (alphabetical), len 5,
            # text len 8 -> 0.625
            (1, "zz yy xx", "en", "s1", 8),
            (2, "", "en", "s1", 0),  # empty doc
            (3, "aa aa aa", "en", "s1", 8),  # pure repetition
        ],
    )
    rows = {r.doc_id: r for r in gopher_repetition_rules(spark, sf).collect()}
    assert rows[1].top_2gram_char_frac == 0.625
    assert rows[1].top_unigram_frac == round(1 / 3, 4)
    assert rows[2].n_tokens == 0
    assert rows[2].top_unigram_frac == 0.0
    assert rows[2].passes_repetition_rules
    assert rows[3].top_unigram_frac == 1.0
    assert rows[3].dup_unigram_frac == 1.0
    # overlapping "aa aa" occurs twice, len 5 -> 10/8 = 1.25 (defined > 1)
    assert rows[3].top_2gram_char_frac == 1.25
    assert not rows[3].passes_repetition_rules


def test_token_rarity_semantics(spark, tmp_path):
    """rarity = n * C / freq_weight: a doc of corpus-unique tokens scores
    high, a doc of the dominant token scores low; empty docs emit 0."""
    from big_data_recommendation_system_spark.plans.text_analysis import (
        token_rarity_score,
    )

    sf = _write_docs(
        spark,
        tmp_path,
        [
            (1, "common common common common", "en", "s", 27),
            (2, "common common rare", "en", "s", 18),
            (3, "", "en", "s", 0),
        ],
    )
    rows = {r.doc_id: r for r in token_rarity_score(spark, sf).collect()}
    # corpus: common x6, rare x1, C = 7
    assert rows[1].freq_weight == 24 and rows[1].n_tokens == 4
    assert rows[1].rarity_score == round(4 * 7 / 24, 4)
    assert rows[2].freq_weight == 13
    assert rows[2].rarity_score == round(3 * 7 / 13, 4)
    assert rows[3].n_tokens == 0 and rows[3].rarity_score == 0.0
    assert rows[2].rarity_score > rows[1].rarity_score


def test_doc_length_histogram_right_closed_edges(spark, tmp_path):
    """Bucket membership is right-closed: n_tokens == 16 lands in the
    first bucket, 17 in the second; cumulative share ends at 100."""
    from big_data_recommendation_system_spark.plans.packing import (
        doc_length_histogram,
    )

    sf = _write_docs(
        spark,
        tmp_path,
        [
            (1, " ".join(["w"] * 16), "en", "s", 0),
            (2, " ".join(["w"] * 17), "en", "s", 0),
            (3, " ".join(["w"] * 200), "en", "s", 0),
        ],
    )
    rows = {r.bucket: r for r in doc_length_histogram(spark, sf).collect()}
    assert rows["1_16"].n_docs == 1 and rows["1_16"].total_tokens == 16
    assert rows["17_32"].n_docs == 1 and rows["17_32"].total_tokens == 17
    assert rows["gt_128"].n_docs == 1 and rows["gt_128"].total_tokens == 200
    ordered = sorted(rows.values(), key=lambda r: r.bucket_id)
    assert ordered[-1].cum_pct_tokens == 100.0


def test_ivf_probe_sweep_invariants(spark, sf_dir):
    """Recall and candidate volume are non-decreasing in nprobe, and the
    exhaustive setting (nprobe = IVF_CENTROIDS) recalls everything."""
    from big_data_recommendation_system_spark.operators.similarity import (
        IVF_CENTROIDS,
        ivf_probe_sweep,
    )

    rows = sorted(ivf_probe_sweep(spark, sf_dir).collect(), key=lambda r: r.nprobe)
    assert [r.nprobe for r in rows][-1] == IVF_CENTROIDS
    for a, b in zip(rows, rows[1:]):
        assert b.n_candidates >= a.n_candidates
        assert b.mean_recall_at_k >= a.mean_recall_at_k
    assert rows[-1].mean_recall_at_k == 1.0


def test_mixture_weights_by_quality_invariants(spark, sf_dir):
    """Weights form a distribution; allocations never exceed the budget
    and the oversubscription flag matches the allocation arithmetic."""
    from big_data_recommendation_system_spark.plans.packing import (
        QW_BUDGET,
        mixture_weights_by_quality,
    )

    rows = mixture_weights_by_quality(spark, sf_dir).collect()
    assert rows, "report must be non-empty"
    assert abs(sum(r.quality_weight for r in rows) - 1.0) < 1e-2
    assert sum(r.alloc_tokens for r in rows) <= QW_BUDGET
    for r in rows:
        assert 0.0 <= r.quality_weight <= 1.0
        assert r.oversubscribed == (r.alloc_tokens > r.total_tokens)


def test_pinned_queries_survive_hostile_session_tz(spark, sf_dir_small):
    """The driver builds its OWN session with unknown confs; registry
    queries pin UTC per call (registry._pinned), so a session that was
    switched to a different timezone must still produce the same rows as
    the UTC session — for a timestamp-deriving query (silver hour/date
    columns) and a date-bucketed aggregate."""
    from big_data_recommendation_system_spark.registry import QUERIES

    baseline = {
        name: sorted(map(tuple, QUERIES[name](spark, sf_dir_small).collect()))
        for name in ("silver_events", "daily_stats")
    }
    spark.conf.set("spark.sql.session.timeZone", "America/New_York")
    try:
        for name, want in baseline.items():
            got = sorted(map(tuple, QUERIES[name](spark, sf_dir_small).collect()))
            assert got == want, name
        # _pinned must have reset the conf as a side effect of the call
        assert spark.conf.get("spark.sql.session.timeZone") == "UTC"
    finally:
        spark.conf.set("spark.sql.session.timeZone", "UTC")


def test_bpe_merge_step_total_when_pairs_exhausted(spark):
    """Running _bpe_merge_step past the pair supply must pass the
    vocabulary through unchanged and emit a zero-merge report row (the
    r7 crossJoin precondition is replaced by a LEFT join, making the
    operator total — safe at any BPE_MERGE_STEPS)."""
    from big_data_recommendation_system_spark.plans.text_analysis import (
        _bpe_merge_step,
    )

    vocab = spark.createDataFrame(
        [("ab", 5, ["ab"]), ("c", 3, ["c"])],
        "word string, freq long, syms array<string>",
    )
    out, rep = _bpe_merge_step(vocab, 4)
    r = rep.collect()[0]
    assert r.step == 4
    assert r.pair is None
    assert r.n_vocab_merges == 0 and r.n_weighted_merges == 0
    got = {row.word: (row.freq, row.syms) for row in out.collect()}
    assert got == {"ab": (5, ["ab"]), "c": (3, ["c"])}


def test_salted_agg_rejects_positional_salt_src():
    """salt_src / n_salts are keyword-only: a stale positional call site
    must fail with a clear TypeError at the call, not deep inside the
    column-list comprehension."""
    import pytest as _pytest

    from big_data_recommendation_system_spark.operators.skew import salted_agg

    with _pytest.raises(TypeError):
        salted_agg(None, ["k"], [], [], ["id"], 16)  # noqa: PT011


def test_spread_small_scan_plan_free_gate(spark, sf_dir_small):
    """The spread guard must (a) spread a single-file scan
    DATA-PROPORTIONALLY — ceil(file bytes / bytes-per-task) capped by
    the session's parallelism (r13: a hundreds-of-KB file no longer
    schedules defaultParallelism near-empty tasks), (b) skip the
    exchange entirely when the data fits one task, (c) leave an
    already-parallel in-memory plan untouched, and (d) never error on
    a non-file plan."""
    import os as _os

    from big_data_recommendation_system_spark.sources import tables as _t

    target = spark.sparkContext.defaultParallelism
    df = _t.load_table(spark, sf_dir_small, "documents")
    size = _os.path.getsize(_os.path.join(sf_dir_small, "documents.parquet"))
    expect = max(1, min(target, -(-size // _t._SPREAD_BYTES_PER_TASK)))
    spread = _t.spread_small_scan(df)
    if expect == 1:
        # one task of data: no exchange — the frame is returned as-is
        assert spread is df
    else:
        assert spread.rdd.getNumPartitions() == expect
    # a file big enough for >1 task still spreads (sf0.1 lineitem is
    # ~10.8 MB -> capped at the session parallelism)
    li = _t.load_table(spark, "/root/testdata/sf0.1", "lineitem")
    li_size = _os.path.getsize("/root/testdata/sf0.1/lineitem.parquet")
    li_expect = max(1, min(target, -(-li_size // _t._SPREAD_BYTES_PER_TASK)))
    assert _t.spread_small_scan(li).rdd.getNumPartitions() == li_expect
    assert li_expect > 1
    wide = spark.range(0, 1000, numPartitions=target)
    assert _t.spread_small_scan(wide) is wide


def test_bpe_apply_merges_bounds(spark, sf_dir_small):
    """Encoded token counts are bounded: each word encodes to between 1
    symbol and its character length, so per doc
    n_tokens_ws <= n_tokens_bpe <= total token chars; and because the
    trainer actually applied merges (n_weighted_merges > 0), the corpus
    total must sit strictly below the char-level baseline."""
    from pyspark.sql import functions as F

    from big_data_recommendation_system_spark.functions.text import tokens
    from big_data_recommendation_system_spark.plans.text_analysis import (
        bpe_apply_merges,
        bpe_learn_merges,
    )
    from big_data_recommendation_system_spark.sources.tables import load_table

    enc = bpe_apply_merges(spark, sf_dir_small)
    chars = (
        load_table(spark, sf_dir_small, "documents")
        .select(
            "doc_id",
            F.explode(tokens(F.col("text"))).alias("w"),
        )
        .groupBy("doc_id")
        .agg(F.sum(F.length("w")).cast("long").alias("n_chars_tok"))
    )
    joined = enc.join(chars, "doc_id", "left").collect()
    assert joined
    for r in joined:
        assert r.n_tokens_ws <= r.n_tokens_bpe, r
        assert r.n_tokens_bpe <= (r.n_chars_tok or 0) or r.n_tokens_ws == 0, r
    total_bpe = sum(r.n_tokens_bpe for r in joined)
    total_chars = sum(r.n_chars_tok or 0 for r in joined)
    merges = bpe_learn_merges(spark, sf_dir_small).collect()
    if any(m.n_weighted_merges and m.n_weighted_merges > 0 for m in merges):
        assert total_bpe < total_chars


def test_corpus_assembly_weighted_invariants(spark, sf_dir_small):
    """The weighted draw never exceeds availability; a source whose kept
    tokens cover its allocation fills it (boundary doc included, so
    fill_rate >= 1); an undersupplied source draws everything it has.
    Cross-checked against the funnel rollup's kept totals."""
    from big_data_recommendation_system_spark.plans.assembly import (
        corpus_assembly_funnel,
        corpus_assembly_weighted,
    )

    rows = corpus_assembly_weighted(spark, sf_dir_small).collect()
    assert rows
    for r in rows:
        assert r.n_drawn_docs <= r.n_kept_docs, r
        assert r.n_drawn_tokens <= r.n_kept_tokens, r
        if r.n_kept_tokens >= r.alloc_tokens > 0:
            assert r.n_drawn_tokens >= r.alloc_tokens, r
            assert r.fill_rate >= 1.0, r
        elif r.alloc_tokens > 0:
            assert r.n_drawn_docs == r.n_kept_docs, r
    funnel = {
        f.drop_reason: (f.n_docs, f.n_tokens)
        for f in corpus_assembly_funnel(spark, sf_dir_small).collect()
    }
    kept_docs, kept_tokens = funnel.get("kept", (0, 0))
    assert sum(r.n_kept_docs for r in rows) == kept_docs
    assert sum(r.n_kept_tokens for r in rows) == kept_tokens


def test_run_index_cli_end_to_end(spark, sf_dir_small, tmp_path):
    """cli/run_index.py: build writes the vector-index artifacts
    (embeddings+norms, IVF assignment, PQ codes, SRP signatures) as
    Parquet twins of the session substrates, and report's written
    diagnostics must equal the same rollups computed inline over the
    substrates — the on-disk snapshot is faithful, not a divergent
    copy."""
    import argparse
    import importlib
    import os as _os
    import sys as _sys

    _sys.path.insert(0, _os.path.join(_os.path.dirname(__file__), "..", "cli"))
    run_index = importlib.import_module("run_index")
    from pyspark.sql import functions as F

    from big_data_recommendation_system_spark.operators.emb_substrate import (
        emb_norms,
    )
    from big_data_recommendation_system_spark.operators.similarity import (
        ivf_assign_table,
        pq_codes_table,
    )
    from big_data_recommendation_system_spark.operators.srp import srp_sig_table

    out = str(tmp_path / "index_out")
    ns = argparse.Namespace(sf_dir=sf_dir_small, out_dir=out)
    run_index.run_build(ns)
    run_index.run_report(ns)

    def rows(df):
        return sorted(map(tuple, df.collect()))

    assert rows(spark.read.parquet(_os.path.join(out, "emb_norms"))) == rows(
        emb_norms(spark, sf_dir_small).withColumnRenamed("vid", "vec_id")
    )
    assert rows(spark.read.parquet(_os.path.join(out, "ivf_assign"))) == rows(
        ivf_assign_table(spark, sf_dir_small)
    )
    assert rows(spark.read.parquet(_os.path.join(out, "pq_codes"))) == rows(
        pq_codes_table(spark, sf_dir_small)
    )
    assert rows(
        spark.read.parquet(_os.path.join(out, "srp_signatures"))
    ) == rows(srp_sig_table(spark, sf_dir_small))

    # report diagnostics equal inline rollups over the substrates
    cell = spark.read.parquet(_os.path.join(out, "reports", "ivf_cell_sizes"))
    want_cell = (
        ivf_assign_table(spark, sf_dir_small)
        .groupBy("centroid_id")
        .agg(F.count(F.lit(1)).cast("long").alias("n_vectors"))
    )
    assert rows(cell) == rows(want_cell)
    assert (
        cell.agg(F.sum("n_vectors")).first()[0]
        == emb_norms(spark, sf_dir_small).count()
    )
    usage = spark.read.parquet(_os.path.join(out, "reports", "pq_code_usage"))
    assert usage.agg(F.sum("n_vectors")).first()[0] == 8 * emb_norms(
        spark, sf_dir_small
    ).count()
    bstats = spark.read.parquet(
        _os.path.join(out, "reports", "srp_bucket_stats")
    ).collect()
    assert {r.band for r in bstats} == set(range(4))
    for r in bstats:
        assert r.max_bucket >= 1 and r.candidate_pairs >= 0


def test_substrates_survive_external_clearcache(spark, sf_dir_small):
    """The driver owns its session and may clearCache() between queries:
    every substrate-backed query must re-materialize transparently
    (substrate.materialized re-persists when the storage level is gone)
    and return identical rows before and after the eviction."""
    from big_data_recommendation_system_spark.registry import QUERIES

    names = [
        "minhash_lsh_pairs",      # text pair substrate
        "ann_cosine_topk",        # emb dims/norms substrates
        "srp_lsh_pairs",          # srp sig/cand substrates
        "bpe_apply_merges",       # trained-tokenizer substrates
        "corpus_report_card",     # report-card substrate
        "dup_graph_degrees",      # graph edge substrate
        "nb_classifier_scores",   # labeled-corpus + NB model substrates
        "dsir_importance_sample", # DSIR ratio + ranked-sample substrates
    ]
    before = {
        n: sorted(map(tuple, QUERIES[n](spark, sf_dir_small).collect()))
        for n in names
    }
    spark.catalog.clearCache()
    for n in names:
        after = sorted(map(tuple, QUERIES[n](spark, sf_dir_small).collect()))
        assert after == before[n], n


def test_repeat_query_calls_do_not_grow_cache_manager(spark, sf_dir_small):
    """r8 ADVICE / r9 hygiene gate: library-path repeat invocations must
    not accumulate CacheManager entries. Session substrates register
    once per (session, corpus); per-call intermediates either unpersist
    after use (CC edge frame, BPE training steps) or use scoped
    localCheckpoint materialization (never registered in the
    CacheManager at all). A second full round over the cache-heavy
    query families must leave the CacheManager entry count exactly
    where the first round left it."""
    from big_data_recommendation_system_spark.registry import QUERIES

    names = [
        "ngram_jaccard_pairs",        # text: ngram audit slice substrate
        "simhash_near_dup_pairs",     # text: simhash band substrate
        "minhash_lsh_pairs",          # text: shingle/sig/band/pair chain
        "near_dup_clusters",          # CC loop: edge cache must unpersist
        "shingle_containment_pairs",  # text: containment index substrate
        "incremental_near_dup",       # shared band substrate (asymmetric)
        "decontamination_report",     # decon shingle substrate
        "bloom_decon_prefilter",      # bloom shingle substrate
        "train_contamination_scan",   # scoped localCheckpoint helper
        "bpe_learn_merges",           # per-step caches must unpersist
        "embedding_covariance",       # scoped gram partials
        "order_backlog_daily",        # scoped daily rollup
        "mllib_minhash_pairs",        # scoped audit slice
        "corpus_split",               # global ranker materialization
    ]

    def run_all() -> None:
        for n in names:
            QUERIES[n](spark, sf_dir_small).write.format("noop").mode(
                "overwrite"
            ).save()

    def n_cached() -> int:
        return spark._jsparkSession.sharedState().cacheManager().cachedData().size()

    run_all()
    baseline = n_cached()
    run_all()
    assert n_cached() == baseline


def test_media_payload_roundtrip_and_stdlib_wave_parity():
    """The REAL BMP/WAV codec pair: synthesized container bytes must (a)
    decode back to the generator's closed form, (b) parse with the
    STDLIB ``wave`` reader (independent spec check of the WAV bytes),
    (c) reject corrupt payloads, and (d) honor BMP's negative-height
    top-down orientation (the top-row feature must flip)."""
    import io
    import struct
    import wave

    from big_data_recommendation_system_spark.plans.multimodal import (
        _bmp_params,
        _wav_params,
        decode_media_payload,
        synthesize_media_payload,
    )

    for doc_id in list(range(24)) + [399, 4998, 4999, 123456, 123457]:
        p = synthesize_media_payload(doc_id)
        f = decode_media_payload(p)
        if doc_id % 2 == 0:
            w, h, base = _bmp_params(doc_id)
            assert (f["codec"], f["width"], f["height"]) == ("bmp", w, h)
            assert f["mean_signal"] == (h * base + (h * (h - 1)) // 2) / h
            assert f["top_row_luma"] == float(base + h - 1)
            assert len(p) == 54 + ((3 * w + 3) // 4) * 4 * h
            assert f["n_frames"] == 1
        else:
            n, base = _wav_params(doc_id)
            assert (f["codec"], f["n_frames"], f["sample_rate"]) == ("wav", n, 8000)
            assert f["mean_signal"] == (n * base + n // 2) / n
            assert len(p) == 56 + n + n % 2
            wf = wave.open(io.BytesIO(p))
            assert (
                wf.getnchannels(),
                wf.getframerate(),
                wf.getsampwidth(),
                wf.getnframes(),
            ) == (1, 8000, 1, n)
            assert wf.readframes(n) == bytes(base + (i % 2) for i in range(n))

    import pytest as _pytest

    for bad in [b"", b"XX123", b"BM" + b"\x00" * 10, b"RIFF\x00\x00\x00\x00WAVE"]:
        with _pytest.raises(ValueError):
            decode_media_payload(bad)

    # top-down BMP: negative height flips which file row is the image top
    p = bytearray(synthesize_media_payload(2))
    w, h, base = _bmp_params(2)
    struct.pack_into("<i", p, 22, -h)
    assert decode_media_payload(bytes(p))["top_row_luma"] == float(base)


def test_bmp_patch_sums_pixel_transform():
    """The 2x2 patch-grid transform must (a) tile the image exactly
    (patch dims cover w x h, patch sums total the whole-image byte sum
    decode_media_payload computes), (b) match a brute-force per-pixel
    reconstruction, and (c) respect top-down orientation (negative
    height swaps which patches are 'top')."""
    import struct

    from big_data_recommendation_system_spark.plans.multimodal import (
        _bmp_params,
        bmp_patch_sums,
        decode_media_payload,
        synthesize_media_payload,
    )

    for doc_id in [0, 2, 4, 22, 398, 4998, 123456]:
        p = synthesize_media_payload(doc_id)
        w, h, base = _bmp_params(doc_id)
        patches = bmp_patch_sums(p)
        assert [(py, px) for py, px, *_ in patches] == [
            (0, 0), (0, 1), (1, 0), (1, 1)
        ]
        assert sum(pw for py, px, pw, ph, s in patches if py == 0) == w
        assert sum(ph for py, px, pw, ph, s in patches if px == 0) == h
        f = decode_media_payload(p)
        total = round(f["mean_signal"] * 3 * w * h)
        assert sum(s for *_, s in patches) == total
        # brute force: logical row i has luma base + (h-1-i), every col
        half_h, half_w = h // 2, w // 2
        for py, px, pw, ph, s in patches:
            r0, r1 = (0, half_h) if py == 0 else (half_h, h)
            expect = 3 * pw * sum(base + (h - 1 - i) for i in range(r0, r1))
            assert s == expect, (doc_id, py, px)

    # top-down: the (0, *) patches must now sum the LOW-luma rows
    p = bytearray(synthesize_media_payload(2))
    w, h, base = _bmp_params(2)
    struct.pack_into("<i", p, 22, -h)
    up = {(py, px): s for py, px, _, _, s in bmp_patch_sums(
        synthesize_media_payload(2)
    )}
    down = {(py, px): s for py, px, _, _, s in bmp_patch_sums(bytes(p))}
    assert down[(0, 0)] == up[(1, 0)] and down[(1, 0)] == up[(0, 0)]


def test_run_index_update_equals_full_rebuild(spark, sf_dir_small, tmp_path):
    """cli/run_index.py update: appending a vector batch to an index
    built over the prefix corpus must reproduce the full-corpus build
    frame-for-frame on EVERY artifact (norms, IVF assignment, PQ codes,
    SRP signatures) — the continuous-ingestion contract, at O(batch)
    cost. Also pins the double-append guard."""
    import argparse
    import importlib
    import os as _os
    import sys as _sys

    import pytest as _pytest

    _sys.path.insert(0, _os.path.join(_os.path.dirname(__file__), "..", "cli"))
    run_index = importlib.import_module("run_index")
    from pyspark.sql import functions as F

    batch_min = 400  # suffix = the last 100 of 500 vectors

    # prefix corpus dir: embeddings with vec_id < batch_min
    prefix_dir = str(tmp_path / "prefix_sf")
    _os.makedirs(prefix_dir)
    full_emb = spark.read.parquet(
        _os.path.join(sf_dir_small, "embeddings.parquet")
    )
    full_emb.filter(F.col("vec_id") < batch_min).coalesce(1).write.parquet(
        _os.path.join(prefix_dir, "embeddings.parquet")
    )

    out_inc = str(tmp_path / "idx_inc")
    out_full = str(tmp_path / "idx_full")
    ns = lambda **kw: argparse.Namespace(**kw)  # noqa: E731
    run_index.run_build(ns(sf_dir=prefix_dir, out_dir=out_inc))
    run_index.run_update(
        ns(sf_dir=sf_dir_small, out_dir=out_inc, batch_min_vec_id=batch_min)
    )
    run_index.run_build(ns(sf_dir=sf_dir_small, out_dir=out_full))

    for name in run_index.ARTIFACTS:
        got = sorted(
            map(
                tuple,
                spark.read.parquet(_os.path.join(out_inc, name)).collect(),
            )
        )
        want = sorted(
            map(
                tuple,
                spark.read.parquet(_os.path.join(out_full, name)).collect(),
            )
        )
        assert got == want, f"{name}: incremental != full rebuild"

    # reports were re-emitted against the post-update index
    cells = spark.read.parquet(
        _os.path.join(out_inc, "reports", "ivf_cell_sizes")
    )
    assert cells.agg(F.sum("n_vectors")).first()[0] == full_emb.count()

    # double-append guard: a second update with the same batch must exit
    with _pytest.raises(SystemExit):
        run_index.run_update(
            ns(sf_dir=sf_dir_small, out_dir=out_inc, batch_min_vec_id=batch_min)
        )


def test_run_curation_cli_end_to_end(spark, sf_dir_small, tmp_path):
    """cli/run_curation.py: train writes the curation models as Parquet
    twins of the qm:* session substrates; score serves every document
    from the WRITTEN models (frozen-model path) and must reproduce the
    registered queries' score columns exactly — on-disk serving and
    in-session serving are one algebra."""
    import argparse
    import importlib
    import os as _os
    import sys as _sys

    _sys.path.insert(0, _os.path.join(_os.path.dirname(__file__), "..", "cli"))
    run_curation = importlib.import_module("run_curation")
    from big_data_recommendation_system_spark.plans import quality_models as qm

    out = str(tmp_path / "curation_out")
    ns = argparse.Namespace(sf_dir=sf_dir_small, out_dir=out)
    run_curation.run_train(ns)
    run_curation.run_score(ns)

    def rows(df):
        return sorted(map(tuple, df.collect()))

    assert rows(spark.read.parquet(_os.path.join(out, "nb_model"))) == rows(
        qm.nb_model_table(spark, sf_dir_small)
    )
    assert rows(spark.read.parquet(_os.path.join(out, "lm_unigrams"))) == rows(
        qm.lm_unigram_table(spark, sf_dir_small)
    )
    assert rows(spark.read.parquet(_os.path.join(out, "lm_bigrams"))) == rows(
        qm.lm_bigram_table(spark, sf_dir_small)
    )
    assert rows(spark.read.parquet(_os.path.join(out, "dsir_ratios"))) == rows(
        qm.dsir_ratio_table(spark, sf_dir_small)
    )

    # disk-served scores == registered query score columns
    nb_q = qm.nb_classifier_scores(spark, sf_dir_small).select(
        "doc_id", "vote_sum", "n_scored", "n_oov", "predicted_hi"
    )
    got_nb = spark.read.parquet(_os.path.join(out, "nb_scores")).select(
        "doc_id", "vote_sum", "n_scored", "n_oov", "predicted_hi"
    )
    assert rows(got_nb) == rows(nb_q)
    lm_q = qm.ngram_lm_scores(spark, sf_dir_small).select(
        "doc_id", "n_bigrams", "n_bigram_hits", "n_unigram_backoff",
        "n_oov", "lm_score_fp", "mean_bigram_prob",
    )
    got_lm = spark.read.parquet(_os.path.join(out, "lm_scores")).select(
        "doc_id", "n_bigrams", "n_bigram_hits", "n_unigram_backoff",
        "n_oov", "lm_score_fp", "mean_bigram_prob",
    )
    assert rows(got_lm) == rows(lm_q)
    ds_q = qm.dsir_importance_sample(spark, sf_dir_small).select(
        "doc_id", "n_features", "weight_fp"
    )
    got_ds = spark.read.parquet(_os.path.join(out, "dsir_weights"))
    assert rows(got_ds.select("doc_id", "n_features", "weight_fp")) == rows(ds_q)

    from big_data_recommendation_system_spark.sources.tables import load_table as _lt

    manifest = spark.read.parquet(_os.path.join(out, "curation_scores"))
    n_docs = _lt(spark, sf_dir_small, "documents").count()
    assert manifest.count() == n_docs
    assert manifest.filter("weight_fp IS NULL OR vote_sum IS NULL").count() == 0

    # r11 artifacts: frozen log-ratio model + disk-served log weights
    assert rows(
        spark.read.parquet(_os.path.join(out, "dsir_log_ratios"))
    ) == rows(qm.dsir_log_ratio_table(spark, sf_dir_small))
    lw_q = qm.dsir_log_weights(spark, sf_dir_small).select(
        "doc_id", "n_features", "log_weight_fp"
    )
    got_lw = spark.read.parquet(_os.path.join(out, "dsir_log_weights"))
    assert rows(got_lw.select("doc_id", "n_features", "log_weight_fp")) == rows(
        lw_q
    )

    # mix stage: written planners == registered (oracle-hashed) queries
    run_curation.run_mix(ns)
    from big_data_recommendation_system_spark.plans.packing import (
        unimax_mixture_plan as _ump,
    )

    assert rows(spark.read.parquet(_os.path.join(out, "doremi_weights"))) == rows(
        qm.doremi_domain_weights(spark, sf_dir_small)
    )
    assert rows(spark.read.parquet(_os.path.join(out, "unimax_plan"))) == rows(
        _ump(spark, sf_dir_small)
    )

    # r12: the planner grids are consumed, not leaves — the written
    # sampling manifests (derived from the WRITTEN grids via the _from
    # helpers) must equal the registered inline queries exactly
    from big_data_recommendation_system_spark.plans.packing import (
        unimax_budget_draw as _ubd,
    )

    assert rows(spark.read.parquet(_os.path.join(out, "doremi_sample"))) == rows(
        qm.doremi_mixture_sample(spark, sf_dir_small)
    )
    assert rows(spark.read.parquet(_os.path.join(out, "unimax_draw"))) == rows(
        _ubd(spark, sf_dir_small)
    )


def test_unimax_waterfill_caps_and_level(spark, tmp_path):
    """Constructed skewed corpus exercising the UniMax branches the
    balanced synthetic corpus never hits: one tiny source whose 2-epoch
    cap binds, two big sources splitting the remainder evenly. Budget =
    total//2; caps/allocs recomputed exactly, plus the self-consistency
    invariants: capped allocs == caps, uncapped allocs equal and above
    no source's cap, total alloc <= budget by less than one per-source
    share."""
    from big_data_recommendation_system_spark.plans.packing import (
        UNIMAX_BUDGET_DEN,
        UNIMAX_BUDGET_NUM,
        UNIMAX_MAX_EPOCHS,
        unimax_mixture_plan,
    )

    def doc(i, src, n_words):
        return (i, " ".join(f"w{i}x{j}" for j in range(n_words)), "en", src, 7)

    rows = [doc(0, "tiny", 10)]
    rows += [doc(1 + i, "big_a", 100) for i in range(10)]
    rows += [doc(11 + i, "big_b", 100) for i in range(10)]
    spark.createDataFrame(
        rows, ["doc_id", "text", "lang", "source", "n_chars"]
    ).write.parquet(str(tmp_path / "documents.parquet"))

    out = {r.source: r for r in unimax_mixture_plan(spark, str(tmp_path)).collect()}
    total = 10 + 1000 + 1000
    budget = total * UNIMAX_BUDGET_NUM // UNIMAX_BUDGET_DEN  # 1005
    assert out["tiny"].capped and out["tiny"].alloc_tokens == 10 * UNIMAX_MAX_EPOCHS
    assert abs(out["tiny"].epochs - UNIMAX_MAX_EPOCHS) < 1e-12
    level = (budget - 10 * UNIMAX_MAX_EPOCHS) // 2
    for s in ("big_a", "big_b"):
        assert not out[s].capped
        assert out[s].alloc_tokens == level
        assert out[s].alloc_tokens <= out[s].cap_tokens
    spent = sum(r.alloc_tokens for r in out.values())
    assert 0 <= budget - spent < 2  # floor remainder < n_uncapped


def test_doremi_mixture_sample_rates_and_membership(spark, sf_dir_small):
    """The planner→sampler loop, doremi side: rate_fp must be the exact
    integer derivation from the planner's own BIGINT columns (budget
    share → per-source keep rate, saturating at 10000), membership must
    be exactly the salted-md5 bucket gate, and sample_weight the single
    division — all recomputed independently in Python."""
    import hashlib

    from pyspark.sql import functions as F

    from big_data_recommendation_system_spark.plans.quality_models import (
        _DMIX_SALT,
        DOREMI_BUDGET_DEN,
        DOREMI_BUDGET_NUM,
        doremi_domain_weights,
        doremi_mixture_sample,
        doremi_sample_rates_from,
    )
    from big_data_recommendation_system_spark.sources.tables import load_table

    w = doremi_domain_weights(spark, sf_dir_small).collect()
    tot_w = sum(r.n_tokens * r.exp_w_fp for r in w)
    budget = sum(r.n_tokens for r in w) * DOREMI_BUDGET_NUM // DOREMI_BUDGET_DEN
    expect_rate = {}
    for r in w:
        target = budget * (r.n_tokens * r.exp_w_fp) // tot_w
        expect_rate[r.source] = min(10_000, target * 10_000 // max(r.n_tokens, 1))

    got_rates = {
        r.source: r.rate_fp
        for r in doremi_sample_rates_from(
            doremi_domain_weights(spark, sf_dir_small)
        ).collect()
    }
    assert got_rates == expect_rate

    def bucket(doc_id):
        h = hashlib.md5((_DMIX_SALT + str(doc_id)).encode()).hexdigest()
        return int(h[:4], 16) % 10_000

    docs = load_table(spark, sf_dir_small, "documents").select("doc_id", "source")
    expect_kept = {
        (r.doc_id, r.source, bucket(r.doc_id), expect_rate[r.source])
        for r in docs.collect()
        if bucket(r.doc_id) < expect_rate[r.source]
    }
    sample = doremi_mixture_sample(spark, sf_dir_small).collect()
    assert {
        (r.doc_id, r.source, r.mix_bucket, r.rate_fp) for r in sample
    } == expect_kept
    for r in sample:
        assert r.sample_weight == 10_000.0 / r.rate_fp

    # expected kept-token mass tracks the posterior share of the budget:
    # per source, n_tokens·rate/10000 is within one doc-rounding of target
    for r in w:
        target = budget * (r.n_tokens * r.exp_w_fp) // tot_w
        implied = r.n_tokens * expect_rate[r.source] // 10_000
        assert implied <= min(target, r.n_tokens)


def test_unimax_budget_draw_membership_and_bounds(spark, sf_dir_small):
    """The planner→sampler loop, unimax side: membership must equal the
    per-source shuffled-order prefix walk against alloc_tokens,
    recomputed independently in Python; per-source kept token mass may
    exceed alloc only by the one straddling document."""
    import hashlib

    from pyspark.sql import functions as F

    from big_data_recommendation_system_spark.functions.text import tokens
    from big_data_recommendation_system_spark.plans.packing import (
        _UNIMAX_SALT,
        unimax_budget_draw,
        unimax_mixture_plan,
    )
    from big_data_recommendation_system_spark.sources.tables import load_table

    alloc = {
        r.source: r.alloc_tokens
        for r in unimax_mixture_plan(spark, sf_dir_small).collect()
    }
    docs = (
        load_table(spark, sf_dir_small, "documents")
        .select(
            "doc_id",
            "source",
            F.size(tokens(F.col("text"))).cast("long").alias("n_tokens"),
        )
        .collect()
    )

    def key(r):
        return (
            hashlib.md5((_UNIMAX_SALT + str(r.doc_id)).encode()).hexdigest(),
            r.doc_id,
        )

    expect = {}
    by_src = {}
    for r in docs:
        by_src.setdefault(r.source, []).append(r)
    for src, rows_ in by_src.items():
        run = 0
        for r in sorted(rows_, key=key):
            if run < alloc[src]:
                expect[r.doc_id] = (src, r.n_tokens, run, alloc[src])
            run += r.n_tokens

    got = unimax_budget_draw(spark, sf_dir_small).collect()
    assert {
        r.doc_id: (r.source, r.n_tokens, r.tokens_before, r.alloc_tokens)
        for r in got
    } == expect

    # per-source kept mass exceeds alloc only via the last straddler
    kept_mass = {}
    last_straddle = {}
    for r in got:
        kept_mass[r.source] = kept_mass.get(r.source, 0) + r.n_tokens
        last_straddle[r.source] = max(last_straddle.get(r.source, 0), r.n_tokens)
    for src, mass in kept_mass.items():
        assert mass < alloc[src] + last_straddle[src]


def test_unimax_budget_draw_capped_source_keeps_all(spark, tmp_path):
    """Constructed skew (the waterfill test's corpus): the capped tiny
    source's alloc is 2 epochs ≥ its corpus, so the draw must keep every
    one of its documents; the uncapped big sources must be cut to their
    level."""
    from big_data_recommendation_system_spark.plans.packing import (
        unimax_budget_draw,
        unimax_mixture_plan,
    )

    def doc(i, src, n_words):
        return (i, " ".join(f"w{i}x{j}" for j in range(n_words)), "en", src, 7)

    rows = [doc(0, "tiny", 10)]
    rows += [doc(1 + i, "big_a", 100) for i in range(10)]
    rows += [doc(11 + i, "big_b", 100) for i in range(10)]
    spark.createDataFrame(
        rows, ["doc_id", "text", "lang", "source", "n_chars"]
    ).write.parquet(str(tmp_path / "documents.parquet"))

    plan = {r.source: r for r in unimax_mixture_plan(spark, str(tmp_path)).collect()}
    got = unimax_budget_draw(spark, str(tmp_path)).collect()
    by_src = {}
    for r in got:
        by_src.setdefault(r.source, []).append(r)
    assert plan["tiny"].capped
    assert len(by_src["tiny"]) == 1  # all docs of the capped source
    for s in ("big_a", "big_b"):
        # level = 497 tokens → 5 docs of 100 fit (4 fully, 5th straddles)
        kept = len(by_src[s])
        assert kept == plan[s].alloc_tokens // 100 + (
            1 if plan[s].alloc_tokens % 100 else 0
        )


def test_bounded_cc_round_cap_binds_on_chain(spark):
    """Constructed pathological graphs for the bounded label-propagation
    certificate: a 10-node chain outruns K=3 rounds (min-label reaches
    only K hops per round → next round still changes labels, converged
    certificate must be 0), while a 21-leaf star exceeds the degree cap
    (the hub keeps only its 8 smallest neighbors) yet stays one
    component through the leaves' own kept edges."""
    from big_data_recommendation_system_spark.operators.text_dedup import (
        BCC_DEGREE_CAP,
        _bcc_edges,
        bounded_cc_labels_from,
    )

    chain = spark.createDataFrame(
        [(i, i + 1) for i in range(9)], ["doc_a", "doc_b"]
    )
    lab = {
        r.doc_id: (r.label, r.next_label)
        for r in bounded_cc_labels_from(chain).collect()
    }
    # node u's round-K label = min over nodes within K hops = u - K
    assert lab[9][0] == 6 and lab[9][1] == 5  # round 4 still moving
    assert lab[3][0] == 0 and lab[3][1] == 0
    changed = sum(1 for l, n in lab.values() if l != n)
    assert changed > 0  # certificate would be converged_within_k = 0

    star = spark.createDataFrame(
        [(0, i) for i in range(1, 21)], ["doc_a", "doc_b"]
    )
    edges = _bcc_edges(star, BCC_DEGREE_CAP).collect()
    hub_out = [e for e in edges if e.u == 0]
    assert len(hub_out) == BCC_DEGREE_CAP  # the cap binds on the hub
    assert len(edges) == BCC_DEGREE_CAP + 20  # each leaf keeps its edge
    slab = {
        r.doc_id: (r.label, r.next_label)
        for r in bounded_cc_labels_from(star).collect()
    }
    assert all(l == 0 and n == 0 for l, n in slab.values())


def test_winnowing_dup_pairs_guarantee_and_df_cap(spark, tmp_path):
    """Constructed corpus for the winnowing pair detector: (a) two docs
    sharing a 30-token varied run must share fingerprints (the
    Schleimer guarantee: any shared run >= w+k-1 tokens yields at least
    one common fingerprint — a 30-token run yields far more than
    MIN_SHARED) and be emitted as a pair with their shared count; (b) a
    cohort of WINNOW_MAX_DF+6 identical docs makes every one of its
    fingerprints a stop-fingerprint (df cap binds), so NO pair from the
    cohort survives."""
    from big_data_recommendation_system_spark.plans.text_analysis import (
        WINNOW_MAX_DF,
        winnowing_dup_pairs,
    )

    shared = " ".join(f"s{i}" for i in range(30))
    boiler = " ".join(f"b{i}" for i in range(20))
    rows = [
        (0, "unique0 " + shared + " tail0 x y z", "en", "a", 1),
        (1, "other1 prefix " + shared + " different suffix here", "en", "a", 1),
        (2, "totally unrelated words nothing in common qqq www eee rrr ttt yyy uuu", "en", "a", 1),
    ]
    cohort_start = 10
    for i in range(WINNOW_MAX_DF + 6):
        rows.append((cohort_start + i, boiler, "en", "b", 1))
    spark.createDataFrame(
        rows, ["doc_id", "text", "lang", "source", "n_chars"]
    ).write.parquet(str(tmp_path / "documents.parquet"))

    got = winnowing_dup_pairs(spark, str(tmp_path)).collect()
    pairs = {(r.doc_a, r.doc_b): r for r in got}
    assert (0, 1) in pairs  # the guaranteed shared-run pair
    r = pairs[(0, 1)]
    assert r.n_shared >= 2 and 0 < r.overlap <= 1.0
    assert r.overlap == r.n_shared / min(r.n_fp_a, r.n_fp_b)
    # doc 2 shares nothing
    assert not any(2 in p for p in pairs)
    # the boilerplate cohort is fully df-capped away
    assert not any(a >= cohort_start or b >= cohort_start for a, b in pairs)


def test_model_gate_dsir_form_config(spark, sf_dir_small, monkeypatch):
    """DSIR_GATE_FORM='log' swaps the gate's DSIR axis to the
    paper-fidelity log-ratio ranking: per-source n_dsir_pass must equal
    the recompute from dsir_log_weights' selected flags, and differ from
    the linear form exactly where the two rankings disagree (the
    orderings can coincide on easy corpora — assert consistency, not
    difference)."""
    from big_data_recommendation_system_spark.plans import quality_models as qm

    def per_source_pass(report):
        return {r.source: r.n_dsir_pass for r in report.collect()}

    linear = per_source_pass(qm.model_gate_report(spark, sf_dir_small))
    monkeypatch.setattr(qm, "DSIR_GATE_FORM", "log")
    log_form = per_source_pass(qm.model_gate_report(spark, sf_dir_small))

    expect = {}
    for r in qm.dsir_log_weights(spark, sf_dir_small).collect():
        expect[r.source] = expect.get(r.source, 0) + int(r.selected)
    # sources with zero log-selected docs still appear in the report
    assert {s: log_form.get(s, 0) for s in log_form} == {
        s: expect.get(s, 0) for s in log_form
    }
    # both forms keep the same global count (same keep share, same ranker)
    assert sum(log_form.values()) == sum(linear.values())
