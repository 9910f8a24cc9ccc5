"""Query registry: every implemented operator exposed as a named query
plus (where SQL-expressible) a DuckDB oracle equivalent.

This is the single source of truth consumed by ``__spark_entry__.py``
(driver contract) and by the oracle test suite. Column names are aliased
identically on both sides — the driver's comparator sorts columns by name
before hashing.
"""

from __future__ import annotations

import functools
import os
import tempfile
import zipfile
from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

from .ml import recommend
from .ml import similarity as ml_similarity
from .operators import (
    asof,
    dedup,
    graph,
    linalg,
    merge,
    rangejoin,
    similarity,
    skew,
    srp,
    text_dedup,
    topk,
    windows,
)
from .plans import (
    assembly,
    bloom,
    clickstream,
    corpus_prep,
    gold,
    joins,
    multimodal,
    packing,
    pii,
    profiling,
    quality_models,
    relational,
    retention,
    silver,
    text_analysis,
    timeseries,
)
from .quality import report as dq_report
from .streaming import attribution, feature_twins

QueryFn = Callable[[SparkSession, str], DataFrame]


_PKG_DIR = os.path.dirname(os.path.abspath(__file__))
_PKG_NAME = os.path.basename(_PKG_DIR)


def _ship_package(spark: SparkSession) -> None:
    """Make this package importable on executors/python workers regardless
    of the caller's cwd (Python-side operators — mapInPandas,
    applyInPandasWithState — are pickled by reference and unpickled on
    workers). Zips the package once per session and addPyFile()s it; the
    same mechanism a cluster deployment would use."""
    try:
        if spark.conf.get("bdrs.pyfiles.shipped", "false") == "true":
            return
    except Exception:
        pass
    zip_path = _build_pkg_zip()
    spark.sparkContext.addPyFile(zip_path)
    spark.conf.set("bdrs.pyfiles.shipped", "true")


@functools.lru_cache(maxsize=1)
def _build_pkg_zip() -> str:
    """Zip the package for addPyFile, once per process (memoized — the
    sources cannot change under a running driver, so there is no point
    re-statting every package file's mtime on every query call)."""
    zip_path = os.path.join(
        tempfile.gettempdir(), f"bdrs_pkg_{os.getpid()}.zip"
    )
    src_files = [
        os.path.join(root, fname)
        for root, _dirs, files in os.walk(_PKG_DIR)
        for fname in files
        if fname.endswith(".py")
    ]
    stale = not os.path.exists(zip_path) or any(
        os.path.getmtime(f) > os.path.getmtime(zip_path) for f in src_files
    )
    if stale:
        with zipfile.ZipFile(zip_path, "w") as zf:
            for full in src_files:
                rel = os.path.join(_PKG_NAME, os.path.relpath(full, _PKG_DIR))
                zf.write(full, rel)
    return zip_path


def _pinned(fn: QueryFn) -> QueryFn:
    """Pin session state the plans rely on, whatever session the caller
    built: UTC timezone (hour()/to_date() are session-TZ-dependent and the
    oracle compares naive-UTC), and worker-side importability of this
    package (see _ship_package)."""

    def wrapper(spark: SparkSession, sf_dir: str) -> DataFrame:
        spark.conf.set("spark.sql.session.timeZone", "UTC")
        _ship_package(spark)
        return fn(spark, sf_dir)

    wrapper.__name__ = fn.__name__
    wrapper.__doc__ = fn.__doc__
    return wrapper


_RAW_QUERIES: dict[str, QueryFn] = {
    "q1_pricing_summary": relational.q1_pricing_summary,
    "q3_shipping_priority": relational.q3_shipping_priority,
    "q5_regional_revenue": relational.q5_regional_revenue,
    "q6_forecast_revenue": relational.q6_forecast_revenue,
    "q10_returned_revenue": relational.q10_returned_revenue,
    "q14_promo_share": relational.q14_promo_share,
    "q18_large_orders": relational.q18_large_orders,
    "q15_top_suppliers": relational.q15_top_suppliers,
    "q4_priority_exists": relational.q4_priority_exists,
    "q7_volume_shipping": relational.q7_volume_shipping,
    "q13_order_count_distribution": relational.q13_order_count_distribution,
    "q19_disjunctive_revenue": relational.q19_disjunctive_revenue,
    "q22_idle_rich_customers": relational.q22_idle_rich_customers,
    "q2_min_price_supplier": relational.q2_min_price_supplier,
    "q8_market_share": relational.q8_market_share,
    "q9_product_type_profit": relational.q9_product_type_profit,
    "q11_important_part_value": relational.q11_important_part_value,
    "q12_late_shipment_priority": relational.q12_late_shipment_priority,
    "q16_part_supplier_variety": relational.q16_part_supplier_variety,
    "q20_heavy_shippers": relational.q20_heavy_shippers,
    "q21_sole_return_suppliers": relational.q21_sole_return_suppliers,
    "orders_priority_rollup": relational.orders_priority_rollup,
    "daily_event_pivot": relational.daily_event_pivot,
    "cohort_retention": retention.cohort_retention,
    "daily_type_cube": retention.daily_type_cube,
    "conversion_funnel": retention.conversion_funnel,
    "view_purchase_attribution": attribution.view_purchase_attribution,
    "attribution_delay_stats": attribution.attribution_delay_stats,
    "silver_events": silver.silver_events,
    "clean_clickstream": clickstream.clean_clickstream_query,
    "clean_users": clickstream.clean_users_query,
    "clean_products": clickstream.clean_products_query,
    "product_summary": clickstream.product_summary_query,
    "ref_user_summary": clickstream.ref_user_summary_query,
    "ref_daily_stats": clickstream.ref_daily_stats_query,
    "ref_engagement_metrics": clickstream.ref_engagement_metrics_query,
    "user_features_batch": feature_twins.user_features_batch,
    "product_features_batch": feature_twins.product_features_batch,
    "srp_signatures": srp.srp_signatures,
    "srp_lsh_pairs": srp.srp_lsh_pairs,
    "srp_incremental_pairs": srp.srp_incremental_pairs,
    "user_summary": gold.user_summary,
    "daily_stats": gold.daily_stats,
    "engagement_metrics": gold.engagement_metrics,
    "user_rfm_segments": gold.user_rfm_segments,
    "latest_event_per_user": dedup.latest_event_per_user,
    "first_event_per_user_type_day": dedup.first_event_per_user_type_day,
    "dedup_exact_events": dedup.dedup_exact_events,
    "events_upsert_corrections": merge.events_upsert_corrections,
    "user_tier_scd2": merge.user_tier_scd2,
    "purchases_with_prior_tier": rangejoin.purchases_with_prior_tier,
    "event_sequences": windows.event_sequences,
    "user_sessions": windows.user_sessions,
    "user_value_quartiles": windows.user_value_quartiles,
    "trailing_hour_counts": windows.trailing_hour_counts,
    "top_event_types_per_user": topk.top_event_types_per_user,
    "dq_rule_stats": dq_report.dq_rule_stats,
    "dq_daily_validity": dq_report.dq_daily_validity,
    "dq_trend": dq_report.dq_trend,
    "text_stats": text_analysis.text_stats,
    "lang_id": text_analysis.lang_id,
    "doc_fingerprints": text_analysis.doc_fingerprints,
    "bpe_token_stats": text_analysis.bpe_token_stats,
    "vocab_df_stats": text_analysis.vocab_df_stats,
    "rare_token_quality": text_analysis.rare_token_quality,
    "gopher_repetition_rules": text_analysis.gopher_repetition_rules,
    "token_rarity_score": text_analysis.token_rarity_score,
    "corpus_report_card": text_analysis.corpus_report_card,
    "source_vocab_overlap": text_analysis.source_vocab_overlap,
    "tfidf_top_terms": text_analysis.tfidf_top_terms,
    "value_outliers_by_type": profiling.value_outliers_by_type,
    "approx_percentiles_by_type": profiling.approx_percentiles_by_type,
    "price_quantity_corr": profiling.price_quantity_corr,
    "lang_confusion": text_analysis.lang_confusion,
    "sentence_dedup_stats": packing.sentence_dedup_stats,
    "shingle_containment_pairs": text_dedup.shingle_containment_pairs,
    "embedding_quantize": similarity.embedding_quantize,
    "kmeans_step": similarity.kmeans_step,
    "kmeans_refine": similarity.kmeans_refine,
    "daily_gapfill": timeseries.daily_gapfill,
    "daily_burst_detection": timeseries.daily_burst_detection,
    "order_backlog_daily": timeseries.order_backlog_daily,
    "profile_events": profiling.profile_events,
    "value_percentiles_by_type": profiling.value_percentiles_by_type,
    "corpus_split": corpus_prep.corpus_split,
    "doc_repetition_stats": corpus_prep.doc_repetition_stats,
    "corpus_prep_summary": corpus_prep.corpus_prep_summary,
    "decontamination_report": corpus_prep.decontamination_report,
    "train_contamination_scan": corpus_prep.train_contamination_scan,
    "corpus_assembly_funnel": assembly.corpus_assembly_funnel,
    "corpus_assembly_weighted": assembly.corpus_assembly_weighted,
    "cross_detector_dup_clusters": text_dedup.cross_detector_dup_clusters,
    "bloom_decon_prefilter": bloom.bloom_decon_prefilter,
    "corpus_shuffle": corpus_prep.corpus_shuffle,
    "curriculum_order": corpus_prep.curriculum_order,
    "token_budget_sample": corpus_prep.token_budget_sample,
    "pii_scrub": pii.pii_scrub,
    "mixture_sample": packing.mixture_sample,
    "mixture_plan": packing.mixture_plan,
    "mixture_weights_by_quality": packing.mixture_weights_by_quality,
    "source_vocab_divergence": text_analysis.source_vocab_divergence,
    "epoch_repeat_plan": packing.epoch_repeat_plan,
    "sequence_packing": packing.sequence_packing,
    "packing_summary": packing.packing_summary,
    "chunk_documents": packing.chunk_documents,
    "span_dedup_stats": packing.span_dedup_stats,
    "filter_funnel_report": packing.filter_funnel_report,
    "doc_length_histogram": packing.doc_length_histogram,
    "balanced_sample": packing.balanced_sample,
    "ngram_jaccard_pairs": text_dedup.ngram_jaccard_pairs,
    "lsh_band_tuning_report": text_dedup.lsh_band_tuning_report,
    "minhash_lsh_pairs": text_dedup.minhash_lsh_pairs,
    "incremental_near_dup": text_dedup.incremental_near_dup,
    "near_dup_clusters": text_dedup.near_dup_clusters,
    "cluster_size_histogram": text_dedup.cluster_size_histogram,
    "simhash_fingerprints": text_dedup.simhash_fingerprints,
    "simhash_near_dup_pairs": text_dedup.simhash_near_dup_pairs,
    "ann_cosine_topk": similarity.ann_cosine_topk,
    "cosine_topk_fast": similarity.cosine_topk_fast_query,
    "cosine_topk_agreement": similarity.cosine_topk_agreement,
    "ann_ivf_topk": similarity.ann_ivf_topk,
    "ivf_probe_sweep": similarity.ivf_probe_sweep,
    "pq_codes": similarity.pq_codes,
    "pq_topk_agreement": similarity.pq_topk_agreement,
    "embedding_near_dup_pairs": similarity.embedding_near_dup_pairs,
    "embedding_clusters": similarity.embedding_clusters,
    "semdedup_plan": similarity.semdedup_plan,
    "contrastive_triplets": similarity.contrastive_triplets,
    "knn_label_eval": similarity.knn_label_eval,
    "cluster_label_purity": similarity.cluster_label_purity,
    "item_cooccurrence": recommend.item_cooccurrence,
    "als_recommendations": recommend.als_recommendations,
    "als_eval_metrics": recommend.als_eval_metrics,
    "als_topk_agreement": recommend.als_topk_agreement,
    "media_features": multimodal.media_features,
    "media_preprocess_plan": multimodal.media_preprocess_plan,
    "media_decoded_features": multimodal.media_decoded_features,
    "media_decoded_preprocess_plan": multimodal.media_decoded_preprocess_plan,
    "dedup_retention_plan": text_dedup.dedup_retention_plan,
    "dup_detector_overlap": text_dedup.dup_detector_overlap,
    "dedup_token_savings": text_dedup.dedup_token_savings,
    "dedup_rate_by_source": text_dedup.dedup_rate_by_source,
    "cross_source_dup_matrix": text_dedup.cross_source_dup_matrix,
    "dup_graph_pagerank": graph.dup_graph_pagerank,
    "lsh_recall_report": text_dedup.lsh_recall_report,
    "dup_graph_degrees": graph.dup_graph_degrees,
    "session_funnel_paths": retention.session_funnel_paths,
    "frequent_ngrams": text_analysis.frequent_ngrams,
    "quality_threshold_sweep": text_analysis.quality_threshold_sweep,
    "bpe_pair_counts": text_analysis.bpe_pair_counts,
    "bpe_learn_merges": text_analysis.bpe_learn_merges,
    "bpe_apply_merges": text_analysis.bpe_apply_merges,
    "tokenizer_fertility_by_source": text_analysis.tokenizer_fertility_by_source,
    "embedding_covariance": linalg.embedding_covariance,
    "pca_explained_variance": linalg.pca_explained_variance,
    "approx_distinct_daily": skew.approx_distinct_daily,
    "user_engagement_salted": skew.user_engagement_salted,
    "user_tenure_salted_join": skew.user_tenure_salted_join,
    "key_skew_report": skew.key_skew_report,
    "als_input_matrix": recommend.als_input_matrix,
    "users_without_purchase": joins.users_without_purchase,
    "orders_with_returns": joins.orders_with_returns,
    "small_quantity_revenue": joins.small_quantity_revenue,
    "events_with_last_signup": asof.events_with_last_signup,
    "mllib_minhash_pairs": ml_similarity.mllib_minhash_pairs,
    "mllib_minhash_agreement": ml_similarity.mllib_minhash_agreement,
    "nb_quality_model": quality_models.nb_quality_model,
    "nb_classifier_scores": quality_models.nb_classifier_scores,
    "nb_classifier_eval": quality_models.nb_classifier_eval,
    "ngram_lm_scores": quality_models.ngram_lm_scores,
    "dsir_importance_sample": quality_models.dsir_importance_sample,
    "model_gate_report": quality_models.model_gate_report,
    "model_gate_disagreement": quality_models.model_gate_disagreement,
    "nb_calibration_sweep": quality_models.nb_calibration_sweep,
    "pca_invariants": linalg.pca_invariants,
    "approx_distinct_agreement": skew.approx_distinct_agreement,
    "approx_percentile_agreement": profiling.approx_percentile_agreement,
    "corpus_assembly_semdedup": assembly.corpus_assembly_semdedup,
    "media_pixel_stats": multimodal.media_pixel_stats,
    "dup_span_removal_plan": packing.dup_span_removal_plan,
    "dup_span_savings": packing.dup_span_savings,
    "scrub_dup_spans": packing.scrub_dup_spans,
    "incremental_dup_spans": packing.incremental_dup_spans,
    "dup_span_calibration": packing.dup_span_calibration,
    "unimax_mixture_plan": packing.unimax_mixture_plan,
    "semdedup_incremental": similarity.semdedup_incremental,
    "ccnet_perplexity_buckets": quality_models.ccnet_perplexity_buckets,
    "dsir_log_weights": quality_models.dsir_log_weights,
    "doremi_domain_weights": quality_models.doremi_domain_weights,
    "winnowing_fingerprints": text_analysis.winnowing_fingerprints,
    # r12: planner→sampler loop closed — the data-derived mixture
    # planners drive the same deterministic draw paths the hand-set
    # plans do (r11 VERDICT next-round #2)
    "doremi_mixture_sample": quality_models.doremi_mixture_sample,
    "unimax_budget_draw": packing.unimax_budget_draw,
    # r12: K-round degree-capped label propagation with a hash-anchored
    # convergence certificate (giant-component hardening)
    "bounded_cc_certificate": text_dedup.bounded_cc_certificate,
    # r12: fifth near-dup detector — winnowed fingerprint inverted-index
    # pairs (Schleimer et al. 2003), feeding dup_detector_overlap
    "winnowing_dup_pairs": text_analysis.winnowing_dup_pairs,
    # r12: its batch-vs-index incremental form (asymmetric posting join)
    "incremental_winnow_matches": text_dedup.incremental_winnow_matches,
}

# The driver's correctness harness checks only the FIRST 50 registry
# entries per round, so ordering is a verification-coverage decision, not
# cosmetics (see the r2-r12 rotation history in git). Round-13 rotation
# (r12 VERDICT next-round #10, standing convention): the 5 r12
# registrations (never driver-checked) + ALL 33 remaining r9-checked
# rows (at the 4-round staleness boundary this round — every one must be
# taken) + 12 from the head of the r11 block to fill 50. After this
# window runs, nothing oracled is staler than 3 driver rounds for a
# fifth consecutive round; the r10-checked block (exactly 50) leads the
# r14 queue.
_PRIORITY_ORDER = [
    # -- the 5 r12 registrations (never driver-checked before r13):

    "doremi_mixture_sample",
    "unimax_budget_draw",
    "bounded_cc_certificate",
    "winnowing_dup_pairs",
    "incremental_winnow_matches",
    # -- r9-checked remainder (33; last driver exposure round 9 —
    # 4-round staleness boundary at r13):
    "dup_graph_degrees",
    "dup_graph_pagerank",
    "embedding_clusters",
    "embedding_covariance",
    "incremental_near_dup",
    "kmeans_refine",
    "lsh_band_tuning_report",
    "lsh_recall_report",
    "media_decoded_features",
    "media_decoded_preprocess_plan",
    "minhash_lsh_pairs",
    "model_gate_report",
    "nb_calibration_sweep",
    "nb_classifier_eval",
    "nb_classifier_scores",
    "nb_quality_model",
    "near_dup_clusters",
    "ngram_jaccard_pairs",
    "ngram_lm_scores",
    "order_backlog_daily",
    "ref_daily_stats",
    "semdedup_plan",
    "sequence_packing",
    "shingle_containment_pairs",
    "simhash_near_dup_pairs",
    "srp_incremental_pairs",
    "srp_lsh_pairs",
    "srp_signatures",
    "text_stats",
    "token_budget_sample",
    "tokenizer_fertility_by_source",
    "train_contamination_scan",
    "user_rfm_segments",
    # -- the 12 oldest r11-checked rows (head of the r11 block; the
    # other 38 sit behind the r10 block in the queue):
    "mixture_plan",
    "pca_invariants",
    "approx_distinct_agreement",
    "approx_percentile_agreement",
    "corpus_assembly_semdedup",
    "media_pixel_stats",
    "dup_span_removal_plan",
    "dup_span_savings",
    "scrub_dup_spans",
    "incremental_dup_spans",
    "ccnet_perplexity_buckets",
    "winnowing_fingerprints",
    # ---- driver window ends here (50) ------------------------------------
    # -- r10-checked (exactly 50; 3 rounds stale after r13 — they ARE
    # the r14 window):
    "user_features_batch",
    "product_features_batch",
    "top_event_types_per_user",
    "doc_fingerprints",
    "lang_id",
    "simhash_fingerprints",
    "item_cooccurrence",
    "events_with_last_signup",
    "orders_with_returns",
    "ref_engagement_metrics",
    "trailing_hour_counts",
    "silver_events",
    "clean_clickstream",
    "clean_users",
    "clean_products",
    "user_summary",
    "product_summary",
    "daily_stats",
    "engagement_metrics",
    "dq_rule_stats",
    "user_value_quartiles",
    "event_sequences",
    "user_sessions",
    "latest_event_per_user",
    "dedup_exact_events",
    "key_skew_report",
    "curriculum_order",
    "source_vocab_divergence",
    "small_quantity_revenue",
    "orders_priority_rollup",
    "q1_pricing_summary",
    "q2_min_price_supplier",
    "q3_shipping_priority",
    "q4_priority_exists",
    "q5_regional_revenue",
    "q6_forecast_revenue",
    "q7_volume_shipping",
    "q8_market_share",
    "q9_product_type_profit",
    "q10_returned_revenue",
    "q11_important_part_value",
    "q13_order_count_distribution",
    "q14_promo_share",
    "q15_top_suppliers",
    "q16_part_supplier_variety",
    "q18_large_orders",
    "q19_disjunctive_revenue",
    "q20_heavy_shippers",
    "q21_sole_return_suppliers",
    "q22_idle_rich_customers",
    # -- r11-checked remainder (38):
    "als_input_matrix",
    "balanced_sample",
    "bpe_token_stats",
    "chunk_documents",
    "cohort_retention",
    "conversion_funnel",
    "corpus_prep_summary",
    "corpus_report_card",
    "corpus_shuffle",
    "daily_gapfill",
    "daily_type_cube",
    "doc_length_histogram",
    "doc_repetition_stats",
    "dq_daily_validity",
    "dq_trend",
    "events_upsert_corrections",
    "filter_funnel_report",
    "first_event_per_user_type_day",
    "gopher_repetition_rules",
    "mixture_sample",
    "mixture_weights_by_quality",
    "packing_summary",
    "pii_scrub",
    "profile_events",
    "purchases_with_prior_tier",
    "q12_late_shipment_priority",
    "source_vocab_overlap",
    "span_dedup_stats",
    "token_rarity_score",
    "user_engagement_salted",
    "user_tenure_salted_join",
    "users_without_purchase",
    "value_percentiles_by_type",
    "view_purchase_attribution",
    "vocab_df_stats",
    "ann_cosine_topk",
    "ann_ivf_topk",
    "attribution_delay_stats",
    # -- r12-checked (the CORRECTNESS_r12 window; freshest):
    "dsir_log_weights",
    "mllib_minhash_agreement",
    "dup_span_calibration",
    "semdedup_incremental",
    "doremi_domain_weights",
    "unimax_mixture_plan",
    "model_gate_disagreement",
    "bpe_pair_counts",
    "cluster_label_purity",
    "cosine_topk_agreement",
    "daily_burst_detection",
    "daily_event_pivot",
    "embedding_near_dup_pairs",
    "embedding_quantize",
    "epoch_repeat_plan",
    "frequent_ngrams",
    "ivf_probe_sweep",
    "kmeans_step",
    "knn_label_eval",
    "lang_confusion",
    "media_features",
    "media_preprocess_plan",
    "pq_codes",
    "pq_topk_agreement",
    "price_quantity_corr",
    "quality_threshold_sweep",
    "rare_token_quality",
    "ref_user_summary",
    "sentence_dedup_stats",
    "session_funnel_paths",
    "tfidf_top_terms",
    "user_tier_scd2",
    "value_outliers_by_type",
    "als_topk_agreement",
    "bloom_decon_prefilter",
    "bpe_apply_merges",
    "bpe_learn_merges",
    "cluster_size_histogram",
    "contrastive_triplets",
    "corpus_assembly_funnel",
    "corpus_assembly_weighted",
    "corpus_split",
    "cross_detector_dup_clusters",
    "cross_source_dup_matrix",
    "decontamination_report",
    "dedup_rate_by_source",
    "dedup_retention_plan",
    "dedup_token_savings",
    "dsir_importance_sample",
    "dup_detector_overlap",
    # rows-only by design (no SQL oracle; driver records rows-only):
    # pca: driver-side eigensolve of the collected 64x64 matrix (data
    #   pass is the hash-verified embedding_covariance); pca_invariants
    #   (oracled, r10) hashes its exact-integer trace + certificates;
    # als_recommendations / als_eval_metrics: iterative MLlib ALS,
    #   non-deterministic factor init — pytest pins hit-rate lift vs the
    #   popularity baseline; the SERVING path is hash-anchored by
    #   als_topk_agreement (oracled);
    # mllib_minhash_pairs: approxSimilarityJoin internals — pytest pins
    #   recall >= 0.9 vs the hash-verified minhash_lsh_pairs; as of r11
    #   also hash-anchored by the ORACLED mllib_minhash_agreement
    #   (exact-side pair count + recall/subset certificates);
    # approx_distinct_daily / approx_percentiles_by_type: sketches
    #   differ across engines — rows carry exact-count / RANK
    #   certificates, additionally pytest-pinned vs exact twins; each
    #   also has an ORACLED agreement companion (r10) that hashes the
    #   exact side + the certificates;
    # cosine_topk_fast: summation-order ulps — neighbor-set agreement
    #   is the hash-verified cosine_topk_agreement.
    "pca_explained_variance",
    "als_recommendations",
    "als_eval_metrics",
    "mllib_minhash_pairs",
    "approx_distinct_daily",
    "approx_percentiles_by_type",
    "cosine_topk_fast",
]

assert set(_PRIORITY_ORDER) == set(_RAW_QUERIES), (
    sorted(set(_PRIORITY_ORDER) ^ set(_RAW_QUERIES))
)
assert len(_PRIORITY_ORDER) == len(_RAW_QUERIES)

QUERIES: dict[str, QueryFn] = {
    name: _pinned(_RAW_QUERIES[name]) for name in _PRIORITY_ORDER
}

ORACLES: dict[str, str] = {
    "q1_pricing_summary": relational.Q1_SQL,
    "q3_shipping_priority": relational.Q3_SQL,
    "q5_regional_revenue": relational.Q5_SQL,
    "q6_forecast_revenue": relational.Q6_SQL,
    "q10_returned_revenue": relational.Q10_SQL,
    "q14_promo_share": relational.Q14_SQL,
    "q18_large_orders": relational.Q18_SQL,
    "q15_top_suppliers": relational.Q15_SQL,
    "q4_priority_exists": relational.Q4_SQL,
    "q7_volume_shipping": relational.Q7_SQL,
    "q13_order_count_distribution": relational.Q13_SQL,
    "q19_disjunctive_revenue": relational.Q19_SQL,
    "q22_idle_rich_customers": relational.Q22_SQL,
    "q2_min_price_supplier": relational.Q2_SQL,
    "q8_market_share": relational.Q8_SQL,
    "q9_product_type_profit": relational.Q9_SQL,
    "q11_important_part_value": relational.Q11_SQL,
    "q12_late_shipment_priority": relational.Q12_SQL,
    "q16_part_supplier_variety": relational.Q16_SQL,
    "q20_heavy_shippers": relational.Q20_SQL,
    "q21_sole_return_suppliers": relational.Q21_SQL,
    "orders_priority_rollup": relational.ORDERS_PRIORITY_ROLLUP_SQL,
    "daily_event_pivot": relational.DAILY_EVENT_PIVOT_SQL,
    "cohort_retention": retention.COHORT_RETENTION_SQL,
    "daily_type_cube": retention.DAILY_TYPE_CUBE_SQL,
    "conversion_funnel": retention.CONVERSION_FUNNEL_SQL,
    "view_purchase_attribution": attribution.VIEW_PURCHASE_ATTRIBUTION_SQL,
    "attribution_delay_stats": attribution.ATTRIBUTION_DELAY_STATS_SQL,
    "silver_events": silver.SILVER_EVENTS_SQL,
    "clean_clickstream": clickstream.CLEAN_CLICKSTREAM_SQL,
    "clean_users": clickstream.CLEAN_USERS_SQL,
    "clean_products": clickstream.CLEAN_PRODUCTS_SQL,
    "product_summary": clickstream.PRODUCT_SUMMARY_SQL,
    "ref_user_summary": clickstream.REF_USER_SUMMARY_SQL,
    "ref_daily_stats": clickstream.REF_DAILY_STATS_SQL,
    "ref_engagement_metrics": clickstream.REF_ENGAGEMENT_METRICS_SQL,
    "user_features_batch": feature_twins.USER_FEATURES_BATCH_SQL,
    "product_features_batch": feature_twins.PRODUCT_FEATURES_BATCH_SQL,
    "srp_signatures": srp.SRP_SIGNATURES_SQL,
    "srp_lsh_pairs": srp.SRP_LSH_PAIRS_SQL,
    "srp_incremental_pairs": srp.SRP_INCREMENTAL_PAIRS_SQL,
    "user_summary": gold.USER_SUMMARY_SQL,
    "daily_stats": gold.DAILY_STATS_SQL,
    "engagement_metrics": gold.ENGAGEMENT_METRICS_SQL,
    "user_rfm_segments": gold.USER_RFM_SEGMENTS_SQL,
    "latest_event_per_user": dedup.LATEST_EVENT_PER_USER_SQL,
    "first_event_per_user_type_day": dedup.FIRST_EVENT_PER_USER_TYPE_DAY_SQL,
    "dedup_exact_events": dedup.DEDUP_EXACT_EVENTS_SQL,
    "events_upsert_corrections": merge.EVENTS_UPSERT_SQL,
    "user_tier_scd2": merge.USER_TIER_SCD2_SQL,
    "purchases_with_prior_tier": rangejoin.PURCHASES_WITH_PRIOR_TIER_SQL,
    "event_sequences": windows.EVENT_SEQUENCES_SQL,
    "user_sessions": windows.USER_SESSIONS_SQL,
    "user_value_quartiles": windows.USER_VALUE_QUARTILES_SQL,
    "trailing_hour_counts": windows.TRAILING_HOUR_COUNTS_SQL,
    "top_event_types_per_user": topk.TOP_EVENT_TYPES_PER_USER_SQL,
    "dq_rule_stats": dq_report.DQ_RULE_STATS_SQL,
    "dq_daily_validity": dq_report.DQ_DAILY_VALIDITY_SQL,
    "dq_trend": dq_report.DQ_TREND_SQL,
    "text_stats": text_analysis.TEXT_STATS_SQL,
    "lang_id": text_analysis.LANG_ID_SQL,
    "doc_fingerprints": text_analysis.DOC_FINGERPRINTS_SQL,
    "bpe_token_stats": text_analysis.BPE_TOKEN_STATS_SQL,
    "vocab_df_stats": text_analysis.VOCAB_DF_STATS_SQL,
    "rare_token_quality": text_analysis.RARE_TOKEN_QUALITY_SQL,
    "gopher_repetition_rules": text_analysis.GOPHER_REPETITION_RULES_SQL,
    "token_rarity_score": text_analysis.TOKEN_RARITY_SCORE_SQL,
    "corpus_report_card": text_analysis.CORPUS_REPORT_CARD_SQL,
    "source_vocab_overlap": text_analysis.SOURCE_VOCAB_OVERLAP_SQL,
    "tfidf_top_terms": text_analysis.TFIDF_TOP_TERMS_SQL,
    "value_outliers_by_type": profiling.VALUE_OUTLIERS_SQL,
    "price_quantity_corr": profiling.PRICE_QUANTITY_CORR_SQL,
    "lang_confusion": text_analysis.LANG_CONFUSION_SQL,
    "sentence_dedup_stats": packing.SENTENCE_DEDUP_STATS_SQL,
    "shingle_containment_pairs": text_dedup.SHINGLE_CONTAINMENT_SQL,
    "embedding_quantize": similarity.EMBEDDING_QUANTIZE_SQL,
    "kmeans_step": similarity.KMEANS_STEP_SQL,
    # kmeans_refine graduated from rows-only in r9: the total
    # objective is now the DECIMAL-exact fixed-point sum divided once
    # (no cross-row double sum), so the unrolled 3-iteration Lloyd
    # twin hash-matches.
    "kmeans_refine": similarity.KMEANS_REFINE_SQL,
    "daily_gapfill": timeseries.DAILY_GAPFILL_SQL,
    "daily_burst_detection": timeseries.DAILY_BURST_DETECTION_SQL,
    "order_backlog_daily": timeseries.ORDER_BACKLOG_DAILY_SQL,
    "profile_events": profiling.PROFILE_EVENTS_SQL,
    "value_percentiles_by_type": profiling.VALUE_PERCENTILES_SQL,
    "corpus_split": corpus_prep.CORPUS_SPLIT_SQL,
    "doc_repetition_stats": corpus_prep.DOC_REPETITION_STATS_SQL,
    "corpus_prep_summary": corpus_prep.CORPUS_PREP_SUMMARY_SQL,
    "decontamination_report": corpus_prep.DECONTAMINATION_SQL,
    "train_contamination_scan": corpus_prep.TRAIN_CONTAMINATION_SQL,
    "corpus_assembly_funnel": assembly.CORPUS_ASSEMBLY_FUNNEL_SQL,
    "corpus_assembly_weighted": assembly.CORPUS_ASSEMBLY_WEIGHTED_SQL,
    "cross_detector_dup_clusters": text_dedup.CROSS_DETECTOR_DUP_CLUSTERS_SQL,
    "bloom_decon_prefilter": bloom.BLOOM_DECON_PREFILTER_SQL,
    "user_engagement_salted": skew.USER_ENGAGEMENT_SALTED_SQL,
    "user_tenure_salted_join": skew.USER_TENURE_SALTED_JOIN_SQL,
    "key_skew_report": skew.KEY_SKEW_REPORT_SQL,
    "als_input_matrix": recommend.ALS_INPUT_MATRIX_SQL,
    # als_topk_agreement: the OUTPUT is a deterministic constant row
    # (n_users from the ratings matrix; k, k) whenever MLlib's serving
    # path agrees with the explicit factor-algebra top-k computed from
    # the same trained factors — the cosine_topk_agreement trick applied
    # to ALS, converting a rows-only family into a value-hashed row.
    "als_topk_agreement": recommend.ALS_TOPK_AGREEMENT_SQL,
    "corpus_shuffle": corpus_prep.CORPUS_SHUFFLE_SQL,
    "curriculum_order": corpus_prep.CURRICULUM_ORDER_SQL,
    "token_budget_sample": corpus_prep.TOKEN_BUDGET_SAMPLE_SQL,
    "pii_scrub": pii.PII_SCRUB_SQL,
    "mixture_sample": packing.MIXTURE_SAMPLE_SQL,
    "mixture_plan": packing.MIXTURE_PLAN_SQL,
    "mixture_weights_by_quality": packing.MIXTURE_WEIGHTS_BY_QUALITY_SQL,
    "source_vocab_divergence": text_analysis.SOURCE_VOCAB_DIVERGENCE_SQL,
    "epoch_repeat_plan": packing.EPOCH_REPEAT_PLAN_SQL,
    "sequence_packing": packing.SEQUENCE_PACKING_SQL,
    "packing_summary": packing.PACKING_SUMMARY_SQL,
    "chunk_documents": packing.CHUNK_DOCUMENTS_SQL,
    "span_dedup_stats": packing.SPAN_DEDUP_STATS_SQL,
    "filter_funnel_report": packing.FILTER_FUNNEL_SQL,
    "doc_length_histogram": packing.DOC_LENGTH_HISTOGRAM_SQL,
    "balanced_sample": packing.BALANCED_SAMPLE_SQL,
    "ngram_jaccard_pairs": text_dedup.NGRAM_JACCARD_PAIRS_SQL,
    "lsh_band_tuning_report": text_dedup.LSH_BAND_TUNING_REPORT_SQL,
    "minhash_lsh_pairs": text_dedup.MINHASH_LSH_PAIRS_SQL,
    "incremental_near_dup": text_dedup.INCREMENTAL_NEAR_DUP_SQL,
    "near_dup_clusters": text_dedup.NEAR_DUP_CLUSTERS_SQL,
    "cluster_size_histogram": text_dedup.CLUSTER_SIZE_HISTOGRAM_SQL,
    "simhash_fingerprints": text_dedup.SIMHASH_SQL,
    "simhash_near_dup_pairs": text_dedup.SIMHASH_NEAR_DUP_SQL,
    "ann_cosine_topk": similarity.ANN_COSINE_TOPK_SQL,
    "cosine_topk_agreement": similarity.COSINE_TOPK_AGREEMENT_SQL,
    "ann_ivf_topk": similarity.ANN_IVF_TOPK_SQL,
    "ivf_probe_sweep": similarity.IVF_PROBE_SWEEP_SQL,
    "pq_codes": similarity.PQ_CODES_SQL,
    "pq_topk_agreement": similarity.PQ_TOPK_AGREEMENT_SQL,
    "embedding_near_dup_pairs": similarity.EMBEDDING_NEAR_DUP_SQL,
    "embedding_clusters": similarity.EMBEDDING_CLUSTERS_SQL,
    "semdedup_plan": similarity.SEMDEDUP_PLAN_SQL,
    "contrastive_triplets": similarity.CONTRASTIVE_TRIPLETS_SQL,
    "knn_label_eval": similarity.KNN_LABEL_EVAL_SQL,
    "cluster_label_purity": similarity.CLUSTER_LABEL_PURITY_SQL,
    "item_cooccurrence": recommend.ITEM_COOCCURRENCE_SQL,
    "media_features": multimodal.MEDIA_FEATURES_SQL,
    "media_preprocess_plan": multimodal.MEDIA_PREPROCESS_PLAN_SQL,
    "media_decoded_features": multimodal.MEDIA_DECODED_FEATURES_SQL,
    "media_decoded_preprocess_plan": multimodal.MEDIA_DECODED_PREPROCESS_SQL,
    "dedup_retention_plan": text_dedup.DEDUP_RETENTION_PLAN_SQL,
    "dup_detector_overlap": text_dedup.DUP_DETECTOR_OVERLAP_SQL,
    "dedup_token_savings": text_dedup.DEDUP_TOKEN_SAVINGS_SQL,
    "dedup_rate_by_source": text_dedup.DEDUP_RATE_BY_SOURCE_SQL,
    "cross_source_dup_matrix": text_dedup.CROSS_SOURCE_DUP_MATRIX_SQL,
    "dup_graph_pagerank": graph.DUP_GRAPH_PAGERANK_SQL,
    "lsh_recall_report": text_dedup.LSH_RECALL_REPORT_SQL,
    "dup_graph_degrees": graph.DUP_GRAPH_DEGREES_SQL,
    "session_funnel_paths": retention.SESSION_FUNNEL_PATHS_SQL,
    "frequent_ngrams": text_analysis.FREQUENT_NGRAMS_SQL,
    "quality_threshold_sweep": text_analysis.QUALITY_THRESHOLD_SWEEP_SQL,
    "bpe_pair_counts": text_analysis.BPE_PAIR_COUNTS_SQL,
    "bpe_learn_merges": text_analysis.BPE_LEARN_MERGES_SQL,
    "bpe_apply_merges": text_analysis.BPE_APPLY_MERGES_SQL,
    "tokenizer_fertility_by_source": text_analysis.TOKENIZER_FERTILITY_BY_SOURCE_SQL,
    "embedding_covariance": linalg.EMBEDDING_COVARIANCE_SQL,
    "users_without_purchase": joins.USERS_WITHOUT_PURCHASE_SQL,
    "orders_with_returns": joins.ORDERS_WITH_RETURNS_SQL,
    "small_quantity_revenue": joins.SMALL_QUANTITY_REVENUE_SQL,
    "events_with_last_signup": asof.EVENTS_WITH_LAST_SIGNUP_SQL,
    "nb_quality_model": quality_models.NB_QUALITY_MODEL_SQL,
    "nb_classifier_scores": quality_models.NB_CLASSIFIER_SCORES_SQL,
    "nb_classifier_eval": quality_models.NB_CLASSIFIER_EVAL_SQL,
    "ngram_lm_scores": quality_models.NGRAM_LM_SCORES_SQL,
    "dsir_importance_sample": quality_models.DSIR_IMPORTANCE_SAMPLE_SQL,
    "model_gate_report": quality_models.MODEL_GATE_REPORT_SQL,
    "nb_calibration_sweep": quality_models.NB_CALIBRATION_SWEEP_SQL,
    "pca_invariants": linalg.PCA_INVARIANTS_SQL,
    "approx_distinct_agreement": skew.APPROX_DISTINCT_AGREEMENT_SQL,
    "approx_percentile_agreement": profiling.APPROX_PERCENTILE_AGREEMENT_SQL,
    "corpus_assembly_semdedup": assembly.CORPUS_ASSEMBLY_SEMDEDUP_SQL,
    "media_pixel_stats": multimodal.MEDIA_PIXEL_STATS_SQL,
    "dup_span_removal_plan": packing.DUP_SPAN_REMOVAL_PLAN_SQL,
    "dup_span_savings": packing.DUP_SPAN_SAVINGS_SQL,
    "scrub_dup_spans": packing.SCRUB_DUP_SPANS_SQL,
    "incremental_dup_spans": packing.INCREMENTAL_DUP_SPANS_SQL,
    "ccnet_perplexity_buckets": quality_models.CCNET_PERPLEXITY_BUCKETS_SQL,
    "dsir_log_weights": quality_models.DSIR_LOG_WEIGHTS_SQL,
    "mllib_minhash_agreement": ml_similarity.MLLIB_MINHASH_AGREEMENT_SQL,
    "dup_span_calibration": packing.DUP_SPAN_CALIBRATION_SQL,
    "semdedup_incremental": similarity.SEMDEDUP_INCREMENTAL_SQL,
    "doremi_domain_weights": quality_models.DOREMI_DOMAIN_WEIGHTS_SQL,
    "unimax_mixture_plan": packing.UNIMAX_MIXTURE_PLAN_SQL,
    "model_gate_disagreement": quality_models.MODEL_GATE_DISAGREEMENT_SQL,
    "winnowing_fingerprints": text_analysis.WINNOWING_FINGERPRINTS_SQL,
    "doremi_mixture_sample": quality_models.DOREMI_MIXTURE_SAMPLE_SQL,
    "unimax_budget_draw": packing.UNIMAX_BUDGET_DRAW_SQL,
    "bounded_cc_certificate": text_dedup.BOUNDED_CC_CERTIFICATE_SQL,
    "winnowing_dup_pairs": text_analysis.WINNOWING_DUP_PAIRS_SQL,
    "incremental_winnow_matches": text_dedup.INCREMENTAL_WINNOW_SQL,
    # als_recommendations: iterative MLlib model — no SQL oracle (driver
    # records the rows-only check)
}
