"""Engine configuration: vocabularies, weight maps, bin edges.

The reference hard-codes two event-vocabulary generations and two weight
maps (reference ingestion/producer/clickstream_producer.py:14 vs
ecommerce_producers.py:22-29; weights processing/bronze-to-silver/
main_pipeline.py:230-235 vs transformations/clisckstream_transformer.py:75-80).
We make all of them data: a query picks the map for its input's vocabulary.
"""

from __future__ import annotations

# --- reference vocabularies (union of both producer generations) ---------
EVENT_VOCAB_OLD = [
    "view",
    "click",
    "add_to_cart",
    "purchase",
    "remove_from_cart",
    "search",
    "recommendation_clicked",
]
EVENT_VOCAB_NEW = ["page_view", "product_click", "add_to_cart", "purchase"]
EVENT_VOCAB_UNION = sorted(set(EVENT_VOCAB_OLD) | set(EVENT_VOCAB_NEW) | {"recommendation_shown"})

# main_pipeline.py:230-235 map (old vocabulary), default weight 1
EVENT_WEIGHTS_OLD = {
    "view": 1,
    "click": 2,
    "add_to_cart": 5,
    "purchase": 10,
    "remove_from_cart": -2,
    "search": 3,
    "recommendation_clicked": 4,
}
# clisckstream_transformer.py:75-80 map (new vocabulary)
EVENT_WEIGHTS_NEW = {"page_view": 1, "product_click": 2, "add_to_cart": 3, "purchase": 5}
DEFAULT_EVENT_WEIGHT = 1

# --- driver testdata `events` table vocabulary ----------------------------
# /root/testdata events use {view, click, purchase, signup, error}.
# `error` rows are treated as enum-rule failures (dropped at silver),
# mirroring main_pipeline.py:221-222's enum filter.
EVENTS_TABLE_VOCAB = ["view", "click", "purchase", "signup"]
EVENTS_TABLE_WEIGHTS = {"view": 1, "click": 2, "purchase": 10, "signup": 5}

# --- bin tables (pandas-cut right-closed: (lo, hi]) ------------------------
# main_pipeline.py:241-247 price tiers
PRICE_TIER_BINS = [0, 50, 200, 500, 1000, float("inf")]
PRICE_TIER_LABELS = ["budget", "low", "mid", "high", "premium"]
# main_pipeline.py:290-296 value segments over total_spent
VALUE_SEGMENT_BINS = [0, 100, 500, 1000, 5000, float("inf")]
VALUE_SEGMENT_LABELS = ["low", "medium", "high", "premium", "vip"]
# gold_pipeline.py:198-202 activity levels over total_events
ACTIVITY_BINS = [0, 5, 15, 30, float("inf")]
ACTIVITY_LABELS = ["low", "medium", "high", "very_high"]
# driver-testdata `events.value` tiers (engine-defined, oracle-mirrored)
VALUE_TIER_BINS = [0, 10, 50, 100, float("inf")]
VALUE_TIER_LABELS = ["low", "mid", "high", "premium"]

# quality threshold (main_pipeline.py:34,177)
MIN_QUALITY_SCORE = 0.8

# sessionization gap for the streaming feature processor (the reference's
# state is unbounded — kafka_streams_processor.py:61-68 — we bound it)
SESSION_GAP_MINUTES = 30
WATERMARK_DELAY = "10 minutes"
