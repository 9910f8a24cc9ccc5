"""Sign-random-projection (hyperplane) LSH over the embedding column —
the classic cosine-LSH (Charikar 2002) that complements the IVF path in
operators/similarity.py: IVF probes a query's cell for top-k search;
SRP-LSH finds ALL high-cosine pairs corpus-wide in linear time, the
embedding-space analogue of the MinHash pipeline in
operators/text_dedup.py (reference parity: the reference has no
embedding ops at all — this is part of the §2.13 training-data
extension family; see SURVEY.md).

Determinism discipline (SCALE.md): hyperplane weights are integer
constants derived from md5 in PYTHON at import time and inlined into
both engines' plans, embeddings are quantized to 1e-6 fixed point, so
every dot product is an exact BIGINT sum — bit-identical signatures and
band keys in Spark and DuckDB. The final verification cosine uses the
same DECIMAL(38,12)-exact dot/norm forms as the rest of the similarity
family.

Scale shape:
- signatures: pure map over the table (16 per-row integer array folds,
  no explode, no shuffle) — at 100 TB this is a single pass;
- band join: |bands| short rows per vector, self-join within (band,
  key) buckets with a stop-bucket cap bounding any n² blowup;
- verification: exact cosine only on candidate pairs (linear + tiny
  collision term), never all-pairs.
"""

from __future__ import annotations

import hashlib

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

SRP_PLANES = 16
SRP_BANDS = 4
_SRP_R = SRP_PLANES // SRP_BANDS  # 4 bits per band
SRP_SCALE = 1_000_000  # hyperplane weight fixed-point
E_SCALE = 1_000_000  # embedding fixed-point (matches operators/linalg.py)
EMBED_DIM = 64
SRP_TAU = 0.4  # verification threshold (matches embedding_near_dup_pairs)
SRP_MAX_BUCKET = 1024  # stop-bucket cap for the band self-join

_DEC = "decimal(38,12)"


def _srp_weight(p: int, i: int) -> int:
    """Deterministic integer hyperplane component in [-SRP_SCALE,
    SRP_SCALE], derived from md5 so the constant set is reproducible
    from the (plane, dim) index alone."""
    h = int(hashlib.md5(f"srp:{p}:{i}".encode()).hexdigest()[:8], 16)
    return h % (2 * SRP_SCALE + 1) - SRP_SCALE


SRP_WEIGHTS: list[list[int]] = [
    [_srp_weight(p, i) for i in range(EMBED_DIM)] for p in range(SRP_PLANES)
]


def _quantized_emb(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Fixed-point quantized embeddings from the session substrate's
    double arrays (emb_substrate.emb_table — already spread and
    persisted; float→double is exact, so round(e*SCALE) is identical to
    quantizing the raw floats)."""
    from .emb_substrate import emb_table

    return emb_table(spark, sf_dir).select(
        "vec_id",
        F.expr(
            f"transform(e, x -> CAST(round(x * {E_SCALE}) AS BIGINT))"
        ).alias("q"),
    )


def _srp_sig(spark: SparkSession, sf_dir: str) -> DataFrame:
    return srp_sig_frame(_quantized_emb(spark, sf_dir))


def srp_sig_frame(q: DataFrame) -> DataFrame:
    """(vec_id, b0..b{bands-1}) from any quantized ``(vec_id, q)`` frame
    — the frame-level form `cli/run_index.py update` applies to an
    incoming vector batch (the planes are data-independent md5
    constants, so batch signatures are bit-identical to a full
    rebuild's)."""
    bits = []
    for p in range(SRP_PLANES):
        warr = ", ".join(str(w) for w in SRP_WEIGHTS[p])
        dot = (
            f"aggregate(zip_with(q, array({warr}), (x, w) -> x * w), "
            f"CAST(0 AS BIGINT), (acc, v) -> acc + v)"
        )
        bits.append(F.expr(f"CASE WHEN {dot} >= 0 THEN 1 ELSE 0 END").alias(f"bit{p}"))
    sig = q.select("vec_id", *bits)
    band_cols = [
        sum(
            (F.col(f"bit{b * _SRP_R + j}") * (1 << (_SRP_R - 1 - j)))
            for j in range(_SRP_R)
        )
        .cast("long")
        .alias(f"b{b}")
        for b in range(SRP_BANDS)
    ]
    return sig.select("vec_id", *band_cols)


def srp_sig_table(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Session substrate: the (vec_id, b0..b{bands-1}) signature table,
    built once per (session, corpus) and shared by the pairs and
    incremental pipelines — the persisted index a production vector
    store keeps beside the corpus (replaces the per-call ``.cache()``s
    that accumulated persisted frames in long-lived sessions, r7
    ADVICE)."""
    from .emb_substrate import session_frame

    return session_frame(
        spark, sf_dir, "srp_sigs", lambda: _srp_sig(spark, sf_dir)
    )


def srp_signatures(spark: SparkSession, sf_dir: str) -> DataFrame:
    """(vec_id, b0..b{bands-1}): per-vector SRP band keys. Each plane
    contributes one sign bit (integer dot ≥ 0); each band packs
    ``_SRP_R`` bits into a small integer key. Pure map stage — the
    per-row folds stay in the JVM (interpreted higher-order functions,
    but zero shuffle and zero Python)."""
    return srp_sig_table(spark, sf_dir).orderBy("vec_id")


def _srp_bits_sql() -> str:
    cols = []
    for p in range(SRP_PLANES):
        warr = ", ".join(str(w) for w in SRP_WEIGHTS[p])
        dot = f"list_sum(list_transform(range(1, {EMBED_DIM} + 1), i -> q[i] * ([{warr}])[i]))"
        cols.append(f"CASE WHEN {dot} >= 0 THEN 1 ELSE 0 END AS bit{p}")
    return ",\n    ".join(cols)


def _srp_band_sql(b: int) -> str:
    return " + ".join(
        f"bit{b * _SRP_R + j} * {1 << (_SRP_R - 1 - j)}" for j in range(_SRP_R)
    )


_SRP_SIG_CTE = f"""WITH qe AS (
  SELECT vec_id,
    list_transform(embedding, x -> CAST(round(CAST(x AS DOUBLE) * {E_SCALE}) AS BIGINT)) AS q
  FROM embeddings
), bits AS (
  SELECT vec_id,
    {_srp_bits_sql()}
  FROM qe
), sig AS (
  SELECT vec_id,
    {", ".join(f"CAST({_srp_band_sql(b)} AS BIGINT) AS b{b}" for b in range(SRP_BANDS))}
  FROM bits
)"""

SRP_SIGNATURES_SQL = f"""{_SRP_SIG_CTE}
SELECT vec_id, {", ".join(f"b{b}" for b in range(SRP_BANDS))}
FROM sig ORDER BY vec_id
"""


# Exact decimal fold: CAST each elementwise double product to
# DECIMAL(30,12) and sum in decimal — identical values to the oracle's
# explode + SUM(CAST(... AS DECIMAL(38,12))) in any order. (30,12):
# a (30,12)+(30,12) add types as (31,12), under the 38-precision cap,
# so no scale is ever dropped and every step is exact; |dot| < 100 here
# so it never overflows. A (38,12) accumulator would widen to (39,12)
# and get CAPPED to (38,11), silently rounding the 12th digit each merge.
_DACC = "decimal(30,12)"
_FOLD = (
    f"CAST(aggregate(zip_with({{a}}, {{b}}, (x, y) -> CAST(x * y AS {_DACC})), "
    f"CAST(0 AS {_DACC}), (acc, v) -> CAST(acc + v AS {_DACC})) AS DOUBLE)"
)
# cheap double prefilter fold (see two-phase verification notes below)
_DFOLD = (
    "aggregate(zip_with({a}, {b}, (x, y) -> x * y), "
    "CAST(0.0 AS DOUBLE), (acc, v) -> acc + v)"
)


def _srp_fband(spark: SparkSession, sf_dir: str) -> DataFrame:
    """(vec_id, band, key) band rows from the signature substrate, with
    over-cap buckets removed. Stop-bucket cap as a broadcast ANTI-join:
    the set of OVER-cap buckets is tiny by definition (they are the
    degenerate hubs being dropped), so it broadcasts at any corpus
    size; the complement ("small") is corpus-scale and must never carry
    the hint."""
    sig = srp_sig_table(spark, sf_dir)
    bands = sig.select(
        "vec_id",
        F.explode(
            F.array(
                *[
                    F.struct(
                        F.lit(b).alias("band"), F.col(f"b{b}").alias("key")
                    )
                    for b in range(SRP_BANDS)
                ]
            )
        ).alias("bk"),
    ).select("vec_id", F.col("bk.band").alias("band"), F.col("bk.key").alias("key"))
    stop = (
        bands.groupBy("band", "key")
        .agg(F.count(F.lit(1)).alias("n"))
        .filter(F.col("n") > SRP_MAX_BUCKET)
        .select("band", "key")
    )
    return bands.join(F.broadcast(stop), ["band", "key"], "left_anti")


def _srp_cand_table(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Session substrate: the distinct symmetric candidate pairs
    (vec_a < vec_b) from the banded self-join. Persisted because each
    downstream BROADCAST build re-executes its build side — an
    unmaterialized cand would replay the band self-join + distinct
    (3 shuffles) once per verification join. Tiny by construction (the
    stop-bucket cap bounds it at any corpus size)."""
    from .emb_substrate import session_frame

    def build() -> DataFrame:
        fband = _srp_fband(spark, sf_dir)
        return (
            fband.alias("x")
            .join(
                fband.alias("y"),
                (F.col("x.band") == F.col("y.band"))
                & (F.col("x.key") == F.col("y.key"))
                & (F.col("x.vec_id") < F.col("y.vec_id")),
            )
            .select(
                F.col("x.vec_id").alias("vec_a"),
                F.col("y.vec_id").alias("vec_b"),
            )
            .distinct()
        )

    return session_frame(spark, sf_dir, "srp_cand", build)


def srp_lsh_pairs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Corpus-wide cosine pair detection: SRP band buckets → candidate
    self-join (stop-bucket capped) → exact DECIMAL cosine verification
    of candidates only. The embedding-space twin of
    ``minhash_lsh_pairs``; recall is governed by the band structure
    (P[detect] = 1-(1-p^r)^b with p = 1-θ/π), verified on the audit
    slice in pytest.

    Tuning: 4-bit bands are sized for this corpus's moderate-cosine
    regime (its true pairs live at cos 0.4-0.5), which makes the random
    band-collision rate 1-(1-2^-4)^4 ≈ 23% — acceptable per shard/cell,
    deliberately recall-biased. SRP_PLANES/SRP_BANDS are THE scale
    lever: a 100 TB high-threshold near-dup pass runs 64-128 planes
    with 16-bit bands (collision rate 2^-16 per band) and keeps
    everything else here unchanged.

    Verification is two-phase over a broadcast join of the candidate
    pairs against the embedding table: a cheap double-precision fold
    prunes candidates below τ − 1e-9 (the double/decimal divergence is
    < 1e-10, so no boundary pair can be lost), then the survivors — a
    few dozen rows — get the exact DECIMAL fold whose values are
    bit-identical to the oracle's explode-and-SUM form. No 64× explode
    of the candidate set, and the expensive decimal arithmetic runs on
    survivors only."""
    from .emb_substrate import emb_table

    cand = _srp_cand_table(spark, sf_dir)
    # ONE embeddings+norms frame — the SESSION substrate (persisted once,
    # shared with the whole similarity family; its norm fold is the same
    # decimal accumulation, see emb_substrate.py) — joined once per pair
    # side. Broadcast hints belong on the CANDIDATE side: `cand` is
    # bounded by the stop-bucket cap (a few hundred pairs here; still
    # tiny at 100 TB), while emb_n derives from the full embeddings
    # table — hinting it would broadcast the corpus. Each broadcast-join
    # stage re-executes its STREAM side, so without the substrate the
    # embeddings scan and the expensive decimal norm fold would run once
    # per join (the r6 2.5x wall-time regression).
    fold, dfold = _FOLD, _DFOLD
    emb_n = emb_table(spark, sf_dir).select("vec_id", "e", "nrm")
    ena = emb_n.select(
        F.col("vec_id").alias("vec_a"),
        F.col("e").alias("qa"),
        F.col("nrm").alias("na"),
    )
    enb = emb_n.select(
        F.col("vec_id").alias("vec_b"),
        F.col("e").alias("qb"),
        F.col("nrm").alias("nb"),
    )
    # First join: broadcast the bare candidate pairs (two longs per row —
    # broadcastable at any corpus size under the cap). The SECOND join
    # deliberately carries NO hint: its left side now holds the qa vector
    # payload, and force-broadcasting |cand| x dim doubles would ship the
    # candidate vectors to every executor; AQE sees the runtime sizes and
    # picks broadcast only when the payload actually fits (locally it
    # instead broadcasts the small emb_n side; at 100 TB both sides are
    # keyed on vec_b and the shuffle join is linear).
    enriched = F.broadcast(cand).join(ena, "vec_a")
    enriched = enriched.join(enb, "vec_b")
    survivors = enriched.withColumn(
        "cos_fast",
        F.expr(dfold.format(a="qa", b="qb")) / (F.col("na") * F.col("nb")),
    ).filter(F.col("cos_fast") >= SRP_TAU - 1e-9)
    return (
        survivors.withColumn("dot", F.expr(fold.format(a="qa", b="qb")))
        .withColumn("cosine", F.col("dot") / (F.col("na") * F.col("nb")))
        .filter(F.col("cosine") >= SRP_TAU)
        .select("vec_a", "vec_b", "cosine")
        .orderBy("vec_a", "vec_b")
    )


SRP_LSH_PAIRS_SQL = f"""{_SRP_SIG_CTE}
, band AS (
  {" UNION ALL ".join(f"SELECT vec_id, {b} AS band, b{b} AS key FROM sig" for b in range(SRP_BANDS))}
), small AS (
  SELECT band, key FROM band GROUP BY band, key HAVING COUNT(*) <= {SRP_MAX_BUCKET}
), fband AS (
  SELECT b.* FROM band b JOIN small s ON b.band = s.band AND b.key = s.key
), cand AS (
  SELECT DISTINCT x.vec_id AS vec_a, y.vec_id AS vec_b
  FROM fband x JOIN fband y
    ON x.band = y.band AND x.key = y.key AND x.vec_id < y.vec_id
), dims AS (
  SELECT vec_id, i AS pos, CAST(embedding[i + 1] AS DOUBLE) AS x
  FROM embeddings CROSS JOIN range({EMBED_DIM}) r(i)
), norms AS (
  SELECT vec_id, sqrt(CAST(SUM(CAST(x * x AS DECIMAL(38,12))) AS DOUBLE)) AS nrm
  FROM dims GROUP BY vec_id
), dots AS (
  SELECT c.vec_a, c.vec_b,
    CAST(SUM(CAST(a.x * b.x AS DECIMAL(38,12))) AS DOUBLE) AS dot
  FROM cand c
  JOIN dims a ON a.vec_id = c.vec_a
  JOIN dims b ON b.vec_id = c.vec_b AND b.pos = a.pos
  GROUP BY c.vec_a, c.vec_b
)
SELECT vec_a, vec_b, dot / (na.nrm * nb.nrm) AS cosine
FROM dots
JOIN norms na ON na.vec_id = vec_a
JOIN norms nb ON nb.vec_id = vec_b
WHERE dot / (na.nrm * nb.nrm) >= {SRP_TAU}
ORDER BY vec_a, vec_b
"""


# --- incremental: new batch vs indexed corpus --------------------------------

# Deterministic batch membership, same convention as the text pipeline
# (operators/text_dedup.py): every 5th vector plays the incoming batch.
SRP_BATCH_MOD = 5
SRP_BATCH_REM = 4


def srp_incremental_pairs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per incoming-batch vector: how many indexed vectors it matches at
    cosine ≥ τ (SRP band candidates, two-phase verification), the best
    match (highest cosine, ties to lowest id) and the is_dup flag — the
    continuous-ingestion shape for a vector index: in production the
    index side is the PERSISTED signature/band table of prior runs, so
    each batch pays O(batch) signature work + an asymmetric band join
    against the index, never a re-scan of the corpus."""
    from .emb_substrate import emb_table, session_frame

    def build_cand() -> DataFrame:
        # Same stop-bucket discipline as srp_lsh_pairs, asymmetric:
        # batch side joins the indexed side only.
        fband = _srp_fband(spark, sf_dir)
        is_batch = F.col("vec_id") % SRP_BATCH_MOD == SRP_BATCH_REM
        return (
            fband.filter(is_batch)
            .alias("x")
            .join(
                fband.filter(~is_batch).alias("y"),
                (F.col("x.band") == F.col("y.band"))
                & (F.col("x.key") == F.col("y.key")),
            )
            .select(
                F.col("x.vec_id").alias("vec_id"),
                F.col("y.vec_id").alias("match_id"),
            )
            .distinct()
        )

    # cap-bounded candidate set — a session substrate for the same
    # reason as _srp_cand_table (broadcast builds re-execute their
    # build side; per-call .cache() leaked persisted frames, r7 ADVICE)
    cand = session_frame(spark, sf_dir, "srp_cand_inc", build_cand)
    fold, dfold = _FOLD, _DFOLD
    # As in srp_lsh_pairs: the session embeddings+norms substrate joined
    # once per side; the broadcast hint rides the candidate side (bounded
    # by the band caps), never the embeddings-derived frame.
    emb_n = emb_table(spark, sf_dir).select("vec_id", "e", "nrm")
    ena = emb_n.select(
        "vec_id", F.col("e").alias("qa"), F.col("nrm").alias("na")
    )
    enb = emb_n.select(
        F.col("vec_id").alias("match_id"),
        F.col("e").alias("qb"),
        F.col("nrm").alias("nb"),
    )
    # Hint discipline as in srp_lsh_pairs: broadcast the bare pair frame
    # once; the second join carries the vector payload, so no hint — AQE
    # decides from runtime sizes.
    joined = F.broadcast(cand).join(ena, "vec_id")
    joined = joined.join(enb, "match_id")
    matches = (
        joined.withColumn(
            "cos_fast",
            F.expr(dfold.format(a="qa", b="qb")) / (F.col("na") * F.col("nb")),
        )
        .filter(F.col("cos_fast") >= SRP_TAU - 1e-9)
        .withColumn(
            "cosine",
            F.expr(fold.format(a="qa", b="qb")) / (F.col("na") * F.col("nb")),
        )
        .filter(F.col("cosine") >= SRP_TAU)
        .select("vec_id", "match_id", "cosine")
    )
    from pyspark.sql.window import Window

    # (cosine DESC, match_id ASC) best-match via row_number + a grouped
    # rollup for the count. NOT a min(struct(...)) aggregation: struct
    # buffers force SortAggregate (no hash agg for complex buffers),
    # which the r12 A/B measured slower than this window
    # (OPTIMIZATION_r12.md "min(struct) postmortem").
    w = Window.partitionBy("vec_id").orderBy(F.desc("cosine"), F.asc("match_id"))
    best = (
        matches.withColumn("_rn", F.row_number().over(w))
        .groupBy("vec_id")
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_matches"),
            F.max(F.when(F.col("_rn") == 1, F.col("match_id"))).alias(
                "best_match_id"
            ),
            F.max(F.when(F.col("_rn") == 1, F.col("cosine"))).alias(
                "best_cosine"
            ),
        )
    )
    incoming = (
        emb_table(spark, sf_dir)
        .filter(F.col("vec_id") % SRP_BATCH_MOD == SRP_BATCH_REM)
        .select("vec_id")
    )
    return (
        incoming.join(F.broadcast(best), "vec_id", "left")
        .select(
            "vec_id",
            F.coalesce("n_matches", F.lit(0)).cast("long").alias("n_matches"),
            "best_match_id",
            "best_cosine",
            (F.coalesce("n_matches", F.lit(0)) > 0).alias("is_dup"),
        )
        .orderBy("vec_id")
    )


SRP_INCREMENTAL_PAIRS_SQL = f"""
WITH sp AS (
  SELECT * FROM ({SRP_LSH_PAIRS_SQL})
), inc AS (
  -- cross-boundary pairs from the symmetric pipeline, oriented so vec_id
  -- is always the incoming-batch side
  SELECT
    CASE WHEN vec_a % {SRP_BATCH_MOD} = {SRP_BATCH_REM} THEN vec_a ELSE vec_b END AS vec_id,
    CASE WHEN vec_a % {SRP_BATCH_MOD} = {SRP_BATCH_REM} THEN vec_b ELSE vec_a END AS match_id,
    cosine
  FROM sp
  WHERE (vec_a % {SRP_BATCH_MOD} = {SRP_BATCH_REM})
     != (vec_b % {SRP_BATCH_MOD} = {SRP_BATCH_REM})
), best AS (
  SELECT vec_id,
    CAST(COUNT(*) AS BIGINT) AS n_matches,
    FIRST(match_id ORDER BY cosine DESC, match_id ASC) AS best_match_id,
    FIRST(cosine ORDER BY cosine DESC, match_id ASC) AS best_cosine
  FROM inc GROUP BY vec_id
)
SELECT e.vec_id,
  COALESCE(b.n_matches, 0) AS n_matches,
  b.best_match_id,
  b.best_cosine,
  COALESCE(b.n_matches, 0) > 0 AS is_dup
FROM embeddings e
LEFT JOIN best b ON b.vec_id = e.vec_id
WHERE e.vec_id % {SRP_BATCH_MOD} = {SRP_BATCH_REM}
ORDER BY e.vec_id
"""
