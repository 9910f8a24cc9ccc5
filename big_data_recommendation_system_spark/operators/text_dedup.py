"""Near-duplicate text detection — the dedup family a 100 TB training-data
pipeline needs (exact dedup lives in operators/dedup.py):

- ``ngram_jaccard_pairs``  — exact pairwise n-gram-set jaccard. Baseline /
  verifier: deliberately bounded to a doc_id slice (quadratic cost is the
  whole reason LSH exists — at 100 TB you run the exact pass only on LSH
  candidates or on bounded audit samples). A size-ratio prefilter
  (jaccard ≥ t implies |A|/|B| ∈ [t, 1/t]) prunes before intersection.
- ``minhash_lsh_pairs``    — the scale path: shingle → 16 MinHash
  permutations → 8 LSH bands (r=2) → bucket self-join → exact-jaccard
  verification of candidates only. Cost is linear in corpus size + the
  (tiny) bucket collisions; this is the shape that survives 100× scale-up.
- ``simhash_fingerprints`` — 48-bit SimHash per document (bitwise majority
  over per-token md5 bits), one aggregation pass.

Engine-neutral hashing: all hashes are md5-of-string (identical hex in
Spark and DuckDB), so the oracle reproduces signatures bit-for-bit —
including which candidate pairs LSH emits.
"""

from __future__ import annotations

import os
import warnings

from pyspark.sql import Column, DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.window import Window

from ..functions.text import shingles, shingles_sql, tokens, tokens_sql
from ..sources.tables import load_table

SHINGLE_N = 2
NUM_PERMS = 16
LSH_BANDS = 8  # r = NUM_PERMS / LSH_BANDS = 2
JACCARD_THRESHOLD = 0.4
EXACT_PAIRS_MAX_DOC_ID = 500  # audit-slice bound for the quadratic baseline

_R = NUM_PERMS // LSH_BANDS

_DOCS_SHINGLED_CTE = f"""WITH t AS (
  SELECT doc_id, {tokens_sql()} AS tok FROM documents
), d AS (
  SELECT doc_id, {shingles_sql("tok", SHINGLE_N)} AS sh FROM t WHERE len(tok) >= {SHINGLE_N}
)"""


def _shingled_docs(
    spark: SparkSession, sf_dir: str, max_doc_id: int | None = None
) -> DataFrame:
    """Shingled documents, spread across cores BEFORE the expensive map:
    higher-order shingle expressions are interpreted (not codegen'd), and
    the documents table arrives as few files — without an explicit
    repartition one core would do all the work. Any doc_id bound is
    applied BEFORE the repartition so it pushes into the scan (filters
    don't migrate through a user-inserted Repartition)."""
    docs = load_table(spark, sf_dir, "documents")
    if max_doc_id is not None:
        docs = docs.filter(F.col("doc_id") < max_doc_id)
    # Only spread when the scan itself is under-parallel (single-file test
    # corpus). A real multi-file corpus already scans wide — an
    # unconditional repartition there would full-shuffle the raw text for
    # nothing.
    par = spark.sparkContext.defaultParallelism
    if docs.rdd.getNumPartitions() < par:
        docs = docs.repartition(par)
    return (
        docs.withColumn("tok", tokens(F.col("text")))
        .filter(F.size("tok") >= SHINGLE_N)
        .select("doc_id", shingles("tok", SHINGLE_N).alias("sh"))
    )


def ngram_jaccard_pairs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact all-pairs jaccard ≥ threshold on word-2-gram sets, over the
    bounded audit slice (see module docstring)."""
    # session-registered (feeds both sides of the self-join; a bare
    # per-call cache leaked a CacheManager entry per invocation)
    d = _text_frame(
        spark,
        sf_dir,
        "ngram_slice",
        lambda: _shingled_docs(
            spark, sf_dir, max_doc_id=EXACT_PAIRS_MAX_DOC_ID
        ).withColumn("n", F.size("sh")),
    )
    a = d.select(
        F.col("doc_id").alias("doc_a"), F.col("sh").alias("sh_a"), F.col("n").alias("n_a")
    )
    b = d.select(
        F.col("doc_id").alias("doc_b"), F.col("sh").alias("sh_b"), F.col("n").alias("n_b")
    )
    t = JACCARD_THRESHOLD
    pairs = a.join(
        b,
        (F.col("doc_a") < F.col("doc_b"))
        & (F.col("n_b") * F.lit(t) <= F.col("n_a"))
        & (F.col("n_a") * F.lit(t) <= F.col("n_b")),
    )
    inter = F.size(F.array_intersect("sh_a", "sh_b"))
    union = F.size(F.array_union("sh_a", "sh_b"))
    return (
        pairs.withColumn("jaccard", inter.cast("double") / union)
        .filter(F.col("jaccard") >= t)
        .select("doc_a", "doc_b", "jaccard")
    )


NGRAM_JACCARD_PAIRS_SQL = f"""{_DOCS_SHINGLED_CTE}
SELECT a.doc_id AS doc_a, b.doc_id AS doc_b,
  CAST(len(list_intersect(a.sh, b.sh)) AS DOUBLE) / len(list_distinct(a.sh || b.sh)) AS jaccard
FROM d a JOIN d b
  ON a.doc_id < b.doc_id
 AND len(b.sh) * {JACCARD_THRESHOLD} <= len(a.sh)
 AND len(a.sh) * {JACCARD_THRESHOLD} <= len(b.sh)
WHERE a.doc_id < {EXACT_PAIRS_MAX_DOC_ID} AND b.doc_id < {EXACT_PAIRS_MAX_DOC_ID}
  AND CAST(len(list_intersect(a.sh, b.sh)) AS DOUBLE) / len(list_distinct(a.sh || b.sh)) >= {JACCARD_THRESHOLD}
"""


# Universal-hash MinHash: ONE md5 per shingle (the expensive part), then
# num_perms cheap affine permutations h_i(v) = (a_i·v + c_i) mod P over the
# 32-bit md5 prefix. Classic (a·x+c) mod prime scheme; 10× cheaper than
# hashing every shingle num_perms times, identical collision behavior.
MINHASH_PRIME = 2147483647  # 2^31 - 1


def _perm_consts(i: int) -> tuple[int, int]:
    a = (2654435761 * (i + 1)) % MINHASH_PRIME
    c = (40503 * (i + 1) + 12345) % MINHASH_PRIME
    return (a or 1), c


def minhash_signatures(d: DataFrame, num_perms: int = NUM_PERMS) -> DataFrame:
    """(doc_id, sig: array<long>) — sig[i] = min over shingles of
    (a_i·v + c_i) mod P, v = first-32-bits(md5(shingle)) mod P.
    Single explode, all perms as parallel min-aggregates in one
    map-side-combined pass: only num_perms longs per doc shuffle."""
    exploded = d.select("doc_id", F.explode("sh").alias("s"))
    v = (
        F.conv(F.substring(F.md5(F.col("s")), 1, 8), 16, 10).cast("bigint")
        % MINHASH_PRIME
    )
    hashed = exploded.select("doc_id", v.alias("v"))
    mins = hashed.groupBy("doc_id").agg(
        *[
            F.min(
                (F.lit(a) * F.col("v") + F.lit(c)) % F.lit(MINHASH_PRIME)
            ).alias(f"h{i}")
            for i, (a, c) in ((i, _perm_consts(i)) for i in range(num_perms))
        ]
    )
    return mins.select(
        "doc_id", F.array(*[F.col(f"h{i}") for i in range(num_perms)]).alias("sig")
    )


def lsh_band_keys(sig_df: DataFrame, bands: int = LSH_BANDS, r: int = _R) -> DataFrame:
    """(doc_id, band, band_key) — band_key = comma-joined sig slice
    (plain string equality key; no extra hashing needed)."""
    band_cols = [
        F.struct(
            F.lit(b).alias("band"),
            F.concat_ws(
                ",", *[F.element_at("sig", b * r + j + 1).cast("string") for j in range(r)]
            ).alias("band_key"),
        )
        for b in range(bands)
    ]
    return sig_df.select(
        "doc_id", F.explode(F.array(*band_cols)).alias("bk")
    ).select("doc_id", F.col("bk.band").alias("band"), F.col("bk.band_key").alias("band_key"))


# signature-agreement prefilter: candidates whose estimated jaccard
# (fraction of agreeing MinHash components) is below this are discarded
# before the expensive exact verification. P(est < 4/16 | true j ≥ 0.4)
# ≈ 4.6% worst-case at the threshold boundary — mirrored exactly in the
# oracle, so parity is unaffected; it prunes the r=2 accidental
# collisions that dominate the candidate set.
MIN_SIG_AGREEMENT = 4

# Buckets with more members than this are "stop buckets" — band keys so
# common they carry no similarity signal (here: low-entropy 2-gram bands
# over a tiny synthetic vocabulary; in real corpora, boilerplate). They
# are skipped before the self-join, bounding the per-bucket n² blowup.
# Standard LSH practice; mirrored in the oracle so parity holds.
MAX_BUCKET_SIZE = 64


def _minhash_lsh_pairs_compute(spark: SparkSession, sf_dir: str) -> DataFrame:
    """LSH candidates → signature-estimate prefilter → exact-jaccard
    verification of survivors (the one-shot pipeline; consumers go
    through the ``dup_pairs`` provider so the substrate is computed once
    per corpus snapshot, not once per report)."""
    # the shingled/signature/band frames all come from the shared
    # session substrates (they also feed the containment index, the
    # incremental batch path and the band-tuning report) — each feeds
    # 2-3 consumers inside this pipeline, and substrate registration
    # materializes them once per corpus with no per-call leak.
    d = shingled_docs_table(spark, sf_dir)
    sigs = minhash_sig_table(spark, sf_dir)
    bands = lsh_bands_table(spark, sf_dir)
    small_buckets = (
        bands.groupBy("band", "band_key")
        .agg(F.count(F.lit(1)).alias("bsize"))
        .filter(F.col("bsize") <= MAX_BUCKET_SIZE)
        .select("band", "band_key")
    )
    bands = bands.join(F.broadcast(small_buckets), ["band", "band_key"])
    cand = (
        bands.alias("x")
        .join(
            bands.alias("y"),
            (F.col("x.band") == F.col("y.band"))
            & (F.col("x.band_key") == F.col("y.band_key"))
            & (F.col("x.doc_id") < F.col("y.doc_id")),
        )
        .select(F.col("x.doc_id").alias("doc_a"), F.col("y.doc_id").alias("doc_b"))
        .distinct()
    )
    sa = sigs.select(F.col("doc_id").alias("doc_a"), F.col("sig").alias("sig_a"))
    sb = sigs.select(F.col("doc_id").alias("doc_b"), F.col("sig").alias("sig_b"))
    # explicit element comparisons (codegen) rather than zip_with/filter
    # higher-order functions (interpreted per row)
    agreement = sum(
        (
            F.element_at("sig_a", i + 1) == F.element_at("sig_b", i + 1)
        ).cast("int")
        for i in range(NUM_PERMS)
    )
    cand = (
        cand.join(F.broadcast(sa), "doc_a")
        .join(F.broadcast(sb), "doc_b")
        .filter(agreement >= MIN_SIG_AGREEMENT)
        .select("doc_a", "doc_b")
    )
    da = d.select(F.col("doc_id").alias("doc_a"), F.col("sh").alias("sh_a"))
    db = d.select(F.col("doc_id").alias("doc_b"), F.col("sh").alias("sh_b"))
    verified = cand.join(da, "doc_a").join(db, "doc_b")
    inter = F.size(F.array_intersect("sh_a", "sh_b"))
    union = F.size(F.array_union("sh_a", "sh_b"))
    return (
        verified.withColumn("jaccard", inter.cast("double") / union)
        .filter(F.col("jaccard") >= JACCARD_THRESHOLD)
        .select("doc_a", "doc_b", "jaccard")
    )


# --- substrate materialization ----------------------------------------------
#
# Six registered reports (retention plan, rate-by-source, cross-source
# matrix, PageRank, degrees, recall calibration) and the cluster query all
# consume the same verified-pair table; recomputing the
# shingle→minhash→band→verify pipeline per report multiplied its cost ~6×.
# These providers materialize the pair table (and its connected-component
# clusters) ONCE per (session, corpus snapshot) and hand every consumer
# the persisted frame — the local analogue of the production shape, where
# a 100 TB pipeline WRITES dup_pairs/_dup_clusters parquet once per corpus
# snapshot and every report reads the table. The DuckDB oracle twins keep
# the standalone inline pipelines, so parity still checks the full
# computation, not a cache.

# Registered queries that read the shared pair/cluster substrate — bench
# harnesses group these so a blanket clearCache between queries doesn't
# evict the substrate they deliberately share.
SUBSTRATE_CONSUMERS = frozenset(
    {
        "minhash_lsh_pairs",
        "near_dup_clusters",
        "bounded_cc_certificate",
        "dedup_retention_plan",
        "dedup_rate_by_source",
        "cross_source_dup_matrix",
        "dup_graph_pagerank",
        "dup_graph_degrees",
        "lsh_recall_report",
        "shingle_containment_pairs",
        "incremental_near_dup",
        "dup_detector_overlap",
        "dedup_token_savings",
        "lsh_band_tuning_report",
        "cluster_size_histogram",
        # plans/assembly.py's composed funnel and its quality-weighted
        # variant read dup_clusters for their near-dup stage — same
        # shared substrate, same grouping rule
        "corpus_assembly_funnel",
        "corpus_assembly_weighted",
        "corpus_assembly_semdedup",
        # union-detector clustering reads BOTH the text dup_pairs and the
        # embedding near-dup pair substrates
        "cross_detector_dup_clusters",
        # r9 cache hygiene: the exact-jaccard audit slice and the simhash
        # band table moved from per-call .cache() to session registration
        "ngram_jaccard_pairs",
        "simhash_near_dup_pairs",
        # r11: the MLlib agreement row reads the exact-jaccard audit
        # slice (ngram_slice session frame) next to the MLlib pairs
        "mllib_minhash_agreement",
    }
)


# Generic registration plumbing lives in operators/substrate.py (shared
# with the embedding substrate, import-neutral to avoid cycles). All
# text-family frames register through the shared session registry
# (namespaced "text:"), which also handles stale-session eviction and
# concurrent first-build races.
from .substrate import session_frame as _session_frame  # noqa: E402


def _text_frame(spark, sf_dir, what, build):
    return _session_frame(spark, sf_dir, "text:" + what, build)


def shingled_docs_table(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The full-corpus shingled-docs frame (doc_id, sh), persisted once
    per session+corpus — the first stage every shingle consumer (LSH
    signatures, containment index, incremental batch) shares."""
    return _text_frame(
        spark, sf_dir, "shingles", lambda: _shingled_docs(spark, sf_dir)
    )


def minhash_sig_table(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The MinHash signature frame (doc_id, sig), persisted once per
    session+corpus — shared by the pairs pipeline and the band-tuning
    report (the production shape persists signatures beside the corpus
    snapshot precisely so parameter sweeps never re-hash the text)."""
    return _text_frame(
        spark,
        sf_dir,
        "minhash_sigs",
        lambda: minhash_signatures(shingled_docs_table(spark, sf_dir)),
    )


def lsh_bands_table(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The exploded LSH band-key frame (doc_id, band, band_key),
    persisted once per session+corpus — shared by the symmetric pairs
    pipeline and the asymmetric incremental path (each previously
    re-built and per-call-cached it, the r8-ADVICE leak class)."""
    return _text_frame(
        spark,
        sf_dir,
        "bands",
        lambda: lsh_band_keys(minhash_sig_table(spark, sf_dir)),
    )


def dup_pairs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Verified near-dup pairs (doc_a, doc_b, jaccard), persisted once per
    session+corpus. If the session's cache is cleared the frame is
    re-persisted on next use — correctness never depends on the cache."""
    return _text_frame(
        spark, sf_dir, "pairs", lambda: _minhash_lsh_pairs_compute(spark, sf_dir)
    )


def dup_clusters(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Connected-component clusters over ``dup_pairs``, persisted once per
    session+corpus (the iterative CC loop is the expensive half)."""

    def build() -> DataFrame:
        docs = load_table(spark, sf_dir, "documents").select("doc_id")
        return connected_components(
            docs, dup_pairs(spark, sf_dir).select("doc_a", "doc_b")
        )

    return _text_frame(spark, sf_dir, "clusters", build)


def minhash_lsh_pairs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Registered query form of the LSH pipeline — served from the
    session-scoped substrate so repeated calls (and the five downstream
    reports) share one computation."""
    return dup_pairs(spark, sf_dir)


def _sig_cte_sql() -> str:
    """CTE chain ending in ``sig(doc_id, h0..h{NUM_PERMS-1})`` — the
    MinHash signature table both the pairs pipeline and the band-tuning
    report build on (shared so the two cannot drift)."""
    p = MINHASH_PRIME
    min_cols = ",\n    ".join(
        f"MIN(({a} * v + {c}) % {p}) AS h{i}"
        for i, (a, c) in ((i, _perm_consts(i)) for i in range(NUM_PERMS))
    )
    return f"""{_DOCS_SHINGLED_CTE}
, sh AS (SELECT doc_id, unnest(sh) AS s FROM d)
, hv AS (
  SELECT doc_id,
    list_sum(list_transform(range(1, 9),
      j -> (strpos('0123456789abcdef', substr(md5(s), j, 1)) - 1) * (1::BIGINT << (4 * (8 - j)))
    )) % {p} AS v
  FROM sh
)
, sig AS (
  SELECT doc_id,
    {min_cols}
  FROM hv GROUP BY doc_id
)"""


def _minhash_sql() -> str:
    band_selects = "\n  UNION ALL\n  ".join(
        "SELECT doc_id, {b} AS band, {key} AS band_key FROM sig".format(
            b=b,
            key=" || ',' || ".join(
                f"CAST(h{b * _R + j} AS VARCHAR)" for j in range(_R)
            ),
        )
        for b in range(LSH_BANDS)
    )
    agreement_sql = " + ".join(
        f"(CASE WHEN sa.h{i} = sb.h{i} THEN 1 ELSE 0 END)" for i in range(NUM_PERMS)
    )
    return f"""{_sig_cte_sql()}
, band AS (
  {band_selects}
)
, small_buckets AS (
  SELECT band, band_key FROM band
  GROUP BY band, band_key HAVING COUNT(*) <= {MAX_BUCKET_SIZE}
)
, fband AS (
  SELECT b.* FROM band b JOIN small_buckets s
    ON b.band = s.band AND b.band_key = s.band_key
)
, cand0 AS (
  SELECT DISTINCT x.doc_id AS doc_a, y.doc_id AS doc_b
  FROM fband x JOIN fband y
    ON x.band = y.band AND x.band_key = y.band_key AND x.doc_id < y.doc_id
)
, cand AS (
  SELECT doc_a, doc_b FROM cand0
  JOIN sig sa ON sa.doc_id = doc_a
  JOIN sig sb ON sb.doc_id = doc_b
  WHERE ({agreement_sql}) >= {MIN_SIG_AGREEMENT}
)
, pairs AS (
  SELECT doc_a, doc_b,
    CAST(len(list_intersect(a.sh, b.sh)) AS DOUBLE) / len(list_distinct(a.sh || b.sh)) AS jaccard
  FROM cand JOIN d a ON a.doc_id = cand.doc_a JOIN d b ON b.doc_id = cand.doc_b
  WHERE CAST(len(list_intersect(a.sh, b.sh)) AS DOUBLE) / len(list_distinct(a.sh || b.sh)) >= {JACCARD_THRESHOLD}
)
"""


def minhash_pairs_cte() -> str:
    """The full LSH-pairs pipeline as a reusable CTE chain ending in
    ``pairs(doc_a, doc_b, jaccard)`` — consumers append their own CTEs /
    final SELECT (near_dup_clusters builds its recursive closure on it)."""
    return _minhash_sql()


MINHASH_LSH_PAIRS_SQL = _minhash_sql() + "\nSELECT doc_a, doc_b, jaccard FROM pairs"

# --- SimHash ----------------------------------------------------------------

SIMHASH_BITS = 48


def _bit_shift(j: int) -> int:
    """Bit position of SimHash bit j inside the 48-bit integer parsed
    from the md5 prefix: the historical per-bit expression read hex
    digit ``j // 4 + 1`` (1-based from the LEFT of the digest) and took
    bit ``j % 4`` of its value; in conv(first-12-hex, 16, 10) that hex
    digit occupies bits [4·(12−pos) .. 4·(12−pos)+3], so the same bit
    sits at 44 − 4·(j // 4) + (j % 4). Value-identical mapping — the
    fingerprints hash-match the oracle unchanged."""
    return 44 - 4 * (j // 4) + (j % 4)


def simhash_fingerprints(spark: SparkSession, sf_dir: str) -> DataFrame:
    """48-bit SimHash per doc: majority vote over per-token-occurrence md5
    bits (term frequency = natural weighting since tokens repeat).

    r12 (guide §1.2 step 2, per-task work): the 48 bit-sum aggregates
    previously each embedded ``md5(tokval)`` — 48 digest computations
    per token occurrence (separate Sum aggregates do not share
    subexpressions). Hash ONCE per token into a 48-bit integer in the
    pre-aggregation projection, then each aggregate is two integer ops
    on that long. Same 48 column sums bit for bit (see _bit_shift)."""
    docs = load_table(spark, sf_dir, "documents")
    toks = (
        docs.withColumn("tok", tokens(F.col("text")))
        .select("doc_id", F.explode("tok").alias("tokval"))
        .select(
            "doc_id",
            F.expr(
                "CAST(conv(substring(md5(tokval), 1, 12), 16, 10) AS BIGINT)"
            ).alias("_h"),
        )
    )
    sums = toks.groupBy("doc_id").agg(
        *[
            F.sum(
                F.expr(f"2 * (shiftright(_h, {_bit_shift(j)}) & 1) - 1")
            ).alias(f"b{j}")
            for j in range(SIMHASH_BITS)
        ]
    )
    simhash = None
    for j in range(SIMHASH_BITS):
        term = F.when(F.col(f"b{j}") > 0, F.lit(2**j).cast("long")).otherwise(
            F.lit(0).cast("long")
        )
        simhash = term if simhash is None else simhash + term
    return sums.select("doc_id", simhash.alias("simhash"))


def _simhash_sql() -> str:
    bit_sums = ",\n    ".join(
        f"SUM(2 * (((strpos('0123456789abcdef', substring(md5(tokval), {j // 4 + 1}, 1)) - 1) >> {j % 4}) & 1) - 1) AS b{j}"
        for j in range(SIMHASH_BITS)
    )
    recon = " + ".join(
        f"(CASE WHEN b{j} > 0 THEN {2**j}::BIGINT ELSE 0 END)" for j in range(SIMHASH_BITS)
    )
    return f"""WITH t AS (
  SELECT doc_id, unnest({tokens_sql()}) AS tokval FROM documents
), s AS (
  SELECT doc_id,
    {bit_sums}
  FROM t GROUP BY doc_id
)
SELECT doc_id, {recon} AS simhash FROM s
"""


SIMHASH_SQL = _simhash_sql()


# --- SimHash near-dup pairs (banded Hamming join) ---------------------------
#
# Manku et al. (WWW'07) banding: split the fingerprint into BANDS chunks;
# any pair with Hamming distance <= BANDS - 1 must agree on at least one
# whole chunk (pigeonhole), so joining on (band, chunk-value) finds EVERY
# such pair — the band join is a blocking strategy, not an approximation,
# for the threshold below. 48 bits / 4 bands / ham <= 3.

SIMHASH_BANDS = 4
_SIMHASH_BAND_BITS = SIMHASH_BITS // SIMHASH_BANDS  # 12
_SIMHASH_BAND_MASK = (1 << _SIMHASH_BAND_BITS) - 1
SIMHASH_HAM_MAX = SIMHASH_BANDS - 1
# Stop-bucket cap — same practice (and same recall caveat) as the MinHash
# LSH path's MAX_BUCKET_SIZE: a 12-bit chunk value shared by more docs
# than this carries no near-dup signal (boilerplate / degenerate text) and
# would n²-blow the self-join. Mirrored in the oracle so parity holds.
SIMHASH_MAX_BUCKET = 256


def simhash_near_dup_pairs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """SimHash near-duplicate pairs: banded self-join on 12-bit fingerprint
    chunks, then exact Hamming verification (``bit_count(a XOR b)``) of the
    candidates only. Complete for hamming <= 3 (see banding note above);
    per-pair work is two integer ops, so the verify stage is free compared
    to the jaccard verify of the MinHash path. One shuffle for the band
    join, one for the distinct — no all-pairs stage at any scale."""
    def build_bands() -> DataFrame:
        fp = simhash_fingerprints(spark, sf_dir)
        band_structs = [
            F.struct(
                F.lit(b).alias("band"),
                F.shiftright(F.col("simhash"), b * _SIMHASH_BAND_BITS)
                .bitwiseAND(F.lit(_SIMHASH_BAND_MASK))
                .alias("band_key"),
            )
            for b in range(SIMHASH_BANDS)
        ]
        return fp.select(
            "doc_id", "simhash", F.explode(F.array(*band_structs)).alias("bk")
        ).select(
            "doc_id",
            "simhash",
            F.col("bk.band").alias("band"),
            F.col("bk.band_key").alias("band_key"),
        )

    # session-registered: feeds both the bucket-size agg and the join
    bands = _text_frame(spark, sf_dir, "simhash_bands", build_bands)
    small = (
        bands.groupBy("band", "band_key")
        .agg(F.count(F.lit(1)).alias("n"))
        .filter(F.col("n") <= SIMHASH_MAX_BUCKET)
        .select("band", "band_key")
    )
    fband = bands.join(small, ["band", "band_key"])
    a = fband.select(
        F.col("doc_id").alias("doc_a"),
        F.col("simhash").alias("sim_a"),
        "band",
        "band_key",
    )
    b = fband.select(
        F.col("doc_id").alias("doc_b"),
        F.col("simhash").alias("sim_b"),
        "band",
        "band_key",
    )
    cand = (
        a.join(b, ["band", "band_key"])
        .filter(F.col("doc_a") < F.col("doc_b"))
        .select("doc_a", "doc_b", "sim_a", "sim_b")
        .distinct()
    )
    return (
        cand.withColumn(
            "hamming",
            F.bit_count(F.col("sim_a").bitwiseXOR(F.col("sim_b"))).cast("int"),
        )
        .filter(F.col("hamming") <= SIMHASH_HAM_MAX)
        .select("doc_a", "doc_b", "hamming")
    )


SIMHASH_NEAR_DUP_SQL = f"""WITH fp AS ({_simhash_sql()}),
band AS (
  SELECT doc_id, simhash, i AS band,
         (simhash >> ({_SIMHASH_BAND_BITS} * i)) & {_SIMHASH_BAND_MASK} AS band_key
  FROM fp CROSS JOIN range({SIMHASH_BANDS}) r(i)
),
small AS (
  SELECT band, band_key FROM band
  GROUP BY band, band_key HAVING COUNT(*) <= {SIMHASH_MAX_BUCKET}
),
fband AS (
  SELECT b.* FROM band b JOIN small s
    ON b.band = s.band AND b.band_key = s.band_key
),
cand AS (
  SELECT DISTINCT a.doc_id AS doc_a, b.doc_id AS doc_b,
                  a.simhash AS sa, b.simhash AS sb
  FROM fband a JOIN fband b
    ON a.band = b.band AND a.band_key = b.band_key AND a.doc_id < b.doc_id
)
SELECT doc_a, doc_b, CAST(bit_count(xor(sa, sb)) AS INTEGER) AS hamming
FROM cand
WHERE bit_count(xor(sa, sb)) <= {SIMHASH_HAM_MAX}
"""


# --- near-dup cluster assignment (connected components over LSH pairs) ------

_MAX_CC_ITERS = 50


def _cc_round(edges: DataFrame, labels: DataFrame) -> DataFrame:
    """ONE label-propagation round, pre-checkpoint: min(own,
    min(neighbors)) as a single aggregation over union(messages, labels)
    — the r12 round fusion — followed by pointer doubling. Factored out
    (r12 ADVICE) so the production loop and
    cli/capture_internal_plans.py build the SAME frame — the captured
    'internal' plan evidence cannot desynchronize from the operator."""
    # r12 OPTIMIZATION (guide §2.4: remove shuffles outright): the step
    # used to be groupBy(neighbor-min) + LEFT JOIN back onto labels +
    # least/coalesce. min(own, min(neighbors)) is one aggregation over
    # the UNION of the label frame with the neighbor messages — every
    # doc appears in the union with its own label, so no row can be lost
    # and the coalesce arm never fired. One exchange + one join fewer
    # per round; values bit-identical (min is associative/commutative
    # over the union).
    msgs = edges.join(labels, edges.doc_b == labels.doc_id).select(
        F.col("doc_a").alias("doc_id"), "cluster_id"
    )
    stepped = (
        msgs.union(labels)
        .groupBy("doc_id")
        .agg(F.min("cluster_id").alias("cluster_id"))
    )
    # pointer doubling: label(u) <- min(label(u), label(label(u))).
    # A label is always the id of a node in u's component, so the
    # indirection stays inside the component and labels remain
    # monotone-decreasing — the fixpoint is unchanged, but propagation
    # distance doubles per round (O(log diameter) rounds on
    # chain-shaped components instead of O(diameter)). The extra join
    # runs on the label frame (paired docs only), not the data.
    lut = stepped.select(
        F.col("doc_id").alias("_cid"), F.col("cluster_id").alias("_cid2")
    )
    return stepped.join(lut, stepped.cluster_id == lut._cid, "left").select(
        "doc_id",
        F.least(
            F.col("cluster_id"),
            F.coalesce("_cid2", F.col("cluster_id")),
        ).alias("cluster_id"),
    )


def connected_components(
    nodes: DataFrame,
    pairs: DataFrame,
    init_labels: DataFrame | None = None,
) -> DataFrame:
    """Distributed connected components by iterative min-label
    propagation. ``nodes`` is (doc_id); ``pairs`` is undirected edges as
    (doc_a, doc_b). Returns (doc_id, cluster_id, cluster_size,
    is_canonical) with cluster_id = min doc_id reachable through edges.

    ``init_labels`` (doc_id, cluster_id) optionally seeds the loop with
    VALID initial labels — each seed must satisfy cluster_id <= doc_id
    and cluster_id reachable from doc_id through ``pairs`` (labels from
    a CC over any SUBSET of the edges qualify, e.g. a per-detector
    cluster table when ``pairs`` is a union of detectors). Seeding
    preserves the min-label fixpoint (operations are all mins over
    in-component values) while cutting convergence to the rounds needed
    to merge across the un-seeded edges; seeds for nodes outside the
    paired subgraph are ignored (singletons never enter the loop).

    Only documents that appear in at least one pair enter the loop —
    everything else is trivially its own singleton cluster (at 100 TB
    the paired subgraph is orders of magnitude smaller than the
    corpus). Each round takes the min over neighbors' labels until
    fixpoint (bounded by cluster diameter — dup clusters are dense, so
    rounds stay few). ``localCheckpoint`` truncates lineage per round;
    convergence is detected from the round's label sum (labels only
    ever decrease, so an unchanged sum IS the fixpoint — one action per
    round, no extra compare join). At 100 TB the same loop runs with
    the alternating large-star/small-star optimization (Kiveris et
    al.); the per-round shape — edge join + min-agg on doc_id — is
    already the distributed form. Reusable over any pair source (text
    LSH, SimHash bands, embedding near-dups)."""
    # No distinct() on the symmetrized edges: every pair source feeding
    # this loop emits unique (a < b) pairs by construction (groupBy /
    # full-outer keyed builds), so the swap union is already dup-free —
    # and even with duplicate edges the per-round min-aggregation is
    # idempotent. Dropping it removes a full shuffle of the edge table
    # before the loop (guide §2.4: remove shuffles outright).
    edges = pairs.union(
        pairs.select(
            F.col("doc_b").alias("doc_a"), F.col("doc_a").alias("doc_b")
        )
    ).cache()
    paired = edges.select(F.col("doc_a").alias("doc_id")).distinct()
    if init_labels is None:
        labels = paired.select("doc_id", F.col("doc_id").alias("cluster_id"))
    else:
        labels = paired.join(
            init_labels.select("doc_id", F.col("cluster_id").alias("_seed")),
            "doc_id",
            "left",
        ).select(
            "doc_id",
            F.least(
                F.col("doc_id"), F.coalesce("_seed", F.col("doc_id"))
            ).alias("cluster_id"),
        )
    # LAZY localCheckpoint + the label-sum action: ONE Spark job per
    # round (the agg materializes the checkpoint) instead of the two an
    # eager checkpoint + separate agg cost — on an iterative loop the
    # per-round job overhead is the dominant fixed cost (guide §1.2:
    # fewer passes; measured in OPTIMIZATION_r12.md).
    labels = labels.localCheckpoint(eager=False)
    prev_sum = labels.agg(F.sum("cluster_id")).first()[0]
    converged = False
    for _ in range(_MAX_CC_ITERS):
        labels = _cc_round(edges, labels).localCheckpoint(eager=False)
        new_sum = labels.agg(F.sum("cluster_id")).first()[0]
        if new_sum == prev_sum:
            converged = True
            break
        prev_sum = new_sum
    if not converged:
        # With pointer doubling, 50 rounds covers component diameters up
        # to ~2^50 — hitting the cap means something is pathologically
        # wrong (or the labels are still usable but possibly not the
        # component-wide min). Surface it; don't spin the driver forever.
        warnings.warn(
            f"connected_components hit the {_MAX_CC_ITERS}-round cap "
            "without reaching a fixpoint; cluster labels may be "
            "incompletely propagated",
            RuntimeWarning,
            stacklevel=2,
        )
    # the loop's per-round actions were the edge frame's only consumers
    # (labels are localCheckpointed, so nothing downstream re-reads the
    # edge lineage) — release the per-call cache instead of leaking a
    # CacheManager entry per invocation
    edges.unpersist()
    # paired docs carry their propagated label; the rest are singletons
    full = nodes.join(labels, "doc_id", "left").select(
        "doc_id", F.coalesce("cluster_id", F.col("doc_id")).alias("cluster_id")
    )
    # Cluster sizes from the PAIRED labels only: every member of a
    # multi-doc component is a paired doc, so counting over `labels`
    # equals counting over the full node set for those clusters, and
    # every unpaired node is its own size-1 singleton (its doc_id never
    # appears as a paired component's label). This shuffles only the
    # paired subgraph — at 100 TB orders of magnitude smaller than the
    # corpus — instead of a full-corpus groupBy (guide §2.3: shuffle
    # fewer bytes).
    sizes = labels.groupBy("cluster_id").agg(
        F.count(F.lit(1)).alias("cluster_size")
    )
    return (
        full.join(sizes, "cluster_id", "left")
        .withColumn("cluster_size", F.coalesce("cluster_size", F.lit(1)))
        .select(
            "doc_id",
            "cluster_id",
            "cluster_size",
            (F.col("doc_id") == F.col("cluster_id")).alias("is_canonical"),
        )
        .orderBy("doc_id")
    )


def near_dup_clusters(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Connected components over the verified LSH near-dup pairs:
    every document gets a cluster_id (the minimum doc_id reachable
    through near-dup edges), a cluster_size, and an is_canonical flag —
    the keep/drop decision a corpus dedup actually executes (keep one
    canonical doc per near-dup cluster).

    Inherently iterative (no SQL equivalent at scale); the DuckDB
    oracle uses a recursive CTE over the same audit-scale pair set.
    The propagation loop itself is the generic ``connected_components``
    operator above (also property-tested against a union-find model on
    random graphs). Served from the session-scoped substrate — see
    ``dup_clusters``."""
    return dup_clusters(spark, sf_dir)


def _near_dup_clusters_sql() -> str:
    base = minhash_pairs_cte()
    assert base.lstrip().startswith("WITH ")
    recursive_base = base.replace("WITH ", "WITH RECURSIVE ", 1)
    return (
        recursive_base
        + """
, edges AS (
  SELECT doc_a AS u, doc_b AS v FROM pairs
  UNION
  SELECT doc_b AS u, doc_a AS v FROM pairs
)
, reach(u, v) AS (
  SELECT u, v FROM edges
  UNION
  SELECT r.u, e.v FROM reach r JOIN edges e ON r.v = e.u
)
, labels AS (
  SELECT dd.doc_id,
    LEAST(dd.doc_id, COALESCE(MIN(r.v), dd.doc_id)) AS cluster_id
  FROM documents dd
  LEFT JOIN reach r ON r.u = dd.doc_id
  GROUP BY dd.doc_id
)
, sizes AS (
  SELECT cluster_id, COUNT(*) AS cluster_size FROM labels GROUP BY cluster_id
)
SELECT l.doc_id, l.cluster_id, s.cluster_size,
  l.doc_id = l.cluster_id AS is_canonical
FROM labels l JOIN sizes s ON l.cluster_id = s.cluster_id
ORDER BY l.doc_id
"""
    )


NEAR_DUP_CLUSTERS_SQL = _near_dup_clusters_sql()


# --- bounded label propagation (giant-component hardening) ------------------
#
# The generic connected_components loop converges in O(log diameter)
# rounds and caps at 50 — but a pathological near-dup graph (one
# accidental super-hub, an adversarial chain) degrades SILENTLY: the cap
# fires a warning the driver hash never sees. This variant makes the
# degradation measurable and hash-anchored: propagate min-labels for a
# FIXED K rounds over a DEGREE-CAPPED edge set and emit a one-row
# certificate — how many edges the cap kept, how many components the
# bounded labels see, and whether one more round would still change any
# label (converged_within_k: the 1/0 driver-hashed convergence
# certificate). Deterministic by construction (no loop-until-fixpoint),
# so the DuckDB twin is the same K rounds unrolled as chained CTEs over
# real data — nothing pinned to a constant.

BCC_ROUNDS = 3
BCC_DEGREE_CAP = 8


def _bcc_edges(pairs: DataFrame, degree_cap: int) -> DataFrame:
    """Directed, deduped, degree-capped edge set (u, v): each node keeps
    its ``degree_cap`` smallest neighbors."""
    directed = pairs.select("doc_a", "doc_b").union(
        pairs.select(
            F.col("doc_b").alias("doc_a"), F.col("doc_a").alias("doc_b")
        )
    ).distinct()
    w = Window.partitionBy("doc_a").orderBy("doc_b")
    return (
        directed.withColumn("_rk", F.row_number().over(w))
        .filter(F.col("_rk") <= degree_cap)
        .select(F.col("doc_a").alias("u"), F.col("doc_b").alias("v"))
    )


def bounded_cc_labels_from(
    pairs: DataFrame, rounds: int = BCC_ROUNDS, degree_cap: int = BCC_DEGREE_CAP
) -> DataFrame:
    """K-round degree-capped min-label propagation over an undirected
    pair frame (doc_a, doc_b). Returns one row per PAIRED doc:
    (doc_id, label, next_label) where label is the round-K min-label
    and next_label is one additional round — equal everywhere iff the
    bounded propagation reached its fixpoint on the capped graph.

    Degree cap: each node keeps only its ``degree_cap`` smallest
    neighbors (deterministic — smallest doc ids), so every subsequent
    round joins at most cap·|paired| edges no matter how pathological a
    hub is. The cap can split true components (dropped edges) — that is
    the documented trade-off this operator makes MEASURABLE via the
    certificate instead of silent. The per-node capping window
    processes degree-many rows per node; Spark's sort-based WindowExec
    spills past memory, so a 10^9-degree hub degrades to disk, not OOM,
    and everything downstream of the cap is bounded."""
    # localCheckpoint per round (the connected_components discipline):
    # each step references the previous level TWICE (own label + the
    # neighbor lookup), so without plan truncation the lineage doubles
    # per round — 2^K copies of the capped-edge pipeline, the exact
    # blowup the DuckDB twin needed MATERIALIZED for. The label frame is
    # paired-docs-only, so the checkpoints are small.
    edges = _bcc_edges(pairs, degree_cap).localCheckpoint(eager=True)
    labels = (
        edges.select(F.col("u").alias("doc_id"))
        .distinct()
        .select("doc_id", F.col("doc_id").alias("label"))
        .localCheckpoint(eager=True)
    )

    def step(lab: DataFrame) -> DataFrame:
        neigh = (
            edges.join(lab, edges.v == lab.doc_id)
            .groupBy(F.col("u").alias("doc_id"))
            .agg(F.min("label").alias("_nmin"))
        )
        return lab.join(neigh, "doc_id", "left").select(
            "doc_id",
            F.least(
                F.col("label"), F.coalesce("_nmin", F.col("label"))
            ).alias("label"),
        ).localCheckpoint(eager=True)

    for _ in range(rounds):
        labels = step(labels)
    nxt = step(labels).select(
        "doc_id", F.col("label").alias("next_label")
    )
    return labels.join(nxt, "doc_id")


def bounded_cc_certificate(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Registered query: the one-row bounded-propagation certificate over
    the verified LSH near-dup pairs — (rounds, degree_cap,
    n_paired_docs, n_capped_edges, n_components, labels_changed_next_
    round, converged_within_k). converged_within_k = 1 iff round K+1
    changes no label, i.e. the K-round labels ARE the capped graph's
    components; 0 means the graph outran the bound (chain longer than K
    hops, post-cap) and downstream consumers see exactly how far.

    On the synthetic corpus the dup clusters are dense and tiny, so the
    certificate is 1 — the constructed-chain unit test pins the 0 side
    where the round cap binds."""
    pairs = dup_pairs(spark, sf_dir).select("doc_a", "doc_b")
    cap_cnt = _bcc_edges(pairs, BCC_DEGREE_CAP).agg(
        F.count(F.lit(1)).cast("long").alias("n_capped_edges")
    )
    lab = bounded_cc_labels_from(pairs)
    return (
        lab.agg(
            F.lit(BCC_ROUNDS).cast("long").alias("rounds"),
            F.lit(BCC_DEGREE_CAP).cast("long").alias("degree_cap"),
            F.count(F.lit(1)).cast("long").alias("n_paired_docs"),
            F.countDistinct("label").cast("long").alias("n_components"),
            F.sum((F.col("label") != F.col("next_label")).cast("int"))
            .cast("long")
            .alias("labels_changed_next_round"),
            (
                F.sum((F.col("label") != F.col("next_label")).cast("int"))
                == 0
            )
            .cast("long")
            .alias("converged_within_k"),
        )
        .crossJoin(F.broadcast(cap_cnt))
        .select(
            "rounds",
            "degree_cap",
            "n_paired_docs",
            "n_capped_edges",
            "n_components",
            "labels_changed_next_round",
            "converged_within_k",
        )
    )


def _bounded_cc_sql() -> str:
    base = minhash_pairs_cte()
    assert base.lstrip().startswith("WITH ")
    # AS MATERIALIZED: each round references the previous level twice
    # (its own label + the neighbor lookup); without materialization
    # DuckDB inlines the reference and the plan doubles per round —
    # 2^K copies of the whole minhash pair pipeline
    rounds = "".join(
        f""",
l{i + 1} AS MATERIALIZED (
  SELECT l.doc_id,
    LEAST(l.label, COALESCE(MIN(n.label), l.label)) AS label
  FROM l{i} l
  LEFT JOIN edges e ON e.u = l.doc_id
  LEFT JOIN l{i} n ON n.doc_id = e.v
  GROUP BY l.doc_id, l.label
)"""
        for i in range(BCC_ROUNDS + 1)
    )
    return (
        base
        + f""",
directed AS (
  SELECT doc_a AS u, doc_b AS v FROM pairs
  UNION
  SELECT doc_b AS u, doc_a AS v FROM pairs
),
edges AS MATERIALIZED (
  SELECT u, v FROM (
    SELECT u, v, ROW_NUMBER() OVER (PARTITION BY u ORDER BY v) AS rk
    FROM directed
  ) WHERE rk <= {BCC_DEGREE_CAP}
),
l0 AS MATERIALIZED (SELECT DISTINCT u AS doc_id, u AS label FROM edges){rounds}
SELECT CAST({BCC_ROUNDS} AS BIGINT) AS rounds,
  CAST({BCC_DEGREE_CAP} AS BIGINT) AS degree_cap,
  CAST(COUNT(*) AS BIGINT) AS n_paired_docs,
  (SELECT CAST(COUNT(*) AS BIGINT) FROM edges) AS n_capped_edges,
  CAST(COUNT(DISTINCT k.label) AS BIGINT) AS n_components,
  CAST(SUM(CASE WHEN k.label <> n.label THEN 1 ELSE 0 END) AS BIGINT)
    AS labels_changed_next_round,
  CAST(CASE WHEN SUM(CASE WHEN k.label <> n.label THEN 1 ELSE 0 END) = 0
       THEN 1 ELSE 0 END AS BIGINT) AS converged_within_k
FROM l{BCC_ROUNDS} k JOIN l{BCC_ROUNDS + 1} n USING (doc_id)
"""
    )


BOUNDED_CC_CERTIFICATE_SQL = _bounded_cc_sql()


def dedup_retention_plan(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The dedup *action*: per near-dup cluster, pick the survivor by a
    content policy (longest text wins, ties to the lowest doc_id — i.e.
    keep the most complete copy, not just the lowest id) and emit the
    keep/drop plan every dropped document can trace to its survivor.
    This is the step a training-data pipeline actually executes after
    cluster detection — the reference's dedup (gold_pipeline.py:79-97
    drop_duplicates) has no analogue for near-dups; policy-based
    retention is the near-dup generalization of its keep-first rule.

    Scale shape: the survivor per cluster is a map-side-combinable
    max-of-struct aggregation (no window over the full corpus — robust
    to one pathologically large cluster), joined back on cluster_id.
    Everything is keyed on cluster_id/doc_id; nothing quadratic. The
    cluster table comes from the shared substrate (``dup_clusters``)."""
    docs = load_table(spark, sf_dir, "documents").select("doc_id", "n_chars")
    return retention_plan_from(dup_clusters(spark, sf_dir), docs)


def retention_plan_from(clusters: DataFrame, docs: DataFrame) -> DataFrame:
    """Frame-level retention plan: ``clusters`` is (doc_id, cluster_id,
    cluster_size) — the substrate or a written dup_clusters table —
    ``docs`` is (doc_id, n_chars). Shared by the registered query and
    cli/run_dedup.py's read-back path."""
    sized = clusters.join(docs, "doc_id")
    winners = (
        sized.groupBy("cluster_id")
        .agg(
            F.max(
                F.struct(
                    F.col("n_chars"), (-F.col("doc_id")).alias("neg_doc_id")
                )
            ).alias("w")
        )
        .select("cluster_id", (-F.col("w.neg_doc_id")).alias("kept_doc_id"))
    )
    return (
        sized.join(winners, "cluster_id")
        .select(
            "doc_id",
            "cluster_id",
            "cluster_size",
            (F.col("doc_id") == F.col("kept_doc_id")).alias("keep"),
            "kept_doc_id",
        )
        .orderBy("doc_id")
    )


DEDUP_RETENTION_PLAN_SQL = f"""
SELECT c.doc_id, c.cluster_id, c.cluster_size,
  c.doc_id = w.kept_doc_id AS keep, w.kept_doc_id
FROM ({NEAR_DUP_CLUSTERS_SQL}) c
JOIN (
  SELECT DISTINCT cluster_id,
    FIRST_VALUE(doc_id) OVER (
      PARTITION BY cluster_id ORDER BY n_chars DESC, doc_id ASC
    ) AS kept_doc_id
  FROM ({NEAR_DUP_CLUSTERS_SQL}) cc JOIN documents d USING (doc_id)
) w ON c.cluster_id = w.cluster_id
ORDER BY c.doc_id
"""


def dedup_rate_by_source(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-source dedup report: documents, survivors, drops and the drop
    rate after executing the retention plan — the 'which feeds are
    duplicating' dashboard a corpus pipeline watches. Pure rollup over
    the retention plan joined with the (already-loaded) source column;
    adds one narrow-key aggregation to the cluster pipeline."""
    plan = dedup_retention_plan(spark, sf_dir).select("doc_id", "keep")
    src = load_table(spark, sf_dir, "documents").select("doc_id", "source")
    return rate_by_source_from(plan, src)


def rate_by_source_from(plan: DataFrame, src: DataFrame) -> DataFrame:
    """Frame-level per-source dedup rate over a (doc_id, keep) plan and a
    (doc_id, source) dimension — shared with cli/run_dedup.py."""
    return (
        plan.join(src, "doc_id")
        .groupBy("source")
        .agg(
            F.count(F.lit(1)).alias("n_docs"),
            F.sum(F.col("keep").cast("long")).alias("n_kept"),
            F.sum((~F.col("keep")).cast("long")).alias("n_dropped"),
            (
                F.sum((~F.col("keep")).cast("long")).cast("double")
                / F.count(F.lit(1))
            ).alias("drop_rate"),
        )
        .orderBy("source")
    )


DEDUP_RATE_BY_SOURCE_SQL = f"""
SELECT d.source,
  CAST(COUNT(*) AS BIGINT) AS n_docs,
  CAST(SUM(CASE WHEN p.keep THEN 1 ELSE 0 END) AS BIGINT) AS n_kept,
  CAST(SUM(CASE WHEN p.keep THEN 0 ELSE 1 END) AS BIGINT) AS n_dropped,
  CAST(SUM(CASE WHEN p.keep THEN 0 ELSE 1 END) AS DOUBLE) / COUNT(*) AS drop_rate
FROM ({DEDUP_RETENTION_PLAN_SQL}) p
JOIN documents d ON d.doc_id = p.doc_id
GROUP BY d.source
ORDER BY d.source
"""


def cross_source_dup_matrix(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Source×source near-dup pair counts — which feeds copy from each
    other (vs duplicate internally). Pair endpoints join to their source
    and the unordered source pair is canonicalized with least/greatest
    so (a,b) and (b,a) land in one cell. The doc→source join is a
    broadcast of the (tiny) pair frame against the dimension at test
    scale and a hash join on doc_id at corpus scale; the matrix rollup
    is |sources|² at most."""
    pairs = minhash_lsh_pairs(spark, sf_dir).select("doc_a", "doc_b")
    src = load_table(spark, sf_dir, "documents").select("doc_id", "source")
    sa = src.select(
        F.col("doc_id").alias("doc_a"), F.col("source").alias("source_a")
    )
    sb = src.select(
        F.col("doc_id").alias("doc_b"), F.col("source").alias("source_b")
    )
    return (
        pairs.join(sa, "doc_a")
        .join(sb, "doc_b")
        .select(
            F.least("source_a", "source_b").alias("source_lo"),
            F.greatest("source_a", "source_b").alias("source_hi"),
        )
        .groupBy("source_lo", "source_hi")
        .agg(F.count(F.lit(1)).alias("n_pairs"))
        .orderBy("source_lo", "source_hi")
    )


CROSS_SOURCE_DUP_MATRIX_SQL = (
    minhash_pairs_cte()
    + """
SELECT least(da.source, db.source) AS source_lo,
  greatest(da.source, db.source) AS source_hi,
  CAST(COUNT(*) AS BIGINT) AS n_pairs
FROM pairs p
JOIN documents da ON da.doc_id = p.doc_a
JOIN documents db ON db.doc_id = p.doc_b
GROUP BY least(da.source, db.source), greatest(da.source, db.source)
ORDER BY source_lo, source_hi
"""
)


# --- incremental near-dup (new batch vs indexed corpus) ----------------------

# Deterministic batch membership: every 5th document plays the "incoming
# batch", the rest are the already-indexed corpus. In production the index
# side is the PERSISTED signature/band table from prior runs — the point
# of the asymmetric shape is that continuous ingestion only pays
# O(batch) signature work + a band join against the index, never a
# re-dedup of the whole corpus.
INCREMENTAL_BATCH_MOD = 5
INCREMENTAL_BATCH_REM = 4


def _is_batch(col: Column) -> Column:
    return col % INCREMENTAL_BATCH_MOD == INCREMENTAL_BATCH_REM


def incremental_near_dup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per incoming-batch document: how many indexed documents it
    near-duplicates (LSH candidates verified with exact jaccard ≥
    threshold), the best match (highest jaccard, ties to lowest id),
    and the keep/drop flag.

    The band join is ASYMMETRIC — batch bands ⋈ index bands — so the
    candidate work scales with the batch, not the corpus. Stop-bucket
    frequencies are computed over the FULL band table (corpus statistics,
    shared with the symmetric pipeline so the DuckDB twin can reuse the
    same CTE chain and filter pairs to the cross-boundary orientation)."""
    d = shingled_docs_table(spark, sf_dir)
    sigs = minhash_sig_table(spark, sf_dir)
    bands = lsh_bands_table(spark, sf_dir)
    small_buckets = (
        bands.groupBy("band", "band_key")
        .agg(F.count(F.lit(1)).alias("bsize"))
        .filter(F.col("bsize") <= MAX_BUCKET_SIZE)
        .select("band", "band_key")
    )
    fband = bands.join(F.broadcast(small_buckets), ["band", "band_key"])
    batch_bands = fband.filter(_is_batch(F.col("doc_id")))
    index_bands = fband.filter(~_is_batch(F.col("doc_id")))
    cand = (
        batch_bands.alias("x")
        .join(
            index_bands.alias("y"),
            (F.col("x.band") == F.col("y.band"))
            & (F.col("x.band_key") == F.col("y.band_key")),
        )
        .select(F.col("x.doc_id").alias("doc_id"), F.col("y.doc_id").alias("match_id"))
        .distinct()
    )
    sa = sigs.select(F.col("doc_id"), F.col("sig").alias("sig_a"))
    sb = sigs.select(F.col("doc_id").alias("match_id"), F.col("sig").alias("sig_b"))
    agreement = sum(
        (F.element_at("sig_a", i + 1) == F.element_at("sig_b", i + 1)).cast("int")
        for i in range(NUM_PERMS)
    )
    cand = (
        cand.join(F.broadcast(sa), "doc_id")
        .join(F.broadcast(sb), "match_id")
        .filter(agreement >= MIN_SIG_AGREEMENT)
        .select("doc_id", "match_id")
    )
    da = d.select("doc_id", F.col("sh").alias("sh_a"))
    db = d.select(F.col("doc_id").alias("match_id"), F.col("sh").alias("sh_b"))
    inter = F.size(F.array_intersect("sh_a", "sh_b"))
    union = F.size(F.array_union("sh_a", "sh_b"))
    matches = (
        cand.join(da, "doc_id")
        .join(db, "match_id")
        .withColumn("jaccard", inter.cast("double") / union)
        .filter(F.col("jaccard") >= JACCARD_THRESHOLD)
        .select("doc_id", "match_id", "jaccard")
    )
    # (jaccard DESC, match_id ASC) best-match via row_number + a grouped
    # rollup for the count — the min(struct) single-agg variant planned
    # as SortAggregate and measured slower (OPTIMIZATION_r12.md
    # "min(struct) postmortem").
    w = Window.partitionBy("doc_id").orderBy(F.desc("jaccard"), F.asc("match_id"))
    best = (
        matches.withColumn("_rn", F.row_number().over(w))
        .groupBy("doc_id")
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_matches"),
            F.max(F.when(F.col("_rn") == 1, F.col("match_id"))).alias(
                "best_match_id"
            ),
            F.max(F.when(F.col("_rn") == 1, F.col("jaccard"))).alias(
                "best_jaccard"
            ),
        )
    )
    incoming = (
        load_table(spark, sf_dir, "documents")
        .filter(_is_batch(F.col("doc_id")))
        .select("doc_id")
    )
    # best is the matched-dup subset of the batch (normally a small
    # fraction); broadcast it so the report join needs no shuffle of the
    # incoming side. If a corpus ever produced a dup set too big to
    # broadcast, drop the hint and this becomes a doc_id hash join.
    return (
        incoming.join(F.broadcast(best), "doc_id", "left")
        .select(
            "doc_id",
            F.coalesce("n_matches", F.lit(0)).cast("long").alias("n_matches"),
            "best_match_id",
            "best_jaccard",
            (F.coalesce("n_matches", F.lit(0)) > 0).alias("is_dup"),
        )
        .orderBy("doc_id")
    )


INCREMENTAL_NEAR_DUP_SQL = (
    minhash_pairs_cte()
    + f"""
, inc_pairs AS (
  -- cross-boundary pairs from the symmetric pipeline, re-oriented so
  -- doc_id is always the incoming-batch side
  SELECT
    CASE WHEN doc_a % {INCREMENTAL_BATCH_MOD} = {INCREMENTAL_BATCH_REM}
         THEN doc_a ELSE doc_b END AS doc_id,
    CASE WHEN doc_a % {INCREMENTAL_BATCH_MOD} = {INCREMENTAL_BATCH_REM}
         THEN doc_b ELSE doc_a END AS match_id,
    jaccard
  FROM pairs
  WHERE (doc_a % {INCREMENTAL_BATCH_MOD} = {INCREMENTAL_BATCH_REM})
     != (doc_b % {INCREMENTAL_BATCH_MOD} = {INCREMENTAL_BATCH_REM})
)
, best AS (
  SELECT doc_id, match_id AS best_match_id, jaccard AS best_jaccard,
    ROW_NUMBER() OVER (PARTITION BY doc_id ORDER BY jaccard DESC, match_id ASC) AS _rn,
    COUNT(*) OVER (PARTITION BY doc_id) AS n_matches
  FROM inc_pairs
)
SELECT i.doc_id,
  CAST(COALESCE(b.n_matches, 0) AS BIGINT) AS n_matches,
  b.best_match_id,
  b.best_jaccard,
  COALESCE(b.n_matches, 0) > 0 AS is_dup
FROM (SELECT doc_id FROM documents
      WHERE doc_id % {INCREMENTAL_BATCH_MOD} = {INCREMENTAL_BATCH_REM}) i
LEFT JOIN (SELECT * FROM best WHERE _rn = 1) b ON i.doc_id = b.doc_id
ORDER BY i.doc_id
"""
)


# --- shingle containment (subset-style duplication) --------------------------

# Containment C(A,B) = |A ∩ B| / min(|A|,|B|): near 1.0 when the smaller
# document is embedded in the larger — the quote/boilerplate-inclusion
# case where jaccard stays LOW because the union is dominated by the big
# document, so the LSH-for-jaccard path structurally under-recalls it.
CONTAINMENT_THRESHOLD = 0.8
# Stop-shingle cap: shingles occurring in more than this many documents
# are dropped before the inverted-index self-join (same role as the LSH
# stop-bucket cap — a boilerplate shingle shared by 10^6 docs would
# otherwise emit 10^12 candidate rows). Containment is then defined over
# the capped shingle sets, which the oracle mirrors exactly.
CONTAINMENT_SHINGLE_MAX_DF = 64


def shingle_containment_pairs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Subset-style near-dup detection: document pairs whose capped
    2-gram-shingle containment |A ∩ B| / min(|A|,|B|) reaches
    CONTAINMENT_THRESHOLD, with both directionally-named sizes and the
    shared count reported.

    Scale shape — inverted index, NOT an all-pairs join: explode to
    (shingle_hash, doc_id) rows, drop stop-shingles above the df cap,
    self-join on the shingle key (candidate work scales with shared
    content, like decontamination_report's shingle join), then one
    (doc_a, doc_b) count and a broadcast-back of the per-doc capped set
    sizes. Every compared value is an exact BIGINT or one final
    division. Complements minhash_lsh_pairs: run both at corpus scale —
    LSH for symmetric near-dups, this for asymmetric inclusion. The
    shingled frame comes from the shared substrate."""
    def build_capped() -> DataFrame:
        d = shingled_docs_table(spark, sf_dir).select(
            "doc_id", F.explode("sh").alias("shingle")
        ).select("doc_id", F.md5("shingle").alias("h"))
        return d.join(
            d.groupBy("h")
            .agg(F.count(F.lit(1)).alias("df"))
            .filter(F.col("df") <= CONTAINMENT_SHINGLE_MAX_DF)
            .select("h"),
            "h",
        )

    # session-registered: feeds both self-join sides and the size rollup
    capped = _text_frame(spark, sf_dir, "containment_capped", build_capped)
    sizes = capped.groupBy("doc_id").agg(F.count(F.lit(1)).alias("n_sh"))
    shared = (
        capped.select(F.col("doc_id").alias("doc_a"), "h")
        .join(capped.select(F.col("doc_id").alias("doc_b"), "h"), "h")
        .filter(F.col("doc_a") < F.col("doc_b"))
        .groupBy("doc_a", "doc_b")
        .agg(F.count(F.lit(1)).alias("n_shared"))
    )
    return (
        shared.join(
            F.broadcast(sizes.withColumnRenamed("doc_id", "doc_a")).withColumnRenamed(
                "n_sh", "n_a"
            ),
            "doc_a",
        )
        .join(
            F.broadcast(sizes.withColumnRenamed("doc_id", "doc_b")).withColumnRenamed(
                "n_sh", "n_b"
            ),
            "doc_b",
        )
        .withColumn(
            "containment",
            F.col("n_shared") / F.least(F.col("n_a"), F.col("n_b")),
        )
        .filter(F.col("containment") >= CONTAINMENT_THRESHOLD)
        .select("doc_a", "doc_b", "n_a", "n_b", "n_shared", "containment")
        .orderBy("doc_a", "doc_b")
    )


SHINGLE_CONTAINMENT_SQL = f"""{_DOCS_SHINGLED_CTE}
, e AS (
  SELECT doc_id, md5(shingle) AS h
  FROM (SELECT doc_id, unnest(sh) AS shingle FROM d)
),
capped AS (
  SELECT e.doc_id, e.h FROM e
  JOIN (
    SELECT h FROM e GROUP BY h
    HAVING COUNT(*) <= {CONTAINMENT_SHINGLE_MAX_DF}
  ) keep ON keep.h = e.h
),
sizes AS (
  SELECT doc_id, CAST(COUNT(*) AS BIGINT) AS n_sh FROM capped GROUP BY doc_id
),
shared AS (
  SELECT a.doc_id AS doc_a, b.doc_id AS doc_b,
    CAST(COUNT(*) AS BIGINT) AS n_shared
  FROM capped a JOIN capped b ON a.h = b.h AND a.doc_id < b.doc_id
  GROUP BY a.doc_id, b.doc_id
)
SELECT s.doc_a, s.doc_b, sa.n_sh AS n_a, sb.n_sh AS n_b, s.n_shared,
  CAST(s.n_shared AS DOUBLE) / LEAST(sa.n_sh, sb.n_sh) AS containment
FROM shared s
JOIN sizes sa ON sa.doc_id = s.doc_a
JOIN sizes sb ON sb.doc_id = s.doc_b
WHERE CAST(s.n_shared AS DOUBLE) / LEAST(sa.n_sh, sb.n_sh)
      >= {CONTAINMENT_THRESHOLD}
ORDER BY s.doc_a, s.doc_b
"""


# --- LSH recall calibration --------------------------------------------------


def lsh_recall_report(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Recall calibration for the banded-LSH detector: on the bounded
    audit slice where exact all-pairs jaccard is affordable, bucket the
    true pairs by jaccard decile and report how many the LSH pipeline
    detected — the report that justifies (or re-tunes) NUM_PERMS /
    LSH_BANDS before a 100 TB run. The S-curve should show recall
    rising toward 1.0 well above the 0.4 threshold.

    Cost is the audit slice (quadratic side) + the LSH pipeline filtered
    to the same slice; the join is on (doc_a, doc_b) pair keys."""
    exact = ngram_jaccard_pairs(spark, sf_dir)
    detected = (
        minhash_lsh_pairs(spark, sf_dir)
        .filter(
            (F.col("doc_a") < EXACT_PAIRS_MAX_DOC_ID)
            & (F.col("doc_b") < EXACT_PAIRS_MAX_DOC_ID)
        )
        .select("doc_a", "doc_b", F.lit(1).alias("hit"))
    )
    binned = exact.join(detected, ["doc_a", "doc_b"], "left").select(
        (
            F.least(F.floor(F.col("jaccard") * 10), F.lit(9)).cast("double")
            / 10.0
        ).alias("jaccard_bin"),
        "hit",
    )
    return (
        binned.groupBy("jaccard_bin")
        .agg(
            F.count(F.lit(1)).alias("n_true_pairs"),
            F.sum(F.coalesce("hit", F.lit(0))).cast("long").alias("n_detected"),
            (
                F.sum(F.coalesce("hit", F.lit(0))).cast("double")
                / F.count(F.lit(1))
            ).alias("recall"),
        )
        .orderBy("jaccard_bin")
    )


LSH_RECALL_REPORT_SQL = f"""
WITH e AS (SELECT * FROM ({NGRAM_JACCARD_PAIRS_SQL})),
m AS (
  SELECT doc_a, doc_b, 1 AS hit FROM ({MINHASH_LSH_PAIRS_SQL})
  WHERE doc_a < {EXACT_PAIRS_MAX_DOC_ID} AND doc_b < {EXACT_PAIRS_MAX_DOC_ID}
)
SELECT LEAST(floor(e.jaccard * 10), 9) / 10 AS jaccard_bin,
  CAST(COUNT(*) AS BIGINT) AS n_true_pairs,
  CAST(SUM(CASE WHEN m.hit IS NOT NULL THEN 1 ELSE 0 END) AS BIGINT) AS n_detected,
  CAST(SUM(CASE WHEN m.hit IS NOT NULL THEN 1 ELSE 0 END) AS DOUBLE) / COUNT(*) AS recall
FROM e LEFT JOIN m ON m.doc_a = e.doc_a AND m.doc_b = e.doc_b
GROUP BY LEAST(floor(e.jaccard * 10), 9) / 10
ORDER BY jaccard_bin
"""


# --- cross-detector agreement ------------------------------------------------


def dup_detector_overlap(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Which near-dup detectors agree: the text MinHash-LSH pair set vs
    the embedding-cosine pair set, on the comparable domain (documents
    with an embedding row — vec_id identifies the embedded doc slice;
    both restricted to id < NEAR_DUP_MAX_VEC_ID, the embedding path's
    audit bound). A multimodal pipeline reads this to learn whether its
    detectors are redundant (template copies caught by both) or
    complementary (paraphrases only the embedding path sees).

    r12: the winnowing pair detector (plans/text_analysis.
    winnowing_dup_pairs) joins the comparison as the third axis —
    detector labels become the '+'-joined combination of emitting
    detectors (e.g. 'text+winnowing'), so the report generalizes past
    two axes without a combinatorial CASE.

    Scale shape: all inputs are already-bounded pair sets (text pairs
    and the winnow posting list from materialized substrates),
    full-outer-joined on the pair key — linear in pairs, nothing
    quadratic."""
    from ..plans.text_analysis import winnowing_dup_pairs
    from .similarity import NEAR_DUP_MAX_VEC_ID, embedding_near_dup_pairs

    def slice_(df, flag):
        return df.filter(
            (F.col("doc_a") < NEAR_DUP_MAX_VEC_ID)
            & (F.col("doc_b") < NEAR_DUP_MAX_VEC_ID)
        ).withColumn(flag, F.lit(1))

    tp = slice_(dup_pairs(spark, sf_dir).select("doc_a", "doc_b"), "t")
    ep = (
        embedding_near_dup_pairs(spark, sf_dir)
        .select(
            F.col("vec_a").alias("doc_a"), F.col("vec_b").alias("doc_b")
        )
        .withColumn("e", F.lit(1))
    )
    wp = slice_(
        winnowing_dup_pairs(spark, sf_dir).select("doc_a", "doc_b"), "w"
    )
    detector = F.expr(
        "substring(concat("
        "  CASE WHEN t IS NOT NULL THEN '+text' ELSE '' END,"
        "  CASE WHEN e IS NOT NULL THEN '+embedding' ELSE '' END,"
        "  CASE WHEN w IS NOT NULL THEN '+winnowing' ELSE '' END), 2)"
    )
    return (
        tp.join(ep, ["doc_a", "doc_b"], "full_outer")
        .join(wp, ["doc_a", "doc_b"], "full_outer")
        .select(detector.alias("detector"))
        .groupBy("detector")
        .agg(F.count(F.lit(1)).alias("n_pairs"))
        .orderBy("detector")
    )


from .similarity import (  # noqa: E402  (no cycle: similarity imports nothing from here)
    EMBEDDING_NEAR_DUP_SQL as _EMB_ND_SQL,
    NEAR_DUP_MAX_VEC_ID as _EMB_ND_MAX,
)


def _union_pairs_table(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Session substrate: the text ∪ embedding pair table
    (doc_a, doc_b, t, e) over the shared audit slice — t/e mark which
    detector(s) emitted the pair (full-outer on the pair key). Feeds
    the union CC and the cluster-grain provenance rollup."""

    def build() -> DataFrame:
        from .similarity import emb_near_dup_pairs_table

        tp = (
            dup_pairs(spark, sf_dir)
            .select("doc_a", "doc_b")
            .filter(
                (F.col("doc_a") < _EMB_ND_MAX) & (F.col("doc_b") < _EMB_ND_MAX)
            )
            .withColumn("t", F.lit(1))
        )
        ep = (
            emb_near_dup_pairs_table(spark, sf_dir)
            .select(
                F.col("vec_a").alias("doc_a"), F.col("vec_b").alias("doc_b")
            )
            .withColumn("e", F.lit(1))
        )
        return tp.join(ep, ["doc_a", "doc_b"], "full_outer")

    return _text_frame(spark, sf_dir, "union_pairs", build)


def _union_clusters_table(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Session substrate: CC labels over the union pair graph, SEEDED
    with the embedding-detector cluster labels (each is the min vec_id
    of an embedding component — a subset of its union component, so the
    seed is a valid initial label and the loop starts with every
    embedding chain already collapsed). Text labels are NOT used as
    seeds: the text substrate is clustered over the FULL corpus, and a
    full-corpus label can be reachable only through a path that leaves
    the audit slice — invalid for the bounded union graph."""

    def build() -> DataFrame:
        from .similarity import emb_clusters_table

        nodes = (
            load_table(spark, sf_dir, "documents")
            .filter(F.col("doc_id") < _EMB_ND_MAX)
            .select("doc_id")
        )
        seeds = emb_clusters_table(spark, sf_dir).select(
            F.col("vec_id").alias("doc_id"), "cluster_id"
        )
        return connected_components(
            nodes,
            _union_pairs_table(spark, sf_dir).select("doc_a", "doc_b"),
            init_labels=seeds,
        )

    return _text_frame(spark, sf_dir, "union_clusters", build)


def cross_detector_dup_clusters(spark: SparkSession, sf_dir: str) -> DataFrame:
    """UNION-detector near-dup clustering — the pass a production dedup
    pipeline actually executes when it runs BOTH detectors: a document
    pair is an edge if the text path (MinHash/LSH, verified jaccard) OR
    the embedding path (IVF-cell-blocked cosine) flagged it, and
    connected components run over the union graph, so a paraphrase
    chain (embedding-only edges) and a template chain (text-only edges)
    sharing one document merge into ONE cluster — the case either
    detector alone splits in two. Per document: the union cluster
    label/size/canonical flag plus the cluster's edge provenance
    (text-only / embedding-only / both pair counts — the redundancy
    diagnostic of dup_detector_overlap at cluster grain).

    Audit slice: doc/vec ids < NEAR_DUP_MAX_VEC_ID, the embedding
    path's oracle bound (the whole table at sf<=0.01). Scale shape:
    both pair sets come from their session substrates (bounded, never
    all-pairs); the union pair table AND the union CC labels are
    THEMSELVES session substrates (r8 VERDICT perf-watch: repeat calls
    previously re-ran the union CC from scratch), with the CC seeded by
    the per-detector embedding cluster labels already materialized
    beside the corpus — valid initial labels, so the loop only has to
    merge across detectors; provenance is one keyed rollup of the pair
    set."""
    up = _union_pairs_table(spark, sf_dir)
    cc = _union_clusters_table(spark, sf_dir)
    prov = (
        up.join(
            cc.select(F.col("doc_id").alias("doc_a"), "cluster_id"), "doc_a"
        )
        .groupBy("cluster_id")
        .agg(
            F.sum(
                F.when(F.col("t").isNotNull() & F.col("e").isNull(), 1).otherwise(0)
            )
            .cast("long")
            .alias("n_text_only_pairs"),
            F.sum(
                F.when(F.col("e").isNotNull() & F.col("t").isNull(), 1).otherwise(0)
            )
            .cast("long")
            .alias("n_emb_only_pairs"),
            F.sum(
                F.when(F.col("t").isNotNull() & F.col("e").isNotNull(), 1).otherwise(
                    0
                )
            )
            .cast("long")
            .alias("n_both_pairs"),
        )
    )
    return (
        cc.join(prov, "cluster_id", "left")
        .select(
            "doc_id",
            "cluster_id",
            "cluster_size",
            "is_canonical",
            F.coalesce("n_text_only_pairs", F.lit(0))
            .cast("long")
            .alias("n_text_only_pairs"),
            F.coalesce("n_emb_only_pairs", F.lit(0))
            .cast("long")
            .alias("n_emb_only_pairs"),
            F.coalesce("n_both_pairs", F.lit(0))
            .cast("long")
            .alias("n_both_pairs"),
        )
        .orderBy("doc_id")
    )


def _cross_detector_clusters_sql() -> str:
    base = minhash_pairs_cte()
    recursive_base = base.replace("WITH ", "WITH RECURSIVE ", 1)
    return (
        recursive_base
        + f"""
, tp AS (
  SELECT doc_a, doc_b FROM pairs
  WHERE doc_a < {_EMB_ND_MAX} AND doc_b < {_EMB_ND_MAX}
)
, ep AS (
  SELECT vec_a AS doc_a, vec_b AS doc_b FROM ({_EMB_ND_SQL})
)
, up AS (SELECT doc_a, doc_b FROM tp UNION SELECT doc_a, doc_b FROM ep)
, edges AS (
  SELECT doc_a AS u, doc_b AS v FROM up
  UNION
  SELECT doc_b AS u, doc_a AS v FROM up
)
, reach(u, v) AS (
  SELECT u, v FROM edges
  UNION
  SELECT r.u, e.v FROM reach r JOIN edges e ON r.v = e.u
)
, labels AS (
  SELECT dd.doc_id,
    LEAST(dd.doc_id, COALESCE(MIN(r.v), dd.doc_id)) AS cluster_id
  FROM (SELECT doc_id FROM documents WHERE doc_id < {_EMB_ND_MAX}) dd
  LEFT JOIN reach r ON r.u = dd.doc_id
  GROUP BY dd.doc_id
)
, sizes AS (
  SELECT cluster_id, COUNT(*) AS cluster_size FROM labels GROUP BY cluster_id
)
, prov AS (
  SELECT l.cluster_id,
    CAST(SUM(CASE WHEN t.doc_a IS NOT NULL AND e2.doc_a IS NULL
      THEN 1 ELSE 0 END) AS BIGINT) AS n_text_only_pairs,
    CAST(SUM(CASE WHEN e2.doc_a IS NOT NULL AND t.doc_a IS NULL
      THEN 1 ELSE 0 END) AS BIGINT) AS n_emb_only_pairs,
    CAST(SUM(CASE WHEN t.doc_a IS NOT NULL AND e2.doc_a IS NOT NULL
      THEN 1 ELSE 0 END) AS BIGINT) AS n_both_pairs
  FROM up p
  LEFT JOIN tp t ON t.doc_a = p.doc_a AND t.doc_b = p.doc_b
  LEFT JOIN ep e2 ON e2.doc_a = p.doc_a AND e2.doc_b = p.doc_b
  JOIN labels l ON l.doc_id = p.doc_a
  GROUP BY l.cluster_id
)
SELECT l.doc_id, l.cluster_id, s.cluster_size,
  l.doc_id = l.cluster_id AS is_canonical,
  COALESCE(pv.n_text_only_pairs, 0) AS n_text_only_pairs,
  COALESCE(pv.n_emb_only_pairs, 0) AS n_emb_only_pairs,
  COALESCE(pv.n_both_pairs, 0) AS n_both_pairs
FROM labels l
JOIN sizes s ON l.cluster_id = s.cluster_id
LEFT JOIN prov pv ON pv.cluster_id = l.cluster_id
ORDER BY l.doc_id
"""
    )


CROSS_DETECTOR_DUP_CLUSTERS_SQL = _cross_detector_clusters_sql()

from ..plans.text_analysis import (  # noqa: E402  (no cycle: text_analysis imports only functions/sources)
    WINNOW_MIN_SHARED as _WINNOW_MIN_SHARED,
    WINNOWING_DUP_PAIRS_SQL as _WINNOW_PAIRS_SQL,
    winnow_fps_table as _winnow_fps_table,
)

DUP_DETECTOR_OVERLAP_SQL = f"""
WITH tp AS (
  SELECT doc_a, doc_b, 1 AS t
  FROM ({MINHASH_LSH_PAIRS_SQL})
  WHERE doc_a < {_EMB_ND_MAX} AND doc_b < {_EMB_ND_MAX}
), ep AS (
  SELECT vec_a AS doc_a, vec_b AS doc_b, 1 AS e
  FROM ({_EMB_ND_SQL})
), wp AS (
  SELECT doc_a, doc_b, 1 AS w
  FROM ({_WINNOW_PAIRS_SQL})
  WHERE doc_a < {_EMB_ND_MAX} AND doc_b < {_EMB_ND_MAX}
)
SELECT detector, CAST(COUNT(*) AS BIGINT) AS n_pairs FROM (
  SELECT substr(concat(
      CASE WHEN t IS NOT NULL THEN '+text' ELSE '' END,
      CASE WHEN e IS NOT NULL THEN '+embedding' ELSE '' END,
      CASE WHEN w IS NOT NULL THEN '+winnowing' ELSE '' END), 2) AS detector
  FROM tp FULL OUTER JOIN ep USING (doc_a, doc_b)
  FULL OUTER JOIN wp USING (doc_a, doc_b)
) GROUP BY detector ORDER BY detector
"""


def dedup_token_savings(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Token-weighted dedup impact per source: training tokens before
    and after executing the retention plan, and the share saved — the
    number that actually matters for a corpus budget (a feed can have a
    high doc drop RATE but trivial token savings if its dups are short).
    One narrow rollup over the shared substrate's retention plan joined
    with per-doc token counts."""
    plan = dedup_retention_plan(spark, sf_dir).select("doc_id", "keep")
    docs = load_table(spark, sf_dir, "documents").select(
        "doc_id", "source", F.size(tokens(F.col("text"))).alias("n_tok")
    )
    return token_savings_from(plan, docs)


def token_savings_from(plan: DataFrame, docs_tok: DataFrame) -> DataFrame:
    """Frame-level token-savings rollup over a (doc_id, keep) plan and a
    (doc_id, source, n_tok) frame — shared with cli/run_dedup.py."""
    return (
        plan.join(docs_tok, "doc_id")
        .groupBy("source")
        .agg(
            F.sum("n_tok").alias("tokens_total"),
            F.sum(F.when(F.col("keep"), F.col("n_tok")).otherwise(0)).alias(
                "tokens_kept"
            ),
            F.sum(F.when(~F.col("keep"), F.col("n_tok")).otherwise(0)).alias(
                "tokens_dropped"
            ),
            (
                F.sum(F.when(~F.col("keep"), F.col("n_tok")).otherwise(0)).cast(
                    "double"
                )
                / F.sum("n_tok")
            ).alias("token_drop_rate"),
        )
        .orderBy("source")
    )


DEDUP_TOKEN_SAVINGS_SQL = f"""
SELECT d.source,
  CAST(SUM(len({tokens_sql()})) AS BIGINT) AS tokens_total,
  CAST(SUM(CASE WHEN p.keep THEN len({tokens_sql()}) ELSE 0 END) AS BIGINT)
    AS tokens_kept,
  CAST(SUM(CASE WHEN p.keep THEN 0 ELSE len({tokens_sql()}) END) AS BIGINT)
    AS tokens_dropped,
  CAST(SUM(CASE WHEN p.keep THEN 0 ELSE len({tokens_sql()}) END) AS DOUBLE)
    / SUM(len({tokens_sql()})) AS token_drop_rate
FROM ({DEDUP_RETENTION_PLAN_SQL}) p
JOIN documents d ON d.doc_id = p.doc_id
GROUP BY d.source
ORDER BY d.source
"""


# --- LSH band-parameter tuning report ---------------------------------------

# Every (bands, rows) factorization of the NUM_PERMS-component signature:
# the operational knob an operator turns BEFORE a 100 TB near-dup run.
LSH_TUNING_CONFIGS = [
    (NUM_PERMS // r, r) for r in (1, 2, 4, 8) if NUM_PERMS % r == 0
]


def _detect_prob(bands: int, r: int, tau: float = JACCARD_THRESHOLD) -> float:
    """P[candidate | jaccard = tau] = 1 - (1 - tau^r)^bands, the classic
    S-curve — computed in PYTHON and inlined as the same literal into
    both engines, so no float-function parity risk."""
    return round(1.0 - (1.0 - tau**r) ** bands, 6)


def lsh_band_tuning_report(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Measured-vs-theoretical banding tradeoff over THIS corpus's actual
    MinHash signatures: for every (bands, rows) factorization of the
    signature, the theoretical detection probability at the jaccard
    threshold next to the measured bucket structure — total buckets, max
    bucket size, the candidate-pair count the band join would produce
    (sum of s*(s-1)/2 over buckets), how many buckets the stop-bucket
    cap would drop, and the capped candidate count. The companion to
    ``key_skew_report``: measure first, then pick (bands, rows) and the
    cap; the docstring math in ``srp.py`` chooses constants a priori —
    this report validates them against the corpus before a full run.

    Scale shape: ONE signature computation (the session-persisted
    ``minhash_sig_table`` substrate, shared with the pairs pipeline —
    the config variants re-slice the same 17-column frame), |configs| x
    bands short rows per doc into one hash agg on (config, band, key),
    then a second tiny agg to one row per config. Linear; no joins, no
    windows."""
    sig = minhash_sig_table(spark, sf_dir)
    frames = []
    for bands_n, r in LSH_TUNING_CONFIGS:
        frames.append(
            lsh_band_keys(sig, bands_n, r).select(
                F.lit(bands_n).alias("n_bands"),
                F.lit(r).alias("rows_per_band"),
                "band",
                "band_key",
            )
        )
    allb = frames[0]
    for f_ in frames[1:]:
        allb = allb.unionByName(f_)
    buckets = allb.groupBy("n_bands", "rows_per_band", "band", "band_key").agg(
        F.count(F.lit(1)).cast("long").alias("s")
    )
    prob = F.lit(None).cast("double")
    for bands_n, r in LSH_TUNING_CONFIGS:
        prob = F.when(
            F.col("n_bands") == bands_n, F.lit(_detect_prob(bands_n, r))
        ).otherwise(prob)
    pairs = F.expr("(s * (s - 1)) div 2")
    return (
        buckets.groupBy("n_bands", "rows_per_band")
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_buckets"),
            F.max("s").cast("long").alias("max_bucket"),
            F.sum(pairs).cast("long").alias("candidate_pairs"),
            F.sum((F.col("s") > MAX_BUCKET_SIZE).cast("int"))
            .cast("long")
            .alias("stop_buckets"),
            F.sum(F.when(F.col("s") <= MAX_BUCKET_SIZE, pairs).otherwise(0))
            .cast("long")
            .alias("capped_candidate_pairs"),
        )
        .withColumn("detect_prob_at_tau", prob)
        .orderBy(F.desc("n_bands"))
    )


def _lsh_tuning_sql() -> str:
    band_selects = []
    for bands_n, r in LSH_TUNING_CONFIGS:
        for b in range(bands_n):
            key = " || ',' || ".join(
                f"CAST(h{b * r + j} AS VARCHAR)" for j in range(r)
            )
            band_selects.append(
                f"SELECT doc_id, {bands_n} AS n_bands, {r} AS rows_per_band, "
                f"{b} AS band, {key} AS band_key FROM sig"
            )
    prob_case = " ".join(
        f"WHEN {bands_n} THEN {_detect_prob(bands_n, r)}"
        for bands_n, r in LSH_TUNING_CONFIGS
    )
    return f"""{_sig_cte_sql()}
, band AS (
  {"  UNION ALL ".join(band_selects)}
), buckets AS (
  SELECT n_bands, rows_per_band, band, band_key, CAST(COUNT(*) AS BIGINT) AS s
  FROM band GROUP BY 1, 2, 3, 4
)
SELECT n_bands, rows_per_band,
  CAST(COUNT(*) AS BIGINT) AS n_buckets,
  CAST(MAX(s) AS BIGINT) AS max_bucket,
  CAST(SUM((s * (s - 1)) // 2) AS BIGINT) AS candidate_pairs,
  CAST(SUM(CASE WHEN s > {MAX_BUCKET_SIZE} THEN 1 ELSE 0 END) AS BIGINT) AS stop_buckets,
  CAST(SUM(CASE WHEN s <= {MAX_BUCKET_SIZE} THEN (s * (s - 1)) // 2 ELSE 0 END) AS BIGINT)
    AS capped_candidate_pairs,
  CASE n_bands {prob_case} END AS detect_prob_at_tau
FROM buckets GROUP BY 1, 2 ORDER BY n_bands DESC
"""


LSH_BAND_TUNING_REPORT_SQL = _lsh_tuning_sql()


# --- cluster-size histogram -------------------------------------------------


def cluster_histogram_from(clusters: DataFrame) -> DataFrame:
    """Frame-level histogram over a (cluster_id, cluster_size) labeling —
    shared by the registered query and cli/run_dedup.py's report so the
    two cannot drift."""
    return (
        clusters.select("cluster_id", "cluster_size")
        .distinct()
        .groupBy("cluster_size")
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_clusters"),
            F.sum("cluster_size").cast("long").alias("n_docs"),
        )
        .select(F.col("cluster_size").cast("long").alias("cluster_size"),
                "n_clusters", "n_docs")
        .orderBy("cluster_size")
    )


def cluster_size_histogram(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Distribution of near-dup cluster sizes (size 1 = unique docs):
    clusters and docs per size — the shape report that tells an operator
    whether duplication is a long tail of pairs or a few megaclusters
    (which changes the retention strategy). Reads the session-persisted
    cluster substrate; the rollup is one tiny hash agg."""
    return cluster_histogram_from(dup_clusters(spark, sf_dir))


CLUSTER_SIZE_HISTOGRAM_SQL = f"""
SELECT CAST(cluster_size AS BIGINT) AS cluster_size,
  CAST(COUNT(*) AS BIGINT) AS n_clusters,
  CAST(SUM(cluster_size) AS BIGINT) AS n_docs
FROM (
  SELECT DISTINCT cluster_id, cluster_size FROM ({NEAR_DUP_CLUSTERS_SQL})
)
GROUP BY cluster_size
ORDER BY cluster_size
"""


def incremental_winnow_matches(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Incremental form of the winnowing detector (the fifth detector's
    batch-vs-index variant, completing the incremental family):
    per incoming-batch document, how many INDEXED documents share >=
    WINNOW_MIN_SHARED selected fingerprints, the best match (most shared
    fingerprints, ties to lowest id) with its winnowed-sketch
    containment, and the keep/drop flag.

    ASYMMETRIC join — batch postings ⋈ index postings on fp_hash — so
    candidate work scales with the batch, not the corpus; the
    stop-fingerprint df-cap is computed over the FULL posting list
    (corpus statistics, the maintained index state — same convention as
    incremental_near_dup's stop buckets, letting the DuckDB twin reuse
    the symmetric pair chain filtered to the cross-boundary
    orientation)."""
    fps = _winnow_fps_table(spark, sf_dir)
    from ..plans.text_analysis import WINNOW_MAX_DF

    kept = fps.join(
        fps.groupBy("fp_hash")
        .agg(F.count(F.lit(1)).alias("_df"))
        .filter(F.col("_df") <= WINNOW_MAX_DF)
        .select("fp_hash"),
        "fp_hash",
    )
    n_fp = fps.groupBy("doc_id").agg(
        F.count(F.lit(1)).cast("long").alias("n_fp")
    )
    batch = kept.filter(_is_batch(F.col("doc_id")))
    index = kept.filter(~_is_batch(F.col("doc_id")))
    matches = (
        batch.alias("x")
        .join(index.alias("y"), F.col("x.fp_hash") == F.col("y.fp_hash"))
        .groupBy(
            F.col("x.doc_id").alias("doc_id"),
            F.col("y.doc_id").alias("match_id"),
        )
        .agg(F.count(F.lit(1)).cast("long").alias("n_shared"))
        .filter(F.col("n_shared") >= _WINNOW_MIN_SHARED)
        .join(
            n_fp.select(
                F.col("doc_id"), F.col("n_fp").alias("_nfp_doc")
            ),
            "doc_id",
        )
        .join(
            n_fp.select(
                F.col("doc_id").alias("match_id"),
                F.col("n_fp").alias("_nfp_match"),
            ),
            "match_id",
        )
        .withColumn(
            "overlap",
            F.col("n_shared").cast("double")
            / F.least("_nfp_doc", "_nfp_match").cast("double"),
        )
    )
    # (n_shared DESC, match_id ASC) best-match via row_number + a
    # grouped rollup for the count — the min(struct) single-agg variant
    # planned as SortAggregate and measured slower (OPTIMIZATION_r12.md
    # "min(struct) postmortem").
    w = Window.partitionBy("doc_id").orderBy(
        F.desc("n_shared"), F.asc("match_id")
    )
    best = (
        matches.withColumn("_rn", F.row_number().over(w))
        .groupBy("doc_id")
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_matches"),
            F.max(F.when(F.col("_rn") == 1, F.col("match_id"))).alias(
                "best_match_id"
            ),
            F.max(F.when(F.col("_rn") == 1, F.col("n_shared"))).alias(
                "best_shared"
            ),
            F.max(F.when(F.col("_rn") == 1, F.col("overlap"))).alias(
                "best_overlap"
            ),
        )
    )
    incoming = (
        load_table(spark, sf_dir, "documents")
        .filter(_is_batch(F.col("doc_id")))
        .select("doc_id")
    )
    # best is the matched-dup subset of the batch — broadcast like
    # incremental_near_dup (drop the hint if a corpus ever outgrows it)
    return (
        incoming.join(F.broadcast(best), "doc_id", "left")
        .select(
            "doc_id",
            F.coalesce("n_matches", F.lit(0)).cast("long").alias("n_matches"),
            "best_match_id",
            "best_shared",
            "best_overlap",
            (F.coalesce("n_matches", F.lit(0)) > 0).alias("is_dup"),
        )
        .orderBy("doc_id")
    )


INCREMENTAL_WINNOW_SQL = f"""
WITH sym AS MATERIALIZED (SELECT * FROM ({_WINNOW_PAIRS_SQL})),
inc AS (
  -- cross-boundary pairs from the symmetric detector, re-oriented so
  -- doc_id is always the incoming-batch side
  SELECT
    CASE WHEN doc_a % {INCREMENTAL_BATCH_MOD} = {INCREMENTAL_BATCH_REM}
         THEN doc_a ELSE doc_b END AS doc_id,
    CASE WHEN doc_a % {INCREMENTAL_BATCH_MOD} = {INCREMENTAL_BATCH_REM}
         THEN doc_b ELSE doc_a END AS match_id,
    n_shared,
    CASE WHEN doc_a % {INCREMENTAL_BATCH_MOD} = {INCREMENTAL_BATCH_REM}
         THEN n_fp_a ELSE n_fp_b END AS nfp_doc,
    CASE WHEN doc_a % {INCREMENTAL_BATCH_MOD} = {INCREMENTAL_BATCH_REM}
         THEN n_fp_b ELSE n_fp_a END AS nfp_match
  FROM sym
  WHERE (doc_a % {INCREMENTAL_BATCH_MOD} = {INCREMENTAL_BATCH_REM})
     != (doc_b % {INCREMENTAL_BATCH_MOD} = {INCREMENTAL_BATCH_REM})
),
best AS (
  SELECT doc_id, match_id AS best_match_id,
    CAST(n_shared AS BIGINT) AS best_shared,
    CAST(n_shared AS DOUBLE) / CAST(LEAST(nfp_doc, nfp_match) AS DOUBLE)
      AS best_overlap,
    ROW_NUMBER() OVER (PARTITION BY doc_id
                       ORDER BY n_shared DESC, match_id ASC) AS rn,
    COUNT(*) OVER (PARTITION BY doc_id) AS n_matches
  FROM inc
)
SELECT d.doc_id,
  CAST(COALESCE(b.n_matches, 0) AS BIGINT) AS n_matches,
  b.best_match_id, b.best_shared, b.best_overlap,
  COALESCE(b.n_matches, 0) > 0 AS is_dup
FROM (SELECT doc_id FROM documents
      WHERE doc_id % {INCREMENTAL_BATCH_MOD} = {INCREMENTAL_BATCH_REM}) d
LEFT JOIN (SELECT * FROM best WHERE rn = 1) b USING (doc_id)
ORDER BY d.doc_id
"""
