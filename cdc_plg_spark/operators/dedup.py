"""Deduplication operators for training-data pipelines (north-star
mandate; SURVEY.md §2.11).

Five tiers, cheapest first — the standard corpus-dedup ladder:

1. `dedup_exact`        — content-hash groupBy (exact dups)
2. `dedup_fuzzy_minhash`— MinHash signatures + LSH band-bucket join
                          (near-dups, linear in corpus size)
3. `dedup_ngram_jaccard`— exact Jaccard on candidate pairs (verifier
                          for tier 2's candidates)
4. `dedup_simhash`      — 64-bit SimHash signatures (Arrow-vectorized)
5. `dedup_embedding_cosine` — semantic near-dups over embeddings

Scale design: nothing here is O(n²) over the corpus. Pairwise work
only ever happens inside LSH buckets / blocking keys; the 100 TB
path is: shingle → signature (linear scan) → band explode (×bands) →
bucket groupBy join (shuffle on band hash) → verify candidates.
"""

from __future__ import annotations

import atexit
import hashlib
import shutil

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from cdc_plg_spark.catalog import load_table
from cdc_plg_spark.registry import register

# LSH-index scratch dirs created by THIS process (dedup_index_maintain),
# removed at exit — see the hygiene note inside that operator.
_LSH_INDEX_RUN_DIRS: list[str] = []


def _purge_lsh_index_runs() -> None:
    for d in _LSH_INDEX_RUN_DIRS:
        shutil.rmtree(d, ignore_errors=True)


atexit.register(_purge_lsh_index_runs)

# MinHash parameters: k permutations in b bands of r rows (k = b*r).
_MINHASH_K = 32
_MINHASH_BANDS = 8
_MINHASH_ROWS = 4
# Knuth multiplicative constants; any odd 64-bit multipliers work.
_HASH_A = 0x9E3779B97F4A7C15
_HASH_B = 0xC2B2AE3D27D4EB4F


@register(
    "dedup_exact",
    oracle="""
    SELECT doc_id, md5(text) AS content_hash FROM (
        SELECT *, ROW_NUMBER() OVER (PARTITION BY md5(text)
                                     ORDER BY doc_id) AS rn
        FROM documents
    ) WHERE rn = 1
    """,
)
def dedup_exact(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact dedup by content hash, keeping the lowest doc_id per
    duplicate class. One shuffle on the hash; at 100 TB the hash is
    computed map-side and only (hash, doc_id) shuffles, never the text."""
    d = load_table(spark, "documents", sf_dir)
    w = Window.partitionBy("content_hash").orderBy("doc_id")
    return (d.withColumn("content_hash", F.md5("text"))
             .withColumn("rn", F.row_number().over(w))
             .filter(F.col("rn") == 1)
             .select("doc_id", "content_hash"))


_SHINGLE_W = 1  # tokens per shingle: 1 = token-set MinHash (matches the
#                 token-Jaccard verifier); ≥2 = order-sensitive shingles


def _shingle_hashes(width: int = _SHINGLE_W) -> F.Column:
    """xxhash64 of each distinct width-token shingle of `text`."""
    toks = F.split("text", " ")
    if width == 1:
        return F.transform(F.array_distinct(toks), lambda t: F.xxhash64(t))
    n = F.size(toks)
    return F.array_distinct(F.transform(
        F.sequence(F.lit(1), F.greatest(n - width + 1, F.lit(1))),
        lambda i: F.xxhash64(F.concat_ws(" ", F.slice(toks, i, width)))))


def _sig_sweep_udf(empty_sig):
    """pandas_udf computing the k-permutation min-sweep over a
    precomputed token-hash array column (values in [0, 2^31)) as ONE
    Arrow-batched numpy matrix op per document.  `empty_sig` is the
    value returned for a NULL/empty hash array: the production
    xxhash64 variant returns a NULL signature; the checked md5 variant
    returns an array of k NULLs, matching what its former
    32×`array_min(transform(...))` column stack produced for NULL
    text.  int64 arithmetic is identical to the JVM/DuckDB paths
    (h < 2^31, a,b < 2^31 ⇒ a*h+b < 2^62, no overflow), so signature
    values are bit-equal across all three."""
    from pyspark.sql.functions import pandas_udf

    a_np = np.array([(_HASH_A * (2 * j + 1)) % ((1 << 31) - 1) + 1
                     for j in range(_MINHASH_K)], dtype=np.int64)
    b_np = np.array([(_HASH_B * (j + 1)) % (1 << 31)
                     for j in range(_MINHASH_K)], dtype=np.int64)
    p = (1 << 31) - 1

    @pandas_udf("array<long>")
    def sig_np(sh: pd.Series) -> pd.Series:
        out = []
        for h in sh:
            if h is None or len(h) == 0:
                # NULL text → NULL shingle array (np.asarray(None)
                # would raise); empty array → no min to take
                out.append(empty_sig)
                continue
            hv = np.asarray(h, dtype=np.int64)
            # (|doc| × k) universal hashes in one broadcast, min per k
            out.append(((hv[:, None] * a_np + b_np) % p)
                       .min(axis=0).tolist())
        return pd.Series(out)

    return sig_np


def _minhash_signature() -> F.Column:
    """array<long> of length k: min over shingles of (a_j*h + b_j).

    The j-th 'permutation' is the universal hash (a_j*h + b_j) mod p,
    p = 2^31 - 1 (Mersenne prime) — the standard MinHash construction;
    no RNG, fully deterministic. The mod is essential: without it the
    map is monotonic in h and every 'permutation' would pick the same
    argmin shingle, collapsing the signature.

    Shingle hashing stays JVM-side (xxhash64 in codegen); the k×|doc|
    permutation/min sweep runs as ONE Arrow-batched numpy matrix op
    per document instead of k interpreted higher-order `transform`
    passes (HOF lambdas evaluate per element with no codegen — ~10×
    wall on the sf0.1 corpus).  int64 arithmetic is identical on both
    paths (h < 2^31, a,b < 2^31 ⇒ a*h+b < 2^62, no overflow), so the
    signature values — and dedup_fuzzy_minhash_checked's DuckDB
    oracle, which recomputes them in SQL — are bit-equal."""
    sh = F.transform(_shingle_hashes(),
                     lambda h: F.pmod(h, F.lit(1 << 31)))
    return _sig_sweep_udf(None)(sh)


_LSH_BUCKET_CAP = 1000   # docs per LSH bucket before the salted split


def _shuffle_partition_count(df: DataFrame) -> int:
    """``spark.sql.shuffle.partitions`` as an int, falling back to
    ``sparkContext.defaultParallelism`` when the conf is non-numeric
    (e.g. 'auto' on AQE-advisory deployments, where int() would raise)
    — shared by every explicit probe-side repartition (ADVICE r13)."""
    spark = df.sparkSession
    try:
        return int(spark.conf.get("spark.sql.shuffle.partitions"))
    except (TypeError, ValueError):
        return spark.sparkContext.defaultParallelism


def _first_shared_band(ha: str, hb: str):
    """Index of the FIRST band where two docs' band hashes agree, else
    -1 — the r14 exactly-once emission predicate shared by the batch
    pair self-join and the incremental screen: a pair whose hashes
    agree at band b meets in EVERY such band's bucket, so keeping only
    `band_idx == _first_shared_band(...)` emits it once and the
    trailing distinct() over the pair MULTISET goes away.  CASE
    short-circuits left-to-right: ~(first match + 1) scalar int64
    element_at compares per joined row, zero allocation, and at b=8 the
    expression stays comfortably inside whole-stage codegen (the
    32-term n_match unroll measured 8x AGAINST for falling out of it —
    OPTIMIZATION_r14.md §8; term count decides, measure each site).
    Joined rows always have fully non-NULL hash arrays (a NULL-
    signature doc has all-NULL band hashes and never equi-joins), so
    plain `==` is safe."""
    fsb = F.when(F.element_at(ha, 1) == F.element_at(hb, 1), 0)
    for b in range(1, _MINHASH_BANDS):
        fsb = fsb.when(F.element_at(ha, b + 1) == F.element_at(hb, b + 1), b)
    return fsb.otherwise(F.lit(-1))


def _lsh_pair_ids(bands: DataFrame, cap: int = _LSH_BUCKET_CAP) -> DataFrame:
    """Candidate (doc1, doc2) pairs from exploded band rows — with a
    heavy-hitter guard, because the plain bucket self-join is the
    dedup family's last scale-killer shape: a boilerplate-heavy corpus
    (licence headers, templated pages) can put tens of thousands of
    docs into ONE (band_idx, band_hash) bucket, and a hash join then
    computes that whole |bucket|² compare in a single task.

    Guard (exact, not lossy): bucket sizes come from a count window
    over the band rows themselves (r13 — previously an aggregate
    joined back, which forced the band/signature pipeline to execute
    once per plan branch; see the inline note).  Rows of an oversized
    bucket get a deterministic salt
    g ∈ [0, G), G = ceil(size/cap), and the self-join becomes the
    triangle of (i, j) salt-pair tasks: a row salted g joins as left
    in tasks (g, j≥g) and as right in tasks (i≤g, g), so every
    unordered pair still meets (cross-salt pairs exactly once in the
    (min,max)-salt task, same-salt pairs twice in the (g,g) task)
    while per-task input drops to ~2·cap rows and per-task compare
    work to ~cap².  Normal buckets take the same code path with G = 1
    — one task, zero replication.

    EXACTLY-ONCE emission (r14, guide §2.3/§2.4): each unordered pair
    is emitted only from its FIRST shared band — `bands` carries every
    doc's full band-hash array (`bhs`), and a joined row survives only
    when no earlier band's hashes match — plus only one of the two
    same-salt meetings (`_i < _j OR da < db`).  That makes the join
    output exactly the candidate SET, so the trailing `distinct()` — a
    full Exchange + two HashAggregates over the pair MULTISET (~8
    meetings per near-dup pair at b=8: the multiset was ~6x the set at
    sf1) — is gone.  The first-shared-band test is a short-circuit
    CASE of scalar int64 element_at compares, i.e. ~(first match + 1)
    comparisons and ZERO per-row allocation — the r13 zip_with/slice
    form of this same idea allocated two arrays per joined row and
    measured AGAINST (OPTIMIZATION_r13.md "Measured and rejected");
    set-equality with the old distinct form is pinned by
    tests/test_skew.py and the unchanged DuckDB oracle (a plain SQL
    DISTINCT self-join) of dedup_fuzzy_minhash_checked.

    The candidate SET is identical to the unsalted join; output volume
    is inherently quadratic in bucket size (those pairs really are
    near-dups) — what the guard bounds is task time and memory, the
    thing that kills a 1000-executor job."""
    # Bucket sizes via a WINDOW over bands rather than the r11
    # aggregate+join-back: the agg/join form referenced the `bands`
    # subtree from FOUR plan branches (left, right, and one bucket-size
    # aggregate under each) with zero ReusedExchange, so the whole
    # signature pipeline upstream executed four times per run (r13
    # plan audit, guide §2.4).  The window form computes sizes in the
    # same pass that reads bands, and its Exchange on
    # (band_idx, band_hash) is an identical subtree under both join
    # branches, so ReuseExchange executes the signature pipeline ONCE
    # and both explodes read the shuffled output.
    wb = Window.partitionBy("band_idx", "band_hash")
    b2 = (bands.withColumn("_bsize", F.count(F.lit(1)).over(wb))
          .withColumn("_G", F.ceil(F.col("_bsize") / F.lit(cap)).cast("int"))
          .withColumn("_s", F.pmod(F.xxhash64("doc_id"),
                                   F.col("_G")).cast("int")))
    left = b2.select(F.col("doc_id").alias("da"),
                     F.col("bhs").alias("_ha"),
                     "band_idx", "band_hash",
                     F.col("_s").alias("_i"),
                     F.explode(F.sequence("_s", F.col("_G") - 1))
                      .alias("_j"))
    right = b2.select(F.col("doc_id").alias("db"),
                      F.col("bhs").alias("_hb"),
                      "band_idx", "band_hash",
                      F.explode(F.sequence(F.lit(0), "_s")).alias("_i"),
                      F.col("_s").alias("_j"))
    # Repartition the PROBE side by the full salted key before the
    # (usually broadcast) self-join: without it the join inherits the
    # scan's partitioning — a single-row-group parquet fixture means
    # ONE task computes the entire |bucket|²-row join output and its
    # partial distinct (measured 45 s of the 48 s sf0.1 wall, r13).
    # The salt exists precisely to spread this work (guide §2.5); the
    # (band_idx, band_hash, _i, _j) key has thousands of distinct
    # values (48+ on the heavy bucket alone), so hashing spreads the
    # triangle tasks across the cluster while shuffling only the
    # narrow (id, band, salt) rows — never signatures or text.
    # The partition count is EXPLICIT (session shuffle.partitions, so
    # it scales with the deployment conf): the band rows are a few MB
    # and AQE's coalescing — which only sees shuffle-write bytes, not
    # the |bucket|²-fold join fan-out above them — otherwise folds
    # this exchange back to one partition and re-serializes the join
    # (measured: 33.5 s single-task stage at sf0.1).
    n_part = _shuffle_partition_count(bands)
    left = left.repartition(n_part, "band_idx", "band_hash", "_i", "_j")
    # first shared band of the pair: a pair whose hashes agree at band
    # b meets in EVERY such band's bucket; keeping only band_idx ==
    # min{b : ha[b] = hb[b]} (plus one of the two same-salt meetings)
    # emits it exactly once.  CASE short-circuits left-to-right, so
    # this is ~(first match + 1) scalar compares per joined row — no
    # arrays built, no hash aggregate downstream.  Joined rows always
    # have fully non-NULL hash arrays (a NULL-signature doc has all-
    # NULL band hashes and never equi-joins), so plain `==` is safe.
    return (left.join(right, ["band_idx", "band_hash", "_i", "_j"])
            .filter(F.col("da") != F.col("db"))
            .filter(((F.col("_i") < F.col("_j")) | (F.col("da") < F.col("db")))
                    & (F.col("band_idx") == _first_shared_band("_ha", "_hb")))
            .select(F.least("da", "db").alias("doc1"),
                    F.greatest("da", "db").alias("doc2")))


@register("dedup_fuzzy_minhash", tags=("lsh",))
def dedup_fuzzy_minhash(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Near-duplicate pairs via MinHash + LSH banding.

    Pipeline: token-shingle→hash (map-side) → k=32 minhash signature →
    8 bands of 4 rows → explode bands → shuffle on (band, band_hash) →
    pairs within bucket → dedupe pairs → estimate Jaccard as the
    fraction of matching signature positions, keep ≥ 0.7.

    Token-level shingles (width=1) estimate token-set Jaccard — the
    right granularity for vocabulary-overlap near-dups (and the twin of
    `dedup_ngram_jaccard`); raise _SHINGLE_W for order-sensitive dedup.

    rows-only oracle: the LSH candidate set isn't SQL-expressible
    economically; `dedup_ngram_jaccard` is the exact-verifier twin.
    """
    d = load_table(spark, "documents", sf_dir)
    sig = (d.select("doc_id", _minhash_signature().alias("sig")))

    # candidate generation stays NARROW: only (doc_id, band hashes)
    # ride the 8x band explode and the bucket self-join shuffle; the
    # k-long signatures are attached AFTER pair dedup, so signature
    # bytes are shuffled once per surviving pair, not once per band
    # per bucket row — at corpus scale the band shuffle is the
    # dominant volume and this cuts it ~(1 + k/2)x.  `bhs` (the doc's
    # full b-long band-hash array) rides along for _lsh_pair_ids'
    # first-shared-band exactly-once emission (r14).
    bands = (sig.select(
        "doc_id",
        F.transform(
            F.sequence(F.lit(0), F.lit(_MINHASH_BANDS - 1)),
            lambda b: F.hash(F.slice("sig", b * _MINHASH_ROWS + 1,
                                     _MINHASH_ROWS), b)).alias("bhs"))
        .select("doc_id", "bhs",
                F.posexplode("bhs").alias("band_idx", "band_hash")))

    pair_ids = _lsh_pair_ids(bands)
    pairs = (pair_ids
             .join(sig.select(F.col("doc_id").alias("doc1"),
                              F.col("sig").alias("sig1")), "doc1")
             .join(sig.select(F.col("doc_id").alias("doc2"),
                              F.col("sig").alias("sig2")), "doc2"))

    est = (F.size(F.filter(F.zip_with("sig1", "sig2", lambda a, b: a == b),
                           lambda x: x))
           / F.lit(float(_MINHASH_K)))
    return (pairs.withColumn("est_jaccard", F.round(est, 4))
                 .filter(F.col("est_jaccard") >= 0.7)
                 .select("doc1", "doc2", "est_jaccard"))


@register(
    "dedup_ngram_jaccard",
    oracle="""
    SELECT a.doc_id AS doc1, b.doc_id AS doc2,
           ROUND(CAST(len(list_intersect(list_distinct(string_split(a.text,' ')),
                                         list_distinct(string_split(b.text,' ')))) AS DOUBLE)
                 / len(list_distinct(list_concat(list_distinct(string_split(a.text,' ')),
                                                 list_distinct(string_split(b.text,' '))))), 6)
               AS jaccard
    FROM documents a JOIN documents b
      ON a.source = b.source AND a.lang = b.lang AND a.doc_id < b.doc_id
    WHERE len(list_intersect(list_distinct(string_split(a.text,' ')),
              list_distinct(string_split(b.text,' ')))) * 1.0
          / len(list_distinct(list_concat(list_distinct(string_split(a.text,' ')),
                list_distinct(string_split(b.text,' '))))) >= 0.6
    """,
)
def dedup_ngram_jaccard(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact token-set Jaccard over blocked candidate pairs
    (blocking key = (source, lang) — the verifier stage that LSH
    candidates feed at scale; the block join keeps it off O(n²))."""
    d = load_table(spark, "documents", sf_dir)
    a = d.select(F.col("doc_id").alias("doc1"), F.col("source").alias("src"),
                 F.col("lang").alias("lng"),
                 F.array_distinct(F.split("text", " ")).alias("t1"))
    b = d.select(F.col("doc_id").alias("doc2"), F.col("source").alias("src"),
                 F.col("lang").alias("lng"),
                 F.array_distinct(F.split("text", " ")).alias("t2"))
    inter = F.size(F.array_intersect("t1", "t2"))
    union = F.size(F.array_distinct(F.concat("t1", "t2")))
    jac = inter.cast("double") / union
    return (a.join(b, ["src", "lng"])
             .filter(F.col("doc1") < F.col("doc2"))
             .filter(jac >= 0.6)
             .select("doc1", "doc2", F.round(jac, 6).alias("jaccard")))


@register(
    "dedup_simhash",
    oracle="""
    WITH tok AS (
      SELECT doc_id, t, COUNT(*) AS cnt
      FROM (SELECT doc_id, unnest(string_split(text, ' ')) AS t
            FROM documents)
      GROUP BY 1, 2),
    h AS (
      SELECT doc_id, cnt,
             CAST(concat('0x', substring(md5(t), 1, 16)) AS UBIGINT) AS hv
      FROM tok),
    bits AS (
      SELECT doc_id, i,
             SUM(CASE WHEN (hv >> i) & 1 = 1 THEN cnt ELSE -cnt END) AS score
      FROM h, UNNEST(range(0, 64)) AS u(i)
      GROUP BY 1, 2),
    sig AS (
      SELECT doc_id,
             SUM(CASE WHEN score > 0
                      THEN CAST(1 AS HUGEINT) << i ELSE 0 END) AS s
      FROM bits GROUP BY 1)
    SELECT doc_id,
           CAST(CASE WHEN s >= CAST(1 AS HUGEINT) << 63
                     THEN s - (CAST(1 AS HUGEINT) << 64) ELSE s END AS BIGINT)
               AS simhash
    FROM sig
    """,
    tags=("vectorized-udf",),
)
def dedup_simhash(spark: SparkSession, sf_dir: str) -> DataFrame:
    """64-bit SimHash signature per document (Arrow-vectorized pandas
    UDF over mapInPandas batches; md5-derived per-token hashes keep it
    deterministic across workers). Near-dup = small Hamming distance;
    downstream banding on 16-bit chunks finds pairs without O(n²).
    The oracle replays the bit-majority vote in pure SQL — md5 hex
    prefix as UBIGINT (== the UDF's first-8-bytes big-endian), per-bit
    weighted vote, HUGEINT bit-assembly, two's-complement fold back to
    BIGINT — so the signature is value-verified, not rows-only."""

    def simhash_batches(batches):
        for pdf in batches:
            out = []
            for text in pdf["text"]:
                counts: dict[str, int] = {}
                for t in text.split(" "):
                    counts[t] = counts.get(t, 0) + 1
                acc = np.zeros(64, dtype=np.int64)
                shifts = np.arange(64, dtype=np.uint64)
                for tok, cnt in counts.items():
                    h = np.uint64(int.from_bytes(
                        hashlib.md5(tok.encode()).digest()[:8], "big"))
                    bits = (h >> shifts) & np.uint64(1)
                    acc += np.where(bits == 1, cnt, -cnt)
                sh = int(((acc > 0).astype(np.uint64) << shifts)
                         .sum(dtype=np.uint64))
                out.append(sh - (1 << 64) if sh >= (1 << 63) else sh)
            yield pd.DataFrame({"doc_id": pdf["doc_id"], "simhash": out})

    d = load_table(spark, "documents", sf_dir).select("doc_id", "text")
    return d.mapInPandas(simhash_batches, "doc_id bigint, simhash bigint")


_DOT_SQL = ("list_reduce(list_transform(generate_series(1, len({a})), "
            "i -> CAST({a}[i] AS DOUBLE) * CAST({b}[i] AS DOUBLE)), (s, v) -> s + v)")


def _cos_sql(a: str, b: str) -> str:
    """Manual cosine in DuckDB with the same left-fold summation order
    as Spark's `aggregate`, so both engines produce identical doubles
    (list_cosine_similarity would sum in a different order)."""
    return (f"({_DOT_SQL.format(a=a, b=b)} / "
            f"(sqrt({_DOT_SQL.format(a=a, b=a)}) * sqrt({_DOT_SQL.format(a=b, b=b)})))")


def cosine_col(a: str | F.Column, b: str | F.Column) -> F.Column:
    """Cosine similarity of two array<float/double> columns, computed
    JVM-side with higher-order functions (zip_with + left-fold
    aggregate) — no UDF, no Python crossing."""
    a, b = F.col(a) if isinstance(a, str) else a, F.col(b) if isinstance(b, str) else b
    def dot(x, y):
        return F.aggregate(
            F.zip_with(x, y, lambda p, q: p.cast("double") * q.cast("double")),
            F.lit(0.0), lambda s, v: s + v)
    return dot(a, b) / (F.sqrt(dot(a, a)) * F.sqrt(dot(b, b)))


@register(
    "dedup_embedding_cosine",
    oracle=f"""
    SELECT a.vec_id AS vec1, b.vec_id AS vec2,
           ROUND({_cos_sql('a.embedding', 'b.embedding')}, 6) AS cos
    FROM embeddings a JOIN embeddings b
      ON a.label = b.label AND a.vec_id < b.vec_id
    WHERE {_cos_sql('a.embedding', 'b.embedding')} >= 0.3
    """,
)
def dedup_embedding_cosine(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Semantic near-dup pairs: cosine ≥ threshold (0.3 for the synthetic fixtures; 0.95 for real embeddings) within a blocking key
    (label here; an LSH bucket or coarse quantizer cell at scale)."""
    e = load_table(spark, "embeddings", sf_dir)
    a = e.select(F.col("vec_id").alias("vec1"), F.col("label").alias("lbl"),
                 F.col("embedding").alias("e1"))
    b = e.select(F.col("vec_id").alias("vec2"), F.col("label").alias("lbl"),
                 F.col("embedding").alias("e2"))
    cos = cosine_col("e1", "e2")
    return (a.join(b, "lbl")
             .filter(F.col("vec1") < F.col("vec2"))
             .filter(cos >= 0.3)
             .select("vec1", "vec2", F.round(cos, 6).alias("cos")))


@register(
    "dedup_cluster_cc",
    oracle="""
    WITH RECURSIVE
    tok AS (
        SELECT doc_id, source, lang,
               list_distinct(string_split(text, ' ')) AS t
        FROM documents
    ),
    pairs AS (
        SELECT a.doc_id AS doc1, b.doc_id AS doc2
        FROM tok a JOIN tok b
          ON a.source = b.source AND a.lang = b.lang AND a.doc_id < b.doc_id
        WHERE len(list_intersect(a.t, b.t)) * 1.0
              / len(list_distinct(list_concat(a.t, b.t))) >= 0.6
    ),
    edges AS (
        SELECT doc1 AS src, doc2 AS dst FROM pairs
        UNION SELECT doc2, doc1 FROM pairs
    ),
    reach(node, lab) AS (
        SELECT doc_id, doc_id FROM documents
        UNION
        SELECT e.dst, r.lab FROM reach r JOIN edges e ON e.src = r.node
    )
    SELECT node AS doc_id, MIN(lab) AS cluster_id,
           (MIN(lab) = node) AS is_canonical
    FROM reach GROUP BY node
    """,
    tags=("iterative",),
)
def dedup_cluster_cc(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Duplicate-cluster assembly: connected components over the
    near-dup pair graph (the stage after candidate scoring — pairs say
    "A~B, B~C"; training-data dedup needs the transitive cluster
    {A,B,C} with ONE canonical doc). Min-label propagation to fixpoint:
    each iteration is one join + one keyed min-agg, a driver loop with
    a convergence check — the same shape GraphX/Pregel run at cluster
    scale; lineage is cut per iteration with an eager localCheckpoint.
    Near-dup clusters have tiny diameters, so iterations stay single
    digits regardless of corpus size. Oracle: DuckDB recursive-CTE
    reachability with the identical edge set."""
    d = load_table(spark, "documents", sf_dir)
    a = d.select(F.col("doc_id").alias("doc1"), F.col("source").alias("src"),
                 F.col("lang").alias("lng"),
                 F.array_distinct(F.split("text", " ")).alias("t1"))
    b = d.select(F.col("doc_id").alias("doc2"), F.col("source").alias("src"),
                 F.col("lang").alias("lng"),
                 F.array_distinct(F.split("text", " ")).alias("t2"))
    jac = (F.size(F.array_intersect("t1", "t2")).cast("double")
           / F.size(F.array_distinct(F.concat("t1", "t2"))))
    pairs = (a.join(b, ["src", "lng"])
              .filter(F.col("doc1") < F.col("doc2"))
              .filter(jac >= 0.6)
              .select("doc1", "doc2"))
    # symmetrize with explode, not a self-union: the kernel's edge
    # contraction consumes this plan exactly once, so one lazy pass
    # replaces the eager 2|E|-row checkpoint (r13)
    edges = _symmetrize_pairs(pairs)

    labels = _min_label_cc(
        d.select(F.col("doc_id").alias("node"),
                 F.col("doc_id").alias("lab")).localCheckpoint(eager=True),
        edges)
    return labels.select(F.col("node").alias("doc_id"),
                         F.col("lab").alias("cluster_id"),
                         (F.col("lab") == F.col("node")).alias("is_canonical"))


def _symmetrize_pairs(pairs: DataFrame) -> DataFrame:
    """(doc1, doc2) pairs → both directed (src, dst) rows, emitted by
    explode in ONE pass.  A self-union of two projections would
    re-execute the upstream pair pipeline per branch (no exchange
    reuse across differing projections); explode keeps the pipeline
    single-execution, which is what lets the CC callers feed their
    edge plans to the kernel lazily instead of checkpointing the
    2|E|-row multiset (r13)."""
    return pairs.select(F.explode(F.array(
        F.struct(F.col("doc1").alias("src"), F.col("doc2").alias("dst")),
        F.struct(F.col("doc2").alias("src"), F.col("doc1").alias("dst")))
    ).alias("_e")).select("_e.src", "_e.dst")


def _min_label_cc(labels: DataFrame, edges: DataFrame,
                  max_iters: int = 20) -> DataFrame:
    """Min-label propagation to fixpoint — the shared CC kernel under
    both cluster exhibits (one join + one keyed min-agg per iteration,
    lineage cut with an eager localCheckpoint; the GraphX/Pregel shape,
    iterations bounded by component diameter).  `max_iters` is a
    runaway backstop, NOT a truncation point: if the fixpoint is not
    reached the labels are WRONG (a component's far side still carries
    a stale label), so this raises instead of returning them (ADVICE
    r11 — silent unconverged output is a correctness hazard on
    high-diameter graphs; near-dup clusters converge in single digits,
    so hitting the backstop means the edge graph is not the shape the
    caller built this for)."""
    # One hash-to-min star contraction before iterating (r13, guide
    # §2.3 — shuffle fewer bytes): replace the edge set with
    # {(m(u), w) : w ∈ N(u) ∪ {u}} where m(u) = min({u} ∪ N(u)),
    # deduplicated as undirected pairs.  Component-preserving both
    # ways — every emitted edge joins two members of u's component
    # (m(u) is u or a neighbor), and every original edge (u,v) stays
    # connected through m(u) via the emitted (m(u),u) and (m(u),v) —
    # so MIN labels (and therefore the output) are unchanged.  On
    # near-dup graphs, whose clusters are near-cliques, this collapses
    # each k-clique's k²/2 pair edges into one k-edge star: the LSH
    # cluster exhibit's 9.9M directed edges become ~1 edge per node,
    # so the propagation loop's per-iteration join+agg shuffles
    # node-count rows instead of re-shuffling the full pair multiset
    # every round.  Cost: two passes over the raw edges (min-per-src
    # agg + join back) and one distinct — paid once, not per round.
    # Diameter at most roughly halves per application, so the
    # unconverged-RAISE backstop semantics survive (a path needing
    # ~d rounds still needs ~d/2; pinned by the max_iters=3 test).
    #
    # The contraction is also the only consumer of the raw `edges`
    # plan, and it reads it exactly ONCE: m(u) comes from a window
    # min over the same src-partitioned shuffle (no separate
    # aggregate joined back), and the star rows are emitted with
    # explode instead of a self-union (a union's two projection
    # branches re-execute the upstream pipeline; explode emits both
    # rows in one pass).  Callers therefore pass their edge plan
    # lazily — no 2|E|-row localCheckpoint of the pair multiset.
    base = edges.withColumn(
        "_m", F.least(F.min("dst").over(Window.partitionBy("src")),
                      F.col("src")))
    star = base.select(F.explode(F.array(
        F.struct(F.col("_m").alias("_a"), F.col("dst").alias("_b")),
        F.struct(F.col("_m").alias("_a"), F.col("src").alias("_b")))
    ).alias("_e")).select("_e._a", "_e._b")
    und = (star.filter(F.col("_a") != F.col("_b"))
           .select(F.least("_a", "_b").alias("_x"),
                   F.greatest("_a", "_b").alias("_y"))
           .distinct())
    edges = (und.select(F.explode(F.array(
        F.struct(F.col("_x").alias("src"), F.col("_y").alias("dst")),
        F.struct(F.col("_y").alias("src"), F.col("_x").alias("dst")))
    ).alias("_e")).select("_e.src", "_e.dst")
        .localCheckpoint(eager=True))
    # Convergence via the label-sum invariant (r13): each step takes
    # node.lab = min(old lab, incoming labs), so labels are monotone
    # non-increasing per node and SUM(lab) is strictly decreasing
    # until the fixpoint — sum unchanged ⟺ no label changed.  One
    # scalar aggregate over the (model-sized, just-checkpointed)
    # label frame per iteration replaces the exceptAll anti-join,
    # which shuffled both label frames every round.  The sum is taken
    # in decimal(38,0): a raw int64 SUM over large labels can raise
    # under an ANSI-mode caller session or wrap under non-ANSI
    # (ADVICE r13 — same hazard _content_fingerprint documents).
    _lab_sum = F.sum(F.col("lab").cast("decimal(38,0)"))
    prev_sum = labels.agg(_lab_sum).collect()[0][0]
    for _ in range(max_iters):
        msgs = (edges.join(labels, edges.src == labels.node)
                     .select(F.col("dst").alias("node"), "lab"))
        new_labels = (labels.unionByName(msgs)
                      .groupBy("node").agg(F.min("lab").alias("lab"))
                      .localCheckpoint(eager=True))
        new_sum = new_labels.agg(_lab_sum).collect()[0][0]
        converged = new_sum == prev_sum
        labels, prev_sum = new_labels, new_sum
        if converged:
            return labels
    raise RuntimeError(
        f"connected-components did not converge within {max_iters} "
        f"iterations — a component's diameter exceeds the backstop; "
        f"returning the current labels would silently mis-cluster, so "
        f"raise instead (raise max_iters if the graph is legitimately "
        f"deep)")


@register(
    "dedup_sorted_neighborhood",
    oracle="""
    WITH toks AS (
        SELECT doc_id,
               list_distinct(string_split(text, ' ')) AS tok,
               array_to_string(list_sort(list_distinct(
                   string_split(text, ' ')))[1:3], ' ') AS blk
        FROM documents),
    ordered AS (
        SELECT doc_id, tok, blk,
               LEAD(doc_id, 1) OVER w AS nb1_id,
               LEAD(tok, 1) OVER w AS nb1_tok,
               LEAD(doc_id, 2) OVER w AS nb2_id,
               LEAD(tok, 2) OVER w AS nb2_tok
        FROM toks
        WINDOW w AS (ORDER BY blk, doc_id)),
    pairs AS (
        SELECT doc_id AS doc_a, nb1_id AS doc_b,
               ROUND(CAST(len(list_intersect(tok, nb1_tok)) AS DOUBLE)
                     / len(list_distinct(list_concat(tok, nb1_tok))), 6)
                   AS jac
        FROM ordered WHERE nb1_id IS NOT NULL
        UNION ALL
        SELECT doc_id, nb2_id,
               ROUND(CAST(len(list_intersect(tok, nb2_tok)) AS DOUBLE)
                     / len(list_distinct(list_concat(tok, nb2_tok))), 6)
        FROM ordered WHERE nb2_id IS NOT NULL)
    SELECT doc_a, doc_b, jac FROM pairs WHERE jac >= 0.5
    """,
)
def dedup_sorted_neighborhood(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Sorted-neighborhood near-dup detection — the third blocking
    strategy in the dedup family (exact hash; LSH buckets; here: sort
    by a canonical key, compare each record only to its W=2 sorted
    neighbors). O(n·W) comparisons instead of O(n²), no hash-collision
    tuning; the trade is that near-dups must agree on the block key
    (first 3 sorted distinct tokens — canonicalized, so token order in
    the document doesn't matter).

    Scale design (no single-partition stage): the sorted sequence is
    SPLIT BY A FIXED-LENGTH PREFIX of the block key — truncation is
    monotone, so ordering groups by prefix and rows by (blk, doc_id)
    inside each group reproduces the global sort order exactly. The
    W=2 neighbor comparison then runs under a window PARTITIONED by
    that prefix (parallel, no global sort), and the only pairs it
    misses — the ≤2 rows on either side of each group boundary — are
    stitched back exactly: per-group counts (one row per prefix,
    model-sized) get cumulative global offsets via a broadcast
    theta-join prefix-sum (computed on executors, never collected to
    the driver) and are
    broadcast back so the boundary rows' true global positions
    identify cross-group neighbors with a small×small join. At 100 TB,
    widen the prefix to keep per-group row counts bounded; W widens
    recall linearly in cost, vs LSH's exponential bucket trade."""
    d = load_table(spark, "documents", sf_dir)
    tok = F.array_distinct(F.split("text", " "))
    toks = d.select(
        "doc_id", tok.alias("tok"),
        F.array_join(F.slice(F.sort_array(tok), 1, 3), " ").alias("blk"))
    toks = toks.withColumn("pfx", F.substring("blk", 1, 4))

    # Per-prefix window: reproduces the global (blk, doc_id) order inside
    # each prefix group, in parallel.
    w = Window.partitionBy("pfx").orderBy("blk", "doc_id")
    ordered = toks.select(
        "doc_id", "tok", "pfx",
        F.row_number().over(w).alias("rn"),
        F.lead("doc_id", 1).over(w).alias("nb1_id"),
        F.lead("tok", 1).over(w).alias("nb1_tok"),
        F.lead("doc_id", 2).over(w).alias("nb2_id"),
        F.lead("tok", 2).over(w).alias("nb2_tok"))

    def jac(a, b):
        return F.round(
            F.size(F.array_intersect(a, b)).cast("double")
            / F.size(F.array_distinct(F.concat(a, b))), 6)

    p1 = (ordered.filter(F.col("nb1_id").isNotNull())
          .select(F.col("doc_id").alias("doc_a"),
                  F.col("nb1_id").alias("doc_b"),
                  jac(F.col("tok"), F.col("nb1_tok")).alias("jac")))
    p2 = (ordered.filter(F.col("nb2_id").isNotNull())
          .select(F.col("doc_id").alias("doc_a"),
                  F.col("nb2_id").alias("doc_b"),
                  jac(F.col("tok"), F.col("nb2_tok")).alias("jac")))
    within = p1.unionByName(p2)

    # Cross-boundary stitching: global position = group offset + rn.
    # Cumulative offsets are computed DISTRIBUTIVELY — a broadcast
    # theta-join prefix-sum over the per-prefix counts DF (model-sized:
    # one row per 4-char prefix; B² pairs of a tiny table beats a
    # single-partition window exchange, which the plan advisor bans
    # fleet-wide). Nothing is collected to the driver, so adversarial
    # prefix cardinality can't blow driver memory.
    counts = toks.groupBy("pfx").agg(F.count(F.lit(1)).alias("cnt"))
    prior = counts.select(F.col("pfx").alias("p2"), F.col("cnt").alias("c2"))
    offs = (counts.join(F.broadcast(prior), F.col("p2") < F.col("pfx"),
                        "left")
            .groupBy("pfx", "cnt")
            .agg(F.coalesce(F.sum("c2"), F.lit(0)).alias("off"))
            .select("pfx", "off", "cnt"))
    edges = (ordered.join(F.broadcast(offs), "pfx")
             .withColumn("gpos", F.col("off") + F.col("rn")))
    last2 = edges.filter(F.col("rn") >= F.col("cnt") - 1)   # group tail
    first2 = edges.filter(F.col("rn") <= 2)                 # group head
    # Each tail row targets global positions gpos+1 / gpos+2; exploding
    # those targets turns the neighbor match into an EQUI join on the
    # position (hash join), not a cartesian over all boundary rows.
    targets = last2.select(
        F.col("doc_id"), F.col("tok"), F.col("pfx"),
        F.explode(F.array(F.col("gpos") + 1, F.col("gpos") + 2))
         .alias("gpos"))
    cross = (targets.alias("a").join(
                 first2.alias("b"),
                 (F.col("a.gpos") == F.col("b.gpos"))
                 & (F.col("a.pfx") != F.col("b.pfx")))
             .select(F.col("a.doc_id").alias("doc_a"),
                     F.col("b.doc_id").alias("doc_b"),
                     jac(F.col("a.tok"), F.col("b.tok")).alias("jac")))
    return within.unionByName(cross).filter(F.col("jac") >= 0.5)


def _minhash_cte_block() -> str:
    """The ENTIRE MinHash+LSH pipeline as a DuckDB CTE block ending in
    `match_pairs(doc1, doc2, n_match)` (same k/b/r and permutation
    constants as the Spark side, token hash = md5-prefix int so both
    engines can compute it) — shared by the pair exhibit's oracle and
    the LSH-edged connected-components oracle."""
    k, rows, bands, p = _MINHASH_K, _MINHASH_ROWS, _MINHASH_BANDS, (1 << 31) - 1
    aj = [(_HASH_A * (2 * j + 1)) % p + 1 for j in range(k)]
    bj = [(_HASH_B * (j + 1)) % (1 << 31) for j in range(k)]
    return f"""
    consts AS (SELECT {aj}::BIGINT[] AS aj, {bj}::BIGINT[] AS bj),
    tok AS (
      SELECT doc_id,
             list_transform(list_distinct(string_split(text, ' ')),
                 t -> CAST(concat('0x', substring(md5(t), 1, 15)) AS BIGINT)
                      % 2147483648) AS hs
      FROM documents),
    sig AS (
      SELECT doc_id,
             list_transform(range(1, {k}+1), j ->
                 list_min(list_transform(hs, h -> (aj[j]*h + bj[j]) % {p})))
                 AS sig
      FROM tok, consts),
    bands AS (
      SELECT doc_id, sig, b AS band_idx,
             list_reduce(sig[(b*{rows}+1):(b*{rows}+{rows})],
                         (acc, v) -> (acc*31 + v) % {p}) AS band_hash
      FROM sig, UNNEST(range(0, {bands})) AS t(b)),
    pairs AS (
      SELECT DISTINCT l.doc_id AS doc1, r.doc_id AS doc2,
                      l.sig AS sig1, r.sig AS sig2
      FROM bands l JOIN bands r
        ON l.band_idx = r.band_idx AND l.band_hash = r.band_hash
      WHERE l.doc_id < r.doc_id),
    match_pairs AS (
      SELECT doc1, doc2,
             CAST(len(list_filter(range(1, {k}+1), i -> sig1[i] = sig2[i]))
                  AS BIGINT) AS n_match
      FROM pairs
      WHERE len(list_filter(range(1, {k}+1), i -> sig1[i] = sig2[i])) >= 23)
    """


def _minhash_oracle_sql() -> str:
    return (f"WITH {_minhash_cte_block()} "
            f"SELECT doc1, doc2, n_match FROM match_pairs")


def _checked_sig_bands(d: DataFrame) -> tuple[DataFrame, DataFrame]:
    """(signatures, exploded band hashes) of the cross-engine-
    reproducible MinHash pipeline for ANY (doc_id, text) DataFrame —
    the Spark twin of `_minhash_cte_block()`'s sig/bands CTEs.
    Factored out (r12) so the batch pair exhibits and the incremental
    index exhibit compute signatures through ONE code path and cannot
    drift.

    r13: the k-permutation sweep runs through the same Arrow/numpy
    kernel as the production variant (`_sig_sweep_udf`) instead of a
    stack of 32 `array_min(transform(hs, ...))` columns.  The HOF
    stack was quadratic in disguise: catalyst inlines the shared `hs`
    token-hash subexpression into every one of the 32 columns and HOF
    lambdas get no common-subexpression elimination, so the
    md5→conv→pmod chain ran 32× per document (visible verbatim in the
    r13 before-plan).  Token hashing (md5-prefix, the cross-engine-
    reproducible part) stays in JVM codegen and now runs once; the
    sweep arithmetic is identical int64 (guide §4.2), so signatures
    stay bit-equal to the DuckDB oracle — pinned by the unchanged
    hash-checked driver rows."""
    p = F.lit((1 << 31) - 1)
    toks = F.array_distinct(F.split("text", " "))
    hs = F.transform(
        toks,
        lambda t: F.pmod(
            F.conv(F.substring(F.md5(t), 1, 15), 16, 10).cast("long"),
            F.lit(1 << 31)))
    sig = d.select(
        "doc_id",
        _sig_sweep_udf([None] * _MINHASH_K)(hs).alias("sig"))

    def band_hash(b: F.Column):
        sl = F.slice("sig", b * _MINHASH_ROWS + 1, _MINHASH_ROWS)
        return F.aggregate(
            F.slice(sl, 2, _MINHASH_ROWS - 1),
            F.element_at(sl, 1),
            lambda acc, v: F.pmod(acc * 31 + v, p))

    # narrow candidate generation (same shape as the production
    # variant): only ids + band hashes ride the band shuffle;
    # signatures join back after pair dedup.  `bhs` rides along for
    # the first-shared-band exactly-once emission (r14).
    bands = (sig.select(
        "doc_id",
        F.transform(F.sequence(F.lit(0), F.lit(_MINHASH_BANDS - 1)),
                    band_hash).alias("bhs"))
        .select("doc_id", "bhs",
                F.posexplode("bhs").alias("band_idx", "band_hash")))
    return sig, bands


def _checked_minhash_pairs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The cross-engine-reproducible MinHash+LSH candidate pipeline
    (md5-prefix token hash, polynomial band fold) returning
    (doc1, doc2, n_match) pairs with n_match >= 23 — the Spark twin
    of `_minhash_cte_block()`'s match_pairs CTE.  Shared by
    dedup_fuzzy_minhash_checked (which returns the pairs) and
    dedup_cluster_cc_lsh (which builds duplicate clusters on them)."""
    d = load_table(spark, "documents", sf_dir)
    sig, bands = _checked_sig_bands(d)
    pair_ids = _lsh_pair_ids(bands)
    pairs = (pair_ids
             .join(sig.select(F.col("doc_id").alias("doc1"),
                              F.col("sig").alias("sig1")), "doc1")
             .join(sig.select(F.col("doc_id").alias("doc2"),
                              F.col("sig").alias("sig2")), "doc2"))
    n_match = F.size(F.filter(
        F.zip_with("sig1", "sig2", lambda a, b: a == b), lambda x: x))
    return (pairs.withColumn("n_match", n_match.cast("long"))
            .filter(F.col("n_match") >= 23)
            .select("doc1", "doc2", "n_match"))


@register("dedup_fuzzy_minhash_checked", oracle=_minhash_oracle_sql(),
          tags=("lsh",))
def dedup_fuzzy_minhash_checked(spark: SparkSession, sf_dir: str) -> DataFrame:
    """dedup_fuzzy_minhash with every stage cross-engine HASH-CHECKED:
    the token hash is an md5-prefix integer (reproducible in DuckDB,
    unlike xxhash64), the band hash is an integer polynomial fold
    (reproducible, unlike Spark's Murmur `hash()`), and the output is
    the integer match count (n_match >= 23 ⇔ estimated Jaccard ≥ 0.7;
    a rounded fraction like 23/32 = 0.71875 lands on a decimal
    midpoint where the engines' tie-breaks differ).  The production
    variant (dedup_fuzzy_minhash) keeps the faster xxhash64; THIS
    query proves the LSH dataflow itself — signature, banding,
    candidate join, similarity estimate — is correct end to end.
    Same 100 TB shape: linear scan → band explode → bucket join."""
    return _checked_minhash_pairs(spark, sf_dir)


@register(
    "dedup_cluster_cc_lsh",
    oracle=f"""
    WITH RECURSIVE {_minhash_cte_block()},
    edges AS (
        SELECT doc1 AS src, doc2 AS dst FROM match_pairs
        UNION SELECT doc2, doc1 FROM match_pairs
    ),
    reach(node, lab) AS (
        SELECT doc_id, doc_id FROM documents
        UNION
        SELECT e.dst, r.lab FROM reach r JOIN edges e ON e.src = r.node
    )
    SELECT node AS doc_id, MIN(lab) AS cluster_id,
           (MIN(lab) = node) AS is_canonical
    FROM reach GROUP BY node
    """,
    tags=("iterative", "lsh"),
)
def dedup_cluster_cc_lsh(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Duplicate-cluster assembly over the LSH CANDIDATE graph — the
    production near-dup pipeline shape end to end: linear scan →
    MinHash signatures → band explode → bucket join (the
    cross-engine-checked pipeline from dedup_fuzzy_minhash_checked)
    → connected components → one canonical doc per cluster.

    This closes the scalability gap the r11 sf1 sweep measured in
    dedup_cluster_cc: that exhibit generates edges by blocked
    all-pairs exact Jaccard — quadratic within (source, lang) blocks,
    >12 min at sf1 — which is the right EXACT BASELINE but not the
    plan a 100 TB corpus runs.  Here the edge set is the LSH
    candidate output (linear in corpus size by banding), so the whole
    dataflow — pair-gen AND cluster assembly — scales; the CC loop is
    the same min-label propagation to fixpoint (one join + one keyed
    min-agg per iteration, lineage cut per iteration, iterations
    bounded by cluster diameter, single digits for near-dup
    clusters).  Oracle: the identical LSH pipeline in DuckDB SQL
    (shared CTE block) feeding recursive-CTE reachability."""
    d = load_table(spark, "documents", sf_dir)
    pairs = _checked_minhash_pairs(spark, sf_dir).select("doc1", "doc2")
    # lazy explode-symmetrization (see dedup_cluster_cc): the kernel's
    # contraction is the single consumer, so the whole LSH pair
    # pipeline executes once with no 2|E|-row checkpoint (r13)
    edges = _symmetrize_pairs(pairs)
    labels = _min_label_cc(
        d.select(F.col("doc_id").alias("node"),
                 F.col("doc_id").alias("lab")).localCheckpoint(eager=True),
        edges)
    return labels.select(F.col("node").alias("doc_id"),
                         F.col("lab").alias("cluster_id"),
                         (F.col("lab") == F.col("node")).alias("is_canonical"))


# Shared by dedup_incremental_vs_index and its streaming replay twin
# (streaming/queries.py stream_dedup_vs_index): the screen is per-doc
# independent, so ONE oracle states the contract for both.
INCR_SCREEN_ORACLE_SQL = f"""
    WITH {_minhash_cte_block()},
    hist_bands AS (SELECT doc_id, band_idx, band_hash FROM bands
                   WHERE doc_id % 10 <> 0),
    new_bands AS (SELECT doc_id, band_idx, band_hash FROM bands
                  WHERE doc_id % 10 = 0),
    cand AS (
      SELECT DISTINCT n.doc_id AS batch_id, h.doc_id AS hist_id
      FROM new_bands n JOIN hist_bands h
        ON n.band_idx = h.band_idx AND n.band_hash = h.band_hash),
    verified AS (
      SELECT c.batch_id, c.hist_id,
             CAST(len(list_filter(range(1, {_MINHASH_K}+1),
                      i -> s1.sig[i] = s2.sig[i])) AS BIGINT) AS n_match
      FROM cand c
      JOIN sig s1 ON s1.doc_id = c.batch_id
      JOIN sig s2 ON s2.doc_id = c.hist_id),
    best AS (
      SELECT batch_id, hist_id, n_match,
             ROW_NUMBER() OVER (PARTITION BY batch_id
                                ORDER BY n_match DESC, hist_id) AS rk
      FROM verified WHERE n_match >= 23)
    SELECT d.doc_id,
           (b.hist_id IS NOT NULL) AS is_dup,
           b.hist_id AS matched_doc,
           b.n_match
    FROM (SELECT doc_id FROM documents WHERE doc_id % 10 = 0) d
    LEFT JOIN (SELECT * FROM best WHERE rk = 1) b ON b.batch_id = d.doc_id
    """


@register(
    "dedup_incremental_vs_index",
    oracle=INCR_SCREEN_ORACLE_SQL,
    tags=("lsh", "incremental"),
)
def dedup_incremental_vs_index(spark: SparkSession,
                               sf_dir: str) -> DataFrame:
    """INCREMENTAL near-dup: screen an ARRIVING batch against a
    persisted LSH index of the historical corpus — the shape a CDC-fed
    training-data pipeline actually runs (the reference is a
    change-capture engine, README.md:17: data arrives as ordered row
    events, not as one static corpus).  The batch exhibits
    (dedup_fuzzy_minhash*) re-pair the WHOLE corpus per run — O(corpus)
    per day; this one touches O(batch + matched buckets): history
    signatures/band-hashes are computed once and persisted as the
    index (modeled here by the history-side band DataFrame; in
    production a TxLog table bucketed by (band_idx, band_hash), which
    MERGE appends each epoch keep co-located), and each arriving doc
    probes only its own 8 band buckets.

    Split rule doc_id % 10: ~10% of documents play the arriving batch,
    the rest are history.  Candidates = equi-join of batch band
    hashes against the index (AQE handles heavy buckets — this is a
    two-sided join, not the self-join triangle the batch exhibit
    salts); verification = signature agreement n_match >= 23 (same
    estimated-Jaccard ≥ 0.7 threshold as the pair exhibits, same
    shared `_checked_sig_bands` pipeline so engines and exhibits
    cannot drift); each batch doc reports its BEST history match
    (max n_match, then lowest doc_id — deterministic) or is_dup=false.
    Every batch doc appears in the output exactly once: the left join
    makes "nothing matched" an explicit row, not an absence."""
    d = load_table(spark, "documents", sf_dir).select("doc_id", "text")
    hist = d.filter(F.col("doc_id") % 10 != 0)
    batch = d.filter(F.col("doc_id") % 10 == 0)
    hist_sig, hist_bands = _checked_sig_bands(hist)
    return screen_against_index(batch, hist_sig, hist_bands)


def screen_against_index(batch_d: DataFrame, hist_sig: DataFrame,
                         hist_bands: DataFrame) -> DataFrame:
    """Screen one arriving-doc DataFrame against a history LSH index
    ((doc_id, sig) + exploded (doc_id, band_idx, band_hash)) — the
    shared kernel under dedup_incremental_vs_index (one batch) and
    stream_dedup_vs_index (per micro-batch): one code path, the
    streaming replay cannot drift from the batch semantics."""
    sig_b, bands_b = _checked_sig_bands(batch_d)
    # Explicitly repartition the probe side by the bucket key before
    # the (broadcast) index join — same r13 finding as _lsh_pair_ids:
    # the batch band rows are a few hundred KB, so the scan's single
    # partition (single-row-group fixture) or an AQE-coalesced
    # exchange would compute the whole |batch-bucket|×|index-bucket|
    # join fan-out and its partial distinct in ONE task.  Thousands
    # of distinct bucket keys spread the probe; the count is the
    # session shuffle.partitions conf, so it scales with deployment.
    # Exactly-once candidate emission (r14): a (batch, hist) pair
    # meets once per shared band — keeping only the FIRST shared band
    # (the same _first_shared_band predicate as the batch self-join;
    # no salt here, so no same-salt cut is needed) makes the join
    # output the candidate SET and drops the trailing distinct()'s
    # Exchange + two HashAggregates over the candidate multiset.
    n_part = _shuffle_partition_count(batch_d)
    cand = (bands_b.select(F.col("doc_id").alias("batch_id"),
                           F.col("bhs").alias("_ha"),
                           "band_idx", "band_hash")
            .repartition(n_part, "band_idx", "band_hash")
            .join(hist_bands.select(F.col("doc_id").alias("hist_id"),
                                    F.col("bhs").alias("_hb"),
                                    "band_idx", "band_hash"),
                  ["band_idx", "band_hash"])
            .filter(F.col("band_idx") == _first_shared_band("_ha", "_hb"))
            .select("batch_id", "hist_id"))
    n_match = F.size(F.filter(
        F.zip_with("sig1", "sig2", lambda a, b: a == b),
        lambda x: x)).cast("long")
    verified = (cand
                .join(sig_b.select(F.col("doc_id").alias("batch_id"),
                                   F.col("sig").alias("sig1")), "batch_id")
                .join(hist_sig.select(F.col("doc_id").alias("hist_id"),
                                      F.col("sig").alias("sig2")), "hist_id")
                .withColumn("n_match", n_match)
                .filter(F.col("n_match") >= 23))
    w = Window.partitionBy("batch_id").orderBy(F.desc("n_match"),
                                               F.asc("hist_id"))
    best = (verified.withColumn("rk", F.row_number().over(w))
            .filter(F.col("rk") == 1)
            .select("batch_id", "hist_id", "n_match"))
    batch_docs = batch_d.select("doc_id")
    return (batch_docs
            .join(best, batch_docs.doc_id == best.batch_id, "left")
            .select("doc_id",
                    F.col("hist_id").isNotNull().alias("is_dup"),
                    F.col("hist_id").alias("matched_doc"),
                    F.col("n_match")))


@register(
    "dedup_index_maintain",
    oracle=f"""
    WITH {_minhash_cte_block()}
    SELECT band_idx,
           CAST(COUNT(*) AS BIGINT) AS n_entries,
           CAST(SUM(band_hash) AS BIGINT) AS hash_checksum,
           CAST(SUM(doc_id) AS BIGINT) AS id_checksum
    FROM bands GROUP BY band_idx
    """,
    tags=("lsh", "incremental", "lakehouse"),
)
def dedup_index_maintain(spark: SparkSession, sf_dir: str) -> DataFrame:
    """INDEX MAINTENANCE — the write half of the incremental loop
    (dedup_incremental_vs_index is the read half): after an epoch's
    batch is screened, its band rows MERGE into the persisted LSH
    index so the NEXT epoch screens against an index that already
    contains them.  The index is a real TxLog table keyed on a
    synthesized (doc_id, band_idx) row key (doc_id * n_bands +
    band_idx — injective, integral, range-clusterable), seeded from
    the history corpus and upserted with the arriving batch's rows in
    ONE transactional commit — idempotent re-apply via the MERGE
    key contract, exactly how a CDC epoch sink maintains any keyed
    state table here.

    Contract proven by the oracle: the MAINTAINED index (seed +
    merge) must equal an index built FROM SCRATCH over the whole
    corpus — per-band entry counts plus band-hash and doc-id multiset
    checksums.  A dropped band row, a double-applied batch, or a key
    collision in the synthesized row key all flip a checksum.  At
    100 TB the index table is partitioned/bucketed by band hash (the
    probe key) and each epoch's MERGE prunes to the files its key
    range touches — the maintenance cost is O(batch), never
    O(index)."""
    import os as _os

    from cdc_plg_spark.lakehouse import TxLogTable

    d = load_table(spark, "documents", sf_dir).select("doc_id", "text")
    hist = d.filter(F.col("doc_id") % 10 != 0)
    batch = d.filter(F.col("doc_id") % 10 == 0)

    def band_rows(src: DataFrame) -> DataFrame:
        _, bands = _checked_sig_bands(src)
        return bands.select(
            (F.col("doc_id") * _MINHASH_BANDS + F.col("band_idx"))
            .alias("row_key"),
            "doc_id", "band_idx", "band_hash")

    # Scratch hygiene (ADVICE r12): the index table must outlive this
    # function (the returned DataFrame reads it lazily), so it lives
    # under the cache root — the former bare mkdtemp leaked an ~8×N-row
    # band table into /tmp per invocation.  Purge discipline is
    # OWN-DIRS-AT-PROCESS-EXIT (ADVICE r13): the former eager
    # purge-predecessors deleted ANY dir under the shared root, so a
    # concurrent bench/sweep on the same sf_dir — or a still-referenced
    # DataFrame from an earlier call in this session — could have its
    # live TxLog files deleted mid-query.  Each process now removes
    # only the run dirs it created, at exit (same pattern as
    # streaming/core._purge_scratch).
    import uuid as _uuid

    from cdc_plg_spark.catalog import cache_dir

    base = cache_dir("lsh_index", sf_dir)
    _os.makedirs(base, exist_ok=True)
    run_dir = _os.path.join(base, f"run_{_uuid.uuid4().hex[:12]}")
    _LSH_INDEX_RUN_DIRS.append(run_dir)
    p = _os.path.join(run_dir, "t")
    # hive-partitioned BY band_idx: a probe (or an epoch MERGE) for one
    # band prunes 7/8 of the table at the manifest before any IO — the
    # layout the docstring's 100 TB posture names, exercised here
    t = TxLogTable.create(spark, p, band_rows(hist), "row_key",
                          n_files=8, partition_by=["band_idx"])
    t.merge(band_rows(batch))          # the epoch's index update
    return (t.read()
            .groupBy("band_idx")
            .agg(F.count(F.lit(1)).alias("n_entries"),
                 F.sum("band_hash").alias("hash_checksum"),
                 F.sum("doc_id").alias("id_checksum")))


@register(
    "dedup_incremental_epochs",
    oracle=f"""
    WITH {_minhash_cte_block()},
    batch AS (SELECT doc_id, (doc_id // 10) % 3 AS epoch
              FROM documents WHERE doc_id % 10 = 0),
    vis AS (SELECT doc_id,
                   CASE WHEN doc_id % 10 <> 0 THEN -1
                        ELSE (doc_id // 10) % 3 END AS visible_from
            FROM documents),
    cand AS (
      SELECT DISTINCT b.doc_id AS batch_id, b.epoch, hb.doc_id AS idx_id
      FROM batch b
      JOIN bands nb ON nb.doc_id = b.doc_id
      JOIN bands hb ON hb.band_idx = nb.band_idx
                   AND hb.band_hash = nb.band_hash
      JOIN vis v ON v.doc_id = hb.doc_id
      WHERE v.visible_from < b.epoch),
    verified AS (
      SELECT c.batch_id, c.epoch, c.idx_id,
             CAST(len(list_filter(range(1, {_MINHASH_K}+1),
                      i -> s1.sig[i] = s2.sig[i])) AS BIGINT) AS n_match
      FROM cand c
      JOIN sig s1 ON s1.doc_id = c.batch_id
      JOIN sig s2 ON s2.doc_id = c.idx_id),
    best AS (
      SELECT batch_id, idx_id, n_match,
             ROW_NUMBER() OVER (PARTITION BY batch_id
                                ORDER BY n_match DESC, idx_id) AS rk
      FROM verified WHERE n_match >= 23)
    SELECT b.doc_id, CAST(b.epoch AS BIGINT) AS epoch,
           (x.idx_id IS NOT NULL) AS is_dup,
           x.idx_id AS matched_doc, x.n_match
    FROM batch b
    LEFT JOIN (SELECT * FROM best WHERE rk = 1) x ON x.batch_id = b.doc_id
    """,
    tags=("lsh", "incremental"),
)
def dedup_incremental_epochs(spark: SparkSession,
                             sf_dir: str) -> DataFrame:
    """EPOCH-ORDERED incremental dedup — the full production loop over
    THREE sequential arrival epochs: each epoch's docs are screened
    against the index AS IT EXISTS when they arrive (history + every
    EARLIER epoch's arrivals), then their signatures join the index
    before the next epoch screens.  This is the semantics the
    one-shot screen exhibit can't show: a doc arriving in epoch 2
    that duplicates an epoch-0 arrival IS caught, while two dups
    arriving in the SAME epoch are not (screen-then-merge ordering —
    the within-epoch pass is the batch pair exhibit's job, run per
    epoch in production).  The oracle states exactly that visibility
    rule: candidate h is visible to batch doc b iff h is history or
    epoch(h) < epoch(b).

    Index growth is modeled by unioning each epoch's signature/band
    frames into eagerly-checkpointed snapshots (the persisted-table
    write half is dedup_index_maintain's proven MERGE); screening per
    epoch is the shared `screen_against_index` kernel.  Epoch key
    (doc_id div 10) % 3 matches the streaming twin's chunk split, so
    this exhibit is its stateful-ordering complement."""
    d = load_table(spark, "documents", sf_dir).select("doc_id", "text")
    hist = d.filter(F.col("doc_id") % 10 != 0)
    batch = d.filter(F.col("doc_id") % 10 == 0)
    epoch_of = F.pmod(F.expr("doc_id div 10"), F.lit(3))

    idx_sig, idx_bands = _checked_sig_bands(hist)
    idx_sig = idx_sig.localCheckpoint(eager=True)
    idx_bands = idx_bands.localCheckpoint(eager=True)
    outs = []
    for e in range(3):
        chunk = batch.filter(epoch_of == e)
        outs.append(screen_against_index(chunk, idx_sig, idx_bands)
                    .withColumn("epoch", F.lit(e).cast("long")))
        c_sig, c_bands = _checked_sig_bands(chunk)
        idx_sig = (idx_sig.unionByName(c_sig)
                   .localCheckpoint(eager=True))
        idx_bands = (idx_bands.unionByName(c_bands)
                     .localCheckpoint(eager=True))
    out = outs[0]
    for o in outs[1:]:
        out = out.unionByName(o)
    return out.select("doc_id", "epoch", "is_dup", "matched_doc",
                      "n_match")
