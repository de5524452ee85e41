"""Text-analysis operators for training-data pipelines (SURVEY.md §2.11
+ north-star mandate): stats, quality filtering, language ID, token
counting, fingerprinting, tf-idf keywords.

All pure JVM expressions (split / higher-order array fns / window) —
no Python in the hot path, so each op scales to 100 TB of documents
with one shuffle where a groupBy/window requires it.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from cdc_plg_spark.catalog import load_table
from cdc_plg_spark.registry import register

def _toks():
    return F.split("text", " ")


@register(
    "text_stats",
    oracle="""
    SELECT lang,
           COUNT(*) AS n_docs,
           CAST(SUM(n_chars) AS BIGINT) AS total_chars,
           ROUND(AVG(CAST(len(string_split(text, ' ')) AS DOUBLE)), 6)
               AS avg_tokens,
           COUNT(DISTINCT source) AS n_sources
    FROM documents GROUP BY lang
    """,
)
def text_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Corpus statistics per language: doc/char/token/source counts."""
    d = load_table(spark, "documents", sf_dir)
    return (d.groupBy("lang")
             .agg(F.count(F.lit(1)).alias("n_docs"),
                  F.sum("n_chars").alias("total_chars"),
                  F.round(F.avg(F.size(_toks()).cast("double")), 6).alias("avg_tokens"),
                  F.countDistinct("source").alias("n_sources")))


@register(
    "text_filter_quality",
    oracle="""
    SELECT doc_id, lang, n_chars,
           len(string_split(text, ' ')) AS n_tokens,
           ROUND(CAST(n_chars AS DOUBLE) / len(string_split(text, ' ')), 6)
               AS avg_token_len
    FROM documents
    WHERE n_chars BETWEEN 100 AND 2000
      AND lang IN ('en', 'de', 'fr')
      AND len(string_split(text, ' ')) >= 20
      AND len(list_distinct(string_split(text, ' '))) * 1.0
          / len(string_split(text, ' ')) > 0.2
    """,
)
def text_filter_quality(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Heuristic quality filter: length bounds, language allowlist,
    minimum token count, minimum type/token (vocabulary) ratio — the
    standard pre-training corpus hygiene pass."""
    d = load_table(spark, "documents", sf_dir)
    n_tokens = F.size(_toks())
    return (d.filter(F.col("n_chars").between(100, 2000)
                     & F.col("lang").isin("en", "de", "fr")
                     & (n_tokens >= 20)
                     & (F.size(F.array_distinct(_toks())) * 1.0 / n_tokens > 0.2))
             .select("doc_id", "lang", "n_chars",
                     n_tokens.alias("n_tokens"),
                     F.round(F.col("n_chars").cast("double") / n_tokens, 6)
                      .alias("avg_token_len")))


@register(
    "text_lang_id",
    oracle="""
    SELECT doc_id, lang,
           CASE WHEN len(list_filter(string_split(text, ' '),
                         x -> x IN ('the', 'a', 'of', 'and'))) >
                     len(list_filter(string_split(text, ' '),
                         x -> x IN ('data', 'table', 'row', 'column')))
                THEN 'en-ish' ELSE 'tech-ish' END AS guessed_register,
           len(list_filter(string_split(text, ' '),
               x -> x IN ('the', 'a', 'of', 'and'))) AS stopword_hits
    FROM documents
    """,
)
def text_lang_id(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Wordlist-scoring language/register ID — the n-gram-heuristic
    shape (count evidence-set hits per class, argmax). Deterministic and
    fully vectorized; a real model would swap in via pandas UDF."""
    d = load_table(spark, "documents", sf_dir)
    stop_hits = F.size(F.filter(_toks(), lambda x: x.isin("the", "a", "of", "and")))
    tech_hits = F.size(F.filter(_toks(), lambda x: x.isin("data", "table", "row", "column")))
    return d.select(
        "doc_id", "lang",
        F.when(stop_hits > tech_hits, "en-ish").otherwise("tech-ish")
         .alias("guessed_register"),
        stop_hits.alias("stopword_hits"),
    )


@register(
    "text_token_count",
    oracle="""
    SELECT doc_id,
           len(string_split(text, ' ')) AS ws_tokens,
           len(regexp_extract_all(text, '[a-z]+|[0-9]+|[^a-z0-9 ]')) AS bpe_ish_tokens,
           n_chars
    FROM documents
    """,
)
def text_token_count(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Token counting two ways: whitespace split and a BPE-ish regex
    lexer (letter runs / digit runs / single punctuation)."""
    d = load_table(spark, "documents", sf_dir)
    return d.select(
        "doc_id",
        F.size(_toks()).alias("ws_tokens"),
        F.size(F.regexp_extract_all("text", F.lit("[a-z]+|[0-9]+|[^a-z0-9 ]"), 0))
         .alias("bpe_ish_tokens"),
        "n_chars",
    )


@register(
    "text_fingerprint",
    oracle="""
    SELECT doc_id,
           list_aggregate(list_transform(
               generate_series(1, greatest(len(string_split(text,' ')) - 4, 1)),
               i -> md5(array_to_string(string_split(text,' ')[i:i+4], ' '))),
               'min') AS fingerprint
    FROM documents
    """,
)
def text_fingerprint(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Rolling-shingle document fingerprint: min hash over 5-gram
    shingles (winnowing-style). Content-defined, order-sensitive, and
    computed entirely with higher-order array fns — the primitive under
    MinHash dedup (operators/dedup.py)."""
    d = load_table(spark, "documents", sf_dir)
    toks = _toks()
    n = F.size(toks)
    shingle_hashes = F.transform(
        F.sequence(F.lit(1), F.greatest(n - 4, F.lit(1))),
        lambda i: F.md5(F.concat_ws(" ", F.slice(toks, i, 5))))
    return d.select("doc_id", F.array_min(shingle_hashes).alias("fingerprint"))


@register(
    "tfidf_keywords",
    oracle="""
    WITH tok AS (
        SELECT source, unnest(string_split(text, ' ')) AS token FROM documents
    ),
    tf AS (
        SELECT source, token, COUNT(*) AS tf FROM tok GROUP BY source, token
    ),
    df AS (
        SELECT token, COUNT(DISTINCT source) AS df FROM tok GROUP BY token
    ),
    n AS (SELECT COUNT(DISTINCT source) AS n_sources FROM documents),
    scored AS (
        SELECT tf.source, tf.token,
               ROUND(tf.tf * ln(CAST(n.n_sources AS DOUBLE) / df.df), 6) AS score
        FROM tf JOIN df USING (token) CROSS JOIN n
    )
    SELECT source, token, score, rk FROM (
        SELECT *, ROW_NUMBER() OVER (PARTITION BY source
                                     ORDER BY score DESC, token) AS rk
        FROM scored
    ) WHERE rk <= 3
    """,
)
def tfidf_keywords(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-source tf-idf top-3 terms: explode → tf counts → doc-freq
    join → per-source top-k window.

    No broadcast hint on the doc-frequency relation: it is
    VOCABULARY-sized, and a web-scale corpus's vocabulary (typos,
    unicode junk, code tokens) reaches billions of distinct tokens —
    a forced broadcast OOMs exactly when the corpus gets interesting.
    AQE picks broadcast while the vocab is actually small and degrades
    to a shuffle join instead of failing.  The 1-row n_sources
    aggregate stays hinted (provably bounded)."""
    d = load_table(spark, "documents", sf_dir)
    tok = d.select("source", F.explode(_toks()).alias("token"))
    tf = tok.groupBy("source", "token").agg(F.count(F.lit(1)).alias("tf"))
    # doc-frequency from the tf relation — its rows are already distinct
    # (source, token), so this avoids a second explode over the corpus
    df = tf.groupBy("token").agg(F.count(F.lit(1)).alias("df"))
    n_sources = d.select(F.countDistinct("source").alias("n_sources"))
    scored = (tf.join(df, "token")
                .crossJoin(F.broadcast(n_sources))
                .select("source", "token",
                        F.round(F.col("tf") * F.log(F.col("n_sources")
                                .cast("double") / F.col("df")), 6).alias("score")))
    w = Window.partitionBy("source").orderBy(F.desc("score"), F.asc("token"))
    return (scored.withColumn("rk", F.row_number().over(w))
                  .filter(F.col("rk") <= 3)
                  .select("source", "token", "score", "rk"))


@register(
    "text_chunking",
    oracle="""
    WITH starts AS (
        SELECT doc_id,
               unnest(generate_series(1, greatest(n_chars, 1), 400)) AS start
        FROM documents
    )
    SELECT d.doc_id, CAST(s.start AS BIGINT) AS start,
           substring(d.text, CAST(s.start AS INT), 500) AS chunk,
           length(substring(d.text, CAST(s.start AS INT), 500)) AS chunk_chars
    FROM documents d JOIN starts s USING (doc_id)
    """,
)
def text_chunking(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Training-data chunking: split each document into overlapping
    windows (500 chars, stride 400 → 100-char overlap) — the standard
    pre-tokenization step for LLM corpus prep. All JVM-side:
    ``sequence`` builds the start offsets, ``explode`` fans out, and
    ``substring`` slices; no Python crossing, no self-join. At 100 TB
    the fan-out is per-row and pipelined inside whole-stage codegen —
    output partitioning follows the input, so no shuffle at all."""
    d = load_table(spark, "documents", sf_dir)
    starts = F.sequence(F.lit(1), F.greatest(F.col("n_chars"), F.lit(1)),
                        F.lit(400))
    chunk = F.substring(F.col("text"), F.col("start"), F.lit(500))
    return (d.select("doc_id", "text",
                     F.explode(starts).alias("start"))
             .select("doc_id", F.col("start").cast("long").alias("start"),
                     chunk.alias("chunk"),
                     F.length(chunk).alias("chunk_chars")))


@register(
    "text_normalize",
    oracle="""
    SELECT doc_id,
           trim(regexp_replace(regexp_replace(lower(text),
                '[^a-z0-9\\s]', ' ', 'g'), '\\s+', ' ', 'g')) AS norm_text
    FROM documents
    """,
)
def text_normalize(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Corpus normalization: lowercase, strip non-alphanumerics,
    collapse whitespace — the canonical pre-dedup/pre-tokenization
    cleanup pass. Pure JVM regexp inside whole-stage codegen; no
    shuffle (narrow map over the scan)."""
    d = load_table(spark, "documents", sf_dir)
    norm = F.trim(F.regexp_replace(
        F.regexp_replace(F.lower(F.col("text")), r"[^a-z0-9\s]", " "),
        r"\s+", " "))
    return d.select("doc_id", norm.alias("norm_text"))


@register(
    "sample_train_test_split",
    oracle="""
    SELECT doc_id, lang,
           CASE WHEN substr(md5(CAST(doc_id AS VARCHAR)), 1, 2) < 'cc'
                THEN 'train'
                WHEN substr(md5(CAST(doc_id AS VARCHAR)), 1, 2) < 'e6'
                THEN 'val'
                ELSE 'test' END AS split
    FROM documents
    """,
)
def sample_train_test_split(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Deterministic ~80/10/10 train/val/test assignment by content
    hash of the key — reproducible across engines, runs, partitionings,
    and data arrival order (unlike randomSplit), so a document never
    migrates between splits as the corpus grows. Narrow map, no
    shuffle; downstream writers partitionBy('split')."""
    d = load_table(spark, "documents", sf_dir)
    h = F.substring(F.md5(F.col("doc_id").cast("string")), 1, 2)
    split = (F.when(h < "cc", "train")
              .when(h < "e6", "val")
              .otherwise("test"))
    return d.select("doc_id", "lang", split.alias("split"))


@register(
    "text_pii_redact",
    oracle="""
    SELECT doc_id,
           regexp_replace(regexp_replace(text,
               '[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\\.[A-Za-z]{2,}', '[EMAIL]',
               'g'), '[0-9]{6,}', '[NUM]', 'g') AS redacted
    FROM documents
    """,
)
def text_pii_redact(spark: SparkSession, sf_dir: str) -> DataFrame:
    """PII scrubbing pass over the corpus: emails and long digit runs
    (phone/account numbers) replaced with typed placeholders — the
    document-side twin of the reference's column-masking plugin use
    case (/root/reference/README.md:24). Pure JVM regexp, narrow map,
    no shuffle; at 100 TB this runs at scan speed."""
    d = load_table(spark, "documents", sf_dir)
    red = F.regexp_replace(
        F.regexp_replace(F.col("text"),
                         r"[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}",
                         "[EMAIL]"),
        r"[0-9]{6,}", "[NUM]")
    return d.select("doc_id", red.alias("redacted"))


@register(
    "text_quality_score",
    oracle="""
    SELECT doc_id,
           ROUND(CAST(length(regexp_replace(text, '[^0-9]', '', 'g')) AS DOUBLE)
                 / greatest(n_chars, 1), 6) AS digit_ratio,
           ROUND(CAST(length(regexp_replace(text, '[A-Za-z0-9\\s]', '', 'g'))
                      AS DOUBLE) / greatest(n_chars, 1), 6) AS symbol_ratio,
           ROUND(CAST(n_chars AS DOUBLE)
                 / greatest(len(string_split(text, ' ')), 1), 6)
               AS mean_token_len,
           (n_chars BETWEEN 64 AND 4096
            AND CAST(length(regexp_replace(text, '[^0-9]', '', 'g')) AS DOUBLE)
                / greatest(n_chars, 1) < 0.3) AS keep
    FROM documents
    """,
)
def text_quality_score(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Heuristic corpus-quality scoring (digit ratio, symbol ratio,
    mean token length) plus the keep/drop verdict a filtering stage
    applies — the SURVEY §2.11 quality-signal family computed in one
    narrow codegen'd pass, no Python, no shuffle."""
    d = load_table(spark, "documents", sf_dir)
    nc = F.greatest(F.col("n_chars"), F.lit(1)).cast("double")
    digits = F.length(F.regexp_replace("text", "[^0-9]", "")).cast("double")
    symbols = F.length(F.regexp_replace("text", r"[A-Za-z0-9\s]", "")).cast("double")
    ntok = F.greatest(F.size(F.split("text", " ")), F.lit(1)).cast("double")
    digit_ratio = digits / nc
    return d.select(
        "doc_id",
        F.round(digit_ratio, 6).alias("digit_ratio"),
        F.round(symbols / nc, 6).alias("symbol_ratio"),
        F.round(F.col("n_chars") / ntok, 6).alias("mean_token_len"),
        (F.col("n_chars").between(64, 4096) & (digit_ratio < 0.3))
            .alias("keep"))


@register(
    "text_levenshtein_pairs",
    oracle="""
    SELECT a.doc_id AS doc1, b.doc_id AS doc2,
           levenshtein(substring(a.text, 1, 40), substring(b.text, 1, 40))
               AS edit_dist,
           ROUND(1.0 - levenshtein(substring(a.text, 1, 40),
                                   substring(b.text, 1, 40))
                 / greatest(len(substring(a.text, 1, 40)),
                            len(substring(b.text, 1, 40))), 6) AS sim
    FROM documents a JOIN documents b ON b.doc_id = a.doc_id + 1
    """,
)
def text_levenshtein_pairs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Edit-distance pair scoring: Levenshtein over 40-char prefixes of
    adjacent docs + normalized similarity. The character-level fuzzy
    primitive complementing token-level Jaccard (dedup_ngram_jaccard).
    Levenshtein is O(m·n) per pair — ALWAYS bound the compared prefix
    and the candidate pairs (here: adjacency; in production: LSH
    buckets) before applying it at scale."""
    d = load_table(spark, "documents", sf_dir)
    a = d.select(F.col("doc_id").alias("doc1"),
                 F.substring("text", 1, 40).alias("ta"))
    b = d.select(F.col("doc_id").alias("doc2"),
                 F.substring("text", 1, 40).alias("tb"))
    j = a.join(b, F.col("doc2") == F.col("doc1") + 1)
    dist = F.levenshtein("ta", "tb")
    return j.select(
        "doc1", "doc2", dist.alias("edit_dist"),
        F.round(F.lit(1.0) - dist / F.greatest(F.length("ta"),
                                               F.length("tb")), 6)
         .alias("sim"))


@register(
    "text_unigram_logprob",
    oracle="""
    WITH tok AS (
        SELECT doc_id, unnest(string_split(text, ' ')) AS token
        FROM documents
    ),
    freq AS (SELECT token, COUNT(*) AS c FROM tok GROUP BY token),
    tot AS (SELECT CAST(SUM(c) AS DOUBLE) AS n FROM freq)
    SELECT t.doc_id,
           CAST(COUNT(*) AS BIGINT) AS n_tokens,
           ROUND(AVG(-log2(f.c / tot.n)), 6) AS avg_neg_log2p
    FROM tok t JOIN freq f USING (token) CROSS JOIN tot
    GROUP BY t.doc_id
    """,
)
def text_unigram_logprob(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Corpus-LM quality scoring: each document's mean per-token
    surprisal (−log₂ p) under the corpus's own unigram distribution —
    the cheap statistical stand-in for model-based perplexity filters
    in training-data pipelines (high surprisal ⇒ rare/garbled tokens,
    low ⇒ boilerplate).

    Two aggregations over one explode: token frequencies joined back
    onto the token stream, and the per-doc mean; the corpus total
    rides along as a 1-row broadcast.  NO broadcast hint on the
    frequency relation: it is VOCABULARY-sized, and a web-scale
    corpus's vocabulary (typos, unicode junk, multilingual tokens)
    reaches billions of distinct entries — tens of GB, past any
    broadcast budget (same class as tfidf's doc-frequency relation,
    de-hinted r8; this one de-hinted r9 per VERDICT r8).  AQE picks
    broadcast while the vocab is actually small and degrades to a
    shuffle join — co-partitioned with the freq groupBy on `token`,
    so the join reuses that exchange — instead of OOMing.  The 1-row
    total stays hinted (provably bounded)."""
    d = load_table(spark, "documents", sf_dir)
    tok = d.select("doc_id", F.explode(_toks()).alias("token"))
    freq = tok.groupBy("token").agg(F.count(F.lit(1)).alias("c"))
    tot = freq.agg(F.sum("c").cast("double").alias("n"))
    return (tok.join(freq, "token")
            .crossJoin(F.broadcast(tot))
            .groupBy("doc_id")
            .agg(F.count(F.lit(1)).alias("n_tokens"),
                 F.round(F.avg(-F.log2(F.col("c") / F.col("n"))), 6)
                  .alias("avg_neg_log2p")))


@register(
    "text_decontaminate",
    oracle="""
    WITH t AS (SELECT doc_id, string_split(text, ' ') AS w FROM documents),
    sh AS (SELECT doc_id, array_to_string(w[i:i+7], ' ') AS s
           FROM t, UNNEST(range(1, len(w)-6)) AS u(i)
           WHERE len(w) >= 8),
    ev AS (SELECT DISTINCT s FROM sh WHERE doc_id % 50 = 0)
    SELECT sh.doc_id, COUNT(DISTINCT sh.s) AS n_shared
    FROM sh JOIN ev USING (s) WHERE sh.doc_id % 50 <> 0
    GROUP BY 1
    """,
)
def text_decontaminate(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Benchmark decontamination: flag training documents sharing any
    8-token shingle with the held-out eval set (here: doc_id % 50 == 0
    as a deterministic stand-in for a benchmark suite), reporting how
    many distinct shingles leak.  The standard n-gram-collision
    contamination check (GPT-3 appendix C / PaLM style) as one
    dataflow: explode corpus shingles, inner-join against the distinct
    eval-shingle set, count per doc.

    Scale: the join shuffles on the shingle string — at 100 TB hash
    the shingle to a BIGINT first (fn_hash's xxhash64) so shuffle rows
    are fixed-width; the eval side is typically MBs (benchmarks are
    small) and broadcasts, making this a map-side scan of the corpus.
    Docs shorter than 8 tokens have no shingles and cannot leak."""
    d = load_table(spark, "documents", sf_dir)
    toks = _toks()
    sh = (d.filter(F.size(toks) >= 8)
          .select("doc_id",
                  F.explode(F.transform(
                      F.sequence(F.lit(1), F.size(toks) - F.lit(7)),
                      lambda i: F.concat_ws(" ", F.slice(toks, i, 8))))
                   .alias("s")))
    ev = sh.filter(F.col("doc_id") % 50 == 0).select("s").distinct()
    return (sh.filter(F.col("doc_id") % 50 != 0)
            .join(ev, "s")
            .groupBy("doc_id")
            .agg(F.countDistinct("s").alias("n_shared")))


@register(
    "text_repetition_signals",
    oracle="""
    WITH t AS (SELECT doc_id, string_split(text, ' ') AS w FROM documents),
    bg AS (SELECT doc_id, array_to_string(w[i:i+1], ' ') AS g
           FROM t, UNNEST(range(1, len(w))) AS u(i)
           WHERE len(w) >= 2),
    cnt AS (SELECT doc_id, g, COUNT(*) AS c FROM bg GROUP BY 1, 2)
    SELECT doc_id, CAST(SUM(c) AS BIGINT) AS n_bigrams,
           CAST(MAX(c) AS BIGINT) AS top_c,
           CAST(FLOOR(1000.0 * MAX(c) / SUM(c) + 0.5) AS BIGINT) AS top_pm
    FROM cnt GROUP BY 1
    """,
)
def text_repetition_signals(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Gopher-style repetition quality signal: the share of a document
    occupied by its most frequent word bigram (top_pm, per-mille as
    integer — floor(1000*max/total+0.5) is identical IEEE arithmetic
    in both engines, where a rounded float would drift).  High values
    mark boilerplate/spam for the quality filter to drop.

    Scale: explode → two-level aggregation, both keyed by doc_id so
    the second agg is map-side local after the first shuffle.  The
    bigram count state is bounded per doc, not per corpus."""
    d = load_table(spark, "documents", sf_dir)
    toks = _toks()
    bg = (d.filter(F.size(toks) >= 2)
          .select("doc_id",
                  F.explode(F.transform(
                      F.sequence(F.lit(1), F.size(toks) - F.lit(1)),
                      lambda i: F.concat_ws(" ", F.slice(toks, i, 2))))
                   .alias("g")))
    cnt = bg.groupBy("doc_id", "g").agg(F.count(F.lit(1)).alias("c"))
    return (cnt.groupBy("doc_id")
            .agg(F.sum("c").cast("long").alias("n_bigrams"),
                 F.max("c").cast("long").alias("top_c"),
                 F.floor(F.lit(1000.0) * F.max("c") / F.sum("c")
                         + F.lit(0.5)).cast("long").alias("top_pm")))


@register(
    "sample_domain_quota",
    oracle="""
    SELECT doc_id, source,
           ROW_NUMBER() OVER (PARTITION BY source
                              ORDER BY md5(CAST(doc_id AS VARCHAR)),
                                       doc_id) AS rn
    FROM documents QUALIFY rn <= 25
    """,
)
def sample_domain_quota(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-domain quota sampling: keep at most K documents per source,
    chosen by deterministic hash order (md5 of the id) — the domain-
    mixing step of a training-data pipeline, reproducible across runs
    and engines with no RNG state.

    Scale: one shuffle on source; rank-k per group truncates state at
    K per key.  Skewed mega-domains are exactly the point — the quota
    bounds them."""
    d = load_table(spark, "documents", sf_dir)
    w = (Window.partitionBy("source")
         .orderBy(F.md5(F.col("doc_id").cast("string")), "doc_id"))
    return (d.select("doc_id", "source")
            .withColumn("rn", F.row_number().over(w))
            .filter(F.col("rn") <= 25))


@register(
    "sample_pack_token_budget",
    oracle="""
    WITH t AS (SELECT doc_id, source, len(string_split(text, ' ')) AS n_tok
               FROM documents),
    c AS (SELECT *, SUM(n_tok) OVER (PARTITION BY source ORDER BY doc_id
              ROWS UNBOUNDED PRECEDING) AS cum FROM t)
    SELECT doc_id, source, n_tok,
           CAST((cum - n_tok) // 512 AS BIGINT) AS bin
    FROM c
    """,
)
def sample_pack_token_budget(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Sequence packing for training batches: assign each document to a
    bin so cumulative token count per bin stays near a 512-token
    budget — greedy sequential fill in deterministic doc_id order,
    bin = floor(tokens_before_this_doc / budget).  Integer `div` on
    both engines (Spark `div` truncates, DuckDB `//` floors — equal on
    the non-negative running sums here).

    Scale: a running-sum window partitioned by source — no global
    order, no single-partition exchange; each source packs
    independently, which is also what a sharded tokenizer wants."""
    d = load_table(spark, "documents", sf_dir)
    w = (Window.partitionBy("source").orderBy("doc_id")
         .rowsBetween(Window.unboundedPreceding, 0))
    return (d.select("doc_id", "source", F.size(_toks()).alias("n_tok"))
            .withColumn("cum", F.sum("n_tok").over(w))
            .select("doc_id", "source", "n_tok",
                    F.expr("(cum - n_tok) div 512").cast("long").alias("bin")))


@register(
    "sample_temperature_mix",
    oracle="""
    WITH c AS (SELECT lang, COUNT(*) AS n_d
               FROM documents GROUP BY lang),
    m AS (SELECT MIN(n_d) AS n_min FROM c),
    t AS (SELECT lang, n_d,
                 LEAST(65536 * CAST(FLOOR(SQRT(CAST(n_min AS DOUBLE)
                                               * n_d)) AS BIGINT)
                       // n_d, 65535) AS th
          FROM c, m)
    SELECT d.doc_id, d.lang, t.th AS keep_per_64k
    FROM documents d JOIN t USING (lang)
    WHERE substr(md5(CAST(d.doc_id AS VARCHAR)), 1, 4)
          < lpad(lower(to_hex(t.th)), 4, '0')
    """,
)
def sample_temperature_mix(spark: SparkSession,
                           sf_dir: str) -> DataFrame:
    """Temperature-based domain mixing (alpha-sampling, alpha = 0.5):
    resample the corpus so the surviving mix is proportional to
    n_d^alpha instead of n_d — the standard upweighting of small
    domains when composing a training mix (multilingual corpora,
    source balancing).  Keep rate per domain = sqrt(n_min / n_d), so
    the smallest domain survives (almost) whole and a domain 100x
    larger keeps ~10%.

    Engine-portable determinism, no RNG: a doc survives iff its md5
    4-hex-digit prefix falls under the domain's integer threshold
    `keep_per_64k` = 65536 * floor(sqrt(n_min * n_d)) // n_d (capped
    at 65535).  Both engines evaluate the identical IEEE-double chain
    (bigint->double cast, correctly-rounded sqrt, floor) and then an
    INTEGER division — Spark's `div` operator here mirrors DuckDB's
    `//` by construction, so no ulp argument is needed for the final
    step and thresholds (hence the surviving doc set) match to the
    last document at any domain count that fits the bigint product
    (r10 VERDICT fix: the earlier float-divide-then-truncate was only
    provably equal below ~2^37 docs/domain; the cross-engine pin in
    tests/test_llm_ops.py now sweeps to 2^46).  The threshold rides
    every row so a drifted count or a re-derived rate flips the value
    hash.

    Scale: one count aggregate (domain-cardinality sized), a 1-row
    min, then a domains-sized join the optimizer broadcasts on its
    own (AQE decides — no hint, the de-hinting discipline: the
    domain relation grows with #domains, not with data) and a pure
    filter that pushes to the scan.  No RNG state, no global order,
    reproducible on any partitioning."""
    d = load_table(spark, "documents", sf_dir).select(
        "doc_id", "lang")
    cnt = d.groupBy("lang").agg(F.count(F.lit(1)).alias("n_d"))
    n_min = cnt.agg(F.min("n_d").alias("n_min"))   # 1 row
    th = (cnt.crossJoin(n_min)
          .withColumn(
              "th",
              F.least(
                  F.expr("(65536 * cast(floor(sqrt("
                         "cast(n_min as double) * n_d)) as bigint))"
                         " div n_d"),
                  F.lit(65535).cast("long")))
          .select("lang", "th"))
    return (d.join(th, "lang")
            .filter(F.substring(F.md5(F.col("doc_id").cast("string")),
                                1, 4)
                    < F.lpad(F.lower(F.hex(F.col("th"))), 4, "0"))
            .select("doc_id", "lang",
                    F.col("th").alias("keep_per_64k")))


@register(
    "sample_global_shuffle",
    oracle="""
    SELECT doc_id,
           CAST(('0x' || substr(md5(CAST(doc_id AS VARCHAR)), 1, 2))
                AS BIGINT) AS shard,
           substr(md5(CAST(doc_id AS VARCHAR)), 1, 16) AS okey
    FROM documents
    """,
)
def sample_global_shuffle(spark: SparkSession,
                          sf_dir: str) -> DataFrame:
    """Deterministic global shuffle for training order: every document
    gets a content-hash shard (md5 first byte -> 256 shards) and a
    within-shard order key (md5 64-bit prefix) — the reproducible,
    engine-portable answer to "shuffle 100 TB of documents before
    training" with no RNG state and no global sort.

    The training writer materializes order by
    `repartitionByRange("shard", "okey")` + sortWithinPartitions —
    a range exchange whose cost is the one unavoidable shuffle;
    THIS op is the pure assignment (narrow map, pushes to the scan)
    so the assignment itself is value-verified against the oracle
    while the exchange stays a write-time choice.  Epoch reshuffles
    = salt the hash input with the epoch number."""
    d = load_table(spark, "documents", sf_dir)
    h = F.md5(F.col("doc_id").cast("string"))
    return d.select(
        "doc_id",
        F.conv(F.substring(h, 1, 2), 16, 10).cast("long").alias("shard"),
        F.substring(h, 1, 16).alias("okey"))
