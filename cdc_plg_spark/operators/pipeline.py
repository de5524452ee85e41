"""End-to-end LLM training-data preprocessing as ONE declarative plan.

The north-star claim is not that each operator exists, but that a user
can express their WHOLE corpus-preparation job as a single DataFrame
chain and let Catalyst plan it globally — filters merged into the scan,
dedup/decontaminate/quota shuffles scheduled together, no materialized
intermediates between stages (compare a five-job Airflow DAG, which
pays a full write+read round trip at every arrow).

Stage order follows the standard recipe (C4/Gopher/RefinedWeb lineage):
language + quality gates → exact content dedup → benchmark
decontamination → per-source quota → token-budget packing.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from cdc_plg_spark.catalog import load_table
from cdc_plg_spark.registry import register

PIPELINE_ORACLE = """
WITH kept AS (
    SELECT doc_id, text, lang, source,
           len(string_split(text, ' ')) AS n_tok
    FROM documents
    WHERE lang IN ('en', 'de', 'fr') AND n_chars >= 80
      AND len(string_split(text, ' ')) >= 10
),
dedup AS (
    SELECT * FROM (
        SELECT k.*, ROW_NUMBER() OVER (PARTITION BY md5(k.text)
                                       ORDER BY k.doc_id) AS rn
        FROM kept k) WHERE rn = 1
),
sh AS (
    SELECT d.doc_id, array_to_string(w[i:i+7], ' ') AS s
    FROM (SELECT doc_id, string_split(text, ' ') AS w FROM documents
          WHERE doc_id % 50 = 0) d(doc_id, w),
         UNNEST(range(1, len(w)-6)) AS u(i)
    WHERE len(w) >= 8
),
contaminated AS (
    SELECT DISTINCT d.doc_id
    FROM dedup d, UNNEST(range(1, len(string_split(d.text,' '))-6)) AS u(i)
    JOIN sh ON array_to_string(string_split(d.text,' ')[i:i+7], ' ') = sh.s
),
clean AS (
    SELECT * FROM dedup
    WHERE doc_id % 50 <> 0
      AND doc_id NOT IN (SELECT doc_id FROM contaminated)
),
quota AS (
    SELECT * FROM (
        SELECT c.*, ROW_NUMBER() OVER (PARTITION BY source
                   ORDER BY md5(CAST(doc_id AS VARCHAR)), doc_id) AS qrn
        FROM clean c) WHERE qrn <= 20
),
packed AS (
    SELECT doc_id, source, lang, n_tok,
           CAST((SUM(n_tok) OVER (PARTITION BY source ORDER BY doc_id
                     ROWS UNBOUNDED PRECEDING) - n_tok) // 512 AS BIGINT)
               AS bin
    FROM quota)
SELECT doc_id, source, lang, n_tok, bin FROM packed
"""


def _shingles(df: DataFrame) -> DataFrame:
    """(doc_id, s): all 8-token shingles of docs with ≥8 tokens.
    The size guard matters: Spark's sequence(1, n) DESCENDS when
    n < 1 instead of returning empty (DuckDB's range does not)."""
    toks = F.split("text", " ")
    return (df.filter(F.size(toks) >= 8)
            .select("doc_id",
                    F.explode(F.transform(
                        F.sequence(F.lit(1), F.size(toks) - F.lit(7)),
                        lambda i: F.concat_ws(" ", F.slice(toks, i, 8))))
                     .alias("s")))


@register("pipeline_llm_preprocess", oracle=PIPELINE_ORACLE)
def pipeline_llm_preprocess(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Language/quality gates → exact dedup → decontamination →
    per-source quota → 512-token packing, one DataFrame chain.

    Plan economics at 100 TB: the lang/length gates are scan-side
    filters (most of the corpus dies before any shuffle); exact dedup
    shuffles (md5(text), doc_id) pairs, not text, once; the eval
    shingle set dedupes to MBs and broadcasts into the contamination
    semi-join; quota + packing are two windows over the SAME
    source-partitioned shuffle, which Spark reuses.  Five stages, five
    exchanges (two of them tiny distinct-sets feeding broadcasts), each
    over strictly shrinking data."""
    d = load_table(spark, "documents", sf_dir)
    toks = F.split("text", " ")
    kept = (d.filter(F.col("lang").isin("en", "de", "fr")
                     & (F.col("n_chars") >= 80)
                     & (F.size(toks) >= 10))
            .select("doc_id", "text", "lang", "source",
                    F.size(toks).alias("n_tok")))

    w_dup = Window.partitionBy(F.md5("text")).orderBy("doc_id")
    dedup = (kept.withColumn("rn", F.row_number().over(w_dup))
             .filter(F.col("rn") == 1).drop("rn"))

    ev_sh = (_shingles(d.filter(F.col("doc_id") % 50 == 0))
             .select("s").distinct())
    contaminated = (_shingles(dedup)
                    .join(ev_sh, "s")
                    .select("doc_id").distinct())
    clean = (dedup.filter(F.col("doc_id") % 50 != 0)
             .join(contaminated, "doc_id", "left_anti"))

    w_quota = (Window.partitionBy("source")
               .orderBy(F.md5(F.col("doc_id").cast("string")), "doc_id"))
    quota = (clean.withColumn("qrn", F.row_number().over(w_quota))
             .filter(F.col("qrn") <= 20))

    w_pack = (Window.partitionBy("source").orderBy("doc_id")
              .rowsBetween(Window.unboundedPreceding, 0))
    return (quota.withColumn("cum", F.sum("n_tok").over(w_pack))
            .select("doc_id", "source", "lang", "n_tok",
                    F.expr("(cum - n_tok) div 512").cast("long").alias("bin")))
