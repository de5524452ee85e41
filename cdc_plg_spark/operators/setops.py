"""Set operators (SURVEY.md §2.7): union all/distinct, intersect, except.

Multiset semantics follow SQL: Spark `unionByName` = UNION ALL,
`intersect` = INTERSECT (distinct), `exceptAll` = EXCEPT ALL.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from cdc_plg_spark.catalog import load_table
from cdc_plg_spark.registry import register


def _cust_nations(spark, sf_dir):
    return (load_table(spark, "customer", sf_dir)
            .select(F.col("c_nationkey").alias("nationkey")))


def _supp_nations(spark, sf_dir):
    return (load_table(spark, "supplier", sf_dir)
            .select(F.col("s_nationkey").alias("nationkey")))


@register(
    "set_union_all",
    oracle="""
    SELECT nationkey, src FROM (
        SELECT c_nationkey AS nationkey, 'customer' AS src FROM customer
        UNION ALL
        SELECT s_nationkey AS nationkey, 'supplier' AS src FROM supplier
    )
    """,
)
def set_union_all(spark: SparkSession, sf_dir: str) -> DataFrame:
    """UNION ALL (bag union, no dedup shuffle — zero-shuffle concat)."""
    c = _cust_nations(spark, sf_dir).withColumn("src", F.lit("customer"))
    s = _supp_nations(spark, sf_dir).withColumn("src", F.lit("supplier"))
    return c.unionByName(s)


@register(
    "set_union_distinct",
    oracle="""
    SELECT c_nationkey AS nationkey FROM customer
    UNION
    SELECT s_nationkey AS nationkey FROM supplier
    """,
)
def set_union_distinct(spark: SparkSession, sf_dir: str) -> DataFrame:
    """UNION (distinct): one hash shuffle on the full row."""
    return (_cust_nations(spark, sf_dir)
            .unionByName(_supp_nations(spark, sf_dir))
            .distinct())


@register(
    "set_intersect",
    oracle="""
    SELECT c_nationkey AS nationkey FROM customer
    INTERSECT
    SELECT s_nationkey AS nationkey FROM supplier
    """,
)
def set_intersect(spark: SparkSession, sf_dir: str) -> DataFrame:
    """INTERSECT (distinct) — nations having both customers and suppliers."""
    return _cust_nations(spark, sf_dir).intersect(_supp_nations(spark, sf_dir))


@register(
    "set_except",
    oracle="""
    SELECT c_nationkey AS nationkey FROM customer
    EXCEPT ALL
    SELECT s_nationkey AS nationkey FROM supplier
    """,
)
def set_except(spark: SparkSession, sf_dir: str) -> DataFrame:
    """EXCEPT ALL (multiset difference, occurrence-counted)."""
    return _cust_nations(spark, sf_dir).exceptAll(_supp_nations(spark, sf_dir))


@register(
    "set_union_evolved",
    oracle="""
    SELECT doc_id, n_chars, lang FROM (
        SELECT doc_id, n_chars FROM documents WHERE doc_id < 250
        UNION ALL BY NAME
        SELECT doc_id, lang, n_chars FROM documents WHERE doc_id >= 250
    )
    """,
)
def set_union_evolved(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Schema-evolution union: rows written under an old schema (no
    `lang` column) unioned by NAME with rows under the widened schema,
    missing columns null-padded — the batch face of the reference's
    DDL-event flow (/root/reference/README.md:63; SURVEY.md §3.2): a
    changelog consumer reading files across a schema change sees
    exactly this merge. Positional UNION would silently misalign;
    unionByName(allowMissingColumns=True) is the only safe form."""
    d = load_table(spark, "documents", sf_dir)
    old = d.filter(F.col("doc_id") < 250).select("doc_id", "n_chars")
    new = d.filter(F.col("doc_id") >= 250).select("doc_id", "lang", "n_chars")
    return old.unionByName(new, allowMissingColumns=True)


@register(
    "set_intersect_all",
    oracle="""
    SELECT c_nationkey AS nationkey FROM customer
    INTERSECT ALL
    SELECT s_nationkey AS nationkey FROM supplier
    """,
)
def set_intersect_all(spark: SparkSession, sf_dir: str) -> DataFrame:
    """INTERSECT ALL (multiset intersection: each nation kept
    min(#customers, #suppliers) times).  Spark plans it as a
    count-matching aggregate — one shuffle on the row, no join
    explosion, same as the bag-difference twin set_except."""
    return (_cust_nations(spark, sf_dir)
            .intersectAll(_supp_nations(spark, sf_dir)))


@register(
    "set_except_distinct",
    oracle="""
    SELECT c_nationkey AS nationkey FROM customer
    EXCEPT
    SELECT s_nationkey AS nationkey FROM supplier WHERE s_acctbal > 8000
    """,
)
def set_except_distinct(spark: SparkSession, sf_dir: str) -> DataFrame:
    """EXCEPT (distinct set difference) — completes the §2.7 matrix:
    union/intersect/except each in ALL and DISTINCT flavors.  The
    supplier side is thinned to rich accounts so the difference is
    non-empty at every fixture scale (all 25 nations have SOME
    supplier; fewer have a high-balance one)."""
    rich = (load_table(spark, "supplier", sf_dir)
            .filter(F.col("s_acctbal") > 8000)
            .select(F.col("s_nationkey").alias("nationkey")))
    return _cust_nations(spark, sf_dir).subtract(rich)
