"""Skew-mitigation proof: with one hot key owning ~90% of the fact
rows, the salted join must spread that key's rows over N reducer
partitions where the naive shuffle join concentrates them in one.
This is the measurable claim behind operators/joins.join_skew_salted.
"""

from __future__ import annotations

from pyspark.sql import functions as F
from pyspark.sql.functions import spark_partition_id


def _max_partition_fraction(df):
    counts = (df.groupBy(spark_partition_id().alias("p"))
              .count().collect())
    total = sum(r["count"] for r in counts)
    return max(r["count"] for r in counts) / total


def test_salting_spreads_hot_key(spark):
    n_salt = 8
    # fact: 90k rows on key 7 (hot), 10k spread over keys 0..99
    hot = spark.range(90_000).select(F.lit(7).alias("k"),
                                     F.col("id").alias("row_id"))
    cold = spark.range(10_000).select((F.col("id") % 100).alias("k"),
                                      (F.col("id") + 90_000).alias("row_id"))
    fact = hot.unionByName(cold)
    dim = spark.range(100).select(F.col("id").alias("k"),
                                  (F.col("id") * 10).alias("attr"))

    # AQE's skew handling is the built-in fix; disable it here to
    # isolate what explicit salting contributes
    prev = spark.conf.get("spark.sql.adaptive.enabled")
    spark.conf.set("spark.sql.adaptive.enabled", "false")
    try:
        naive = (fact.hint("shuffle_hash").join(dim, "k")
                 .select("k", "row_id", "attr"))
        naive_frac = _max_partition_fraction(naive)

        salted_fact = fact.withColumn("salt",
                                      (F.col("row_id") % n_salt))
        salted_dim = dim.withColumn("salt", F.explode(F.array(
            *[F.lit(i) for i in range(n_salt)])))
        salted = (salted_fact.hint("shuffle_hash")
                  .join(salted_dim, ["k", "salt"])
                  .select("k", "row_id", "attr"))
        salted_frac = _max_partition_fraction(salted)

        # same result set
        assert salted.count() == naive.count() == 100_000
        # hot key = 90% of rows -> naive worst partition holds >= ~90%;
        # salting divides it by n_salt
        assert naive_frac > 0.8, naive_frac
        assert salted_frac < naive_frac / 4, (naive_frac, salted_frac)
    finally:
        spark.conf.set("spark.sql.adaptive.enabled", prev)
