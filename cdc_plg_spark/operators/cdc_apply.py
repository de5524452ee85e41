"""Changelog-apply operators — MERGE/upsert and incremental view
maintenance, the two batch faces of the reference's sink contract.

The reference's sink receives ordered row changes and must make the
downstream table reflect them (``EmitRowChangedEvents`` +
``FlushRowChangedEvents``, /root/reference/README.md:62,:64). A Spark
consumer realizes that contract per micro-batch inside ``foreachBatch``;
these operators are the batch-checkable form of exactly that apply step:

- ``cdc_merge_upsert``: MERGE a changelog batch into a snapshot
  (insert new keys, update changed keys, drop deleted keys) — the
  canonical ``foreachBatch`` upsert body.
- ``cdc_delta_agg``: maintain an aggregate view incrementally from the
  changelog via signed retractions instead of recomputing — the
  materialized-view-maintenance pattern every CDC analytics stack needs
  at 100 TB (recompute is O(full table), the delta is O(batch)).

Scale notes: the merge is one hash shuffle of both sides on the primary
key (broadcast the delta when a micro-batch is small — AQE does this
automatically under the threshold); the delta-agg is a keyed window over
the batch plus a map-side-combinable global sum, never touching
historical state.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from cdc_plg_spark.catalog import load_table
from cdc_plg_spark.registry import register

SPLIT_TS = "2024-01-15"


def _latest_per_user(df: DataFrame) -> DataFrame:
    w = Window.partitionBy("user_id").orderBy(F.desc("ts"), F.desc("event_id"))
    return (df.withColumn("rn", F.row_number().over(w))
              .filter(F.col("rn") == 1).drop("rn"))


@register(
    "cdc_merge_upsert",
    oracle=f"""
    WITH snap AS (
        SELECT user_id, event_id, ts, value FROM (
            SELECT *, ROW_NUMBER() OVER (PARTITION BY user_id
                                         ORDER BY ts DESC, event_id DESC) AS rn
            FROM events WHERE ts < TIMESTAMP '{SPLIT_TS}')
        WHERE rn = 1),
    delta AS (
        SELECT user_id, event_id, ts, value,
               CASE WHEN event_type = 'signup' THEN 'I'
                    WHEN event_type = 'error' THEN 'D'
                    ELSE 'U' END AS op
        FROM (
            SELECT *, ROW_NUMBER() OVER (PARTITION BY user_id
                                         ORDER BY ts DESC, event_id DESC) AS rn
            FROM events WHERE ts >= TIMESTAMP '{SPLIT_TS}')
        WHERE rn = 1)
    SELECT COALESCE(d.user_id, s.user_id) AS user_id,
           COALESCE(d.event_id, s.event_id) AS event_id,
           epoch_us(COALESCE(d.ts, s.ts)) AS ts_us,
           ROUND(COALESCE(d.value, s.value), 4) AS value,
           (d.user_id IS NOT NULL) AS from_delta
    FROM snap s FULL OUTER JOIN delta d ON s.user_id = d.user_id
    WHERE d.op IS NULL OR d.op <> 'D'
    """,
    tags=("cdc",),
)
def cdc_merge_upsert(spark: SparkSession, sf_dir: str) -> DataFrame:
    """MERGE a changelog batch into a table snapshot.

    Snapshot = compacted state before SPLIT_TS; delta = the envelope ops
    (I/U/D per streaming.core.to_cdc_envelope's derivation) after it,
    compacted to its newest op per key. Apply semantics: D removes the
    key, I/U replace the row, untouched snapshot keys pass through —
    i.e. ``MERGE INTO snap USING delta ON key WHEN MATCHED [AND op='D']
    THEN DELETE / THEN UPDATE WHEN NOT MATCHED THEN INSERT``, expressed
    as a full-outer join, which is how a ``foreachBatch`` sink applies
    each micro-batch idempotently (/root/reference/README.md:119).
    """
    ev = load_table(spark, "events", sf_dir)
    snap = (_latest_per_user(ev.filter(F.col("ts") < SPLIT_TS))
            .select("user_id", "event_id", "ts", "value"))
    delta = (_latest_per_user(ev.filter(F.col("ts") >= SPLIT_TS))
             .select("user_id", "event_id", "ts", "value",
                     F.when(F.col("event_type") == "signup", "I")
                      .when(F.col("event_type") == "error", "D")
                      .otherwise("U").alias("op")))
    s, d = snap.alias("s"), delta.alias("d")
    merged = s.join(d, F.col("s.user_id") == F.col("d.user_id"), "full_outer")
    return (merged
            .filter(F.col("d.op").isNull() | (F.col("d.op") != "D"))
            .select(
                F.coalesce("d.user_id", "s.user_id").alias("user_id"),
                F.coalesce("d.event_id", "s.event_id").alias("event_id"),
                F.unix_micros(F.coalesce("d.ts", "s.ts")).alias("ts_us"),
                F.round(F.coalesce("d.value", "s.value"), 4).alias("value"),
                F.col("d.user_id").isNotNull().alias("from_delta")))


@register(
    "cdc_delta_agg",
    oracle="""
    WITH scaled AS (
        SELECT user_id, ts, event_id,
               CAST(ROUND(value, 4) * 10000 AS BIGINT) AS v
        FROM events),
    deltas AS (
        SELECT user_id,
               v - COALESCE(LAG(v) OVER (PARTITION BY user_id
                                         ORDER BY ts, event_id), 0) AS d
        FROM scaled),
    latest AS (
        SELECT user_id, v FROM (
            SELECT *, ROW_NUMBER() OVER (PARTITION BY user_id
                                         ORDER BY ts DESC, event_id DESC) AS rn
            FROM scaled)
        WHERE rn = 1)
    SELECT (SELECT CAST(COUNT(*) AS BIGINT) FROM latest) AS n_keys,
           (SELECT CAST(SUM(d) AS DOUBLE) / 10000 FROM deltas)
               AS incremental_total,
           (SELECT CAST(SUM(v) AS DOUBLE) / 10000 FROM latest)
               AS recomputed_total
    """,
    tags=("cdc",),
)
def cdc_delta_agg(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Incremental aggregate maintenance from a changelog.

    The view is SUM(current value per key). Instead of recomputing it
    from compacted state, each change event contributes a signed delta
    (new value minus the value it replaces — a retraction stream); the
    running total of deltas equals the recomputed view exactly, which
    the query itself demonstrates by emitting both (fixed-point longs,
    so equality is exact, not approximate). This is how a CDC consumer
    keeps a 100 TB aggregate fresh at O(batch) instead of O(table) per
    flush (/root/reference/README.md:64).
    """
    ev = load_table(spark, "events", sf_dir)
    scaled = ev.select(
        "user_id", "ts", "event_id",
        (F.floor(F.abs(F.col("value")) * 10000 + F.lit(0.5))
         * F.signum("value")).cast("long").alias("v"))
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    deltas = scaled.select(
        (F.col("v") - F.coalesce(F.lag("v").over(w), F.lit(0))).alias("d"))
    latest = _latest_per_user(scaled)
    inc = deltas.agg(F.sum("d").alias("inc"))
    rec = latest.agg(F.count(F.lit(1)).alias("n_keys"), F.sum("v").alias("rec"))
    return (rec.crossJoin(inc)
            .select("n_keys",
                    (F.col("inc").cast("double") / 10000)
                    .alias("incremental_total"),
                    (F.col("rec").cast("double") / 10000)
                    .alias("recomputed_total")))
