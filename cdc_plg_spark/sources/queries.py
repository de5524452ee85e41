"""Source/sink operators (SURVEY.md §2.1) + streaming joins (§2.3).

The reference's sink contract is a pluggable per-event-batch writer
(/root/reference/README.md:59-68): EmitRowChangedEvents + Flush +
checkpoint broadcast. Spark-native mapping:

- Kafka sink with custom partition routing (README.md:17,:21 — the
  RFC's first motivating plugin) → (key, value) encoding with an
  explicit routing key column; `format("kafka")` in production.
- MySQL-protocol batched sink (README.md:17,:22 — Doris batch-write
  plugin) → `df.write.jdbc` (JDBC batching native) / foreachBatch
  micro-batch INSERT batching.
- Object-store sink (README.md:23) → partitioned parquet write.
- The generic plugin sink (README.md:59-68,:73) → foreachBatch.

No Kafka broker exists in this container, so `sink_kafka` round-trips
its routed (key, value, partition) records through a FILE-BACKED
broker (pysource.KafkaFileSinkSource: per-partition append-log
segments + offset ledger) and re-derives routing/ordering/integrity
from what landed on disk — the network hop is the one-line
`.format("kafka")` swap.  `sink_jdbc_batch` likewise computes its
batched-INSERT wire payload, with the REAL write proven against
embedded Derby by `sink_jdbc_roundtrip`.

Scale notes: sinks write partitioned-by-(table/date) layouts so the
object store gets partition pruning on read-back; the Kafka key is the
routing policy, so partition skew is controlled by key choice (salt
hot tables with a bucket suffix).
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from cdc_plg_spark.catalog import load_table
from cdc_plg_spark.registry import register


# ---------------------------------------------------------------- scans

@register(
    "scan_parquet",
    oracle="""
    SELECT o_orderkey, o_custkey, o_orderstatus,
           ROUND(o_totalprice, 2) AS totalprice,
           CAST(o_orderdate AS DATE) AS orderdate
    FROM orders
    """,
)
def scan_parquet(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Parquet table scan with projection — column pruning reaches the
    reader (ReadSchema lists exactly these 5 columns; see
    tests/test_plans.py plan audits)."""
    from cdc_plg_spark.functions.numeric import fast_round

    o = load_table(spark, "orders", sf_dir)
    return o.select("o_orderkey", "o_custkey", "o_orderstatus",
                    fast_round("o_totalprice", 2).alias("totalprice"),
                    F.col("o_orderdate").cast("date").alias("orderdate"))


def _roundtrip_dir(sf_dir: str, fmt: str) -> str:
    """Deterministic per-sf cache dir for text-format round-trips."""
    from cdc_plg_spark.catalog import cache_dir

    return cache_dir(f"scan_{fmt}", sf_dir)


@register(
    "scan_csv_json",
    oracle="""
    SELECT n_nationkey, n_name, n_regionkey FROM nation
    """,
)
def scan_csv_json(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Schema-applied text ingestion (README.md:75 — JSON wire format):
    round-trip the nation table through JSON-lines and CSV with explicit
    schemas, join the two reads on the key, and verify both against the
    parquet-backed oracle. Explicit schemas (no inference pass) are the
    100 TB discipline — schema inference is a full extra scan."""
    n = load_table(spark, "nation", sf_dir).select(
        "n_nationkey", "n_name", "n_regionkey")
    base = _roundtrip_dir(sf_dir, "txt")
    jdir, cdir = base + "_json", base + "_csv"
    if not os.path.exists(jdir):
        n.write.mode("overwrite").json(jdir)
    if not os.path.exists(cdir):
        n.write.mode("overwrite").option("header", "true").csv(cdir)
    schema = "n_nationkey BIGINT, n_name STRING, n_regionkey BIGINT"
    from_json = spark.read.schema(schema).json(jdir)
    from_csv = (spark.read.schema(schema).option("header", "true").csv(cdir)
                .withColumnRenamed("n_name", "n_name_csv")
                .withColumnRenamed("n_regionkey", "n_regionkey_csv"))
    # inner join on key: any row lost/corrupted by either format drops
    # out or mismatches the oracle
    return (from_json.join(from_csv, "n_nationkey")
            .filter(F.col("n_name") == F.col("n_name_csv"))
            .select("n_nationkey", "n_name", "n_regionkey"))


@register(
    "source_cdc_stream",
    oracle="""
    SELECT ts AS commit_ts,
           CASE WHEN event_type = 'signup' THEN 'I'
                WHEN event_type = 'error' THEN 'D' ELSE 'U' END AS op,
           'events' AS "table",
           CASE WHEN event_type = 'signup' THEN NULL
                ELSE event_id END AS before_event_id,
           CASE WHEN event_type = 'error' THEN NULL
                ELSE event_id END AS after_event_id,
           CASE WHEN event_type = 'error' THEN NULL
                ELSE value END AS after_value
    FROM events
    """,
    tags=("streaming", "cdc"),
)
def source_cdc_stream(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The CDC changelog source (README.md:17): unbounded ordered
    row-change events in the RowChangedEvent envelope
    (commit_ts, op, table, before, after — README.md:62). Materialized
    via availableNow replay; the returned projection flattens the
    before/after images to scalars so the envelope derivation is
    value-verified against the batch oracle (struct columns themselves
    don't hash portably). Envelope invariants are asserted in
    tests/test_streaming.py::test_cdc_envelope_roundtrip."""
    from cdc_plg_spark.streaming.core import (read_events_stream,
                                              run_to_table, to_cdc_envelope)

    env = to_cdc_envelope(read_events_stream(spark, sf_dir))
    out = run_to_table(env, output_mode="append")
    return out.select(
        "commit_ts", "op", "table",
        F.col("before.event_id").alias("before_event_id"),
        F.col("after.event_id").alias("after_event_id"),
        F.col("after.value").alias("after_value"))


# ---------------------------------------------------------------- sinks

@register(
    "sink_kafka",
    oracle="""
    SELECT CAST(CAST(concat('0x', substring(md5(CAST(user_id % 16 AS VARCHAR)),
                                            1, 15)) AS BIGINT) % 8 AS INT)
               AS partition,
           COUNT(*) AS n_records,
           COUNT(DISTINCT CAST(user_id % 16 AS VARCHAR)) AS n_keys,
           CAST(SUM(event_id) AS BIGINT) AS id_checksum,
           CAST(0 AS BIGINT) AS order_violations
    FROM events
    GROUP BY 1
    """,
)
def sink_kafka(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Kafka sink with custom partition routing (README.md:17,:21 —
    the RFC's partition-dispatch plugin), ROUND-TRIP-verified against
    a file-backed broker (sources/pysource.py KafkaFileSinkSource; no
    broker exists in the container, so the per-partition append-log
    contract is realized on files and the network hop stays the
    one-line `.format("kafka")` swap).

    Routing policy: key = user_id bucket (16 keys), partition =
    md5-hash(key) % 8 — the md5-prefix integer hash DuckDB can
    reproduce, standing in for Kafka's murmur2(keyBytes) % n.  The
    producer sorts each partition's records by event_id (per-producer
    send order), writes (key, value, partition) through the sink, and
    the query READS THE BROKER LOG BACK: partition re-derived from
    each segment file's name (what actually landed, not what was
    sent), payload integrity via the event_id checksum parsed out of
    the JSON value, and per-segment producer order replayed from the
    seq numbers — `order_violations` counts records whose event_id
    regressed within a segment, and the oracle pins it to ZERO.  A
    sink that dropped, duplicated, misrouted or reordered records
    hash-mismatches.  Scale: routing/sort is one shuffle on the
    partition id; segment files are task-local appends."""
    import tempfile as _tf

    from pyspark.sql import Window
    from cdc_plg_spark.sources.pysource import register_python_sources

    register_python_sources(spark)
    broker = _tf.mkdtemp(prefix="cdc_kafka_broker_")
    ev = load_table(spark, "events", sf_dir)
    key = (F.col("user_id") % 16).cast("string")
    part = F.pmod(F.conv(F.substring(F.md5(key), 1, 15), 16, 10)
                  .cast("long"), F.lit(8)).cast("int")
    records = (ev.select(key.alias("key"),
                         F.to_json(F.struct("event_id", "user_id",
                                            "event_type")).alias("value"),
                         part.alias("partition"),
                         "event_id")
               .repartition(8, "partition")
               .sortWithinPartitions("partition", "event_id")
               .select("key", "value", "partition"))
    (records.write.format("cdc_kafka_sink")
     .option("path", broker).mode("append").save())

    # read back ONLY ledger-committed segments (the broker's index):
    # an aborted producer task's segment can never leak into the feed
    import json as _json

    with open(os.path.join(broker, "_LEDGER.json")) as fh:
        ledger = _json.load(fh)
    seg_files = [os.path.join(broker, seg["file"])
                 for segs in ledger.values() for seg in segs]
    back = (spark.read.schema("seq BIGINT, key STRING, value STRING")
            .json(seg_files)
            .withColumn("_file", F.element_at(
                F.split(F.input_file_name(), "/"), -1))
            .withColumn("partition", F.regexp_extract(
                "_file", r"segment-p(\d+)-", 1).cast("int"))
            .withColumn("ev", F.from_json(
                "value", "event_id BIGINT, user_id BIGINT, "
                         "event_type STRING")))
    w = Window.partitionBy("_file").orderBy("seq")
    regressed = (F.lag(F.col("ev.event_id")).over(w)
                 > F.col("ev.event_id")).cast("long")
    return (back.withColumn("viol", F.coalesce(regressed, F.lit(0)))
            .groupBy("partition")
            .agg(F.count(F.lit(1)).alias("n_records"),
                 F.countDistinct("key").alias("n_keys"),
                 F.sum("ev.event_id").alias("id_checksum"),
                 F.sum("viol").alias("order_violations")))


@register(
    "sink_jdbc_batch",
    oracle="""
    WITH numbered AS (
        SELECT o_orderkey, ROUND(o_totalprice, 2) AS p,
               o_orderkey % 8 AS writer_id,
               ROW_NUMBER() OVER (PARTITION BY o_orderkey % 8
                                  ORDER BY o_orderkey) - 1 AS rn
        FROM orders WHERE o_orderstatus = 'F'
    )
    SELECT CAST(writer_id AS BIGINT) AS writer_id,
           CAST(rn // 500 AS BIGINT) AS batch_id,
           COUNT(*) AS n_rows,
           CAST(SUM(CAST(ROUND(p * 100) AS BIGINT)) AS DOUBLE) / 100
               AS batch_total
    FROM numbered GROUP BY 1, 2
    """,
)
def sink_jdbc_batch(spark: SparkSession, sf_dir: str) -> DataFrame:
    """MySQL-protocol batched sink (README.md:17,:22 — the Doris
    batch-write-optimization plugin): rows are packed into fixed-size
    INSERT batches (batchsize=500, the knob `df.write.jdbc` exposes as
    `batchsize`), PER WRITER TASK — exactly what `df.write.jdbc` does:
    each of the N partitions opens its own connection and packs its own
    rows, with no global coordination. Emits one row per (writer,
    batch) with its row count and checksum; the network write is
    `.jdbc(url, table, properties={"batchsize": 500})`.

    The writer assignment is a deterministic key hash (o_orderkey % 8
    — standing in for repartition(8, key)) so the DuckDB oracle can
    reproduce the packing; the row_number window is PARTITIONED by
    writer, so the plan has no single-partition stage and scales with
    the writer count."""
    from cdc_plg_spark.functions.numeric import fast_round
    from pyspark.sql import Window

    o = (load_table(spark, "orders", sf_dir)
         .filter(F.col("o_orderstatus") == "F")
         .select("o_orderkey", fast_round("o_totalprice", 2).alias("p"),
                 (F.col("o_orderkey") % 8).alias("writer_id")))
    w = Window.partitionBy("writer_id").orderBy("o_orderkey")
    numbered = o.withColumn("rn", F.row_number().over(w) - 1)
    return (numbered
            .groupBy(F.col("writer_id").cast("bigint").alias("writer_id"),
                     (F.col("rn") / 500).cast("bigint").alias("batch_id"))
            .agg(F.count(F.lit(1)).alias("n_rows"),
                 (F.sum(F.round(F.col("p") * 100).cast("long"))
                  .cast("double") / 100).alias("batch_total")))


@register(
    "sink_object_store",
    oracle="""
    SELECT year(o_orderdate) AS yr, o_orderstatus,
           COUNT(*) AS n,
           CAST(SUM(CAST(ROUND(o_totalprice * 100) AS BIGINT)) AS DOUBLE)
               / 100 AS total
    FROM orders GROUP BY 1, 2
    """,
)
def sink_object_store(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Object-store sink (README.md:23): write orders partitioned by
    (year, status) — the (table, date) layout SURVEY.md §4 prescribes
    for partition pruning — then read back and aggregate per partition.
    The oracle sees the pre-write data, so the round-trip must be
    lossless and the partition columns must survive the layout."""
    o = load_table(spark, "orders", sf_dir).withColumn(
        "yr", F.year("o_orderdate"))
    out_dir = _roundtrip_dir(sf_dir, "objstore")
    if not os.path.exists(out_dir):
        (o.write.mode("overwrite")
          .partitionBy("yr", "o_orderstatus").parquet(out_dir))
    back = spark.read.parquet(out_dir)
    return (back.groupBy("yr", "o_orderstatus")
            .agg(F.count(F.lit(1)).alias("n"),
                 (F.sum(F.round(F.col("o_totalprice") * 100).cast("long"))
                  .cast("double") / 100).alias("total")))


@register(
    "sink_foreach_plugin",
    oracle="""
    SELECT event_type,
           COUNT(*) AS n,
           COUNT(DISTINCT user_id) AS n_users
    FROM events GROUP BY event_type
    """,
)
def sink_foreach_plugin(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The RFC's core abstraction (README.md:59-68,:73): a pluggable
    per-batch sink. User code receives (micro-batch DataFrame, epoch_id)
    — EmitRowChangedEvents + checkpoint-ts in one callback. Here the
    plugin is a per-event-type accumulator writing parquet keyed by
    epoch (idempotent apply, README.md:119); the final table must equal
    the batch aggregate."""
    import tempfile as _tf

    from cdc_plg_spark.streaming.core import (read_events_stream,
                                              run_foreach_batch)

    out_dir = _tf.mkdtemp(prefix="cdc_plugin_sink_")
    ckpt = _tf.mkdtemp(prefix="cdc_plugin_ckpt_")

    def plugin(batch_df: DataFrame, epoch_id: int) -> None:
        (batch_df.groupBy("event_type")
         .agg(F.count(F.lit(1)).alias("n"),
              F.countDistinct("user_id").alias("n_users"))
         .withColumn("epoch_id", F.lit(epoch_id))
         .write.mode("append").parquet(out_dir))

    ev = read_events_stream(spark, sf_dir).select("event_type", "user_id")
    run_foreach_batch(ev, plugin, ckpt)
    # merge per-epoch partials (availableNow may run >1 batch)
    return (spark.read.parquet(out_dir)
            .groupBy("event_type")
            .agg(F.sum("n").alias("n"),
                 F.sum("n_users").alias("n_users")))


# ------------------------------------------------------- streaming joins

@register(
    "join_enrich_stream_static",
    oracle="""
    SELECT c.c_mktsegment, COUNT(*) AS n_events
    FROM events e JOIN customer c ON e.user_id = c.c_custkey
    GROUP BY 1
    """,
    tags=("streaming",),
)
def join_enrich_stream_static(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Stream × static dimension enrichment (README.md:89 — plugins
    consult reference data per event via host_call; Spark-native: the
    dimension is just a DataFrame joined into the stream). The static
    side is broadcast per micro-batch — no stream state; the replay
    equals the batch join, which IS the oracle."""
    from cdc_plg_spark.streaming.core import read_events_stream, run_to_table

    ev = read_events_stream(spark, sf_dir)
    dim = (load_table(spark, "customer", sf_dir)
           .select(F.col("c_custkey").alias("user_id"), "c_mktsegment"))
    enriched = (ev.join(F.broadcast(dim), "user_id")
                .groupBy("c_mktsegment")
                .agg(F.count(F.lit(1)).alias("n_events")))
    return run_to_table(enriched, output_mode="complete")


@register(
    "join_interval_stream",
    oracle="""
    WITH c AS (SELECT user_id AS cu, event_id AS cid, ts AS cts
               FROM events WHERE event_type = 'click'),
    v AS (SELECT user_id AS vu, ts AS vts
          FROM events WHERE event_type = 'view')
    SELECT cu AS c_user, COUNT(*) AS n_pairs,
           COUNT(DISTINCT cid) AS n_clicks
    FROM c JOIN v ON cu = vu
       AND vts >= cts - INTERVAL 10 MINUTE AND vts < cts
    GROUP BY 1
    """,
    tags=("streaming",),
)
def join_interval_stream(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Stream-stream interval join: each 'click' event joins 'view'
    events of the same user within the preceding 10 minutes. Watermarks
    on BOTH sides bound the join state (Spark evicts rows outside the
    interval once the watermark passes — the resolved-ts contract
    applied to join state). Inner interval joins emit all matched
    pairs in the replay, so the result equals the batch range join —
    the oracle."""
    from cdc_plg_spark.streaming.core import read_events_stream, run_to_table

    base = read_events_stream(spark, sf_dir)
    clicks = (base.filter(F.col("event_type") == "click")
              .select(F.col("user_id").alias("c_user"),
                      F.col("event_id").alias("click_id"),
                      F.col("ts").alias("c_ts"))
              .withWatermark("c_ts", "1 hour"))
    views = (base.filter(F.col("event_type") == "view")
             .select(F.col("user_id").alias("v_user"),
                     F.col("event_id").alias("view_id"),
                     F.col("ts").alias("v_ts"))
             .withWatermark("v_ts", "1 hour"))
    joined = clicks.join(
        views,
        F.expr("""
            c_user = v_user AND
            v_ts >= c_ts - INTERVAL 10 MINUTES AND v_ts < c_ts
        """))
    out = run_to_table(joined, output_mode="append")
    return (out.groupBy("c_user")
            .agg(F.count(F.lit(1)).alias("n_pairs"),
                 F.countDistinct("click_id").alias("n_clicks")))


@register(
    "join_outer_stream_stream",
    oracle="""
    WITH c AS (SELECT user_id AS cu, event_id AS cid, ts AS cts
               FROM events WHERE event_type = 'click'),
    v AS (SELECT user_id AS vu, event_id AS vid, ts AS vts
          FROM events WHERE event_type = 'view')
    SELECT cu AS c_user,
           COUNT(DISTINCT cid) AS n_clicks,
           COUNT(vid) AS n_pairs,
           COUNT(DISTINCT CASE WHEN vid IS NULL THEN cid END)
               AS n_unmatched
    FROM c LEFT JOIN v ON cu = vu
       AND vts >= cts - INTERVAL 10 MINUTE AND vts < cts
    GROUP BY 1
    """,
    tags=("streaming",),
)
def join_outer_stream_stream(spark: SparkSession, sf_dir: str) -> DataFrame:
    """LEFT-OUTER stream-stream interval join: every 'click' emits,
    with its matching prior-10-minute 'view' count or alone if none
    arrived. The outer side is the part plain inner interval join
    (join_interval_stream) can't express: a NULL-padded result may
    only emit once the watermark proves no matching view can still
    arrive — the resolved-ts contract (README.md:64) applied to
    *absence* of data.

    Replay determinism: outer results emit at watermark advances,
    which happen between micro-batches — a single availableNow batch
    would hold every unmatched click back forever. The sentinel-staged
    multi-batch source (streaming.core.staged_events_stream) provides
    the advances; with them, the replay equals the batch left join —
    the oracle below (sentinel rows carry user_id -1 and are dropped;
    sentinel views can never match a real click's user)."""
    from cdc_plg_spark.streaming.core import (run_to_table,
                                              staged_events_stream)

    raw = staged_events_stream(spark, sf_dir)
    clicks = (raw.filter(F.col("event_type") == "click")
              .select(F.col("user_id").alias("c_user"),
                      F.col("event_id").alias("click_id"),
                      F.col("ts").alias("c_ts"))
              .withWatermark("c_ts", "10 minutes"))
    views = (raw.filter(F.col("event_type") == "view")
             .select(F.col("user_id").alias("v_user"),
                     F.col("event_id").alias("view_id"),
                     F.col("ts").alias("v_ts"))
             .withWatermark("v_ts", "10 minutes"))
    joined = clicks.join(
        views,
        F.expr("""
            c_user = v_user AND
            v_ts >= c_ts - INTERVAL 10 MINUTES AND v_ts < c_ts
        """),
        "left_outer")
    out = run_to_table(joined, output_mode="append")
    # drop the sentinel rows (user -1) after the join
    return (out.filter(F.col("c_user") >= 0)
            .groupBy("c_user")
            .agg(F.countDistinct("click_id").alias("n_clicks"),
                 F.count("view_id").alias("n_pairs"),
                 F.countDistinct(
                     F.when(F.col("view_id").isNull(), F.col("click_id")))
                  .alias("n_unmatched")))


@register(
    "scan_orc",
    oracle="""
    SELECT o_orderkey, o_orderstatus, ROUND(o_totalprice, 2) AS totalprice
    FROM orders WHERE o_orderstatus = 'O'
    """,
)
def scan_orc(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ORC round-trip scan: write the orders table as ORC once (cached
    per sf), read it back with a pushed filter — Spark's second
    columnar file format, same pushdown/pruning machinery as parquet
    (PushedFilters on the OrcScan). Oracle reads the same rows from
    the parquet view (content-identical by construction)."""
    path = _roundtrip_dir(sf_dir, "orc")
    if not os.path.isdir(path):
        (load_table(spark, "orders", sf_dir)
         .select("o_orderkey", "o_orderstatus", "o_totalprice")
         .write.mode("overwrite").orc(path))
    from cdc_plg_spark.functions.numeric import fast_round

    return (spark.read.orc(path)
            .filter(F.col("o_orderstatus") == "O")
            .select("o_orderkey", "o_orderstatus",
                    fast_round("o_totalprice", 2).alias("totalprice")))


@register(
    "gen_synthetic_table",
    oracle="""
    SELECT CAST(i AS BIGINT) AS id,
           md5(CAST(i AS VARCHAR)) AS h,
           substring(md5(CAST(i AS VARCHAR)), 1, 1) AS cat,
           CAST((i * 2654435761 % 1000000) AS DOUBLE) / 1000 AS val
    FROM range(0, 20000) t(i)
    """,
)
def gen_synthetic_table(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Deterministic synthetic-data generation: spark.range (a
    parallelized iota source — no input files) + hash-derived columns.
    The augmentation/backfill primitive for training-data pipelines:
    at 100 TB scale `range(n).repartition(k)` fans generation across
    the cluster with zero input I/O, and every derived column is a
    pure function of id, so regeneration is reproducible."""
    return (spark.range(0, 20000)
            .select(F.col("id"),
                    F.md5(F.col("id").cast("string")).alias("h"),
                    F.substring(F.md5(F.col("id").cast("string")), 1, 1)
                     .alias("cat"),
                    ((F.col("id") * 2654435761) % 1000000).cast("double")
                    .alias("val_raw")))\
        .select("id", "h", "cat", (F.col("val_raw") / 1000).alias("val"))


@register(
    "source_python_datasource",
    oracle="""
    SELECT i AS event_id,
           TIMESTAMP '2024-01-01 00:00:00' + to_minutes(i) AS ts,
           i % 97 AS user_id,
           CASE i % 4 WHEN 0 THEN 'view' WHEN 1 THEN 'click'
                      WHEN 2 THEN 'purchase' ELSE 'error' END AS event_type,
           CAST(i % 1000 AS DOUBLE) / 100.0 AS amount
    FROM range(0, 5000) t(i)
    """,
)
def source_python_datasource(spark: SparkSession, sf_dir: str) -> DataFrame:
    """A user-authored source PLUGIN consumed by name — the reference's
    source-plugin registration contract (README.md:17,:59-68) through
    Spark 4's Python DataSource API (sources/pysource.py): register
    once per session, then ``spark.read.format("cdc_eventgen")``.
    Each InputPartition becomes one task reading an id-range slice, so
    the source scales out like any file scan; the generated events are
    pure integer arithmetic, hence bit-reproducible and hash-checkable
    against a DuckDB range() oracle."""
    from cdc_plg_spark.sources.pysource import register_python_sources

    register_python_sources(spark)
    return (spark.read.format("cdc_eventgen")
            .option("rows", 5000).option("parts", 8).load())


@register(
    "source_python_stream_replay",
    oracle="""
    SELECT i AS event_id,
           TIMESTAMP '2024-01-01 00:00:00' + to_minutes(i) AS ts,
           i % 97 AS user_id,
           CASE i % 4 WHEN 0 THEN 'view' WHEN 1 THEN 'click'
                      WHEN 2 THEN 'purchase' ELSE 'error' END AS event_type,
           CAST(i % 1000 AS DOUBLE) / 100.0 AS amount
    FROM range(0, 3000) t(i)
    """,
)
def source_python_stream_replay(spark: SparkSession, sf_dir: str) -> DataFrame:
    """A user-authored STREAMING source plugin driven to exhaustion by
    repeated checkpointed availableNow runs — the scheduled-micro-batch
    deployment shape, and a live proof of the RFC's resume-from-
    checkpoint-ts contract (README.md:65,:119): each restart picks up
    at the committed row-index offset (SimpleDataSourceStreamReader in
    sources/pysource.py), the parquet sink's metadata log keeps the
    output exactly-once, and the union of all runs hash-matches the
    deterministic generator's full range."""
    import tempfile

    from cdc_plg_spark.sources.pysource import register_python_sources

    register_python_sources(spark)
    out_dir = tempfile.mkdtemp(prefix="cdc_pystream_out_")
    ckpt = tempfile.mkdtemp(prefix="cdc_pystream_ckpt_")
    st = (spark.readStream.format("cdc_eventgen_stream")
          .option("rows", 3000).option("chunk", 1000).load())
    for _ in range(4):  # 3 chunks + one provably-empty run
        q = (st.writeStream.format("parquet")
             .option("path", out_dir)
             .option("checkpointLocation", ckpt)
             .trigger(availableNow=True)
             .start())
        q.awaitTermination()
    return spark.read.parquet(out_dir)


@register(
    "scan_json_corrupt_records",
    oracle="""
    SELECT CAST(COUNT(*) FILTER (WHERE event_id % 100 <> 0) AS BIGINT)
               AS n_good,
           CAST(COUNT(*) FILTER (WHERE event_id % 100 = 0) AS BIGINT)
               AS n_bad,
           CAST(SUM(event_id) FILTER (WHERE event_id % 100 <> 0) AS BIGINT)
               AS sum_good_ids
    FROM events
    """,
)
def scan_json_corrupt_records(spark: SparkSession, sf_dir: str) -> DataFrame:
    """PERMISSIVE ingestion of dirty JSONL — the malformed-wire-event
    path every real CDC intake needs (README.md:75's JSON format, but
    producers emit garbage sometimes).  A deterministic JSONL copy of
    the events table is built with every 100th event replaced by an
    unparsable line; the PERMISSIVE reader lands those in
    `_corrupt_record` instead of failing the job, and the query counts
    both populations plus an exact checksum of the clean rows.
    DROPMALFORMED/FAILFAST are the same reader one option away.

    Scale: the quarantine pattern — bad rows stay queryable for a
    dead-letter sink instead of poisoning the pipeline."""
    import os as _os
    import shutil as _sh

    from cdc_plg_spark.catalog import cache_dir, load_table

    path = cache_dir("json_badlines", sf_dir)
    if not _os.path.isdir(path):
        build = path + ".build"
        _sh.rmtree(build, ignore_errors=True)
        ev = load_table(spark, "events", sf_dir)
        line = F.when(
            F.col("event_id") % 100 == 0,
            F.concat(F.lit("{corrupt::"), F.col("event_id").cast("string")),
        ).otherwise(F.to_json(F.struct("event_id", "user_id", "value")))
        ev.select(line.alias("value")).write.mode("overwrite").text(build)
        try:
            _os.rename(build, path)
        except OSError:
            _sh.rmtree(build, ignore_errors=True)  # concurrent builder won
    raw = (spark.read
           .schema("event_id BIGINT, user_id BIGINT, value DOUBLE, "
                   "_corrupt_record STRING")
           .option("mode", "PERMISSIVE")
           .option("columnNameOfCorruptRecord", "_corrupt_record")
           .json(path))
    good = F.col("_corrupt_record").isNull()
    return raw.agg(
        F.sum(good.cast("long")).alias("n_good"),
        F.sum((~good).cast("long")).alias("n_bad"),
        F.sum(F.when(good, F.col("event_id"))).alias("sum_good_ids"))


@register(
    "sink_jdbc_roundtrip",
    oracle="""
    SELECT o_orderpriority,
           CAST(COUNT(*) AS BIGINT) AS n,
           CAST(SUM(CAST(FLOOR(o_totalprice * 100 + 0.5) AS BIGINT))
                AS BIGINT) AS total_cents
    FROM orders WHERE o_orderstatus = 'F'
    GROUP BY 1
    """,
)
def sink_jdbc_roundtrip(spark: SparkSession, sf_dir: str) -> DataFrame:
    """REAL JDBC sink + source round trip (README.md:22's warehouse
    sink) against the embedded Derby engine that ships in Spark's
    classpath: 8 writer partitions each open their own connection and
    pack 500-row INSERT batches (`batchsize` — the Doris/MySQL batch-
    write optimization), then the table is read BACK through a
    partitioned JDBC scan (partitionColumn/num Partitions → 8 parallel
    range queries, the standard trick for parallelizing a warehouse
    extract) and checksummed against the fixture.  Unlike
    sink_jdbc_batch (which models the packing arithmetic), every byte
    here crosses a real JDBC driver both ways."""
    import os as _os
    import tempfile as _tf

    db = _os.path.join(_tf.mkdtemp(prefix="cdc_derby_"), "db")
    url = f"jdbc:derby:{db};create=true"
    drv = "org.apache.derby.jdbc.EmbeddedDriver"
    o = (load_table(spark, "orders", sf_dir)
         .filter(F.col("o_orderstatus") == "F")
         .select("o_orderkey", "o_orderpriority", "o_totalprice"))
    (o.repartition(8, "o_orderkey")
      .write.mode("overwrite")
      .option("driver", drv).option("batchsize", "500")
      .jdbc(url, "orders_sink"))
    lo, hi = o.agg(F.min("o_orderkey"), F.max("o_orderkey")).first()
    back = (spark.read
            .option("driver", drv)
            .jdbc(url, "orders_sink",
                  column="o_orderkey", lowerBound=lo, upperBound=hi + 1,
                  numPartitions=8))
    return (back.groupBy("o_orderpriority")
            .agg(F.count(F.lit(1)).alias("n"),
                 F.sum(F.floor(F.col("o_totalprice") * 100 + F.lit(0.5))
                       .cast("long")).alias("total_cents")))


@register(
    "sink_python_datasource",
    oracle="""
    SELECT o_orderpriority,
           CAST(COUNT(*) AS BIGINT) AS n,
           CAST(SUM(o_orderkey) AS BIGINT) AS key_checksum
    FROM orders WHERE o_orderstatus = 'O'
    GROUP BY 1
    """,
)
def sink_python_datasource(spark: SparkSession, sf_dir: str) -> DataFrame:
    """A user-authored SINK plugin (sources/pysource.py JsonlSinkSource)
    driven through ``df.write.format("cdc_jsonl_sink")``: per-task part
    files + commit messages + a driver-side manifest — the RFC's
    two-phase sink contract in the Python DataSource API.  The proof
    reads back ONLY manifested parts and checksums them against the
    fixture: an aborted or duplicate task attempt can never leak rows
    into the result."""
    import json as _json
    import os as _os
    import tempfile as _tf

    from cdc_plg_spark.sources.pysource import register_python_sources

    register_python_sources(spark)
    out = _tf.mkdtemp(prefix="cdc_jsonl_sink_")
    o = (load_table(spark, "orders", sf_dir)
         .filter(F.col("o_orderstatus") == "O")
         .select("o_orderkey", "o_orderpriority"))
    (o.repartition(8).write.format("cdc_jsonl_sink")
      .option("path", out).mode("append").save())
    with open(_os.path.join(out, "_MANIFEST.json")) as f:
        manifest = _json.load(f)
    files = [_os.path.join(out, m["file"]) for m in manifest]
    back = spark.read.schema("o_orderkey BIGINT, o_orderpriority STRING").json(files)
    return (back.groupBy("o_orderpriority")
            .agg(F.count(F.lit(1)).alias("n"),
                 F.sum("o_orderkey").alias("key_checksum")))
