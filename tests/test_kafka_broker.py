"""File-backed Kafka broker sink (pysource.KafkaFileSinkSource):
format-level contract the sink_kafka oracle can't see — ledger offset
math, per-segment sequence contiguity, and required-column validation.
"""

from __future__ import annotations

import json
import os
import tempfile

import pytest
from pyspark.sql import functions as F

from cdc_plg_spark.sources.pysource import register_python_sources


def _write(spark, broker, n=200, parts=4):
    df = spark.range(n).select(
        (F.col("id") % 7).cast("string").alias("key"),
        F.col("id").cast("string").alias("value"),
        (F.col("id") % parts).cast("int").alias("partition"))
    (df.repartition(parts, "partition")
       .sortWithinPartitions("partition", F.col("id"))
       .select("key", "value", "partition")
       .write.format("cdc_kafka_sink").option("path", broker)
       .mode("append").save())


def test_ledger_offsets_and_segment_order(spark):
    register_python_sources(spark)
    broker = tempfile.mkdtemp(prefix="kafka_broker_test_")
    _write(spark, broker)
    with open(os.path.join(broker, "_LEDGER.json")) as f:
        ledger = json.load(f)
    assert set(ledger) == {"0", "1", "2", "3"}
    total = 0
    for p, segs in ledger.items():
        # cumulative base offsets: the broker's append-log index
        base = 0
        for seg in segs:
            assert seg["base_offset"] == base
            path = os.path.join(broker, seg["file"])
            with open(path) as fh:
                recs = [json.loads(line) for line in fh]
            # per-segment producer order: seq is contiguous from 0
            assert [r["seq"] for r in recs] == list(range(seg["n"]))
            # routing landed where the filename says
            assert f"-p{int(p):05d}-" in seg["file"]
            base += seg["n"]
        total += base
    assert total == 200                       # nothing lost or duplicated


def test_sink_rejects_missing_columns(spark):
    register_python_sources(spark)
    broker = tempfile.mkdtemp(prefix="kafka_broker_test_")
    df = spark.range(5).select(F.col("id").cast("string").alias("key"))
    with pytest.raises(Exception, match="cdc_kafka_sink needs"):
        (df.write.format("cdc_kafka_sink").option("path", broker)
           .mode("append").save())
