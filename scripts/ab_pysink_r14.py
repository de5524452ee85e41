"""Interleaved A/B: row-iterator Python sink writers (r13 form,
reconstructed inline) vs the Arrow-batched writers now in
sources/pysource.py — isolates the WRITE stage of sink_kafka and
sink_python_datasource (guide §4: the JVM->Python row boundary).

Each run writes the same prepared DataFrame through one sink class to a
fresh temp dir (removed afterwards); forms alternate old/new within one
session.  Output equivalence is checked once per sink: the read-back
aggregate (the registered query's own proof shape) must be identical
between forms.

Usage: python scripts/ab_pysink_r14.py [SF_DIR] [ROUNDS]
"""
from __future__ import annotations

import json
import os
import shutil
import sys
import tempfile
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

SF = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.1"
ROUNDS = int(sys.argv[2]) if len(sys.argv) > 2 else 3

from pyspark.sql import SparkSession  # noqa: E402
from pyspark.sql import functions as F  # noqa: E402
from pyspark.sql.datasource import (  # noqa: E402
    DataSource, DataSourceWriter)

spark = (SparkSession.builder.master("local[32]")
         .appName("ab-pysink-r14")
         .config("spark.sql.shuffle.partitions", "32")
         .config("spark.sql.session.timeZone", "UTC")
         .config("spark.sql.execution.arrow.pyspark.enabled", "true")
         .config("spark.driver.memory", "8g")
         .config("spark.ui.enabled", "false").getOrCreate())
spark.sparkContext.setLogLevel("ERROR")

from cdc_plg_spark.catalog import load_table  # noqa: E402
from cdc_plg_spark.sources.pysource import (  # noqa: E402
    _Part, _Segments, register_python_sources)

register_python_sources(spark)


# ---- the r13 ROW-based writers, verbatim, under *_old source names
class _OldKafkaWriter(DataSourceWriter):
    def __init__(self, path):
        self.path = path

    def write(self, iterator):
        import json as _json
        import os as _os
        import uuid as _uuid

        _os.makedirs(self.path, exist_ok=True)
        tid = _uuid.uuid4().hex
        handles: dict = {}
        counts: dict = {}
        for row in iterator:
            p = int(row["partition"])
            if p not in handles:
                fname = f"segment-p{p:05d}-{tid}.jsonl"
                handles[p] = (fname, open(
                    _os.path.join(self.path, fname), "w"))
                counts[p] = 0
            f = handles[p][1]
            f.write(_json.dumps({"seq": counts[p], "key": row["key"],
                                 "value": row["value"]}) + "\n")
            counts[p] += 1
        for p, (_, f) in handles.items():
            f.close()
        return _Segments(segments=[(p, fname, counts[p])
                                   for p, (fname, _) in
                                   sorted(handles.items())])

    def commit(self, messages) -> None:
        pass  # ledger not needed for the write-stage A/B

    def abort(self, messages) -> None:
        pass


class _OldKafkaSink(DataSource):
    @classmethod
    def name(cls):
        return "cdc_kafka_sink_old"

    def writer(self, schema, overwrite):
        return _OldKafkaWriter(self.options["path"])


class _OldJsonlWriter(DataSourceWriter):
    def __init__(self, path, columns):
        self.path, self.columns = path, columns

    def write(self, iterator):
        import json as _json
        import os as _os
        import uuid as _uuid

        _os.makedirs(self.path, exist_ok=True)
        name = f"part-{_uuid.uuid4().hex}.jsonl"
        n = 0
        with open(_os.path.join(self.path, name), "w") as f:
            for row in iterator:
                f.write(_json.dumps(
                    {c: row[c] for c in self.columns},
                    default=str) + "\n")
                n += 1
        return _Part(filename=name, n_rows=n)

    def commit(self, messages) -> None:
        pass

    def abort(self, messages) -> None:
        pass


class _OldJsonlSink(DataSource):
    @classmethod
    def name(cls):
        return "cdc_jsonl_sink_old"

    def writer(self, schema, overwrite):
        return _OldJsonlWriter(self.options["path"],
                               [f.name for f in schema])


spark.dataSource.register(_OldKafkaSink)
spark.dataSource.register(_OldJsonlSink)

# ---- prepared inputs (the registered queries' own producer shapes)
ev = load_table(spark, "events", SF)
key = (F.col("user_id") % 16).cast("string")
part = F.pmod(F.conv(F.substring(F.md5(key), 1, 15), 16, 10)
              .cast("long"), F.lit(8)).cast("int")
kafka_records = (ev.select(key.alias("key"),
                           F.to_json(F.struct("event_id", "user_id",
                                              "event_type")).alias("value"),
                           part.alias("partition"), "event_id")
                 .repartition(8, "partition")
                 .sortWithinPartitions("partition", "event_id")
                 .select("key", "value", "partition"))
jsonl_records = (load_table(spark, "orders", SF)
                 .filter(F.col("o_orderstatus") == "O")
                 .select("o_orderkey", "o_orderpriority")
                 .repartition(8))


def run(fmt: str, df) -> tuple[float, str]:
    out = tempfile.mkdtemp(prefix=f"ab_{fmt}_")
    spark.sparkContext.setJobDescription(f"ab:{fmt}")
    t0 = time.perf_counter()
    df.write.format(fmt).option("path", out).mode("append").save()
    return round(time.perf_counter() - t0, 2), out


def agg_lines(out: str, schema: str, exprs) -> list:
    files = [os.path.join(out, f) for f in os.listdir(out)
             if f.endswith(".jsonl")]
    return spark.read.schema(schema).json(files).agg(*exprs).collect()


# ---- equivalence once per sink (aggregate over written lines)
for tag, old_fmt, new_fmt, df, schema, exprs in (
    ("kafka", "cdc_kafka_sink_old", "cdc_kafka_sink", kafka_records,
     "seq BIGINT, key STRING, value STRING",
     [F.count(F.lit(1)), F.sum("seq"),
      F.sum(F.xxhash64("key", "value"))]),
    ("jsonl", "cdc_jsonl_sink_old", "cdc_jsonl_sink", jsonl_records,
     "o_orderkey BIGINT, o_orderpriority STRING",
     [F.count(F.lit(1)), F.sum("o_orderkey"),
      F.sum(F.xxhash64("o_orderpriority"))]),
):
    _, o_old = run(old_fmt, df)
    _, o_new = run(new_fmt, df)
    a = agg_lines(o_old, schema, exprs)
    b = agg_lines(o_new, schema, exprs)
    assert a == b, (tag, a, b)
    print(json.dumps({f"{tag}_equiv": str(a[0].asDict(True))}), flush=True)
    shutil.rmtree(o_old, ignore_errors=True)
    shutil.rmtree(o_new, ignore_errors=True)

# ---- interleaved timing
results: dict = {}
for tag, old_fmt, new_fmt, df in (
        ("kafka", "cdc_kafka_sink_old", "cdc_kafka_sink", kafka_records),
        ("jsonl", "cdc_jsonl_sink_old", "cdc_jsonl_sink", jsonl_records)):
    r = {"old": [], "new": []}
    for _ in range(ROUNDS):
        dt, out = run(old_fmt, df)
        r["old"].append(dt)
        shutil.rmtree(out, ignore_errors=True)
        dt, out = run(new_fmt, df)
        r["new"].append(dt)
        shutil.rmtree(out, ignore_errors=True)
    results[tag] = r
    print(json.dumps({tag: r}), flush=True)
print(json.dumps({"sf_dir": SF, "rounds": ROUNDS, **results}))
