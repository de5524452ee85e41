"""DDL / schema-evolution flow (SURVEY.md §3.2): registry versioning,
as-of schema lookup, mergeSchema reads across versions, and the
controlled streaming restart that replaces the reference's interleaved
EmitDDLEvent (/root/reference/README.md:63)."""

from __future__ import annotations

import os
import shutil
import tempfile
from datetime import datetime, timezone

import pytest
from pyspark.sql import functions as F

from cdc_plg_spark.streaming.schema_registry import (
    evolve_table, read_evolved, register_schema, schema_as_of)


@pytest.fixture()
def tdir():
    d = tempfile.mkdtemp(prefix="cdc_schema_test_")
    yield d
    shutil.rmtree(d, ignore_errors=True)


def _utc(s):
    return datetime.fromisoformat(s).replace(tzinfo=timezone.utc)


V1 = "id BIGINT, name STRING"
V2 = "id BIGINT, name STRING, score DOUBLE"


def test_registry_versions_and_asof(spark, tdir):
    reg = os.path.join(tdir, "reg")
    v1 = register_schema(spark, reg, "t", V1, "2024-01-01 00:00:00")
    v2 = register_schema(spark, reg, "t", V2, "2024-06-01 00:00:00")
    assert (v1, v2) == (1, 2)

    s_early = schema_as_of(spark, reg, "t", "2024-03-01 00:00:00")
    s_late = schema_as_of(spark, reg, "t", "2024-07-01 00:00:00")
    assert [f.name for f in s_early.fields] == ["id", "name"]
    assert [f.name for f in s_late.fields] == ["id", "name", "score"]

    with pytest.raises(KeyError):
        schema_as_of(spark, reg, "t", "2023-01-01 00:00:00")
    with pytest.raises(KeyError):
        schema_as_of(spark, reg, "missing", "2024-07-01 00:00:00")


def test_merge_schema_read_across_versions(spark, tdir):
    b1 = spark.createDataFrame([(1, "a"), (2, "b")], V1)
    b2 = spark.createDataFrame([(3, "c", 0.5)], V2)
    data, reg = evolve_table(spark, tdir, "t", [
        (b1, V1, "2024-01-01 00:00:00"),
        (b2, V2, "2024-06-01 00:00:00"),
    ])
    df = read_evolved(spark, data)
    assert set(df.columns) == {"id", "name", "score"}
    rows = {r["id"]: (r["name"], r["score"]) for r in df.collect()}
    # old-version rows surface the new column as NULL
    assert rows[1] == ("a", None) and rows[3] == ("c", 0.5)


def test_restart_with_new_schema(spark, tdir):
    """Incompatible DDL = controlled restart: stop the stream, register
    the new schema, restart a query reading the evolved layout from the
    SAME checkpoint — committed batches are not reprocessed and new
    columns flow."""
    src = os.path.join(tdir, "src")
    out = os.path.join(tdir, "out")
    ckpt = os.path.join(tdir, "ckpt")
    os.makedirs(src)

    seen = []

    def sink(df, epoch_id):
        seen.append(epoch_id)
        df.write.mode("append").option("mergeSchema", "true").parquet(out)

    def run_stream(schema):
        q = (spark.readStream.schema(schema)
             .option("maxFilesPerTrigger", 1).parquet(src + "/*")
             .writeStream.foreachBatch(sink)
             .option("checkpointLocation", ckpt)
             .option("mergeSchema", "true")
             .trigger(availableNow=True).start())
        q.awaitTermination()

    (spark.createDataFrame([(1, "a")], V1)
     .coalesce(1).write.parquet(os.path.join(src, "b1")))
    run_stream(V1)
    n_after_v1 = len(seen)

    # DDL arrives: new column. Stop/restart with the evolved schema.
    (spark.createDataFrame([(2, "b", 0.7)], V2)
     .coalesce(1).write.parquet(os.path.join(src, "b2")))
    run_stream(V2)

    back = spark.read.option("mergeSchema", "true").parquet(out)
    rows = {r["id"]: r.asDict() for r in back.collect()}
    assert len(rows) == 2, "restart dropped or duplicated data"
    assert rows[1].get("score") is None and rows[2]["score"] == 0.7
    assert len(seen) > n_after_v1, "second run never fired"
