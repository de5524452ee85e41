"""Interleaved A/B: distinct()-based candidate generation (r13 form,
reconstructed inline) vs first-shared-band exactly-once emission (r14
module code) in screen_against_index — the incremental-screen kernel
under dedup_incremental_vs_index / dedup_incremental_epochs /
stream_dedup_vs_index.

Equivalence first (candidate set + full screen output counts), then
alternating timed runs of the full screen to the noop sink.

Usage: python scripts/ab_screen_r14.py [SF_DIR] [ROUNDS]
"""
from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

SF = sys.argv[1] if len(sys.argv) > 1 else "/root/repo/.soak/sf1"
ROUNDS = int(sys.argv[2]) if len(sys.argv) > 2 else 3

from pyspark.sql import SparkSession  # noqa: E402
from pyspark.sql import functions as F  # noqa: E402
from pyspark.sql import Window  # noqa: E402

spark = (SparkSession.builder.master("local[32]")
         .appName("ab-screen-r14")
         .config("spark.sql.shuffle.partitions", "32")
         .config("spark.sql.adaptive.enabled", "true")
         .config("spark.sql.session.timeZone", "UTC")
         .config("spark.sql.files.maxPartitionBytes", "16m")
         .config("spark.sql.execution.arrow.pyspark.enabled", "true")
         .config("spark.driver.memory", "8g")
         .config("spark.ui.enabled", "false").getOrCreate())
spark.sparkContext.setLogLevel("ERROR")

from cdc_plg_spark.catalog import load_table  # noqa: E402
from cdc_plg_spark.operators.dedup import (  # noqa: E402
    _checked_sig_bands, _shuffle_partition_count, screen_against_index)


def _screen_old(batch_d, hist_sig, hist_bands):
    """r13 form: distinct() over the candidate multiset."""
    sig_b, bands_b = _checked_sig_bands(batch_d)
    n_part = _shuffle_partition_count(batch_d)
    cand = (bands_b.select(F.col("doc_id").alias("batch_id"),
                           "band_idx", "band_hash")
            .repartition(n_part, "band_idx", "band_hash")
            .join(hist_bands.select(F.col("doc_id").alias("hist_id"),
                                    "band_idx", "band_hash"),
                  ["band_idx", "band_hash"])
            .select("batch_id", "hist_id").distinct())
    n_match = F.size(F.filter(
        F.zip_with("sig1", "sig2", lambda a, b: a == b),
        lambda x: x)).cast("long")
    verified = (cand
                .join(sig_b.select(F.col("doc_id").alias("batch_id"),
                                   F.col("sig").alias("sig1")), "batch_id")
                .join(hist_sig.select(F.col("doc_id").alias("hist_id"),
                                      F.col("sig").alias("sig2")), "hist_id")
                .withColumn("n_match", n_match)
                .filter(F.col("n_match") >= 23))
    w = Window.partitionBy("batch_id").orderBy(F.desc("n_match"),
                                               F.asc("hist_id"))
    best = (verified.withColumn("rk", F.row_number().over(w))
            .filter(F.col("rk") == 1)
            .select("batch_id", "hist_id", "n_match"))
    batch_docs = batch_d.select("doc_id")
    return (batch_docs
            .join(best, batch_docs.doc_id == best.batch_id, "left")
            .select("doc_id",
                    F.col("hist_id").isNotNull().alias("is_dup"),
                    F.col("hist_id").alias("matched_doc"),
                    F.col("n_match")))


d = load_table(spark, "documents", SF).select("doc_id", "text")
hist = d.filter(F.col("doc_id") % 10 != 0)
batch = d.filter(F.col("doc_id") % 10 == 0)
hist_sig, hist_bands = _checked_sig_bands(hist)

# equivalence: aggregate signature of the full screen output, both forms
spark.sparkContext.setJobDescription("ab:screen-equiv")
agg = [F.count(F.lit(1)), F.sum(F.col("is_dup").cast("long")),
       F.sum("matched_doc"), F.sum("n_match"),
       F.sum(F.xxhash64("doc_id", "is_dup", "matched_doc", "n_match"))]
a = _screen_old(batch, hist_sig, hist_bands).agg(*agg).collect()[0]
b = screen_against_index(batch, hist_sig, hist_bands).agg(*agg).collect()[0]
print(json.dumps({"old": [str(x) for x in a],
                  "new": [str(x) for x in b]}), flush=True)
assert tuple(a) == tuple(b), "NOT EQUIVALENT"


def run(tag, fn):
    spark.sparkContext.setJobDescription(f"ab:screen:{tag}")
    t0 = time.perf_counter()
    fn(batch, hist_sig, hist_bands).write.format("noop").mode(
        "overwrite").save()
    dt = round(time.perf_counter() - t0, 2)
    print(json.dumps({"form": tag, "sec": dt}), flush=True)
    return dt


run("warm_old", _screen_old)
run("warm_new", screen_against_index)
results = {"old": [], "new": []}
for _ in range(ROUNDS):
    results["old"].append(run("old", _screen_old))
    results["new"].append(run("new", screen_against_index))
print(json.dumps({"sf_dir": SF, "rounds": ROUNDS, **results}))
