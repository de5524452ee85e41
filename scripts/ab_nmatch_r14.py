"""Interleaved A/B: HOF n_match (size(filter(zip_with(sig1,sig2,==))))
vs an unrolled fixed-k chain of scalar element_at compares, on the full
checked-LSH dataflow (the verify stage runs once per candidate pair —
~80 M rows x 32-element HOF at sf1).  Integer count, so equivalence is
order-free; checked in-plan via SUM(old != new) == 0 before timing.

Usage: python scripts/ab_nmatch_r14.py [SF_DIR] [ROUNDS]
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

spark = (SparkSession.builder.master("local[32]")
         .appName("ab-nmatch-r14")
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
    _MINHASH_K, _checked_sig_bands, _lsh_pair_ids)

HOF = F.size(F.filter(F.zip_with("sig1", "sig2", lambda a, b: a == b),
                      lambda x: x)).cast("long")
unr = F.lit(0)
for i in range(_MINHASH_K):
    unr = unr + F.when(F.element_at("sig1", i + 1)
                       == F.element_at("sig2", i + 1), 1).otherwise(0)
UNROLLED = unr.cast("long")


def pairs_df():
    d = load_table(spark, "documents", SF)
    sig, bands = _checked_sig_bands(d)
    return (_lsh_pair_ids(bands)
            .join(sig.select(F.col("doc_id").alias("doc1"),
                             F.col("sig").alias("sig1")), "doc1")
            .join(sig.select(F.col("doc_id").alias("doc2"),
                             F.col("sig").alias("sig2")), "doc2"))


# equivalence: one pass computing both, any disagreement counts
spark.sparkContext.setJobDescription("ab:nmatch-equiv")
bad = (pairs_df().select((HOF != UNROLLED).cast("int").alias("ne"))
       .agg(F.sum("ne")).collect()[0][0])
print(json.dumps({"disagreements": int(bad or 0)}), flush=True)
assert not bad, "NOT EQUIVALENT"


def run(tag, col):
    spark.sparkContext.setJobDescription(f"ab:nmatch:{tag}")
    t0 = time.perf_counter()
    (pairs_df().withColumn("n_match", col)
     .filter(F.col("n_match") >= 23)
     .select("doc1", "doc2", "n_match")
     .write.format("noop").mode("overwrite").save())
    dt = round(time.perf_counter() - t0, 2)
    print(json.dumps({"form": tag, "sec": dt}), flush=True)
    return dt


run("warm_hof", HOF)
run("warm_unrolled", UNROLLED)
results = {"hof": [], "unrolled": []}
for _ in range(ROUNDS):
    results["hof"].append(run("hof", HOF))
    results["unrolled"].append(run("unrolled", UNROLLED))
print(json.dumps({"sf_dir": SF, "rounds": ROUNDS, **results}))
