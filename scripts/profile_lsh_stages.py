"""Stage breakdown for the dedup_fuzzy_minhash_checked pipeline
(r13 optimization round, guide §1: measure first).

Times each prefix of the pipeline to a noop sink so the incremental
cost of every stage is visible:
  sig        — md5-token-hash + 32-permutation MinHash signature
  bands      — sig + band-hash explode (8 rows/doc)
  pair_ids   — bands + salted bucket self-join + distinct
  full       — pair_ids + sig1/sig2 attach joins + n_match filter

Run: python scripts/profile_lsh_stages.py [n_runs]
"""
from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
CPUS = os.environ.get("SPARK_GRAFT_CPUS", "32")


def main() -> None:
    n_runs = int(sys.argv[1]) if len(sys.argv) > 1 else 2
    from pyspark.sql import SparkSession
    from pyspark.sql import functions as F

    spark = (SparkSession.builder.master(f"local[{CPUS}]")
             .appName("lsh-stage-profile")
             .config("spark.sql.shuffle.partitions", CPUS)
             .config("spark.sql.adaptive.enabled", "true")
             .config("spark.sql.adaptive.coalescePartitions.enabled", "true")
             .config("spark.sql.session.timeZone", "UTC")
             .config("spark.sql.execution.arrow.pyspark.enabled", "true")
             .config("spark.ui.enabled", "false")
             .getOrCreate())
    spark.sparkContext.setLogLevel("ERROR")

    from cdc_plg_spark.catalog import load_table
    from cdc_plg_spark.operators.dedup import (
        _checked_sig_bands, _lsh_pair_ids)

    d = load_table(spark, "documents", SF_DIR).select("doc_id", "text")

    def noop(df):
        df.write.format("noop").mode("overwrite").save()

    def build(stage: str):
        sig, bands = _checked_sig_bands(d)
        if stage == "sig":
            return sig
        if stage == "bands":
            return bands
        pair_ids = _lsh_pair_ids(bands)
        if stage == "pair_ids":
            return pair_ids
        pairs = (pair_ids
                 .join(sig.select(F.col("doc_id").alias("doc1"),
                                  F.col("sig").alias("sig1")), "doc1")
                 .join(sig.select(F.col("doc_id").alias("doc2"),
                                  F.col("sig").alias("sig2")), "doc2"))
        n_match = F.size(F.filter(
            F.zip_with("sig1", "sig2", lambda a, b: a == b), lambda x: x))
        return (pairs.withColumn("n_match", n_match.cast("long"))
                .filter(F.col("n_match") >= 23)
                .select("doc1", "doc2", "n_match"))

    # warm the JVM on the cheapest stage
    spark.sparkContext.setJobDescription("warm")
    noop(build("sig"))

    out = {}
    for stage in ("sig", "bands", "pair_ids", "full"):
        times = []
        for _ in range(n_runs):
            spark.sparkContext.setJobDescription(f"lsh:{stage}")
            t0 = time.perf_counter()
            noop(build(stage))
            times.append(round(time.perf_counter() - t0, 3))
        out[stage] = times
        print(stage, times, flush=True)
    # row counts for context (one extra run each)
    out["counts"] = {
        "docs": d.count(),
        "pair_ids": build("pair_ids").count(),
        "full": build("full").count(),
    }
    print(json.dumps(out))
    spark.stop()


if __name__ == "__main__":
    main()
