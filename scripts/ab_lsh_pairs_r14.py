"""Interleaved same-session A/B: distinct-based pair emission (r13
form) vs first-shared-band exactly-once emission (r14 form) of the LSH
candidate pipeline, on one fixture dir — the measurement VERDICT r13
task 1 prescribes.

Both forms run the FULL dedup_fuzzy_minhash_checked dataflow (sig →
bands → pair ids → sig join → n_match filter) to the noop sink; the
old form is reconstructed inline (the trailing distinct over the pair
multiset, no first-shared-band filter) against the same `bands` frame
the new module code builds, so the upstream plan is identical and the
delta isolates the pair-emission change.  Rounds alternate
old/new/old/new... so host drift cannot masquerade as a win either way.

Also verifies (once, before timing): new candidate-set count ==
distinct count == old distinct count, and symmetric difference == 0.

Usage: python scripts/ab_lsh_pairs_r14.py [SF_DIR] [ROUNDS]
"""
from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

from pyspark.sql import SparkSession
from pyspark.sql import functions as F

SF = sys.argv[1] if len(sys.argv) > 1 else "/root/repo/.soak/sf1"
ROUNDS = int(sys.argv[2]) if len(sys.argv) > 2 else 3

spark = (SparkSession.builder.master("local[32]")
         .appName("ab-lsh-pairs-r14")
         .config("spark.sql.shuffle.partitions", "32")
         .config("spark.sql.adaptive.enabled", "true")
         .config("spark.sql.adaptive.coalescePartitions.enabled", "true")
         .config("spark.sql.session.timeZone", "UTC")
         .config("spark.sql.files.maxPartitionBytes", "16m")
         .config("spark.sql.execution.arrow.pyspark.enabled", "true")
         .config("spark.driver.memory", "8g")
         .config("spark.ui.enabled", "false").getOrCreate())
spark.sparkContext.setLogLevel("ERROR")

from cdc_plg_spark.catalog import load_table  # noqa: E402
from cdc_plg_spark.operators.dedup import (  # noqa: E402
    _checked_sig_bands, _lsh_pair_ids, _shuffle_partition_count,
    _LSH_BUCKET_CAP)
from pyspark.sql import Window  # noqa: E402


def _old_pair_ids(bands, cap=_LSH_BUCKET_CAP):
    """The r13 form: salted triangle join + trailing distinct over the
    pair multiset (verbatim reconstruction, minus the bhs column the
    r14 bands frame carries — select-pruned so the upstream plan
    matches what r13 executed)."""
    wb = Window.partitionBy("band_idx", "band_hash")
    b2 = (bands.withColumn("_bsize", F.count(F.lit(1)).over(wb))
          .withColumn("_G", F.ceil(F.col("_bsize") / F.lit(cap)).cast("int"))
          .withColumn("_s", F.pmod(F.xxhash64("doc_id"),
                                   F.col("_G")).cast("int")))
    left = b2.select(F.col("doc_id").alias("da"),
                     "band_idx", "band_hash",
                     F.col("_s").alias("_i"),
                     F.explode(F.sequence("_s", F.col("_G") - 1)).alias("_j"))
    right = b2.select(F.col("doc_id").alias("db"),
                      "band_idx", "band_hash",
                      F.explode(F.sequence(F.lit(0), "_s")).alias("_i"),
                      F.col("_s").alias("_j"))
    n_part = _shuffle_partition_count(bands)
    left = left.repartition(n_part, "band_idx", "band_hash", "_i", "_j")
    return (left.join(right, ["band_idx", "band_hash", "_i", "_j"])
            .filter(F.col("da") != F.col("db"))
            .select(F.least("da", "db").alias("doc1"),
                    F.greatest("da", "db").alias("doc2"))
            .distinct())


def _full(pair_fn):
    d = load_table(spark, "documents", SF)
    sig, bands = _checked_sig_bands(d)
    pair_ids = pair_fn(bands)
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


def run(tag, pair_fn):
    spark.sparkContext.setJobDescription(f"ab:{tag}")
    t0 = time.perf_counter()
    _full(pair_fn).write.format("noop").mode("overwrite").save()
    dt = round(time.perf_counter() - t0, 2)
    print(json.dumps({"form": tag, "sec": dt}), flush=True)
    return dt


# ---- equivalence gate, once, before timing.  EQUIV=full computes the
# symmetric difference too (use at sf<=0.1); EQUIV=counts checks
# new count == new distinct count == old count (the exactly-once and
# same-cardinality claims) — at sf1 the exceptAll over ~80M pairs costs
# more than the A/B itself and the set equality is already pinned at
# two smaller SFs with identical code.
EQUIV = os.environ.get("EQUIV", "full")
d = load_table(spark, "documents", SF)
_, bands = _checked_sig_bands(d)
spark.sparkContext.setJobDescription("ab:equivalence")
if EQUIV == "full":
    new_ids = _lsh_pair_ids(bands).localCheckpoint(eager=True)
    n_new = new_ids.count()
    n_new_distinct = new_ids.distinct().count()
    old_ids = _old_pair_ids(bands).localCheckpoint(eager=True)
    n_old = old_ids.count()
    sym = (new_ids.exceptAll(old_ids).count()
           + old_ids.exceptAll(new_ids).count())
    del new_ids, old_ids
    spark.catalog.clearCache()
else:
    # lazy plans straight to count() — no 80M-row localCheckpoint
    # competing with execution memory at sf1
    n_new = _lsh_pair_ids(bands).count()
    n_new_distinct = _lsh_pair_ids(bands).distinct().count()
    n_old = _old_pair_ids(bands).count()
    sym = None
print(json.dumps({"new_count": n_new, "new_distinct": n_new_distinct,
                  "old_count": n_old, "sym_diff": sym}), flush=True)
assert n_new == n_new_distinct == n_old and not sym, "NOT EQUIVALENT"

# ---- interleaved timing: warm both once, then alternate
run("warm_old", _old_pair_ids)
run("warm_new", _lsh_pair_ids)
results = {"old": [], "new": []}
for _ in range(ROUNDS):
    results["old"].append(run("old", _old_pair_ids))
    results["new"].append(run("new", _lsh_pair_ids))
print(json.dumps({"sf_dir": SF, "rounds": ROUNDS, **results}))
