"""Phase profile of the two ANN exhibits (VERDICT r13 task 5): where do
sim_ann_ivf's ~18 s and sim_ann_pq's ~22 s cold actually go?  Times the
index-build phases (seeding / Lloyd / PQ training) separately from the
full-query wall so the optimization targets the real cost, per guide §1.

Usage: python scripts/profile_ann_r14.py [SF_DIR]
"""
from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

SF = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.1"

from pyspark.sql import SparkSession  # noqa: E402
from pyspark.sql import functions as F  # noqa: E402

spark = (SparkSession.builder.master("local[32]")
         .appName("profile-ann-r14")
         .config("spark.sql.shuffle.partitions", "32")
         .config("spark.sql.adaptive.enabled", "true")
         .config("spark.sql.session.timeZone", "UTC")
         .config("spark.sql.execution.arrow.pyspark.enabled", "true")
         .config("spark.driver.memory", "8g")
         .config("spark.ui.enabled", "false").getOrCreate())
spark.sparkContext.setLogLevel("ERROR")

from cdc_plg_spark import registry  # noqa: E402
from cdc_plg_spark.catalog import load_table  # noqa: E402
from cdc_plg_spark.operators.similarity import (  # noqa: E402
    _train_ivf_centroids)

entries = registry.all_entries()
out: dict = {"sf_dir": SF}


def t(label, fn):
    spark.sparkContext.setJobDescription(f"profile:{label}")
    t0 = time.perf_counter()
    r = fn()
    out[label] = round(time.perf_counter() - t0, 2)
    print(json.dumps({label: out[label]}), flush=True)
    return r


# warm the JVM + footers
load_table(spark, "embeddings", SF).count()

# --- sim_ann_ivf phases
e = load_table(spark, "embeddings", SF)
corpus = e.filter(F.col("vec_id") >= 10)
t("ivf_train", lambda: _train_ivf_centroids(corpus))
t("ivf_full_cold", lambda: entries["sim_ann_ivf"].fn(spark, SF)
  .write.format("noop").mode("overwrite").save())
t("ivf_full_warm", lambda: entries["sim_ann_ivf"].fn(spark, SF)
  .write.format("noop").mode("overwrite").save())

# --- sim_ann_pq phases
from cdc_plg_spark.operators.similarity import (  # noqa: E402
    _pq_train, unit_col)
import numpy as np  # noqa: E402

corpus_pq = e.filter(F.col("vec_id") >= 10).select(
    F.col("vec_id").alias("corpus_id"), unit_col("embedding").alias("ce"))
n = t("pq_count", lambda: corpus_pq.count())
cap = 2048
take = max(1, (n + cap - 1) // cap)
sample = t("pq_sample_collect", lambda: (
    corpus_pq.filter(F.pmod(F.xxhash64("corpus_id"), take) == 0)
    .orderBy("corpus_id").select("ce").collect()))
X = np.stack([r.ce for r in sample]).astype(np.float64)
t("pq_train", lambda: _pq_train(X))
t("pq_full_cold", lambda: entries["sim_ann_pq"].fn(spark, SF)
  .write.format("noop").mode("overwrite").save())
t("pq_full_warm", lambda: entries["sim_ann_pq"].fn(spark, SF)
  .write.format("noop").mode("overwrite").save())

print(json.dumps(out))
