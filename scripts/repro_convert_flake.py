"""Repro harness for the r11 `lakehouse_sql_convert_layout` hash flake.

The driver recorded rows_match+schema_match but hash_match=False once;
8 clean re-runs value-matched.  The suspect mechanism is session-job-
history-dependence: `_write_data` range-partitions on (partition cols,
key) via repartitionByRange (lakehouse.py), and RangePartitioner's
sample seed derives from RDD ids — i.e. how many jobs ran before.

This sweep burns a varying number of dummy jobs before EACH stage of
the exhibit (raw dump, CONVERT, REPARTITION, read-back) so the sampled
range boundaries — and therefore the file-boundary layout — differ per
iteration, then value-diffs the read-back against the direct aggregate.
Any mismatch prints the offending groups and exits 1.
"""
import os
import sys
import tempfile

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

from pyspark.sql import SparkSession, functions as F

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.01")


def burn(spark, n, width):
    """Run n dummy jobs to advance the session's RDD-id counter."""
    for i in range(n):
        spark.range(width + i).repartition(3).count()


def main():
    spark = (SparkSession.builder.master("local[8]")
             .config("spark.sql.shuffle.partitions", "8")
             .config("spark.ui.showConsoleProgress", "false")
             .getOrCreate())
    spark.sparkContext.setLogLevel("ERROR")
    from cdc_plg_spark.lakehouse_sql import run_sql
    from cdc_plg_spark.catalog import load_table

    docs = load_table(spark, "documents", SF_DIR) \
        .select("doc_id", "lang", "source", "n_chars")
    expected = {tuple(r[:2]): tuple(r[2:]) for r in
                docs.groupBy("lang", "source")
                .agg(F.count("*").alias("n_docs"),
                     F.sum("n_chars").alias("sum_chars"),
                     F.sum("doc_id").alias("id_checksum"))
                .collect()}

    n_iters = int(os.environ.get("REPRO_ITERS", "24"))
    bad = 0
    for it in range(n_iters):
        burn(spark, it % 7, 10 + it)
        raw = os.path.join(tempfile.mkdtemp(prefix="lh_flake_"), "t")
        docs.repartition(4).write.parquet(raw)
        burn(spark, it % 5, 20 + it)
        run_sql(spark, f"CONVERT TO TXLOG '{raw}' KEY doc_id")
        burn(spark, it % 3, 30 + it)
        run_sql(spark, f"ALTER TXLOG '{raw}' REPARTITION BY (lang) "
                       f"TARGET FILES 4")
        burn(spark, it % 4, 40 + it)
        run_sql(spark, f"CREATE OR REPLACE TEMP VIEW lh_flake_v "
                       f"AS TXLOG '{raw}'")
        got = {tuple(r[:2]): tuple(r[2:]) for r in spark.sql("""
            SELECT lang, source, COUNT(*) AS n_docs,
                   SUM(n_chars) AS sum_chars, SUM(doc_id) AS id_checksum
            FROM lh_flake_v GROUP BY lang, source""").collect()}
        if got != expected:
            bad += 1
            miss = {k: (expected.get(k), got.get(k))
                    for k in set(expected) | set(got)
                    if expected.get(k) != got.get(k)}
            print(f"iter {it}: MISMATCH in {len(miss)} groups: "
                  f"{dict(list(miss.items())[:5])}")
        else:
            print(f"iter {it}: ok ({len(got)} groups)")
    print(f"done: {bad}/{n_iters} mismatched")
    sys.exit(1 if bad else 0)


if __name__ == "__main__":
    main()
