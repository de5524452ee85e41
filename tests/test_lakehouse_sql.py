"""SQL command surface (cdc_plg_spark/lakehouse_sql.py): grammar,
dispatch fidelity, and the deliberate non-ANSI refusals.

Dispatch fidelity is mostly proven by the oracle-checked exhibits
(operators/lakehouse.py lakehouse_sql_*); these tests pin the parser
itself — every clause variant routes to the right method with the
right arguments, and malformed statements refuse loudly instead of
half-running."""
from __future__ import annotations

import os
import shutil
import tempfile

import pytest
from pyspark.sql import functions as F

from cdc_plg_spark.lakehouse import TxLogTable
from cdc_plg_spark.lakehouse_sql import run_sql


@pytest.fixture()
def tdir():
    d = tempfile.mkdtemp(prefix="lh_sql_test_")
    yield d
    shutil.rmtree(d, ignore_errors=True)


def _seed(spark, n=100):
    (spark.range(0, n)
     .select(F.col("id").alias("user_id"), (F.col("id") * 2).alias("value"))
     .createOrReplaceTempView("sqlt_seed"))


def test_create_merge_read_roundtrip(spark, tdir):
    _seed(spark)
    p = os.path.join(tdir, "t")
    out = run_sql(spark, f"CREATE TXLOG '{p}' KEY user_id N_FILES 4 "
                         f"AS SELECT * FROM sqlt_seed")
    assert out.collect()[0]["version"] == 0
    spark.createDataFrame([(5, 999, "U"), (6, 0, "D")],
                          "user_id long, value long, op string") \
        .createOrReplaceTempView("sqlt_delta")
    run_sql(spark, f"MERGE INTO '{p}' USING sqlt_delta OP COLUMN op")
    run_sql(spark, f"CREATE OR REPLACE TEMP VIEW sqlt_v AS TXLOG '{p}'")
    got = {r["user_id"]: r["value"]
           for r in spark.sql("SELECT * FROM sqlt_v").collect()}
    assert got[5] == 999 and 6 not in got and got[7] == 14


def test_view_version_as_of_time_travel(spark, tdir):
    _seed(spark)
    p = os.path.join(tdir, "t")
    run_sql(spark, f"CREATE TXLOG '{p}' KEY user_id AS "
                   f"SELECT * FROM sqlt_seed")
    spark.createDataFrame([(5, 111)], "user_id long, value long") \
        .createOrReplaceTempView("sqlt_up")
    run_sql(spark, f"MERGE INTO '{p}' USING sqlt_up")
    run_sql(spark, f"CREATE OR REPLACE TEMP VIEW sqlt_v0 AS TXLOG '{p}' "
                   f"VERSION AS OF 0")
    assert spark.table("sqlt_v0").filter("user_id = 5") \
        .collect()[0]["value"] == 10
    # semicolons and case-insensitive keywords parse
    run_sql(spark, f"create or replace temp view sqlt_h as txlog '{p}';")
    assert spark.table("sqlt_h").filter("user_id = 5") \
        .collect()[0]["value"] == 111


def test_txlog_changes_binding(spark, tdir):
    _seed(spark)
    p = os.path.join(tdir, "t")
    run_sql(spark, f"CREATE TXLOG '{p}' KEY user_id AS "
                   f"SELECT * FROM sqlt_seed")
    spark.createDataFrame([(3, 42)], "user_id long, value long") \
        .createOrReplaceTempView("sqlt_ch")
    run_sql(spark, f"MERGE INTO '{p}' USING sqlt_ch")
    run_sql(spark, f"CREATE OR REPLACE TEMP VIEW sqlt_cdf AS TXLOG "
                   f"CHANGES '{p}' FROM 0 TO 1 FULL IMAGES")
    kinds = {r["change_type"]
             for r in spark.table("sqlt_cdf")
             .filter("user_id = 3").collect()}
    assert kinds == {"U_pre", "U_post"}


def test_ansi_merge_when_is_refused_with_pointer(spark, tdir):
    with pytest.raises(ValueError, match="op-column sink-apply"):
        run_sql(spark, "MERGE INTO 't' USING s ON t.k = s.k "
                       "WHEN MATCHED THEN UPDATE SET *")


def test_merge_order_by_and_partial_route_through(spark, tdir):
    _seed(spark)
    p = os.path.join(tdir, "t")
    run_sql(spark, f"CREATE TXLOG '{p}' KEY user_id AS "
                   f"SELECT user_id, value, user_id AS seq "
                   f"FROM sqlt_seed")
    # stale row (seq below target) must lose under ORDER BY seq
    spark.createDataFrame([(5, 999, -1)],
                          "user_id long, value long, seq long") \
        .createOrReplaceTempView("sqlt_stale")
    run_sql(spark, f"MERGE INTO '{p}' USING sqlt_stale ORDER BY seq")
    assert TxLogTable(spark, p).read().filter("user_id = 5") \
        .collect()[0]["value"] == 10
    # PARTIAL: a source missing a column keeps the target value
    spark.createDataFrame([(5, 100)], "user_id long, seq long") \
        .createOrReplaceTempView("sqlt_part")
    run_sql(spark, f"MERGE INTO '{p}' USING sqlt_part ORDER BY seq "
                   f"PARTIAL")
    r = TxLogTable(spark, p).read().filter("user_id = 5").collect()[0]
    assert r["value"] == 10 and r["seq"] == 100


def test_delete_restore_describe(spark, tdir):
    _seed(spark)
    p = os.path.join(tdir, "t")
    run_sql(spark, f"CREATE TXLOG '{p}' KEY user_id AS "
                   f"SELECT * FROM sqlt_seed")
    out = run_sql(spark, f"DELETE FROM '{p}' WHERE KEY BETWEEN 0 AND 9")
    assert out.collect()[0]["version"] == 1
    assert TxLogTable(spark, p).read().count() == 90
    run_sql(spark, f"RESTORE '{p}' VERSION AS OF 0")
    assert TxLogTable(spark, p).read().count() == 100
    det = run_sql(spark, f"DESCRIBE DETAIL '{p}'").collect()[0]
    assert det["version"] == 2
    hist = run_sql(spark, f"DESCRIBE HISTORY '{p}'").collect()
    assert [h["op"] for h in hist][:3] == ["CREATE", "DELETE", "RESTORE"]


def test_delete_mode_dv(spark, tdir):
    _seed(spark)
    p = os.path.join(tdir, "t")
    run_sql(spark, f"CREATE TXLOG '{p}' KEY user_id AS "
                   f"SELECT * FROM sqlt_seed")
    run_sql(spark, f"DELETE FROM '{p}' WHERE KEY BETWEEN 10 AND 19 "
                   f"MODE DV")
    snap = TxLogTable(spark, p).snapshot()
    assert any(s.get("dv") for s in snap.files.values()), \
        "MODE DV must route to deletion vectors, not COW"
    assert TxLogTable(spark, p).read().count() == 90


def test_clone_shallow_and_deep(spark, tdir):
    _seed(spark)
    p = os.path.join(tdir, "src")
    run_sql(spark, f"CREATE TXLOG '{p}' KEY user_id AS "
                   f"SELECT * FROM sqlt_seed")
    d1, d2 = os.path.join(tdir, "sh"), os.path.join(tdir, "dp")
    run_sql(spark, f"CLONE '{p}' TO '{d1}'")
    run_sql(spark, f"CLONE '{p}' TO '{d2}' DEEP")
    assert TxLogTable(spark, d1).read().count() == 100
    assert TxLogTable(spark, d2).read().count() == 100
    # deep clone owns its bytes: data dir non-empty; shallow's is not
    assert os.listdir(os.path.join(d2, "data"))


def test_optimize_vacuum_stamp_fsck_grammar(spark, tdir):
    _seed(spark)
    p = os.path.join(tdir, "t")
    run_sql(spark, f"CREATE TXLOG '{p}' KEY user_id N_FILES 6 AS "
                   f"SELECT * FROM sqlt_seed")
    out = run_sql(spark, f"OPTIMIZE '{p}'").collect()[0]
    assert out["files_compacted"] >= 2
    st = run_sql(spark, f"STAMP HASHES '{p}'").collect()[0]
    assert st["files_stamped"] >= 1 and not st["skipped"]
    assert run_sql(spark, f"FSCK '{p}' DEEP VERIFY HASHES").count() == 0
    dry = run_sql(spark, f"VACUUM '{p}' RETAIN 1 VERSIONS "
                         f"MIN AGE 0 SECONDS DRY RUN").collect()[0]
    assert dry["would_remove"] >= 1
    real = run_sql(spark, f"VACUUM '{p}' RETAIN 1 VERSIONS "
                          f"MIN AGE 0 SECONDS").collect()[0]
    assert real["data_files_removed"] >= 1
    assert TxLogTable(spark, p).read().count() == 100


def test_unrecognized_and_malformed_statements_refuse(spark):
    with pytest.raises(ValueError, match="unrecognized"):
        run_sql(spark, "DROP TABLE 'x'")
    with pytest.raises(ValueError, match="unrecognized"):
        run_sql(spark, "OPTIMIZE unquoted_path")
    with pytest.raises(ValueError, match="unrecognized"):
        # injection-shaped view name must not reach spark.table
        run_sql(spark, "MERGE INTO '/x' USING v; DROP TABLE y")


def test_convert_to_txlog_sql_adopts_by_reference(spark, tdir):
    _seed(spark)
    raw = os.path.join(tdir, "raw")
    spark.table("sqlt_seed").repartition(3).write.parquet(raw)
    before = {f for f in os.listdir(raw) if f.endswith(".parquet")}
    out = run_sql(spark,
                  f"CONVERT TO TXLOG '{raw}' KEY user_id").collect()[0]
    assert out["version"] == 0 and out["num_files"] == len(before)
    # adopt-by-reference: the data files on disk are untouched
    after = {f for f in os.listdir(raw) if f.endswith(".parquet")}
    assert after == before
    run_sql(spark, f"CREATE OR REPLACE TEMP VIEW sqlt_cv AS TXLOG "
                   f"'{raw}'")
    got = {r["user_id"]: r["value"]
           for r in spark.table("sqlt_cv").collect()}
    assert len(got) == 100 and got[7] == 14


def test_convert_partitioned_by_clause(spark, tdir):
    _seed(spark)
    raw = os.path.join(tdir, "rawp")
    (spark.table("sqlt_seed")
     .withColumn("bucket", F.col("user_id") % 4)
     .write.partitionBy("bucket").parquet(raw))
    out = run_sql(spark, f"CONVERT TO TXLOG '{raw}' KEY user_id "
                         f"PARTITIONED BY (bucket long)").collect()[0]
    assert out["version"] == 0
    t = TxLogTable(spark, raw)
    assert t.read().count() == 100
    det = run_sql(spark, f"DESCRIBE DETAIL '{raw}'").collect()[0]
    assert "bucket" in str(det["partition_by"])


def test_alter_repartition_roundtrip(spark, tdir):
    _seed(spark)
    p = os.path.join(tdir, "t")
    run_sql(spark, f"CREATE TXLOG '{p}' KEY user_id N_FILES 4 AS "
                   f"SELECT user_id, value, user_id % 3 AS grp "
                   f"FROM sqlt_seed")
    want = {r["user_id"]: (r["value"], r["grp"])
            for r in TxLogTable(spark, p).read().collect()}
    out = run_sql(spark, f"ALTER TXLOG '{p}' REPARTITION BY (grp) "
                         f"TARGET FILES 2").collect()[0]
    assert out["version"] == 1 and not out["skipped"]
    det = run_sql(spark, f"DESCRIBE DETAIL '{p}'").collect()[0]
    assert "grp" in str(det["partition_by"])
    got = {r["user_id"]: (r["value"], r["grp"])
           for r in TxLogTable(spark, p).read().collect()}
    assert got == want, "layout transaction must not change content"
    # and back to unpartitioned
    out2 = run_sql(spark,
                   f"ALTER TXLOG '{p}' REPARTITION NONE").collect()[0]
    assert out2["version"] == 2
    det2 = run_sql(spark, f"DESCRIBE DETAIL '{p}'").collect()[0]
    assert det2["partition_by"] is None
    got2 = {r["user_id"]: (r["value"], r["grp"])
            for r in TxLogTable(spark, p).read().collect()}
    assert got2 == want
    # NONE again is a no-op commit-wise
    assert run_sql(spark, f"ALTER TXLOG '{p}' REPARTITION NONE") \
        .collect()[0]["skipped"]


def test_alter_repartition_rejects_bad_column(spark, tdir):
    _seed(spark)
    p = os.path.join(tdir, "t")
    run_sql(spark, f"CREATE TXLOG '{p}' KEY user_id AS "
                   f"SELECT * FROM sqlt_seed")
    with pytest.raises(ValueError, match="not in"):
        run_sql(spark, f"ALTER TXLOG '{p}' REPARTITION BY (nope)")
    with pytest.raises(ValueError, match="key column"):
        run_sql(spark, f"ALTER TXLOG '{p}' REPARTITION BY (user_id)")


def test_convert_repartition_malformed_refuse(spark):
    with pytest.raises(ValueError, match="unrecognized"):
        run_sql(spark, "CONVERT TO TXLOG '/x'")  # KEY required
    with pytest.raises(ValueError, match="unrecognized"):
        run_sql(spark, "CONVERT TO TXLOG '/x' KEY k "
                       "PARTITIONED BY (dt)")  # type required
    with pytest.raises(ValueError, match="unrecognized"):
        run_sql(spark, "ALTER TXLOG '/x' REPARTITION")  # BY|NONE required


def test_restore_requires_version_or_timestamp_clause(spark, tdir):
    """Bare RESTORE '<path>' used to pass the grammar and die inside
    TxLogTable.restore with a Python-API ValueError; the clause is now
    mandatory so the failure is the grammar error with the module
    pointer (ADVICE r11)."""
    _seed(spark)
    p = os.path.join(tdir, "t")
    run_sql(spark, f"CREATE TXLOG '{p}' KEY user_id AS "
                   f"SELECT * FROM sqlt_seed")
    with pytest.raises(ValueError, match="unrecognized"):
        run_sql(spark, f"RESTORE '{p}'")
    # with the clause both forms still route
    spark.createDataFrame([(5, 111)], "user_id long, value long") \
        .createOrReplaceTempView("sqlt_r_up")
    run_sql(spark, f"MERGE INTO '{p}' USING sqlt_r_up")
    out = run_sql(spark, f"RESTORE '{p}' VERSION AS OF 0").collect()[0]
    assert not out["skipped"] and out["files_restored"] == 1


def test_whitespace_preserved_inside_quoted_literals(spark, tdir):
    """Statement normalization must not rewrite quoted regions: a
    doubled space inside a string literal or a path is DATA, not
    formatting (ADVICE r11 — `' '.join(split())` collapsed both)."""
    p = os.path.join(tdir, "a  b", "t")  # path with two spaces
    run_sql(spark, f"CREATE   TXLOG '{p}'   KEY k AS "
                   f"SELECT 1 AS k, 'x  y' AS s")
    run_sql(spark, f"CREATE OR REPLACE TEMP VIEW sqlt_ws AS TXLOG '{p}'")
    row = spark.sql("SELECT * FROM sqlt_ws").collect()[0]
    assert row["s"] == "x  y"          # literal survived verbatim
    assert os.path.isdir(p)            # path survived verbatim


def test_verify_clauses_route_to_layout_gate(spark, tdir):
    """`ALTER ... REPARTITION ... NO VERIFY` opts OUT of the default
    content-untouched publish gate; `OPTIMIZE ... VERIFY` opts IN
    (r12 — the SQL surface of lakehouse.py's _verify_layout_rewrite).
    Routing proven by corrupting the rewrite below the gate: with the
    gate on the commit refuses; with NO VERIFY the corruption lands
    (which is exactly what opting out means)."""
    from cdc_plg_spark.lakehouse import LayoutInvariantViolation

    _seed(spark)
    p = os.path.join(tdir, "t")
    run_sql(spark, f"CREATE TXLOG '{p}' KEY user_id N_FILES 3 AS "
                   f"SELECT *, concat('c', user_id % 4) AS cat "
                   f"FROM sqlt_seed")
    t = TxLogTable(spark, p)
    orig = t.__class__._write_data

    def bad(self, df, key_col, n_files=None, cluster_expr=None, **kw):
        return orig(self, df.filter(F.col("user_id") != 7), key_col,
                    n_files, cluster_expr, **kw)

    t.__class__._write_data = bad
    try:
        # default (gate ON): refused
        with pytest.raises(LayoutInvariantViolation, match="REPARTITION"):
            run_sql(spark, f"ALTER TXLOG '{p}' REPARTITION BY (cat)")
        # OPTIMIZE VERIFY: gate ON, refused
        with pytest.raises(LayoutInvariantViolation, match="OPTIMIZE"):
            run_sql(spark, f"OPTIMIZE '{p}' VERIFY")
        # NO VERIFY: the corrupt rewrite publishes — the opt-out
        run_sql(spark, f"ALTER TXLOG '{p}' REPARTITION BY (cat) "
                       f"TARGET FILES 3 NO VERIFY")
    finally:
        t.__class__._write_data = orig
    got = {r["user_id"] for r in TxLogTable(spark, p).read().collect()}
    assert 7 not in got and len(got) == 99
