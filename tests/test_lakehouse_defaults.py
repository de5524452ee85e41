"""ALTER TABLE ADD COLUMN [DEFAULT expr] — column defaults as a pure
meta commit (the public Delta `allowColumnDefaults` semantic).

Contract under test:
- add_column is METADATA-ONLY (file set untouched); rows already on
  disk read NULL for the new column (their files predate it — no
  read-path rewrite, no reader-floor bump);
- every subsequent ingest that OMITS the column materializes the
  DEFAULT (cast to the declared type); a supplied column always wins,
  including explicit NULLs (presence-based, like partial merge);
- a FULL merge source omitting the column errors loudly (Delta
  applies defaults to INSERT actions only — silent completion would
  overwrite matched rows' stored values, ADVICE r8); a PARTIAL merge
  defaults only INSERT rows and keeps target values on matched rows;
- defaults must be CONSTANT deterministic expressions (column refs,
  random and current-time calls refused at declaration);
- rename re-keys the default, drop removes it, RESTORE rewinds the
  map with the schema, checkpoints replay it;
- declaring a default raises the writer floor to 2 (a v1 writer
  would land NULL where the contract says the default).
"""

from __future__ import annotations

import os
import shutil
import tempfile

import pytest
from pyspark.sql import functions as F

import cdc_plg_spark.lakehouse as lh
from cdc_plg_spark.lakehouse import TxLogTable, UnsupportedProtocolError


@pytest.fixture()
def tdir():
    d = tempfile.mkdtemp(prefix="txlog_defaults_")
    yield d
    shutil.rmtree(d, ignore_errors=True)


def mk(spark, path, n=40):
    df = spark.range(0, n).select(
        F.col("id").alias("k"), (F.col("id") * 2).alias("v"))
    return TxLogTable.create(spark, path, df, "k", n_files=2)


def rows2(spark, lo, hi):
    return spark.range(lo, hi).select(
        F.col("id").alias("k"), (F.col("id") * 2).alias("v"))


def test_add_column_meta_only_then_defaults_on_append(spark, tdir):
    t = mk(spark, os.path.join(tdir, "t"))
    files0 = set(t.snapshot().files)
    t.add_column("src", "string", default="'backfill'")
    snap = t.snapshot()
    assert set(snap.files) == files0            # zero data movement
    assert snap.protocol == [1, 2]
    assert snap.defaults == {"src": "'backfill'"}
    assert t.detail()["defaults"] == {"src": "'backfill'"}
    got = t.read()
    assert got.schema["src"].dataType.typeName() == "string"
    # pre-existing rows: files predate the column -> NULL (never the
    # default; that would rewrite history)
    assert got.filter(F.col("src").isNotNull()).count() == 0
    # append OMITTING the column -> default materialized
    t.append(rows2(spark, 40, 50))
    # append SUPPLYING it (incl. an explicit NULL) -> caller wins
    t.append(spark.sql(
        "SELECT 50L AS k, 100L AS v, 'manual' AS src "
        "UNION ALL SELECT 51L, 102L, CAST(NULL AS STRING)"))
    by_k = {r["k"]: r["src"] for r in t.read().collect()}
    assert all(by_k[k] is None for k in range(40))
    assert all(by_k[k] == "backfill" for k in range(40, 50))
    assert by_k[50] == "manual" and by_k[51] is None
    assert t.fsck(deep=True) == []


def test_full_merge_refuses_missing_defaulted_column(spark, tdir):
    # a FULL merge is whole-row replace (UPDATE SET *): the public
    # Delta contract applies defaults to INSERT actions only, so a
    # source omitting a DEFAULTed column must error loudly rather
    # than silently overwrite matched rows with the default
    # (ADVICE r8 — r8 briefly silently completed; reverted).
    t = mk(spark, os.path.join(tdir, "t"))
    t.add_column("src", "string", default="'cdc'")
    src = spark.createDataFrame(
        [(5, -1, "U"), (99, 0, "I")], "k long, v long, op string")
    with pytest.raises(ValueError, match="every table column"):
        t.merge(src, op_col="op")   # source lacks src entirely
    # supplying the column works as before
    src2 = spark.createDataFrame(
        [(5, -1, "cdc", "U"), (99, 0, "cdc", "I")],
        "k long, v long, src string, op string")
    t.merge(src2, op_col="op")
    by_k = {r["k"]: (r["v"], r["src"]) for r in t.read().collect()}
    assert by_k[5] == (-1, "cdc") and by_k[99] == (0, "cdc")
    assert by_k[6] == (12, None)     # untouched rows stay NULL
    assert t.fsck(deep=True) == []


def test_partial_merge_defaults_only_inserts(spark, tdir):
    t = mk(spark, os.path.join(tdir, "t"))
    t.add_column("src", "string", default="'cdc'")
    t.append(spark.sql("SELECT 100L AS k, 0L AS v, 'seeded' AS src"))
    sparse = spark.createDataFrame(
        [(100, -5), (200, -7)], "k long, v long")
    t.merge(sparse, partial=True)
    by_k = {r["k"]: (r["v"], r["src"]) for r in t.read().collect()}
    assert by_k[100] == (-5, "seeded")   # matched: target value kept
    assert by_k[200] == (-7, "cdc")      # insert: DEFAULT, not NULL
    assert by_k[3] == (6, None)          # untouched old row
    assert t.fsck(deep=True) == []


def test_default_declaration_validation(spark, tdir):
    t = mk(spark, os.path.join(tdir, "t"))
    with pytest.raises(ValueError, match="constant"):
        t.add_column("bad1", "long", default="v + 1")   # column ref
    with pytest.raises(ValueError, match="non-deterministic"):
        t.add_column("bad2", "double", default="rand()")
    with pytest.raises(ValueError, match="non-deterministic"):
        t.add_column("bad3", "long", default="unix_timestamp()")
    # scalar subqueries resolve without a column ref (so they pass
    # the CAST probe) but re-evaluate at every ingest — two ingests
    # could disagree about the "same" default (ADVICE r8)
    with pytest.raises(ValueError, match="subquery"):
        t.add_column("bad5", "long",
                     default="(SELECT max(id) FROM range(10))")
    with pytest.raises(ValueError, match="already exists"):
        t.add_column("v", "long")
    with pytest.raises(ValueError, match="unparseable"):
        t.add_column("bad4", "not_a_type")
    # nothing committed by the refusals; a plain add (no default)
    # stays writer-v1 (old writers error on the missing column anyway)
    v = t.snapshot().version
    t.add_column("note", "string")
    assert t.snapshot().version == v + 1
    assert t.snapshot().protocol == [1, 1]
    t.append(spark.sql(
        "SELECT 40L AS k, 80L AS v, 'x' AS note"))
    assert t.read().filter("note = 'x'").count() == 1


def test_rename_and_drop_carry_defaults(spark, tdir):
    t = mk(spark, os.path.join(tdir, "t"))
    t.add_column("src", "string", default="'backfill'")
    t.rename_column("src", "origin")
    assert t.snapshot().defaults == {"origin": "'backfill'"}
    t.append(rows2(spark, 40, 45))
    assert t.read().filter("origin = 'backfill'").count() == 5
    t.drop_column("origin")
    assert t.snapshot().defaults == {}
    # re-adding the SAME name starts clean: fresh physical column
    # (no resurrection), no default
    t.add_column("origin", "string")
    t.append(rows2(spark, 45, 50)
             .withColumn("origin", F.lit(None).cast("string")))
    got = t.read()
    assert got.filter(F.col("origin").isNotNull()).count() == 0
    assert t.fsck(deep=True) == []


def test_restore_rewinds_defaults_and_checkpoint_replays(spark, tdir):
    t = mk(spark, os.path.join(tdir, "t"))
    v0 = t.snapshot().version
    t.add_column("src", "string", default="'backfill'")
    t.append(rows2(spark, 40, 45))
    snap = t.snapshot()
    t._write_checkpoint(snap)
    # a fresh handle replays the checkpoint, defaults intact
    t2 = TxLogTable(spark, t.path)
    assert t2.snapshot().defaults == {"src": "'backfill'"}
    t2.restore(version=v0)
    after = t2.snapshot()
    assert after.defaults == {}
    assert "src" not in [f.name for f in __import__(
        "pyspark.sql.types", fromlist=["StructType"]).StructType
        .fromJson(__import__("json").loads(after.schema_json)).fields]
    assert t2.read().count() == 40
    # protocol never rewinds (restore carries no protocol key)
    assert after.protocol == [1, 2]
    assert t2.fsck(deep=True) == []


def test_v1_writer_locked_out_after_default(spark, tdir, monkeypatch):
    t = mk(spark, os.path.join(tdir, "t"))
    t.add_column("src", "string", default="'backfill'")
    monkeypatch.setattr(lh, "WRITER_VERSION", 1)   # simulate v1 client
    with pytest.raises(UnsupportedProtocolError):
        t.append(rows2(spark, 40, 45))
    monkeypatch.undo()
    # reads stayed open throughout
    assert t.read().count() == 40


def test_default_composes_with_generated_column(spark, tdir):
    """A generated expression may derive from a DEFAULTED column: the
    defaults fill runs first, so an ingest omitting BOTH lands the
    default and the generator computed FROM it."""
    df = spark.range(0, 20).select(
        F.col("id").alias("k"), (F.col("id") * 2).alias("v"))
    t = TxLogTable.create(
        spark, os.path.join(tdir, "t"), df.withColumn(
            "region", F.lit("eu")), "k",
        generated={"shard": "concat(region, '-', k % 4)"})
    t.add_column("note", "string", default="'none'")
    t.append(spark.range(20, 25).select(
        F.col("id").alias("k"), (F.col("id") * 2).alias("v"),
        F.lit("us").alias("region")))
    got = {r["k"]: (r["shard"], r["note"])
           for r in t.read().collect()}
    assert got[21] == ("us-1", "none")
    assert got[3] == ("eu-3", None)
    assert t.fsck(deep=True) == []


def test_defaults_on_converted_table(spark, tdir):
    """Defaults compose across the migration boundary (r9 candidate,
    pulled forward): a CONVERTed-by-reference table gains a defaulted
    column as a pure meta commit; imported rows read NULL, later
    appends materialize the default — identical to the native path."""
    path = os.path.join(tdir, "t")
    spark.range(0, 30).select(
        F.col("id").alias("k"), (F.col("id") * 2).alias("v")
    ).repartitionByRange(2, "k").write.parquet(path)
    t = TxLogTable.convert(spark, path, "k")
    files0 = set(t.snapshot().files)
    t.add_column("src", "string", default="'adopted'")
    assert set(t.snapshot().files) == files0
    t.append(rows2(spark, 30, 35))
    by_k = {r["k"]: r["src"] for r in t.read().collect()}
    assert all(by_k[k] is None for k in range(30))
    assert all(by_k[k] == "adopted" for k in range(30, 35))
    assert t.fsck(deep=True) == []


def test_defaults_lifecycle_matches_model(spark, tdir):
    """Model-checked lifecycle walk over every defaults interaction:
    data ops interleaved with add/rename/restore/re-add, a Python
    dict recomputing the expected (v, src) per key after every step —
    the interaction-bug net (r7's real finds came from exactly this
    kind of walk over generated/widening)."""
    t = mk(spark, os.path.join(tdir, "t"), n=20)
    model = {k: (2 * k, None) for k in range(20)}

    def check(step):
        got = {r["k"]: (r["v"], r["src"] if "src" in r else None)
               for r in t.read().collect()}
        want = {k: (v, s) for k, (v, s) in model.items()}
        assert got == want, f"step {step}: {got} != {want}"
        assert t.fsck(deep=True) == []

    # 1: plain merge before the column exists
    t.merge(spark.createDataFrame([(3, -3, "U"), (30, 60, "I")],
                                  "k long, v long, op string"),
            op_col="op")
    model[3] = (-3, None); model[30] = (60, None)

    # 2: add with default 'a' — history stays NULL
    v_pre_add = t.snapshot().version
    t.add_column("src", "string", default="'a'")
    check("add")

    # 3: append omitting -> 'a'; full merge omitting -> loud error
    # (defaults are INSERT-only; silently completing would overwrite
    # matched rows, ADVICE r8); supplying the column replaces the row
    t.append(rows2(spark, 40, 43))
    for k in range(40, 43):
        model[k] = (2 * k, "a")
    with pytest.raises(ValueError, match="every table column"):
        t.merge(spark.createDataFrame([(3, 33, "U")],
                                      "k long, v long, op string"),
                op_col="op")
    t.merge(spark.createDataFrame([(3, 33, "a", "U")],
                                  "k long, v long, src string, "
                                  "op string"),
            op_col="op")
    model[3] = (33, "a")
    check("fill")

    # 4: partial merge — matched keeps value, insert takes default
    t.merge(spark.createDataFrame([(40, -40), (50, -50)],
                                  "k long, v long"), partial=True)
    model[40] = (-40, "a"); model[50] = (-50, "a")
    check("partial")

    # 5: rename re-keys the default; ingest keeps working
    t.rename_column("src", "origin")
    t.append(rows2(spark, 60, 62))
    for k in range(60, 62):
        model[k] = (2 * k, "a")
    got = {r["k"]: r["origin"] for r in t.read().collect()}
    assert got[60] == "a" and got[3] == "a" and got[0] is None
    t.rename_column("origin", "src")      # back, so check() reads src
    check("rename")

    # 6: restore to pre-add — column and default gone, data rewound
    # to the pre-add image: keys 0..19 (3 at its first merge value)
    # plus the inserted 30; everything later vanishes
    t.restore(version=v_pre_add)
    model = {k: (2 * k, None) for k in range(20)}
    model[3] = (-3, None)
    model[30] = (60, None)
    assert t.snapshot().defaults == {}
    got = {r["k"]: r["v"] for r in t.read().collect()}
    assert got == {k: v for k, (v, _) in model.items()}

    # 7: re-add the SAME name with a DIFFERENT default — fresh start
    t.add_column("src", "string", default="'b'")
    t.append(rows2(spark, 70, 72))
    for k in range(70, 72):
        model[k] = (2 * k, "b")
    check("re-add")


def test_default_string_literal_guards_scan_past_literals(spark, tdir):
    """ADVICE r9: the word-scan guards (subquery, non-deterministic
    fn) must not fire INSIDE string literals — a literal is a
    constant, so "'select one'" or "'now'" are perfectly legitimate
    defaults.  Outside a literal the guards still refuse."""
    t = mk(spark, os.path.join(tdir, "t"))
    t.add_column("a", "string", default="'select one'")
    t.add_column("b", "string", default="'now'")
    t.add_column("c", "string", default="'it''s now, select!'")
    t.add_column("d", "string", default="upper('rand()')")
    t.append(spark.sql("SELECT 40L AS k, 80L AS v"))
    row = t.read().filter("k = 40").collect()[0]
    assert (row["a"], row["b"], row["c"], row["d"]) \
        == ("select one", "now", "it's now, select!", "RAND()")
    # guards still fire outside literals — incl. mixed forms where a
    # literal and a real call coexist
    with pytest.raises(ValueError, match="subquery"):
        t.add_column("bad1", "long",
                     default="(SELECT max(id) FROM range(10))")
    with pytest.raises(ValueError, match="non-deterministic"):
        t.add_column("bad2", "string", default="concat('now', uuid())")
    with pytest.raises(ValueError, match="non-deterministic"):
        t.add_column("bad3", "long",
                     default="length('x') + unix_timestamp()")
