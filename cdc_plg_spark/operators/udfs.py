"""UDF / UDAF / UDTF surface (SURVEY.md §2.10).

The reference's plugin mechanism — arbitrary user code invoked per
event batch over a serialized boundary (WASM/waPC guest_call,
/root/reference/README.md:75-91) — maps to Spark's Python UDF tiers.
The engine's stance, in cost order:

1. built-in expressions (everything else in this package) — JVM,
   whole-stage codegen, zero crossing;
2. Arrow-vectorized pandas UDFs / applyInPandas / mapInPandas — one
   Arrow batch per crossing, ~10-100× faster than row-at-a-time;
3. row-at-a-time @udf — kept ONLY as a documented anti-pattern
   (`udf_scalar_py`), mirroring how the RFC itself concedes WASM
   plugins are much slower than native ones (README.md:124).
"""

from __future__ import annotations

from collections.abc import Iterator

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.functions import pandas_udf, udf

from cdc_plg_spark.catalog import load_table
from cdc_plg_spark.registry import register


@register(
    "udf_scalar_py",
    oracle="""
    SELECT c_custkey,
           CAST(string_split(c_name, '#')[2] AS BIGINT) % 97 AS key_bucket
    FROM customer
    """,
)
def udf_scalar_py(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Row-at-a-time Python UDF — the per-event guest_call shape
    (README.md:87). ANTI-PATTERN at scale: one Python crossing per row;
    kept for parity. Use `udf_pandas_scalar` instead."""

    @udf("bigint")
    def key_bucket(name: str) -> int:
        return int(name.split("#")[1]) % 97

    c = load_table(spark, "customer", sf_dir)
    return c.select("c_custkey", key_bucket("c_name").alias("key_bucket"))


@register(
    "udf_pandas_scalar",
    oracle="""
    SELECT event_id, ROUND(ln(1 + value) * 2, 6) AS scaled
    FROM events
    """,
)
def udf_pandas_scalar(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Arrow-vectorized scalar pandas UDF (Series→Series): the
    batch-vectorized replacement for the reference's per-event
    transform hook (README.md:89). One Arrow batch per crossing."""

    @pandas_udf("double")
    def scaled(v: pd.Series) -> pd.Series:
        return np.round(np.log1p(v) * 2, 6)

    ev = load_table(spark, "events", sf_dir)
    return ev.select("event_id", scaled("value").alias("scaled"))


@register(
    "udaf_pandas_agg",
    oracle="""
    SELECT event_type, ROUND(exp(AVG(ln(value))), 6) AS geo_mean
    FROM events WHERE value > 0 GROUP BY event_type
    """,
)
def udaf_pandas_agg(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Custom aggregate as a pandas UDAF (Series→scalar): geometric
    mean per group. Spark runs it per shuffle-partition group with
    Arrow transfer — the custom-aggregate plugin shape.

    Geometric mean is defined over positive support: both sides
    filter value > 0 explicitly (sf0.1 contains value = 0 rows, where
    ln() errors in DuckDB and numpy drifts to exp(-inf))."""

    @pandas_udf("double")
    def geo_mean(v: pd.Series) -> float:
        return float(np.round(np.exp(np.log(v.to_numpy()).mean()), 6))

    # NOTE: Spark forbids mixing group-aggregate pandas UDFs with
    # built-in aggregates in one agg() — keep the UDAF alone.
    ev = load_table(spark, "events", sf_dir)
    return (ev.filter(F.col("value") > 0)
              .groupBy("event_type")
              .agg(geo_mean("value").alias("geo_mean")))


@register(
    "udtf_grouped_map",
    oracle="""
    WITH c AS (
        SELECT user_id, event_id,
               CAST(FLOOR(value * 10000 + 0.5) AS BIGINT) AS cents
        FROM events
    )
    SELECT user_id, event_id,
           cents * COUNT(*) OVER (PARTITION BY user_id)
               - CAST(SUM(cents) OVER (PARTITION BY user_id) AS BIGINT)
               AS demeaned_scaled
    FROM c
    """,
)
def udtf_grouped_map(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-group table transform via applyInPandas (grouped-map):
    each user's events arrive as one pandas DataFrame. This is the
    reference's per-table plugin unit (TablePipeline, README.md:95)
    expressed as a keyed Arrow batch.

    The compared value is (value - group_mean) scaled by 1e4*count,
    computed WITHOUT any float mean or division: quantize each value to
    integer 1e-4 units (floor(x*1e4+0.5) — deterministic, no tie-mode
    dependence), then cents*n - sum(cents).  Pure int64 arithmetic is
    bit-identical across pandas and DuckDB, which a rounded float mean
    is not (summation-order ulp drift flips cells near rounding
    boundaries — observed live at sf0.01)."""

    def demean(pdf: pd.DataFrame) -> pd.DataFrame:
        out = pdf[["user_id", "event_id"]].copy()
        cents = np.floor(
            pdf["value"].to_numpy() * 10000 + 0.5).astype("int64")
        out["demeaned_scaled"] = cents * len(pdf) - cents.sum()
        return out

    ev = load_table(spark, "events", sf_dir)
    return (ev.select("user_id", "event_id", "value")
              .groupBy("user_id")
              .applyInPandas(
                  demean,
                  "user_id bigint, event_id bigint, demeaned_scaled bigint"))


@register(
    "udtf_map_partitions",
    oracle="""
    SELECT event_id, event_type,
           CAST(floor(value / 10) AS BIGINT) AS value_bucket
    FROM events
    """,
)
def udtf_map_partitions(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Whole-partition transform via mapInPandas — the out-of-process
    batch runner shape (README.md:44-49): user code sees an iterator of
    Arrow batches per partition and streams batches back."""

    def bucketize(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            yield pd.DataFrame({
                "event_id": pdf["event_id"],
                "event_type": pdf["event_type"],
                "value_bucket": np.floor(pdf["value"] / 10).astype("int64"),
            })

    ev = load_table(spark, "events", sf_dir)
    return ev.mapInPandas(
        bucketize, "event_id bigint, event_type string, value_bucket bigint")


@register(
    "udtf_lateral",
    oracle="""
    SELECT doc_id, u.pos AS pos, u.token AS token FROM (
        SELECT doc_id,
               unnest(list_transform(
                   generate_series(1, len(string_split(text, ' '))),
                   i -> struct_pack(pos := i - 1,
                                    token := string_split(text, ' ')[i]))) AS u
        FROM documents)
    """,
)
def udtf_lateral(spark: SparkSession, sf_dir: str) -> DataFrame:
    """One-row→many-rows lateral expansion: posexplode of the token
    array. JVM-side generator — the scale path for row-expanding
    transforms (a Python UDTF would do the same work at Python speed)."""
    d = load_table(spark, "documents", sf_dir)
    return (d.select("doc_id", F.posexplode(F.split("text", " "))
                     .alias("pos", "token")))


@register(
    "udtf_python_native",
    oracle="""
    SELECT doc_id, lang,
           len(string_split(text, ' ')) AS n_tokens,
           CASE WHEN len(string_split(text, ' ')) >= 40 THEN 'long'
                WHEN len(string_split(text, ' ')) >= 15 THEN 'medium'
                ELSE 'short' END AS bucket
    FROM documents
    """,
)
def udtf_python_native(spark: SparkSession, sf_dir: str) -> DataFrame:
    """A real Python UDTF (Spark 3.5+ `@udtf`): arbitrary per-row
    expansion logic in a class-based table function — the closest
    Spark-native analogue to the reference's out-of-process plugin
    runner (README.md:44-49), with the host↔guest boundary replaced by
    the Arrow channel. Row-at-a-time Python: keep it OFF hot paths
    (udtf_lateral shows the JVM generator form of the same shape)."""
    from pyspark.sql.functions import udtf as _udtf

    @_udtf(returnType="n_tokens BIGINT, bucket STRING")
    class TokenBucket:
        def eval(self, text: str):
            n = len(text.split(" ")) if text else 0
            bucket = ("long" if n >= 40 else
                      "medium" if n >= 15 else "short")
            yield n, bucket

    spark.udtf.register("token_bucket", TokenBucket)
    load_table(spark, "documents", sf_dir).createOrReplaceTempView(
        "udtf_docs_v")
    return spark.sql("""
        SELECT d.doc_id, d.lang, t.n_tokens, t.bucket
        FROM udtf_docs_v d, LATERAL token_bucket(d.text) t
    """)


@register(
    "udf_arrow_scalar",
    oracle="""
    SELECT event_id,
           upper(event_type) || ':' || CAST(user_id % 16 AS VARCHAR)
               AS routing_tag
    FROM events
    """,
)
def udf_arrow_scalar(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Arrow-OPTIMIZED plain Python UDF (Spark 3.5+ useArrow=True):
    row-at-a-time author experience, Arrow-batch wire transfer — the
    middle tier between `udf_scalar_py` (pickle per row) and
    `udf_pandas_scalar` (vectorized author experience). The right
    migration path for existing per-event plugin logic (README.md:87)
    that can't be trivially vectorized: swapping the decorator buys
    the serialization win without rewriting the function body."""

    @udf("string", useArrow=True)
    def routing_tag(event_type: str, user_id: int) -> str:
        return f"{event_type.upper()}:{user_id % 16}"

    ev = load_table(spark, "events", sf_dir)
    return ev.select("event_id",
                     routing_tag("event_type", "user_id").alias("routing_tag"))


@register(
    "udtf_polymorphic",
    oracle="""
    SELECT doc_id,
           string_split(text, ' ')[1] AS tok1,
           string_split(text, ' ')[2] AS tok2,
           string_split(text, ' ')[3] AS tok3
    FROM documents
    """,
)
def udtf_polymorphic(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Polymorphic Python UDTF (Spark 3.5+/4): the OUTPUT SCHEMA is
    computed at plan time by the class's static analyze() from the
    call's literal argument — first_tokens(text, 3) compiles to three
    columns, first_tokens(text, 5) to five, one registration. This is
    the schema-flexible per-event plugin (README.md:89) taken further
    than a fixed-signature UDF can: the host (Catalyst) asks the
    plugin for its contract per call site instead of per deployment.

    Python crossing is per row (UDTF protocol) — fine for a lateral
    expansion whose cost is dominated by output row construction;
    bulk scalar paths stay on pandas_udf."""
    from pyspark.sql.functions import udtf as _udtf
    from pyspark.sql.types import StringType, StructType
    from pyspark.sql.udtf import AnalyzeResult

    class FirstTokens:
        @staticmethod
        def analyze(text, n):
            schema = StructType()
            for i in range(n.value):
                schema = schema.add(f"tok{i + 1}", StringType())
            return AnalyzeResult(schema=schema)

        def eval(self, text, n):
            toks = (text or "").split(" ")
            yield tuple(toks[i] if i < len(toks) else None
                        for i in range(n))

    spark.udtf.register("first_tokens", _udtf(FirstTokens))
    load_table(spark, "documents", sf_dir).createOrReplaceTempView("docs_poly")
    return spark.sql("""
        SELECT d.doc_id, t.tok1, t.tok2, t.tok3
        FROM docs_poly d, LATERAL first_tokens(d.text, 3) t
    """)


@register(
    "udtf_map_arrow",
    oracle="""
    SELECT event_id,
           CAST(FLOOR(value * 100 + 0.5) AS BIGINT) AS value_e2,
           CAST(LENGTH(event_type) AS BIGINT) AS type_len
    FROM events
    """,
)
def udtf_map_arrow(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Whole-partition transform via mapInArrow — the zero-copy floor
    of the Python runner spectrum: user code receives pyarrow
    RecordBatches directly (no pandas materialization, no index
    bookkeeping), computes with Arrow compute kernels, and yields
    batches back.  For numeric kernels this skips the
    Arrow→pandas→Arrow round trip mapInPandas pays, which matters when
    batches are wide or string-heavy."""
    import pyarrow as pa
    import pyarrow.compute as pc

    def kernel(batches):
        for b in batches:
            value = b.column("value")
            yield pa.RecordBatch.from_arrays(
                [b.column("event_id"),
                 pc.cast(pc.floor(pc.add(pc.multiply(value, 100.0), 0.5)),
                         pa.int64()),
                 pc.cast(pc.utf8_length(b.column("event_type")), pa.int64())],
                ["event_id", "value_e2", "type_len"])

    ev = load_table(spark, "events", sf_dir)
    return (ev.select("event_id", "value", "event_type")
            .mapInArrow(kernel,
                        "event_id bigint, value_e2 bigint, type_len bigint"))
