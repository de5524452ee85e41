"""Scalar function surface (SURVEY.md §2.8) + JSON event decode (§2.1).

The JSON family is `[REF]` — JSON is the reference's wire format for
event payloads (/root/reference/README.md:75); the rest is the standard
analytics function surface mandated by the real-time-analytics use case
(README.md:15). One representative query per family; each oracle
bridges Spark↔DuckDB dialect deltas (FIXTURES.md notes):

  Spark                       DuckDB
  split                       string_split           (1-based indexing)
  size / array_distinct       len / list_distinct
  transform/filter/aggregate  list_transform/list_filter/list_reduce
  initcap                     (emulated: upper(head)||tail per word)
  dayofweek (1=Sun)           dayofweek (0=Sun) + 1
  get_json_object             json_extract_string
  bround                      round_even
  ceil/floor → BIGINT         ceil/floor → DOUBLE (cast)

Everything here is JVM-side whole-stage-codegen'd expression work — no
Python UDFs anywhere in these paths (the UDF surface lives in
operators/udfs.py and is deliberately separate).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from cdc_plg_spark.catalog import load_table
from cdc_plg_spark.functions.numeric import fast_round
from cdc_plg_spark.registry import register


@register(
    "fn_string",
    oracle="""
    SELECT c_custkey,
           concat_ws('|', c_name, c_mktsegment) AS joined,
           upper(c_name) AS name_upper,
           lower(c_mktsegment) AS seg_lower,
           trim(concat(' ', c_name, ' ')) AS trimmed,
           substring(c_name, 10, 4) AS name_sub,
           length(c_name) AS name_len,
           lpad(CAST(c_custkey AS VARCHAR), 8, '0') AS key_padded,
           regexp_extract(c_name, '#(\\d+)', 1) AS cust_digits,
           regexp_replace(c_name, '0+', '0', 'g') AS squeezed,
           (c_name LIKE 'Customer#%') AS is_customer,
           string_split(c_name, '#')[1] AS name_head,
           concat(upper(substring(lower(c_mktsegment), 1, 1)),
                  substring(lower(c_mktsegment), 2)) AS seg_title
    FROM customer
    """,
)
def fn_string(spark: SparkSession, sf_dir: str) -> DataFrame:
    """String family: concat_ws/upper/lower/trim/substring/length/lpad/
    regexp_extract/regexp_replace/LIKE/split/initcap."""
    c = load_table(spark, "customer", sf_dir)
    return c.select(
        "c_custkey",
        F.concat_ws("|", "c_name", "c_mktsegment").alias("joined"),
        F.upper("c_name").alias("name_upper"),
        F.lower("c_mktsegment").alias("seg_lower"),
        F.trim(F.concat(F.lit(" "), F.col("c_name"), F.lit(" "))).alias("trimmed"),
        F.substring("c_name", 10, 4).alias("name_sub"),
        F.length("c_name").alias("name_len"),
        F.lpad(F.col("c_custkey").cast("string"), 8, "0").alias("key_padded"),
        F.regexp_extract("c_name", r"#(\d+)", 1).alias("cust_digits"),
        F.regexp_replace("c_name", "0+", "0").alias("squeezed"),
        F.col("c_name").like("Customer#%").alias("is_customer"),
        F.split("c_name", "#").getItem(0).alias("name_head"),
        F.initcap(F.lower("c_mktsegment")).alias("seg_title"),
    )


@register(
    "fn_date",
    oracle="""
    SELECT o_orderkey,
           CAST(date_trunc('month', o_orderdate) AS DATE) AS month_start,
           year(o_orderdate) AS yr,
           month(o_orderdate) AS mo,
           quarter(o_orderdate) AS qtr,
           dayofweek(o_orderdate) + 1 AS dow,
           datediff('day', CAST(o_orderdate AS DATE), DATE '1998-12-01')
               AS days_to_cutoff,
           CAST(o_orderdate AS DATE) AS order_date,
           CAST(epoch(o_orderdate) AS BIGINT) AS epoch_s,
           CAST(o_orderdate AS DATE) + 30 AS due_date,
           last_day(CAST(o_orderdate AS DATE)) AS month_end
    FROM orders
    """,
)
def fn_date(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Date/time family: trunc/extract/diff/add/epoch/last_day."""
    o = load_table(spark, "orders", sf_dir)
    return o.select(
        "o_orderkey",
        F.date_trunc("month", "o_orderdate").cast("date").alias("month_start"),
        F.year("o_orderdate").alias("yr"),
        F.month("o_orderdate").alias("mo"),
        F.quarter("o_orderdate").alias("qtr"),
        F.dayofweek("o_orderdate").alias("dow"),
        F.datediff(F.lit("1998-12-01").cast("date"),
                   F.col("o_orderdate").cast("date")).alias("days_to_cutoff"),
        F.col("o_orderdate").cast("date").alias("order_date"),
        F.unix_timestamp("o_orderdate").alias("epoch_s"),
        F.date_add(F.col("o_orderdate").cast("date"), 30).alias("due_date"),
        F.last_day(F.col("o_orderdate").cast("date")).alias("month_end"),
    )


@register(
    "fn_math",
    oracle="""
    SELECT l_orderkey, l_linenumber,
           abs(l_quantity - 25) AS qty_dev,
           CAST(ceil(l_extendedprice / 1000) AS BIGINT) AS price_k_ceil,
           CAST(floor(l_extendedprice / 1000) AS BIGINT) AS price_k_floor,
           round(sqrt(l_extendedprice), 6) AS price_sqrt,
           round(ln(l_extendedprice), 6) AS price_ln,
           round(exp(l_discount), 6) AS disc_exp,
           pow(l_quantity, 2) AS qty_sq,
           l_orderkey % 7 AS key_mod,
           greatest(l_quantity, l_discount * 100) AS g,
           least(l_quantity, l_tax * 100) AS l,
           round_even(l_quantity / 2, 0) AS half_qty_banker
    FROM lineitem
    """,
)
def fn_math(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Math family: abs/ceil/floor/sqrt/ln/exp/pow/pmod/greatest/least/
    banker's rounding (bround ↔ round_even on exact .5 halves)."""
    li = load_table(spark, "lineitem", sf_dir)
    return li.select(
        "l_orderkey", "l_linenumber",
        F.abs(F.col("l_quantity") - 25).alias("qty_dev"),
        F.ceil(F.col("l_extendedprice") / 1000).alias("price_k_ceil"),
        F.floor(F.col("l_extendedprice") / 1000).alias("price_k_floor"),
        F.round(F.sqrt("l_extendedprice"), 6).alias("price_sqrt"),
        F.round(F.log("l_extendedprice"), 6).alias("price_ln"),
        F.round(F.exp("l_discount"), 6).alias("disc_exp"),
        F.pow("l_quantity", F.lit(2)).alias("qty_sq"),
        F.pmod("l_orderkey", F.lit(7)).alias("key_mod"),
        F.greatest(F.col("l_quantity"), F.col("l_discount") * 100).alias("g"),
        F.least(F.col("l_quantity"), F.col("l_tax") * 100).alias("l"),
        F.bround(F.col("l_quantity") / 2, 0).alias("half_qty_banker"),
    )


@register(
    "fn_array",
    oracle="""
    SELECT doc_id,
           len(string_split(text, ' ')) AS n_tokens,
           list_contains(string_split(text, ' '), 'data') AS has_data,
           string_split(text, ' ')[1] AS first_token,
           len(list_distinct(string_split(text, ' '))) AS n_unique,
           len(replace(text, ' ', '')) AS sum_token_len,
           list_aggregate(string_split(text, ' '), 'min') AS min_token,
           array_to_string(list_sort(string_split(text, ' '))[1:3], ',')
               AS first3_sorted,
           len(list_filter(string_split(text, ' '), x -> len(x) > 4)) AS n_long
    FROM documents
    """,
)
def fn_array(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Array family incl. higher-order fns: size/contains/getItem/
    distinct/aggregate/sort/slice/filter — all JVM expressions, the
    scale-safe way to process token lists (no UDF, no explode-shuffle)."""
    d = load_table(spark, "documents", sf_dir)
    toks = F.split("text", " ")
    return d.select(
        "doc_id",
        F.size(toks).alias("n_tokens"),
        F.array_contains(toks, "data").alias("has_data"),
        toks.getItem(0).alias("first_token"),
        F.size(F.array_distinct(toks)).alias("n_unique"),
        F.aggregate(F.transform(toks, lambda x: F.length(x)),
                    F.lit(0), lambda a, x: a + x).alias("sum_token_len"),
        F.array_min(toks).alias("min_token"),
        # serialized (not a raw array) so harness canonicalizers can hash it
        F.array_join(F.slice(F.sort_array(toks), 1, 3), ",")
         .alias("first3_sorted"),
        F.size(F.filter(toks, lambda x: F.length(x) > 4)).alias("n_long"),
    )


@register(
    "fn_map",
    oracle="""
    SELECT event_id,
           array_to_string(map_keys(
               MAP {'type': event_type, 'uid': CAST(user_id AS VARCHAR)}), ',')
               AS mkeys,
           array_to_string(map_values(
               MAP {'type': event_type, 'uid': CAST(user_id AS VARCHAR)}), ',')
               AS mvals,
           cardinality(MAP {'type': event_type, 'uid': CAST(user_id AS VARCHAR)})
               AS msize
    FROM events
    """,
)
def fn_map(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Map family: construction, key/value extraction, cardinality
    (insertion order preserved identically in both engines)."""
    ev = load_table(spark, "events", sf_dir)
    m = F.map_from_arrays(
        F.array(F.lit("type"), F.lit("uid")),
        F.array(F.col("event_type"), F.col("user_id").cast("string")))
    return ev.select(
        "event_id",
        # serialized so harness canonicalizers can hash the cells
        F.array_join(F.map_keys(m), ",").alias("mkeys"),
        F.array_join(F.map_values(m), ",").alias("mvals"),
        F.size(m).alias("msize"),
    )


@register(
    "fn_json",
    oracle="""
    SELECT event_id,
           CAST(json_extract_string(props, '$.k') AS BIGINT) AS k_val,
           CAST(json_extract_string(props, '$.k') AS BIGINT) AS k_typed,
           to_json(struct_pack(id := event_id, t := event_type)) AS envelope
    FROM events
    """,
)
def fn_json(spark: SparkSession, sf_dir: str) -> DataFrame:
    """JSON family (the reference's wire format, README.md:75):
    get_json_object path extraction, schema-applied from_json, to_json."""
    ev = load_table(spark, "events", sf_dir)
    return ev.select(
        "event_id",
        F.get_json_object("props", "$.k").cast("bigint").alias("k_val"),
        F.from_json("props", "k BIGINT").getField("k").alias("k_typed"),
        F.to_json(F.struct(F.col("event_id").alias("id"),
                           F.col("event_type").alias("t"))).alias("envelope"),
    )


@register(
    "fn_cast_null",
    oracle="""
    SELECT o_orderkey,
           try_cast(o_orderstatus AS INT) AS bad_cast,
           nullif(o_orderstatus, 'O') AS status_or_null,
           coalesce(nullif(o_orderstatus, 'O'), 'OPEN') AS status_fixed,
           CAST(floor(o_totalprice) AS BIGINT) AS price_floor,
           isnan(CAST('NaN' AS DOUBLE)) AS nan_check,
           coalesce(try_cast(o_orderstatus AS INT), -1) AS nvl_fallback
    FROM orders
    """,
)
def fn_cast_null(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Casts & null handling: cast/try_cast/coalesce/nullif/isnan/nvl."""
    o = load_table(spark, "orders", sf_dir)
    return o.select(
        "o_orderkey",
        F.col("o_orderstatus").try_cast("int").alias("bad_cast"),
        F.nullif(F.col("o_orderstatus"), F.lit("O")).alias("status_or_null"),
        F.coalesce(F.nullif(F.col("o_orderstatus"), F.lit("O")),
                   F.lit("OPEN")).alias("status_fixed"),
        F.floor("o_totalprice").alias("price_floor"),
        F.isnan(F.lit("NaN").cast("double")).alias("nan_check"),
        F.nvl(F.col("o_orderstatus").try_cast("int"), F.lit(-1)).alias("nvl_fallback"),
    )


@register(
    "fn_hash",
    oracle="""
    SELECT c_custkey,
           sha256(concat(c_name, '|', c_mktsegment)) AS sha_val,
           md5(c_name) AS md5_val
    FROM customer
    """,
)
def fn_hash(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Portable hash family (the masking primitive, README.md:24)."""
    c = load_table(spark, "customer", sf_dir)
    return c.select(
        "c_custkey",
        F.sha2(F.concat(F.col("c_name"), F.lit("|"), F.col("c_mktsegment")), 256)
         .alias("sha_val"),
        F.md5("c_name").alias("md5_val"),
    )


@register("fn_hash_native", tags=("spark-only",))
def fn_hash_native(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Spark-native hash family with no DuckDB twin (rows-only check):
    xxhash64 (the engine's cheap content-hash workhorse for dedup),
    crc32, and Murmur3 `hash`."""
    c = load_table(spark, "customer", sf_dir)
    return c.select(
        "c_custkey",
        F.xxhash64("c_name").alias("xx64"),
        F.crc32(F.col("c_name").cast("binary")).alias("crc"),
        F.hash("c_name", "c_mktsegment").alias("murmur"),
    )


@register(
    "decode_json_event",
    oracle="""
    SELECT event_id, user_id, event_type, ROUND(value, 4) AS value,
           CAST(json_extract_string(props, '$.k') AS BIGINT) AS k
    FROM events
    """,
    tags=("cdc",),
)
def decode_json_event(spark: SparkSession, sf_dir: str) -> DataFrame:
    """CDC payload decode (README.md:75 — JSON host↔guest payloads):
    parse the incoming JSON payload column through a typed schema
    (`from_json`) and project typed columns. One JSON parse per row —
    the encode direction (`to_json`) is a sink concern and is covered
    by tests/test_streaming.py::test_cdc_envelope_roundtrip."""
    ev = load_table(spark, "events", sf_dir)
    return ev.select(
        "event_id", "user_id", "event_type",
        fast_round("value", 4).alias("value"),
        F.from_json("props", "k BIGINT")["k"].alias("k"))


@register(
    "fn_bitwise",
    oracle="""
    SELECT l_orderkey,
           l_orderkey & 255 AS lo_byte,
           l_orderkey | 4096 AS with_flag,
           xor(l_orderkey, l_partkey) AS key_xor,
           l_orderkey << 2 AS shifted_l,
           l_orderkey >> 3 AS shifted_r,
           CAST(bit_count(l_orderkey) AS INT) AS popcount
    FROM lineitem
    """,
)
def fn_bitwise(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Bitwise family: and/or/xor/shifts/popcount — flag packing and
    hash mixing primitives (SimHash and the LSH bucketing are built on
    these)."""
    li = load_table(spark, "lineitem", sf_dir)
    k = F.col("l_orderkey")
    return li.select(
        "l_orderkey",
        k.bitwiseAND(F.lit(255)).alias("lo_byte"),
        k.bitwiseOR(F.lit(4096)).alias("with_flag"),
        k.bitwiseXOR(F.col("l_partkey")).alias("key_xor"),
        F.shiftleft(k, 2).alias("shifted_l"),
        F.shiftright(k, 3).alias("shifted_r"),
        F.bit_count(k).alias("popcount"))


@register(
    "fn_struct",
    oracle="""
    SELECT o_orderkey,
           struct_pack(k := o_orderkey, s := o_orderstatus).s AS status_field,
           to_json(struct_pack(k := o_orderkey, s := o_orderstatus)) AS js
    FROM orders
    """,
)
def fn_struct(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Struct family: construction, field access, JSON serialization —
    the nested-record surface every event envelope round-trips through
    (the before/after structs of the CDC event model, SURVEY.md §1.1
    D2). Narrow map, codegen'd."""
    o = load_table(spark, "orders", sf_dir)
    st = F.struct(F.col("o_orderkey").alias("k"),
                  F.col("o_orderstatus").alias("s"))
    return o.select("o_orderkey",
                    st.getField("s").alias("status_field"),
                    F.to_json(st).alias("js"))


@register(
    "fn_regex",
    oracle="""
    SELECT doc_id,
           -- DuckDB's array_to_string returns NULL for an EMPTY list
           -- (Spark's array_join returns ''); zero-match docs first
           -- appear at sf0.1, so align explicitly
           CASE WHEN text IS NULL THEN NULL
                ELSE COALESCE(array_to_string(
                    regexp_extract_all(text, '[a-z]+a'), ','), '') END
               AS a_words,
           CAST(len(regexp_extract_all(text, '[a-z]+a')) AS BIGINT) AS n_a,
           regexp_matches(text, '[0-9]') AS has_digit
    FROM documents
    """,
)
def fn_regex(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Regex family beyond extract/replace: extract-all into an array,
    match counting, containment test — the workhorse trio of corpus
    mining. All JVM regexp inside codegen; no Python."""
    d = load_table(spark, "documents", sf_dir)
    allm = F.regexp_extract_all("text", F.lit("[a-z]+a"), 0)
    return d.select("doc_id",
                    F.array_join(allm, ",").alias("a_words"),
                    F.size(allm).cast("long").alias("n_a"),
                    F.col("text").rlike("[0-9]").alias("has_digit"))


@register(
    "fn_interval",
    oracle="""
    SELECT event_id,
           ts + INTERVAL 90 MINUTE AS deadline,
           CAST(date_diff('minute', TIMESTAMP '2024-01-01', ts) AS BIGINT)
               AS mins_into_window
    FROM events
    """,
)
def fn_interval(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Interval arithmetic: timestamp shift by a fixed interval and
    unit-typed timestamp difference (SURVEY.md §1.3 interval surface).
    JVM-side timestamp_add/timestamp_diff — narrow, codegen'd."""
    ev = load_table(spark, "events", sf_dir)
    return ev.select(
        "event_id",
        F.timestamp_add("MINUTE", F.lit(90), F.col("ts")).alias("deadline"),
        F.timestamp_diff("MINUTE",
                         F.lit("2024-01-01").cast("timestamp"),
                         F.col("ts")).alias("mins_into_window"))


@register(
    "fn_url",
    oracle="""
    SELECT doc_id,
           regexp_extract(url, 'https?://([^/]+)', 1) AS host,
           regexp_extract(url, 'https?://[^/]+(/[^?]*)', 1) AS path,
           regexp_extract(url, '\\?(.*)$', 1) AS query,
           regexp_extract(url, '[?&]lang=([^&]*)', 1) AS lang_param
    FROM (SELECT doc_id,
                 'https://' || source || '.example.com/docs/'
                     || CAST(doc_id AS VARCHAR) || '?lang=' || lang AS url
          FROM documents)
    """,
)
def fn_url(spark: SparkSession, sf_dir: str) -> DataFrame:
    """URL family: parse_url component extraction (HOST/PATH/QUERY and
    a named query parameter) — the log-analytics staple. Spark's
    parse_url is a native JVM expression; the oracle mirrors it with
    regexps since DuckDB has no URL parser."""
    d = load_table(spark, "documents", sf_dir)
    url = F.concat(F.lit("https://"), F.col("source"),
                   F.lit(".example.com/docs/"), F.col("doc_id").cast("string"),
                   F.lit("?lang="), F.col("lang"))
    return d.select(
        "doc_id",
        F.parse_url(url, F.lit("HOST")).alias("host"),
        F.parse_url(url, F.lit("PATH")).alias("path"),
        F.parse_url(url, F.lit("QUERY")).alias("query"),
        F.parse_url(url, F.lit("QUERY"), F.lit("lang")).alias("lang_param"))


@register(
    "fn_array_setops",
    oracle="""
    SELECT doc_id,
           array_to_string(list_sort(list_distinct(list_concat(a, b))), ',')
               AS u,
           array_to_string(list_sort(list_intersect(a, b)), ',') AS i,
           array_to_string(
               list_sort(list_filter(a, x -> NOT list_contains(b, x))), ',')
               AS e,
           list_has_any(a, b) AS overlaps
    FROM (SELECT doc_id,
                 list_sort(list_distinct(string_split(text, ' ')))[1:6] AS a,
                 list_sort(list_distinct(string_split(text, ' ')))[4:9] AS b
          FROM documents)
    """,
)
def fn_array_setops(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Array set algebra: union/intersect/except/overlap on token sets
    — the building blocks of Jaccard-style similarity (dedup_ngram_
    jaccard composes these). All JVM expressions; results sorted so the
    order-insensitive hash compares stably (Spark's set ops preserve
    first-occurrence order, DuckDB's don't)."""
    d = load_table(spark, "documents", sf_dir)
    toks = F.sort_array(F.array_distinct(F.split("text", " ")))
    d = d.select("doc_id", F.slice(toks, 1, 6).alias("a"),
                 F.slice(toks, 4, 6).alias("b"))
    return d.select(
        "doc_id",
        # serialized so harness canonicalizers can hash the cells
        F.array_join(F.sort_array(F.array_union("a", "b")), ",").alias("u"),
        F.array_join(F.sort_array(F.array_intersect("a", "b")), ",").alias("i"),
        F.array_join(F.sort_array(F.array_except("a", "b")), ",").alias("e"),
        F.arrays_overlap("a", "b").alias("overlaps"))


@register(
    "fn_map_higher_order",
    oracle="""
    WITH c AS (
        SELECT user_id, event_type, COUNT(*) AS n
        FROM events GROUP BY 1, 2)
    SELECT user_id, event_type,
           ROUND(n / SUM(n) OVER (PARTITION BY user_id), 6) AS share
    FROM c
    QUALIFY n / SUM(n) OVER (PARTITION BY user_id) >= 0.1
    """,
)
def fn_map_higher_order(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Map higher-order pipeline: build a per-user event_type→count map
    (map_from_entries over collected structs), derive the total with
    aggregate(map_values), rescale every value with transform_values,
    drop minor keys with map_filter, then explode the map back to rows.
    The map round-trip stays entirely in JVM expressions — the pattern
    for per-entity feature dictionaries at scale (one shuffle for the
    count, one for the per-user collect)."""
    ev = load_table(spark, "events", sf_dir)
    counts = ev.groupBy("user_id", "event_type").agg(
        F.count(F.lit(1)).alias("n"))
    m = counts.groupBy("user_id").agg(
        F.map_from_entries(
            F.collect_list(F.struct("event_type", "n"))).alias("m"))
    total = F.aggregate(F.map_values("m"), F.lit(0).cast("long"),
                        lambda acc, x: acc + x)
    shares = F.transform_values(
        F.col("m"), lambda k, v: v.cast("double") / F.col("total"))
    return (m.withColumn("total", total)
             .withColumn("shares", F.map_filter(shares, lambda k, v: v >= 0.1))
             .select("user_id", F.explode("shares")
                     .alias("event_type", "share_raw"))
             .select("user_id", "event_type",
                     F.round("share_raw", 6).alias("share")))


@register(
    "fn_format",
    oracle="""
    SELECT o_orderkey,
           format('{:,}', CAST(round(o_totalprice * 100) AS BIGINT))
               AS cents_grouped,
           printf('%05d|%.2f', CAST(o_orderkey % 10000 AS INT),
                  round(o_totalprice, 2)) AS padded,
           lpad(CAST(o_orderkey AS VARCHAR), 12, '0') AS key_padded
    FROM orders
    """,
)
def fn_format(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Output formatting family: thousands-grouped number rendering,
    printf-style composition, zero-padded keys — report/export surface.
    All JVM string expressions."""
    o = load_table(spark, "orders", sf_dir)
    cents = F.round(F.col("o_totalprice") * 100).cast("long")
    return o.select(
        "o_orderkey",
        F.format_number(cents, 0).alias("cents_grouped"),
        F.format_string("%05d|%.2f",
                        (F.col("o_orderkey") % 10000).cast("int"),
                        F.round("o_totalprice", 2)).alias("padded"),
        F.lpad(F.col("o_orderkey").cast("string"), 12, "0")
         .alias("key_padded"))


@register(
    "fn_trig",
    oracle="""
    SELECT l_orderkey, l_linenumber,
           ROUND(sin(radians(l_discount * 3600)), 6) + 0.0 AS s,
           ROUND(cos(radians(l_discount * 3600)), 6) + 0.0 AS c,
           ROUND(atan2(l_tax + 0.001, l_discount + 0.001), 6) + 0.0 AS a2,
           ROUND(degrees(atan(l_quantity / 50.0)), 6) + 0.0 AS deg,
           ROUND(ln(l_extendedprice), 6) + 0.0 AS lnp,
           ROUND(log10(l_extendedprice), 6) + 0.0 AS lgp
    FROM lineitem
    """,
)
def fn_trig(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Trigonometric / logarithmic family (sin, cos, atan2, degrees/
    radians, ln, log10) — geo/angle math surface; every expression a
    codegen'd JVM intrinsic.

    Every rounded output gets ``+ 0.0``: sin() of an exact multiple of 2π
    lands at ~-2e-16, which ROUND(…, 6) keeps as IEEE negative zero in
    DuckDB but not in Spark — adding positive zero canonicalizes -0.0 to
    0.0 in both engines (r02 driver hash-mismatch root cause)."""
    li = load_table(spark, "lineitem", sf_dir)
    ang = F.radians(F.col("l_discount") * 3600)
    z = F.lit(0.0)
    return li.select(
        "l_orderkey", "l_linenumber",
        (F.round(F.sin(ang), 6) + z).alias("s"),
        (F.round(F.cos(ang), 6) + z).alias("c"),
        (F.round(F.atan2(F.col("l_tax") + 0.001, F.col("l_discount") + 0.001),
                 6) + z).alias("a2"),
        (F.round(F.degrees(F.atan(F.col("l_quantity") / 50.0)), 6) + z)
        .alias("deg"),
        (F.round(F.log(F.col("l_extendedprice")), 6) + z).alias("lnp"),
        (F.round(F.log10("l_extendedprice"), 6) + z).alias("lgp"))


@register(
    "fn_binary",
    oracle="""
    SELECT doc_id,
           base64(encode(substring(text, 1, 12))) AS b64,
           hex(substring(text, 1, 6)) AS hx,
           ascii(substring(text, 1, 1)) AS first_cp,
           chr(65 + CAST(doc_id % 26 AS INT)) AS letter
    FROM documents
    """,
)
def fn_binary(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Binary/encoding family: base64, hex dump, codepoint extraction,
    codepoint→char construction — the wire-format helpers for opaque
    payload columns (multimodal binary columns ship through these)."""
    d = load_table(spark, "documents", sf_dir)
    return d.select(
        "doc_id",
        F.base64(F.substring("text", 1, 12).cast("binary")).alias("b64"),
        F.hex(F.substring("text", 1, 6)).alias("hx"),
        F.ascii(F.substring("text", 1, 1)).alias("first_cp"),
        F.char(F.lit(65) + (F.col("doc_id") % 26).cast("int")).alias("letter"))


@register(
    "fn_datetime_tz",
    oracle="""
    SELECT event_id,
           CAST(timezone('America/New_York', CAST(ts AS TIMESTAMPTZ))
                AS TIMESTAMP) AS ny_wall,
           CAST(timezone('Asia/Tokyo', CAST(ts AS TIMESTAMPTZ))
                AS TIMESTAMP) AS tokyo_wall,
           CAST(EXTRACT(hour FROM timezone('America/New_York',
                CAST(ts AS TIMESTAMPTZ))) AS INT) AS ny_hour,
           CAST(timezone('America/New_York',
                CAST(timezone('America/New_York', CAST(ts AS TIMESTAMPTZ))
                     AS TIMESTAMP)) AS TIMESTAMP) AS roundtrip_utc
    FROM events
    """,
)
def fn_datetime_tz(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Timezone conversion family: UTC instants → market-local wall
    times (from_utc_timestamp), local hour extraction, and the
    to_utc_timestamp round-trip proving the two are inverses. The
    session stays pinned to UTC (SURVEY.md §5 discipline); zone-aware
    rendering happens per-expression, never via session state — the
    only sane arrangement when one 100 TB table serves readers in
    every region. DuckDB twin: timezone(tz, TIMESTAMPTZ) is
    from_utc, timezone(tz, TIMESTAMP) is to_utc."""
    ev = load_table(spark, "events", sf_dir)
    ny = F.from_utc_timestamp("ts", "America/New_York")
    return ev.select(
        "event_id",
        ny.alias("ny_wall"),
        F.from_utc_timestamp("ts", "Asia/Tokyo").alias("tokyo_wall"),
        F.hour(ny).cast("int").alias("ny_hour"),
        F.to_utc_timestamp(ny, "America/New_York").alias("roundtrip_utc"))


@register(
    "fn_variant",
    oracle="""
    SELECT event_id,
           CAST(json_extract(props, '$.k') AS INT) AS k,
           (json_extract(props, '$.k') IS NOT NULL) AS has_k,
           json(props)::VARCHAR AS normalized
    FROM events
    """,
)
def fn_variant(spark: SparkSession, sf_dir: str) -> DataFrame:
    """VariantType surface (Spark 4): parse the JSON event payload
    ONCE into the binary variant encoding, then take typed paths out
    with variant_get — the open-schema answer to from_json's
    fixed-StructType contract (the reference's payloads are
    schema-flexible JSON, /root/reference/README.md:75, so a CDC
    consumer can't always pre-declare the struct).

    Variant beats per-path get_json_object at scale: one parse per
    row instead of one per extracted path, and the binary encoding
    pushes shredded-path reads down in formats that support it.
    to_json(variant) round-trips to minified JSON — DuckDB's json()
    normalization, making the whole family oracle-checkable.

    The typed cast uses try_variant_get (NULL, not error, on a
    non-int-castable k) and presence uses the UNTYPED variant_get —
    a present-but-string/null k must report has_k the way the
    oracle's json_extract IS NOT NULL does; the strict typed form
    would either raise or report false for it."""
    ev = load_table(spark, "events", sf_dir)
    v = F.parse_json("props")
    return ev.select(
        "event_id",
        F.expr("try_variant_get(parse_json(props), '$.k', 'int')").alias("k"),
        F.expr("variant_get(parse_json(props), '$.k') IS NOT NULL")
         .alias("has_k"),
        F.to_json(v).alias("normalized"))


@register(
    "fn_try_arith",
    oracle="""
    SELECT l_orderkey, l_linenumber,
           CASE WHEN l_tax = 0 THEN NULL
                ELSE ROUND(l_extendedprice / l_tax, 4) END AS price_per_tax,
           CASE WHEN l_quantity = 0 THEN NULL
                ELSE CAST(floor(l_extendedprice) AS BIGINT)
                     // CAST(floor(l_quantity) AS BIGINT) END AS unit_floor,
           try_cast(l_returnflag AS INT) AS flag_as_int
    FROM lineitem
    """,
)
def fn_try_arith(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Error-safe arithmetic family: try_divide / integer try_divide /
    try_cast return NULL where strict evaluation would raise (divide
    by zero, invalid cast) — the per-event "correction" posture the
    reference assigns to plugins (README.md:89: fix or drop bad
    records) expressed as engine semantics. At 100 TB a single
    malformed row must never kill a 6-hour job; the try_* family turns
    the failure into a filterable NULL instead."""
    li = load_table(spark, "lineitem", sf_dir)
    return li.select(
        "l_orderkey", "l_linenumber",
        F.round(F.try_divide("l_extendedprice", "l_tax"), 4)
         .alias("price_per_tax"),
        F.expr("try_divide(CAST(floor(l_extendedprice) AS BIGINT), "
               "CAST(floor(l_quantity) AS BIGINT))").cast("bigint")
         .alias("unit_floor"),
        F.try_to_number("l_returnflag", F.lit("9")).cast("int")
         .alias("flag_as_int"))


@register(
    "decode_canal_json",
    oracle="""
    SELECT event_id, user_id,
           CASE WHEN event_type = 'signup' THEN 'I'
                WHEN event_type = 'error' THEN 'D' ELSE 'U' END AS op,
           ROUND(value, 4) AS value,
           CASE WHEN event_type NOT IN ('signup', 'error')
                THEN ROUND(value - 1, 4) END AS old_value,
           epoch_ms(ts) AS commit_ms
    FROM events
    """,
    tags=("cdc",),
)
def decode_canal_json(spark: SparkSession, sf_dir: str) -> DataFrame:
    """canal-json wire-format decode — TiCDC's actual Kafka output
    protocol (the reference pushes ordered row changes downstream,
    README.md:17, serialized as JSON, README.md:75; canal-json is the
    format its Kafka sink emits).  The query first CONSTRUCTS the
    canal-json message a TiCDC consumer would receive (type INSERT/
    UPDATE/DELETE, `es` commit millis, `data` = row image as a
    string-valued object, `old` = changed columns' prior values on
    UPDATE — all values stringified, as canal does), then decodes it
    with one typed `from_json` pass: MAP<STRING,STRING> for the row
    objects (schema-free, as real consumers must), `element_at` field
    access, string→numeric casts back to typed columns.  The oracle
    computes the same result from the raw events, so a lossy
    stringify, a wrong op mapping, or a dropped `old` image all
    hash-fail.  One parse per row, JVM-side end to end.

    Parallelism guard: the sf0.1 events fixture is ONE single-row-group
    parquet file, so the scan yields a handful of mostly-empty splits
    and the (CPU-bound) construct+parse chain runs on ~one core while
    the rest idle — the bench's concurrent-wall floor.  When the scan
    gives fewer partitions than the cluster has slots, redistribute
    once before the JSON work (a 100k-row shuffle buys a 32-way
    parse); on a real cluster the scan already yields >= cores splits
    and no shuffle is added.  The probe is `scan_splits_estimate`
    (catalog.py) — Spark's FilePartition formula over the scan's
    cached file listing — NOT `df.rdd.getNumPartitions()`, whose
    plan-to-RDD conversion cost (~0.1 s driver-side, any SF) dominated
    this query's measured plan-build (VERDICT r10 task 2; the r9-r10
    latency-watch escalation traced exactly here)."""
    ev = load_table(spark, "events", sf_dir)
    from cdc_plg_spark.catalog import scan_splits_estimate

    if (scan_splits_estimate(spark, ev)
            < spark.sparkContext.defaultParallelism):
        ev = ev.repartition(spark.sparkContext.defaultParallelism)
    is_i = F.col("event_type") == "signup"
    is_d = F.col("event_type") == "error"
    row_map = F.create_map(
        F.lit("event_id"), F.col("event_id").cast("string"),
        F.lit("user_id"), F.col("user_id").cast("string"),
        F.lit("value"), F.col("value").cast("string"))
    old_map = F.create_map(
        F.lit("value"), (F.col("value") - 1).cast("string"))
    wire = ev.select(F.to_json(F.struct(
        F.lit("app").alias("database"),
        F.lit("events").alias("table"),
        F.array(F.lit("event_id")).alias("pkNames"),
        F.lit(False).alias("isDdl"),
        F.when(is_i, "INSERT").when(is_d, "DELETE")
         .otherwise("UPDATE").alias("type"),
        F.unix_millis("ts").alias("es"),
        F.array(row_map).alias("data"),
        F.when(~(is_i | is_d), F.array(old_map)).alias("old"),
    )).alias("payload"))
    schema = ("database STRING, table STRING, pkNames ARRAY<STRING>, "
              "isDdl BOOLEAN, type STRING, es BIGINT, "
              "data ARRAY<MAP<STRING,STRING>>, old ARRAY<MAP<STRING,STRING>>")
    m = wire.select(F.from_json("payload", schema).alias("e"))
    row = F.element_at(F.col("e.data"), 1)
    old = F.element_at(F.col("e.old"), 1)
    return m.select(
        row["event_id"].cast("bigint").alias("event_id"),
        row["user_id"].cast("bigint").alias("user_id"),
        F.when(F.col("e.type") == "INSERT", "I")
         .when(F.col("e.type") == "DELETE", "D")
         .otherwise("U").alias("op"),
        fast_round(row["value"].cast("double"), 4).alias("value"),
        fast_round(old["value"].cast("double"), 4).alias("old_value"),
        F.col("e.es").alias("commit_ms"))


# --- Debezium / Maxwell wire decodes --------------------------------
# The other two widely-deployed CDC JSON wire formats next to canal
# (decode_canal_json above).  Implemented and pytest-verified in r6;
# registration landed r7 (the only two new registry ids this round, by
# VERDICT r6's drain-budget plan).

DECODE_DEBEZIUM_ORACLE = """
    SELECT event_id, user_id,
           CASE WHEN event_type = 'signup' THEN 'I'
                WHEN event_type = 'error' THEN 'D' ELSE 'U' END AS op,
           ROUND(value, 4) AS value,
           CASE WHEN event_type NOT IN ('signup', 'error')
                THEN ROUND(value - 1, 4) END AS old_value,
           epoch_ms(ts) AS commit_ms
    FROM events
"""


@register("decode_debezium_json", oracle=DECODE_DEBEZIUM_ORACLE,
          tags=("cdc",))
def decode_debezium_json(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Debezium-JSON envelope decode (README.md:17,75 — ordered row
    changes serialized as JSON; Debezium's `payload.before/after/
    source/op` envelope is the de-facto Kafka CDC wire format).  Same
    construct-then-decode pattern as `decode_canal_json`: first build
    the message a Debezium consumer would receive (op c/u/d, full
    `before` image on u/d, `after` on c/u, `source.ts_ms` commit
    millis — values TYPED, Debezium does not stringify like canal),
    then decode with one typed `from_json` pass and project the row
    image per op (after for c/u, before for d).  A lossy image, a
    wrong op mapping, or a dropped `before` all fail the oracle."""
    ev = load_table(spark, "events", sf_dir)
    is_i = F.col("event_type") == "signup"
    is_d = F.col("event_type") == "error"
    row = F.struct("event_id", "user_id", "value")
    prior = F.struct("event_id", "user_id",
                     (F.col("value") - 1).alias("value"))
    wire = ev.select(F.to_json(F.struct(F.struct(
        F.when(is_d, row).when(~is_i, prior).alias("before"),
        F.when(~is_d, row).alias("after"),
        F.struct(F.lit("app").alias("db"), F.lit("events").alias("table"),
                 F.unix_millis("ts").alias("ts_ms")).alias("source"),
        F.when(is_i, "c").when(is_d, "d").otherwise("u").alias("op"),
        F.unix_millis("ts").alias("ts_ms"),
    ).alias("payload")).alias("msg")).alias("msg"))
    img = "STRUCT<event_id:BIGINT,user_id:BIGINT,value:DOUBLE>"
    schema = (f"payload STRUCT<before:{img}, after:{img}, "
              "source:STRUCT<db:STRING,table:STRING,ts_ms:BIGINT>, "
              "op:STRING, ts_ms:BIGINT>")
    p = wire.select(F.from_json("msg", schema)["payload"].alias("p"))
    image = F.when(F.col("p.op") == "d", F.col("p.before")) \
             .otherwise(F.col("p.after"))
    return p.select(
        image["event_id"].alias("event_id"),
        image["user_id"].alias("user_id"),
        F.when(F.col("p.op") == "c", "I")
         .when(F.col("p.op") == "d", "D").otherwise("U").alias("op"),
        fast_round(image["value"], 4).alias("value"),
        fast_round(F.when(F.col("p.op") == "u",
                          F.col("p.before")["value"]), 4)
         .alias("old_value"),
        F.col("p.source.ts_ms").alias("commit_ms"))


DECODE_MAXWELL_ORACLE = """
    SELECT event_id, user_id,
           CASE WHEN event_type = 'signup' THEN 'I'
                WHEN event_type = 'error' THEN 'D' ELSE 'U' END AS op,
           ROUND(value, 4) AS value,
           CASE WHEN event_type NOT IN ('signup', 'error')
                THEN ROUND(value - 1, 4) END AS old_value,
           epoch_ms(ts) // 1000 * 1000 AS commit_ms
    FROM events
"""


@register("decode_maxwell_json", oracle=DECODE_MAXWELL_ORACLE,
          tags=("cdc",))
def decode_maxwell_json(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Maxwell-JSON decode — the third common CDC wire format
    (README.md:17,75).  Maxwell's envelope is flat: `database/table/
    type/ts/data/old`, with `ts` in SECONDS (the oracle truncates
    commit_ms accordingly — a faithful decode must not invent
    sub-second precision the wire never carried) and `old` holding
    only the CHANGED columns' prior values on update, whole-row
    `data` on every op (deletes ship the deleted image in `data`,
    unlike Debezium's `before`)."""
    ev = load_table(spark, "events", sf_dir)
    is_i = F.col("event_type") == "signup"
    is_d = F.col("event_type") == "error"
    wire = ev.select(F.to_json(F.struct(
        F.lit("app").alias("database"),
        F.lit("events").alias("table"),
        F.when(is_i, "insert").when(is_d, "delete")
         .otherwise("update").alias("type"),
        (F.unix_millis("ts") / 1000).cast("bigint").alias("ts"),
        F.struct("event_id", "user_id", "value").alias("data"),
        F.when(~(is_i | is_d),
               F.struct((F.col("value") - 1).alias("value"))).alias("old"),
    )).alias("msg"))
    schema = ("database STRING, table STRING, type STRING, ts BIGINT, "
              "data STRUCT<event_id:BIGINT,user_id:BIGINT,value:DOUBLE>, "
              "old STRUCT<value:DOUBLE>")
    m = wire.select(F.from_json("msg", schema).alias("e"))
    return m.select(
        F.col("e.data.event_id").alias("event_id"),
        F.col("e.data.user_id").alias("user_id"),
        F.when(F.col("e.type") == "insert", "I")
         .when(F.col("e.type") == "delete", "D")
         .otherwise("U").alias("op"),
        fast_round("e.data.value", 4).alias("value"),
        fast_round("e.old.value", 4).alias("old_value"),
        (F.col("e.ts") * 1000).alias("commit_ms"))
