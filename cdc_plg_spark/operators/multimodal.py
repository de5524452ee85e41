"""Multimodal-column plumbing (north-star mandate).

Images/audio/video are opaque `binary` columns plus typed metadata;
decode / feature-extract / frame-sample run as Arrow-batched
`mapInPandas` stages. The media libraries are NOT in this container
(per the environment contract), so the decode kernel is a
clearly-marked deterministic stub — the Spark-side plumbing (binary
schema, batch iteration, UDF signatures, partitioning) is real and
oracle-checked where the fake is SQL-reproducible.

At 100 TB: binary payloads dominate bytes — the plumbing keeps them
out of shuffles (decode early, project metadata, drop payload) and
processes them partition-local in Arrow batches.
"""

from __future__ import annotations

from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from cdc_plg_spark.catalog import load_table
from cdc_plg_spark.registry import register


def decode_image(payload: bytes) -> dict:
    """Decode kernel for COMPRESSED formats (JPEG/PNG/WebP) — requires
    a codec library absent from this container; the engine ships the
    plumbing, callers swap this in.  Uncompressed PPM decodes for REAL
    via `decode_ppm` below (pure numpy, no codec needed)."""
    raise NotImplementedError(
        "compressed-image decode requires PIL/opencv (not in this "
        "container); PPM/PGM payloads decode via decode_ppm")


def encode_ppm(pixels) -> bytes:
    """REAL binary P6 (raw RGB) PPM encoder — numpy only.  `pixels` is
    an (h, w, 3) uint8 array."""
    h, w, _ = pixels.shape
    header = b"P6\n# cdc-plg\n%d %d\n255\n" % (w, h)
    return header + pixels.tobytes()


def decode_ppm(payload: bytes):
    """REAL binary P6 PPM decoder — numpy only, no codec library.
    Parses the header (magic, optional `#` comment lines, dimensions,
    maxval), then views the raw RGB plane as an (h, w, 3) uint8 array
    with np.frombuffer — zero-copy over the payload bytes."""
    import numpy as np

    if not payload.startswith(b"P6"):
        raise ValueError("not a binary PPM (P6) payload")
    pos, fields = 2, []
    while len(fields) < 3:
        while pos < len(payload) and payload[pos:pos + 1].isspace():
            pos += 1
        if payload[pos:pos + 1] == b"#":        # comment to end of line
            pos = payload.index(b"\n", pos) + 1
            continue
        end = pos
        while not payload[end:end + 1].isspace():
            end += 1
        fields.append(int(payload[pos:end]))
        pos = end
    pos += 1                                    # single whitespace after maxval
    w, h, maxval = fields
    if maxval != 255:
        raise ValueError(f"unsupported maxval {maxval}")
    px = np.frombuffer(payload, dtype=np.uint8,
                       count=w * h * 3, offset=pos).reshape(h, w, 3)
    return w, h, px


def resize_nearest(px, out_w: int, out_h: int):
    """REAL nearest-neighbor resize: pure numpy index arithmetic
    (the same sampling OpenCV's INTER_NEAREST does)."""
    import numpy as np

    h, w, _ = px.shape
    xs = (np.arange(out_w) * w) // out_w
    ys = (np.arange(out_h) * h) // out_h
    return px[ys[:, None], xs[None, :], :]


def _fake_decode(payload: bytes) -> tuple[int, int, int]:
    """Deterministic stand-in for decode: derives (n_bytes, width,
    height) purely from the payload length so the DuckDB oracle can
    reproduce it."""
    n = len(payload)
    return n, n % 640, (n * 7) % 480


@register(
    "mm_decode_stub",
    oracle="""
    SELECT doc_id,
           n_chars AS n_bytes,
           n_chars % 640 AS width,
           (n_chars * 7) % 480 AS height
    FROM documents
    """,
)
def mm_decode_stub(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Binary-column decode pipeline: text → binary payload column →
    mapInPandas batch 'decode' (stubbed, deterministic) → typed
    metadata. The payload is dropped immediately after decode so the
    heavy bytes never reach a shuffle."""

    def decode_batches(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            meta = [_fake_decode(p) for p in pdf["payload"]]
            yield pd.DataFrame({
                "doc_id": pdf["doc_id"],
                "n_bytes": [m[0] for m in meta],
                "width": [m[1] for m in meta],
                "height": [m[2] for m in meta],
            })

    d = load_table(spark, "documents", sf_dir)
    binary = d.select("doc_id", F.col("text").cast("binary").alias("payload"))
    return binary.mapInPandas(
        decode_batches, "doc_id bigint, n_bytes bigint, width bigint, height bigint")


@register(
    "mm_frame_sample",
    oracle="""
    SELECT doc_id, unnest(generate_series(0, (n_chars % 240), 30)) AS frame_idx
    FROM documents
    """,
)
def mm_frame_sample(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Video frame sampling shape: each asset declares a frame count in
    its metadata (faked from n_chars); emit every 30th frame index as a
    row — the JVM `sequence`+`explode` generator, no Python, so a
    billion-video corpus fans out without a UDF in the loop."""
    d = load_table(spark, "documents", sf_dir)
    n_frames = F.col("n_chars") % 240
    return (d.select(
        "doc_id",
        F.explode(F.sequence(F.lit(0), n_frames, F.lit(30))).alias("frame_idx")))


@register(
    "mm_resize_stub",
    oracle="""
    WITH meta AS (
        SELECT doc_id, n_chars AS n_bytes,
               1 + (n_chars % 640) AS w, 1 + ((n_chars * 7) % 480) AS h
        FROM documents
    )
    SELECT doc_id, w, h,
           CAST(floor(w * least(256.0 / w, 256.0 / h)) AS BIGINT) AS new_w,
           CAST(floor(h * least(256.0 / w, 256.0 / h)) AS BIGINT) AS new_h,
           least(n_bytes,
                 CAST(floor(w * least(256.0 / w, 256.0 / h)) AS BIGINT)
                 * CAST(floor(h * least(256.0 / w, 256.0 / h)) AS BIGINT))
               AS out_bytes
    FROM meta
    """,
)
def mm_resize_stub(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Image resize plumbing: decode metadata → fit-into-256×256 box
    (aspect-preserving) → re-encode. The pixel work is the stubbed part
    (out_bytes caps at new_w*new_h); the engine part is real — resize
    params computed per Arrow batch in numpy, payload bytes dropped
    before any shuffle, output schema typed."""

    def resize_batches(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        import numpy as np

        for pdf in batches:
            n = pdf["payload"].str.len().to_numpy(dtype="int64")
            w = 1 + (n % 640)
            h = 1 + ((n * 7) % 480)
            scale = np.minimum(256.0 / w, 256.0 / h)
            new_w = np.floor(w * scale).astype("int64")
            new_h = np.floor(h * scale).astype("int64")
            yield pd.DataFrame({
                "doc_id": pdf["doc_id"], "w": w, "h": h,
                "new_w": new_w, "new_h": new_h,
                "out_bytes": np.minimum(n, new_w * new_h),
            })

    d = load_table(spark, "documents", sf_dir)
    binary = d.select("doc_id", F.col("text").cast("binary").alias("payload"))
    return binary.mapInPandas(
        resize_batches,
        "doc_id bigint, w bigint, h bigint, new_w bigint, new_h bigint, "
        "out_bytes bigint")


@register(
    "mm_decode_ppm_real",
    oracle="""
    WITH dims AS (
        SELECT doc_id,
               CAST(1 + doc_id % 31 AS BIGINT) AS w,
               CAST(1 + doc_id % 17 AS BIGINT) AS h
        FROM documents),
    xs AS (
        SELECT doc_id, w, h,
               unnest(generate_series(0, w - 1)) AS x
        FROM dims),
    px AS (
        SELECT doc_id, w, h, x,
               unnest(generate_series(0, h - 1)) AS y
        FROM xs),
    vals AS (
        SELECT doc_id, w, h,
               (doc_id * 7 + x * 3 + y * 5) % 256 AS r,
               (doc_id * 7 + x * 3 + y * 5 + 11) % 256 AS g,
               (doc_id * 7 + x * 3 + y * 5 + 22) % 256 AS b
        FROM px),
    sums AS (
        SELECT doc_id, w, h,
               CAST(SUM(r) AS BIGINT) AS sum_r,
               CAST(SUM(g) AS BIGINT) AS sum_g,
               CAST(SUM(b) AS BIGINT) AS sum_b
        FROM vals GROUP BY 1, 2, 3),
    r_xs AS (
        SELECT doc_id, w, h,
               unnest(generate_series(0, 7)) AS xo
        FROM dims),
    r_px AS (
        SELECT doc_id, w, h, (xo * w) // 8 AS sx,
               unnest(generate_series(0, 7)) AS yo
        FROM r_xs),
    rsums AS (
        SELECT doc_id,
               CAST(SUM((doc_id * 7 + sx * 3 + ((yo * h) // 8) * 5) % 256
                        + (doc_id * 7 + sx * 3 + ((yo * h) // 8) * 5 + 11) % 256
                        + (doc_id * 7 + sx * 3 + ((yo * h) // 8) * 5 + 22) % 256)
                    AS BIGINT) AS resized_checksum
        FROM r_px GROUP BY 1)
    SELECT s.doc_id, s.w, s.h,
           CAST(19 + length(CAST(s.w AS VARCHAR))
                   + length(CAST(s.h AS VARCHAR))
                   + 3 * s.w * s.h AS BIGINT) AS n_bytes,
           s.sum_r, s.sum_g, s.sum_b, r.resized_checksum
    FROM sums s JOIN rsums r USING (doc_id)
    """,
)
def mm_decode_ppm_real(spark: SparkSession, sf_dir: str) -> DataFrame:
    """REAL image decode — no stub, no codec library: binary P6 PPM
    payloads are ENCODED (header + raw RGB bytes), then a separate
    Arrow-batched stage PARSES the actual bytes back (`decode_ppm`:
    magic, comment lines, dims, maxval, zero-copy np.frombuffer pixel
    view), computes exact per-channel integer sums, and runs a real
    nearest-neighbor resize to 8×8 (`resize_nearest`) whose pixel
    checksum the oracle recomputes from the generating formula.  Any
    header-parse offset error, stride mistake, channel swap or resize
    index bug changes an integer and hash-fails.

    The pixel pattern (v = (7·doc_id + 3x + 5y + 11c) mod 256) exists
    so DuckDB can reproduce the EXPECTED result without decoding —
    the Spark side never shortcuts through it after encode: the
    decode stage sees only bytes.  Compressed formats (JPEG/PNG) still
    need a codec library (`decode_image` raises); this proves the
    engine's decode path — batching, header parsing, pixel math,
    payload-dropped-before-shuffle — on the format that needs none.

    100 TB shape: encode/decode are partition-local mapInPandas stages;
    only (doc_id, 8 ints) survive to the output — payload bytes never
    reach a shuffle."""
    import numpy as np

    def encode_batches(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            out = []
            for doc_id in pdf["doc_id"]:
                w, h = 1 + doc_id % 31, 1 + doc_id % 17
                base = (doc_id * 7 + 3 * np.arange(w)[None, :, None]
                        + 5 * np.arange(h)[:, None, None]
                        + 11 * np.arange(3)[None, None, :]) % 256
                out.append(encode_ppm(base.astype(np.uint8)))
            yield pd.DataFrame({"doc_id": pdf["doc_id"], "payload": out})

    def decode_batches(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        rows = {k: [] for k in ("doc_id", "w", "h", "n_bytes", "sum_r",
                                "sum_g", "sum_b", "resized_checksum")}
        for pdf in batches:
            for doc_id, payload in zip(pdf["doc_id"], pdf["payload"]):
                w, h, px = decode_ppm(bytes(payload))
                sums = px.astype(np.int64).sum(axis=(0, 1))
                small = resize_nearest(px, 8, 8)
                rows["doc_id"].append(doc_id)
                rows["w"].append(w)
                rows["h"].append(h)
                rows["n_bytes"].append(len(payload))
                rows["sum_r"].append(int(sums[0]))
                rows["sum_g"].append(int(sums[1]))
                rows["sum_b"].append(int(sums[2]))
                rows["resized_checksum"].append(
                    int(small.astype(np.int64).sum()))
        yield pd.DataFrame(rows)

    d = load_table(spark, "documents", sf_dir).select("doc_id")
    encoded = d.mapInPandas(encode_batches, "doc_id bigint, payload binary")
    return encoded.mapInPandas(
        decode_batches,
        "doc_id bigint, w bigint, h bigint, n_bytes bigint, sum_r bigint, "
        "sum_g bigint, sum_b bigint, resized_checksum bigint")


@register(
    "mm_audio_chunks",
    oracle="""
    WITH chunks AS (
        SELECT doc_id, n_chars AS n_samples,
               unnest(generate_series(0, n_chars - 1, 4000)) AS chunk_start
        FROM documents WHERE n_chars > 0
    )
    SELECT doc_id, chunk_start,
           least(chunk_start + 4000, n_samples) AS chunk_end,
           least(chunk_start + 4000, n_samples) - chunk_start AS chunk_len
    FROM chunks
    """,
)
def mm_audio_chunks(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Audio feature-extraction shape: a waveform (n_samples from
    metadata; real audio would be the binary payload) split into fixed
    4000-sample windows — one row per chunk with exact boundaries. The
    fan-out is JVM sequence+explode (no Python in the loop); the
    per-chunk DSP kernel would slot into a mapInPandas stage exactly
    like mm_resize_stub's."""
    d = load_table(spark, "documents", sf_dir).filter(F.col("n_chars") > 0)
    starts = F.sequence(F.lit(0), F.col("n_chars") - 1, F.lit(4000))
    return (d.select("doc_id", F.col("n_chars").alias("n_samples"),
                     F.explode(starts).alias("chunk_start"))
            .select("doc_id", "chunk_start",
                    F.least(F.col("chunk_start") + 4000,
                            F.col("n_samples")).alias("chunk_end"),
                    (F.least(F.col("chunk_start") + 4000, F.col("n_samples"))
                     - F.col("chunk_start")).alias("chunk_len")))
