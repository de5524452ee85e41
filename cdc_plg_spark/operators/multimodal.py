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
    """Real decode kernel — requires an image library absent from this
    container; the engine ships the plumbing, callers swap this in."""
    raise NotImplementedError(
        "image decode requires PIL/opencv (not in this container); "
        "use _fake_decode for deterministic tests")


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
