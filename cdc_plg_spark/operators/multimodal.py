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
