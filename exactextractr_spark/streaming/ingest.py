"""Structured Streaming tile ingest: image table dir → decoded tile store.

The reference is single-pass batch; streaming is our extension for
incremental tile arrival (e.g. new imagery appended to the Iceberg table).
``readStream`` over the image-table directory → the same Arrow decode as
batch → append-mode sink partitioned by tile key, so downstream zonal jobs
prune by partition. Watermarks are not needed (tiles are facts, not
events); exactly-once comes from the file-source + checkpoint contract.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession

from ..sources.tiles import TILE_SCHEMA, decode_tiles


def stream_decode_tiles(
    spark: SparkSession,
    source_dir: str,
    sink_dir: str,
    checkpoint_dir: str,
    *,
    available_now: bool = True,
):
    """Start (or run-to-completion with availableNow) the ingest stream.
    Returns the StreamingQuery."""
    raw = (
        spark.readStream.schema(TILE_SCHEMA)
        .option("maxFilesPerTrigger", 64)
        .parquet(source_dir)
    )
    decoded = decode_tiles(raw)
    writer = (
        decoded.writeStream.format("parquet")
        .option("path", sink_dir)
        .option("checkpointLocation", checkpoint_dir)
        .outputMode("append")
    )
    if available_now:
        writer = writer.trigger(availableNow=True)
    return writer.start()


def stream_image_features(
    spark: SparkSession,
    source_dir: str,
    sink_dir: str,
    checkpoint_dir: str,
    *,
    available_now: bool = True,
    max_files_per_trigger: int = 64,
):
    """Continuous multimodal featurization: ``readStream`` over the image
    table → the SAME Arrow decode+feature kernel as batch
    ``operators.multimodal.image_features`` (a stateless ``mapInPandas``
    composes unchanged with streaming) → append-mode parquet sink.
    Per-image results are bit-identical to a batch run over the same
    tiles (test-asserted); exactly-once comes from the file-source +
    checkpoint contract, no stateful operator involved — the ingest rate
    is the only scale variable. Returns the StreamingQuery."""
    from ..operators.multimodal import image_features

    raw = (
        spark.readStream.schema(TILE_SCHEMA)
        .option("maxFilesPerTrigger", max_files_per_trigger)
        .parquet(source_dir)
    )
    feats = image_features(raw)
    writer = (
        feats.writeStream.format("parquet")
        .option("path", sink_dir)
        .option("checkpointLocation", checkpoint_dir)
        .outputMode("append")
    )
    if available_now:
        writer = writer.trigger(availableNow=True)
    return writer.start()
