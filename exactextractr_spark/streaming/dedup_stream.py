"""Structured Streaming exact deduplication: continuously-arriving document
files → first-seen-wins distinct store.

The reference engine is single-pass batch (no streaming surface); this is
the Spark-native extension for the continuous-ingest corpus: ``readStream``
over the documents directory → the SAME normalization + sha-256 content key
as batch ``operators.dedup.exact_dedup`` → Spark's built-in stateful
``dropDuplicates`` (state-store managed, exactly-once across micro-batches
via the file-source + checkpoint contract).

Scale shape (the 100-TB argument):

- State is ONE 32-byte sha-256 key per *distinct* document — never the
  document text — partitioned by key across executors by the state store.
  Unbounded-history mode therefore costs O(distinct docs) state, the
  theoretical minimum for exact dedup.
- For truly unbounded ingest, pass ``ts_col`` + ``watermark_delay``:
  ``dropDuplicatesWithinWatermark`` expires keys older than the watermark,
  bounding state by the distinct-rate × window instead of all history —
  the standard TTL tradeoff (a dup arriving later than the window
  re-surfaces, exactly as documented for the operator).
- Dedup semantics vs batch: batch ``exact_dedup`` keeps the LOWEST id per
  content key (order-free, re-runnable); streaming keeps the FIRST-ARRIVED
  row. When files arrive in id order the two agree (test-asserted); within
  one micro-batch the surviving *row* for a co-occurring dup pair is not
  specified (the surviving content-key set always is).
"""

from __future__ import annotations

from pyspark.sql import SparkSession
from pyspark.sql import functions as F


def stream_exact_dedup(
    spark: SparkSession,
    source_dir: str,
    sink_dir: str,
    checkpoint_dir: str,
    *,
    text_col: str = "text",
    normalize: bool = True,
    ts_col: "str | None" = None,
    watermark_delay: "str | None" = None,
    max_files_per_trigger: int = 16,
    available_now: bool = True,
    query_name: str = "dedup_stream",
):
    """Start (or run-to-completion with availableNow) the dedup stream.

    Appends first-seen rows to ``sink_dir`` as parquet; returns the
    StreamingQuery. With ``ts_col`` + ``watermark_delay`` (e.g. ``"10
    minutes"``) state is watermark-bounded via
    ``dropDuplicatesWithinWatermark``; otherwise keys are kept forever
    (exact dedup over all history).
    """
    if (ts_col is None) != (watermark_delay is None):
        raise ValueError(
            "ts_col and watermark_delay must be passed together: one "
            "without the other would silently fall back to unbounded "
            "state, defeating the TTL the caller asked for"
        )
    from ..operators.dedup import content_key

    schema = spark.read.parquet(source_dir).schema
    docs = (
        spark.readStream.schema(schema)
        .option("maxFilesPerTrigger", max_files_per_trigger)
        .parquet(source_dir)
    )
    keyed = docs.withColumn("_h", content_key(F.col(text_col), normalize))
    if ts_col is not None and watermark_delay is not None:
        deduped = keyed.withWatermark(ts_col, watermark_delay)
        deduped = deduped.dropDuplicatesWithinWatermark(["_h"])
    else:
        deduped = keyed.dropDuplicates(["_h"])
    writer = (
        deduped.drop("_h")
        .writeStream.format("parquet")
        .option("path", sink_dir)
        .option("checkpointLocation", checkpoint_dir)
        .outputMode("append")
        .queryName(query_name)
    )
    if available_now:
        writer = writer.trigger(availableNow=True)
    return writer.start()
