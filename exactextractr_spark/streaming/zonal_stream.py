"""Structured Streaming zonal statistics: incremental tile arrival →
continuously-updated per-feature stats.

The reference is single-pass batch; this is the Spark-native extension for
the 10^12-image table growing in place: ``readStream`` over the image-table
directory → the SAME exact coverage kernel as batch (emit="moments", one
row per feature×tile) → a stateful ``groupBy(feature_id)`` aggregation.
The moments are pure sums plus min/max, so Spark's streaming state store
merges each micro-batch in O(|features|) state with no re-scan of earlier
tiles — the streaming answer after N tiles is bit-identical to the batch
answer over those N tiles (test-asserted).

Only algebraic stats stream (count/sum/mean/min/max/variance/stdev/CV and
weighted variants): frequency stats (mode/median/quantile/frac) need the
full value distribution, which is unbounded state — compute those in batch
over the ingested store instead.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession

from ..plans.stats import StatsPlan
from ..sources.tiles import TILE_SCHEMA, RasterMeta, raw_tiles_with_meta


def stream_zonal_stats(
    spark: SparkSession,
    source_dir: str,
    features: DataFrame,
    stats: "list[str] | str",
    *,
    meta: RasterMeta,
    checkpoint_dir: str,
    sink_dir: str | None = None,
    query_name: str = "zonal_stream",
    max_files_per_trigger: int = 16,
    available_now: bool = True,
):
    """Start the streaming zonal query; returns the StreamingQuery.

    Without ``sink_dir`` results land in an in-memory table named
    ``query_name`` (complete mode — read it with
    ``spark.table(query_name)``). With ``sink_dir`` each trigger snapshots
    the full current result to parquet via foreachBatch (overwrite), which
    is the resumable-pipeline shape: the newest snapshot is always a
    consistent answer over every tile ingested so far.
    """
    from ..operators.zonal import FeatureBroadcast, coverage_facts

    if isinstance(stats, str):
        stats = [stats]
    plan = StatsPlan(stats, [])
    if plan.freq:
        raise ValueError(
            "streaming zonal supports algebraic stats only; frequency stats "
            f"({sorted(plan.freq)}) need unbounded state — run them in batch"
        )
    if plan.needs_weights:
        raise ValueError(
            "streaming zonal has no weight-raster plumbing; weighted stats "
            "are batch-only"
        )

    rows = features.select(
        "feature_id", "geom", "fxmin", "fymin", "fxmax", "fymax"
    ).collect()
    feats_bc = spark.sparkContext.broadcast(FeatureBroadcast(rows))

    raw = (
        spark.readStream.schema(TILE_SCHEMA)
        .option("maxFilesPerTrigger", max_files_per_trigger)
        .parquet(source_dir)
    )
    tiles = raw_tiles_with_meta(raw, layer=meta.layer)
    moments = coverage_facts(
        tiles, emit="moments", feats_bc=feats_bc, values_meta=meta
    )
    agg = moments.groupBy("feature_id").agg(*plan.algebraic_aggs_from_moments())
    fin = plan.finalize_columns()
    out = agg.select(
        "feature_id", *[fin[s].alias(s) for s in plan.algebraic]
    )

    writer = out.writeStream.option("checkpointLocation", checkpoint_dir)
    if sink_dir is not None:

        def _snapshot(batch_df: DataFrame, batch_id: int) -> None:
            batch_df.write.mode("overwrite").parquet(sink_dir)

        writer = writer.foreachBatch(_snapshot).outputMode("complete")
    else:
        writer = writer.format("memory").queryName(query_name).outputMode(
            "complete"
        )
    if available_now:
        writer = writer.trigger(availableNow=True)
    return writer.start()
