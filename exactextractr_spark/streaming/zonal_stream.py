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

Weighted stats stream too: the weight raster is STATIC, so its tiles are
pre-grouped per value-tile key on the batch side
(``zonal.static_weight_lists``) and attached to the streaming tiles with a
stateless broadcast stream-static join — the moments schema already
carries the weighted sums, so the stateful aggregate is unchanged.
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
    weights=None,
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
    from ..operators.zonal import (
        FeatureBroadcast,
        coverage_facts,
        static_weight_lists,
    )

    if isinstance(stats, str):
        stats = [stats]
    plan = StatsPlan(stats, [])
    if plan.freq:
        raise ValueError(
            "streaming zonal supports algebraic stats only; frequency stats "
            f"({sorted(plan.freq)}) need unbounded state — run them in batch"
        )
    if plan.needs_weights and weights is None:
        raise ValueError(f"stats {sorted(set(stats))} require weights")
    if weights is not None:
        vg, wg = meta.grid, weights.meta.grid
        if not vg.compatible_with(wg):
            raise ValueError(
                "weights grid is not compatible with the value grid "
                "(resolutions must be integer multiples, origins aligned)"
            )
        if wg.dx < vg.dx or wg.dy < vg.dy:
            raise ValueError(
                "finer-than-value weight grids disaggregate the value "
                "raster — batch-only; resample the weights first"
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
    if weights is not None:
        from pyspark.sql import functions as F

        from ..operators.zonal import (
            WEIGHT_BROADCAST_MAX_BYTES,
            _weight_payload_bytes,
        )

        wlists = static_weight_lists(meta, weights)
        # size-gate the broadcast hint exactly like the batch path: a large
        # weight raster's pre-grouped lists join as a plain stream-static
        # equi-join (still stateless) instead of an OOM-prone broadcast
        if _weight_payload_bytes(weights.meta) <= WEIGHT_BROADCAST_MAX_BYTES:
            wlists = F.broadcast(wlists)
        tiles = tiles.join(wlists, on=["tile_row", "tile_col"], how="left")
    moments = coverage_facts(
        tiles, emit="moments", feats_bc=feats_bc, values_meta=meta,
        weighted=weights is not None,
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
