"""``coverage_fraction`` operator — the coverage raster itself as a table.

Reference: ``R/coverage_fraction.R:17-79`` + ``src/coverage_fraction.cpp:
27-89``. Output is the sparse long form (feature_id, cell, row, col, x, y,
cov) — the fact table every stat aggregates over; ``crop=True`` restricts to
feature-bbox tiles, ``crop=False`` semantics (0-filled full extent) are
recovered by densifying against the full cell universe downstream.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from ..sources.tiles import Raster
from .zonal import build_candidates, coverage_facts


def coverage_fraction_df(
    values: Raster,
    features: DataFrame,
    *,
    broadcast_features: bool = True,
    include_xy: bool = True,
) -> DataFrame:
    """Sparse per-cell coverage fractions, one row per covered cell."""
    cand, feats_bc = build_candidates(values, features, broadcast_features)
    facts = coverage_facts(
        cand,
        feats_bc=feats_bc,
        values_meta=values.meta,
        include_cell=True,
        include_xy=include_xy,
        keep_nodata=True,  # coverage does not look at values at all
    )
    cols = ["feature_id", "cell", "cov"] + (["cx", "cy"] if include_xy else [])
    return facts.select(*cols)


def coverage_fraction_raster(
    values: Raster, features: DataFrame, *, crop: bool = True
) -> DataFrame:
    """Dense form: one row per (feature, tile) with the coverage-fraction
    block as an array — the reference's RasterLayer-per-feature output
    (coverage_fraction.cpp:27-89). ``crop=False`` emits ALL tiles per
    feature with 0-filled blocks outside (R/coverage_fraction.R crop arg)."""
    from typing import Iterator

    import numpy as np
    import pandas as pd
    from pyspark.sql import types as T

    from ..core import geom as G
    from ..core.coverage import coverage_fraction
    from ..core.grid import Grid

    from .zonal import candidate_pairs, feature_tile_cover

    if crop:
        cand = candidate_pairs(values, features)
    else:
        # cross every feature with every tile (0-filled outside)
        all_keys = values.raw_meta if values.raw_meta is not None else values.tiles
        import pyspark.sql.functions as F

        feats_l = features.select(
            F.struct("feature_id", "geom", "fxmin", "fymin", "fxmax", "fymax").alias(
                "_feat"
            )
        ).agg(F.collect_list("_feat").alias("feats"))
        cand = all_keys.crossJoin(F.broadcast(feats_l))

    schema = T.StructType(
        [
            T.StructField("feature_id", T.LongType()),
            T.StructField("tile_row", T.IntegerType()),
            T.StructField("tile_col", T.IntegerType()),
            T.StructField("nrows", T.IntegerType()),
            T.StructField("ncols", T.IntegerType()),
            T.StructField("cov_px", T.ArrayType(T.DoubleType())),
        ]
    )

    def _dense(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = []
            for row in pdf.itertuples(index=False):
                tile_grid = Grid(row.xmin, row.ymin, row.xmax, row.ymax, row.dx, row.dy)
                for ft in row.feats:
                    geom = G.from_wkb(bytes(ft["geom"]))
                    cov = coverage_fraction(tile_grid, geom)
                    rows.append(
                        {
                            "feature_id": ft["feature_id"],
                            "tile_row": row.tile_row,
                            "tile_col": row.tile_col,
                            "nrows": tile_grid.nrows,
                            "ncols": tile_grid.ncols,
                            "cov_px": cov.ravel(),
                        }
                    )
            if rows:
                yield pd.DataFrame(rows)

    return cand.mapInPandas(_dense, schema)
