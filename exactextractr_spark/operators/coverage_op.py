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
from .zonal import candidate_pairs, coverage_facts


def coverage_fraction_df(
    values: Raster,
    features: DataFrame,
    *,
    broadcast_features: bool = True,
    include_xy: bool = True,
) -> DataFrame:
    """Sparse per-cell coverage fractions, one row per covered cell."""
    cand = candidate_pairs(values, features, broadcast_features)
    facts = coverage_facts(
        cand,
        values_meta=values.meta,
        include_cell=True,
        include_xy=include_xy,
        keep_nodata=True,  # coverage does not look at values at all
    )
    cols = ["feature_id", "cell", "cov"] + (["cx", "cy"] if include_xy else [])
    return facts.select(*cols)
