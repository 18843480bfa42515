"""Multi-layer (raster stack) support: stack_apply semantics + the
reference's column-naming rules.

Reference: layer loops and value/weight recycling in
``R/exact_extract.R:585-721`` + ``R/exact_extract_helpers.R:28-152``:
- one value layer, one stat → column named ``{stat}``;
- multiple layers → ``{stat}.{layer}`` (full_colnames adds the weight
  layer: ``{stat}.{value_layer}.{weight_layer}``);
- value/weight layer lists are recycled against each other (lengths must
  match or either be 1).
"""

from __future__ import annotations

from pyspark.sql import DataFrame

from ..sources.tiles import Raster
from .zonal import exact_extract


def _recycle(values: list, weights: list | None) -> list[tuple]:
    if not weights:
        return [(v, None) for v in values]
    if len(values) == len(weights):
        return list(zip(values, weights))
    if len(values) == 1:
        return [(values[0], w) for w in weights]
    if len(weights) == 1:
        return [(v, weights[0]) for v in values]
    raise ValueError(
        f"value layers ({len(values)}) and weight layers ({len(weights)}) "
        "cannot be recycled"  # ref exact_extract_helpers.R:133-152
    )


def exact_extract_stack(
    values: "list[Raster]",
    features: DataFrame,
    stats: "list[str] | str",
    *,
    weights: "list[Raster] | None" = None,
    full_colnames: bool = False,
    **kwargs,
) -> DataFrame:
    """Run stats layer-by-layer (stack_apply) and join results on
    feature_id, naming columns by the reference's rules."""
    if isinstance(stats, str):
        stats = [stats]
    pairs = _recycle(values, weights)
    multi = len(pairs) > 1
    out: DataFrame | None = None
    for v_raster, w_raster in pairs:
        df = exact_extract(v_raster, features, stats, weights=w_raster, **kwargs)
        renames = {}
        for c in df.columns:
            if c == "feature_id":
                continue
            if multi or full_colnames:
                name = f"{c}.{v_raster.meta.layer}"
                if full_colnames and w_raster is not None:
                    name += f".{w_raster.meta.layer}"
                renames[c] = name
        for old, new in renames.items():
            df = df.withColumnRenamed(old, new)
        out = df if out is None else out.join(df, on="feature_id", how="full")
    return out.orderBy("feature_id")
