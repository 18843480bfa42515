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
from pyspark.sql import functions as F

from ..sources.tiles import Raster
from .zonal import exact_extract, exact_extract_pixels


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
    colname_fun=None,
    **kwargs,
) -> DataFrame:
    """Run stats layer-by-layer (stack_apply) and join results on
    feature_id, naming columns by the reference's rules.

    ``colname_fun`` (ref R/exact_extract.R:288, exact_extract_helpers.R:
    96-118): callable ``(fun_name, values, weights, fun_value, nvalues,
    nweights) -> str`` overriding the default naming entirely."""
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
            if colname_fun is not None:
                renames[c] = colname_fun(
                    fun_name=c,
                    values=v_raster.meta.layer,
                    weights=w_raster.meta.layer if w_raster is not None else None,
                    fun_value=c,
                    nvalues=len(pairs),
                    nweights=len(weights) if weights else 0,
                )
            elif multi or full_colnames:
                name = f"{c}.{v_raster.meta.layer}"
                if full_colnames and w_raster is not None:
                    name += f".{w_raster.meta.layer}"
                renames[c] = name
        for old, new in renames.items():
            df = df.withColumnRenamed(old, new)
        out = df if out is None else out.join(df, on="feature_id", how="full")
    return out.orderBy("feature_id")


def summarize_df_pixels(
    values: "list[Raster]",
    features: DataFrame,
    *,
    weights: "list[Raster] | None" = None,
    include_xy: bool = False,
    include_cell: bool = False,
    include_area: bool = False,
    **kwargs,
) -> DataFrame:
    """The ``stack_apply=FALSE`` / ``summarize_df`` pixel frame
    (R/exact_extract.R:585-721): ONE long table per feature with a value
    column PER LAYER (named by layer), a single shared coverage_fraction,
    and optional weight columns — all layers must share the value grid, so
    cells align 1:1 and the combine is an equi-join on (feature_id, cell).
    """
    base_grid = values[0].meta.grid
    for r in values[1:]:
        if not (
            r.meta.grid.dx == base_grid.dx
            and r.meta.grid.dy == base_grid.dy
            and r.meta.grid.xmin == base_grid.xmin
            and r.meta.grid.ymax == base_grid.ymax
        ):
            raise ValueError(
                "stack_apply=FALSE requires all value layers on one grid"
            )
    w0 = weights[0] if weights else None
    out = exact_extract_pixels(
        values[0], features, weights=w0, include_cell=True,
        include_xy=include_xy, include_area=include_area, **kwargs,
    ).withColumnRenamed("value", values[0].meta.layer)
    if w0 is not None:
        out = out.withColumnRenamed(
            "weight", f"weight_{w0.meta.layer}" if len(weights or []) > 1 else "weight"
        )
    for i, r in enumerate(values[1:], start=1):
        wi = weights[i] if weights and len(weights) > i else None
        px = exact_extract_pixels(
            r, features, weights=wi, include_cell=True, **kwargs
        ).select(
            "feature_id",
            "cell",
            F.col("value").alias(r.meta.layer),
            *(
                [F.col("weight").alias(f"weight_{wi.meta.layer}")]
                if wi is not None
                else []
            ),
        )
        out = out.join(px, on=["feature_id", "cell"], how="inner")
    if not include_cell:
        out = out.drop("cell")
    return out


def summarize_df(
    values: "list[Raster]",
    features: DataFrame,
    fn,
    schema,
    *,
    weights: "list[Raster] | None" = None,
    **pixel_kwargs,
) -> DataFrame:
    """UD(A)F over the combined multi-layer frame — the reference's
    ``summarize_df``/``stack_apply=FALSE`` R-function path
    (R/exact_extract.R:585-721): ``fn(pdf) -> pdf`` receives ONE pandas
    frame per feature with a column per layer plus coverage_fraction."""
    px = summarize_df_pixels(values, features, weights=weights, **pixel_kwargs)
    return px.groupBy("feature_id").applyInPandas(fn, schema)
