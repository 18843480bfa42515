"""Driver contract for the spark-graft builder (PySpark target).

The geospatial engine's queries run over a deterministic synthetic raster
(48x48, v = cell_index % 97, quarter-aligned rectangle features derived
arithmetically from ``customer``) so DuckDB can recompute the exact same
coverage fractions in closed form (rectangles ⇒ the reference's rectangle
fast path, raster_cell_intersection.cpp:161-248). All coverage values are
dyadic rationals (multiples of 1/16) and values are small integers, so every
aggregate is EXACT in float64 regardless of summation order — Spark and
DuckDB produce bit-identical doubles.

The Spark side exercises the full pipeline: PNG-encoded tile table → Arrow
decode → tile-cover candidate join → exact coverage kernel → stat algebra.
The DuckDB oracle only knows the closed-form rectangle overlap.
"""

from __future__ import annotations

from collections.abc import Callable

import numpy as np
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

# ---------------------------------------------------------------------------
# deterministic synthetic raster + features (shared Spark/DuckDB definitions)
# ---------------------------------------------------------------------------

GRID_N = 48  # 48x48 cells on (0,0)-(48,48), dx=dy=1
TILE = 16  # 3x3 tiles
N_FEATS = 24

_raster_cache: dict[str, object] = {}


def _tune(spark: SparkSession) -> SparkSession:
    """Runtime-settable knobs for the driver's (possibly vanilla) session:
    the default 200 shuffle partitions are pure overhead at oracle scale,
    and AQE coalescing keeps small shuffles small."""
    try:
        spark.conf.set("spark.sql.shuffle.partitions", "16")
        spark.conf.set("spark.sql.adaptive.enabled", "true")
        spark.conf.set("spark.sql.adaptive.coalescePartitions.enabled", "true")
    except Exception:
        pass  # read-only conf (e.g. Spark Connect) — defaults still correct
    return spark


def _synth_raster(spark: SparkSession, weights: bool = False):
    from exactextractr_spark.sources.tiles import Raster, RasterMeta

    key = f"r{'w' if weights else 'v'}-{id(spark)}"
    if key not in _raster_cache:
        i = np.arange(GRID_N * GRID_N).reshape(GRID_N, GRID_N)
        if weights:
            r, c = np.divmod(i, GRID_N)
            arr = ((r + 2 * c) % 13).astype(np.float64)
            meta = RasterMeta("w", xmin=0, ymax=GRID_N, dx=1, dy=1,
                              width=GRID_N, height=GRID_N, tile_w=TILE, tile_h=TILE)
        else:
            arr = (i % 97).astype(np.float64)
            meta = RasterMeta("v", xmin=0, ymax=GRID_N, dx=1, dy=1,
                              width=GRID_N, height=GRID_N, tile_w=TILE, tile_h=TILE)
        _raster_cache[key] = Raster.from_array(spark, arr, meta)
    return _raster_cache[key]


def _synth_features(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Rectangles derived arithmetically from customer keys; quarter-aligned
    so all coverage fractions are multiples of 1/16 (exact dyadics)."""
    from exactextractr_spark.sources.features import prepare_features

    cust = spark.read.parquet(f"{sf_dir}/customer.parquet")
    k = F.col("c_custkey")
    fxmin = ((k * 7) % 37) + F.lit(0.25)
    fymin = ((k * 11) % 37) + F.lit(0.25)
    fxmax = fxmin + (k % 5) + F.lit(1.5)
    fymax = fymin + (k % 7) + F.lit(1.5)
    wkt = F.concat(
        F.lit("POLYGON (("),
        fxmin.cast("string"), F.lit(" "), fymin.cast("string"), F.lit(", "),
        fxmax.cast("string"), F.lit(" "), fymin.cast("string"), F.lit(", "),
        fxmax.cast("string"), F.lit(" "), fymax.cast("string"), F.lit(", "),
        fxmin.cast("string"), F.lit(" "), fymax.cast("string"), F.lit(", "),
        fxmin.cast("string"), F.lit(" "), fymin.cast("string"), F.lit("))"),
    )
    raw = (
        cust.filter(k <= N_FEATS)
        .select(k.alias("feature_id"), wkt.alias("geom"))
    )
    return prepare_features(raw, "feature_id", "geom")


# oracle CTE shared by the zonal queries: closed-form rectangle coverage
_FACTS_CTE = f"""
WITH cells AS (
  SELECT CAST(i // {GRID_N} AS BIGINT) AS r, CAST(i % {GRID_N} AS BIGINT) AS c,
         CAST(i % 97 AS DOUBLE) AS v,
         CAST(((i // {GRID_N}) + 2 * (i % {GRID_N})) % 13 AS DOUBLE) AS w
  FROM range({GRID_N * GRID_N}) t(i)
), feats AS (
  SELECT c_custkey AS feature_id,
         ((c_custkey * 7) % 37) + 0.25 AS fxmin,
         ((c_custkey * 11) % 37) + 0.25 AS fymin,
         ((c_custkey * 7) % 37) + 0.25 + (c_custkey % 5) + 1.5 AS fxmax,
         ((c_custkey * 11) % 37) + 0.25 + (c_custkey % 7) + 1.5 AS fymax
  FROM customer WHERE c_custkey <= {N_FEATS}
), facts AS (
  SELECT f.feature_id, cl.r, cl.c, cl.v, cl.w,
         GREATEST(0, LEAST(f.fxmax, cl.c + 1) - GREATEST(f.fxmin, cl.c)) *
         GREATEST(0, LEAST(f.fymax, {GRID_N} - cl.r) - GREATEST(f.fymin, {GRID_N} - 1 - cl.r)) AS cov
  FROM feats f
  JOIN cells cl
    ON cl.c + 1 > f.fxmin AND cl.c < f.fxmax
   AND {GRID_N} - cl.r > f.fymin AND {GRID_N} - 1 - cl.r < f.fymax
)
"""


# ---------------------------------------------------------------------------
# query implementations
# ---------------------------------------------------------------------------

def _q_zonal_basic(spark: SparkSession, sf_dir: str) -> DataFrame:
    _tune(spark)
    from exactextractr_spark.operators.zonal import exact_extract

    df = exact_extract(
        _synth_raster(spark), _synth_features(spark, sf_dir),
        ["mean", "sum", "count"],
    )
    return df.select(
        "feature_id",
        F.col("mean").alias("mean_v"),
        F.col("sum").alias("sum_v"),
        F.col("count").alias("cell_count"),
    )


def _q_zonal_minmax(spark: SparkSession, sf_dir: str) -> DataFrame:
    _tune(spark)
    from exactextractr_spark.operators.zonal import exact_extract

    df = exact_extract(
        _synth_raster(spark), _synth_features(spark, sf_dir),
        ["min", "max", "variance", "stdev"],
    )
    return df.select(
        "feature_id",
        F.col("min").alias("min_v"),
        F.col("max").alias("max_v"),
        F.col("variance").alias("var_v"),
        F.col("stdev").alias("stdev_v"),
    )


def _q_zonal_weighted(spark: SparkSession, sf_dir: str) -> DataFrame:
    _tune(spark)
    from exactextractr_spark.operators.zonal import exact_extract

    df = exact_extract(
        _synth_raster(spark), _synth_features(spark, sf_dir),
        ["weighted_mean", "weighted_sum", "weighted_count"],
        weights=_synth_raster(spark, weights=True),
    )
    return df.select(
        "feature_id",
        F.col("weighted_mean").alias("wmean_v"),
        F.col("weighted_sum").alias("wsum_v"),
        F.col("weighted_count").alias("wcount_v"),
    )


def _q_zonal_mode(spark: SparkSession, sf_dir: str) -> DataFrame:
    _tune(spark)
    from exactextractr_spark.operators.zonal import exact_extract

    df = exact_extract(
        _synth_raster(spark), _synth_features(spark, sf_dir),
        ["mode", "minority", "variety"],
    )
    return df.select(
        "feature_id",
        F.col("mode").alias("mode_v"),
        F.col("minority").alias("minority_v"),
        F.col("variety").cast("long").alias("variety_v"),
    )


def _q_zonal_quantiles(spark: SparkSession, sf_dir: str) -> DataFrame:
    _tune(spark)
    from exactextractr_spark.operators.zonal import exact_extract

    df = exact_extract(
        _synth_raster(spark), _synth_features(spark, sf_dir),
        ["median", "quantile"], quantiles=[0.25, 0.75],
    )
    return df.select(
        "feature_id", "median", F.col("q25").alias("q25_v"), F.col("q75").alias("q75_v")
    )


def _q_zonal_frac(spark: SparkSession, sf_dir: str) -> DataFrame:
    _tune(spark)
    from exactextractr_spark.operators.zonal import exact_extract_pixels

    px = exact_extract_pixels(_synth_raster(spark), _synth_features(spark, sf_dir))
    freq = px.groupBy("feature_id", F.col("value").alias("val")).agg(
        F.sum("coverage_fraction").alias("sum_c")
    )
    tot = freq.groupBy("feature_id").agg(F.sum("sum_c").alias("tot"))
    return freq.join(tot, "feature_id").select(
        "feature_id", "val", (F.col("sum_c") / F.col("tot")).alias("frac")
    )


def _q_coverage_sparse(spark: SparkSession, sf_dir: str) -> DataFrame:
    _tune(spark)
    from exactextractr_spark.operators.coverage_op import coverage_fraction_df

    return coverage_fraction_df(
        _synth_raster(spark), _synth_features(spark, sf_dir), include_xy=False
    ).select("feature_id", "cell", "cov")


def _q_candidate_tiles(spark: SparkSession, sf_dir: str) -> DataFrame:
    _tune(spark)
    from exactextractr_spark.operators.zonal import candidate_pairs_flat

    cand = candidate_pairs_flat(_synth_raster(spark), _synth_features(spark, sf_dir))
    return cand.groupBy("feature_id").agg(
        F.count("*").cast("long").alias("n_tiles")
    )


def _q_rasterize(spark: SparkSession, sf_dir: str) -> DataFrame:
    _tune(spark)
    from exactextractr_spark.operators.rasterize import rasterize_polygons
    from exactextractr_spark.sources.tiles import RasterMeta

    meta = RasterMeta("g", xmin=0, ymax=GRID_N, dx=1, dy=1, width=GRID_N,
                      height=GRID_N, tile_w=TILE, tile_h=TILE)
    return rasterize_polygons(
        spark, _synth_features(spark, sf_dir), meta
    ).select("cell", F.col("feature_id").alias("winner"))


def _q_resample(spark: SparkSession, sf_dir: str) -> DataFrame:
    _tune(spark)
    from exactextractr_spark.operators.resample import exact_resample
    from exactextractr_spark.sources.tiles import RasterMeta

    dst = RasterMeta("d", xmin=0, ymax=GRID_N, dx=4, dy=4, width=GRID_N // 4,
                     height=GRID_N // 4, tile_w=GRID_N // 4, tile_h=GRID_N // 4)
    return exact_resample(_synth_raster(spark), dst, "sum").select(
        F.col("dst_row").cast("long").alias("dst_row"),
        F.col("dst_col").cast("long").alias("dst_col"),
        F.col("value").alias("sum_v"),
    )


def _q_knn(spark: SparkSession, sf_dir: str) -> DataFrame:
    _tune(spark)
    from exactextractr_spark.core.cellindex import CellIndex
    from exactextractr_spark.operators.knn import knn_points

    cust = spark.read.parquet(f"{sf_dir}/customer.parquet")
    k = F.col("c_custkey")
    points = cust.filter(k <= 600).select(
        k.alias("pid"),
        (((k * 13) % 97) / F.lit(2.0)).alias("px"),
        (((k * 29) % 89) / F.lit(2.0)).alias("py"),
    )
    nat = spark.read.parquet(f"{sf_dir}/nation.parquet")
    nk = F.col("n_nationkey")
    queries = nat.select(
        nk.cast("long").alias("qid"),
        (((nk * 17) % 97) / F.lit(2.0)).alias("qx"),
        (((nk * 23) % 89) / F.lit(2.0)).alias("qy"),
    )
    idx = CellIndex(0.0, 0.0, 48.0, 48.0)
    out = knn_points(queries, points, 5, index=idx, res=4)
    return out.select("qid", "pid", "dist", F.col("rank").cast("long").alias("rank"))


def _q_cosine_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    _tune(spark)
    from exactextractr_spark.operators.similarity import cosine_topk

    emb = spark.read.parquet(f"{sf_dir}/embeddings.parquet")
    queries = emb.filter(F.col("vec_id") < 5).select(
        F.col("vec_id").alias("qid"), "embedding"
    )
    out = cosine_topk(emb, queries, 10)
    return out.select("qid", "item_id", F.col("rank").cast("long").alias("rank"))


def _q_embedding_dedup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Embedding-cosine near-dup dedup, greedy-by-id keep rule (drop when a
    smaller-id item is >= threshold cosine). Exact mode == the DuckDB
    all-pairs oracle; threshold 0.46 sits in a wide gap of the synthetic
    cosine distribution so float-fold differences cannot flip a pair."""
    _tune(spark)
    from exactextractr_spark.operators.dedup import embedding_dedup

    emb = spark.read.parquet(f"{sf_dir}/embeddings.parquet")
    out = embedding_dedup(emb, 0.46)
    return out.select("vec_id", F.col("near_dups").cast("long").alias("near_dups"))


def _q_dedup_exact(spark: SparkSession, sf_dir: str) -> DataFrame:
    _tune(spark)
    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    # dedup on a 40-char normalized prefix to force collisions
    norm = F.lower(F.substring(F.regexp_replace("text", r"\s+", " "), 1, 40))
    return (
        docs.withColumn("_k", norm)
        .groupBy("_k")
        .agg(F.min("doc_id").alias("doc_id"), F.count("*").cast("long").alias("dup_count"))
        .select("doc_id", "dup_count")
    )


def _q_text_quality(spark: SparkSession, sf_dir: str) -> DataFrame:
    _tune(spark)
    from exactextractr_spark.operators.textstats import quality_scores, token_counts

    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    df = token_counts(quality_scores(docs))
    return df.select(
        "doc_id",
        F.col("n_words").cast("long").alias("n_words"),
        F.col("ws_tokens").cast("long").alias("ws_tokens"),
        F.col("bpe_tokens").cast("long").alias("bpe_tokens"),
        "punct_ratio",
        "distinct_word_ratio",
    )


def _q_simhash_dedup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """SimHash near-dup dedup by hamming distance: FNV-derived simhash64
    (already oracle-verified bit-exactly) -> pigeonhole-exact banded
    candidate join -> bit_count(xor) <= 3 -> greedy-by-id keep rule.
    Everything after the signature UDF is JVM-side."""
    _tune(spark)
    from exactextractr_spark.operators.dedup import hamming_dedup, simhash64

    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    return hamming_dedup(
        simhash64(docs), id_col="doc_id", hash_col="simhash", max_hamming=3
    ).select("doc_id", "near_dups")


def _q_image_phash_dedup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Perceptual-hash image dedup over BOTH synthetic tile tables (the
    weight raster (r+2c)%13 contains provably identical tiles). The tile
    phash column derives from the arithmetic pixel formula, so the DuckDB
    oracle re-computes every hash from scratch (2x2 block sums are integer-
    exact; /4.0 and the 64-value median stay dyadic) and replays the same
    banded hamming dedup — the full image pipeline is oracle-checked."""
    _tune(spark)
    from exactextractr_spark.operators.dedup import image_phash_dedup

    tiles = _synth_raster(spark)._raw.select("image_id", "phash").unionAll(
        _synth_raster(spark, weights=True)._raw.select("image_id", "phash")
    )
    return image_phash_dedup(tiles, max_hamming=3).select("image_id", "near_dups")


def _q_gopher_quality(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Gopher-rule quality filter (map-only, zero shuffle); every metric
    mirrored by the DuckDB oracle."""
    _tune(spark)
    from exactextractr_spark.operators.textstats import gopher_quality

    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    return gopher_quality(docs, min_words=10).select(
        "doc_id",
        "n_words",
        "mean_word_len",
        "symbol_word_ratio",
        "bullet_line_frac",
        "ellipsis_line_frac",
        "frac_alpha_words",
        "stopword_hits",
        F.col("gopher_pass").cast("int").alias("gopher_pass"),
    )


def _q_doc_repetition(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Intra-document repetition metrics via per-row sorted-array folds
    (no explode/shuffle); oracle re-derives line dup fractions and the
    most-frequent word 2-gram with the same smallest-gram tie rule."""
    _tune(spark)
    from exactextractr_spark.operators.textstats import repetition_stats

    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    return repetition_stats(docs).select(
        "doc_id",
        "n_lines",
        "dup_line_frac",
        "dup_line_char_frac",
        "top_2gram",
        "top_2gram_count",
        "top_2gram_char_frac",
    )


def _q_minhash_dedup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Bit-exact oracle: the FNV-1a token hash + mod-2^64 shingle rolling +
    multiply-shift family are all re-derived in DuckDB SQL
    (:func:`_minhash_dedup_oracle`); banding compares band slices by
    equality where Spark buckets by murmur hash — identical decisions
    absent a 32-bit hash collision between non-equal slices."""
    _tune(spark)
    from exactextractr_spark.operators.dedup import minhash_dedup

    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    kept = minhash_dedup(docs, num_hashes=32, bands=8, threshold=0.8)
    return kept.select("doc_id")


def _q_minhash_sigs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Raw MinHash signatures, bit-exact vs the DuckDB re-derivation of
    the full hash pipeline. Exploded to (doc_id, pos, h) long rows so the
    driver's value-hash compares scalars, not arrays."""
    _tune(spark)
    from exactextractr_spark.operators.dedup import minhash_signatures

    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    sigs = minhash_signatures(docs, num_hashes=32, seed=42)
    return sigs.select(
        "doc_id", F.posexplode("sig").alias("pos", "h")
    ).select("doc_id", F.col("pos").cast("long").alias("pos"), "h")


def _q_simhash(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Bit-exact oracle: FNV-1a token hashes and the 64-bit sign-sum are
    re-derived in DuckDB SQL (:data:`_SIMHASH_ORACLE`)."""
    _tune(spark)
    from exactextractr_spark.operators.dedup import simhash64

    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    return simhash64(docs).select("doc_id", "simhash")


def _q_lang_id(spark: SparkSession, sf_dir: str) -> DataFrame:
    _tune(spark)
    from exactextractr_spark.operators.textstats import language_id

    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    return language_id(docs).select("doc_id", "lang_pred")


def _q_zonal_area_weighted(spark: SparkSession, sf_dir: str) -> DataFrame:
    """weights='area' (cartesian): dx=dy=1 so area ≡ 1 and the weighted
    stats must equal their unweighted counterparts — an end-to-end exactness
    check of the cell-area path (ref R/exact_extract_helpers.R:154-160)."""
    _tune(spark)
    from exactextractr_spark.operators.zonal import exact_extract

    df = exact_extract(
        _synth_raster(spark), _synth_features(spark, sf_dir),
        ["weighted_mean", "weighted_count", "weighted_sum"], weights="area",
    )
    return df.select(
        "feature_id",
        F.col("weighted_mean").alias("awmean_v"),
        F.col("weighted_count").alias("awcount_v"),
        F.col("weighted_sum").alias("awsum_v"),
    )


def _q_zonal_stack(spark: SparkSession, sf_dir: str) -> DataFrame:
    _tune(spark)
    from exactextractr_spark.operators.stack import exact_extract_stack

    df = exact_extract_stack(
        [_synth_raster(spark), _synth_raster(spark, weights=True)],
        _synth_features(spark, sf_dir),
        ["mean", "max"],
    )
    return df.select(
        "feature_id",
        F.col("`mean.v`").alias("mean_v"),
        F.col("`max.v`").alias("max_v"),
        F.col("`mean.w`").alias("mean_w"),
        F.col("`max.w`").alias("max_w"),
    )


def _q_zonal_stack_shared(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Same stats as zonal_stack but with both layers in ONE tile table —
    exercises the single-scan multi-layer fast path (one kernel pass,
    moments tagged by layer, pivot). Values identical to zonal_stack, so
    the same closed-form oracle applies."""
    _tune(spark)
    from exactextractr_spark.operators.stack import exact_extract_stack
    from exactextractr_spark.sources.tiles import Raster

    va = _synth_raster(spark)
    vw = _synth_raster(spark, weights=True)
    shared = va._raw.unionByName(vw._raw)
    ra = Raster.from_tiles(shared, va.meta)
    rw = Raster.from_tiles(shared, vw.meta)
    df = exact_extract_stack(
        [ra, rw], _synth_features(spark, sf_dir), ["mean", "max"]
    )
    return df.select(
        "feature_id",
        F.col("`mean.v`").alias("mean_v"),
        F.col("`max.v`").alias("max_v"),
        F.col("`mean.w`").alias("mean_w"),
        F.col("`max.w`").alias("max_w"),
    )


def _q_zonal_stack_freq(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Freq stats (mode/variety) over a shared two-layer tile table —
    exercises the single-scan freq fast path (one emit='freq' kernel pass
    tagged by layer, then per-layer _freq_stats)."""
    _tune(spark)
    from exactextractr_spark.operators.stack import exact_extract_stack
    from exactextractr_spark.sources.tiles import Raster

    va = _synth_raster(spark)
    vw = _synth_raster(spark, weights=True)
    shared = va._raw.unionByName(vw._raw)
    ra = Raster.from_tiles(shared, va.meta)
    rw = Raster.from_tiles(shared, vw.meta)
    df = exact_extract_stack(
        [ra, rw], _synth_features(spark, sf_dir), ["mode", "variety"]
    )
    return df.select(
        "feature_id",
        F.col("`mode.v`").alias("mode_v"),
        F.col("`variety.v`").cast("long").alias("variety_v"),
        F.col("`mode.w`").alias("mode_w"),
        F.col("`variety.w`").cast("long").alias("variety_w"),
    )


def _q_pixels_xy(spark: SparkSession, sf_dir: str) -> DataFrame:
    _tune(spark)
    from exactextractr_spark.operators.zonal import exact_extract_pixels

    px = exact_extract_pixels(
        _synth_raster(spark), _synth_features(spark, sf_dir),
        include_xy=True, include_cell=True, include_area=True,
    )
    return px.select(
        "feature_id",
        F.col("value").alias("v"),
        F.col("coverage_fraction").alias("cov"),
        "x", "y", "cell", "area",
    )


def _q_weighted_frac_long(spark: SparkSession, sf_dir: str) -> DataFrame:
    _tune(spark)
    from exactextractr_spark.operators.zonal import exact_extract_pixels

    px = exact_extract_pixels(
        _synth_raster(spark), _synth_features(spark, sf_dir),
        weights=_synth_raster(spark, weights=True),
    )
    freq = px.groupBy("feature_id", F.col("value").alias("val")).agg(
        F.sum(F.col("coverage_fraction") * F.col("weight")).alias("sum_cw")
    )
    tot = freq.groupBy("feature_id").agg(F.sum("sum_cw").alias("tot"))
    return freq.join(tot, "feature_id").select(
        "feature_id", "val", (F.col("sum_cw") / F.col("tot")).alias("wfrac")
    )


def _q_resample_misaligned(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Destination grid NOT an integer multiple of the source (dx=4.5):
    exercises the fractional rectangle-overlap path; all fractions are
    halves so results stay dyadic-exact."""
    _tune(spark)
    from exactextractr_spark.operators.resample import exact_resample
    from exactextractr_spark.sources.tiles import RasterMeta

    dst = RasterMeta("d", xmin=0, ymax=GRID_N, dx=4.5, dy=4.5, width=10,
                     height=10, tile_w=10, tile_h=10)
    return exact_resample(_synth_raster(spark), dst, "mean").select(
        F.col("dst_row").cast("long").alias("dst_row"),
        F.col("dst_col").cast("long").alias("dst_col"),
        F.col("value").alias("mean_v"),
    )


def _q_resample_mode(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Freq-stat resample (reference allows any single non-weighted named
    stat, R/exact_resample.R:44-60): mode by summed fractional coverage per
    destination cell, ties -> larger value. Fractions are halves (4.5 grid)
    so coverage sums are dyadic-exact and the argmax is deterministic."""
    _tune(spark)
    from exactextractr_spark.operators.resample import exact_resample
    from exactextractr_spark.sources.tiles import RasterMeta

    dst = RasterMeta("d", xmin=0, ymax=GRID_N, dx=4.5, dy=4.5, width=10,
                     height=10, tile_w=10, tile_h=10)
    return exact_resample(_synth_raster(spark), dst, "mode").select(
        F.col("dst_row").cast("long").alias("dst_row"),
        F.col("dst_col").cast("long").alias("dst_col"),
        F.col("value").alias("mode_v"),
    )


def _q_ngram_jaccard(spark: SparkSession, sf_dir: str) -> DataFrame:
    _tune(spark)
    from exactextractr_spark.operators.dedup import ngram_jaccard_pairs

    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    # max_df caps the gram self-join fan-out (stop-gram removal contract);
    # the oracle mirrors the same df filter so values stay hash-exact
    pairs = ngram_jaccard_pairs(docs, n=3, threshold=0.5, max_df=20)
    return pairs.select(
        F.col("id_a").cast("long").alias("id_a"),
        F.col("id_b").cast("long").alias("id_b"),
        "jaccard",
    )


def _q_lsh_cosine(spark: SparkSession, sf_dir: str) -> DataFrame:
    """LSH ANN with the FNV-Rademacher hyperplane family: plane entries are
    ±1 signs of FNV-1a('hp{seed}:{b}:{d}'), so the DuckDB oracle re-derives
    the planes, band keys, candidate join, and exact re-rank bit-exactly.
    The Gaussian family remains the API default (pytest-covered)."""
    _tune(spark)
    from exactextractr_spark.operators.similarity import lsh_cosine_topk

    emb = spark.read.parquet(f"{sf_dir}/embeddings.parquet")
    dim = len(emb.select("embedding").first()[0])
    queries = emb.filter(F.col("vec_id") < 5).select(
        F.col("vec_id").alias("qid"), "embedding"
    )
    out = lsh_cosine_topk(emb, queries, 10, dim=dim, family="rademacher_fnv")
    return out.select("qid", "item_id", F.col("rank").cast("long").alias("rank"))


def _q_ivf_cosine(spark: SparkSession, sf_dir: str) -> DataFrame:
    """IVF ANN with a SQL-expressible coarse quantizer: centroids are the
    n_centroids lowest-id vectors (init='first', no Lloyd refinement), so the
    DuckDB oracle reproduces list assignment, nprobe probing, and the exact
    re-rank. The k-means-refined quantizer (init='random', train_iters=10)
    remains the recall/quality path, covered by pytest."""
    _tune(spark)
    from exactextractr_spark.operators.similarity import ivf_cosine_topk

    emb = spark.read.parquet(f"{sf_dir}/embeddings.parquet")
    queries = emb.filter(F.col("vec_id") < 5).select(
        F.col("vec_id").alias("qid"), "embedding"
    )
    out = ivf_cosine_topk(
        emb, queries, 10, n_centroids=16, nprobe=4, train_iters=0, init="first"
    )
    return out.select("qid", "item_id", F.col("rank").cast("long").alias("rank"))


def _q_fingerprint(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Polynomial rolling-hash fingerprint — oracle-checkable bit-exactly
    (DuckDB list_reduce mirrors the same (h*31+code) mod 1e9+7 recurrence)."""
    _tune(spark)
    from exactextractr_spark.operators.textstats import rolling_fingerprint

    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    return rolling_fingerprint(docs).select("doc_id", "fp64")


def _q_image_resize_px(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Multimodal preprocessing: decode -> bilinear 2x downsample ->
    re-encode per tile image, then decode the output and emit pixels.
    Exact oracle: a 2x bilinear downsample (align_corners=False) lands every
    sample at wx=wy=0.5, so each output pixel is the 2x2 block MEAN of the
    source — dyadic-exact, expressible as a closed form over the synthetic
    (cell % 97) field."""
    _tune(spark)
    from typing import Iterator

    import pandas as pd
    from pyspark.sql import types as T

    from exactextractr_spark.operators.multimodal import image_resize

    tiles = _synth_raster(spark)._raw  # 3x3 tiles of 16x16
    half = TILE // 2
    resized = image_resize(tiles, half, half)

    schema = T.StructType(
        [
            T.StructField("image_id", T.StringType()),
            T.StructField("i", T.LongType()),
            T.StructField("j", T.LongType()),
            T.StructField("px", T.DoubleType()),
        ]
    )

    def _decode(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        import numpy as np

        from exactextractr_spark.core.png import decode_tile

        for pdf in batches:
            out = []
            for iid, data, w, h in zip(
                pdf["image_id"], pdf["bytes"], pdf["w"], pdf["h"]
            ):
                arr = decode_tile(bytes(data), int(w), int(h))
                ii, jj = np.mgrid[0 : int(h), 0 : int(w)]
                out.append(
                    pd.DataFrame(
                        {
                            "image_id": iid,
                            "i": ii.ravel().astype(np.int64),
                            "j": jj.ravel().astype(np.int64),
                            "px": arr.ravel(),
                        }
                    )
                )
            if out:
                yield pd.concat(out, ignore_index=True)

    return resized.mapInPandas(_decode, schema)


def _q_image_augment_px(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Vision-training augmentation fan-out: decode -> deterministic
    geometric ops (hflip / rot90 / transpose) -> re-encode per tile, then
    decode the outputs and emit pixels. Exact oracle: every op is a pure
    index permutation of the synthetic (cell % 97) field, so DuckDB
    re-derives each augmented pixel by index algebra."""
    _tune(spark)
    from typing import Iterator

    import pandas as pd
    from pyspark.sql import types as T

    from exactextractr_spark.operators.multimodal import image_augment

    tiles = _synth_raster(spark)._raw  # 3x3 tiles of 16x16
    aug = image_augment(tiles, ["hflip", "rot90", "transpose"])

    schema = T.StructType(
        [
            T.StructField("image_id", T.StringType()),
            T.StructField("i", T.LongType()),
            T.StructField("j", T.LongType()),
            T.StructField("px", T.DoubleType()),
        ]
    )

    def _decode(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        import numpy as np

        from exactextractr_spark.core.png import decode_tile

        for pdf in batches:
            out = []
            for iid, data, w, h in zip(
                pdf["image_id"], pdf["bytes"], pdf["w"], pdf["h"]
            ):
                arr = decode_tile(bytes(data), int(w), int(h))
                ii, jj = np.mgrid[0 : int(h), 0 : int(w)]
                out.append(
                    pd.DataFrame(
                        {
                            "image_id": iid,
                            "i": ii.ravel().astype(np.int64),
                            "j": jj.ravel().astype(np.int64),
                            "px": arr.ravel(),
                        }
                    )
                )
            if out:
                yield pd.concat(out, ignore_index=True)

    return aug.mapInPandas(_decode, schema)


def _q_udf_apply(spark: SparkSession, sf_dir: str) -> DataFrame:
    """UD(A)F surface (the reference's R-function path, R/exact_extract.R:
    585-721): a user applyInPandas function over the per-feature pixel
    table; the function computes a coverage-weighted mean so DuckDB can
    oracle it bit-exactly."""
    _tune(spark)
    import pandas as pd

    from exactextractr_spark.operators.zonal import exact_extract_apply

    def user_fn(pdf: pd.DataFrame) -> pd.DataFrame:
        c = pdf["coverage_fraction"]
        v = pdf["value"]
        return pd.DataFrame(
            {
                "feature_id": [pdf["feature_id"].iloc[0]],
                "wmean": [float((v * c).sum() / c.sum())],
                "n_cells": [int(len(pdf))],
            }
        )

    return exact_extract_apply(
        _synth_raster(spark), _synth_features(spark, sf_dir), user_fn,
        "feature_id long, wmean double, n_cells long",
    )


def _q_line_lengths(spark: SparkSession, sf_dir: str) -> DataFrame:
    """LineString per-cell traversal lengths (the reference CLI's linear
    coverage, raster_cell_intersection.cpp:250-259). Horizontal lines at
    quarter offsets so every per-cell length is a closed-form x-overlap."""
    _tune(spark)
    from exactextractr_spark.operators.coverage_op import line_cell_lengths_df
    from exactextractr_spark.sources.features import prepare_features

    nat = spark.read.parquet(f"{sf_dir}/nation.parquet")
    k = F.col("n_nationkey")
    x0 = ((k * 5) % 31) + F.lit(0.25)
    x1 = x0 + (k % 7) + F.lit(1.5)
    y = ((k * 3) % 43) + F.lit(0.5)
    wkt = F.concat(
        F.lit("LINESTRING ("),
        x0.cast("string"), F.lit(" "), y.cast("string"), F.lit(", "),
        x1.cast("string"), F.lit(" "), y.cast("string"), F.lit(")"),
    )
    feats = prepare_features(
        nat.select(k.cast("long").alias("feature_id"), wkt.alias("geom")),
        "feature_id", "geom",
    )
    out = line_cell_lengths_df(_synth_raster(spark), feats)
    return out.select("feature_id", "cell", "v", "length")


def _q_line_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Named stats over LineStrings, length-weighted (reference CLI linear
    semantics): mean/sum/count/mode over the same closed-form lines as
    line_lengths — the oracle aggregates the identical length facts."""
    _tune(spark)
    from exactextractr_spark.operators.coverage_op import exact_extract_lines
    from exactextractr_spark.sources.features import prepare_features

    nat = spark.read.parquet(f"{sf_dir}/nation.parquet")
    k = F.col("n_nationkey")
    x0 = ((k * 5) % 31) + F.lit(0.25)
    x1 = x0 + (k % 7) + F.lit(1.5)
    y = ((k * 3) % 43) + F.lit(0.5)
    wkt = F.concat(
        F.lit("LINESTRING ("),
        x0.cast("string"), F.lit(" "), y.cast("string"), F.lit(", "),
        x1.cast("string"), F.lit(" "), y.cast("string"), F.lit(")"),
    )
    feats = prepare_features(
        nat.select(k.cast("long").alias("feature_id"), wkt.alias("geom")),
        "feature_id", "geom",
    )
    out = exact_extract_lines(
        _synth_raster(spark), feats, ["mean", "sum", "count", "mode"]
    )
    return out.select(
        "feature_id",
        F.col("mean").alias("lmean"),
        F.col("sum").alias("lsum"),
        F.col("count").alias("lcount"),
        F.col("mode").alias("lmode"),
    )


def _q_image_features(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Decode + feature extraction over the synthetic image tile table.
    Oracle-checked bit-exactly: the tile pixels derive from an arithmetic
    formula, so DuckDB re-computes mean_px (integer pixel sums are exact
    in float64; /256 is dyadic) and the 64-bit pHash (2x2 block sums +
    dyadic median) from scratch — the PNG decode itself is the only step
    the oracle can't replay, and any decode error would corrupt every
    downstream value. std_px stays pytest-only: its sum-of-squares
    rounding depends on numpy's pairwise summation order, which SQL
    cannot replicate bit-for-bit."""
    _tune(spark)
    from exactextractr_spark.operators.multimodal import image_features

    raster = _synth_raster(spark)
    feats = image_features(raster._raw)
    return feats.select("image_id", "h", "w", "mean_px", "phash")


# ---------------------------------------------------------------------------
# contract functions
# ---------------------------------------------------------------------------

def entry(spark: SparkSession) -> DataFrame:
    """Flagship query: full zonal pipeline at sf0.001."""
    return _q_zonal_basic(spark, "/root/testdata/sf0.001")


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    return {
        "zonal_mean_sum_count": _q_zonal_basic,
        "zonal_min_max_var": _q_zonal_minmax,
        "zonal_weighted": _q_zonal_weighted,
        "zonal_mode_minority_variety": _q_zonal_mode,
        "zonal_quantiles": _q_zonal_quantiles,
        "zonal_frac_long": _q_zonal_frac,
        "coverage_sparse": _q_coverage_sparse,
        "candidate_tiles": _q_candidate_tiles,
        "rasterize_argmax": _q_rasterize,
        "resample_sum": _q_resample,
        "knn_ring": _q_knn,
        "cosine_topk": _q_cosine_topk,
        "embedding_dedup": _q_embedding_dedup,
        "dedup_exact": _q_dedup_exact,
        "text_quality": _q_text_quality,
        "gopher_quality": _q_gopher_quality,
        "doc_repetition": _q_doc_repetition,
        "simhash_dedup": _q_simhash_dedup,
        "image_phash_dedup": _q_image_phash_dedup,
        "minhash_dedup": _q_minhash_dedup,
        "minhash_sigs": _q_minhash_sigs,
        "simhash": _q_simhash,
        "lang_id": _q_lang_id,
        "zonal_area_weighted": _q_zonal_area_weighted,
        "zonal_stack": _q_zonal_stack,
        "zonal_stack_shared": _q_zonal_stack_shared,
        "zonal_stack_freq": _q_zonal_stack_freq,
        "pixels_xy": _q_pixels_xy,
        "weighted_frac_long": _q_weighted_frac_long,
        "resample_misaligned": _q_resample_misaligned,
        "resample_mode": _q_resample_mode,
        "ngram_jaccard": _q_ngram_jaccard,
        "lsh_cosine": _q_lsh_cosine,
        "ivf_cosine": _q_ivf_cosine,
        "fingerprint64": _q_fingerprint,
        "image_features_png": _q_image_features,
        "udf_apply": _q_udf_apply,
        "line_lengths": _q_line_lengths,
        "line_stats": _q_line_stats,
        "image_resize_px": _q_image_resize_px,
        "image_augment_px": _q_image_augment_px,
    }


# --------------------------------------------------------------------------
# MinHash / SimHash DuckDB oracles. The engine's token hash is FNV-1a over
# the token bytes (chosen precisely so an independent SQL oracle can verify
# the whole pipeline bit-exactly); shingle rolling and the multiply-shift
# family are wraparound mod-2^64 arithmetic, expressed in HUGEINT-safe SQL
# via 32-bit-split modular multiplies. ASCII corpora only (the synthetic
# documents table is ASCII): DuckDB tokenizes code points, the engine
# tokenizes utf-8 bytes — identical below 0x80.
# --------------------------------------------------------------------------

_M64 = 1 << 64


def _sql_modmul(a_expr: str, g_expr: str) -> str:
    """(a * g) mod 2^64 without overflowing HUGEINT: split g into 32-bit
    halves; a*lo < 2^96 and (a%2^32)*hi < 2^64 both fit."""
    return (
        f"(((({a_expr} % 4294967296)::HUGEINT * (({g_expr}) >> 32)) "
        f"% 4294967296) * 4294967296 "
        f"+ ({a_expr}::HUGEINT * (({g_expr}) & 4294967295))) % {_M64}"
    )


def _sql_fnv_str(expr: str) -> str:
    """FNV-1a over the bytes of an ASCII string expression (same fold as
    _SQL_FNV_TOKENS, but over an arbitrary string — used to re-derive the
    LSH hyperplane sign family)."""
    return (
        "list_reduce("
        "list_prepend(14695981039346656037::UBIGINT, "
        f"list_transform(string_split({expr}, ''), c -> unicode(c)::UBIGINT)), "
        "(h, c) -> ((xor(h::UBIGINT, c::UBIGINT)::HUGEINT * 1099511628211) "
        f"% {_M64})::UBIGINT)"
    )


_SQL_FNV_TOKENS = (
    "list_transform("
    "list_filter(regexp_split_to_array(lower(text), '[^a-z0-9_]+'), "
    "t -> t <> ''), "
    "tok -> list_reduce("
    "list_prepend(14695981039346656037::UBIGINT, "
    "list_transform(string_split(tok, ''), c -> unicode(c)::UBIGINT)), "
    "(h, c) -> ((xor(h::UBIGINT, c::UBIGINT)::HUGEINT * 1099511628211) "
    f"% {_M64})::UBIGINT))"
)


def _minhash_oracle_cte(num_hashes: int, bands: int, seed: int) -> str:
    """CTEs th -> grams -> gflat -> mins -> sigs reproducing
    minhash_signatures (shingle_k=3) bit-exactly."""
    from exactextractr_spark.operators.dedup import _POLY_P, _minhash_params

    a, b = _minhash_params(num_hashes, seed)
    params_rows = ", ".join(
        f"({i}, {int(a[i])}, {int(b[i])})" for i in range(num_hashes)
    )
    p = int(_POLY_P)

    def roll2(h0: str, h1: str) -> str:
        return f"(({_sql_modmul(str(p), h0)} + {h1}) % {_M64})::UBIGINT"

    def roll3(h0: str, h1: str, h2: str) -> str:
        return f"(({_sql_modmul(str(p), roll2(h0, h1))} + {h2}) % {_M64})::UBIGINT"

    return f"""
WITH th AS (
  SELECT doc_id, {_SQL_FNV_TOKENS} AS hs FROM documents
),
grams AS (
  SELECT doc_id,
    CASE
      WHEN len(hs) = 0 THEN [14695981039346656037::UBIGINT]
      WHEN len(hs) = 1 THEN [hs[1]]
      WHEN len(hs) = 2 THEN [{roll2('hs[1]', 'hs[2]')}]
      ELSE list_distinct(list_transform(range(1, len(hs) - 1),
             i -> {roll3('hs[i]', 'hs[i+1]', 'hs[i+2]')}))
    END AS gs
  FROM th
),
gflat AS (SELECT doc_id, unnest(gs) AS g FROM grams),
mins AS (
  SELECT doc_id, p.i,
         min((({_sql_modmul('p.a', 'g')} + p.b) % {_M64})::UBIGINT) AS m
  FROM gflat, (VALUES {params_rows}) p(i, a, b)
  GROUP BY doc_id, p.i
),
sigs AS (
  SELECT doc_id, array_agg(m ORDER BY i) AS sig FROM mins GROUP BY doc_id
)"""


def _minhash_dedup_oracle(num_hashes: int = 32, bands: int = 8,
                          threshold: float = 0.8, seed: int = 42) -> str:
    rows_per_band = num_hashes // bands
    return _minhash_oracle_cte(num_hashes, bands, seed) + f""",
bands AS (
  SELECT doc_id, b.b,
         list_slice(sig, b.b * {rows_per_band} + 1,
                    (b.b + 1) * {rows_per_band}) AS sl
  FROM sigs, (SELECT unnest(range(0, {bands})) AS b) b
),
cand AS (
  SELECT DISTINCT l.doc_id AS id_a, r.doc_id AS id_b
  FROM bands l JOIN bands r
    ON l.b = r.b AND l.sl = r.sl AND l.doc_id < r.doc_id
),
losers AS (
  SELECT DISTINCT c.id_b AS doc_id
  FROM cand c JOIN sigs sa ON sa.doc_id = c.id_a
              JOIN sigs sb ON sb.doc_id = c.id_b
  WHERE len(list_filter(range(1, {num_hashes} + 1),
                        j -> sa.sig[j] = sb.sig[j]))
        / {float(num_hashes)} >= {threshold}
)
SELECT d.doc_id FROM documents d ANTI JOIN losers USING (doc_id)
"""


def _minhash_sigs_oracle(num_hashes: int = 32, seed: int = 42) -> str:
    # exploded rows to match the Spark side: (doc_id, pos, h) with h as
    # signed int64 (uint64 two's-complement reinterpretation)
    return _minhash_oracle_cte(num_hashes, 1, seed) + f"""
SELECT doc_id, (p.p)::BIGINT AS pos,
  CASE WHEN sig[p.p + 1] >= 9223372036854775808::UBIGINT
       THEN (sig[p.p + 1]::HUGEINT - {_M64})::BIGINT
       ELSE sig[p.p + 1]::BIGINT END AS h
FROM sigs, (SELECT unnest(range(0, {num_hashes})) AS p) p
"""


_SIMHASH_CTE = f"""
WITH toks AS (
  SELECT doc_id, unnest({_SQL_FNV_TOKENS}) AS h FROM documents
),
bits AS (
  SELECT doc_id, b.bit,
         sum(CASE WHEN (h >> b.bit) & 1 = 1 THEN 1 ELSE -1 END) AS s
  FROM toks, (SELECT unnest(range(0, 64)) AS bit) b
  GROUP BY doc_id, b.bit
),
sh AS (
  SELECT doc_id,
         sum(CASE WHEN s > 0 THEN
               CASE WHEN bit = 63 THEN (-9223372036854775807 - 1)
                    ELSE (1::BIGINT << bit) END
             ELSE 0 END)::BIGINT AS simhash
  FROM bits GROUP BY doc_id
)"""

_SIMHASH_ORACLE = _SIMHASH_CTE + """
SELECT d.doc_id, coalesce(sh.simhash, 0)::BIGINT AS simhash
FROM documents d LEFT JOIN sh USING (doc_id)
"""


def _hamming_dedup_sql(id_expr: str, max_hamming: int = 3,
                       bands: int = 4) -> str:
    """Shared tail of the hamming-dedup oracles: given a CTE named ``hs``
    with columns (id, h), re-derive dedup.hamming_dedup — band extraction
    ((h >> start) & mask matches shiftrightunsigned on the masked low
    bits regardless of arithmetic-vs-logical shift), pigeonhole-exact
    candidate join, bit_count(xor) filter, greedy-by-id keep rule."""
    band_rows = []
    for b in range(bands):
        s = 64 * b // bands
        w = 64 * (b + 1) // bands - s
        band_rows.append(f"({b}, {s}, {(1 << w) - 1})")
    return f""",
bandx AS (
  SELECT hs.id, sp.bi, (hs.h >> sp.s) & sp.mask AS bv
  FROM hs, (VALUES {', '.join(band_rows)}) sp(bi, s, mask)
),
pairs AS (
  SELECT DISTINCT l.id AS id_a, r.id AS id_b
  FROM bandx l JOIN bandx r ON l.bi = r.bi AND l.bv = r.bv AND l.id < r.id
),
close_pairs AS (
  SELECT p.id_a, p.id_b
  FROM pairs p JOIN hs a ON a.id = p.id_a JOIN hs b ON b.id = p.id_b
  WHERE bit_count(xor(a.h, b.h)) <= {max_hamming}
)
SELECT hs.id AS {id_expr}, COALESCE(c.n, 0)::BIGINT AS near_dups
FROM hs
LEFT JOIN (SELECT id_a, COUNT(*) AS n FROM close_pairs GROUP BY id_a) c
  ON hs.id = c.id_a
WHERE hs.id NOT IN (SELECT id_b FROM close_pairs)
"""


def _simhash_dedup_oracle(max_hamming: int = 3, bands: int = 4) -> str:
    return (
        _SIMHASH_CTE
        + """,
hs AS (
  SELECT d.doc_id AS id, coalesce(sh.simhash, 0)::BIGINT AS h
  FROM documents d LEFT JOIN sh USING (doc_id)
)"""
        + _hamming_dedup_sql("doc_id", max_hamming, bands)
    )


def _phash_tiles_cte(grid_n: int = 48, tile: int = 16) -> str:
    """Re-derives core/png.phash64 for every tile of BOTH synthetic rasters
    (v = i % 97, w = (r + 2c) % 13) from the arithmetic pixel formulas:
    2x2-block integer sums are exact in SQL and numpy alike, /4.0 and the
    64-value median stay dyadic-exact, so the hash matches bit-for-bit."""
    nt = grid_n // tile
    return f"""
WITH px AS (
  SELECT lyr.l AS layer, tr.tr, tc.tc, r.r, c.c,
         CASE WHEN lyr.l = 'v'
              THEN ((tr.tr * {tile} + r.r) * {grid_n} + tc.tc * {tile} + c.c) % 97
              ELSE ((tr.tr * {tile} + r.r) + 2 * (tc.tc * {tile} + c.c)) % 13
         END AS val
  FROM (VALUES ('v'), ('w')) lyr(l),
       range(0, {nt}) tr(tr), range(0, {nt}) tc(tc),
       range(0, {tile}) r(r), range(0, {tile}) c(c)
),
blocks AS (
  SELECT layer, tr, tc, (r // 2) AS bi, (c // 2) AS bj,
         SUM(val) / 4.0 AS bmean
  FROM px GROUP BY layer, tr, tc, r // 2, c // 2
),
med AS (
  SELECT layer, tr, tc, MEDIAN(bmean) AS m
  FROM blocks GROUP BY layer, tr, tc
),
hs AS (
  SELECT layer || '/' || tr || '/' || tc AS id,
         SUM(CASE WHEN b.bmean > med.m THEN
               CASE WHEN b.bi * 8 + b.bj = 63 THEN (-9223372036854775807 - 1)
                    ELSE (1::BIGINT << (b.bi * 8 + b.bj)) END
             ELSE 0 END)::BIGINT AS h
  FROM blocks b JOIN med USING (layer, tr, tc)
  GROUP BY layer, tr, tc
)"""


def _image_phash_dedup_oracle(max_hamming: int = 3, bands: int = 4) -> str:
    return _phash_tiles_cte() + _hamming_dedup_sql(
        "image_id", max_hamming, bands
    )


def _image_features_oracle() -> str:
    """Re-derives image_features over the 'v' raster tiles: mean_px =
    SUM(val)/256 (integer sum <= 96*256 is float64-exact in any order;
    /256 dyadic), pHash via the shared tiles CTE. The PNG decode is the
    only step not replayed — a decode error would corrupt every value."""
    return _phash_tiles_cte() + """
, mp AS (
  SELECT 'v/' || tr || '/' || tc AS image_id,
         CAST(16 AS INTEGER) AS h, CAST(16 AS INTEGER) AS w,
         SUM(val)::DOUBLE / 256.0 AS mean_px
  FROM px WHERE layer = 'v'
  GROUP BY tr, tc
)
SELECT mp.image_id, mp.h, mp.w, mp.mean_px, hs.h AS phash
FROM mp JOIN hs ON hs.id = mp.image_id
"""


def _lsh_cosine_oracle(bits: int = 16, dim: int = 64, bands: int = 4,
                       seed: int = 42, k: int = 10) -> str:
    """Re-derives similarity.fnv_rademacher_planes + band_key_udf packing:
    plane sign = parity of FNV-1a('hp{seed}:{b}:{d}'); band key =
    band*2^per_band + MSB-first bit pack of (projection > 0) signs; then the
    same (band,bucket) equi-join candidate set and exact cosine re-rank."""
    per_band = bits // bands
    fnv = _sql_fnv_str(f"'hp{seed}:' || b.b || ':' || d.d")
    return f"""
WITH planes AS (
  SELECT b.b, d.d,
         CASE WHEN ({fnv}) % 2 = 1 THEN 1.0 ELSE -1.0 END AS s
  FROM range(0, {bits}) b(b), range(0, {dim}) d(d)
),
proj AS (
  SELECT e.vec_id, p.b,
         SUM(p.s * e.embedding[p.d + 1]::DOUBLE) AS pr
  FROM embeddings e, planes p
  GROUP BY e.vec_id, p.b
),
keys AS (
  SELECT vec_id,
         (b // {per_band}) * {1 << per_band}
         + SUM(CASE WHEN pr > 0
               THEN 1 << ({per_band - 1} - (b % {per_band}))
               ELSE 0 END) AS bkey
  FROM proj GROUP BY vec_id, b // {per_band}
),
cand AS (
  SELECT DISTINCT q.vec_id AS qid, i.vec_id AS item_id
  FROM keys q JOIN keys i ON q.bkey = i.bkey
  WHERE q.vec_id < 5
),
scored AS (
  SELECT c.qid, c.item_id,
         list_cosine_similarity(CAST(ei.embedding AS DOUBLE[]),
                                CAST(eq.embedding AS DOUBLE[])) AS cs
  FROM cand c
  JOIN embeddings ei ON ei.vec_id = c.item_id
  JOIN embeddings eq ON eq.vec_id = c.qid
),
ranked AS (
  SELECT qid, item_id,
         ROW_NUMBER() OVER (PARTITION BY qid
                            ORDER BY cs DESC, item_id ASC) AS rank
  FROM scored
)
SELECT qid, item_id, rank FROM ranked WHERE rank <= {k}
"""


def _ivf_cosine_oracle(n_centroids: int = 16, nprobe: int = 4,
                       k: int = 10) -> str:
    """Re-derives ivf_cosine_topk(init='first', train_iters=0): centroids =
    the n_centroids lowest-id vectors; items assigned to their argmax-cosine
    list (ties -> lowest cid, matching numpy argmax); queries probe their
    nprobe best lists; exact cosine re-rank within the probed lists."""
    return f"""
WITH cents AS (
  SELECT ROW_NUMBER() OVER (ORDER BY vec_id) - 1 AS cid, embedding AS ce
  FROM (SELECT vec_id, embedding FROM embeddings
        ORDER BY vec_id LIMIT {n_centroids})
),
asg AS (
  SELECT vec_id, cid FROM (
    SELECT e.vec_id, c.cid,
           ROW_NUMBER() OVER (PARTITION BY e.vec_id
             ORDER BY list_cosine_similarity(CAST(e.embedding AS DOUBLE[]),
                                             CAST(c.ce AS DOUBLE[])) DESC,
                      c.cid ASC) AS rn
    FROM embeddings e CROSS JOIN cents c
  ) WHERE rn = 1
),
probes AS (
  SELECT vec_id AS qid, cid FROM (
    SELECT e.vec_id, c.cid,
           ROW_NUMBER() OVER (PARTITION BY e.vec_id
             ORDER BY list_cosine_similarity(CAST(e.embedding AS DOUBLE[]),
                                             CAST(c.ce AS DOUBLE[])) DESC,
                      c.cid ASC) AS rn
    FROM embeddings e CROSS JOIN cents c
    WHERE e.vec_id < 5
  ) WHERE rn <= {nprobe}
),
cand AS (
  SELECT DISTINCT p.qid, a.vec_id AS item_id
  FROM probes p JOIN asg a ON a.cid = p.cid
),
scored AS (
  SELECT c.qid, c.item_id,
         list_cosine_similarity(CAST(ei.embedding AS DOUBLE[]),
                                CAST(eq.embedding AS DOUBLE[])) AS cs
  FROM cand c
  JOIN embeddings ei ON ei.vec_id = c.item_id
  JOIN embeddings eq ON eq.vec_id = c.qid
),
ranked AS (
  SELECT qid, item_id,
         ROW_NUMBER() OVER (PARTITION BY qid
                            ORDER BY cs DESC, item_id ASC) AS rank
  FROM scored
)
SELECT qid, item_id, rank FROM ranked WHERE rank <= {k}
"""


def oracle_sql() -> dict[str, str]:
    g = GRID_N
    return {
        "zonal_mean_sum_count": _FACTS_CTE + """
SELECT feature_id,
       SUM(v * cov) / SUM(cov) AS mean_v,
       SUM(v * cov) AS sum_v,
       SUM(cov) AS cell_count
FROM facts WHERE cov > 0 GROUP BY feature_id
""",
        "zonal_min_max_var": _FACTS_CTE + """
SELECT feature_id,
       MIN(v) AS min_v,
       MAX(v) AS max_v,
       GREATEST(SUM(v*v*cov)/SUM(cov) - (SUM(v*cov)/SUM(cov))*(SUM(v*cov)/SUM(cov)), 0) AS var_v,
       SQRT(GREATEST(SUM(v*v*cov)/SUM(cov) - (SUM(v*cov)/SUM(cov))*(SUM(v*cov)/SUM(cov)), 0)) AS stdev_v
FROM facts WHERE cov > 0 GROUP BY feature_id
""",
        "zonal_weighted": _FACTS_CTE + """
SELECT feature_id,
       SUM(v * cov * w) / SUM(cov * w) AS wmean_v,
       SUM(v * cov * w) AS wsum_v,
       SUM(cov * w) AS wcount_v
FROM facts WHERE cov > 0 GROUP BY feature_id
""",
        "zonal_mode_minority_variety": _FACTS_CTE + """
, freq AS (
  SELECT feature_id, v, SUM(cov) AS sum_c
  FROM facts WHERE cov > 0 GROUP BY feature_id, v
), ranked AS (
  SELECT feature_id, v, sum_c,
         ROW_NUMBER() OVER (PARTITION BY feature_id ORDER BY sum_c DESC, v DESC) AS rn_mode,
         ROW_NUMBER() OVER (PARTITION BY feature_id ORDER BY sum_c ASC, v ASC) AS rn_min
  FROM freq
)
SELECT m.feature_id,
       m.v AS mode_v,
       mi.v AS minority_v,
       vt.variety_v
FROM (SELECT feature_id, v FROM ranked WHERE rn_mode = 1) m
JOIN (SELECT feature_id, v FROM ranked WHERE rn_min = 1) mi USING (feature_id)
JOIN (SELECT feature_id, COUNT(*) AS variety_v FROM freq GROUP BY feature_id) vt USING (feature_id)
""",
        "zonal_quantiles": _FACTS_CTE + """
, freq AS (
  SELECT feature_id, v, SUM(cov) AS w
  FROM facts WHERE cov > 0 GROUP BY feature_id, v
), ranked AS (
  SELECT feature_id, v, w,
         ROW_NUMBER() OVER (PARTITION BY feature_id ORDER BY v) - 1 AS k,
         COUNT(*) OVER (PARTITION BY feature_id) AS n,
         SUM(w) OVER (PARTITION BY feature_id ORDER BY v
                      ROWS UNBOUNDED PRECEDING) AS cw,
         SUM(w) OVER (PARTITION BY feature_id) AS totw
  FROM freq
), scored AS (
  SELECT feature_id, v, k, n, totw,
         CASE WHEN k = 0 THEN 0.0 ELSE k * w + (n - 1) * (cw - w) END AS s,
         totw * (n - 1) AS sn
  FROM ranked
), nxt AS (
  SELECT feature_id, v, s, sn, n,
         LEAD(v) OVER (PARTITION BY feature_id ORDER BY s) AS nv,
         LEAD(s) OVER (PARTITION BY feature_id ORDER BY s) AS ns
  FROM scored
), qv AS (
  SELECT feature_id, q,
         CASE WHEN n = 1 THEN v
              WHEN ns IS NULL THEN v
              ELSE v + (q * sn - s) * (nv - v) / (ns - s) END AS qval
  FROM nxt CROSS JOIN (SELECT UNNEST([0.25, 0.5, 0.75]) AS q) qs
  WHERE s <= q * sn AND (ns IS NULL OR ns > q * sn)
)
SELECT feature_id,
       MAX(CASE WHEN q = 0.5 THEN qval END) AS median,
       MAX(CASE WHEN q = 0.25 THEN qval END) AS q25_v,
       MAX(CASE WHEN q = 0.75 THEN qval END) AS q75_v
FROM qv GROUP BY feature_id
""",
        "zonal_frac_long": _FACTS_CTE + """
, freq AS (
  SELECT feature_id, v AS val, SUM(cov) AS sum_c
  FROM facts WHERE cov > 0 GROUP BY feature_id, v
), tot AS (
  SELECT feature_id, SUM(sum_c) AS tot FROM freq GROUP BY feature_id
)
SELECT f.feature_id, f.val, f.sum_c / t.tot AS frac
FROM freq f JOIN tot t USING (feature_id)
""",
        "coverage_sparse": _FACTS_CTE + f"""
SELECT feature_id, r * {g} + c + 1 AS cell, cov
FROM facts WHERE cov > 0
""",
        "candidate_tiles": f"""
WITH feats AS (
  SELECT c_custkey AS feature_id,
         ((c_custkey * 7) % 37) + 0.25 AS fxmin,
         ((c_custkey * 11) % 37) + 0.25 AS fymin,
         ((c_custkey * 7) % 37) + 0.25 + (c_custkey % 5) + 1.5 AS fxmax,
         ((c_custkey * 11) % 37) + 0.25 + (c_custkey % 7) + 1.5 AS fymax
  FROM customer WHERE c_custkey <= {N_FEATS}
), tiles AS (
  SELECT CAST(i // 3 AS BIGINT) AS tr, CAST(i % 3 AS BIGINT) AS tc
  FROM range(9) t(i)
)
SELECT f.feature_id, COUNT(*) AS n_tiles
FROM feats f JOIN tiles t
  ON f.fxmin < (t.tc + 1) * {TILE} AND f.fxmax > t.tc * {TILE}
 AND f.fymin < {g} - t.tr * {TILE} AND f.fymax > {g} - (t.tr + 1) * {TILE}
GROUP BY f.feature_id
""",
        "rasterize_argmax": _FACTS_CTE + f"""
, ranked AS (
  SELECT r * {g} + c + 1 AS cell, feature_id,
         ROW_NUMBER() OVER (PARTITION BY r, c ORDER BY cov DESC, feature_id ASC) AS rn
  FROM facts WHERE cov > 0
)
SELECT cell, feature_id AS winner FROM ranked WHERE rn = 1
""",
        "resample_sum": f"""
WITH cells AS (
  SELECT CAST(i // {g} AS BIGINT) AS r, CAST(i % {g} AS BIGINT) AS c,
         CAST(i % 97 AS DOUBLE) AS v
  FROM range({g * g}) t(i)
)
SELECT r // 4 AS dst_row, c // 4 AS dst_col, SUM(v) AS sum_v
FROM cells GROUP BY r // 4, c // 4
""",
        "knn_ring": f"""
WITH pts AS (
  SELECT c_custkey AS pid,
         ((c_custkey * 13) % 97) / 2.0 AS px,
         ((c_custkey * 29) % 89) / 2.0 AS py
  FROM customer WHERE c_custkey <= 600
), qs AS (
  SELECT CAST(n_nationkey AS BIGINT) AS qid,
         ((n_nationkey * 17) % 97) / 2.0 AS qx,
         ((n_nationkey * 23) % 89) / 2.0 AS qy
  FROM nation
), scored AS (
  SELECT q.qid, p.pid,
         SQRT(POW(q.qx - p.px, 2) + POW(q.qy - p.py, 2)) AS dist,
         ROW_NUMBER() OVER (PARTITION BY q.qid
                            ORDER BY SQRT(POW(q.qx - p.px, 2) + POW(q.qy - p.py, 2)), p.pid) AS rank
  FROM qs q CROSS JOIN pts p
)
SELECT qid, pid, dist, rank FROM scored WHERE rank <= 5
""",
        "cosine_topk": """
WITH qs AS (
  SELECT vec_id AS qid, embedding AS qe FROM embeddings WHERE vec_id < 5
), scored AS (
  SELECT q.qid, e.vec_id AS item_id,
         list_cosine_similarity(e.embedding, q.qe) AS cos_sim
  FROM embeddings e CROSS JOIN qs q
), ranked AS (
  SELECT qid, item_id,
         ROW_NUMBER() OVER (PARTITION BY qid ORDER BY cos_sim DESC, item_id ASC) AS rank
  FROM scored
)
SELECT qid, item_id, rank FROM ranked WHERE rank <= 10
""",
        "lsh_cosine": _lsh_cosine_oracle(),
        "ivf_cosine": _ivf_cosine_oracle(),
        "embedding_dedup": """
WITH pairs AS (
  SELECT a.vec_id AS id_a, b.vec_id AS id_b
  FROM embeddings a JOIN embeddings b ON a.vec_id < b.vec_id
  WHERE list_cosine_similarity(CAST(a.embedding AS DOUBLE[]),
                               CAST(b.embedding AS DOUBLE[])) >= 0.46
)
SELECT e.vec_id, COALESCE(c.n, 0) AS near_dups
FROM embeddings e
LEFT JOIN (SELECT id_a, COUNT(*) AS n FROM pairs GROUP BY id_a) c
  ON e.vec_id = c.id_a
WHERE e.vec_id NOT IN (SELECT id_b FROM pairs)
""",
        "dedup_exact": r"""
SELECT MIN(doc_id) AS doc_id, COUNT(*) AS dup_count
FROM documents
GROUP BY lower(substr(regexp_replace(text, '\s+', ' ', 'g'), 1, 40))
""",
        "text_quality": r"""
SELECT doc_id,
       len(regexp_split_to_array(lower(trim(text)), '\s+')) AS n_words,
       len(regexp_split_to_array(trim(text), '\s+')) AS ws_tokens,
       len(regexp_extract_all(text, '\w+|[^\w\s]')) AS bpe_tokens,
       CAST(length(text) - length(regexp_replace(text, '[^\w\s]', '', 'g')) AS DOUBLE)
         / GREATEST(length(text), 1) AS punct_ratio,
       CAST(len(list_distinct(regexp_split_to_array(lower(trim(text)), '\s+'))) AS DOUBLE)
         / len(regexp_split_to_array(lower(trim(text)), '\s+')) AS distinct_word_ratio
FROM documents
""",
        "gopher_quality": r"""
WITH base AS (
  SELECT doc_id, text,
         list_filter(regexp_split_to_array(lower(trim(text)), '\s+'),
                     w -> w <> '') AS ws,
         list_filter(list_transform(string_split(text, chr(10)),
                                    l -> trim(l)), l -> l <> '') AS ls
  FROM documents
),
m AS (
  SELECT doc_id,
         len(ws) AS n_words,
         GREATEST(len(ws), 1) AS nw1,
         list_sum(list_transform(ws, w -> len(w))) AS sum_wlen,
         len(list_filter(ws, w -> regexp_matches(w, '[a-z]'))) AS n_alpha,
         length(text) - length(regexp_replace(text, '#', '', 'g')) AS n_hash,
         (length(text) - length(regexp_replace(text, '\.\.\.', '', 'g')))
           / 3.0 AS n_ell,
         GREATEST(len(ls), 1) AS nl1,
         len(list_filter(ls, l -> l LIKE '-%' OR l LIKE '*%'
                                OR l LIKE '•%')) AS n_bullet,
         len(list_filter(ls, l -> l LIKE '%...')) AS n_ell_lines,
         len(list_intersect(list_distinct(ws),
             ['the','a','of','and','to','in','is','it','that','for']))
           AS stopword_hits
  FROM base
)
SELECT doc_id,
       n_words::BIGINT AS n_words,
       COALESCE(sum_wlen, 0)::DOUBLE / nw1 AS mean_word_len,
       (n_hash + n_ell)::DOUBLE / nw1 AS symbol_word_ratio,
       n_bullet::DOUBLE / nl1 AS bullet_line_frac,
       n_ell_lines::DOUBLE / nl1 AS ellipsis_line_frac,
       n_alpha::DOUBLE / nw1 AS frac_alpha_words,
       stopword_hits::BIGINT AS stopword_hits,
       (n_words >= 10 AND n_words <= 100000
        AND COALESCE(sum_wlen, 0)::DOUBLE / nw1 BETWEEN 3.0 AND 10.0
        AND (n_hash + n_ell)::DOUBLE / nw1 <= 0.1
        AND n_bullet::DOUBLE / nl1 <= 0.9
        AND n_ell_lines::DOUBLE / nl1 <= 0.3
        AND n_alpha::DOUBLE / nw1 >= 0.8
        AND stopword_hits >= 2)::INT AS gopher_pass
FROM m
""",
        "doc_repetition": r"""
WITH ls AS (
  SELECT doc_id, trim(l) AS l
  FROM (SELECT doc_id, unnest(string_split(text, chr(10))) AS l
        FROM documents)
  WHERE trim(l) <> ''
),
lstats AS (
  SELECT doc_id, COUNT(*) AS n_lines, COUNT(DISTINCT l) AS n_dist,
         SUM(len(l)) AS total_chars
  FROM ls GROUP BY doc_id
),
ldup AS (
  SELECT doc_id, SUM((cnt - 1) * len(l)) AS dup_chars
  FROM (SELECT doc_id, l, COUNT(*) AS cnt FROM ls GROUP BY doc_id, l)
  GROUP BY doc_id
),
ws AS (
  SELECT doc_id,
         list_filter(regexp_split_to_array(lower(trim(text)), '\s+'),
                     w -> w <> '') AS w
  FROM documents
),
grams AS (
  SELECT doc_id,
         unnest(list_transform(range(1, len(w)),
                               i -> w[i] || ' ' || w[i + 1])) AS g
  FROM ws WHERE len(w) >= 2
),
gtop AS (
  SELECT doc_id, g, cnt FROM (
    SELECT doc_id, g, COUNT(*) AS cnt,
           ROW_NUMBER() OVER (PARTITION BY doc_id
                              ORDER BY COUNT(*) DESC, g ASC) AS rn
    FROM grams GROUP BY doc_id, g
  ) WHERE rn = 1
)
SELECT d.doc_id,
       COALESCE(s.n_lines, 0)::BIGINT AS n_lines,
       COALESCE((s.n_lines - s.n_dist)::DOUBLE
                / GREATEST(s.n_lines, 1), 0.0) AS dup_line_frac,
       COALESCE(ld.dup_chars::DOUBLE
                / GREATEST(s.total_chars, 1), 0.0) AS dup_line_char_frac,
       gt.g AS top_2gram,
       COALESCE(gt.cnt, 0)::BIGINT AS top_2gram_count,
       COALESCE(gt.cnt * len(gt.g), 0)::DOUBLE
         / GREATEST(length(d.text), 1) AS top_2gram_char_frac
FROM documents d
LEFT JOIN lstats s USING (doc_id)
LEFT JOIN ldup ld USING (doc_id)
LEFT JOIN gtop gt USING (doc_id)
""",
        "zonal_area_weighted": _FACTS_CTE + """
SELECT feature_id,
       SUM(v * cov) / SUM(cov) AS awmean_v,
       SUM(cov) AS awcount_v,
       SUM(v * cov) AS awsum_v
FROM facts WHERE cov > 0 GROUP BY feature_id
""",
        "zonal_stack": _FACTS_CTE + """
SELECT feature_id,
       SUM(v * cov) / SUM(cov) AS mean_v,
       MAX(v) AS max_v,
       SUM(w * cov) / SUM(cov) AS mean_w,
       MAX(w) AS max_w
FROM facts WHERE cov > 0 GROUP BY feature_id
""",
        "zonal_stack_shared": _FACTS_CTE + """
SELECT feature_id,
       SUM(v * cov) / SUM(cov) AS mean_v,
       MAX(v) AS max_v,
       SUM(w * cov) / SUM(cov) AS mean_w,
       MAX(w) AS max_w
FROM facts WHERE cov > 0 GROUP BY feature_id
""",
        "zonal_stack_freq": _FACTS_CTE + """
, fv AS (
  SELECT feature_id, v, SUM(cov) AS sum_c
  FROM facts WHERE cov > 0 GROUP BY feature_id, v
), fw AS (
  SELECT feature_id, w AS v, SUM(cov) AS sum_c
  FROM facts WHERE cov > 0 GROUP BY feature_id, w
), rv AS (
  SELECT feature_id, v,
         ROW_NUMBER() OVER (PARTITION BY feature_id ORDER BY sum_c DESC, v DESC) AS rn
  FROM fv
), rw AS (
  SELECT feature_id, v,
         ROW_NUMBER() OVER (PARTITION BY feature_id ORDER BY sum_c DESC, v DESC) AS rn
  FROM fw
)
SELECT a.feature_id,
       a.v AS mode_v, va.variety_v,
       b.v AS mode_w, vb.variety_w
FROM (SELECT feature_id, v FROM rv WHERE rn = 1) a
JOIN (SELECT feature_id, v FROM rw WHERE rn = 1) b USING (feature_id)
JOIN (SELECT feature_id, COUNT(*) AS variety_v FROM fv GROUP BY feature_id) va USING (feature_id)
JOIN (SELECT feature_id, COUNT(*) AS variety_w FROM fw GROUP BY feature_id) vb USING (feature_id)
""",
        "pixels_xy": _FACTS_CTE + f"""
SELECT feature_id, v, cov,
       c + 0.5 AS x,
       {g} - r - 0.5 AS y,
       r * {g} + c + 1 AS cell,
       1.0 AS area
FROM facts WHERE cov > 0
""",
        "weighted_frac_long": _FACTS_CTE + """
, freq AS (
  SELECT feature_id, v AS val, SUM(cov * w) AS sum_cw
  FROM facts WHERE cov > 0 GROUP BY feature_id, v
), tot AS (
  SELECT feature_id, SUM(sum_cw) AS tot FROM freq GROUP BY feature_id
)
SELECT f.feature_id, f.val, f.sum_cw / t.tot AS wfrac
FROM freq f JOIN tot t USING (feature_id)
""",
        "resample_misaligned": f"""
WITH cells AS (
  SELECT CAST(i // {g} AS BIGINT) AS r, CAST(i % {g} AS BIGINT) AS c,
         CAST(i % 97 AS DOUBLE) AS v
  FROM range({g * g}) t(i)
), dst AS (
  SELECT CAST(i // 10 AS BIGINT) AS dr, CAST(i % 10 AS BIGINT) AS dc
  FROM range(100) t(i)
), rf AS (
  SELECT d.dr, d.dc, cl.v,
         GREATEST(0, LEAST(cl.c + 1, 4.5 * (d.dc + 1)) - GREATEST(cl.c, 4.5 * d.dc)) *
         GREATEST(0, LEAST({g} - cl.r, {g} - 4.5 * d.dr) - GREATEST({g} - 1 - cl.r, {g} - 4.5 * (d.dr + 1))) AS cov
  FROM dst d JOIN cells cl
    ON cl.c + 1 > 4.5 * d.dc AND cl.c < 4.5 * (d.dc + 1)
   AND {g} - cl.r > {g} - 4.5 * (d.dr + 1) AND {g} - 1 - cl.r < {g} - 4.5 * d.dr
)
SELECT dr AS dst_row, dc AS dst_col, SUM(v * cov) / SUM(cov) AS mean_v
FROM rf WHERE cov > 0 GROUP BY dr, dc
""",
        "resample_mode": f"""
WITH cells AS (
  SELECT CAST(i // {g} AS BIGINT) AS r, CAST(i % {g} AS BIGINT) AS c,
         CAST(i % 97 AS DOUBLE) AS v
  FROM range({g * g}) t(i)
), dst AS (
  SELECT CAST(i // 10 AS BIGINT) AS dr, CAST(i % 10 AS BIGINT) AS dc
  FROM range(100) t(i)
), rf AS (
  SELECT d.dr, d.dc, cl.v,
         GREATEST(0, LEAST(cl.c + 1, 4.5 * (d.dc + 1)) - GREATEST(cl.c, 4.5 * d.dc)) *
         GREATEST(0, LEAST({g} - cl.r, {g} - 4.5 * d.dr) - GREATEST({g} - 1 - cl.r, {g} - 4.5 * (d.dr + 1))) AS cov
  FROM dst d JOIN cells cl
    ON cl.c + 1 > 4.5 * d.dc AND cl.c < 4.5 * (d.dc + 1)
   AND {g} - cl.r > {g} - 4.5 * (d.dr + 1) AND {g} - 1 - cl.r < {g} - 4.5 * d.dr
), freq AS (
  SELECT dr, dc, v, SUM(cov) AS sum_c FROM rf WHERE cov > 0 GROUP BY dr, dc, v
), ranked AS (
  SELECT dr, dc, v,
         ROW_NUMBER() OVER (PARTITION BY dr, dc ORDER BY sum_c DESC, v DESC) AS rn
  FROM freq
)
SELECT dr AS dst_row, dc AS dst_col, v AS mode_v FROM ranked WHERE rn = 1
""",
        "ngram_jaccard": r"""
WITH toks AS (
  SELECT doc_id AS id,
         regexp_split_to_array(lower(regexp_replace(text, '[^\w\s]', '', 'g')), '\s+') AS t
  FROM documents
), grams0 AS (
  SELECT DISTINCT id, array_to_string(t[i:i+2], ' ') AS gram
  FROM toks, UNNEST(range(1, GREATEST(len(t) - 3, 0) + 2)) AS u(i)
  WHERE length(array_to_string(t[i:i+2], ' ')) > 0
), rare AS (
  SELECT gram FROM grams0 GROUP BY gram HAVING COUNT(*) <= 20
), grams AS (
  SELECT g.id, g.gram FROM grams0 g JOIN rare USING (gram)
), sizes AS (
  SELECT id, COUNT(*) AS sz FROM grams GROUP BY id
), inter AS (
  SELECT a.id AS id_a, b.id AS id_b, COUNT(*) AS inter
  FROM grams a JOIN grams b ON a.gram = b.gram AND a.id < b.id
  GROUP BY a.id, b.id
)
SELECT i.id_a, i.id_b,
       CAST(i.inter AS DOUBLE) / (sa.sz + sb.sz - i.inter) AS jaccard
FROM inter i
JOIN sizes sa ON sa.id = i.id_a
JOIN sizes sb ON sb.id = i.id_b
WHERE CAST(i.inter AS DOUBLE) / (sa.sz + sb.sz - i.inter) >= 0.5
""",
        "line_lengths": f"""
WITH lines AS (
  SELECT CAST(n_nationkey AS BIGINT) AS feature_id,
         ((n_nationkey * 5) % 31) + 0.25 AS x0,
         ((n_nationkey * 5) % 31) + 0.25 + (n_nationkey % 7) + 1.5 AS x1,
         CAST(47 - ((n_nationkey * 3) % 43) AS BIGINT) AS r
  FROM nation
), cols AS (
  SELECT CAST(i AS BIGINT) AS c FROM range({GRID_N}) t(i)
), hits AS (
  SELECT l.feature_id, l.r, cl.c,
         LEAST(l.x1, cl.c + 1) - GREATEST(l.x0, cl.c) AS length
  FROM lines l JOIN cols cl
    ON cl.c + 1 > l.x0 AND cl.c < l.x1
)
SELECT feature_id,
       r * {GRID_N} + c + 1 AS cell,
       CAST((r * {GRID_N} + c) % 97 AS DOUBLE) AS v,
       length
FROM hits WHERE length > 0
""",
        "line_stats": f"""
WITH lines AS (
  SELECT CAST(n_nationkey AS BIGINT) AS feature_id,
         ((n_nationkey * 5) % 31) + 0.25 AS x0,
         ((n_nationkey * 5) % 31) + 0.25 + (n_nationkey % 7) + 1.5 AS x1,
         CAST(47 - ((n_nationkey * 3) % 43) AS BIGINT) AS r
  FROM nation
), cols AS (
  SELECT CAST(i AS BIGINT) AS c FROM range({GRID_N}) t(i)
), hits AS (
  SELECT l.feature_id,
         CAST((l.r * {GRID_N} + cl.c) % 97 AS DOUBLE) AS v,
         LEAST(l.x1, cl.c + 1) - GREATEST(l.x0, cl.c) AS length
  FROM lines l JOIN cols cl
    ON cl.c + 1 > l.x0 AND cl.c < l.x1
), facts AS (
  SELECT * FROM hits WHERE length > 0
), freq AS (
  SELECT feature_id, v, SUM(length) AS sum_c FROM facts GROUP BY feature_id, v
), md AS (
  SELECT feature_id, v,
         ROW_NUMBER() OVER (PARTITION BY feature_id ORDER BY sum_c DESC, v DESC) AS rn
  FROM freq
)
SELECT a.feature_id,
       SUM(a.v * a.length) / SUM(a.length) AS lmean,
       SUM(a.v * a.length) AS lsum,
       SUM(a.length) AS lcount,
       MAX(m.v) AS lmode
FROM facts a JOIN md m ON m.feature_id = a.feature_id AND m.rn = 1
GROUP BY a.feature_id
""",
        "udf_apply": _FACTS_CTE + """
SELECT feature_id,
       SUM(v * cov) / SUM(cov) AS wmean,
       COUNT(*) AS n_cells
FROM facts WHERE cov > 0 GROUP BY feature_id
""",
        "image_resize_px": f"""
WITH tiles AS (
  SELECT CAST(k // 3 AS BIGINT) AS tr, CAST(k % 3 AS BIGINT) AS tc
  FROM range(9) t(k)
), cells AS (
  SELECT CAST(m // {TILE // 2} AS BIGINT) AS i, CAST(m % {TILE // 2} AS BIGINT) AS j
  FROM range({(TILE // 2) * (TILE // 2)}) u(m)
)
SELECT 'v/' || tr || '/' || tc AS image_id, i, j,
       ( CAST(((tr*{TILE} + 2*i    ) * {GRID_N} + tc*{TILE} + 2*j    ) % 97 AS DOUBLE)
       + CAST(((tr*{TILE} + 2*i    ) * {GRID_N} + tc*{TILE} + 2*j + 1) % 97 AS DOUBLE)
       + CAST(((tr*{TILE} + 2*i + 1) * {GRID_N} + tc*{TILE} + 2*j    ) % 97 AS DOUBLE)
       + CAST(((tr*{TILE} + 2*i + 1) * {GRID_N} + tc*{TILE} + 2*j + 1) % 97 AS DOUBLE)
       ) / 4.0 AS px
FROM tiles, cells
""",
        "image_augment_px": f"""
WITH tiles AS (
  SELECT CAST(k // 3 AS BIGINT) AS tr, CAST(k % 3 AS BIGINT) AS tc
  FROM range(9) t(k)
), cells AS (
  SELECT CAST(m // {TILE} AS BIGINT) AS i, CAST(m % {TILE} AS BIGINT) AS j
  FROM range({TILE * TILE}) u(m)
), ops AS (
  SELECT * FROM (VALUES ('hflip'), ('rot90'), ('transpose')) o(op)
), src AS (
  -- augmented pixel (i, j) pulls source pixel (r, c) by pure index algebra:
  -- hflip (i, W-1-j); rot90 CCW (j, W-1-i); transpose (j, i)
  SELECT tr, tc, i, j, op,
         CASE op WHEN 'hflip' THEN i ELSE j END AS r,
         CASE op WHEN 'hflip' THEN {TILE - 1} - j
                 WHEN 'rot90' THEN {TILE - 1} - i
                 ELSE i END AS c
  FROM tiles, cells, ops
)
SELECT 'v/' || tr || '/' || tc || '#' || op AS image_id, i, j,
       CAST(((tr*{TILE} + r) * {GRID_N} + tc*{TILE} + c) % 97 AS DOUBLE) AS px
FROM src
""",
        "lang_id": r"""
WITH w AS (
  SELECT doc_id, list_distinct(regexp_split_to_array(lower(trim(text)), '\s+')) AS words
  FROM documents
), h AS (
  SELECT doc_id,
    len(list_intersect(words, ['der','die','das','und','ist','ein','eine','zu','nicht','mit'])) AS h_de,
    len(list_intersect(words, ['the','a','of','and','to','in','is','it','that','for'])) AS h_en,
    len(list_intersect(words, ['el','la','los','y','es','un','una','por','para','que'])) AS h_es,
    len(list_intersect(words, ['le','la','les','et','est','un','une','pour','dans','que'])) AS h_fr
  FROM w
)
SELECT doc_id, CASE
  WHEN GREATEST(h_de, h_en, h_es, h_fr) = 0 THEN 'und'
  WHEN h_fr >= h_de AND h_fr >= h_en AND h_fr >= h_es THEN 'fr'
  WHEN h_es >= h_de AND h_es >= h_en THEN 'es'
  WHEN h_en >= h_de THEN 'en'
  ELSE 'de' END AS lang_pred
FROM h
""",
        "fingerprint64": r"""
SELECT doc_id,
       list_reduce(
         list_prepend(CAST(0 AS BIGINT),
           list_transform(
             list_filter(string_split(lower(regexp_replace(text, '\s+', ' ', 'g')), ''),
                         c -> c <> ''),
             c -> CAST(ord(c) AS BIGINT))),
         (h, c) -> (h * 31 + c) % 1000000007) AS fp64
FROM documents
""",
        "minhash_dedup": _minhash_dedup_oracle(),
        "minhash_sigs": _minhash_sigs_oracle(),
        "simhash": _SIMHASH_ORACLE,
        "simhash_dedup": _simhash_dedup_oracle(),
        "image_phash_dedup": _image_phash_dedup_oracle(),
        "image_features_png": _image_features_oracle(),
    }
