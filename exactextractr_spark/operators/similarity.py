"""Embedding similarity search: brute-force cosine top-k + LSH-bucketed ANN.

Training-data-pipeline operators over an ``array<float>`` embedding column.
Brute force is the exactness baseline (JVM-side ``aggregate``/``zip_with``
arithmetic — no Python in the hot path); the scale path buckets vectors by
deterministic random-hyperplane signs (SimHash for vectors) so the join
fans out per bucket instead of per pair.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T
from pyspark.sql.window import Window


def _dot(a, b):
    # cast BEFORE multiplying: float32 inputs promoted to float64 first, so
    # the sum is the same double-precision left-fold DuckDB/numpy compute
    return F.aggregate(
        F.zip_with(a, b, lambda x, y: x.cast("double") * y.cast("double")),
        F.lit(0.0),
        lambda acc, x: acc + x,
    )


def _norm(a):
    return F.sqrt(
        F.aggregate(
            a,
            F.lit(0.0),
            lambda acc, x: acc + x.cast("double") * x.cast("double"),
        )
    )


def cosine_topk(
    items: DataFrame,
    queries: DataFrame,
    k: int,
    *,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    qid_col: str = "qid",
) -> DataFrame:
    """Exact cosine top-k: broadcast the (small) query set against the item
    table, score JVM-side, keep top-k per query via window. Returns
    (qid, vec_id, cos_sim, rank)."""
    q = queries.select(
        F.col(qid_col).alias("qid"), F.col(vec_col).alias("_qvec")
    )
    scored = items.join(F.broadcast(q)).select(
        "qid",
        F.col(id_col).alias("item_id"),
        (
            _dot(F.col(vec_col), F.col("_qvec"))
            / (_norm(F.col(vec_col)) * _norm(F.col("_qvec")))
        ).alias("cos_sim"),
    )
    w = Window.partitionBy("qid").orderBy(F.desc("cos_sim"), F.asc("item_id"))
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select("qid", "item_id", "cos_sim", "rank")
    )


def hyperplane_signature(dim: int, bits: int, seed: int = 42) -> np.ndarray:
    """Deterministic random hyperplanes for vector SimHash bucketing."""
    rng = np.random.default_rng(seed)
    return rng.standard_normal((bits, dim))


def lsh_cosine_topk(
    items: DataFrame,
    queries: DataFrame,
    k: int,
    *,
    dim: int,
    bits: int = 16,
    bands: int = 4,
    seed: int = 42,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    qid_col: str = "qid",
) -> DataFrame:
    """ANN variant: sign-bucket both sides on ``bands`` independent
    hyperplane bands, equi-join on (band, bucket) — the 100-TB path where a
    broadcast of queries or a full cross product is impossible — then exact
    re-rank within candidates. Recall < 1 by construction; increase bands
    for higher recall."""
    planes = hyperplane_signature(dim, bits, seed)
    per_band = bits // bands

    @F.pandas_udf(T.ArrayType(T.LongType()))
    def band_keys(vecs: pd.Series) -> pd.Series:
        out = []
        for v in vecs:
            x = np.asarray(v, dtype=np.float64)
            signs = (planes @ x) > 0
            keys = []
            for b in range(bands):
                bitsl = signs[b * per_band : (b + 1) * per_band]
                key = 0
                for bit in bitsl:
                    key = key * 2 + int(bit)
                keys.append(b * (1 << per_band) + key)
            out.append(keys)
        return pd.Series(out)

    it = items.withColumn("bkey", F.explode(band_keys(F.col(vec_col))))
    qq = queries.select(
        F.col(qid_col).alias("qid"), F.col(vec_col).alias("_qvec")
    ).withColumn("bkey", F.explode(band_keys(F.col("_qvec"))))
    cand = (
        it.join(qq, on="bkey")
        .select(
            "qid",
            F.col(id_col).alias("item_id"),
            (
                _dot(F.col(vec_col), F.col("_qvec"))
                / (_norm(F.col(vec_col)) * _norm(F.col("_qvec")))
            ).alias("cos_sim"),
        )
        .dropDuplicates(["qid", "item_id"])
    )
    w = Window.partitionBy("qid").orderBy(F.desc("cos_sim"), F.asc("item_id"))
    return (
        cand.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select("qid", "item_id", "cos_sim", "rank")
    )
