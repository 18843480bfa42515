"""Document deduplication: exact, MinHash+LSH, SimHash, n-gram Jaccard.

Training-data-pipeline operators over the ``documents`` table. Exact dedup
is a pure hash-groupBy (one shuffle, JVM-side). Near-dup pipelines follow
the standard shingle → signature → band-bucket → bucket-join → verify shape,
with deterministic hash families so runs are reproducible.
"""

from __future__ import annotations

import re
from typing import Iterator

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T
from pyspark.sql.window import Window

_MERSENNE = (1 << 61) - 1


def exact_dedup(
    docs: DataFrame, *, id_col: str = "doc_id", text_col: str = "text",
    normalize: bool = True,
) -> DataFrame:
    """Keep the lowest id per distinct (normalized) text. Entirely
    JVM-side: sha2 hash + min groupBy — one shuffle, map-side combined."""
    txt = F.col(text_col)
    if normalize:
        txt = F.lower(F.regexp_replace(txt, r"\s+", " "))
    keyed = docs.withColumn("_h", F.sha2(txt, 256))
    keep = keyed.groupBy("_h").agg(F.min(id_col).alias(id_col))
    return docs.join(keep, on=id_col, how="inner").drop("_h")


def _minhash_params(num_hashes: int, seed: int) -> tuple[np.ndarray, np.ndarray]:
    rng = np.random.default_rng(seed)
    a = rng.integers(1, _MERSENNE, num_hashes, dtype=np.int64)
    b = rng.integers(0, _MERSENNE, num_hashes, dtype=np.int64)
    return a, b


def _shingles(text: str, k: int) -> np.ndarray:
    toks = re.findall(r"\w+", text.lower())
    if len(toks) < k:
        grams = [" ".join(toks)] if toks else [""]
    else:
        grams = [" ".join(toks[i : i + k]) for i in range(len(toks) - k + 1)]
    return np.unique(
        np.array([hash(g) & 0x7FFFFFFFFFFFFFFF for g in grams], dtype=np.int64)
    )


def minhash_signatures(
    docs: DataFrame,
    *,
    id_col: str = "doc_id",
    text_col: str = "text",
    num_hashes: int = 64,
    shingle_k: int = 3,
    seed: int = 42,
) -> DataFrame:
    """(id, sig:array<long>) MinHash signatures, vectorized per Arrow batch.

    Note: python ``hash`` of str is salted per-process; we use a stable
    FNV-1a instead for cross-executor determinism.
    """
    a, b = _minhash_params(num_hashes, seed)

    def _fnv(g: str) -> int:
        h = 0xCBF29CE484222325
        for ch in g.encode():
            h ^= ch
            h = (h * 0x100000001B3) & 0xFFFFFFFFFFFFFFFF
        return h & 0x7FFFFFFFFFFFFFFF

    def _sig(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            sigs = []
            for text in pdf[text_col]:
                toks = re.findall(r"\w+", (text or "").lower())
                if len(toks) < shingle_k:
                    grams = [" ".join(toks)] if toks else [""]
                else:
                    grams = [
                        " ".join(toks[i : i + shingle_k])
                        for i in range(len(toks) - shingle_k + 1)
                    ]
                hv = np.unique(np.array([_fnv(g) for g in grams], dtype=np.uint64))
                # (a*h + b) mod p, rowwise min
                hmat = (
                    a[:, None].astype(np.object_) * hv[None, :].astype(np.object_)
                    + b[:, None]
                ) % _MERSENNE
                sigs.append(np.min(np.asarray(hmat, dtype=np.uint64), axis=1).astype(np.int64))
            yield pd.DataFrame({id_col: pdf[id_col], "sig": sigs})

    schema = T.StructType(
        [
            T.StructField(id_col, T.LongType()),
            T.StructField("sig", T.ArrayType(T.LongType())),
        ]
    )
    return docs.select(id_col, text_col).mapInPandas(_sig, schema)


def minhash_lsh_pairs(
    sigs: DataFrame,
    *,
    id_col: str = "doc_id",
    bands: int = 16,
    threshold: float = 0.7,
) -> DataFrame:
    """Band signatures into buckets; ids sharing any band-bucket become
    candidate pairs; estimated Jaccard (signature agreement) filters.
    Returns (id_a, id_b, est_jaccard) with id_a < id_b."""
    num_hashes = len(sigs.select("sig").first()["sig"])
    rows_per_band = num_hashes // bands
    banded = sigs.select(
        id_col,
        "sig",
        F.explode(
            F.expr(
                f"transform(sequence(0, {bands - 1}), b -> "
                f"struct(b as band, hash(slice(sig, b*{rows_per_band}+1, {rows_per_band})) as bucket))"
            )
        ).alias("bb"),
    ).select(id_col, "sig", F.col("bb.band"), F.col("bb.bucket"))
    left = banded.select(
        F.col(id_col).alias("id_a"), F.col("sig").alias("sig_a"), "band", "bucket"
    )
    right = banded.select(
        F.col(id_col).alias("id_b"), F.col("sig").alias("sig_b"), "band", "bucket"
    )
    pairs = (
        left.join(right, on=["band", "bucket"])
        .filter(F.col("id_a") < F.col("id_b"))
        .dropDuplicates(["id_a", "id_b"])
        .withColumn(
            "est_jaccard",
            F.aggregate(
                F.zip_with(
                    "sig_a", "sig_b", lambda x, y: F.when(x == y, 1.0).otherwise(0.0)
                ),
                F.lit(0.0),
                lambda acc, x: acc + x,
            )
            / F.lit(float(num_hashes)),
        )
        .filter(F.col("est_jaccard") >= threshold)
        .select("id_a", "id_b", "est_jaccard")
    )
    return pairs


def minhash_dedup(
    docs: DataFrame,
    *,
    id_col: str = "doc_id",
    text_col: str = "text",
    num_hashes: int = 64,
    bands: int = 16,
    threshold: float = 0.7,
    seed: int = 42,
) -> DataFrame:
    """Drop near-duplicates: any doc with a smaller near-dup partner id is
    removed (single propagation step — the standard large-scale
    approximation of per-cluster canonical selection)."""
    sigs = minhash_signatures(
        docs, id_col=id_col, text_col=text_col, num_hashes=num_hashes, seed=seed
    )
    pairs = minhash_lsh_pairs(sigs, id_col=id_col, bands=bands, threshold=threshold)
    losers = pairs.select(F.col("id_b").alias(id_col)).distinct()
    return docs.join(losers, on=id_col, how="left_anti")


def simhash64(docs: DataFrame, *, id_col: str = "doc_id", text_col: str = "text") -> DataFrame:
    """64-bit SimHash per document (token FNV hashes, sign-summed)."""

    def _sim(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            out = []
            for text in pdf[text_col]:
                toks = re.findall(r"\w+", (text or "").lower())
                acc = np.zeros(64, dtype=np.int64)
                for t in toks:
                    h = 0xCBF29CE484222325
                    for ch in t.encode():
                        h ^= ch
                        h = (h * 0x100000001B3) & 0xFFFFFFFFFFFFFFFF
                    bits = (np.uint64(h) >> np.arange(64, dtype=np.uint64)) & np.uint64(1)
                    acc += np.where(bits == 1, 1, -1)
                val = 0
                for i in range(64):
                    if acc[i] > 0:
                        val |= 1 << i
                if val >= 1 << 63:
                    val -= 1 << 64
                out.append(val)
            yield pd.DataFrame({id_col: pdf[id_col], "simhash": out})

    schema = T.StructType(
        [T.StructField(id_col, T.LongType()), T.StructField("simhash", T.LongType())]
    )
    return docs.select(id_col, text_col).mapInPandas(_sim, schema)


def ngram_jaccard_pairs(
    docs: DataFrame,
    *,
    id_col: str = "doc_id",
    text_col: str = "text",
    n: int = 3,
    threshold: float = 0.5,
) -> DataFrame:
    """Exact n-gram Jaccard similarity join, entirely JVM-side: explode
    token n-grams, self-join on gram, count intersections, derive
    |A∪B| = |A|+|B|−|A∩B|. The explode/join shape is the scalable exact
    path (gram frequency bounds fan-out)."""
    toks = F.split(F.lower(F.regexp_replace(F.col(text_col), r"[^\w\s]", "")), r"\s+")
    grams = (
        docs.withColumn("_toks", toks)
        .select(
            F.col(id_col).alias("id"),
            F.explode(
                F.expr(
                    f"array_distinct(transform(sequence(0, greatest(size(_toks) - {n}, 0)), "
                    f"i -> concat_ws(' ', slice(_toks, i+1, {n}))))"
                )
            ).alias("gram"),
        )
        .filter(F.length("gram") > 0)
    )
    sizes = grams.groupBy("id").agg(F.count("*").alias("sz"))
    inter = (
        grams.alias("a")
        .join(grams.alias("b"), on="gram")
        .filter(F.col("a.id") < F.col("b.id"))
        .groupBy(F.col("a.id").alias("id_a"), F.col("b.id").alias("id_b"))
        .agg(F.count("*").alias("inter"))
    )
    return (
        inter.join(sizes.select(F.col("id").alias("id_a"), F.col("sz").alias("sz_a")), "id_a")
        .join(sizes.select(F.col("id").alias("id_b"), F.col("sz").alias("sz_b")), "id_b")
        .withColumn(
            "jaccard",
            F.col("inter") / (F.col("sz_a") + F.col("sz_b") - F.col("inter")),
        )
        .filter(F.col("jaccard") >= threshold)
        .select("id_a", "id_b", "jaccard")
    )
