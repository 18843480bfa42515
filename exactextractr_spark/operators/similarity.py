"""Embedding similarity search: brute-force cosine top-k + LSH and IVF ANN.

Training-data-pipeline operators over an ``array<float>`` embedding column.
Brute force is the exactness baseline (JVM-side ``aggregate``/``zip_with``
arithmetic — no Python in the hot path); the scale paths bound the join
fan-out either by deterministic random-hyperplane sign buckets (LSH) or by
a trained coarse quantizer (IVF: k-means centroids, items partitioned by
nearest centroid, queries probe their ``nprobe`` nearest lists).
"""

from __future__ import annotations

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T
from pyspark.sql.window import Window


def _scalar_cos_fold(x, y) -> "float | None":
    """One-row reference implementation of the shared left-fold cosine:
    float64 accumulation in index order (the DuckDB oracle's list_reduce
    order). Returns None for a zero denominator — Spark's non-ANSI
    ``x / 0.0`` is NULL, and the replaced JVM expression divided by the
    norm product — and propagates NaN for NaN inputs (divisor not zero)."""
    import math

    xa = np.asarray(x, dtype=np.float64)
    ya = np.asarray(y, dtype=np.float64)
    dot = na = nb = 0.0
    for d in range(xa.shape[0]):
        dot += float(xa[d]) * float(ya[d])
        na += float(xa[d]) * float(xa[d])
        nb += float(ya[d]) * float(ya[d])
    den = math.sqrt(na) * math.sqrt(nb)
    if den == 0.0:
        return None
    return dot / den


def _with_cos(df: DataFrame, vec_a: str, vec_b: str, keep: "list[str]"):
    """Score ``cos_sim`` for every row via ``mapInArrow`` over the flat
    Arrow list buffers — no per-row ndarray objects are ever built (the
    pandas-UDF path allocates one small ndarray per row just to hand the
    batch over; the flat read measured ~30% faster on a 200k-pair
    candidate table, bit-identical output). Semantics match the replaced
    JVM ``_dot / (_norm * _norm)`` expression on EVERY path: a zero norm
    product is NULL (Spark's non-ANSI x / 0.0), NaN inputs propagate NaN,
    and null/ragged vector rows (which poison the JVM fold) are NULL —
    the per-row fallback runs only for batches containing such rows, so
    the result never depends on batch composition. Returns
    ``df[keep] + cos_sim``."""
    import pyarrow as pa

    out_schema = T.StructType(
        [df.schema[c] for c in keep]
        + [T.StructField("cos_sim", T.DoubleType())]
    )
    names = list(keep)

    def fn(batches):
        for b in batches:
            n = b.num_rows
            if n == 0:
                continue
            ia = b.schema.get_field_index(vec_a)
            ib = b.schema.get_field_index(vec_b)
            ca, cb = b.column(ia), b.column(ib)
            flat_ok = ca.null_count == 0 and cb.null_count == 0
            if flat_ok:
                la = ca.value_lengths().to_numpy(zero_copy_only=False)
                lb = cb.value_lengths().to_numpy(zero_copy_only=False)
                flat_ok = bool(
                    len(la)
                    and (la == la[0]).all()
                    and (lb == la[0]).all()
                    and la[0] > 0
                )
            if flat_ok:
                A = np.asarray(ca.flatten(), dtype=np.float64).reshape(n, -1)
                B = np.asarray(cb.flatten(), dtype=np.float64).reshape(n, -1)
                dot = np.zeros(n)
                na = np.zeros(n)
                nb = np.zeros(n)
                for d in range(A.shape[1]):
                    x = A[:, d]
                    y = B[:, d]
                    dot += x * y
                    na += x * x
                    nb += y * y
                den = np.sqrt(na) * np.sqrt(nb)
                with np.errstate(invalid="ignore", divide="ignore"):
                    vals = dot / den
                cos = pa.array(
                    vals, type=pa.float64(), mask=(den == 0.0)
                )
            else:
                rows = [
                    None
                    if x is None or y is None or len(x) != len(y)
                    else _scalar_cos_fold(x, y)
                    for x, y in zip(ca.to_pylist(), cb.to_pylist())
                ]
                cos = pa.array(rows, type=pa.float64(), from_pandas=False)
            cols = [b.column(b.schema.get_field_index(c)) for c in names]
            yield pa.RecordBatch.from_arrays(
                cols + [cos], names=names + ["cos_sim"]
            )

    return df.select(*keep, vec_a, vec_b).mapInArrow(fn, out_schema)


def score_against_queries(
    items: DataFrame,
    queries: DataFrame,
    *,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    qid_col: str = "qid",
) -> DataFrame:
    """(qid, item_id, cos_sim) for every item × query pair: broadcast the
    (small) query set, score with the shared Arrow left-fold cosine
    (bit-identical to the ``_dot``/``_norm`` JVM fold it replaces). ONE
    definition shared by batch ``cosine_topk`` and
    ``streaming.stream_cosine_topk`` so the two surfaces can never
    silently diverge."""
    from .dedup import _spread

    q = queries.select(
        F.col(qid_col).alias("qid"), F.col(vec_col).alias("_qvec")
    )
    # the scoring stage must not inherit a single-file scan's 1-partition
    # layout (no-op on streams and on already-parallel inputs)
    items = _spread(items)
    joined = items.join(F.broadcast(q)).select(
        "qid", F.col(id_col).alias("item_id"), vec_col, "_qvec"
    )
    return _with_cos(joined, vec_col, "_qvec", ["qid", "item_id"])


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
    scored = score_against_queries(
        items, queries, id_col=id_col, vec_col=vec_col, qid_col=qid_col
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


_FNV_OFF = 0xCBF29CE484222325
_FNV_PRIME = 0x100000001B3
_M64 = 1 << 64


def _fnv1a64(data: bytes) -> int:
    h = _FNV_OFF
    for c in data:
        h = ((h ^ c) * _FNV_PRIME) % _M64
    return h


def fnv_rademacher_planes(dim: int, bits: int, seed: int = 42) -> np.ndarray:
    """Rademacher (±1) hyperplanes whose entries derive from FNV-1a of the
    ASCII string ``hp{seed}:{b}:{d}`` — sign random projections (Charikar
    SimHash) with a hash family an independent SQL oracle can re-derive
    bit-exactly (DuckDB mirrors the byte fold; see __spark_entry__). ±1
    entries are a standard LSH choice (Achlioptas-style sparse/sign
    projections preserve the cosine collision probability)."""
    P = np.empty((bits, dim), dtype=np.float64)
    for b in range(bits):
        for d in range(dim):
            h = _fnv1a64(f"hp{seed}:{b}:{d}".encode("ascii"))
            P[b, d] = 1.0 if (h & 1) else -1.0
    return P


def band_key_udf(
    dim: int, bits: int, bands: int, seed: int = 42, family: str = "gaussian"
):
    """Factory for the vectorized LSH band-key pandas UDF (shared by
    ``lsh_cosine_topk`` and ``dedup.embedding_dedup``): one batch matmul
    against the hyperplanes, bit-packed per band — zero per-row Python.
    ``family``: 'gaussian' (default) or 'rademacher_fnv' (SQL-verifiable
    hash-derived ±1 planes)."""
    if family == "rademacher_fnv":
        planes = fnv_rademacher_planes(dim, bits, seed)
    elif family == "gaussian":
        planes = hyperplane_signature(dim, bits, seed)
    else:
        raise ValueError(f"unknown hyperplane family: {family!r}")
    per_band = bits // bands
    _pw = (1 << np.arange(per_band - 1, -1, -1)).astype(np.int64)
    _offs = np.arange(bands, dtype=np.int64) * (1 << per_band)

    @F.pandas_udf(T.ArrayType(T.LongType()))
    def band_keys(vecs: pd.Series) -> pd.Series:
        if len(vecs) == 0:
            return pd.Series([], dtype=object)
        M = np.vstack(vecs.to_numpy()).astype(np.float64)      # (N, dim)
        signs = (M @ planes.T) > 0                             # (N, bits)
        keys = (
            signs[:, : bands * per_band]
            .reshape(len(vecs), bands, per_band)
            .astype(np.int64)
            @ _pw
        ) + _offs                                              # (N, bands)
        return pd.Series(list(keys))

    return band_keys


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
    family: str = "gaussian",
) -> DataFrame:
    """ANN variant: sign-bucket both sides on ``bands`` independent
    hyperplane bands, equi-join on (band, bucket) — the 100-TB path where a
    broadcast of queries or a full cross product is impossible — then exact
    re-rank within candidates. Recall < 1 by construction; increase bands
    for higher recall."""
    from .dedup import _spread

    band_keys = band_key_udf(dim, bits, bands, seed, family=family)

    it = _spread(items).withColumn("bkey", F.explode(band_keys(F.col(vec_col))))
    qq = queries.select(
        F.col(qid_col).alias("qid"), F.col(vec_col).alias("_qvec")
    ).withColumn("bkey", F.explode(band_keys(F.col("_qvec"))))
    cand = _with_cos(
        it.join(qq, on="bkey").select(
            "qid", F.col(id_col).alias("item_id"), vec_col, "_qvec"
        ),
        vec_col, "_qvec", ["qid", "item_id"],
    ).dropDuplicates(["qid", "item_id"])
    w = Window.partitionBy("qid").orderBy(F.desc("cos_sim"), F.asc("item_id"))
    return (
        cand.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select("qid", "item_id", "cos_sim", "rank")
    )


def train_ivf_centroids(
    items: DataFrame,
    n_centroids: int,
    *,
    vec_col: str = "embedding",
    id_col: str = "vec_id",
    sample: int = 10_000,
    iters: int = 10,
    seed: int = 42,
    init: str = "random",
) -> np.ndarray:
    """Coarse quantizer for IVF: spherical k-means on a driver-side sample
    (the standard FAISS recipe — training is tiny relative to the corpus;
    at 100 TB you sample ~10^5 vectors, not the table). Deterministic:
    the sample is the ``sample`` LOWEST ids (orderBy+limit compiles to a
    distributed TakeOrdered, no full sort), not a bare limit() whose rows
    depend on partition layout.

    ``init='first'`` seeds centroids from the ``n_centroids`` lowest-id
    vectors instead of a seeded random draw; with ``iters=0`` that makes the
    whole quantizer SQL-expressible (ORDER BY id LIMIT k), which is how the
    driver's DuckDB oracle verifies the IVF plumbing bit-exactly while the
    k-means-refined mode remains the recall/quality path."""
    # Arrow collect: orders of magnitude cheaper than row-by-row collect()
    # for a 10^4 x dim float sample; the orderBy+limit stays a distributed
    # TakeOrdered and the sorted driver-side order is preserved
    pdf = items.orderBy(id_col).limit(sample).select(vec_col).toPandas()
    X = np.vstack(pdf[vec_col].to_numpy()).astype(np.float64)
    X /= np.maximum(np.linalg.norm(X, axis=1, keepdims=True), 1e-12)
    if init == "first":
        C = X[: min(n_centroids, len(X))].copy()
    elif init == "random":
        rng = np.random.default_rng(seed)
        C = X[rng.choice(len(X), size=min(n_centroids, len(X)), replace=False)].copy()
    else:
        raise ValueError(f"unknown centroid init: {init!r}")
    for _ in range(iters):
        assign = np.argmax(X @ C.T, axis=1)
        for c in range(C.shape[0]):
            members = X[assign == c]
            if len(members):
                m = members.sum(axis=0)
                C[c] = m / max(np.linalg.norm(m), 1e-12)
    return C


def ivf_cosine_topk(
    items: DataFrame,
    queries: DataFrame,
    k: int,
    *,
    n_centroids: int = 16,
    nprobe: int = 4,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    qid_col: str = "qid",
    centroids: "np.ndarray | None" = None,
    seed: int = 42,
    train_iters: int = 10,
    init: str = "random",
) -> DataFrame:
    """IVF ANN: items partitioned into inverted lists by nearest centroid
    (one shuffle key per item); each query probes its ``nprobe`` nearest
    lists; exact cosine re-rank within the probed lists. The candidate join
    is an equi-join on the list id — fan-out is |items|·nprobe/n_centroids
    per query, independent of corpus size per partition. Recall grows with
    nprobe (nprobe == n_centroids degrades to exact brute force)."""
    if centroids is None:
        centroids = train_ivf_centroids(
            items, n_centroids, vec_col=vec_col, id_col=id_col, seed=seed,
            iters=train_iters, init=init,
        )
    C = np.asarray(centroids, dtype=np.float64)
    nprobe = min(nprobe, C.shape[0])

    def _batch_sims(vecs: pd.Series) -> np.ndarray:
        # normalize the whole Arrow batch and matmul against C.T once;
        # zero-norm rows are left unnormalized (cos undefined, sims all 0)
        M = np.vstack(vecs.to_numpy()).astype(np.float64)      # (N, dim)
        n = np.linalg.norm(M, axis=1)
        M /= np.where(n == 0.0, 1.0, n)[:, None]
        return M @ C.T                                         # (N, K)

    @F.pandas_udf(T.IntegerType())
    def nearest_list(vecs: pd.Series) -> pd.Series:
        if len(vecs) == 0:
            return pd.Series([], dtype=np.int32)
        return pd.Series(np.argmax(_batch_sims(vecs), axis=1).astype(np.int32))

    @F.pandas_udf(T.ArrayType(T.IntegerType()))
    def probe_lists(vecs: pd.Series) -> pd.Series:
        if len(vecs) == 0:
            return pd.Series([], dtype=object)
        order = np.argsort(-_batch_sims(vecs), axis=1, kind="stable")
        return pd.Series(list(order[:, :nprobe].astype(np.int32)))

    from .dedup import _spread

    it = _spread(items).withColumn("_list", nearest_list(F.col(vec_col)))
    qq = queries.select(
        F.col(qid_col).alias("qid"), F.col(vec_col).alias("_qvec")
    ).withColumn("_list", F.explode(probe_lists(F.col("_qvec"))))
    cand = _with_cos(
        it.join(qq, on="_list").select(
            "qid", F.col(id_col).alias("item_id"), vec_col, "_qvec"
        ),
        vec_col, "_qvec", ["qid", "item_id"],
    )
    w = Window.partitionBy("qid").orderBy(F.desc("cos_sim"), F.asc("item_id"))
    return (
        cand.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select("qid", "item_id", "cos_sim", "rank")
    )
