"""Structured Streaming similarity search: continuously-arriving item
embeddings → per-query running cosine top-k.

The reference engine has no streaming surface; this is the Spark-native
extension for a growing embedding corpus (e.g. fresh documents embedded as
they land): the answer after N items is identical to batch ``cosine_topk``
over those N items, maintained incrementally instead of re-scanning.

Plan shape (the 100-TB argument):

- Scoring is a STATELESS stream-static broadcast join: each arriving item
  row is scored against the (small, static) query set with the same
  JVM-side ``aggregate``/``zip_with`` expressions as batch ``cosine_topk``
  — no Python and no shuffle in the scoring path, so it scales with the
  ingest rate exactly like the batch operator scales with the table.
- The only stateful step is the custom ``applyInPandasWithState`` operator
  keyed by query id: state per query is k ids + k scores (a few hundred
  bytes), merged with each micro-batch's candidates by a numpy
  merge-and-truncate. State is O(|queries| × k) TOTAL — independent of
  how many items ever streamed past, the minimum for a running top-k.
- Each trigger emits the query's refreshed top-k snapshot tagged with
  ``n_seen`` (items merged so far), so a consumer — and the parity test —
  selects the latest snapshot per query as ``n_seen = max(n_seen)``.
"""

from __future__ import annotations

from typing import Any, Iterator, Tuple

import pandas as pd
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout

from ..operators.similarity import score_against_queries

_OUT_SCHEMA = (
    "qid long, item_id long, cos_sim double, rank int, n_seen long"
)
_STATE_SCHEMA = "ids array<long>, scores array<double>, n_seen long"


def _topk_merge_fn(k: int):
    """State-merge function: fold each micro-batch's candidate rows into
    the per-query (ids, scores) top-k arrays; ties break on lowest id
    (matching batch cosine_topk's window order)."""

    def fn(
        key: Tuple[Any, ...],
        pdfs: Iterator[pd.DataFrame],
        state: GroupState,
    ) -> Iterator[pd.DataFrame]:
        import numpy as np

        if state.exists:
            ids, scores, n_seen = state.get
            ids = list(ids)
            scores = list(scores)
        else:
            ids, scores, n_seen = [], [], 0
        for pdf in pdfs:
            ids.extend(int(x) for x in pdf["item_id"])
            scores.extend(float(x) for x in pdf["cos_sim"])
            n_seen += len(pdf)
        order = sorted(
            range(len(ids)), key=lambda i: (-scores[i], ids[i])
        )[:k]
        ids = [ids[i] for i in order]
        scores = [scores[i] for i in order]
        state.update((ids, scores, n_seen))
        yield pd.DataFrame(
            {
                "qid": np.full(len(ids), key[0], dtype=np.int64),
                "item_id": np.asarray(ids, dtype=np.int64),
                "cos_sim": np.asarray(scores, dtype=np.float64),
                "rank": np.arange(1, len(ids) + 1, dtype=np.int32),
                "n_seen": np.full(len(ids), n_seen, dtype=np.int64),
            }
        )

    return fn


def stream_cosine_topk(
    spark: SparkSession,
    source_dir: str,
    queries: DataFrame,
    k: int,
    checkpoint_dir: str,
    *,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    qid_col: str = "qid",
    query_name: str = "topk_stream",
    max_files_per_trigger: int = 16,
    available_now: bool = True,
):
    """Start (or run-to-completion with availableNow) the streaming top-k.

    Results land in the in-memory table ``query_name`` (update mode): each
    trigger appends the refreshed per-query snapshots; the latest snapshot
    for a query is its rows with the maximum ``n_seen``. Returns the
    StreamingQuery.
    """
    schema = spark.read.parquet(source_dir).schema
    items = (
        spark.readStream.schema(schema)
        .option("maxFilesPerTrigger", max_files_per_trigger)
        .parquet(source_dir)
    )
    # ids cast to long up front (the state schema is typed), then the
    # SHARED batch scoring plan — broadcast join + JVM fold cosine
    scored = score_against_queries(
        items.withColumn(id_col, F.col(id_col).cast("long")),
        queries.withColumn(qid_col, F.col(qid_col).cast("long")),
        id_col=id_col, vec_col=vec_col, qid_col=qid_col,
    )
    snapshots = scored.groupBy("qid").applyInPandasWithState(
        _topk_merge_fn(k),
        outputStructType=_OUT_SCHEMA,
        stateStructType=_STATE_SCHEMA,
        outputMode="update",
        timeoutConf=GroupStateTimeout.NoTimeout,
    )
    writer = (
        snapshots.writeStream.format("memory")
        .queryName(query_name)
        .outputMode("update")
        .option("checkpointLocation", checkpoint_dir)
    )
    if available_now:
        writer = writer.trigger(availableNow=True)
    return writer.start()
