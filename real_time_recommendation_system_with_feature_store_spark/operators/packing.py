"""Sequence packing for training-data export — LLM-pipeline extra
(BASELINE.json north star; no reference counterpart).

Pretraining pipelines concatenate the document stream and cut it into
fixed-token-budget chunks (documents may span a boundary). Assigning each
document to the chunk holding its FIRST token is a prefix-sum over the
deterministic document order:

    chunk_id = floor(tokens_before_this_doc / budget)

which is one window cumsum — no stateful scan, no driver loop. For sharded
export the same expression runs per shard (partitionBy(shard)), so the
cumsum never becomes a single-partition global bottleneck at 100 TB; the
global variant exists for exact single-stream parity and small corpora
(same two-phase scale note as operators/rank.py::global_row_number).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F


def pack_by_token_budget(
    df: DataFrame,
    token_col: str,
    order_cols: list[Column | str],
    budget: int,
    shard_col: str | None = None,
    chunk_col: str = "chunk_id",
    offset_col: str = "chunk_offset",
) -> DataFrame:
    """Assign each row a (chunk_id, chunk_offset) under a token budget.

    chunk_id   — chunk containing the document's first token
    chunk_offset — the first token's position within that chunk

    ``order_cols`` must be a total order (include a unique key) or the
    assignment is not deterministic. With ``shard_col`` the packing is
    per-shard (chunk ids restart per shard).
    """
    w = (
        Window.partitionBy(shard_col).orderBy(*order_cols)
        if shard_col
        else Window.orderBy(*order_cols)
    )
    before = F.coalesce(
        F.sum(F.col(token_col)).over(w.rowsBetween(Window.unboundedPreceding, -1)),
        F.lit(0),
    )
    return df.withColumn(chunk_col, F.floor(before / F.lit(budget)).cast("long")).withColumn(
        offset_col, (before % F.lit(budget)).cast("long")
    )
