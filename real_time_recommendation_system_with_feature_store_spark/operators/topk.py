"""Top-k operators (SURVEY.md §2.5 W1/W2, §2.6 O4/O5).

Scale notes (SURVEY.md §7.3 "per-key top-k at 100 TB"):
  * ``global_topn`` compiles to TakeOrderedAndProject — no full sort.
  * ``topk_per_key``'s ``rank <= k`` filter triggers Catalyst's
    WindowGroupLimit rewrite: a PARTIAL group-limit runs map-side before the
    shuffle (each input partition forwards at most k rows per key) and a
    FINAL one after — i.e. the two-phase top-k is built in; shuffle volume
    is ≤ |partitions|·|keys|·k, not |facts|. Asserted in
    tests/test_plans.py::test_topk_uses_window_group_limit. For extreme
    key skew, pre-aggregate first (the CTR ranking already groups by key
    before ranking, so window input is |keys|, not |facts|).
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F


def _ordering(order_by: Sequence[Column | str]) -> list[Column]:
    return [F.col(c) if isinstance(c, str) else c for c in order_by]


def topk_per_key(
    df: DataFrame,
    keys: Sequence[str],
    order_by: Sequence[Column | str],
    k: int,
    rank_col: str = "rank",
) -> DataFrame:
    """W2: per-key top-k by score with deterministic ordering.

    Reference: np.argsort per user (scripts/evaluate_model.py:231,
    src/serving/service.py:223-228). Callers MUST include a unique tiebreak
    column in ``order_by`` for oracle determinism.
    """
    w = Window.partitionBy(*keys).orderBy(*_ordering(order_by))
    return (
        df.withColumn(rank_col, F.row_number().over(w))
        .where(F.col(rank_col) <= k)
    )


def global_topn(df: DataFrame, order_by: Sequence[Column | str], n: int) -> DataFrame:
    """O4: global top-N (reference ranking_models.py:126-127).

    orderBy().limit() => TakeOrderedAndProject: each partition keeps N rows,
    driver merges — no global sort even at 10^12 rows.
    """
    return df.orderBy(*_ordering(order_by)).limit(n)


def global_topn_ranked(
    df: DataFrame,
    order_by: Sequence[Column | str],
    n: int,
    rank_col: str = "rank",
) -> DataFrame:
    """O4+W2: global top-N **with a rank column**, catalog-safe.

    The naive form — ``row_number().over(Window.orderBy(...))`` then
    ``rank <= n`` — funnels the ENTIRE input through one window task (the
    rank.py:1-13 trap; at a 1e9-item catalog that's a one-task sort of 1e9
    rows). Here ``orderBy().limit(n)`` compiles to TakeOrderedAndProject
    (per-partition heap of n rows, driver merge — no global sort), and only
    the ≤ n survivors are then numbered. The survivor window partitions on
    the NON-FOLDABLE spark_partition_id() (constant 0 on the limit's single
    output partition): a foldable ``lit(1)`` key would be pruned by
    Catalyst, resurrecting the bare window — see the same idiom in
    operators/rank.py and operators/sampling.py.

    Identical output to the naive form whenever ``order_by`` is a total
    order (unique tiebreak last): the top-n set and the rank within it are
    both determined by the same ordering.
    """
    cols = _ordering(order_by)
    top = df.orderBy(*cols).limit(n)
    w = Window.partitionBy(F.spark_partition_id()).orderBy(*cols)
    return top.withColumn(rank_col, F.row_number().over(w))


def tail_per_key(
    df: DataFrame,
    keys: Sequence[str],
    ts_order: Sequence[Column | str],
    n: int,
    rank_col: str = "_rn",
) -> DataFrame:
    """W1: last-N rows per key by recency (leave-one-out basis).

    Reference: groupby.tail (src/data/movielens.py:224-231). ``ts_order``
    should be descending with a unique tiebreak.
    """
    w = Window.partitionBy(*keys).orderBy(*_ordering(ts_order))
    return df.withColumn(rank_col, F.row_number().over(w)).where(F.col(rank_col) <= n).drop(rank_col)
