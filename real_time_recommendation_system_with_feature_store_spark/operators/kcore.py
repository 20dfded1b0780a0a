"""Iterative k-core filtering — SURVEY.md §2.4 A12.

Reference (src/data/movielens.py:345-382): repeat {count per user, drop
users < min; count per item, drop items < min} for a fixed number of
iterations. Driver-side loop over lazy DataFrames; each iteration is a
groupBy-count + broadcast-able semi join.

Three physical strategies, measured at sf0.1:

* **row-loop** (``strategy="broadcast_loop"``): persist the facts once,
  iterate directly — each round shuffles only the degree aggregate and
  broadcast-semi-joins the survivors back map-side, so the fact table is
  never shuffled. The 100 TB path: per-round cost is a map-side partial
  count + a dim-sized broadcast. Downside: every round's broadcast build
  is its own driver-scheduled job (plus a lineage checkpoint), which is
  pure overhead on small inputs (5.4s warm at sf0.1).
* **window-chain** (``strategy="window_chain"``): express each degree
  filter as ``count(*) over (partition by key)`` and chain all rounds
  into ONE lazy plan / one job — no broadcasts, no checkpoints, no
  driver barriers (2.5s warm at sf0.1). Downside: each round shuffles
  the FULL fact rows (2×iterations fact shuffles), which is exactly
  wrong at 100 TB.
* **pair-loop** (``via_pairs=True``): pre-aggregate facts to (user,item)
  pair counts in ONE shuffle, run every iteration over that aggregate
  (degree = SUM of pair counts — identical fixpoint), then semi-join the
  facts once at the end. The win at 100 TB when interactions repeat per
  pair (|pairs| << |rows|) — iteration state is |pairs|-sized and the
  fact table never re-enters the loop.

``strategy="auto"`` (default) cost-gates on Catalyst's size estimate of
the input plan: below ``small_input_bytes`` (default 4 GiB — a couple of
shuffled copies fit comfortably in local executor memory) the single-job
window-chain wins on scheduling overhead; above it the broadcast loop's
no-fact-shuffle property dominates.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def _plan_size_bytes(df: DataFrame) -> int:
    """Catalyst's optimized-plan size estimate (no job; file-source stats)."""
    try:
        return int(df._jdf.queryExecution().optimizedPlan().stats().sizeInBytes())
    except Exception:  # pragma: no cover - estimation is best-effort
        return 1 << 62


def kcore_filter(
    df: DataFrame,
    user_col: str,
    item_col: str,
    min_user: int = 5,
    min_item: int = 5,
    iterations: int = 3,
    via_pairs: bool = False,
    lineage: str = "local_checkpoint",
    strategy: str = "auto",
    small_input_bytes: int = 4 << 30,
) -> DataFrame:
    if strategy not in {"auto", "window_chain", "broadcast_loop"}:
        raise ValueError(
            f"kcore_filter: unknown strategy {strategy!r} "
            "(expected 'auto', 'window_chain' or 'broadcast_loop')"
        )
    if via_pairs:
        return _kcore_via_pairs(df, user_col, item_col, min_user, min_item, iterations)
    if strategy == "auto":
        strategy = (
            "window_chain" if _plan_size_bytes(df) <= small_input_bytes else "broadcast_loop"
        )
    if strategy == "window_chain":
        return _kcore_window_chain(df, user_col, item_col, min_user, min_item, iterations)
    # Materialize the input once: every iteration re-reads it twice (count
    # pass + semi-join probe), and without a cut that means 6 source scans —
    # at 100 TB, 6 full passes of parse/decode.
    #
    # ``lineage`` picks how each level's working set is pinned:
    # * "local_checkpoint" (default): truncate lineage at every level, so the
    #   per-round broadcast-build jobs read checkpointed blocks instead of
    #   replaying the growing join chain (standard practice for iterative
    #   Spark algorithms; measured 1.3s vs 1.7s warm at sf0.1). Blocks are
    #   NOT replicated — on a cluster with executor loss or dynamic
    #   allocation, use "persist" (or set a reliable checkpoint dir and
    #   swap in ``checkpoint()``).
    # * "persist": cached levels keep full lineage (recoverable after
    #   executor loss). Levels stack (≤ ``iterations`` caches of a shrinking
    #   table); callers running many k-cores can spark.catalog.clearCache().
    if lineage == "local_checkpoint":
        cut, out = (lambda d: d.localCheckpoint(eager=False)), df.localCheckpoint(eager=True)
    else:
        cut, out = (lambda d: d.persist()), df.persist()
    # No broadcast hints on the survivor sets: at ~1e9 distinct surviving
    # keys a forced broadcast OOMs the driver. AQE sees the REAL post-filter
    # size at runtime and promotes the semi join to broadcast exactly when it
    # is safe (the shuffle alternative aligns with the key, so the demoted
    # case is the correct plan too).
    for _ in range(iterations):
        user_ok = out.groupBy(user_col).agg(F.count("*").alias("__n")).where(F.col("__n") >= min_user).select(user_col)
        out = out.join(user_ok, user_col, "left_semi")
        item_ok = out.groupBy(item_col).agg(F.count("*").alias("__n")).where(F.col("__n") >= min_item).select(item_col)
        out = cut(out.join(item_ok, item_col, "left_semi"))
    return out


def _kcore_window_chain(
    df: DataFrame,
    user_col: str,
    item_col: str,
    min_user: int,
    min_item: int,
    iterations: int,
) -> DataFrame:
    """All rounds as one lazy plan of per-key count windows (small inputs)."""
    from pyspark.sql import Window

    out = df
    for _ in range(iterations):
        out = (
            out.withColumn("__deg", F.count("*").over(Window.partitionBy(user_col)))
            .where(F.col("__deg") >= min_user)
            .withColumn("__deg", F.count("*").over(Window.partitionBy(item_col)))
            .where(F.col("__deg") >= min_item)
        )
    return out.drop("__deg")


def _kcore_via_pairs(
    df: DataFrame,
    user_col: str,
    item_col: str,
    min_user: int,
    min_item: int,
    iterations: int,
) -> DataFrame:
    pairs = df.groupBy(user_col, item_col).agg(F.count("*").alias("__n")).persist()
    keep = pairs
    for _ in range(iterations):
        user_ok = (
            keep.groupBy(user_col).agg(F.sum("__n").alias("__t"))
            .where(F.col("__t") >= min_user).select(user_col)
        )
        keep = keep.join(user_ok, user_col, "left_semi")
        item_ok = (
            keep.groupBy(item_col).agg(F.sum("__n").alias("__t"))
            .where(F.col("__t") >= min_item).select(item_col)
        )
        # Persist each level: it's referenced by the next round's degree agg,
        # its join build, AND the following level's probe — without the cut,
        # every build replays the whole join chain. No broadcast hints: the
        # survivor sets can be ~|users| — AQE promotes when actually small.
        keep = keep.join(item_ok, item_col, "left_semi").persist()
    # Final probe: facts semi-join the surviving pair set. No broadcast hint —
    # AQE promotes it when the survivor set is small; at scale the shuffle
    # aligns with the pair key.
    return df.join(keep.select(user_col, item_col), [user_col, item_col], "left_semi")
