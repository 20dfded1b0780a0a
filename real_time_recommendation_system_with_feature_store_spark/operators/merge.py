"""Changelog MERGE (CDC apply): latest-wins upsert/delete onto a base table.

The reference mutates its online store push-at-a-time
(src/features/simple_feature_store.py:73-80 ``push_streaming_features`` /
:82-89 ``materialize_features``); the batch counterpart a lakehouse
pipeline needs is MERGE INTO semantics — apply a (possibly multi-version)
change stream to a snapshot in ONE set-based pass:

  1. collapse the changelog to the latest change per key (w/ a total
     per-key version order — the caller's sequence column + tie-breaks);
  2. full-outer join base ↔ latest change on the key;
  3. rows only in base survive; 'D' deletes drop; 'U'/'I' take the
     change's values (insert-or-update — true upsert).

Scale posture: one shuffle of each side on the merge key. When the base is
bucketed on the key (sources/bucketing.py::write_bucketed) AND the keys are
non-null by contract (``null_safe_keys=False`` — null-safe ``<=>`` equality
compiles to coalesce/isnull composite keys no bucket layout can satisfy),
the base-side Exchange disappears entirely — the same zero-Exchange
co-location the bucketed-join tests assert (plan-asserted for the merge
itself in tests/test_plans.py). The changelog window shuffles only the
(small) changelog.
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from real_time_recommendation_system_with_feature_store_spark.ident import qcol


def latest_changes(
    changes: DataFrame,
    keys: Sequence[str],
    seq_col: str,
    tie_breaks: Sequence[str] = (),
) -> DataFrame:
    """Keep each key's newest change row by (seq_col, *tie_breaks) desc.

    The ordering must be total per key for determinism — pass tie-break
    columns if the sequence alone can collide (e.g. same-batch writes).
    """
    if "__rn" in changes.columns:
        raise ValueError("latest_changes: input column '__rn' is reserved")
    order = [qcol(seq_col).desc()] + [qcol(c).desc() for c in tie_breaks]
    w = Window.partitionBy(*[qcol(k) for k in keys]).orderBy(*order)
    return (
        changes.withColumn("__rn", F.row_number().over(w))
        .where(F.col("__rn") == 1)
        .drop("__rn")
    )


def merge_changelog(
    base: DataFrame,
    changes: DataFrame,
    keys: Sequence[str],
    op_col: str = "op",
    seq_col: str = "seq",
    tie_breaks: Sequence[str] = (),
    null_safe_keys: bool = True,
) -> DataFrame:
    """Apply a changelog (op in 'U' upsert / 'I' insert / 'D' delete) to
    ``base``; returns the merged snapshot with base's columns.

    'U' and 'I' are both insert-or-update (MERGE WHEN MATCHED UPDATE /
    WHEN NOT MATCHED INSERT); the two codes exist so CDC sources that
    distinguish them round-trip losslessly.

    ``null_safe_keys`` picks the key-equality flavor. The default (True)
    merges NULL keys with NULL keys (``<=>``), but Spark compiles
    null-safe equality to ``(coalesce(k, d), isnull(k))`` composite join
    keys, which a layout bucketed on ``k`` CANNOT satisfy — the planner
    disables the bucket scan and re-shuffles the base. Pass False when
    the merge keys are non-null by contract (the usual primary-key CDC
    shape): plain ``=`` keys let a base bucketed on the keys join with
    ZERO base-side Exchange (plan-asserted in tests/test_plans.py), which
    at 100 TB is the difference between rewriting the snapshot in place
    and re-shuffling it every day-close. With False and NULL keys
    actually present, NULL-keyed base rows pass through unmatched and
    NULL-keyed changes insert — they never pair.

    Both sides are re-aliased to positional internal names (reserved
    ``__rn``/``__op``/``__bk_``/``__bv_``/``__ck_``/``__cv_`` prefixes) so
    arbitrary source column names — dots, spaces, quotes — survive the
    join; inputs already carrying such names would silently corrupt the
    merge, so they are rejected up front.
    """
    reserved = [
        c
        for df in (base, changes)
        for c in df.columns
        if c in ("__rn", "__op")
        or c.startswith(("__bk_", "__bv_", "__ck_", "__cv_"))
    ]
    if reserved:
        raise ValueError(
            f"merge_changelog: input columns collide with reserved internal "
            f"names: {sorted(set(reserved))}"
        )
    value_cols = [c for c in base.columns if c not in keys]
    b = base.select(
        *[qcol(k).alias(f"__bk_{i}") for i, k in enumerate(keys)],
        *[qcol(c).alias(f"__bv_{i}") for i, c in enumerate(value_cols)],
    )
    latest = latest_changes(changes, keys, seq_col, tie_breaks)
    ch = latest.select(
        *[qcol(k).alias(f"__ck_{i}") for i, k in enumerate(keys)],
        qcol(op_col).alias("__op"),
        *[qcol(c).alias(f"__cv_{i}") for i, c in enumerate(value_cols)],
    )
    cond = None
    for i in range(len(keys)):
        if null_safe_keys:
            eq = F.col(f"__bk_{i}").eqNullSafe(F.col(f"__ck_{i}"))
        else:
            eq = F.col(f"__bk_{i}") == F.col(f"__ck_{i}")
        cond = eq if cond is None else (cond & eq)
    joined = b.join(ch, cond, "full_outer")
    keep = F.col("__op").isNull() | (F.col("__op") != "D")
    merged = joined.where(keep).select(
        *[
            F.coalesce(F.col(f"__bk_{i}"), F.col(f"__ck_{i}")).alias(k)
            for i, k in enumerate(keys)
        ],
        *[
            F.when(F.col("__op").isNotNull(), F.col(f"__cv_{i}"))
            .otherwise(F.col(f"__bv_{i}"))
            .alias(c)
            for i, c in enumerate(value_cols)
        ],
    )
    return merged
