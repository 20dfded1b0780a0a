"""Bucketed-table layout — the co-located-join scale path.

A fact⋈fact join (orders⋈lineitem at 100 TB) shuffles BOTH sides on the key
every query. Writing the tables bucketed (and sorted) by that key once makes
every subsequent equi-join/aggregation on it shuffle-free: Spark matches
bucket files pairwise and sort-merges in place. This is the batch analog of
the reference keeping per-entity feature rows keyed in its online store.

Bucket count is a layout-time decision: pick ``buckets`` so one bucket of the
LARGER table is a few hundred MB (e.g. 100 TB / 4096 buckets ≈ 25 GB — too
big; 65536 ≈ 1.5 GB; compose with date partitioning to divide further).
"""

from __future__ import annotations

from pyspark.sql import DataFrame


def write_bucketed(
    df: DataFrame,
    table: str,
    key: str | list[str],
    buckets: int = 32,
    sort: bool = True,
    mode: str = "overwrite",
    path: str | None = None,
) -> None:
    """Persist ``df`` as a bucketed (+sorted) catalog table on ``key``.

    Joins/groupBys between tables bucketed the same way on the same key
    compile with no Exchange on either side (asserted in
    tests/test_scale_paths.py::test_bucketed_join_is_shuffle_free and
    tests/test_plans.py::test_bucketed_tables_join_without_shuffle).
    Bucket metadata lives in the session catalog (a path-only parquet write
    can't carry it); pass ``path`` to make the table EXTERNAL so the files
    outlive any metastore.
    """
    keys = [key] if isinstance(key, str) else list(key)
    w = df.write.bucketBy(buckets, *keys)
    if sort:
        w = w.sortBy(*keys)
    if path:
        w = w.option("path", path)
    w.mode(mode).saveAsTable(table)
