"""Physical data layout: small-file compaction and Z-order clustering.

No reference counterpart (the reference writes single files from pandas,
scripts/train_movielens.py:180-182) — these are the table-maintenance
operations a 100 TB lake needs so the scan-side optimizations (partition
pruning, row-group min/max skipping) keep biting as data accretes.
"""

from __future__ import annotations

import math
from collections.abc import Sequence

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def compact_to_target_size(
    df: DataFrame,
    path: str,
    target_bytes: int = 128 * 1024 * 1024,
    order_by: Sequence[str] = (),
    mode: str = "overwrite",
) -> int:
    """Rewrite ``df`` as ~``target_bytes`` parquet files; returns file count.

    Streaming upserts and per-trigger micro-batch writes accrete small files;
    a scan of N tiny files pays N× footer reads and loses row-group skipping.
    File count comes from Catalyst's size estimate (no extra job), and an
    optional ``order_by`` clusters rows so min/max stats stay tight.
    """
    est = 1 << 62
    try:
        est = int(df._jdf.queryExecution().optimizedPlan().stats().sizeInBytes())
    except Exception:
        pass
    n_files = max(1, math.ceil(est / target_bytes))
    if order_by:
        # range-partition into exactly n_files, sorted within each file so
        # min/max stats stay tight — a bare orderBy lets AQE pick its own
        # partition count and ignores the target size entirely
        out = df.repartitionByRange(n_files, *order_by).sortWithinPartitions(*order_by)
    else:
        out = df.repartition(n_files)
    out.write.mode(mode).parquet(path)
    return n_files


def morton_code_n(cols: list[Column], bits: int = 16) -> Column:
    """Interleave the low ``bits`` of N non-negative ints (Z-order key).

    Sorting by the Morton key clusters rows that are close in EVERY
    dimension, so a scan filtering any of the columns prunes row groups by
    min/max stats — single-column sort only helps its own column. Pure
    bit arithmetic (shiftleft/+) — identical in any engine, no UDF. The
    key must fit a signed long: ``len(cols) * bits <= 62``.
    """
    n = len(cols)
    if n < 2:
        raise ValueError("morton_code_n needs at least 2 columns")
    if n * bits > 62:
        raise ValueError(
            f"{n} cols x {bits} bits = {n * bits} key bits > 62 (signed long)"
        )
    vals = [c.cast("long") % F.lit(1 << bits) for c in cols]
    code = F.lit(0).cast("long")
    for i in range(bits):
        for j, v in enumerate(vals):
            code = code + F.shiftleft(F.shiftright(v, i) % 2, n * i + j)
    return code


def morton_code(a: Column, b: Column, bits: int = 16) -> Column:
    """Two-column Z-order key (the common case); see ``morton_code_n``."""
    return morton_code_n([a, b], bits)


def write_zordered(
    df: DataFrame,
    path: str,
    *z_cols: str,
    bits: int = 16,
    mode: str = "overwrite",
    max_records_per_file: int | None = None,
) -> None:
    """Write ``df`` sorted by the Morton interleave of N key columns
    (two is the common case; any count with ``N * bits <= 62`` works —
    e.g. three 16-bit dims or six 10-bit dims).

    ``max_records_per_file`` caps file size so locality shows up as many
    small-range files even when AQE coalesces the sort to few partitions
    (at real scale the range partitioning itself yields the file count).

    Columns are rank-normalized onto the full ``bits`` range first (an
    equal-size bucket assignment == SQL ntile): raw interleaving
    degenerates to a single-column sort when the columns' cardinalities
    differ (the narrow column's high bits are constant zero). The buckets
    derive from ``global_row_number`` (range-partitioned parallel sort +
    broadcast offsets — the same machinery as price_deciles), NOT an
    unpartitioned ntile window, so the write path scales: no one-task sort
    per column. Ties within a key column land in an arbitrary-but-valid
    bucket order (any tie order is an equally good layout key).
    """
    from real_time_recommendation_system_with_feature_store_spark.operators.rank import global_row_number, ntile_from_rank

    if len(z_cols) < 2:
        raise ValueError("write_zordered needs at least 2 key columns")
    n_buckets = 1 << bits
    keyed = df.crossJoin(F.broadcast(df.agg(F.count("*").alias("__n"))))
    tmp_cols = ["__n"]
    bucket_cols = []
    for k, c in enumerate(z_cols):
        rank_col, z_col = f"__r{k}", f"__z{k}"
        keyed = global_row_number(keyed, [F.col(c)], rank_col).withColumn(
            z_col, ntile_from_rank(F.col(rank_col), F.col("__n"), n_buckets)
        )
        tmp_cols += [rank_col, z_col]
        bucket_cols.append(F.col(z_col))
    keyed = keyed.withColumn("__zkey", morton_code_n(bucket_cols, bits))
    w = keyed.orderBy("__zkey").drop("__zkey", *tmp_cols).write.mode(mode)
    if max_records_per_file:
        w = w.option("maxRecordsPerFile", str(max_records_per_file))
    w.parquet(path)
