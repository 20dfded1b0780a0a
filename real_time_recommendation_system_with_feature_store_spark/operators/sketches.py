"""Fixed-size probabilistic sketches — count-min and Bloom — as pure
DataFrame aggregations.

Both sketches exist for the 100 TB case where exact per-key state does not
fit: a count-min sketch bounds frequency-estimation state to ``depth*width``
cells regardless of key cardinality, and a Bloom filter compresses a
membership set into ``n_bits`` bits that broadcast to every executor, letting
a join prune its big probe side BEFORE the shuffle (the classic
runtime-filter pattern Spark itself applies via
``spark.sql.optimizer.runtime.bloomFilter.enabled`` — reproduced here
deterministically so the DuckDB oracle can replay every bit).

Determinism contract: all hashing is md5-of-key (portable, partition-order
independent, ANSI-SQL-expressible), never ``hash()``/``xxhash64`` whose seeds
and algorithms differ across engines.

Reference parity: the reference keeps exact per-key counters in Redis hashes
(src/feature_store/redis_store.py — unbounded memory growth at corpus
scale); these sketches are the bounded-state replacement the brief's
training-data tier calls for.
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def _bucket(key: Column, salt: str, width: int) -> Column:
    """md5-derived bucket in [0, width) — `('0x'||substring(md5(..),1,8))
    ::UBIGINT % width` in the DuckDB oracle."""
    h = F.conv(F.substring(F.md5(F.concat_ws("\x1f", F.lit(salt), key)), 1, 8), 16, 10)
    return (h.cast("long") % width).cast("int")


def cms_build(
    df: DataFrame,
    key: Column,
    depth: int = 4,
    width: int = 256,
    salt: str = "cm",
    weight: Column | None = None,
) -> DataFrame:
    """Count-min sketch of ``key`` frequencies: ``depth*width`` cells
    ``(row, bucket, cell_count)``.

    One scan, no per-key state: each input row contributes to ``depth``
    cells via posexplode, and the groupBy partial-aggregates map-side down
    to at most ``depth*width`` cells per partition before the (tiny)
    shuffle. Sketches over disjoint data merge by unioning cell frames and
    re-summing (``cms_merge``) — the mergeability is the point at 100 TB:
    build per-day sketches, merge into a corpus sketch without rescanning.
    """
    w = weight if weight is not None else F.lit(1).cast("long")
    cells = df.select(
        F.posexplode(
            F.array(*[_bucket(key, f"{salt}{d}", width) for d in range(depth)])
        ).alias("row", "bucket"),
        w.alias("__w"),
    )
    return cells.groupBy("row", "bucket").agg(F.sum("__w").alias("cell_count"))


def cms_merge(*sketches: DataFrame) -> DataFrame:
    """Merge count-min sketches built with identical (depth, width, salt)."""
    out = sketches[0]
    for s in sketches[1:]:
        out = out.unionByName(s)
    return out.groupBy("row", "bucket").agg(F.sum("cell_count").alias("cell_count"))


def cms_estimate(
    keys: DataFrame,
    sketch: DataFrame,
    key: Column,
    depth: int = 4,
    width: int = 256,
    salt: str = "cm",
    out_col: str = "est_count",
) -> DataFrame:
    """Point-estimate each key's frequency: min over the key's ``depth``
    cells (the count-min guarantee: estimate >= truth, overshoot bounded by
    collisions). One broadcast hash join per sketch row — the sketch side
    is at most ``depth*width`` rows and the probe side never shuffles (no
    explode, no re-grouping)."""
    out = keys
    cell_cols = []
    for d in range(depth):
        row_cells = sketch.where(F.col("row") == d).select(
            F.col("bucket").alias(f"__b{d}"), F.col("cell_count").alias(f"__c{d}")
        )
        out = out.withColumn(f"__p{d}", _bucket(key, f"{salt}{d}", width)).join(
            F.broadcast(row_cells), F.col(f"__p{d}") == F.col(f"__b{d}"), "left"
        )
        cell_cols.append(F.coalesce(F.col(f"__c{d}"), F.lit(0)))
    out = out.withColumn(out_col, F.least(*cell_cols))
    drop = [c for d in range(depth) for c in (f"__p{d}", f"__b{d}", f"__c{d}")]
    return out.drop(*drop)


def bloom_build(
    members: DataFrame,
    key: Column,
    n_bits: int = 1024,
    n_hashes: int = 3,
    salt: str = "bf",
) -> DataFrame:
    """Bloom filter of a key set, represented as the frame of SET bit
    positions (≤ ``n_bits`` rows — broadcastable by construction). Distinct
    positions partial-aggregate map-side, so the build is one cheap scan of
    the (small) member side."""
    bits = members.select(
        F.explode(
            F.array(*[_bucket(key, f"{salt}{h}", n_bits) for h in range(n_hashes)])
        ).alias("bit")
    )
    return bits.distinct()


def bloom_might_contain(
    probe: DataFrame,
    bloom_bits: DataFrame,
    key: Column,
    n_bits: int = 1024,
    n_hashes: int = 3,
    salt: str = "bf",
    out_col: str = "bloom_pass",
) -> DataFrame:
    """Add a boolean: all ``n_hashes`` of the key's bit positions are set.

    The bit frame collapses to ONE row (a sorted ``array<int>`` of set
    positions, ≤ ``n_bits`` elements) that broadcast-nested-loop-joins onto
    the probe — the probe side never shuffles and never re-partitions. This
    is the pre-shuffle prune that makes a 100 TB semi-join cheap when the
    member set is small: rows failing the bloom die at the scan, and only
    the (few, deterministic) false positives pay the exact join."""
    bitset = bloom_bits.agg(F.array_sort(F.collect_set("bit")).alias("__bits"))
    out = probe.join(F.broadcast(bitset))
    passed = F.lit(True)
    for h in range(n_hashes):
        passed = passed & F.array_contains(F.col("__bits"), _bucket(key, f"{salt}{h}", n_bits))
    return out.withColumn(out_col, passed).drop("__bits")
