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

Reference parity: the reference's store answers per-entity feature
lookups from in-memory state and ingests rows push-at-a-time
(src/features/simple_feature_store.py:17-50 ``get_online_features``
building a per-entity ``feature_data`` frame, :73-80
``push_streaming_features`` — exact per-key state, unbounded growth at
corpus scale); these sketches are the bounded-state replacement the
brief's training-data tier calls for.

NULL-key semantics (SQL-consistent): builds skip NULL keys (like COUNT /
set membership); probes return NULL ``est_count`` (count-min) and false
``bloom_pass`` (a NULL key never equi-join-matches, so pruning it is exact).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def _bucket(key: Column, salt: str, width: int) -> Column:
    """md5-derived bucket in [0, width) — `('0x'||substring(md5(..),1,8))
    ::UBIGINT % width` in the DuckDB oracle. NULL key -> NULL bucket (the
    concat_ws NULL-drop would otherwise hash every NULL to the salt-only
    digest, a deterministic-but-meaningless bucket)."""
    h = F.conv(F.substring(F.md5(F.concat_ws("\x1f", F.lit(salt), key)), 1, 8), 16, 10)
    return F.when(key.isNull(), F.lit(None).cast("int")).otherwise(
        (h.cast("long") % width).cast("int")
    )


def cms_build(
    df: DataFrame,
    key: Column,
    depth: int = 4,
    width: int = 256,
    salt: str = "cm",
    weight: Column | None = None,
) -> DataFrame:
    """Count-min sketch of ``key`` frequencies: ``depth*width`` cells
    ``(row, bucket, cell_count)``. NULL keys contribute nothing.

    One scan, no per-key state: each input row contributes to ``depth``
    cells via posexplode, and the groupBy partial-aggregates map-side down
    to at most ``depth*width`` cells per partition before the (tiny)
    shuffle. Sketches over disjoint data merge by unioning cell frames and
    re-summing (``cms_merge``) — the mergeability is the point at 100 TB:
    build per-day sketches, merge into a corpus sketch without rescanning.
    """
    w = weight if weight is not None else F.lit(1).cast("long")
    cells = df.where(key.isNotNull()).select(
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
    materialize: bool = True,
) -> DataFrame:
    """Point-estimate each key's frequency: min over the key's ``depth``
    cells (the count-min guarantee: estimate >= truth, overshoot bounded by
    collisions); a key the sketch never saw estimates 0; a NULL key
    estimates NULL. One broadcast hash join per sketch row — the sketch
    side is at most ``depth*width`` rows and the probe side never shuffles
    (no explode, no re-grouping).

    The sketch plan is referenced ``depth`` times (one per-row filter); an
    UNmaterialized ``cms_build`` frame would replay its fact scan per
    reference — ``depth`` full passes of the 100 TB build input. The
    default eagerly localCheckpoints the sketch first (≤ ``depth*width``
    rows — always cheap); pass ``materialize=False`` when the sketch is
    already materialized (checkpointed, cached, or read from storage)."""
    if materialize:
        sketch = sketch.localCheckpoint(eager=True)
    out = keys
    cell_cols = []
    for d in range(depth):
        row_cells = sketch.where(F.col("row") == d).select(
            F.col("bucket").alias(f"__b{d}"), F.col("cell_count").alias(f"__c{d}")
        )
        out = out.withColumn(f"__p{d}", _bucket(key, f"{salt}{d}", width)).join(
            F.broadcast(row_cells), F.col(f"__p{d}") == F.col(f"__b{d}"), "left"
        )
        cell_cols.append(F.coalesce(F.col(f"__c{d}"), F.lit(0).cast("long")))
    est = F.when(key.isNull(), F.lit(None).cast("long")).otherwise(F.least(*cell_cols))
    out = out.withColumn(out_col, est)
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
    positions (≤ ``n_bits`` rows — broadcastable by construction; NULL
    members set nothing). Distinct positions partial-aggregate map-side, so
    the build is one cheap scan of the (small) member side. Filters over
    disjoint member sets merge by union + distinct."""
    bits = members.where(key.isNotNull()).select(
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
    materialize: str = "auto",
) -> DataFrame:
    """Add a boolean: all ``n_hashes`` of the key's bit positions are set;
    false for NULL keys (a NULL key never equi-join-matches, so pruning it
    is exact). Each probe row pays exactly ``n_hashes`` O(1) word lookups +
    bit tests (never an ``array_contains`` scan of the whole bit list).

    ``materialize`` picks how the 64-bit-word bitmap reaches the probe:

    * ``"literal"``: the ≤ ``n_bits/64`` words are collected to the driver
      (one tiny job — bitmap size is bounded by CONFIG, not data; the same
      move Spark's own runtime bloom filter makes with its scalar subquery)
      and inlined as an array literal, so the test is a PURE scalar filter.
      This is what makes the prune survive optimizer join reordering: a
      join-delivered bitmap gets hoisted above downstream semi joins by
      PushDownLeftSemiAntiJoin, re-ordering the probe's Exchange BEFORE the
      bloom — with a literal there is no join to hoist, and the filter
      stays at the scan, below every shuffle (plan-asserted in
      tests/test_plans.py).
    * ``"broadcast"``: fully lazy — the bitmap collapses to one row
      (``map<int,bigint>``) that broadcast-nested-loop-joins onto the
      probe. No driver job, but downstream exact joins may be reordered
      underneath the test (harmless for results, loses the pre-shuffle
      guarantee).
    * ``"auto"`` (default): ``"literal"`` while the bitmap stays literal-
      sized (``n_bits`` ≤ 2^20 → ≤ 16K array elements), else
      ``"broadcast"``.

    This is the pre-shuffle prune that makes a 100 TB semi-join cheap when
    the member set is small: rows failing the bloom die at the scan, and
    only the (few, deterministic) false positives pay the exact join."""
    if materialize not in {"auto", "literal", "broadcast"}:
        raise ValueError(f"bloom_might_contain: unknown materialize {materialize!r}")
    if materialize == "auto":
        materialize = "literal" if n_bits <= (1 << 20) else "broadcast"
    words = bloom_bits.groupBy(
        (F.col("bit") / F.lit(64)).cast("int").alias("__w")
    ).agg(
        F.expr("bit_or(shiftleft(CAST(1 AS BIGINT), CAST(bit % 64 AS INT)))").alias(
            "__word"
        )
    )
    n_words = (n_bits + 63) // 64

    if materialize == "literal":
        dense = [0] * n_words
        for r in words.collect():  # <= n_bits/64 rows by construction
            dense[r["__w"]] = r["__word"]
        arr = F.array(*[F.lit(w).cast("long") for w in dense])
        passed = F.lit(True)
        for h in range(n_hashes):
            pos = _bucket(key, f"{salt}{h}", n_bits)
            word = F.element_at(arr, (pos / F.lit(64)).cast("int") + F.lit(1))
            bit_set = (
                F.call_function("shiftright", word, (pos % 64).cast("int"))
                .bitwiseAND(F.lit(1).cast("long"))
                == 1
            )
            passed = passed & F.coalesce(bit_set, F.lit(False))
        return probe.withColumn(
            out_col, F.when(key.isNull(), F.lit(False)).otherwise(passed)
        )

    reserved = {"__wmap", *(f"__bp{h}" for h in range(n_hashes))}
    clash = reserved & set(probe.columns)
    if clash:
        raise ValueError(
            f"bloom_might_contain: probe columns collide with reserved "
            f"internal names: {sorted(clash)}"
        )
    wmap = words.agg(
        F.map_from_entries(
            F.collect_list(F.struct(F.col("__w"), F.col("__word")))
        ).alias("__wmap")
    )
    out = probe.join(F.broadcast(wmap))
    for h in range(n_hashes):
        out = out.withColumn(f"__bp{h}", _bucket(key, f"{salt}{h}", n_bits))
    passed = F.lit(True)
    for h in range(n_hashes):
        bit_set = F.expr(
            f"coalesce((shiftright(element_at(__wmap, CAST(__bp{h} div 64 AS INT)),"
            f" CAST(__bp{h} % 64 AS INT)) & 1) = 1, false)"
        )
        passed = passed & bit_set
    out = out.withColumn(out_col, passed)
    return out.drop("__wmap", *[f"__bp{h}" for h in range(n_hashes)])
