"""Fixed-size probabilistic sketches — count-min, Bloom, and a mergeable
log-bucket quantile sketch — as pure DataFrame aggregations.

All three exist for the 100 TB case where exact per-key state does not
fit: a count-min sketch bounds frequency-estimation state to ``depth*width``
cells regardless of key cardinality, a Bloom filter compresses a
membership set into ``n_bits`` bits that broadcast to every executor, letting
a join prune its big probe side BEFORE the shuffle (the classic
runtime-filter pattern Spark itself applies via
``spark.sql.optimizer.runtime.bloomFilter.enabled`` — reproduced here
deterministically so the DuckDB oracle can replay every bit), and the
quantile sketch (``qsketch_*``) bounds percentile-estimation state to
O(log(range) * 2^sub_bits) histogram cells with a guaranteed relative
error, replacing a full global sort.

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

from real_time_recommendation_system_with_feature_store_spark.ident import qcol


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

    ``weight`` must be non-negative: a negative weight would silently
    break the count-min ``estimate >= truth`` guarantee (cells could
    undershoot). The contract is ENFORCED in-plan — a negative weight
    fails the build job with a loud error instead of corrupting the
    sketch; NULL weights count 0 (COUNT-over-NULL semantics, same as the
    qsketch weight).
    """
    if weight is not None:
        wl = weight.cast("long")
        w = F.when(
            wl < 0,
            F.raise_error(
                F.concat(
                    F.lit("cms_build: negative weight "),
                    wl.cast("string"),
                    F.lit(" breaks the count-min >=-truth guarantee"),
                )
            ).cast("long"),
        ).otherwise(F.coalesce(wl, F.lit(0).cast("long")))
    else:
        w = F.lit(1).cast("long")
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
    reserved = {
        c for d in range(depth) for c in (f"__p{d}", f"__b{d}", f"__c{d}")
    }
    clash = reserved & set(keys.columns)
    if clash:
        raise ValueError(
            f"cms_estimate: probe columns collide with reserved internal "
            f"names: {sorted(clash)}"
        )
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


# -------------------------------------------------- quantile sketch

_QS_INTERNAL = ("__qs_msb", "__qs_sub", "__qs_cnt", "__qs_n", "__qs_w")


def _qs_guard(df: DataFrame, by: list[str] | None) -> list[str]:
    by = list(by) if by else []
    clash = set(_QS_INTERNAL) & set(df.columns)
    if clash:
        raise ValueError(
            f"qsketch: input columns collide with reserved internal names: "
            f"{sorted(clash)}"
        )
    return by

def qsketch_build(
    df: DataFrame,
    value: Column,
    sub_bits: int = 4,
    scale: int = 100,
    by: list[str] | None = None,
    weight: Column | None = None,
) -> DataFrame:
    """Mergeable log-bucket quantile sketch (DDSketch-family): one scan of
    ``df`` collapses ``value`` into at most ``~log2(max) * 2^sub_bits``
    histogram cells ``(by..., __qs_msb, __qs_sub, __qs_cnt)`` with
    guaranteed relative bucket width ``2^-sub_bits`` (6.25% at the
    default). The groupBy partial-aggregates map-side, so a 100 TB scan
    shuffles only the tiny cell frame; sketches over disjoint data (days,
    partitions) merge by re-summing cells (``qsketch_merge``) — quantiles
    over a year of data without re-sorting or rescanning it, vs. the exact
    global-sort path (``percentile``) whose state is the data itself.

    Determinism contract (what makes the DuckDB oracle hash-match
    bit-for-bit): values quantize to integer units ``n =
    round(value*scale)`` first, and both bucket coordinates are then EXACT
    integer arithmetic — ``floor(log2(n))`` on an exact integer is safe
    (the gap to the nearest boundary is >= 1/(n*ln2), astronomically wider
    than a double ulp, so any <=1-ulp libm disagreement cannot flip the
    floor), and the sub-bucket divides by a power of two (exponent-only,
    exact in IEEE). Requires ``n * 2^sub_bits < 2^53``.

    NULL / non-positive semantics: rows whose quantized value is NULL or
    <= 0 contribute nothing (log buckets are undefined there), mirroring
    COUNT-over-NULL; callers with signed data sketch magnitude + sign
    separately.

    ``weight`` turns the histogram into a WEIGHTED quantile sketch (e.g.
    token-weighted doc-length percentiles, revenue-weighted prices): each
    row contributes ``weight`` instead of 1, and ``qsketch_quantiles``
    then answers "the value below which fraction q of total WEIGHT lies".
    The weight must cast to a non-negative BIGINT — integer weights keep
    the cell sums (and therefore the cumsum and the quantile pick)
    order-independent and oracle-exact; a double weight would leak
    partial-aggregation order into the last ulp. NULL weights count 0.
    Non-negativity is ENFORCED in-plan: a negative weight would silently
    yield non-monotonic cumulative counts and corrupt the quantile pick,
    so the build job fails loudly instead (same contract as cms_build).

    Reference parity: the reference computes distribution stats over fully
    materialized in-memory frames (src/evaluation/metrics.py popularity /
    score aggregations over pandas); this is the bounded-state scale path.
    """
    by = _qs_guard(df, by)
    bycols = [qcol(b) for b in by]
    n = F.round(value * F.lit(scale), 0).cast("long")
    if weight is not None:
        wl = weight.cast("long")
        w = F.when(
            wl < 0,
            F.raise_error(
                F.concat(
                    F.lit("qsketch_build: negative weight "),
                    wl.cast("string"),
                    F.lit(" would corrupt the cumulative quantile pick"),
                )
            ).cast("long"),
        ).otherwise(F.coalesce(wl, F.lit(0).cast("long")))
    else:
        w = F.lit(1).cast("long")
    # the source-side isNotNull is semantically redundant with the derived
    # __qs_n check (n is NULL iff value is) but PUSHABLE — it reaches the
    # parquet scan's PushedFilters and skips null-heavy row groups, where
    # a filter on the derived column cannot
    rows = (
        df.where(value.isNotNull())
        .select(*bycols, n.alias("__qs_n"), w.alias("__qs_w"))
        .where(F.col("__qs_n").isNotNull() & (F.col("__qs_n") > 0))
    )
    msb = (F.floor(F.log2(F.col("__qs_n").cast("double"))) + 1).cast("int")
    rows = rows.withColumn("__qs_msb", msb)
    # den = 2^(msb-1) — double-exact (power of two); (n * 2^sub_bits) / den
    # only shifts the exponent, so floor() sees the exact quotient.
    den = F.pow(F.lit(2.0), (F.col("__qs_msb") - 1).cast("double"))
    sub = (
        F.floor((F.col("__qs_n") * F.lit(1 << sub_bits)) / den).cast("int")
        - F.lit(1 << sub_bits)
    )
    return (
        rows.withColumn("__qs_sub", sub)
        .groupBy(*bycols, F.col("__qs_msb"), F.col("__qs_sub"))
        .agg(F.sum("__qs_w").alias("__qs_cnt"))
    )


def qsketch_merge(*sketches: DataFrame, by: list[str] | None = None) -> DataFrame:
    """Merge quantile sketches built with identical (sub_bits, scale, by)."""
    by = list(by) if by else []
    out = sketches[0]
    for s in sketches[1:]:
        out = out.unionByName(s)
    return out.groupBy(*[qcol(b) for b in by], F.col("__qs_msb"), F.col("__qs_sub")).agg(
        F.sum("__qs_cnt").alias("__qs_cnt")
    )


def qsketch_quantiles(
    sketch: DataFrame,
    qs: list[float],
    sub_bits: int = 4,
    scale: int = 100,
    by: list[str] | None = None,
    out_col: str = "est_value",
) -> DataFrame:
    """Estimate quantiles from a sketch: for each q in ``qs`` (0 < q <= 1),
    the lower bound of the first cell whose cumulative count reaches
    ``ceil(q * total)`` — an underestimate by at most one relative bucket
    width (``2^-sub_bits``). Output: ``(by..., q, out_col)``.

    Pure tiny-frame arithmetic (the sketch is O(log range * 2^sub_bits)
    rows per group): a window cumsum, a literal-exploded q frame (no
    driver-side createDataFrame — bare-session safe), and a min-reduce.
    Every op is IEEE-identical across engines, so the DuckDB oracle
    hash-matches exactly."""
    from pyspark.sql import Window

    by = list(by) if by else []
    bycols = [qcol(b) for b in by]
    part = Window.partitionBy(*bycols) if by else Window.partitionBy()
    w = part.orderBy("__qs_msb", "__qs_sub").rowsBetween(
        Window.unboundedPreceding, Window.currentRow
    )
    den = F.pow(F.lit(2.0), (F.col("__qs_msb") - 1).cast("double"))
    lb = (
        (F.lit(1 << sub_bits) + F.col("__qs_sub")) * den / F.lit(float(1 << sub_bits))
    ) / F.lit(float(scale))
    cells = sketch.select(
        *bycols,
        F.sum("__qs_cnt").over(w).alias("__qs_cum"),
        F.sum("__qs_cnt").over(part.rowsBetween(
            Window.unboundedPreceding, Window.unboundedFollowing
        )).alias("__qs_total"),
        lb.alias("__qs_lb"),
    )
    qexp = F.explode(
        F.array(*[F.lit(float(q)).cast("double") for q in qs])
    ).alias("q")
    qframe = cells.select(*bycols, "__qs_cum", "__qs_total", "__qs_lb", qexp)
    hit = qframe.where(
        F.col("__qs_cum") >= F.ceil(F.col("q") * F.col("__qs_total"))
    )
    return hit.groupBy(*bycols, F.col("q")).agg(F.min("__qs_lb").alias(out_col))


# ------------------------------------------------------------ hyperloglog

_HLL_INTERNAL = ("__hll_h", "__hll_w", "bucket", "max_rho")


def _hll_dims(p: int) -> tuple[int, int]:
    """(m, S): register count and the scaled-sum exponent. The 60-bit
    md5 hash splits into a p-bit bucket and a (60-p)-bit suffix w, so
    rho = clz(w)+1 ranges over [1, 61-p] and S = 61-p scales every
    2^-rho to the integer 2^(S-rho)."""
    if not 4 <= p <= 16:
        raise ValueError(f"hll: p must be in [4, 16], got {p}")
    return 1 << p, 61 - p


def hll_build(
    df: DataFrame,
    key: Column,
    p: int = 8,
    salt: str = "hll",
    by: list[str] | None = None,
) -> DataFrame:
    """HyperLogLog registers for COUNT DISTINCT of ``key``:
    ``(by..., bucket, max_rho)`` — at most ``2^p`` rows per group, however
    many distinct keys the data holds. NULL keys contribute nothing
    (COUNT-DISTINCT-over-NULL semantics).

    One scan: the groupBy max partial-aggregates map-side, so 100 TB of
    keys shuffle at most ``groups * 2^p`` register rows. Registers over
    disjoint data merge by re-maxing (``hll_merge``) — per-day
    cardinalities roll into a corpus cardinality without rescanning, the
    property ``approx_count_distinct`` (whose binary sketch never leaves
    the aggregate) can't give you as a reusable table.

    Determinism contract: the 60-bit hash is md5-derived (portable,
    `('0x'||substring(md5(..),1,15))::UBIGINT` in DuckDB), the bucket is
    ``h % 2^p``, and rho counts leading zeros of the suffix via
    ``61 - p - length(bin(w))`` — exact integer/string ops, replayed
    bit-for-bit by the SQL oracle (parity probed: Spark ``conv``/``bin``
    == DuckDB ``::UBIGINT``/``bin`` on the same md5 text)."""
    m, S = _hll_dims(p)
    by = list(by) if by else []
    clash = set(_HLL_INTERNAL) & set(df.columns)
    if clash:
        raise ValueError(
            f"hll_build: input columns collide with reserved internal "
            f"names: {sorted(clash)}"
        )
    bycols = [qcol(b) for b in by]
    h = F.conv(
        F.substring(F.md5(F.concat_ws("\x1f", F.lit(salt), key)), 1, 15), 16, 10
    ).cast("long")
    rows = df.where(key.isNotNull()).select(*bycols, h.alias("__hll_h"))
    rows = rows.select(
        *bycols,
        (F.col("__hll_h") % m).cast("int").alias("bucket"),
        F.expr(f"__hll_h div {m}").alias("__hll_w"),
    )
    rho = (
        F.when(F.col("__hll_w") == 0, F.lit(S))
        .otherwise(F.lit(S) - F.length(F.bin(F.col("__hll_w"))))
        .cast("int")
    )
    return (
        rows.select(*bycols, F.col("bucket"), rho.alias("__rho"))
        .groupBy(*bycols, F.col("bucket"))
        .agg(F.max("__rho").alias("max_rho"))
    )


def hll_merge(*sketches: DataFrame, by: list[str] | None = None) -> DataFrame:
    """Merge register frames built with identical (p, salt, by)."""
    by = list(by) if by else []
    out = sketches[0]
    for s in sketches[1:]:
        out = out.unionByName(s)
    return out.groupBy(*[qcol(b) for b in by], F.col("bucket")).agg(
        F.max("max_rho").alias("max_rho")
    )


def _hll_alpha(m: int) -> float:
    """Bias-correction constant: the HLL paper's exact per-m values for the
    small register counts (alpha_16/32/64), the asymptotic formula above —
    using the shared formula below m=128 would carry a ~0.5-1% systematic
    bias on top of the sketch error (Flajolet et al. 2007, §4)."""
    if m == 16:
        return 0.673
    if m == 32:
        return 0.697
    if m == 64:
        return 0.709
    return 0.7213 / (1.0 + 1.079 / m)


def hll_estimate(
    sketch: DataFrame,
    p: int = 8,
    by: list[str] | None = None,
    out_col: str = "est_distinct",
) -> DataFrame:
    """Cardinality estimate from a register frame: ``(by..., out_col)``
    (typical error 1.04/sqrt(2^p) — 6.5% at the default p=8).

    The register sum is EXACT integer arithmetic: each 2^-rho scales to
    the bigint ``2^(S-rho)`` (missing registers contribute ``2^S``), so
    the harmonic-mean denominator is order-independent and the raw
    estimate is one double division — bit-identical across engines. The
    standard small-range correction (``m * ln(m/zeros)`` when raw <=
    2.5m) is applied; it is the ONLY libm call, taken exactly when both
    engines' identical raw/zeros values say so. No large-range correction
    is needed: at 60 hash bits, collisions are negligible below ~2^30
    distinct keys per group, far past the p<=16 register regime."""
    m, S = _hll_dims(p)
    by = list(by) if by else []
    bycols = [qcol(b) for b in by]
    # alpha_m * m^2 * 2^S as one shortest-repr double literal, so the SQL
    # oracle can embed the identical constant
    num = _hll_alpha(m) * m * m * float(1 << S)
    # F.shiftleft only takes a literal shift; max_rho is a FIXED internal
    # name, so the expr interpolation is hostile-identifier-safe
    term = F.expr(f"shiftleft(CAST(1 AS BIGINT), {S} - max_rho)")
    # coalesce: a global (by=[]) estimate over an EMPTY register frame
    # still aggregates to one row — null sum would poison it; with 0 the
    # linear-counting branch correctly yields m*ln(m/m) = 0 distinct
    agg = sketch.groupBy(*bycols).agg(
        F.coalesce(F.sum(term), F.lit(0).cast("long")).alias("__hll_occ"),
        F.count("*").alias("__hll_nb"),
    )
    ssum = (
        F.col("__hll_occ")
        + (F.lit(m) - F.col("__hll_nb")) * F.lit(1 << S).cast("long")
    ).cast("double")
    zeros = (F.lit(m) - F.col("__hll_nb")).cast("double")
    raw = F.lit(num) / ssum
    est = F.when(
        (raw <= F.lit(2.5 * m)) & (zeros > 0),
        F.lit(float(m)) * F.log(F.lit(float(m)) / zeros),
    ).otherwise(raw)
    return agg.select(*bycols, est.alias(out_col))


def hll_intersect_estimate(
    sketch_a: DataFrame,
    sketch_b: DataFrame,
    p: int = 8,
    by: list[str] | None = None,
    out_col: str = "est_intersect",
) -> DataFrame:
    """Theta-sketch-style distinct INTERSECTION estimate from two HLL
    register frames built with identical (p, salt, by): inclusion-exclusion
    ``|A∩B| ≈ est(A) + est(B) - est(A∪B)``, where the union estimate comes
    from ``hll_merge`` (register-wise max — exact for the union, the HLL
    mergeability property). Output: ``(by..., est_a, est_b, est_union,
    out_col)``; the intersection is clamped to ``[0, min(est_a, est_b)]``
    — inclusion-exclusion can go slightly negative for near-disjoint
    sets, and estimate error can also push it above either set's own
    estimated cardinality, which a true intersection can never exceed.

    This answers the question the per-group estimates can't — "how many
    distinct keys do two sets SHARE" — without ever co-shuffling the raw
    keys: all three estimates read the already-built bounded register
    frames (≤ groups·2^p rows each), so intersecting a year of per-day
    sketches is register arithmetic, not a rescan. Error compounds across
    the three estimates (each ±1.04/sqrt(2^p) typical), so the relative
    error on a SMALL intersection of two LARGE sets is amplified — the
    standard theta/HLL intersection caveat; certify against an exact twin
    where the answer matters (the catalog pairs this with the exact
    distinct-intersection query).

    Determinism contract: the three estimates are the hll_estimate
    arithmetic (exact-integer register sums, one double division each) and
    the inclusion-exclusion is three IEEE add/subtracts — replayed
    bit-for-bit by the SQL oracle. ``by`` groups join on their keys; a
    group present in only one sketch is dropped (its intersection with
    nothing is undefined, not zero — the caller can re-add absent groups
    with est 0 if that reading is wanted)."""
    by = list(by) if by else []
    est_a = hll_estimate(sketch_a, p=p, by=by, out_col="est_a")
    est_b = hll_estimate(sketch_b, p=p, by=by, out_col="est_b")
    est_u = hll_estimate(
        hll_merge(sketch_a, sketch_b, by=by), p=p, by=by, out_col="est_union"
    )
    if by:
        joined = est_a.join(est_b, by).join(est_u, by)
    else:
        joined = est_a.crossJoin(est_b).crossJoin(est_u)
    inter = F.least(
        F.col("est_a"),
        F.col("est_b"),
        F.greatest(F.lit(0.0), F.col("est_a") + F.col("est_b") - F.col("est_union")),
    )
    return joined.select(
        *[qcol(b) for b in by],
        "est_a",
        "est_b",
        "est_union",
        inter.alias(out_col),
    )
