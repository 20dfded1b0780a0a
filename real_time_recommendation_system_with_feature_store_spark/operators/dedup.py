"""Deduplication suite — LLM-data-pipeline operators (BASELINE.json north star).

Four tiers, cheapest → fuzziest:
  exact_dedup          md5-fingerprint groupBy (one shuffle on the hash)
  ngram_jaccard_pairs  exact set-similarity pairs via shingle inverted index
  minhash_lsh_dedup    MinHash signatures + LSH banding (scale path)
  simhash_dedup        64-bit SimHash near-dup buckets

Everything is pure Column expressions + joins — no row-at-a-time UDFs — so
the shuffle keys are visible to Catalyst/AQE. All hashing is xxhash64/md5
(deterministic across partitionings; no rand()). The one Python touchpoint
is the MinHash permutation fold: higher-order Column functions are
interpreted (not codegen'd), so the O(shingles x num_hashes) min-fold runs
as an Arrow-batched numpy kernel (`kernel="arrow"`, default) with the
Column-expression formulation kept as `kernel="expr"` for comparison.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F

from real_time_recommendation_system_with_feature_store_spark.functions.text import fingerprint, tokens, word_shingles


def exact_dedup(df: DataFrame, text_col: str, id_col: str) -> DataFrame:
    """Exact dedup on normalized-text fingerprint, keeping the lowest id.

    Shuffles once on the 16-byte hash (uniform — no skew); the winner pick is
    a window row_number, which AQE keeps partition-local after the shuffle.
    """
    w = Window.partitionBy("__fp").orderBy(F.col(id_col).asc())
    return (
        df.withColumn("__fp", fingerprint(F.col(text_col)))
        .withColumn("__rn", F.row_number().over(w))
        .where(F.col("__rn") == 1)
        .drop("__fp", "__rn")
    )


def ngram_jaccard_pairs(
    df: DataFrame,
    text_col: str,
    id_col: str,
    n: int = 3,
    threshold: float = 0.8,
) -> DataFrame:
    """Exact n-gram Jaccard-similar pairs via a shingle inverted index.

    Candidate pairs come from co-occurring shingles (inner self-join on the
    shingle — the classic inverted-index plan), then exact Jaccard
    |A∩B| / (|A|+|B|-|A∩B|) filters. Returns (id_a, id_b, jaccard), id_a<id_b.

    Scale: hot shingles blow up the pair count — at 100 TB drop the top-0.1%
    most frequent shingles first (stopword shingles carry no signal), or go
    through minhash_lsh_dedup instead.
    """
    sh = (
        df.select(F.col(id_col), F.array_distinct(word_shingles(F.col(text_col), n)).alias("__sh"))
        .withColumn("__size", F.size("__sh"))
    )
    exploded = sh.select(id_col, "__size", F.explode("__sh").alias("__s"))
    a = exploded.select(
        F.col(id_col).alias("id_a"), F.col("__size").alias("__size_a"), F.col("__s")
    )
    b = exploded.select(
        F.col(id_col).alias("id_b"), F.col("__size").alias("__size_b"), F.col("__s")
    )
    pairs = (
        a.join(b, "__s")
        .where(F.col("id_a") < F.col("id_b"))
        .groupBy("id_a", "id_b", "__size_a", "__size_b")
        .agg(F.count("*").alias("__common"))
        .withColumn(
            "jaccard",
            F.col("__common") / (F.col("__size_a") + F.col("__size_b") - F.col("__common")).cast("double"),
        )
        .where(F.col("jaccard") >= threshold)
        .select("id_a", "id_b", F.round("jaccard", 6).alias("jaccard"))
    )
    return pairs


def _minhash_signature(shingles, num_hashes: int):
    """MinHash signature as ONE fold: hash each shingle string once
    (xxhash64), then for every shingle update all ``num_hashes`` running
    minima with a seeded re-hash of that LONG (zip_with over the accumulator).

    Two wins over the naive per-seed formulation (num_hashes separate
    ``array_min(transform(...))`` arms): the string is hashed once, not
    num_hashes times, and the expression tree is O(1) instead of
    O(num_hashes) — the naive tree's analysis+codegen alone cost ~2s per
    query compile at num_hashes=32."""
    max_long = (1 << 63) - 1
    seeds = F.sequence(F.lit(0), F.lit(num_hashes - 1))
    return F.aggregate(
        F.transform(shingles, lambda s: F.xxhash64(s)),
        F.transform(seeds, lambda i: F.lit(max_long)),
        lambda acc, h: F.zip_with(acc, seeds, lambda m, i: F.least(m, F.xxhash64(i, h))),
    )


def _splitmix64(x: int) -> int:
    """SplitMix64 mix — fixed, portable constants for the permutation family."""
    x = (x + 0x9E3779B97F4A7C15) & 0xFFFFFFFFFFFFFFFF
    x = ((x ^ (x >> 30)) * 0xBF58476D1CE4E5B9) & 0xFFFFFFFFFFFFFFFF
    x = ((x ^ (x >> 27)) * 0x94D049BB133111EB) & 0xFFFFFFFFFFFFFFFF
    return x ^ (x >> 31)


# ---- portable (SQL-reproducible) hashing --------------------------------
#
# xxhash64 is Spark-only, so queries built on it can only get rows-only
# driver checks. ``hash_fn="portable"`` swaps the base hash for the first 60
# bits of md5 (both Spark and DuckDB can compute it: Spark
# conv(substr(md5(s),1,15),16,10), DuckDB ('0x'||substr(md5(s),1,15))::BIGINT)
# and the permutation family for the textbook a*h+b mod p with p=2^31-1 —
# every term stays < 2^62, so the arithmetic is exact in signed 64-bit in
# BOTH engines and under ANSI overflow checking. Production defaults remain
# xxhash64 (one JVM intrinsic vs md5+conv per shingle).

MERSENNE_P = 2147483647  # 2^31 - 1


def portable_hash60(col: Column) -> Column:
    """First 60 bits of md5 as a non-negative long — the cross-engine base
    hash of the portable MinHash/SimHash tier."""
    return F.conv(F.substring(F.md5(col), 1, 15), 16, 10).cast("long")


def minhash_permutation_constants(num_hashes: int) -> tuple[list[int], list[int]]:
    """(a_i, b_i) for the portable permutation family, derived from SplitMix64
    so Spark kernels and generated oracle SQL share literal constants."""
    a = [(_splitmix64(2 * i) % (MERSENNE_P - 1)) + 1 for i in range(num_hashes)]
    b = [_splitmix64(2 * i + 1) % MERSENNE_P for i in range(num_hashes)]
    return a, b


def _minhash_signature_portable(shingles, num_hashes: int):
    """Portable-mode signature: same one-fold shape as ``_minhash_signature``
    with (a_i*h + b_i) mod p permutations over the md5-60 base hash."""
    a, b = minhash_permutation_constants(num_hashes)
    arr_a = F.array(*[F.lit(x) for x in a])
    arr_b = F.array(*[F.lit(x) for x in b])
    seeds = F.sequence(F.lit(0), F.lit(num_hashes - 1))
    return F.aggregate(
        F.transform(shingles, lambda s: portable_hash60(s) % MERSENNE_P),
        F.transform(seeds, lambda i: F.lit(MERSENNE_P).cast("long")),
        lambda acc, h: F.zip_with(
            acc,
            seeds,
            lambda m, i: F.least(
                m, (F.element_at(arr_a, i + 1) * h + F.element_at(arr_b, i + 1)) % MERSENNE_P
            ),
        ),
    )


def _band_rows_arrow(
    sh: DataFrame, id_col: str, num_hashes: int, bands: int, hash_fn: str = "xxhash64"
) -> DataFrame:
    """(id, shingles) -> exploded SLIM (id, band, band_hash) rows via an
    Arrow/numpy kernel.

    The JVM hashes each shingle string ONCE (xxhash64, or md5-60 in
    ``hash_fn="portable"`` mode); the kernel then runs the
    O(shingles x num_hashes) part — min over ``num_hashes`` permutations
    (multiply-shift ``a_i*h + b_i (mod 2^64)``; portable: ``a_i*h + b_i mod
    2^31-1``, the family oracle SQL can reproduce) — as one vectorized
    matrix op per doc, and folds each band's slice into a 64-bit band hash.
    Only the hashed-long array crosses the Arrow boundary (not the shingle
    strings), and the output carries no payload — the downstream candidate
    self-join shuffles ~24-byte rows, never shingle arrays (the 100 TB
    shuffle-cost point; shingles re-attach AFTER pair dedup, see
    minhash_lsh_dedup).
    """
    import numpy as np
    import pandas as pd
    from pyspark.sql import types as T

    id_field = sh.schema[id_col]
    out_schema = T.StructType(
        [
            T.StructField(id_col, id_field.dataType),
            T.StructField("__band", T.IntegerType()),
            T.StructField("__bh", T.LongType()),
        ]
    )
    rows_per_band = num_hashes // bands
    portable = hash_fn == "portable"
    if portable:
        pa_, pb_ = minhash_permutation_constants(num_hashes)
        mult = np.array(pa_, dtype=np.int64)
        add = np.array(pb_, dtype=np.int64)
    else:
        mult = np.array([_splitmix64(2 * i) | 1 for i in range(num_hashes)], dtype=np.uint64)
        add = np.array([_splitmix64(2 * i + 1) for i in range(num_hashes)], dtype=np.uint64)
    gold = np.uint64(0x9E3779B97F4A7C15)
    band_idx = np.arange(bands, dtype=np.int32)

    def gen(batches):
        for pdf in batches:
            ids, bds, bhs = [], [], []
            for doc_id, base in zip(pdf[id_col], pdf["__h"]):
                if portable:
                    # h < p and a_i < p, so a_i*h + b_i < 2^62: exact in int64
                    h = np.asarray(base, dtype=np.int64)
                    sig = ((mult[:, None] * h[None, :] + add[:, None]) % MERSENNE_P).min(
                        axis=1
                    ).astype(np.uint64)
                else:
                    h = np.asarray(base, dtype=np.int64).view(np.uint64)
                    sig = (mult[:, None] * h[None, :] + add[:, None]).min(axis=1)
                sig_by_band = sig.reshape(bands, rows_per_band)
                acc = np.zeros(bands, dtype=np.uint64)
                for j in range(rows_per_band):
                    acc = acc * gold + sig_by_band[:, j]
                ids.extend([doc_id] * bands)
                bds.append(band_idx)
                bhs.append(acc.view(np.int64))
            yield pd.DataFrame(
                {
                    id_col: ids,
                    "__band": np.concatenate(bds) if bds else np.array([], dtype=np.int32),
                    "__bh": np.concatenate(bhs) if bhs else np.array([], dtype=np.int64),
                }
            )

    base_hash = (
        (lambda s: portable_hash60(s) % MERSENNE_P) if portable else (lambda s: F.xxhash64(s))
    )
    hashed = sh.select(id_col, F.transform("__sh", base_hash).alias("__h"))
    return hashed.mapInPandas(gen, out_schema)


def minhash_lsh_dedup(
    df: DataFrame,
    text_col: str,
    id_col: str,
    n: int = 3,
    num_hashes: int = 32,
    bands: int = 8,
    verify_threshold: float | None = 0.8,
    kernel: str = "arrow",
    materialize: bool = True,
    hash_fn: str = "xxhash64",
) -> DataFrame:
    """MinHash + LSH banding near-dup candidate pairs (optionally verified).

    signatures: num_hashes minhashes per doc (deterministic — xxhash64 base
    hash; arrow kernel permutes with fixed multiply-shift constants).
    ``hash_fn="portable"`` swaps in the md5-60 base hash + mod-p permutation
    family that generated DuckDB oracle SQL can reproduce exactly (see the
    portable-hashing block above) — the driver's hash-check gate runs the
    whole MinHash pipeline differentially instead of rows-only.
    banding: ``bands`` bands of r=num_hashes/bands rows; docs sharing any band
    hash become candidates (join key = (band_idx, band_hash) — uniform).
    verify: exact shingle Jaccard >= verify_threshold (None skips — pure LSH).

    ``materialize=True`` (default) persists the shingle/band intermediates
    (the candidate self-join and the verify re-attach each read them twice —
    without the cut the Arrow kernel runs once PER READ, which measures
    slower than the persist even at 1000 docs), eagerly snapshots the
    result, and releases every cache before returning (no persist leaks in
    long-lived drivers). ``materialize=False`` returns one fully lazy plan
    with no persists — used by plan tests that inspect the join shape.

    Returns (id_a, id_b [, jaccard]).
    """
    rows_per_band = num_hashes // bands
    sh = df.select(
        F.col(id_col),
        F.array_distinct(word_shingles(F.col(text_col), n)).alias("__sh"),
    ).where(F.size("__sh") > 0)
    if verify_threshold is not None and materialize:
        # read three times: kernel input + the two post-dedup re-attach joins
        sh = sh.persist()
    if kernel == "arrow":
        # persist: the candidate self-join reads band_rows twice; without the
        # cut both branches re-run the shingle scan + kernel. Slim rows —
        # (id, band, bh) — so the cache and the self-join shuffle stay small.
        band_rows = _band_rows_arrow(sh, id_col, num_hashes, bands, hash_fn)
        if materialize:
            band_rows = band_rows.persist()
    else:
        # Column-expression formulation: correct and dependency-free, but the
        # interpreted fold costs ~num_hashes× the arrow kernel. persist:
        # without it Catalyst inlines the signature fold into the post-explode
        # projection and recomputes it once per band row.
        signature = (
            _minhash_signature_portable if hash_fn == "portable" else _minhash_signature
        )
        sig = sh.withColumn("__sig", signature(F.col("__sh"), num_hashes))
        if materialize:
            sig = sig.persist()
        band_structs = F.transform(
            F.sequence(F.lit(0), F.lit(bands - 1)),
            lambda bi: F.struct(
                bi.cast("int").alias("band"),
                F.md5(
                    F.array_join(
                        F.transform(
                            F.slice(F.col("__sig"), bi * rows_per_band + 1, rows_per_band),
                            lambda v: v.cast("string"),
                        ),
                        ",",
                    )
                ).alias("bh"),
            ),
        )
        band_rows = sig.select(
            id_col, F.explode(band_structs).alias("__b")
        ).select(id_col, F.col("__b.band").alias("__band"), F.col("__b.bh").alias("__bh"))

    # Slim self-join: both sides carry only (id, band, bh) — at 100 TB the
    # (band, bh) shuffle moves ~24-byte rows instead of full shingle arrays
    # duplicated ×bands. Shingles re-attach AFTER the pair set is deduped
    # (pairs << band rows), mirroring lsh_near_dup_pairs (knn.py).
    a = band_rows.select(F.col(id_col).alias("id_a"), "__band", "__bh")
    b = band_rows.select(F.col(id_col).alias("id_b"), "__band", "__bh")
    cand = (
        a.join(b, ["__band", "__bh"])
        .where(F.col("id_a") < F.col("id_b"))
        .select("id_a", "id_b")
        .dropDuplicates(["id_a", "id_b"])
    )
    # One eager snapshot of the (slim) survivor set per call, after which
    # every intermediate cache is released — persisting without a paired
    # unpersist pins partitions in the CacheManager for the session lifetime
    # (one leak per call in a long-lived driver); a localCheckpoint snapshot
    # is GC-managed and freed when the caller drops the result.
    if verify_threshold is None:
        if not materialize:
            return cand
        cand = cand.localCheckpoint(eager=True)
        (band_rows if kernel == "arrow" else sig).unpersist()
        return cand
    out = _verify_exact_jaccard(cand, sh, id_col, verify_threshold)
    if not materialize:
        return out
    out = out.localCheckpoint(eager=True)
    (band_rows if kernel == "arrow" else sig).unpersist()
    sh.unpersist()
    return out


def _verify_exact_jaccard(cand: DataFrame, sh: DataFrame, id_col: str, threshold: float) -> DataFrame:
    """Exact-Jaccard verification of (id_a, id_b) candidates against per-doc
    distinct shingle arrays ``sh(id_col, __sh)`` — the shared tail of
    minhash_lsh_dedup and minhash_dedup_incremental. Rounds to 6 BEFORE the
    threshold (the convention the SQL oracles replay)."""
    sh_a = sh.select(F.col(id_col).alias("id_a"), F.col("__sh").alias("__sh_a"))
    sh_b = sh.select(F.col(id_col).alias("id_b"), F.col("__sh").alias("__sh_b"))
    pairs = cand.join(sh_a, "id_a").join(sh_b, "id_b")
    inter = F.size(F.array_intersect("__sh_a", "__sh_b"))
    union = F.size("__sh_a") + F.size("__sh_b") - inter
    return (
        pairs.withColumn("jaccard", F.round(inter / union.cast("double"), 6))
        .where(F.col("jaccard") >= threshold)
        .select("id_a", "id_b", "jaccard")
    )


def simhash(text, bits: int = 64, hash_fn: str = "xxhash64"):
    """64-bit SimHash of whitespace tokens as a signed long Column.

    Per token: xxhash64 (or md5-60 in portable mode) → for each bit
    position, vote +1/-1; sign of the vote total sets the bit. Pure
    higher-order-function expression.
    """
    toks = tokens(text)
    token_hash = portable_hash60 if hash_fn == "portable" else F.xxhash64
    hashes = F.transform(toks, lambda t: token_hash(t))
    def bit_vote(i: int):
        votes = F.aggregate(
            hashes,
            F.lit(0),
            lambda acc, h: acc + F.when(F.shiftright(h, i).bitwiseAND(F.lit(1)) == 1, F.lit(1)).otherwise(F.lit(-1)),
        )
        return F.when(votes > 0, F.lit(1).cast("long")).otherwise(F.lit(0).cast("long"))
    out = F.lit(0).cast("long")
    for i in range(bits):
        out = out + F.shiftleft(bit_vote(i), i)
    return out


def _simhash_arrow(
    df: DataFrame, text_col: str, id_col: str, bits: int, hash_fn: str = "xxhash64"
) -> DataFrame:
    """(id, text) -> (id, __sim): same SimHash values as ``simhash()`` —
    identical token hashes (computed JVM-side, one per token), bit
    votes vectorized in numpy instead of 64 interpreted aggregate folds."""
    import numpy as np
    import pandas as pd
    from pyspark.sql import types as T

    out_schema = T.StructType(
        [T.StructField(id_col, df.schema[id_col].dataType), T.StructField("__sim", T.LongType())]
    )
    shifts = np.arange(bits, dtype=np.uint64)

    def gen(batches):
        for pdf in batches:
            ids, sims = [], []
            for doc_id, hs in zip(pdf[id_col], pdf["__h"]):
                h = np.asarray(hs, dtype=np.int64).view(np.uint64)
                # empty token array -> all votes -1-free (0 votes) -> sim 0,
                # matching the expression formulation exactly
                ones = ((h[:, None] >> shifts[None, :]) & np.uint64(1)).sum(axis=0)
                votes = 2 * ones.astype(np.int64) - len(h)
                sim = int(((votes > 0).astype(np.uint64) << shifts).sum(dtype=np.uint64))
                ids.append(doc_id)
                sims.append(sim - (1 << 64) if sim >= (1 << 63) else sim)
            yield pd.DataFrame({id_col: ids, "__sim": np.asarray(sims, dtype=np.int64)})

    token_hash = portable_hash60 if hash_fn == "portable" else F.xxhash64
    hashed = df.select(
        F.col(id_col),
        F.transform(tokens(F.col(text_col)), lambda t: token_hash(t)).alias("__h"),
    )
    return hashed.mapInPandas(gen, out_schema)


def simhash_dedup(
    df: DataFrame,
    text_col: str,
    id_col: str,
    bits: int = 64,
    band_bits: int = 16,
    kernel: str = "arrow",
    materialize: bool = True,
    hash_fn: str = "xxhash64",
) -> DataFrame:
    """SimHash near-dup candidates: docs whose simhash shares any of the
    ``bits/band_bits`` bands (Hamming-adjacent docs collide in ≥1 band).

    ``materialize``: same contract as minhash_lsh_dedup — True (default)
    persists the banded signatures (read twice by the self-join; recomputing
    means running the Arrow kernel twice, which measures slower than the
    persist at every size), snapshots the result, and releases the cache;
    False returns the lazy plan for plan inspection.

    ``hash_fn="portable"``: md5-60 token hashes reproducible in DuckDB SQL
    (see the portable-hashing block above) so the driver's differential gate
    can hash-check the full SimHash pipeline.

    Returns (id_a, id_b, hamming) for candidates.
    """
    n_bands = bits // band_bits
    mask = (1 << band_bits) - 1
    if kernel == "arrow":
        sigs = _simhash_arrow(df, text_col, id_col, bits, hash_fn)
    else:
        sigs = df.select(F.col(id_col), simhash(F.col(text_col), bits, hash_fn).alias("__sim"))
    banded = sigs.select(
        id_col,
        "__sim",
        F.explode(
            F.array(
                *[
                    F.struct(
                        F.lit(bi).alias("band"),
                        F.shiftright(F.col("__sim"), bi * band_bits).bitwiseAND(F.lit(mask)).alias("bh"),
                    )
                    for bi in range(n_bands)
                ]
            )
        ).alias("__b"),
    ).select(id_col, "__sim", F.col("__b.band").alias("__band"), F.col("__b.bh").alias("__bh"))
    if materialize:
        # persist: the candidate self-join reads banded twice; without the
        # cut both branches recompute the signatures.
        banded = banded.persist()
    a = banded.select(F.col(id_col).alias("id_a"), F.col("__sim").alias("__sim_a"), "__band", "__bh")
    b = banded.select(F.col(id_col).alias("id_b"), F.col("__sim").alias("__sim_b"), "__band", "__bh")
    hamming = F.bit_count(F.col("__sim_a").bitwiseXOR(F.col("__sim_b")))
    out = (
        a.join(b, ["__band", "__bh"])
        .where(F.col("id_a") < F.col("id_b"))
        .dropDuplicates(["id_a", "id_b"])
        .withColumn("hamming", hamming)
        .select("id_a", "id_b", "hamming")
    )
    if not materialize:
        return out
    # snapshot the survivor pairs, then release the band cache (see
    # minhash_lsh_dedup — an unpaired persist leaks for the session lifetime)
    out = out.localCheckpoint(eager=True)
    banded.unpersist()
    return out


def _edge_width_bytes(schema) -> int | None:
    """Driver-side bytes per collected edge row, derived from the id column
    TYPES (the old flat 32-byte constant assumed int-ish ids; long string
    ids — hostile but legal — overshoot it 4-8x). Fixed-width types get
    their storage size plus Row overhead; any variable-width id type
    returns None, routing the caller's gate to the Catalyst plan estimate
    (which prices string columns) instead of an edge-count hint."""
    from pyspark.sql import types as T

    fixed = {
        T.ByteType: 1, T.ShortType: 2, T.IntegerType: 4, T.LongType: 8,
        T.FloatType: 4, T.DoubleType: 8, T.DateType: 4, T.TimestampType: 8,
        T.TimestampNTZType: 8, T.BooleanType: 1,
    }
    total = 16  # per-Row object overhead in the collected list
    for field in schema.fields:
        width = fixed.get(type(field.dataType))
        if width is None:
            return None
        total += width + 8  # boxed-value overhead per field
    return total


def connected_components(
    pairs: DataFrame,
    id_a: str = "id_a",
    id_b: str = "id_b",
    max_iter: int = 10,
    small_input_bytes: int = 256 << 20,
    edge_count_hint: int | None = None,
) -> DataFrame:
    """Duplicate-cluster assignment: connected components over a similarity
    edge list by min-label propagation. Returns (node_id, cluster_id) where
    cluster_id is the smallest node id in the component — i.e. the keeper
    under the reference's MIN-id keep rule (exact_dedup above).

    Each round every node takes the min of its own and neighbors' labels;
    converges in <= component-diameter rounds (near-dup clusters are tiny —
    the loop exits early on the first fixpoint, checked with a count()
    action per round on the label table, which is |nodes| rows, not edges).
    The loop is driver-side but every step is a distributed join — no
    collect of data.

    Cost gate (the repo-wide pattern, cf. packing/encode/knn): when the
    PAIR frame provably fits ``small_input_bytes`` — via Catalyst's static
    plan estimate, or an exact ``edge_count_hint`` the caller derived from a
    runtime stats job (static estimates of filtered self-joins are wildly
    pessimistic; ``semantic_dedup`` passes its cell-histogram pair bound) —
    the slim (id, id) edge list is collected and solved with a driver-side
    union-find: one job instead of ~3 per propagation round, identical
    labels (min id per component). Above the gate, the distributed loop:

    Edges and per-round labels are eagerly ``localCheckpoint``-ed, NOT
    persisted: each round references the label frame twice (propagation +
    fixpoint check), so with plain persist the LOGICAL plan doubles per
    round — ~2^rounds copies of the upstream edge plan — and an expensive
    producer (e.g. ``semantic_dedup``'s IVF build feeding pairs here) OOMs
    the driver just STRINGIFYING the plan before any data moves. Checkpoint
    truncates lineage so every round's plan is two LogicalRDD joins, flat
    forever. Superseded checkpoint blocks are freed per round via the ckpt
    registry (DataFrame.unpersist does not release localCheckpoint blocks).
    """
    from real_time_recommendation_system_with_feature_store_spark import ckpt
    from real_time_recommendation_system_with_feature_store_spark.operators.kcore import _plan_size_bytes

    slim = pairs.select(F.col(id_a).alias("src"), F.col(id_b).alias("dst"))
    per_edge = _edge_width_bytes(slim.schema)
    small = (
        edge_count_hint * per_edge <= small_input_bytes
        if edge_count_hint is not None and per_edge is not None
        else _plan_size_bytes(slim) <= small_input_bytes
    )
    if small:
        rows = slim.collect()
        parent: dict = {}

        def find(x):
            root = x
            while parent.get(root, root) != root:
                root = parent[root]
            while parent.get(x, x) != x:  # path compression
                parent[x], x = root, parent[x]
            return root

        for r in rows:
            a, b = r["src"], r["dst"]
            ra, rb = find(a), find(b)
            if ra != rb:
                # union by MIN root so the final label is the component min,
                # exactly the distributed loop's fixpoint
                lo, hi = (ra, rb) if ra < rb else (rb, ra)
                parent[hi] = lo
        labels = sorted({n for r in rows for n in (r["src"], r["dst"])})
        out_rows = [(n, find(n)) for n in labels]
        schema = (
            pairs.select(
                F.col(id_a).alias("node_id"), F.col(id_a).alias("cluster_id")
            ).schema
        )
        return pairs.sparkSession.createDataFrame(out_rows, schema)

    sc = pairs.sparkSession.sparkContext
    edges = (
        pairs.select(F.col(id_a).alias("src"), F.col(id_b).alias("dst"))
        .unionByName(pairs.select(F.col(id_b).alias("src"), F.col(id_a).alias("dst")))
        .distinct()
        .localCheckpoint(eager=True)
    )
    edge_ids = ckpt.checkpointed_rdd_ids(edges)
    labels = (
        edges.select(F.col("src").alias("node"))
        .distinct()
        .withColumn("label", F.col("node"))
        .localCheckpoint(eager=True)
    )
    label_ids = ckpt.checkpointed_rdd_ids(labels)
    for _ in range(max_iter):
        neighbor_min = (
            edges.join(labels, edges["dst"] == labels["node"])
            .groupBy(F.col("src").alias("node"))
            .agg(F.min("label").alias("nmin"))
        )
        new_labels = (
            labels.join(neighbor_min, "node", "left")
            .select("node", F.least("label", F.coalesce("nmin", "label")).alias("label"))
            .localCheckpoint(eager=True)
        )
        new_ids = ckpt.checkpointed_rdd_ids(new_labels)
        changed = (
            new_labels.join(labels.withColumnRenamed("label", "old"), "node")
            .where(F.col("label") != F.col("old"))
            .count()
        )
        ckpt.unpersist_rdd_ids(sc, label_ids)
        labels, label_ids = new_labels, new_ids
        if changed == 0:
            break
    ckpt.unpersist_rdd_ids(sc, edge_ids)
    # snapshot the (|nodes|-sized) label table so the loop's final blocks can
    # be released NOW — long-lived drivers otherwise accumulate dead blocks
    out = labels.select(
        F.col("node").alias("node_id"), F.col("label").alias("cluster_id")
    ).localCheckpoint(eager=True)
    ckpt.unpersist_rdd_ids(sc, label_ids)
    return out


def cross_corpus_overlap(
    train: DataFrame,
    eval_df: DataFrame,
    text_col: str,
    id_col: str,
    n: int = 5,
    min_common: int = 1,
    broadcast_eval: bool | None = None,
    max_shingle_df: int | None = None,
) -> DataFrame:
    """Benchmark decontamination: n-gram collisions between a training corpus
    and an evaluation corpus.

    Same inverted-index plan as ``ngram_jaccard_pairs`` but ACROSS corpora:
    shingle both sides, join on the shingle, count distinct collisions per
    (train_doc, eval_doc). Returns (train_id, eval_id, n_common,
    eval_overlap = n_common / |eval shingles|) for pairs with
    n_common >= min_common — the "drop or flag train docs that leak eval
    data" primitive.

    The eval corpus is structurally the small side (benchmarks vs a training
    lake), so by default its exploded shingles BROADCAST and the train-side
    trigram stream never shuffles — the post-join collision agg sees only
    matching rows. ``broadcast_eval`` overrides; the auto gate reads the
    pre-explode plan-size estimate.

    ``max_shingle_df`` is the stop-shingle cut for 100 TB skew: train-side
    shingles appearing in more than that many train docs (boilerplate,
    license headers — exactly where join skew lands) are dropped BEFORE the
    probe via one extra groupBy on the already-hashed column and an
    anti-join against the (small-by-construction) hot set. n_common then
    counts only retained shingles, so pairs whose overlap relied entirely
    on dropped boilerplate disappear; ``eval_overlap`` keeps its
    |eval shingles| denominator. Default None = exact counts.
    """
    if broadcast_eval is None:
        from real_time_recommendation_system_with_feature_store_spark.operators.kcore import _plan_size_bytes

        # the broadcast payload is the EXPLODED shingle frame: each word lands
        # in up to n shingles of n words, so it's ~n× the raw text estimate —
        # scale the 32MB budget down by n so the gate bounds what actually ships
        broadcast_eval = _plan_size_bytes(eval_df.select(id_col, text_col)) <= (
            (32 << 20) // max(n, 1)
        )
    # Join on the 8-byte xxhash64 of the shingle, not the ~n-word string:
    # the broadcast map and the probe-side hashing shrink by the string/long
    # size ratio (~25% wall-time at sf0.1). A collision merging two distinct
    # shingles needs ~2^32 distinct shingles per corpus to reach even 1e-9
    # probability — counts are unaffected in practice.
    tsh = train.select(
        F.col(id_col).alias("train_id"),
        F.explode(F.array_distinct(word_shingles(F.col(text_col), n))).alias("__s0"),
    ).select("train_id", F.xxhash64("__s0").alias("__s"))
    if max_shingle_df is not None:
        # per-doc shingles are already distinct, so count(*) per shingle IS
        # train document frequency; the hot set (df > cap) is the head of
        # the distribution — tiny — and AQE broadcasts the anti-join side
        hot = (
            tsh.groupBy("__s")
            .agg(F.count("*").alias("__df"))
            .where(F.col("__df") > max_shingle_df)
            .select("__s")
        )
        tsh = tsh.join(hot, "__s", "left_anti")
    esh = (
        eval_df.select(
            F.col(id_col).alias("eval_id"),
            F.array_distinct(word_shingles(F.col(text_col), n)).alias("__sh"),
        )
        .withColumn("__esize", F.size("__sh"))
        .select("eval_id", "__esize", F.explode("__sh").alias("__s0"))
        .select("eval_id", "__esize", F.xxhash64("__s0").alias("__s"))
    )
    return (
        tsh.join(F.broadcast(esh) if broadcast_eval else esh, "__s")
        .groupBy("train_id", "eval_id", "__esize")
        .agg(F.count("*").alias("n_common"))
        .where(F.col("n_common") >= min_common)
        .select(
            "train_id",
            "eval_id",
            "n_common",
            F.round(F.col("n_common") / F.col("__esize").cast("double"), 6).alias("eval_overlap"),
        )
    )


def minhash_band_index(
    df: DataFrame,
    text_col: str,
    id_col: str,
    n: int = 3,
    num_hashes: int = 32,
    bands: int = 8,
    hash_fn: str = "xxhash64",
) -> DataFrame:
    """The persistable MinHash band index: slim (id, __band, __bh) rows —
    exactly the banding stage's output, exposed so a corpus can be sketched
    ONCE, written as a dimension table (S10 pattern), and re-used by every
    incremental batch. ~24 bytes/row × bands: a 1e9-doc corpus indexes in
    ~200 GB versus re-shingling petabytes of text per increment."""
    sh = df.select(
        F.col(id_col),
        F.array_distinct(word_shingles(F.col(text_col), n)).alias("__sh"),
    ).where(F.size("__sh") > 0)
    return _band_rows_arrow(sh, id_col, num_hashes, bands, hash_fn)


def minhash_dedup_incremental(
    new_df: DataFrame,
    corpus_index: DataFrame,
    verify_docs: DataFrame,
    text_col: str,
    id_col: str,
    n: int = 3,
    num_hashes: int = 32,
    bands: int = 8,
    verify_threshold: float | None = 0.8,
    hash_fn: str = "xxhash64",
) -> DataFrame:
    """Incremental near-dup dedup: sketch ONLY the new batch, probe the
    persisted corpus index, and emit every candidate pair touching the new
    batch (new×corpus and new×new).

    The corpus side never re-runs tokenization/shingling/the MinHash kernel
    — at a 1e9-doc corpus with a 1e6-doc daily increment that is the
    difference between re-reading petabytes and reading a ~200 GB index.
    ``verify_docs`` supplies text for the exact-Jaccard verify of candidate
    ids (corpus rows are fetched by id — a semi-join-sized read, not a
    scan); pass ``verify_threshold=None`` to skip verification.

    Invariant (tested): full-corpus dedup == corpus-only dedup ∪ this.

    Returns (id_a, id_b [, jaccard]) with id_a < id_b.
    """
    new_bands = minhash_band_index(
        new_df, text_col, id_col, n, num_hashes, bands, hash_fn
    ).persist()
    all_bands = corpus_index.unionByName(new_bands)
    a = all_bands.select(F.col(id_col).alias("id_a"), "__band", "__bh")
    b = new_bands.select(F.col(id_col).alias("id_b"), "__band", "__bh")
    # new side on the right: every pair must touch the batch. id ordering is
    # normalized after the join (a corpus id can exceed a batch id).
    raw = a.join(b, ["__band", "__bh"]).where(F.col("id_a") != F.col("id_b"))
    cand = (
        raw.select(
            F.least("id_a", "id_b").alias("id_a"),
            F.greatest("id_a", "id_b").alias("id_b"),
        )
        .dropDuplicates(["id_a", "id_b"])
    )
    if verify_threshold is None:
        out = cand.localCheckpoint(eager=True)
        new_bands.unpersist()
        return out
    # snapshot the slim candidate set so the id semi-join below reads a
    # materialized ~16-byte-row table, then shingle ONLY the docs named in
    # some candidate pair — shingling all of verify_docs would re-tokenize
    # the corpus and defeat the incremental plan
    cand = cand.localCheckpoint(eager=True)
    new_bands.unpersist()
    cand_ids = (
        cand.select(F.col("id_a").alias(id_col))
        .unionByName(cand.select(F.col("id_b").alias(id_col)))
        .distinct()
    )
    # fail LOUDLY if verify_docs doesn't cover every candidate id — an inner
    # verify join would silently drop real cross-batch duplicates when a
    # caller passes only the new batch here (both id-sized slim frames, so
    # this probe is a tiny job)
    missing = cand_ids.join(verify_docs.select(id_col), id_col, "left_anti").limit(5).collect()
    if missing:
        raise ValueError(
            "minhash_dedup_incremental: verify_docs is missing candidate ids "
            f"(e.g. {[r[0] for r in missing]}); pass a frame covering BOTH the "
            "corpus and the new batch, or verify_threshold=None to skip "
            "verification"
        )
    sh = verify_docs.join(cand_ids, id_col, "left_semi").select(
        F.col(id_col),
        F.array_distinct(word_shingles(F.col(text_col), n)).alias("__sh"),
    )
    return _verify_exact_jaccard(cand, sh, id_col, verify_threshold).localCheckpoint(
        eager=True
    )


def verbatim_span_pairs(
    df: DataFrame,
    text_col: str,
    id_col: str,
    gram_chars: int = 50,
    mod_stride: int = 8,
    min_shared: int = 1,
    hash_fn: str = "xxhash64",
) -> DataFrame:
    """Verbatim substring overlap between documents (the exact-substring
    dedup family, Lee et al. 2022 "Deduplicating Training Data Makes
    Language Models Better"): two docs pair when they share at least
    ``min_shared`` SAMPLED character ``gram_chars``-grams.

    Sampling is CONTENT-DEFINED — a gram is kept iff hash(gram) %
    mod_stride == 0 — so both documents select the same grams of any shared
    substring regardless of alignment (a positional stride would miss
    overlaps shifted by a non-multiple; this is the winnowing/CDC trick).
    Expected sample density is len/mod_stride per doc; a shared verbatim
    span of s >= gram_chars chars contributes ~(s - gram_chars)/mod_stride
    expected shared grams, so n_shared estimates overlap length.

    Same slim-join shape as the other dedup tiers: only (id, 8-byte hash)
    rows reach the self-join; hash collisions (~2^-60) are the only false
    pairs — no verify pass needed for the "shares a verbatim span" claim.

    Returns (id_a, id_b, n_shared), id_a < id_b.
    """
    text = F.col(text_col)
    base_hash = (
        (lambda c: portable_hash60(c)) if hash_fn == "portable" else (lambda c: F.xxhash64(c))
    )
    # sequence(a, b) DESCENDS when a > b — docs shorter than the gram must
    # yield an empty position list, not positions [1, 0]
    n_pos = F.length(text) - (gram_chars - 1)
    positions = F.when(n_pos >= 1, F.sequence(F.lit(1), n_pos)).otherwise(
        F.array().cast("array<int>")
    )
    hashes = F.array_distinct(
        F.filter(
            F.transform(positions, lambda p: base_hash(F.substring(text, p, gram_chars))),
            lambda h: h % mod_stride == 0,
        )
    )
    g = df.select(F.col(id_col), F.explode(hashes).alias("__h"))
    a = g.select(F.col(id_col).alias("id_a"), "__h")
    b = g.select(F.col(id_col).alias("id_b"), "__h")
    return (
        a.join(b, "__h")
        .where(F.col("id_a") < F.col("id_b"))
        .groupBy("id_a", "id_b")
        .agg(F.count("*").alias("n_shared"))
        .where(F.col("n_shared") >= min_shared)
    )


def _span_split(df: DataFrame, text_col: str, id_col: str, span_words: int, sep: str | None):
    """Shared unit-splitting stage for the span-dedup family: normalize the
    (possibly hostile) column names, build the unit-array expression —
    separator paragraphs or fixed word-count spans — and the separator that
    reassembles them. Returns (base_frame, units_expr, join_sep)."""
    from real_time_recommendation_system_with_feature_store_spark.ident import qcol

    base = df.select(qcol(id_col).alias("__du_id"), qcol(text_col).alias("__du_text"))
    if sep is not None:
        # F.split's pattern is a Java regex — \Q...\E quotes the separator
        # literally (with the embedded-\E escape) so "||" or "." split as text
        quoted = "\\Q" + sep.replace("\\E", "\\E\\\\E\\Q") + "\\E"
        units = F.split(F.col("__du_text"), F.lit(quoted), -1)
        join_sep = sep
    else:
        w = int(span_words)
        words = F.split(F.col("__du_text"), " ", -1)
        n_spans = F.greatest(F.lit(1), F.ceil(F.size(words) / F.lit(w)).cast("int"))
        units = F.transform(
            F.sequence(F.lit(0), n_spans - 1),
            lambda i: F.array_join(F.slice(words, i * w + 1, w), " "),
        )
        join_sep = " "
    return base, units, join_sep


def _span_rebuild(kept: DataFrame, base: DataFrame, units, join_sep: str, id_col: str) -> DataFrame:
    """Shared reassembly stage: surviving units regroup per document in
    original order; documents whose every unit was dropped come back as
    empty strings via the left join against the full id set."""
    rebuilt = kept.groupBy("__du_id").agg(
        F.array_join(
            F.transform(
                F.array_sort(F.collect_list(F.struct("__du_pos", "__du_unit"))),
                lambda s: s["__du_unit"],
            ),
            join_sep,
        ).alias("dedup_text"),
        F.count("*").alias("n_spans_kept"),
    )
    totals = base.select("__du_id", F.size(units).alias("n_spans_total"))
    return totals.join(rebuilt, "__du_id", "left").select(
        F.col("__du_id").alias(id_col),
        F.coalesce("dedup_text", F.lit("")).alias("dedup_text"),
        F.coalesce("n_spans_kept", F.lit(0)).alias("n_spans_kept"),
        "n_spans_total",
    )


def dedup_spans(
    df: DataFrame,
    text_col: str,
    id_col: str,
    span_words: int = 10,
    sep: str | None = None,
    scope: str = "corpus",
) -> DataFrame:
    """Corpus-rewriting exact span dedup: split every document into units —
    consecutive non-overlapping ``span_words``-word spans (default, the
    ExactSubstr-style cut of "Deduplicating Training Data Makes Language
    Models Better", Lee et al. 2022, without the suffix-array
    generalization), or paragraphs on ``sep`` when given — drop every unit
    whose exact text occurred earlier (first occurrence is the keeper —
    corpus-wide by (id, position) with ``scope="corpus"``, or within each
    document with ``scope="document"`` for Gopher-style intra-doc repetition
    removal), and reassemble each document from its surviving units in
    original order.

    Reference parity: extends the reference's whole-document dedup basis
    (src/feature_store/feature_computer.py drop_duplicates usage) to
    sub-document granularity — an operator class the reference lacks but a
    100 TB corpus pipeline needs.

    Scale shape: two shuffles that matter — (1) the keeper aggregation
    groups exploded units by unit text with map-side partial ``min(struct)``
    combiners, so a boilerplate span repeated 10^9 times still reduces to
    one row per partition before the exchange; (2) the keeper semi-join back
    to the exploded frame keys on (unit, id, pos), so even that heavy
    hitter's occurrences spread across partitions instead of funneling into
    one task. Reassembly is a groupBy on the document id — the natural
    partitioning of the output. No windows, no row-UDFs, no all-pairs.
    """
    base, units, join_sep = _span_split(df, text_col, id_col, span_words, sep)
    # keeper bookkeeping runs on the 16-byte md5 fingerprint, not the span
    # text — the keeper shuffle and semi-join keys shrink to hash width while
    # the text rides only the exploded side it is rebuilt from (md5 is the
    # repo-wide exact-match contract, cf. exact_dedup/span_index)
    exploded = base.select(
        "__du_id", F.posexplode(units).alias("__du_pos", "__du_unit")
    ).withColumn("__du_fp", F.md5(F.col("__du_unit")))
    if scope == "document":
        # intra-document repetition removal (the Gopher-signal rewrite twin):
        # a unit survives only its first position WITHIN its own document —
        # one aggregation keyed (id, fp), no cross-document shuffle width
        keepers = exploded.groupBy("__du_id", "__du_fp").agg(
            F.min("__du_pos").alias("__du_pos")
        )
        kept = exploded.join(keepers, ["__du_id", "__du_fp", "__du_pos"], "left_semi")
    elif scope == "corpus":
        keepers = exploded.groupBy("__du_fp").agg(
            F.min(F.struct(F.col("__du_id"), F.col("__du_pos"))).alias("__k")
        )
        kept = exploded.join(
            keepers.select(
                "__du_fp",
                F.col("__k")["__du_id"].alias("__du_id"),
                F.col("__k")["__du_pos"].alias("__du_pos"),
            ),
            ["__du_fp", "__du_id", "__du_pos"],
            "left_semi",
        )
    else:
        raise ValueError(f"dedup_spans: scope must be 'corpus' or 'document', got {scope!r}")
    return _span_rebuild(kept, base, units, join_sep, id_col)


def span_index(
    df: DataFrame,
    text_col: str,
    id_col: str,
    span_words: int = 10,
    sep: str | None = None,
) -> DataFrame:
    """The persistable exact-span index: distinct ``span_fp`` md5
    fingerprints of every unit in the corpus — the S10-pattern dimension
    table for ``dedup_spans_incremental``. 16 bytes of hash per distinct
    span instead of the span text: a corpus is split ONCE and daily batches
    probe the slim index (md5 keeps the exact-match contract
    collision-safe at any realistic span count, unlike a 64-bit hash)."""
    base, units, _ = _span_split(df, text_col, id_col, span_words, sep)
    return (
        base.select(F.explode(units).alias("__du_unit"))
        .select(F.md5(F.col("__du_unit")).alias("span_fp"))
        .distinct()
    )


def dedup_spans_incremental(
    new_df: DataFrame,
    corpus_index: DataFrame,
    text_col: str,
    id_col: str,
    span_words: int = 10,
    sep: str | None = None,
) -> DataFrame:
    """Incremental span dedup: rewrite ONLY the new batch against a corpus
    indexed once by ``span_index`` — drop every unit whose fingerprint is in
    the index, apply the corpus-scope first-occurrence rule among the
    remaining (new) units within the batch, reassemble. Same output schema
    as ``dedup_spans``; append ``span_index(new_batch)`` (or the kept
    units' fingerprints) to the index afterwards to fold the batch in.

    Scale shape: the batch explodes, the CORPUS does not — the anti-join
    probes the slim (span_fp) index shuffled on the 16-byte hash (uniform,
    no skew), exactly the ``minhash_dedup_incremental`` posture. The
    in-batch keeper stage then runs on the anti-join survivors only.
    """
    base, units, join_sep = _span_split(new_df, text_col, id_col, span_words, sep)
    exploded = base.select("__du_id", F.posexplode(units).alias("__du_pos", "__du_unit"))
    fresh = exploded.withColumn("span_fp", F.md5(F.col("__du_unit"))).join(
        corpus_index.select("span_fp"), "span_fp", "left_anti"
    )
    keepers = fresh.groupBy("span_fp").agg(
        F.min(F.struct(F.col("__du_id"), F.col("__du_pos"))).alias("__k")
    )
    kept = fresh.join(
        keepers.select(
            "span_fp",
            F.col("__k")["__du_id"].alias("__du_id"),
            F.col("__k")["__du_pos"].alias("__du_pos"),
        ),
        ["span_fp", "__du_id", "__du_pos"],
        "left_semi",
    )
    return _span_rebuild(kept, base, units, join_sep, id_col)
