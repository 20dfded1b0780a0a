"""Deduplication suite — LLM-data-pipeline operators (BASELINE.json north star).

Four tiers, cheapest → fuzziest:
  exact_dedup          md5-fingerprint groupBy (one shuffle on the hash)
  ngram_jaccard_pairs  exact set-similarity pairs via shingle inverted index
  minhash_lsh_dedup    MinHash signatures + LSH banding (scale path)
  simhash_dedup        64-bit SimHash near-dup buckets

Everything is pure Column expressions + joins — no UDFs — so the shuffle keys
are visible to Catalyst/AQE. All hashing is xxhash64/md5 (deterministic across
partitionings; no rand()).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
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


def minhash_lsh_dedup(
    df: DataFrame,
    text_col: str,
    id_col: str,
    n: int = 3,
    num_hashes: int = 32,
    bands: int = 8,
    verify_threshold: float | None = 0.8,
) -> DataFrame:
    """MinHash + LSH banding near-dup candidate pairs (optionally verified).

    signatures: num_hashes minhashes per doc (xxhash64-seeded — deterministic).
    banding: ``bands`` bands of r=num_hashes/bands rows; docs sharing any band
    hash become candidates (join key = (band_idx, band_hash) — uniform).
    verify: exact shingle Jaccard >= verify_threshold (None skips — pure LSH).

    Returns (id_a, id_b [, jaccard]).
    """
    rows_per_band = num_hashes // bands
    sh = df.select(
        F.col(id_col),
        F.array_distinct(word_shingles(F.col(text_col), n)).alias("__sh"),
    ).where(F.size("__sh") > 0)
    # persist: without it Catalyst inlines the signature fold into the
    # post-explode projection and recomputes it once per band row.
    # (Measured alternative — explode + 32 codegen'd min() aggregates —
    # computes identical values but its extra shuffle + join-back costs more
    # than the interpreted fold saves at every scale tried.)
    sig = sh.withColumn("__sig", _minhash_signature(F.col("__sh"), num_hashes)).persist()

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
        id_col, "__sh", F.explode(band_structs).alias("__b")
    ).select(id_col, "__sh", F.col("__b.band").alias("__band"), F.col("__b.bh").alias("__bh"))

    a = band_rows.select(F.col(id_col).alias("id_a"), F.col("__sh").alias("__sh_a"), "__band", "__bh")
    b = band_rows.select(F.col(id_col).alias("id_b"), F.col("__sh").alias("__sh_b"), "__band", "__bh")
    cand = (
        a.join(b, ["__band", "__bh"])
        .where(F.col("id_a") < F.col("id_b"))
        .select("id_a", "id_b", "__sh_a", "__sh_b")
        .dropDuplicates(["id_a", "id_b"])
    )
    if verify_threshold is None:
        return cand.select("id_a", "id_b")
    inter = F.size(F.array_intersect("__sh_a", "__sh_b"))
    union = F.size("__sh_a") + F.size("__sh_b") - inter
    return (
        cand.withColumn("jaccard", F.round(inter / union.cast("double"), 6))
        .where(F.col("jaccard") >= verify_threshold)
        .select("id_a", "id_b", "jaccard")
    )


def simhash(text, bits: int = 64):
    """64-bit SimHash of whitespace tokens as a signed long Column.

    Per token: xxhash64 → for each bit position, vote +1/-1; sign of the vote
    total sets the bit. Pure higher-order-function expression.
    """
    toks = tokens(text)
    hashes = F.transform(toks, lambda t: F.xxhash64(t))
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


def simhash_dedup(
    df: DataFrame,
    text_col: str,
    id_col: str,
    bits: int = 64,
    band_bits: int = 16,
) -> DataFrame:
    """SimHash near-dup candidates: docs whose simhash shares any of the
    ``bits/band_bits`` bands (Hamming-adjacent docs collide in ≥1 band).

    Returns (id_a, id_b, hamming) for candidates.
    """
    n_bands = bits // band_bits
    mask = (1 << band_bits) - 1
    sigs = df.select(F.col(id_col), simhash(F.col(text_col), bits).alias("__sim"))
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
    a = banded.select(F.col(id_col).alias("id_a"), F.col("__sim").alias("__sim_a"), "__band", "__bh")
    b = banded.select(F.col(id_col).alias("id_b"), F.col("__sim").alias("__sim_b"), "__band", "__bh")
    hamming = F.bit_count(F.col("__sim_a").bitwiseXOR(F.col("__sim_b")))
    return (
        a.join(b, ["__band", "__bh"])
        .where(F.col("id_a") < F.col("id_b"))
        .dropDuplicates(["id_a", "id_b"])
        .withColumn("hamming", hamming)
        .select("id_a", "id_b", "hamming")
    )


def connected_components(
    pairs: DataFrame,
    id_a: str = "id_a",
    id_b: str = "id_b",
    max_iter: int = 10,
) -> DataFrame:
    """Duplicate-cluster assignment: connected components over a similarity
    edge list by min-label propagation. Returns (node_id, cluster_id) where
    cluster_id is the smallest node id in the component — i.e. the keeper
    under the reference's MIN-id keep rule (exact_dedup above).

    Each round every node takes the min of its own and neighbors' labels;
    converges in <= component-diameter rounds (near-dup clusters are tiny —
    the loop exits early on the first fixpoint, checked with a count()
    action per round on the label table, which is |nodes| rows, not edges).
    The label table is persisted per round and the loop is driver-side but
    every step is a distributed join — no collect of data.
    """
    edges = (
        pairs.select(F.col(id_a).alias("src"), F.col(id_b).alias("dst"))
        .unionByName(pairs.select(F.col(id_b).alias("src"), F.col(id_a).alias("dst")))
        .distinct()
        .persist()
    )
    labels = edges.select(F.col("src").alias("node")).distinct().withColumn(
        "label", F.col("node")
    ).persist()
    for _ in range(max_iter):
        neighbor_min = (
            edges.join(labels, edges["dst"] == labels["node"])
            .groupBy(F.col("src").alias("node"))
            .agg(F.min("label").alias("nmin"))
        )
        new_labels = (
            labels.join(neighbor_min, "node", "left")
            .select("node", F.least("label", F.coalesce("nmin", "label")).alias("label"))
            .persist()
        )
        changed = (
            new_labels.join(labels.withColumnRenamed("label", "old"), "node")
            .where(F.col("label") != F.col("old"))
            .count()
        )
        labels.unpersist()
        labels = new_labels
        if changed == 0:
            break
    edges.unpersist()
    return labels.select(F.col("node").alias("node_id"), F.col("label").alias("cluster_id"))
