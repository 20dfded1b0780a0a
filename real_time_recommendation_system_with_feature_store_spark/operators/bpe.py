"""Distributed BPE tokenizer training + encoding (Sennrich et al. 2016).

The missing step between the corpus-curation ops and `pack_by_token_budget`:
learn a byte-pair-encoding merge table ON the corpus, then tokenize with it —
all in-engine, no external tokenizer artifacts.

Design for scale (the kcore_filter playbook, kcore.py:51):
  * Training never touches the corpus after ONE initial shuffle: the state is
    the WORD VOCAB frame (word, seq, freq) — |distinct words|, not |corpus|.
  * Each merge round is (a) a pair-count aggregation over the vocab frame
    (map-side partial agg; pair keys are bounded by the live token vocab),
    (b) a 1-row TakeOrdered argmax (total tie-break: count desc, left, right),
    (c) a map-side `replace` applying the merge. The only driver data is the
    single winning pair per round.
  * Lineage is cut with localCheckpoint every ``checkpoint_every`` rounds so
    N-merge training doesn't stack N plan layers.
  * Encoding folds small merge tables into pure expressions; above
    ``max_expr_merges`` it switches to an Arrow pass applying the same
    replaces in a Python loop (expression trees nest one level per merge, so
    a 30k-merge production table must not become a 30k-deep Catalyst plan).

Token sequences are strings with DOUBLED boundary markers
(``<RS><RS>tok<RS><RS>tok<RS><RS>``, RS = chr(30)): merging pair (l, r) is
``replace(seq, '<RS>l<RS><RS>r<RS>', '<RS>lr<RS>')``. The pattern consumes
only the INNER marker of each doubled boundary, so a replacement leaves the
adjacent boundaries intact — runs fuse greedily left-to-right ('a a a a' ->
'aa aa', exactly BPE) while a token can never match as the SUFFIX of a longer
token ('ab'+'b' never merges via (b,b)). The same string primitive exists in
ANSI SQL, so the oracle replays training rounds verbatim (replace/split
parity across engines is pinned by a property test).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

MARKER = "\x1e"
_B = MARKER + MARKER  # doubled token boundary


def merge_pattern(left: str, right: str) -> tuple[str, str]:
    """(search, replacement) applying merge (left, right) to a boundary-
    doubled token sequence."""
    return (
        f"{MARKER}{left}{_B}{right}{MARKER}",
        f"{MARKER}{left}{right}{MARKER}",
    )


from real_time_recommendation_system_with_feature_store_spark.ckpt import (
    checkpointed_rdd_ids as _checkpointed_rdd_ids,
    unpersist_rdd_ids as _unpersist_rdd_ids,
)


def word_vocab(df: DataFrame, text_col: str) -> DataFrame:
    """(word, seq, freq): distinct lowercased whitespace words with corpus
    frequencies — the one corpus-sized shuffle of BPE training. ``seq`` is
    the char-level boundary-doubled start state. Words containing the
    delimiter (chr 30, a control char that never survives text cleaning)
    are dropped defensively."""
    # explicit null filter on the split source: split(NULL) is NULL and
    # explode skips it (rows identical), and with InferFiltersFromGenerate
    # excluded session-wide this is what pushes IsNotNull(text) to the scan
    words = df.where(F.col(text_col).isNotNull()).select(
        F.explode(F.split(F.lower(F.trim(F.col(text_col))), r"\s+")).alias("word")
    ).where((F.length("word") > 0) & (~F.col("word").contains(MARKER)))
    return words.groupBy("word").agg(F.count("*").alias("freq")).withColumn(
        "seq",
        F.expr(
            f"concat('{_B}', concat_ws('', transform(sequence(1, length(word)),"
            f" i -> concat(substring(word, i, 1), '{_B}'))))"
        ),
    )


def _pair_counts(vocab: DataFrame) -> DataFrame:
    """freq-weighted adjacent-pair counts over the current token sequences.
    Pairs are counted per position (BPE convention: 'aaa' holds (a,a) twice)."""
    t = vocab.select(
        F.expr(f"filter(split(seq, '{MARKER}'), x -> x != '')").alias("__toks"),
        "freq",
    ).where(F.size("__toks") >= 2)
    pairs = F.expr(
        "transform(sequence(1, size(__toks) - 1),"
        " i -> struct(__toks[i - 1] AS l, __toks[i] AS r))"
    )
    return (
        t.select(F.explode(pairs).alias("p"), "freq")
        .groupBy(F.col("p.l").alias("left"), F.col("p.r").alias("right"))
        .agg(F.sum("freq").alias("pair_count"))
    )


def bpe_train(
    df: DataFrame,
    text_col: str,
    n_merges: int,
    min_count: int = 2,
    checkpoint_every: int = 4,
) -> DataFrame:
    """Learn ``n_merges`` BPE merges on the corpus; returns the merge table
    (round, left, right, pair_count) in learned order. Stops early when no
    pair reaches ``min_count``. Reference lifecycle slot: the tokenizer the
    reference assumes as a preprocessing given (its MovieLens pipeline has
    no text stage); public recipe per Sennrich et al. 2016."""
    spark = df.sparkSession
    sc = spark.sparkContext
    vocab = word_vocab(df, text_col).localCheckpoint(eager=True)
    ckpt_ids = _checkpointed_rdd_ids(vocab)
    merges: list[tuple[int, str, str, int]] = []
    for rnd in range(1, n_merges + 1):
        top = (
            _pair_counts(vocab)
            .where(F.col("pair_count") >= min_count)
            .orderBy(F.col("pair_count").desc(), F.col("left"), F.col("right"))
            .limit(1)
            .collect()
        )
        if not top:
            break
        l, r, c = top[0]["left"], top[0]["right"], top[0]["pair_count"]
        merges.append((rnd, l, r, c))
        pat, rep = merge_pattern(l, r)
        vocab = vocab.withColumn("seq", F.replace(F.col("seq"), F.lit(pat), F.lit(rep)))
        if rnd % checkpoint_every == 0:
            # release the PREVIOUS checkpoint's blocks after the new one is
            # materialized — at 30k merges the old behavior accumulated
            # thousands of dead block sets in executor storage memory
            vocab = vocab.localCheckpoint(eager=True)
            new_ids = _checkpointed_rdd_ids(vocab)
            _unpersist_rdd_ids(sc, ckpt_ids)
            ckpt_ids = new_ids
    _unpersist_rdd_ids(sc, ckpt_ids)
    return spark.createDataFrame(
        merges, "round int, left string, right string, pair_count bigint"
    )


def bpe_encode(
    df: DataFrame,
    text_col: str,
    id_col: str,
    merges: DataFrame,
    keep_cols: tuple[str, ...] = (),
    kernel: str = "auto",
    max_expr_merges: int = 64,
) -> DataFrame:
    """Tokenize ``text_col`` with a learned merge table: per word, apply the
    merges in learned order (each a boundary-doubled replace), then flatten
    to the doc's token array. Zero-shuffle either way; two physical forms:

      kernel="expr" (default for tables <= ``max_expr_merges``): merges fold
        into the expression as literals — the SQL-oracle reference shape.
        Expression trees nest one level per merge, so this form is gated.
      kernel="arrow": one mapInPandas pass applying the same replaces in a
        Python loop over the broadcast merge list — O(1) plan depth for
        production-sized (30k-merge) tables; Python str.replace shares the
        left-to-right non-overlapping semantics (pinned by the parity test).

    Returns (id_col, *keep_cols, tokens, n_tokens); ``keep_cols`` ride along
    so downstream stages (packing by shard) never need a doc-sized join."""
    if kernel not in ("auto", "expr", "arrow"):
        raise ValueError(f"unknown kernel: {kernel!r}")
    ordered = [(r["left"], r["right"]) for r in merges.orderBy("round").collect()]
    if kernel == "auto":
        kernel = "expr" if len(ordered) <= max_expr_merges else "arrow"
    if kernel == "arrow":
        return _bpe_encode_arrow(df, text_col, id_col, ordered, keep_cols)

    word_seq = F.expr(
        "transform(filter(split(lower(trim(__txt)), '\\\\s+'), w -> w != ''),"
        f" w -> concat('{_B}', concat_ws('', transform(sequence(1, length(w)),"
        f" i -> concat(substring(w, i, 1), '{_B}')))))"
    )
    # coalesce NULL text to '' so both kernels agree on NULL docs:
    # the arrow kernel yields (tokens=[], n_tokens=0) and the raw expr
    # form would propagate NULL through lower/trim/split instead
    out = df.select(
        F.col(id_col),
        *[F.col(c) for c in keep_cols],
        F.coalesce(F.col(text_col), F.lit("")).alias("__txt"),
    ).withColumn("__seqs", word_seq)

    def _apply_merge(l: str, r: str):
        pat, rep = merge_pattern(l, r)
        lpat, lrep = F.lit(pat), F.lit(rep)
        return lambda s: F.replace(s, lpat, lrep)

    for l, r in ordered:
        out = out.withColumn("__seqs", F.transform(F.col("__seqs"), _apply_merge(l, r)))
    toks = F.expr(
        f"flatten(transform(__seqs, s -> filter(split(s, '{MARKER}'), x -> x != '')))"
    )
    return out.select(
        id_col, *keep_cols, toks.alias("tokens"), F.size(toks).alias("n_tokens")
    )


def _bpe_encode_arrow(
    df: DataFrame,
    text_col: str,
    id_col: str,
    ordered: list[tuple[str, str]],
    keep_cols: tuple[str, ...],
) -> DataFrame:
    """Arrow encoding pass: same boundary-doubled replaces, Python loop."""
    from pyspark.sql import types as T

    spark = df.sparkSession
    bc = spark.sparkContext.broadcast([merge_pattern(l, r) for l, r in ordered])
    src = df.select(
        F.col(id_col), *[F.col(c) for c in keep_cols], F.col(text_col).alias("__txt")
    )
    schema = T.StructType(
        [src.schema[id_col]]
        + [src.schema[c] for c in keep_cols]
        + [
            T.StructField("tokens", T.ArrayType(T.StringType())),
            T.StructField("n_tokens", T.IntegerType()),
        ]
    )

    def gen(batches):
        import pandas as pd

        reps = bc.value
        for pdf in batches:
            toks_col, n_col = [], []
            for txt in pdf["__txt"]:
                # isinstance guard: Arrow nulls surface as None, but a
                # pandas object column can also carry NaN, which is truthy
                words = (
                    [w for w in txt.lower().strip().split() if w]
                    if isinstance(txt, str)
                    else []
                )
                doc_toks = []
                for w in words:
                    s = _B + _B.join(w) + _B
                    for pat, rep in reps:
                        s = s.replace(pat, rep)
                    doc_toks.extend(t for t in s.split(MARKER) if t)
                toks_col.append(doc_toks)
                n_col.append(len(doc_toks))
            out = pdf[[id_col, *keep_cols]].copy()
            out["tokens"] = toks_col
            out["n_tokens"] = pd.array(n_col, dtype="int32")
            yield out

    return src.mapInPandas(gen, schema=schema)
