"""Text-analysis functions for the LLM-data-pipeline surface.

Beyond-the-reference operators required by the north star (BASELINE.json):
language-ID, quality scoring, token counting, fingerprinting. All pure Column
expressions (JVM-side); the only state is small literal stopword lists that
Catalyst constant-folds.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

from real_time_recommendation_system_with_feature_store_spark.functions.scalars import let

# Tiny per-language function-word lists for the n-gram/stopword heuristic
# language ID. Deliberately small and literal: at 100 TB a broadcast lookup of
# real fastText-style models would replace this, behind the same column API.
LANG_MARKERS: dict[str, list[str]] = {
    "en": ["the", "and", "of", "to", "is"],
    "es": ["el", "la", "de", "que", "los"],
    "de": ["der", "die", "und", "das", "ist"],
    "fr": ["le", "la", "les", "des", "est"],
}

STOPWORDS_EN = [
    "the", "a", "an", "and", "or", "of", "to", "in", "is", "it",
    "for", "on", "with", "as", "at", "by", "this", "that",
]


def tokens(text: Column) -> Column:
    """Whitespace tokenization (split on runs of whitespace, drop empties)."""
    return F.filter(F.split(F.trim(text), r"\s+"), lambda t: t != F.lit(""))


def token_count(text: Column) -> Column:
    """Whitespace token count."""
    return F.size(tokens(text))


def bpe_ish_token_count(text: Column) -> Column:
    """Sub-word-ish token estimate: count of word/number/punct pieces.

    A BPE-like regex segmentation (letters runs, digit runs, single
    punctuation) — a deterministic proxy for tokenizer cost accounting.
    """
    pieces = F.filter(
        F.split(text, r"(?<=[^A-Za-z0-9])|(?=[^A-Za-z0-9])"),
        lambda t: F.trim(t) != F.lit(""),
    )
    return F.size(pieces)


def avg_token_len(text: Column) -> Column:
    # let-bind the token array: every reference below would otherwise inline
    # (and re-evaluate, in interpreted HOF contexts) the whole split/filter
    # tree per row — see functions.scalars.let
    return let(
        tokens(text),
        lambda toks: F.aggregate(toks, F.lit(0), lambda acc, t: acc + F.length(t))
        / F.greatest(F.size(toks), F.lit(1)).cast("double"),
    )


def stopword_ratio(text: Column, stopwords: list[str] | None = None) -> Column:
    sw = F.array(*[F.lit(s) for s in (stopwords or STOPWORDS_EN)])
    return let(
        F.transform(tokens(text), lambda t: F.lower(t)),
        lambda toks: F.size(F.filter(toks, lambda t: F.array_contains(sw, t)))
        / F.greatest(F.size(toks), F.lit(1)).cast("double"),
    )


def punct_ratio(text: Column) -> Column:
    no_punct = F.regexp_replace(text, r"[^\w\s]", "")
    return (F.length(text) - F.length(no_punct)) / F.greatest(F.length(text), F.lit(1)).cast("double")


def quality_score(text: Column) -> Column:
    """Composite document-quality heuristic in [0,1].

    Blends length band, stopword presence, and low punctuation noise —
    the standard cheap pre-filter shape for pretraining corpora.
    """
    # one tokenization per row: bind the token array once and derive the
    # length band AND the stopword ratio from the bound variable (the inlined
    # form re-tokenized ~6x per row across the component expressions)
    swarr = F.array(*[F.lit(s) for s in STOPWORDS_EN])

    def build(toks: Column) -> Column:
        n = F.size(toks)
        length_ok = F.when((n >= 10) & (n <= 5000), F.lit(1.0)).otherwise(
            F.when(n < 10, n / F.lit(10.0)).otherwise(F.lit(5000.0) / n)
        )
        low = F.transform(toks, lambda t: F.lower(t))
        sw = F.size(F.filter(low, lambda t: F.array_contains(swarr, t))) / F.greatest(
            n, F.lit(1)
        ).cast("double")
        sw_ok = F.least(sw / F.lit(0.2), F.lit(1.0))
        punct_ok = F.lit(1.0) - F.least(punct_ratio(text) / F.lit(0.3), F.lit(1.0))
        return F.round(
            F.lit(0.4) * length_ok + F.lit(0.3) * sw_ok + F.lit(0.3) * punct_ok, 6
        )

    return let(tokens(text), build)


def lang_id(text: Column, markers: dict[str, list[str]] | None = None) -> Column:
    """Heuristic language ID: argmax of per-language marker-word hits.

    Deterministic tie-break by language code order; 'und' when no marker hits.
    """
    markers = markers or LANG_MARKERS
    langs = sorted(markers)

    def score(toks: Column) -> Column:
        scored = []
        for i, lang in enumerate(langs):
            arr = F.array(*[F.lit(w) for w in markers[lang]])
            hits = F.size(F.filter(toks, lambda t: F.array_contains(arr, t)))
            # priority field makes ties pick the alphabetically-first code
            scored.append(
                F.struct(hits.alias("hits"), F.lit(len(langs) - i).alias("pri"), F.lit(lang).alias("lang"))
            )
        return F.array_max(F.array(*scored))

    # two let-bindings: the token array is shared by every language's filter
    # pass, and the argmax struct is read twice (guard + payload)
    best = let(F.transform(tokens(text), lambda t: F.lower(t)), score)
    return let(
        best, lambda b: F.when(b["hits"] > 0, b["lang"]).otherwise(F.lit("und"))
    )


def fingerprint(text: Column) -> Column:
    """Document fingerprint: md5 of whitespace/case-normalized text.

    The exact-dedup key (reference's closest analog is the md5 result-cache
    key, src/serving/retrieval.py:585).
    """
    # collapse ALL whitespace runs first, then trim: trim() alone strips only
    # 0x20 spaces, so tab/newline-padded text would fingerprint differently
    normalized = F.lower(F.trim(F.regexp_replace(text, r"\s+", " ")))
    return F.md5(normalized)


def word_shingles(text: Column, n: int = 3) -> Column:
    """n-gram word shingles as an array<string> (MinHash/Jaccard input).

    Built as n-1 zip_with passes over shifted views of the token array
    (shingle_i = t[i] + ' ' + t[i+1] + ... ), NOT as a per-index
    transform+slice: higher-order functions are interpreted, and the
    slice-per-shingle formulation allocates an n-array per token — measured
    ~4x slower on the documents table at sf0.1. All shifted slices share
    length k-n+1, so zip_with (which NULL-pads to the longer side) never
    pads.
    """
    def build(toks: Column) -> Column:
        k = F.size(toks)
        width = k - n + 1
        acc = F.slice(toks, 1, width)
        for j in range(1, n):
            acc = F.zip_with(acc, F.slice(toks, 1 + j, width), lambda a, b: F.concat(a, F.lit(" "), b))
        return F.when(k >= n, acc).otherwise(F.array(F.concat_ws(" ", toks)))

    # let-bind the token array: the inlined form held ~2n+1 copies of the
    # tokenization tree (one per slice/size reference), each re-evaluated per
    # row under interpreted HOF evaluation — measured 1.6x on the shingle
    # pass alone at sf0.1, more when a Generate filter re-evaluates the tree
    return let(F.transform(tokens(text), lambda t: F.lower(t)), build)


def ngram_repetition_profile(df, text_col: str, id_col: str):
    """Gopher-style n-gram repetition signals per document (DataFrame-level —
    the counts need a grouped pass, not a scalar expression).

    Reference analog: the corpus-hygiene layer a pretraining pipeline applies
    beyond gopher-style static bounds (Rae et al. 2021 §A1.1 repetition
    rules), adapted to word fractions: with c(g) = occurrences of word n-gram
    g in the doc and W = token count,

      top2_frac = min(1, max_g c_2(g) * 2 / W)    (0 when W < 2)
      top3_frac = min(1, max_g c_3(g) * 3 / W)    (0 when W < 3)
      dup5_frac = min(1, sum over duplicated 5-grams of c_5(g) * 5 / W)

    Occurrence-times-width over-counts overlapping repeats ("x x x x": the
    top 2-gram occurs 3 times but covers only 4 words), so every fraction is
    capped at 1.0 — a documented deviation from Gopher's character-coverage
    form, which needs span arithmetic.

    Returns (id, n_words, top2_frac, top3_frac, dup5_frac); NULL texts are
    filtered out (no token stream to profile).

    Plan shape: a doc's gram multiplicities never collapse across docs, so a
    relational explode → count-per-(doc, gram) shuffle moves ~15× the rows
    it aggregates away (measured 12s vs 1s at sf0.1). The counts are
    document-LOCAL, so the whole profile is one scan + one Arrow kernel:
    the JVM builds the three hashed gram arrays per doc (one xxhash64 long
    per gram crosses the boundary, never the strings), numpy counts
    multiplicities per row — zero shuffles, embarrassingly parallel.
    """
    import numpy as np
    import pandas as pd
    from pyspark.sql import functions as F
    from pyspark.sql import types as T

    # Tokens hash ONCE in the JVM (lowercased, matching word_shingles'
    # normalization); the kernel derives every width's gram identities from
    # that single long array with a vectorized rolling xor-rotate — gram
    # equality is preserved (position-rotated token hashes collide across
    # distinct grams with ~2^-64 odds), and no gram strings are ever built.
    toks = F.transform(tokens(F.col(text_col)), lambda t: F.lower(t))
    hashed_df = df.where(F.col(text_col).isNotNull()).select(
        F.col(id_col),
        F.size(toks).alias("__w"),
        F.transform(toks, lambda t: F.xxhash64(t)).alias("__ht"),
    )
    out_schema = T.StructType(
        [
            T.StructField(id_col, df.schema[id_col].dataType),
            T.StructField("n_words", T.IntegerType()),
            T.StructField("top2_frac", T.DoubleType()),
            T.StructField("top3_frac", T.DoubleType()),
            T.StructField("dup5_frac", T.DoubleType()),
        ]
    )

    def round6(x: float) -> float:
        # Spark ROUND is half-up; Python round() is half-even
        return np.floor(x * 1e6 + 0.5) / 1e6 if x > 0 else 0.0

    def gram_counts(h: "np.ndarray", n: int) -> "np.ndarray":
        """Multiplicity of each distinct n-gram of the token-hash array."""
        width = len(h) - n + 1
        if width <= 0:
            return np.zeros(0, dtype=np.int64)
        acc = h[:width].copy()
        for j in range(1, n):
            x = h[j : j + width]
            r = np.uint64((17 * j) % 64)
            acc ^= (x << r) | (x >> np.uint64(64 - int(r)))
        return np.unique(acc, return_counts=True)[1]

    def gen(batches):
        for pdf in batches:
            ids, ws, f2, f3, f5 = [], [], [], [], []
            for doc_id, w, ht in zip(pdf[id_col], pdf["__w"], pdf["__ht"]):
                w = int(w)
                h = np.asarray(ht, dtype=np.int64).view(np.uint64)

                # same arithmetic as the SQL oracle: count*width/w as one
                # double division, capped, then half-up round6
                def frac(count: int, n: int) -> float:
                    if w == 0 or count == 0:
                        return 0.0
                    return round6(min(count * n / w, 1.0))

                c2 = gram_counts(h, 2)
                c3 = gram_counts(h, 3)
                c5 = gram_counts(h, 5)
                ids.append(doc_id)
                ws.append(w)
                f2.append(frac(int(c2.max()) if len(c2) else 0, 2))
                f3.append(frac(int(c3.max()) if len(c3) else 0, 3))
                f5.append(frac(int(c5[c5 >= 2].sum()) if len(c5) else 0, 5))
            yield pd.DataFrame(
                {
                    id_col: ids,
                    "n_words": np.asarray(ws, dtype=np.int32),
                    "top2_frac": f2,
                    "top3_frac": f3,
                    "dup5_frac": f5,
                }
            )

    return hashed_df.mapInPandas(gen, out_schema)


def nfc_normalized(df, text_col: str, id_col: str, keep_cols: tuple[str, ...] = ()):
    """Unicode NFC normalization (UAX #15) — the canonicalization step every
    multilingual corpus pipeline runs before hashing/dedup (composed vs
    decomposed accents would otherwise fingerprint as different docs).

    Spark SQL has no NFC builtin, so this is a vectorized Arrow kernel
    (pandas_udf, zero-shuffle, stays inside the scan stage); Python's
    ``unicodedata.normalize`` and DuckDB's ``nfc_normalize`` both implement
    UAX #15 and agree byte-for-byte (pinned by a property test over random
    combining-mark strings). Returns (id, *keep_cols, text_nfc, changed).
    """
    import pandas as pd
    from pyspark.sql import functions as F
    from pyspark.sql.functions import pandas_udf

    def _nfc_fn(s):
        import unicodedata

        return s.map(
            lambda x: unicodedata.normalize("NFC", x) if isinstance(x, str) else x
        )

    # no type hints: `from __future__ import annotations` stringifies them
    # and the locally-imported pd can't be resolved by the hint inferencer;
    # hint-less pandas_udf defaults to SCALAR, which is what this is
    _nfc = pandas_udf(_nfc_fn, "string")

    # one kernel invocation: normalize in the first projection, derive
    # `changed` from the materialized column in the second
    out = df.select(
        F.col(id_col),
        *[F.col(c) for c in keep_cols],
        _nfc(F.col(text_col)).alias("text_nfc"),
        F.col(text_col).alias("__orig"),
    )
    return out.select(
        id_col,
        *keep_cols,
        "text_nfc",
        (F.col("text_nfc") != F.col("__orig")).alias("changed"),
    )
