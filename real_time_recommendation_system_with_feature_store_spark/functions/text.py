"""Text-analysis functions for the LLM-data-pipeline surface.

Beyond-the-reference operators required by the north star (BASELINE.json):
language-ID, quality scoring, token counting, fingerprinting. All pure Column
expressions (JVM-side); the only state is small literal stopword lists that
Catalyst constant-folds.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

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
    toks = tokens(text)
    total = F.aggregate(toks, F.lit(0), lambda acc, t: acc + F.length(t))
    return total / F.greatest(F.size(toks), F.lit(1)).cast("double")


def stopword_ratio(text: Column, stopwords: list[str] | None = None) -> Column:
    sw = F.array(*[F.lit(s) for s in (stopwords or STOPWORDS_EN)])
    toks = F.transform(tokens(text), lambda t: F.lower(t))
    hits = F.size(F.filter(toks, lambda t: F.array_contains(sw, t)))
    return hits / F.greatest(F.size(toks), F.lit(1)).cast("double")


def punct_ratio(text: Column) -> Column:
    no_punct = F.regexp_replace(text, r"[^\w\s]", "")
    return (F.length(text) - F.length(no_punct)) / F.greatest(F.length(text), F.lit(1)).cast("double")


def quality_score(text: Column) -> Column:
    """Composite document-quality heuristic in [0,1].

    Blends length band, stopword presence, and low punctuation noise —
    the standard cheap pre-filter shape for pretraining corpora.
    """
    n = token_count(text)
    length_ok = F.when((n >= 10) & (n <= 5000), F.lit(1.0)).otherwise(
        F.when(n < 10, n / F.lit(10.0)).otherwise(F.lit(5000.0) / n)
    )
    sw = stopword_ratio(text)
    sw_ok = F.least(sw / F.lit(0.2), F.lit(1.0))
    punct_ok = F.lit(1.0) - F.least(punct_ratio(text) / F.lit(0.3), F.lit(1.0))
    return F.round(F.lit(0.4) * length_ok + F.lit(0.3) * sw_ok + F.lit(0.3) * punct_ok, 6)


def lang_id(text: Column, markers: dict[str, list[str]] | None = None) -> Column:
    """Heuristic language ID: argmax of per-language marker-word hits.

    Deterministic tie-break by language code order; 'und' when no marker hits.
    """
    markers = markers or LANG_MARKERS
    langs = sorted(markers)
    toks = F.transform(tokens(text), lambda t: F.lower(t))
    scored = []
    for i, lang in enumerate(langs):
        arr = F.array(*[F.lit(w) for w in markers[lang]])
        hits = F.size(F.filter(toks, lambda t: F.array_contains(arr, t)))
        # priority field makes ties pick the alphabetically-first code
        scored.append(
            F.struct(hits.alias("hits"), F.lit(len(langs) - i).alias("pri"), F.lit(lang).alias("lang"))
        )
    best = F.array_max(F.array(*scored))
    return F.when(best["hits"] > 0, best["lang"]).otherwise(F.lit("und"))


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
    toks = F.transform(tokens(text), lambda t: F.lower(t))
    k = F.size(toks)
    width = k - n + 1
    acc = F.slice(toks, 1, width)
    for j in range(1, n):
        acc = F.zip_with(acc, F.slice(toks, 1 + j, width), lambda a, b: F.concat(a, F.lit(" "), b))
    return F.when(k >= n, acc).otherwise(F.array(F.concat_ws(" ", toks)))


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

    Plan shape: ONE scan explodes all three shingle widths tagged by n
    (grams from the n<k fallback of word_shingles are excluded — a 1-word
    doc has no 2-grams), one shuffle on (id, n, gram) for the counts, one on
    (id) for the per-doc profile. Both keys are document-scoped: no global
    hotspots at corpus scale.

    Returns (id, n_words, top2_frac, top3_frac, dup5_frac).
    """
    from pyspark.sql import functions as F

    toks = tokens(F.col(text_col))
    n_words = F.size(toks)

    def tagged(n: int):
        sh = word_shingles(F.col(text_col), n)
        guarded = F.when(n_words >= n, sh).otherwise(F.array().cast("array<string>"))
        return F.transform(guarded, lambda g: F.struct(F.lit(n).alias("n"), g.alias("g")))

    grams = df.select(
        F.col(id_col),
        n_words.alias("__w"),
        F.explode_outer(
            F.concat(tagged(2), tagged(3), tagged(5))
        ).alias("__t"),
    )
    counts = (
        grams.groupBy(id_col, "__w", F.col("__t.n").alias("__n"), F.col("__t.g").alias("__g"))
        .agg(F.count("*").alias("__c"))
    )
    prof = (
        counts.groupBy(id_col, "__w")
        .agg(
            F.max(F.when(F.col("__n") == 2, F.col("__c"))).alias("__top2"),
            F.max(F.when(F.col("__n") == 3, F.col("__c"))).alias("__top3"),
            F.sum(
                F.when((F.col("__n") == 5) & (F.col("__c") >= 2), F.col("__c"))
            ).alias("__dup5"),
        )
    )
    w = F.col("__w").cast("double")
    def frac(count_col: Column, n: int) -> Column:
        return F.round(
            F.least(F.coalesce(count_col * n / w, F.lit(0.0)), F.lit(1.0)), 6
        )

    return prof.select(
        F.col(id_col),
        F.col("__w").cast("int").alias("n_words"),
        frac(F.col("__top2"), 2).alias("top2_frac"),
        frac(F.col("__top3"), 3).alias("top3_frac"),
        frac(F.col("__dup5"), 5).alias("dup5_frac"),
    )
