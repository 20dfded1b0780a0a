"""Scalar function library (SURVEY.md §2.8 F1-F21, F25-F26).

Every function here is a pure Column expression — JVM-side, codegen'd inside
WholeStageCodegen, zero Python in the hot path. These are the building blocks
the feature layer composes.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

EPS = 1e-6


def let(value: Column, body) -> Column:
    """Bind ``value`` to a variable and evaluate ``body(var)`` — SQL-level
    let-binding via a single-element higher-order ``transform``.

    Column-expression helpers naturally reference a subexpression (a token
    array, a norm) several times; Catalyst inlines every reference, and
    interpreted evaluation (all higher-order functions, non-codegen Filters)
    then re-executes the whole subtree per reference. Wrapping the shared
    subtree as ``transform(array(value), v -> body(v))[0]`` evaluates it
    exactly once per row and turns every reference into a lambda-variable
    lookup. Pure expression rewrite: results are bit-identical (``value`` is
    evaluated unconditionally, exactly as when its tree is inlined at the
    first reference).
    """
    return F.transform(F.array(value), body)[0]


def extract_year(title: Column, default: int = 1990) -> Column:
    """F1: year from trailing "(yyyy)" with numeric coercion + default.

    Reference: src/data/movielens.py:145-146.
    """
    raw = F.regexp_extract(title, r"\((\d{4})\)\s*$", 1)
    return F.coalesce(F.nullif(raw, F.lit("")).cast("int"), F.lit(default))


def strip_year(title: Column) -> Column:
    """F2: remove trailing "(yyyy)" (reference src/data/movielens.py:149)."""
    return F.trim(F.regexp_replace(title, r"\s*\(\d{4}\)\s*$", ""))


def genre_flag(genres: Column, genre: str) -> Column:
    """F3: case-insensitive substring multi-hot flag.

    Reference (src/data/movielens.py:152-154) uses pandas
    ``str.contains(case=False, regex=False)`` — a *substring* match ("War"
    matches "Warhol"); replicated, not fixed, for parity.
    """
    return F.lower(genres).contains(genre.lower()).cast("int")


def num_genres(genres: Column, sep: str = r"\|") -> Column:
    """F4: count of |-separated genres (reference src/data/movielens.py:157)."""
    return F.size(F.split(genres, sep))


def map_lookup(col: Column, mapping: dict, default=None) -> Column:
    """F5: dict map as a CASE WHEN chain (reference src/data/movielens.py:56-59).

    Constant-folded by Catalyst; for huge maps prefer a broadcast-join lookup
    table instead.
    """
    expr = F.lit(default)
    for k, v in mapping.items():
        expr = F.when(col == F.lit(k), F.lit(v)).otherwise(expr)
    return expr


def equality_encode(col: Column, value) -> Column:
    """F6: (col == value) -> 1/0 (reference src/data/movielens.py:122)."""
    return F.when(col == F.lit(value), F.lit(1)).otherwise(F.lit(0))


def unix_to_timestamp(col: Column) -> Column:
    """F7: unix seconds -> timestamp (reference src/data/movielens.py:101)."""
    return F.timestamp_seconds(col)


def days_between(later: Column, earlier: Column) -> Column:
    """F8: whole-day difference (reference feature_engineering.py:68)."""
    return F.datediff(later, earlier)


def hours_between(later: Column, earlier: Column) -> Column:
    """F9: fractional hours (reference feature_engineering.py:117)."""
    return (F.unix_timestamp(later) - F.unix_timestamp(earlier)) / F.lit(3600.0)


def freshness(age_hours: Column, half_life_hours: float = 168.0) -> Column:
    """F10: exp(-age/HL) decay (reference feature_engineering.py:325-327)."""
    return F.exp(-age_hours / F.lit(half_life_hours))


def trending_velocity(recent_1h: Column, older_23h: Column) -> Column:
    """F11: velocity ratio (reference feature_engineering.py:329-335)."""
    return recent_1h * F.lit(24.0) / (older_23h + F.lit(EPS))


def clip01(col: Column) -> Column:
    """Clip to [0,1] via least/greatest (part of F12)."""
    return F.least(F.greatest(col, F.lit(0.0)), F.lit(1.0))


def quality_blend(ctr: Column, trending: Column, fresh: Column, norm_views: Column) -> Column:
    """F12: weighted blend, clipped (reference feature_engineering.py:337-345)."""
    return clip01(
        F.lit(0.3) * ctr + F.lit(0.3) * clip01(trending) + F.lit(0.2) * fresh + F.lit(0.2) * norm_views
    )


def engagement_score(clicks: Column, views: Column) -> Column:
    """F13: (clicks*2+views)/(views+eps) (reference feature_engineering.py:317-323)."""
    return (clicks * F.lit(2.0) + views) / (views + F.lit(EPS))


def list_diversity(arr: Column) -> Column:
    """F14: len(set(x))/max(len(x),1) (reference feature_engineering.py:311-315)."""
    return F.size(F.array_distinct(arr)) / F.greatest(F.size(arr), F.lit(1)).cast("double")


def ctr(clicks: Column, views: Column) -> Column:
    """A6: clicks/(views+eps) (reference feature_engineering.py:225-228)."""
    return clicks / (views + F.lit(EPS))


def zscore(col: Column, mean: Column, std: Column) -> Column:
    """F18: (x-mean)/(std+1e-8) (reference src/data/movielens.py:421-422)."""
    return (col - mean) / (std + F.lit(1e-8))


def log2(col: Column) -> Column:
    """F20: base-2 log (reference src/evaluation/metrics.py:148,152,476)."""
    return F.log2(col)


def md5_key(col: Column) -> Column:
    """F21: md5 cache key (reference src/serving/retrieval.py:585)."""
    return F.md5(col.cast("string"))


def hash_unit(*cols: Column) -> Column:
    """F25/SE1 determinism shim: key-derived uniform in [0,1).

    ``rand(seed)`` is partition-order-dependent on Spark, so seeded sampling
    is derived from md5(key) instead — identical on any partitioning AND
    reproducible in an ANSI-SQL oracle (SURVEY.md §4.3, §7.3).
    """
    concatenated = F.concat_ws("\x1f", *[c.cast("string") for c in cols])
    bucket = F.conv(F.substring(F.md5(concatenated), 1, 8), 16, 10).cast("long")
    return bucket / F.lit(float(16**8))
