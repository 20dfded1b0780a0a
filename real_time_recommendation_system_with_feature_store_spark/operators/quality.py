"""Declarative data-quality validation — the expectation checks a training
ingest runs before trusting a table (null-rate, domain/range, uniqueness,
referential integrity), evaluated Spark-first.

The reference validates eagerly inside its loaders (pandas dropna/isin
filters, src/data/movielens.py preprocessing); this is the same intent as a
reusable report: every ROW-LOCAL rule is one boolean expression, and ALL of
them evaluate in a SINGLE conditional-aggregation scan of the table — at
100 TB the report costs one pass regardless of rule count. Uniqueness rules
add one groupBy on their key (dup groups counted map-side-partial), and
referential rules one left-anti join against the dimension (broadcast when
small). Output is long-form ``(rule, checked, violations)`` — tiny, unioned
from per-kind frames.

Row-local rules are (name, violation_predicate) pairs; build them with the
helpers or pass any Column predicate (True = violation). NULL predicate
results count as violations for ``not_null`` semantics via explicit
coalesce in the helpers — a hand-rolled predicate should decide its own
NULL policy.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from real_time_recommendation_system_with_feature_store_spark.ident import qcol


def not_null(col: str) -> tuple[str, Column]:
    return (f"not_null({col})", qcol(col).isNull())


def in_range(col: str, lo, hi) -> tuple[str, Column]:
    """Violation when the value exists and falls outside [lo, hi]
    (NULLs are not range violations — pair with not_null to forbid them)."""
    c = qcol(col)
    return (
        f"in_range({col},{lo},{hi})",
        F.coalesce((c < F.lit(lo)) | (c > F.lit(hi)), F.lit(False)),
    )


def in_set(col: str, allowed: list) -> tuple[str, Column]:
    c = qcol(col)
    return (
        f"in_set({col})",
        F.coalesce(~c.isin(*[F.lit(v) for v in allowed]), F.lit(False)),
    )


def matches(col: str, pattern: str) -> tuple[str, Column]:
    c = qcol(col)
    return (
        f"matches({col})",
        F.coalesce(~c.rlike(pattern), F.lit(False)),
    )


def quality_report(
    df: DataFrame,
    row_rules: list[tuple[str, Column]] | None = None,
    unique_keys: list[list[str]] | None = None,
    references: list[tuple[str, list[str], DataFrame, list[str]]] | None = None,
) -> DataFrame:
    """Evaluate every rule and return long-form
    ``(rule, checked, violations)``:

    * ``row_rules`` — ALL evaluate in one conditional-agg scan;
      ``checked`` is the table's row count.
    * ``unique_keys`` — each key list adds one groupBy on the key;
      ``violations`` = rows beyond the first in any duplicated group
      (0 ⇔ the key is unique), ``checked`` = non-null-key row count.
    * ``references`` — each ``(name, keys, dim, dim_keys)`` adds one
      left-anti join; ``violations`` = fact rows whose non-null key has
      no match in ``dim``, ``checked`` = non-null-key row count
      (NULL foreign keys are not violations — forbid with not_null).

    The output frame is rule-count-sized; ordering is the caller's
    (sort by rule for a stable report)."""
    spark = df.sparkSession
    parts: list[DataFrame] = []

    if row_rules:
        aggs = [F.count(F.lit(1)).alias("__checked")]
        for i, (_, pred) in enumerate(row_rules):
            aggs.append(F.count(F.when(pred, 1)).alias(f"__v{i}"))
        wide = df.agg(*aggs)
        stack_cols = []
        for i, (name, _) in enumerate(row_rules):
            stack_cols.append(
                F.struct(
                    F.lit(name).alias("rule"),
                    F.col("__checked").alias("checked"),
                    F.col(f"__v{i}").alias("violations"),
                )
            )
        parts.append(
            wide.select(F.explode(F.array(*stack_cols)).alias("r")).select(
                "r.rule", "r.checked", "r.violations"
            )
        )

    for keys in unique_keys or []:
        kcols = [qcol(k) for k in keys]
        nn = df.where(
            F.lit(True) if not keys else F.expr(" AND ".join(f"`{k}` IS NOT NULL" for k in keys))
        )
        grp = nn.groupBy(*kcols).agg(F.count(F.lit(1)).alias("__n"))
        parts.append(
            grp.agg(
                F.lit(f"unique({','.join(keys)})").alias("rule"),
                # coalesce: an all-NULL-key table has zero groups and the
                # sums would be NULL, not 0
                F.coalesce(F.sum("__n"), F.lit(0)).alias("checked"),
                F.coalesce(F.sum(F.col("__n") - 1), F.lit(0)).alias("violations"),
            )
        )

    for name, keys, dim, dim_keys in references or []:
        nn = df.where(
            F.expr(" AND ".join(f"`{k}` IS NOT NULL" for k in keys))
        )
        # alias dim keys to internal names — a fact/dim column-name
        # collision (fk on a same-named key) would be AMBIGUOUS_REFERENCE
        d = dim.select(
            *[dim[dk].alias(f"__q_ref{i}") for i, dk in enumerate(dim_keys)]
        )
        cond = [
            qcol(k) == F.col(f"__q_ref{i}") for i, k in enumerate(keys)
        ]
        orphans = nn.join(d, cond, "left_anti")
        checked = nn.agg(
            F.lit(name).alias("rule"),
            F.count(F.lit(1)).alias("checked"),
        )
        viol = orphans.agg(F.count(F.lit(1)).alias("violations"))
        parts.append(checked.crossJoin(viol))

    if not parts:
        return spark.createDataFrame(
            [], "rule string, checked long, violations long"
        )
    out = parts[0]
    for p in parts[1:]:
        out = out.unionByName(p)
    return out
