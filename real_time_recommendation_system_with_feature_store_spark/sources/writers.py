"""Sinks (SURVEY.md §2.1 S3, S9, S10).

Parquet is the canonical persistence format — including for the vector table
that the reference keeps as a FAISS index artifact
(reference src/serving/retrieval.py:248-299): we persist `(id, embedding)`
rows and rebuild any index/LSH model from the table, which scales to many
writers and survives schema evolution.
"""

from __future__ import annotations

from pyspark.sql import DataFrame


def write_parquet(
    df: DataFrame,
    path: str,
    mode: str = "overwrite",
    partition_by: list[str] | None = None,
) -> None:
    """S3: parquet sink (reference scripts/train_movielens.py:180-182).

    ``partition_by`` gives partition pruning on re-read — at 100 TB the
    fact tables should be partitioned by date/tenant-style columns.
    """
    writer = df.write.mode(mode)
    if partition_by:
        writer = writer.partitionBy(*partition_by)
    writer.parquet(path)


def write_json(df: DataFrame, path: str, mode: str = "overwrite") -> None:
    """S9: JSON results sink (reference scripts/evaluate_model.py:334-344)."""
    df.write.mode(mode).json(path)


def write_parquet_observed(
    df: DataFrame,
    path: str,
    metrics: dict | None = None,
    mode: str = "overwrite",
    partition_by: list[str] | None = None,
) -> dict:
    """S3 + pipeline telemetry: parquet write with Observation metrics
    computed ON the write pass itself — row counts, null counts, value
    bounds arrive with the job, no second scan of (at 100 TB) petabytes.
    ``metrics`` maps names to aggregate Columns (default: row count);
    returns the observed values. The mechanism is Spark's query-listener
    Observation API, so any aggregate expressible over the written rows
    works (the declarative twin of accumulator counters)."""
    from pyspark.sql import Observation
    from pyspark.sql import functions as F

    metrics = metrics or {"n_rows": F.count(F.lit(1))}
    obs = Observation()
    observed = df.observe(obs, *[v.alias(k) for k, v in metrics.items()])
    write_parquet(observed, path, mode=mode, partition_by=partition_by)
    return obs.get
