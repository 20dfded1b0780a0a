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
