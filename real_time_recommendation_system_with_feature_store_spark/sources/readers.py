"""Batch sources (SURVEY.md §2.1 S1-S5).

All readers return lazy DataFrames so filters/projections placed later still
push into the scan.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T


def read_parquet(spark: SparkSession, path: str, columns: list[str] | None = None) -> DataFrame:
    """S2: parquet scan (reference scripts/evaluate_model.py:116-118).

    Columnar + pushdown; ``columns`` narrows ReadSchema at the scan.
    """
    df = spark.read.parquet(path)
    return df.select(*columns) if columns else df


def read_delimited(
    spark: SparkSession,
    path: str,
    schema: T.StructType,
    sep: str = "::",
    encoding: str = "latin-1",
) -> DataFrame:
    """S1: delimited-text scan with multi-char separator.

    Reference loads `::`-separated MovieLens .dat files via pandas
    (src/data/movielens.py:92-98,113-119,136-142). Spark's csv reader supports
    multi-char ``sep`` natively (Spark >= 3.0); schema is declared, never
    inferred, so the scan is single-pass.
    """
    # Spark's CSVOptions rejects the python alias "latin-1"
    charset = {"latin-1": "iso-8859-1", "latin1": "iso-8859-1"}.get(encoding.lower(), encoding)
    return (
        spark.read.option("sep", sep)
        .option("encoding", charset)
        .schema(schema)
        .csv(path)
    )


def read_json_events(
    spark: SparkSession,
    df: DataFrame,
    json_col: str,
    schema: T.StructType,
    keep: list[str] | None = None,
) -> DataFrame:
    """S5 batch analog: decode a JSON-string column into typed columns.

    Mirrors the Kafka consumer's ``json.loads`` per record
    (reference src/streaming/kafka_consumer.py:52-78). The streaming variant
    lives in streaming/pipeline.py; both share this from_json projection so
    batch/stream semantics stay identical.
    """
    parsed = df.withColumn("_j", F.from_json(F.col(json_col), schema))
    cols = [F.col(f"_j.{f.name}").alias(f.name) for f in schema.fields]
    if keep:
        cols = [F.col(c) for c in keep] + cols
    return parsed.select(*cols)


def read_json_events_tolerant(
    spark: SparkSession,
    df: DataFrame,
    json_col: str,
    schema: T.StructType,
    keep: list[str] | None = None,
):
    """Fault-tolerant S5 decode: (good rows, bad rows) from a dirty stream.

    The reference's consumer drops malformed records on the floor inside a
    try/except poll loop (kafka_consumer.py:65-78) — at pipeline scale you
    need the rejects accounted for, not swallowed. ``from_json`` in
    PERMISSIVE mode nulls unparseable rows; the raw payload is kept so bad
    rows can route to a dead-letter sink. Returns (good, bad): good carries
    the typed columns, bad carries the original string payload. One scan —
    the split is two filters over the same parsed projection, not two
    parses.
    """
    # PERMISSIVE from_json yields an all-null struct for bad input (not a
    # null struct), so the reject signal is the corrupt-record column
    with_corrupt = T.StructType(
        [*schema.fields, T.StructField("_corrupt_record", T.StringType())]
    )
    parsed = df.withColumn(
        "_j",
        F.from_json(
            F.col(json_col),
            with_corrupt,
            {"mode": "PERMISSIVE", "columnNameOfCorruptRecord": "_corrupt_record"},
        ),
    )
    # from_json(NULL) yields a NULL struct whose _corrupt_record is also NULL
    # — a NULL payload must dead-letter, not pass as an all-null typed row
    ok = parsed.where(F.col(json_col).isNotNull() & F.col("_j._corrupt_record").isNull())
    bad = parsed.where(
        F.col(json_col).isNull() | F.col("_j._corrupt_record").isNotNull()
    ).drop("_j")
    cols = [F.col(f"_j.{f.name}").alias(f.name) for f in schema.fields]
    if keep:
        cols = [F.col(c) for c in keep] + cols
    return ok.select(*cols), bad
