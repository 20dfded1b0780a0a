"""SparkSession factory tuned for both local testing and cluster scale.

The reference has no session concept (eager pandas/polars, see SURVEY.md §3);
here every pipeline hangs off one SparkSession so Catalyst sees whole plans.

Scale posture (100 TB / 1000 executors):
  * AQE on — runtime coalesce + skew-join splitting replace hand-tuning.
  * shuffle.partitions defaults to cores locally; on a real cluster callers
    pass ``shuffle_partitions`` sized to ~128 MB post-shuffle blocks.
  * Arrow enabled — every Pandas-UDF boundary is vectorized.
  * UTC session timezone — results must hash-match a UTC-naive DuckDB oracle.
"""

from __future__ import annotations

import os

from pyspark.sql import SparkSession

DEFAULT_SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")


def get_spark(
    app_name: str = "real_time_recommendation_system_with_feature_store_spark",
    cpus: int | None = None,
    shuffle_partitions: int | None = None,
    extra_conf: dict[str, str] | None = None,
) -> SparkSession:
    """Build (or fetch) the tuned SparkSession.

    ``cpus`` defaults to $SPARK_GRAFT_CPUS or all cores. On a real cluster the
    master/memory settings come from spark-submit and these local settings are
    ignored; the sql.* tuning below applies everywhere.
    """
    if cpus is None:
        cpus = int(os.environ.get("SPARK_GRAFT_CPUS", "0")) or os.cpu_count() or 4
    if shuffle_partitions is None:
        shuffle_partitions = max(int(cpus), 4)

    builder = (
        SparkSession.builder.master(f"local[{cpus}]")
        .appName(app_name)
        .config("spark.sql.shuffle.partitions", str(shuffle_partitions))
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.sql.adaptive.coalescePartitions.enabled", "true")
        .config("spark.sql.adaptive.skewJoin.enabled", "true")
        .config("spark.sql.autoBroadcastJoinThreshold", str(64 * 1024 * 1024))
        .config("spark.sql.session.timeZone", "UTC")
        .config("spark.sql.execution.arrow.pyspark.enabled", "true")
        .config("spark.driver.memory", os.environ.get("SPARK_GRAFT_DRIVER_MEM", "16g"))
        .config("spark.ui.enabled", "false")
        .config("spark.sql.files.maxPartitionBytes", str(128 * 1024 * 1024))
        .config("spark.local.dir", os.environ.get("SPARK_LOCAL_DIRS", "/tmp"))
        # the driver's events.parquet carries TIMESTAMP(NANOS), which the
        # vectorized reader rejects; read as long and convert in load_tables
        .config("spark.sql.legacy.parquet.nanosAsLong", "true")
        # state-store delta-file writes deadlock in 4.1's checksum checkpoint
        # manager (executor threads park in ChecksumCheckpointFileManager
        # .awaitResult under concurrent stateful-operator commits)
        .config("spark.sql.streaming.checkpoint.fileChecksum.enabled", "false")
        # runtime bloom-filter pruning: selective joins inject a bloom filter
        # into the probe side's scan — at 100 TB this skips most of a fact
        # table when the build side is filtered (no-op on tiny local data)
        .config("spark.sql.optimizer.runtime.bloomFilter.enabled", "true")
        # InferFiltersFromGenerate copies the generator expression into a
        # size(e)>0 AND isnotnull(e) filter below every explode. When the
        # generator is an expensive expression tree (word shingles, token
        # arrays) the filter re-evaluates that tree twice more per input row
        # in an interpreted Filter — measured 0.81s -> 0.17s on the
        # decontamination eval side at sf0.1. Generate itself already skips
        # empty/NULL arrays, so excluding the rule changes no results at any
        # scale; the filter's only value (dropping empty-array rows before a
        # shuffle) does not apply to our explode sites, which are all
        # followed by map-side work first.
        .config(
            "spark.sql.optimizer.excludedRules",
            "org.apache.spark.sql.catalyst.optimizer.InferFiltersFromGenerate",
        )
    )
    for k, v in (extra_conf or {}).items():
        builder = builder.config(k, v)
    spark = builder.getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    return spark


def load_tables(spark: SparkSession, sf_dir: str = DEFAULT_SF_DIR, register: bool = True):
    """Load the driver's star-schema tables; optionally register temp views.

    Parquet scans get predicate pushdown + column pruning from Catalyst for
    free — downstream operators must keep projections narrow so pruning bites.
    """
    names = [
        "region",
        "nation",
        "customer",
        "supplier",
        "part",
        "orders",
        "lineitem",
        "events",
        "documents",
        "embeddings",
    ]
    from pyspark.sql import functions as F
    from pyspark.sql import types as T

    tables = {}
    for name in names:
        df = spark.read.parquet(f"{sf_dir}/{name}.parquet")
        # nanos columns arrive as long (see nanosAsLong conf); floor-convert
        # to micros exactly like DuckDB/pyarrow truncate ns -> us.
        if name == "events" and isinstance(df.schema["ts"].dataType, T.LongType):
            df = df.withColumn("ts", F.timestamp_micros(F.expr("ts div 1000")))
        # timestamp[us] parquet columns (no zone) load as TIMESTAMP_NTZ, which
        # time functions like unix_micros reject; with the UTC session zone the
        # NTZ -> LTZ cast is an exact relabel, and collected values still
        # hash-match the UTC-naive DuckDB oracle.
        for field in df.schema.fields:
            if isinstance(field.dataType, T.TimestampNTZType):
                df = df.withColumn(field.name, F.col(field.name).cast(T.TimestampType()))
        tables[name] = df
        if register:
            df.createOrReplaceTempView(name)
    return tables
