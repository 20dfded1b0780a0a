"""Feature store — SURVEY.md §2.1 S4/S6/S7/S8, §2.3 J7, §2.9 ST8.

A Feast-shaped registry over Spark tables (reference
src/features/feature_definitions.py + simple_feature_store.py), rebuilt on
three primitives:

  offline (point-in-time)  → as-of join with TTL (operators/asof.py)
  online snapshot          → latest-row-per-entity view of the same table
  materialize              → batch job writing the snapshot to parquet

One storage layout serves both paths: an append-only, entity-keyed feature
log partitioned by date. At 100 TB the online table is the compacted
latest-snapshot parquet (or an external KV store via foreachBatch — see
streaming/pipeline.py); the offline path reads the raw log with partition
pruning on the TTL horizon.
"""

from __future__ import annotations

from dataclasses import dataclass, field

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F
from pyspark.sql import types as T

from real_time_recommendation_system_with_feature_store_spark.operators.asof import asof_join_union


@dataclass
class FeatureView:
    """Typed, TTL'd, entity-keyed feature table (reference
    feature_definitions.py:36-272)."""

    name: str
    entities: list[str]
    ttl_seconds: float | None
    timestamp_field: str = "event_timestamp"
    created_field: str | None = None  # secondary as-of tiebreak
    schema: T.StructType | None = None
    source_path: str | None = None


@dataclass
class FeatureStore:
    spark: SparkSession
    views: dict[str, FeatureView] = field(default_factory=dict)
    _tables: dict[str, DataFrame] = field(default_factory=dict)
    _ckpt_ids: dict[str, set] = field(default_factory=dict)
    _retired_ids: dict[str, set] = field(default_factory=dict)
    _push_counts: dict[str, int] = field(default_factory=dict)

    def register(self, view: FeatureView, df: DataFrame | None = None) -> None:
        self.views[view.name] = view
        if df is not None:
            self._tables[view.name] = df
        elif view.source_path:
            reader = self.spark.read
            if view.schema is not None:
                reader = reader.schema(view.schema)
            self._tables[view.name] = reader.parquet(view.source_path)

    def table(self, name: str) -> DataFrame:
        return self._tables[name]

    def latest_snapshot(self, name: str) -> DataFrame:
        """Online-store view: latest feature row per entity key (S7 basis).

        Reference keeps a dict of latest rows (simple_feature_store.py:73-80);
        here it's a window dedup — the same query serves point lookups and
        bulk joins.
        """
        view = self.views[name]
        df = self._tables[name]
        order = [F.col(view.timestamp_field).desc()]
        if view.created_field:
            order.append(F.col(view.created_field).desc())
        w = Window.partitionBy(*view.entities).orderBy(*order)
        return df.withColumn("__rn", F.row_number().over(w)).where(F.col("__rn") == 1).drop("__rn")

    def get_online_features(self, name: str, entity_rows: DataFrame) -> DataFrame:
        """S7: point lookups = broadcast semi-join of keys onto the snapshot.

        TTL applies relative to the snapshot's max timestamp (the reference
        expires rows older than view.ttl, feature_definitions.py:220).
        """
        view = self.views[name]
        snap = self.latest_snapshot(name)
        if view.ttl_seconds is not None:
            horizon = snap.agg(F.max(view.timestamp_field).alias("__mx"))
            snap = (
                snap.crossJoin(F.broadcast(horizon))
                .where(
                    F.unix_timestamp(F.col("__mx")) - F.unix_timestamp(F.col(view.timestamp_field))
                    <= F.lit(view.ttl_seconds)
                )
                .drop("__mx")
            )
        return entity_rows.join(snap, view.entities, "left")

    def get_historical_features(
        self,
        name: str,
        entity_df: DataFrame,
        timestamp_col: str = "event_timestamp",
        row_id: str | None = None,
    ) -> DataFrame:
        """S8/J7: point-in-time-correct retrieval via as-of join with TTL.

        Reference semantics (simple_feature_store.py:52-71): per entity row,
        latest feature row with feature_ts <= event_ts and within TTL; cold
        entities keep null features.
        """
        view = self.views[name]
        feat = self._tables[name]
        # merge-style as-of (one shuffle, horizon-independent); ``row_id`` is
        # no longer needed to dedup candidates and is kept for API compat
        out = asof_join_union(
            entity_df,
            feat,
            on=view.entities,
            left_ts=timestamp_col,
            right_ts=view.timestamp_field,
            ttl_seconds=view.ttl_seconds,
            tiebreak=[view.created_field] if view.created_field else (),
        )
        return out

    def push(self, name: str, df: DataFrame, compact_every: int = 32) -> None:
        """S6: append new feature rows (the streaming foreachBatch sink
        lands in the same log — streaming/pipeline.py). EAGER by contract:
        the pushed rows are snapshotted via localCheckpoint before the
        union, which (a) satisfies foreachBatch's process-every-partition
        requirement for stateful streams, (b) detaches the stored table
        from unreplayable micro-batch source offsets, and (c) keeps a
        long-running stream's log queryable (every ``compact_every`` pushes
        the union chain is collapsed into one checkpoint and the superseded
        snapshots' storage blocks are released — otherwise the plan deepens
        and dead blocks accumulate for the session lifetime). The first
        push into a registered-but-empty view bootstraps its table."""
        if name not in self.views:
            raise KeyError(f"unknown feature view: {name!r}")
        from real_time_recommendation_system_with_feature_store_spark.ckpt import (
            checkpointed_rdd_ids,
            unpersist_rdd_ids,
        )

        sc = self.spark.sparkContext
        snap = df.localCheckpoint(eager=True)
        self._ckpt_ids.setdefault(name, set()).update(checkpointed_rdd_ids(snap))
        table = (
            self._tables[name].unionByName(snap) if name in self._tables else snap
        )
        self._push_counts[name] = self._push_counts.get(name, 0) + 1
        if self._push_counts[name] % compact_every == 0:
            table = table.localCheckpoint(eager=True)
            new_ids = checkpointed_rdd_ids(table)
            # Deferred release: blocks superseded THIS cycle survive until
            # the NEXT compaction — a grace window so DataFrame handles a
            # caller took from table()/latest_snapshot() before this
            # compaction keep working. Only the previous cycle's retired
            # set (two compactions old, ``2*compact_every`` pushes) is
            # actually freed now.
            unpersist_rdd_ids(sc, self._retired_ids.get(name, set()))
            self._retired_ids[name] = self._ckpt_ids[name]
            self._ckpt_ids[name] = new_ids
        self._tables[name] = table

    def materialize(self, name: str, path: str) -> None:
        """ST8: compact the latest snapshot to parquet (online-store backfill)."""
        self.latest_snapshot(name).write.mode("overwrite").parquet(path)
