"""Stream-stream joins (SURVEY.md §2.8 extension).

A watermarked, time-bounded self-join of the events stream: purchases
joined to the views that preceded them within a bounded interval. The
time bound + watermarks are what make the state finite — without them a
stream-stream join must buffer both sides forever; with them Spark
evicts state older than (watermark - bound) on both sides.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def purchase_view_join(events: DataFrame, watermark: str = "1 hour") -> DataFrame:
    """Purchases ⋈ views on user within the 30 minutes before the
    purchase. Works identically on a streaming or batch events frame —
    the batch twin is the correctness oracle (tests).
    """
    purchases = (
        events.where(F.col("event_type") == "purchase")
        .select(
            F.col("user_id"),
            F.col("ts").alias("p_ts"),
            F.col("event_id").alias("purchase_id"),
            F.col("value").alias("purchase_value"),
        )
        .withWatermark("p_ts", watermark)
    )
    views = (
        events.where(F.col("event_type") == "view")
        .select(
            F.col("user_id").alias("v_user_id"),
            F.col("ts").alias("v_ts"),
            F.col("event_id").alias("view_id"),
        )
        .withWatermark("v_ts", watermark)
    )
    cond = (
        (purchases.user_id == views.v_user_id)
        & (views.v_ts >= purchases.p_ts - F.expr("INTERVAL 30 MINUTES"))
        & (views.v_ts <= purchases.p_ts)
    )
    return purchases.join(views, cond, "inner").select(
        "purchase_id", "view_id", "user_id"
    )
