"""Streaming sinks: exactly-once-style parquet ingestion via
``foreachBatch`` + the anti-join idempotent writer.

``foreachBatch`` hands each micro-batch to batch-land, where
``append_if_absent`` makes the write idempotent on the natural key —
so a replayed batch (restart between sink write and offset commit)
inserts nothing the second time. Checkpointing tracks source offsets;
the key-level idempotence covers the at-least-once gap in between.
This is the plain-parquet version of what a transactional sink
(Delta/Iceberg) gives natively.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql.streaming import StreamingQuery

from ..sources.writers import append_if_absent


def stream_to_parquet_idempotent(
    stream_df: DataFrame,
    path: str,
    key_cols: list[str],
    checkpoint: str,
) -> StreamingQuery:
    """Start an availableNow ingestion of ``stream_df`` into ``path``,
    idempotent on ``key_cols``. Returns the running query (caller
    awaits termination)."""

    def write_batch(batch_df: DataFrame, batch_id: int) -> None:
        append_if_absent(batch_df.sparkSession, batch_df, path, key_cols)

    return (
        stream_df.writeStream.foreachBatch(write_batch)
        .option("checkpointLocation", checkpoint)
        .trigger(availableNow=True)
        .start()
    )


def stream_to_scd2_dim(
    stream_df: DataFrame,
    path: str,
    key_cols: list[str],
    ts_col: str,
    checkpoint: str,
) -> StreamingQuery:
    """Maintain an SCD-2 dimension from a change stream: each
    micro-batch merges through :func:`~projet5_spark.sources.writers.
    scd2_upsert`, so the dimension accumulates full version history
    (``__valid_from``/``__valid_to``/``__current``) as changes arrive.

    Replay safety comes from the writer, not the checkpoint alone:
    unchanged-content redeliveries are digest-skipped and
    not-strictly-newer (late/NULL-ts) arrivals are rejected, so the
    at-least-once window between sink write and offset commit cannot
    fabricate versions or corrupt history. The batch must be unique on
    ``key_cols`` (standard CDC compaction — keep the latest change per
    key per batch before merging)."""
    from ..sources.writers import scd2_upsert

    def merge_batch(batch_df: DataFrame, batch_id: int) -> None:
        if batch_df.isEmpty():
            return
        scd2_upsert(batch_df.sparkSession, batch_df, path, key_cols, ts_col)

    return (
        stream_df.writeStream.foreachBatch(merge_batch)
        .option("checkpointLocation", checkpoint)
        .trigger(availableNow=True)
        .start()
    )
