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
