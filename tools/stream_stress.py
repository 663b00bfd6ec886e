"""Structured Streaming throughput stress: drive the engine's own
streaming operators from a ``rate`` source and report what the
progress stream says they sustain.

The stream≡batch tests prove SEMANTICS (tests/test_streaming.py); this
tool measures THROUGHPUT — the number the 100 TB streaming story needs:
rows/s sustained through a watermarked tumbling-window aggregate and
through ``dropDuplicates`` stateful dedup, plus the state-store row
counts that bound executor memory.

Each arm runs the rate source at ``--rate`` rows/s (default 500k) for
``--secs`` wall seconds (default 30), synthesizing event-shaped columns
(user_id, event_type, value, ts) from the rate stream's (timestamp,
value) pair. Reported per arm, from StreamingQueryProgress:

- ``rows_per_sec``: median processedRowsPerSecond over completed
  micro-batches (excluding the warm-up batch);
- ``max_batch_ms``: worst batch duration — sustained ingestion needs
  this under the trigger interval;
- ``state_rows``: final state-store row count (bounded state is the
  scale claim: window state expires with the watermark, dedup state
  with its event-time column).

Usage::

    python tools/stream_stress.py                # both arms, defaults
    python tools/stream_stress.py --rate 1000000 --secs 60
"""

from __future__ import annotations

import argparse
import json
import os
import statistics
import sys
import tempfile
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import DataFrame, SparkSession, functions as F  # noqa: E402

from projet5_spark.session import ensure_utc, get_spark  # noqa: E402


def _rate_events(spark: SparkSession, rate: int) -> DataFrame:
    """Event-shaped columns synthesized from the rate source: ~100k
    concurrent users, 5 event types, cents-grid values, event time =
    source time minus a small deterministic jitter so the watermark
    path (late, in-window data) is actually exercised."""
    raw = (
        spark.readStream.format("rate")
        .option("rowsPerSecond", rate)
        .option("numPartitions", 8)
        .load()
    )
    return raw.select(
        (F.col("value") % 100_000).alias("user_id"),
        F.element_at(
            F.array(*[F.lit(t) for t in ("view", "click", "cart", "purchase", "refund")]),
            (F.col("value") % 5 + 1).cast("int"),
        ).alias("event_type"),
        ((F.col("value") * 2654435761) % 100_000 / 100.0).alias("value"),
        (
            F.col("timestamp")
            - F.make_dt_interval(secs=(F.col("value") % 30).cast("double"))
        ).alias("ts"),
        F.col("value").alias("event_id"),
    )


def _run_arm(spark: SparkSession, name: str, out: DataFrame, secs: int) -> dict:
    ckpt = tempfile.mkdtemp(prefix=f"stream-stress-{name}-")
    try:
        q = (
            out.writeStream.outputMode(
                "update" if name != "dedup" else "append"
            )
            .format("noop")
            .option("checkpointLocation", ckpt)
            .start()
        )
        time.sleep(secs)
        progresses = [json.loads(p.json) for p in q.recentProgress]
        q.stop()
        q.awaitTermination(30)
    finally:
        import shutil

        shutil.rmtree(ckpt, ignore_errors=True)
    done = [
        p for p in progresses
        if p.get("numInputRows", 0) > 0 and "processedRowsPerSecond" in p
    ]
    rates = [p["processedRowsPerSecond"] for p in done[1:]] or [0.0]
    batch_ms = [
        p.get("durationMs", {}).get("triggerExecution", 0) for p in done
    ] or [0]
    state = 0
    for p in reversed(done):
        ops = p.get("stateOperators") or []
        if ops:
            state = sum(op.get("numRowsTotal", 0) for op in ops)
            break
    return {
        "rows_per_sec": round(statistics.median(rates)),
        "max_batch_ms": max(batch_ms),
        "n_batches": len(done),
        "input_rows": sum(p.get("numInputRows", 0) for p in done),
        "state_rows": state,
    }


def main() -> None:
    from projet5_spark.streaming.windows import (
        streaming_dedup,
        streaming_tumbling_stats,
    )

    ap = argparse.ArgumentParser()
    ap.add_argument("--rate", type=int, default=500_000)
    ap.add_argument("--secs", type=int, default=30)
    args = ap.parse_args()

    spark = get_spark(app_name="stream-stress")
    spark.sparkContext.setLogLevel("ERROR")
    ensure_utc(spark)

    arms = {
        "tumbling_agg": lambda ev: streaming_tumbling_stats(
            ev, watermark="1 minute"
        ),
        "dedup": lambda ev: streaming_dedup(ev, watermark="1 minute"),
    }
    report = {"rate_rows_per_sec": args.rate, "secs_per_arm": args.secs}
    for name, build in arms.items():
        ev = _rate_events(spark, args.rate)
        report[name] = _run_arm(spark, name, build(ev), args.secs)
        print(f"{name}: {report[name]}", flush=True)
    print(json.dumps(report))


if __name__ == "__main__":
    main()
