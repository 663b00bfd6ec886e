"""R20 run instrumentation — the reference's migration.log run metrics
(logger setup migration.py:27-48; end-of-run counts and wall-clock
migration.py:245-251) done Spark-natively.

Where the reference hand-counts Mongo documents and logs elapsed time,
a Spark engine already records every run metric that matters in the
driver's AppStatusStore — the store behind the Web UI and the v1
monitoring REST API: per-stage task counts, executor run/CPU time,
input/output volumes, shuffle read/write bytes, and spills. This module
surfaces that store as

- :func:`stage_stats` — one DataFrame row per stage attempt (the
  engine-level replacement for ad-hoc counters),
- :func:`run_stats_summary` — totals as a plain dict,
- :func:`run_logged` — a context manager that logs a reference-format
  run banner (wall-clock + stage/task/shuffle deltas) around any block.

Reading the status store is a driver-side metadata walk (a few hundred
stage rows even on a 1000-executor job), not a data-path collect; the
numbers aggregate what already happened on the executors. No listener
callback server and no UI requirement — works with spark.ui.enabled
false and in any deploy mode.
"""

from __future__ import annotations

import logging
import os
import time
from contextlib import contextmanager
from dataclasses import dataclass, field

from pyspark.sql import DataFrame, SparkSession

_LOG_FMT = "%(asctime)s [%(levelname)s] %(message)s"  # reference fmt, :41

_STAGE_SCHEMA = (
    "stage_id INT, attempt_id INT, name STRING, status STRING, "
    "num_tasks INT, num_complete_tasks INT, num_failed_tasks INT, "
    "executor_run_time_ms LONG, executor_cpu_time_ns LONG, "
    "input_bytes LONG, input_records LONG, "
    "output_bytes LONG, output_records LONG, "
    "shuffle_read_bytes LONG, shuffle_write_bytes LONG, "
    "memory_bytes_spilled LONG, disk_bytes_spilled LONG"
)

_SUM_FIELDS = (
    "num_tasks",
    "num_complete_tasks",
    "num_failed_tasks",
    "executor_run_time_ms",
    "executor_cpu_time_ns",
    "input_bytes",
    "input_records",
    "output_bytes",
    "output_records",
    "shuffle_read_bytes",
    "shuffle_write_bytes",
    "memory_bytes_spilled",
    "disk_bytes_spilled",
)


def _stage_rows(spark: SparkSession) -> list[tuple]:
    sc = spark.sparkContext
    jvm = sc._jvm
    store = sc._jsc.sc().statusStore()
    stages = store.stageList(
        jvm.java.util.ArrayList(),  # all statuses
        False,  # no task details
        False,  # no summaries
        sc._gateway.new_array(jvm.double, 0),  # no quantiles
        jvm.java.util.ArrayList(),  # all task statuses
    )
    rows = []
    for i in range(stages.size()):
        s = stages.apply(i)
        rows.append(
            (
                s.stageId(),
                s.attemptId(),
                s.name(),
                str(s.status()),
                s.numTasks(),
                s.numCompleteTasks(),
                s.numFailedTasks(),
                s.executorRunTime(),
                s.executorCpuTime(),
                s.inputBytes(),
                s.inputRecords(),
                s.outputBytes(),
                s.outputRecords(),
                s.shuffleReadBytes(),
                s.shuffleWriteBytes(),
                s.memoryBytesSpilled(),
                s.diskBytesSpilled(),
            )
        )
    return rows


def stage_stats(spark: SparkSession) -> DataFrame:
    """Per-stage run metrics of this application so far, as a DataFrame
    (stage id/attempt, status, task counts, run/CPU time, input/output/
    shuffle volumes, spills)."""
    return spark.createDataFrame(_stage_rows(spark), _STAGE_SCHEMA)


def run_stats_summary(spark: SparkSession) -> dict:
    """Application-wide totals of :func:`stage_stats`, plus the stage
    count, as a plain dict (JSON-ready).

    The status store retains at most ``spark.ui.retainedStages``
    entries (default 1000) and evicts the oldest past that, so on very
    long-running applications these are totals over the retained
    window; ``window_truncated`` flags when the store is at capacity
    (the engine session factory raises the retention so bench-scale
    runs stay complete)."""
    rows = _stage_rows(spark)
    # schema field order mirrors _STAGE_SCHEMA: summables start at idx 4
    totals = {f: 0 for f in _SUM_FIELDS}
    for r in rows:
        for f, v in zip(_SUM_FIELDS, r[4:]):
            totals[f] += v
    totals["num_stages"] = len(rows)
    retained = int(spark.sparkContext.getConf().get("spark.ui.retainedStages", "1000"))
    totals["window_truncated"] = len(rows) >= retained
    return totals


def configure_run_logger(log_dir: str | None = None) -> logging.Logger:
    """Reference-parity logger wiring (migration.py:27-48): INFO console
    handler + optional append-mode file handler ``run.log``, shared
    asctime/levelname format. Idempotent per (logger, destination)."""
    logger = logging.getLogger("projet5_spark.run")
    logger.setLevel(logging.DEBUG)
    # own handlers only: without this, a host app with root logging
    # configured (logging.basicConfig, pytest) prints every banner twice
    logger.propagate = False
    fmt = logging.Formatter(_LOG_FMT)
    have = {
        getattr(h, "baseFilename", "<console>")
        for h in logger.handlers
    }
    if "<console>" not in have:
        console = logging.StreamHandler()
        console.setLevel(logging.INFO)
        console.setFormatter(fmt)
        logger.addHandler(console)
    if log_dir is not None:
        path = os.path.abspath(os.path.join(log_dir, "run.log"))
        if path not in have:
            fh = logging.FileHandler(path, mode="a")
            fh.setLevel(logging.INFO)
            fh.setFormatter(fmt)
            logger.addHandler(fh)
    return logger


@dataclass
class RunReport:
    """Filled in when the :func:`run_logged` block exits."""

    name: str
    seconds: float = 0.0
    delta: dict = field(default_factory=dict)


@contextmanager
def run_logged(spark: SparkSession, name: str, log_dir: str | None = None):
    """Log a reference-format run banner around a block of Spark work.

    Emits the start line, then on exit the wall-clock banner
    (``=== <name> end (N.NN seconds) ===`` — migration.py:251) plus the
    stage/task/shuffle DELTAS attributable to the block (status-store
    totals after minus before), so concurrent history doesn't pollute
    the numbers. Yields a :class:`RunReport` the caller can read after
    the block."""
    logger = configure_run_logger(log_dir)
    report = RunReport(name=name)
    before = run_stats_summary(spark)
    logger.info("=== %s start ===", name)
    t0 = time.perf_counter()
    try:
        yield report
    finally:
        report.seconds = time.perf_counter() - t0
        after = run_stats_summary(spark)
        report.delta = {
            k: (after[k] - before.get(k, 0)) if not isinstance(after[k], bool) else after[k]
            for k in after
        }
        # eviction guard: once the store hits its retention cap the
        # after-minus-before arithmetic under-counts (and can go
        # negative) — clamp and say so rather than print wrong numbers
        approx = after.get("window_truncated") or any(
            isinstance(v, int) and not isinstance(v, bool) and v < 0
            for v in report.delta.values()
        )
        if approx:
            report.delta = {
                k: (max(v, 0) if isinstance(v, int) and not isinstance(v, bool) else v)
                for k, v in report.delta.items()
            }
            report.delta["approximate"] = True
            logger.warning(
                "%s: status store hit spark.ui.retainedStages — deltas "
                "are a lower bound over the retained window", name
            )
        logger.info(
            "%s: %d stages, %d tasks (%d failed), "
            "input %d B / output %d B, shuffle read %d B / write %d B, "
            "spilled %d B",
            name,
            report.delta["num_stages"],
            report.delta["num_complete_tasks"],
            report.delta["num_failed_tasks"],
            report.delta["input_bytes"],
            report.delta["output_bytes"],
            report.delta["shuffle_read_bytes"],
            report.delta["shuffle_write_bytes"],
            report.delta["memory_bytes_spilled"] + report.delta["disk_bytes_spilled"],
        )
        logger.info("=== %s end (%.2f seconds) ===", name, report.seconds)
