"""R20 instrumentation: AppStatusStore-backed run metrics (the
reference's migration.log counters — migration.py:27-48, :245-251 —
done Spark-natively)."""

from __future__ import annotations

import logging

from pyspark.sql import functions as F

from projet5_spark.instrumentation import (
    run_logged,
    run_stats_summary,
    stage_stats,
)


def _burn(spark):
    """One job with a real shuffle so stage metrics are non-trivial."""
    return (
        spark.range(0, 200_000)
        .select((F.col("id") % 13).alias("k"))
        .groupBy("k")
        .count()
        .count()
    )


def test_stage_stats_dataframe(spark):
    _burn(spark)
    df = stage_stats(spark)
    rows = df.collect()
    assert len(rows) > 0
    cols = set(df.columns)
    assert {"stage_id", "status", "num_tasks", "shuffle_read_bytes",
            "shuffle_write_bytes", "executor_run_time_ms"} <= cols
    done = [r for r in rows if r["status"] == "COMPLETE"]
    assert done and all(r["num_tasks"] > 0 for r in done)
    # the groupBy shuffled: some completed stage wrote shuffle bytes
    assert any(r["shuffle_write_bytes"] > 0 for r in done)


def test_run_stats_summary_totals(spark):
    before = run_stats_summary(spark)
    _burn(spark)
    after = run_stats_summary(spark)
    assert after["num_stages"] > before["num_stages"]
    assert after["num_complete_tasks"] > before["num_complete_tasks"]
    assert after["shuffle_write_bytes"] >= before["shuffle_write_bytes"]


def test_run_logged_banner_and_deltas(spark, caplog):
    # the run logger sets propagate=False (no double-printing under a
    # configured root logger), so attach caplog's handler directly
    logger = logging.getLogger("projet5_spark.run")
    logger.addHandler(caplog.handler)
    try:
        with caplog.at_level(logging.INFO, logger="projet5_spark.run"):
            with run_logged(spark, "unit-run") as report:
                _burn(spark)
    finally:
        logger.removeHandler(caplog.handler)
    assert report.seconds > 0
    # deltas reflect only the block's work
    assert report.delta["num_stages"] >= 2  # shuffle map + reduce
    assert report.delta["num_failed_tasks"] == 0
    assert report.delta["shuffle_write_bytes"] > 0
    text = caplog.text
    assert "=== unit-run start ===" in text
    assert "=== unit-run end (" in text and "seconds) ===" in text


def test_run_logged_file_handler(spark, tmp_path):
    with run_logged(spark, "file-run", log_dir=str(tmp_path)):
        _burn(spark)
    log = (tmp_path / "run.log").read_text()
    assert "=== file-run end (" in log
    # reference log format: asctime [LEVEL] message
    assert "[INFO]" in log


def test_training_set_selection_shuffles_digests_not_bodies(spark):
    """Empirical enforcement of the dedup doctrine ("the shuffle
    carries the digest, never the body"): the composed training-set
    selection at sf0.001 must shuffle well under 100 KB — a raw-text
    groupBy key would ship the corpus (~15x more). Regression here
    means someone re-keyed the dedup on the body."""
    from projet5_spark.plans import QUERIES

    with run_logged(spark, "shuffle-budget-probe") as rep:
        (
            QUERIES["training_set_selection"](spark, "/root/testdata/sf0.001")
            .write.format("noop")
            .mode("overwrite")
            .save()
        )
        # the status store is fed asynchronously by the listener bus —
        # drain it so the final stage's metrics have landed before the
        # context manager snapshots the after-totals
        spark.sparkContext._jsc.sc().listenerBus().waitUntilEmpty()
    assert 0 < rep.delta["shuffle_write_bytes"] < 100_000, rep.delta


def test_bench_json_is_last_stdout_line():
    """r13 hardening (VERDICT item 8): the bench contract line must be
    the FINAL stdout line even with buffered pre-JSON chatter — the
    r11 driver captured a truncated tail and lost the JSON. Runs the
    emission helper in a subprocess with deliberately unflushed noise
    before it and asserts the last stdout line parses."""
    import json
    import os
    import subprocess
    import sys

    code = """
import sys, os
sys.path.insert(0, %r)
import bench
sys.stdout.write("noise line 1\\n")
sys.stdout.write("partial noise without newline")
sys.stdout.flush()
sys.stdout.write("\\nmore buffered noise\\n")
bench.emit_result_line({"metric": "sum_of_median_query_seconds",
                        "value": 1.23, "unit": "sec",
                        "queries": {"q01_pricing_summary": 1.23},
                        "sf": 0.1})
""" % (
        os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
    )
    out = subprocess.run(
        [sys.executable, "-c", code], capture_output=True, text=True,
        timeout=120,
    )
    assert out.returncode == 0, out.stderr[-2000:]
    lines = out.stdout.rstrip("\n").split("\n")
    parsed = json.loads(lines[-1])  # the LAST line is the contract
    assert parsed["value"] == 1.23
    assert parsed["queries"] == {"q01_pricing_summary": 1.23}
