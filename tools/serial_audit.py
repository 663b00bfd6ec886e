"""Per-query serialization audit: wall-clock vs executor time.

For each named query, runs it once warm and reports wall seconds, total
executor run/CPU seconds (from the R20 status-store instrumentation),
and the effective parallelism ``exec/wall``. A CPU-heavy query whose
ratio sits near 1-4 on a 32-core box is serialized somewhere — the two
usual mechanics on single-row-group fixtures (see SCALING.md "Local-
fixture caveats"):

* a broadcast join never widens its streamed side, so a heavy probe
  inherits the scan's single split unless spread first;
* AQE advisory-size coalescing folds small-BYTES / high-CPU stages to
  1-2 partitions (e.g. a per-pair levenshtein verify behind a few-MB
  candidate exchange).

This is how the round-6 spatial-grid (2.65 -> 0.97 s) and Poisson-
bootstrap (2.14 -> 0.53 s isolated) serializations were found.

Usage::

    python tools/serial_audit.py name1 [name2 ...]
"""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from projet5_spark.instrumentation import stage_stats  # noqa: E402
from projet5_spark.plans import QUERIES  # noqa: E402
from projet5_spark.session import get_spark  # noqa: E402

#: Job group tagging the audit's OWN status-store snapshot collects so
#: they can be excluded by stage id. Name-matching 'collect at' stages
#: would also drop legitimate executor work from queries that collect
#: internally (k-means centroid loop, driver-gated recall metrics),
#: understating exec/wall for exactly the iterative queries under audit.
_META_GROUP = "serial-audit-meta"


def _snapshot(spark) -> dict[int, object]:
    """Status-store rows keyed by stage id, collected under the meta
    group."""
    sc = spark.sparkContext
    sc.setJobGroup(_META_GROUP, "serial_audit status-store snapshot")
    try:
        return {r["stage_id"]: r for r in stage_stats(spark).collect()}
    finally:
        sc.setLocalProperty("spark.jobGroup.id", None)


def _meta_stage_ids(spark) -> set[int]:
    """Stage ids belonging to this audit's own snapshot jobs."""
    tracker = spark.sparkContext.statusTracker()
    ids: set[int] = set()
    for jid in tracker.getJobIdsForGroup(_META_GROUP):
        info = tracker.getJobInfo(jid)
        if info is not None:
            ids.update(info.stageIds)
    return ids


def main() -> None:
    names = sys.argv[1:]
    unknown = [n for n in names if n not in QUERIES]
    if unknown or not names:
        raise SystemExit(f"unknown or missing query names: {unknown}")
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    spark = get_spark(app_name="serial-audit")
    spark.sparkContext.setLogLevel("ERROR")
    print(
        f"{'wall':>6} {'exec_s':>7} {'cpu_s':>6} {'par':>5}  "
        "query   (par = exec/wall; near 1 on many cores = serialized)"
    )
    for n in names:
        q = QUERIES[n](spark, sf_dir)
        q.write.format("noop").mode("overwrite").save()  # warm
        before = _snapshot(spark)
        t0 = time.perf_counter()
        q.write.format("noop").mode("overwrite").save()
        wall = time.perf_counter() - t0
        after = _snapshot(spark)
        skip = set(before) | _meta_stage_ids(spark)
        rows = [r for sid, r in after.items() if sid not in skip]
        ex = sum(r["executor_run_time_ms"] for r in rows) / 1000
        cpu = sum(r["executor_cpu_time_ns"] for r in rows) / 1e9
        print(f"{wall:6.2f} {ex:7.2f} {cpu:6.2f} {ex / wall:5.1f}  {n}")


if __name__ == "__main__":
    main()
