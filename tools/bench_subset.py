"""Time a subset of catalog queries with the bench protocol.

Same execution contract as ``bench.py`` (tuned session, noop-sink
writes, warm-up + median of 3) but for an ad-hoc list of query names —
the iteration loop for per-query optimization without paying the full
200-query run. Always prints the q01 sentinel first so a reading can be
ambient-normalized against ``BENCH.json``'s recorded sentinels.

Usage::

    python tools/bench_subset.py name1 [name2 ...]
    SPARK_GRAFT_SF_DIR=/root/testdata/sf0.01 python tools/bench_subset.py name1
"""

from __future__ import annotations

import gc
import os
import statistics
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from projet5_spark.plans import QUERIES  # noqa: E402
from projet5_spark.session import get_spark  # noqa: E402


def time_query(spark, name: str, sf_dir: str, runs: int = 3) -> float:
    fn = QUERIES[name]
    fn(spark, sf_dir).write.format("noop").mode("overwrite").save()  # warm-up
    samples = []
    for _ in range(runs):
        t0 = time.perf_counter()
        fn(spark, sf_dir).write.format("noop").mode("overwrite").save()
        samples.append(time.perf_counter() - t0)
    gc.collect()
    return statistics.median(samples)


def main() -> None:
    names = sys.argv[1:]
    unknown = [n for n in names if n not in QUERIES]
    if unknown or not names:
        raise SystemExit(f"unknown or missing query names: {unknown}")
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    spark = get_spark(app_name="bench-subset")
    spark.sparkContext.setLogLevel("ERROR")
    print(f"{time_query(spark, 'q01_pricing_summary', sf_dir):6.2f}  sentinel_q01")
    # CPU-bound sentinel (bench.py SENTINEL_CPU): q01 alone is
    # scheduling-floor-dominated and misses compute-headroom drift
    print(f"{time_query(spark, 'bigram_lm_doc_score', sf_dir):6.2f}  sentinel_cpu")
    for n in names:
        print(f"{time_query(spark, n, sf_dir):6.2f}  {n}")


if __name__ == "__main__":
    main()
