"""One-off interleaved A/B for the ewma_event_values null-guard form.

Round-8 VERDICT flagged ewma at 1.69 s (CPU sentinel 1.94) vs round-7's
0.86 s (~1.57): ambient explains ~1.2x, not 2x. Hypothesis: the inline
``F.when(w_sum > 0, term_sum/w_sum)`` duplicates the 20-lag w_sum tree
(predicate + divisor) and Catalyst does not CSE across CaseWhen
branches. This times the inline form (round-8 code) against the
bound-once projection form (round-9 code) interleaved in one session,
so ambient cancels.

Usage: python tools/ab_ewma.py
"""

from __future__ import annotations

import os
import statistics
import sys
import time
from functools import reduce

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from projet5_spark.plans.events import WEIGHTS_EWMA, _W_MICRO, _TS_FMT_SPARK, _q, _t
from projet5_spark.plans import QUERIES
from projet5_spark.session import get_spark

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")


def _base(spark: SparkSession):
    ev = _t(spark, SF_DIR, "events")
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    r = ev.select(
        "user_id",
        "event_id",
        "ts",
        "value",
        F.floor(F.col("value") * 1e2 + F.lit(0.5)).cast("long").alias("vc"),
    )
    terms, weights = [], []
    for k, (wk, mk) in enumerate(zip(WEIGHTS_EWMA, _W_MICRO)):
        lv = F.lag("vc", k).over(w) if k else F.col("vc")
        terms.append(
            F.coalesce(F.floor(F.lit(wk) * (lv * F.lit(10000))).cast("long"), F.lit(0))
        )
        weights.append(F.when(lv.isNotNull(), F.lit(mk).cast("long")).otherwise(F.lit(0)))
    return r, reduce(lambda a, b: a + b, terms), reduce(lambda a, b: a + b, weights)


def ewma_inline(spark: SparkSession) -> DataFrame:  # round-8 form
    r, term_sum, w_sum = _base(spark)
    return r.select(
        "user_id",
        "event_id",
        F.date_format("ts", _TS_FMT_SPARK).alias("ts"),
        "value",
        F.when(w_sum > 0, _q(term_sum * F.lit(1.0) / w_sum, 4)).alias("ewma"),
    )


def time_df(mk, runs: int = 5) -> float:
    mk().write.format("noop").mode("overwrite").save()  # warm-up
    samples = []
    for _ in range(runs):
        t0 = time.perf_counter()
        mk().write.format("noop").mode("overwrite").save()
        samples.append(time.perf_counter() - t0)
    return statistics.median(samples)


def main() -> None:
    spark = get_spark(app_name="ab-ewma")
    spark.sparkContext.setLogLevel("ERROR")
    cpu = time_df(lambda: QUERIES["bigram_lm_doc_score"](spark, SF_DIR), runs=3)
    print(f"{cpu:6.2f}  sentinel_cpu")
    # interleave 3 rounds of (inline, bound) so drift cancels
    a_samples, b_samples = [], []
    mk_a = lambda: ewma_inline(spark)  # noqa: E731
    mk_b = lambda: QUERIES["ewma_event_values"](spark, SF_DIR)  # noqa: E731
    mk_a().write.format("noop").mode("overwrite").save()
    mk_b().write.format("noop").mode("overwrite").save()
    for _ in range(5):
        t0 = time.perf_counter()
        mk_a().write.format("noop").mode("overwrite").save()
        a_samples.append(time.perf_counter() - t0)
        t0 = time.perf_counter()
        mk_b().write.format("noop").mode("overwrite").save()
        b_samples.append(time.perf_counter() - t0)
    print(f"{statistics.median(a_samples):6.2f}  ewma_inline (r8 form)")
    print(f"{statistics.median(b_samples):6.2f}  ewma_bound  (r9 form)")
    # sanity: both forms agree exactly
    a = ewma_inline(spark)
    b = QUERIES["ewma_event_values"](spark, SF_DIR)
    diff = a.exceptAll(b).count() + b.exceptAll(a).count()
    print(f"rows_diff={diff}")


if __name__ == "__main__":
    main()
