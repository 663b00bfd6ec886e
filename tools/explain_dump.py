"""Dump `.explain("formatted")` for catalog queries to plans/<tag>/.

Optimization-round evidence harness (guide §1): captures the formatted
physical plan for each named query (default: every catalog entry) into
``plans/<tag>/<query>_<suffix>.txt`` so plan-shape claims (Exchange
count, join strategy, PushedFilters, BatchEvalPython) are auditable
without running Spark.

Caveat: queries that execute work at BUILD time (streaming availableNow
replays, iterative loops that converge before returning, eager
localCheckpoints) materialize during capture; their dumped plan is the
post-materialization leaf plan, annotated as such.

Usage::

    python tools/explain_dump.py --tag r12 --suffix before [name ...]
"""

from __future__ import annotations

import argparse
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import gc  # noqa: E402

from projet5_spark.operators.materialize import (  # noqa: E402
    release_persistent_rdds,
    sweep_checkpoint_scratch,
)
from projet5_spark.plans import QUERIES  # noqa: E402
from projet5_spark.session import get_spark  # noqa: E402


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--tag", default="r12")
    ap.add_argument("--suffix", default="before")
    ap.add_argument("--sf-dir", default=os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1"))
    ap.add_argument("names", nargs="*")
    args = ap.parse_args()

    names = args.names or list(QUERIES)
    unknown = [n for n in names if n not in QUERIES]
    if unknown:
        raise SystemExit(f"unknown query names: {unknown}")

    out_dir = os.path.join(
        os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
        "plans",
        args.tag,
    )
    os.makedirs(out_dir, exist_ok=True)

    spark = get_spark(app_name="explain-dump")
    spark.sparkContext.setLogLevel("ERROR")
    t0 = time.time()
    for i, name in enumerate(names):
        path = os.path.join(out_dir, f"{name}_{args.suffix}.txt")
        df = None
        try:
            df = QUERIES[name](spark, args.sf_dir)
            plan = df._sc._jvm.PythonSQLUtils.explainString(
                df._jdf.queryExecution(), "formatted"
            )
        except Exception as exc:  # noqa: BLE001 — record, keep dumping
            plan = f"EXPLAIN FAILED: {type(exc).__name__}: {exc}\n"
        with open(path, "w") as fh:
            fh.write(plan)
        # eager queries (localCheckpoint pivots, loop convergence,
        # availableNow replays) materialize during capture — release
        # their blocks/scratch so a whole-catalog dump stays flat
        df = None
        gc.collect()
        release_persistent_rdds(spark)
        sweep_checkpoint_scratch(spark)
        if (i + 1) % 25 == 0:
            print(f"{i + 1}/{len(names)} ({time.time() - t0:.0f}s)", flush=True)
    print(f"done: {len(names)} plans -> {out_dir} ({time.time() - t0:.0f}s)")
    spark.stop()


if __name__ == "__main__":
    main()
