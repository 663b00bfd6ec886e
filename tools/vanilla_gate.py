"""Stock-session replica of the driver's DuckDB differential gate.

The pytest oracle suite runs under the engine's tuned session
(`projet5_spark.session.get_spark`); the external driver uses a stock
SparkSession. Config-sensitive nondeterminism (e.g. non-total window
orders resolved by physical row order) can pass the tuned suite and
fail only at the driver — this script reproduces the driver's setup
exactly: a fresh stock session in a fresh process, DuckDB side-by-side
at sf0.01, order-insensitive value equality.

Usage:
    python tools/vanilla_gate.py                 # full catalog
    python tools/vanilla_gate.py name1 name2 ... # subset
    python tools/vanilla_gate.py --front         # the _FRONT rotation slice

Run it before every rotation change: round 6 caught
`rle_run_profile_lineitem` (duplicate (l_orderkey, l_linenumber) keys
made the run-boundary window order non-total) two rounds before the
driver would have.
"""

from __future__ import annotations

import os
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)
sys.path.insert(0, os.path.join(REPO, "tests"))


def main() -> int:
    from pyspark.sql import SparkSession

    import __spark_entry__ as entry
    from oracle_harness import duck_connection, compare

    sf_dir = os.environ.get("SPARK_GRAFT_GATE_SF", "/root/testdata/sf0.01")
    spark = (
        SparkSession.builder.master("local[8]")
        .appName("vanilla-gate")
        .getOrCreate()
    )
    spark.sparkContext.setLogLevel("ERROR")
    con = duck_connection(sf_dir)
    queries, oracles = entry.queries(), entry.oracle_sql()

    args = sys.argv[1:]
    if args == ["--front"]:
        names = list(entry._FRONT)
    elif args:
        names = args
    else:
        names = [n for n in queries if n in oracles]

    failures: list[str] = []
    for i, name in enumerate(names, 1):
        if name not in oracles:
            print(f"[{i}/{len(names)}] {name}: SKIP (rows-only)", flush=True)
            continue
        try:
            problems = compare(
                queries[name](spark, sf_dir),
                con.execute(oracles[name]).df(),
                name,
            )
        except Exception as exc:  # noqa: BLE001 — report, keep sweeping
            problems = [f"{name}: EXC {type(exc).__name__}: {str(exc)[:400]}"]
        print(f"[{i}/{len(names)}] {name}: {'FAIL' if problems else 'OK'}", flush=True)
        failures.extend(problems)
    for p in failures:
        print(p[:1500])
    print(f"FAILED: {len(failures)}")
    return 1 if failures else 0


if __name__ == "__main__":
    raise SystemExit(main())
