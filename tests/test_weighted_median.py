"""Adversarial correctness for the two-level weighted-median pick
(plans/analytics15.py::weighted_median_pick).

The two-level algorithm (bin-level locator + within-median-bin scan)
must equal the one-pass definition — smallest value whose cumulative
weight w reaches half the group total — on exactly the distributions
where a binning bug would hide:

* the half-total crossing landing ON a bin boundary (prev_cum*2 == tw
  must select the NEXT bin, not two bins or none);
* all weight concentrated in one value / one bin;
* even totals where 2*cw == tw exactly (lower-median tie);
* random value tables spanning many bins, cross-checked against a
  pandas reference, at several bin widths including degenerate ones
  (bin_w=1: every value its own bin; bin_w huge: one bin total).
"""

from __future__ import annotations

import random

from projet5_spark.plans.analytics15 import weighted_median_pick


def _reference(rows):
    """Pandas-free reference: lower weighted median per flag."""
    by_flag = {}
    for flag, cents, wv in rows:
        by_flag.setdefault(flag, {})
        by_flag[flag][cents] = by_flag[flag].get(cents, 0) + wv
    out = {}
    for flag, vals in by_flag.items():
        tw = sum(vals.values())
        cum = 0
        for cents in sorted(vals):
            cum += vals[cents]
            if 2 * cum >= tw:
                out[flag] = (tw, cents)
                break
    return out


def _run(spark, rows, bin_w):
    g = spark.createDataFrame(rows, "flag string, cents long, wv long")
    got = {
        r["flag"]: (r["total_weight"], r["wmedian_centi"])
        for r in weighted_median_pick(g, bin_w=bin_w).collect()
    }
    assert got == _reference(rows), (bin_w, rows[:10])


def test_crossing_on_bin_boundary(spark):
    # bin_w=10: values 5 and 15 sit in bins 0 and 1 with equal weight.
    # prev_cum*2 == tw at the bin-1 edge: the lower median is 5 (bin 0
    # reaches exactly half), so bin 0 must be selected, alone.
    _run(spark, [("A", 5, 2), ("A", 15, 2)], bin_w=10)
    # asymmetric: crossing strictly inside bin 1
    _run(spark, [("B", 5, 1), ("B", 15, 3)], bin_w=10)
    # crossing at the very first value of bin 1
    _run(spark, [("C", 9, 2), ("C", 10, 2), ("C", 11, 2)], bin_w=10)


def test_single_value_and_single_bin(spark):
    _run(spark, [("A", 7, 100)], bin_w=10)
    _run(spark, [("A", 1, 1), ("A", 2, 1), ("A", 3, 1)], bin_w=1_000_000)


def test_lower_median_tie_even_total(spark):
    # tw=4, values 1..4 each weight 1: cum at 2 is 2, 2*2 >= 4 -> 2
    _run(spark, [("A", v, 1) for v in (1, 2, 3, 4)], bin_w=2)


def test_multi_flag_independence(spark):
    rows = [("A", 5, 2), ("A", 15, 2), ("B", 100, 1), ("B", 1, 9)]
    _run(spark, rows, bin_w=10)


def test_random_tables_match_reference(spark):
    rng = random.Random(20260814)
    for trial in range(4):
        rows = []
        for flag in ("A", "B", "C"):
            n = rng.randint(1, 60)
            for _ in range(n):
                rows.append(
                    (flag, rng.randint(0, 5000), rng.randint(1, 50))
                )
        for bin_w in (1, 7, 100, 10_000):
            _run(spark, rows, bin_w=bin_w)
