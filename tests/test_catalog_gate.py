"""Catalog-growth gate (VERDICT r5 task #4).

Round 5's lesson: the builder cleared the round-4 certification backlog
and simultaneously re-created a 2.5x larger one by registering ~125 new
oracle-paired queries in the same round. The driver certifies at most 50
queries per round, so catalog growth without a certification plan turns
the local DuckDB replica into the only evidence for an ever-growing
fraction of the catalog.

This gate makes that failure mode a CI failure:

* every oracle-paired catalog entry must either have a driver-green row
  in some committed ``CORRECTNESS_r*.json`` (err-free sample), or be
  queued for the next driver round in ``__spark_entry__._FRONT``;
* at most 23 entries may be uncertified-and-unqueued (the documented
  round-8 rotation tail; this bound only ever decreases).

``_FRONT`` is computed from the artifacts (never-certified backlog
first, then least-recently-certified); these tests pin that contract so
a regression in the computation — or a hand edit that reintroduces the
stale-rotation failure mode — fails CI. Adding a new battery beyond the
queue budget trips the growth gate.
"""

from __future__ import annotations

import glob
import json
import os

import __spark_entry__ as entry
from projet5_spark.plans import ORACLE, QUERIES

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))

#: Remaining rotation budget: as of round 8 every uncertified
#: oracle-paired entry fits inside the 50-slot driver sample (23
#: backlog + 7 new source-scan/battery queries = 30 queued), so the
#: bound is now 0 and stays there: new batteries may only be added
#: while the whole never-certified set still fits in one round's
#: sample.
MAX_UNCERTIFIED_UNQUEUED = 0


def _driver_certified() -> set[str]:
    names: set[str] = set()
    for path in sorted(glob.glob(os.path.join(REPO, "CORRECTNESS_r*.json"))):
        with open(path) as fh:
            for name, row in json.load(fh).items():
                if isinstance(row, dict) and row.get("err"):
                    continue
                names.add(name)
    return names


def test_every_front_entry_exists_and_is_oracle_paired():
    unknown = [n for n in entry._FRONT if n not in QUERIES]
    assert not unknown, f"_FRONT names not in the catalog: {unknown}"
    unpaired = [n for n in entry._FRONT if n not in ORACLE]
    assert not unpaired, f"_FRONT names without oracle SQL: {unpaired}"


def test_front_is_exactly_the_driver_sample_size():
    # The driver samples 50 queries per round; a shorter _FRONT wastes
    # certification slots, a longer one pushes queued entries past the
    # sample boundary.
    assert len(entry._FRONT) == 50


def test_front_prioritizes_never_certified_queries():
    # Backlog-first contract: every never-certified oracle-paired entry
    # fills a driver slot before any already-certified entry does, in
    # registration order. While the backlog exceeds the 50-slot sample,
    # that means _FRONT IS the first 50 backlog names; afterwards the
    # whole backlog must form a prefix of _FRONT.
    certified = _driver_certified()
    backlog = [n for n in QUERIES if n in ORACLE and n not in certified]
    expected_prefix = backlog[: len(entry._FRONT)]
    assert entry._FRONT[: len(expected_prefix)] == expected_prefix, (
        "certification slots wasted on already driver-green queries "
        "ahead of the never-certified backlog"
    )


def test_front_refill_is_least_recently_certified():
    # Once the backlog is shorter than the sample, the remaining slots
    # must re-certify the stalest driver rows (oldest round first) so
    # every entry keeps a rolling driver-green record.
    certified = _driver_certified()
    backlog = {n for n in QUERIES if n in ORACLE and n not in certified}
    refill = [n for n in entry._FRONT if n not in backlog]
    rounds = entry._certified_rounds()
    assert refill == sorted(refill, key=lambda n: rounds[n]) and all(
        n in certified for n in refill
    )


def test_catalog_growth_is_gated_on_certification():
    certified = _driver_certified()
    uncertified = [n for n in QUERIES if n in ORACLE and n not in certified]
    unqueued = [n for n in uncertified if n not in set(entry._FRONT)]
    assert len(unqueued) <= MAX_UNCERTIFIED_UNQUEUED, (
        f"{len(unqueued)} oracle-paired queries are neither "
        f"driver-certified nor queued in _FRONT (max "
        f"{MAX_UNCERTIFIED_UNQUEUED}). Do not register new batteries "
        f"until the certification backlog drains; overflow: "
        f"{unqueued[MAX_UNCERTIFIED_UNQUEUED:]}"
    )
