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
* at most 75 entries may be uncertified-and-unqueued (the documented
  round-7/8 rotation tail, which shrinks by ~50 per round).

Adding a new battery without adding it to ``_FRONT`` (or without first
draining the queue) trips the gate.
"""

from __future__ import annotations

import glob
import json
import os

import __spark_entry__ as entry
from projet5_spark.plans import ORACLE, QUERIES

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))

#: Remaining rotation budget: round-7 (50) + round-8 (23) slices are
#: documented by name in __spark_entry__._FRONT's trailing comment and
#: drain at ~50/round. Must only ever decrease until it reaches 0.
MAX_UNCERTIFIED_UNQUEUED = 75


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
    certified = _driver_certified()
    stale = [n for n in entry._FRONT if n in certified]
    assert not stale, (
        "certification slots wasted on already driver-green queries: "
        f"{stale}"
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
