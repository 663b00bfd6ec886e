"""Plan-shape parser unit tests (no Spark): pinned against committed
r12 dump files so the whole-catalog plan-diff gate's counting can't
silently drift."""

from __future__ import annotations

import os
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, os.path.join(REPO, "tools"))

from plan_shape import diff_shapes, shape_counts  # noqa: E402


def _read(rel):
    with open(os.path.join(REPO, rel)) as fh:
        return fh.read()


def test_shape_counts_match_r12_documented_deltas():
    before = shape_counts(_read("plans/r12/ngram_jaccard_near_dup_before.txt"))
    after = shape_counts(_read("plans/r12/ngram_jaccard_near_dup_after.txt"))
    # the r12 optimization notes record 616 -> 321 nodes for this query
    assert before["nodes"] == 616 and after["nodes"] == 321
    assert before["scans"] == 42 and after["scans"] == 12
    assert before["exchanges"] == 91 and after["exchanges"] == 44
    assert before["joins"]["BroadcastHashJoin"] == 22
    assert before["python"] == 0


def test_shape_counts_failed_plan():
    got = shape_counts("EXPLAIN FAILED: ValueError: boom\n")
    assert got == {"failed": "EXPLAIN FAILED: ValueError: boom"}


def test_diff_shapes_reports_changes_and_appearances():
    a = {"q1": {"nodes": 3}, "q2": {"nodes": 5}}
    b = {"q1": {"nodes": 3}, "q2": {"nodes": 6}, "q3": {"nodes": 1}}
    d = diff_shapes(a, b)
    assert set(d) == {"q2", "q3"}
    assert d["q2"] == ({"nodes": 5}, {"nodes": 6})
    assert d["q3"] == (None, {"nodes": 1})
