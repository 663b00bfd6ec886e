"""Integrity of the scale-up synthesis (tools/scale_stress.py): the
harness's linearity claims are what make its x100 measurements mean
anything, so they are pinned here on tiny multiples of sf0.001.

- facts mode: entity counts scale by N and JOIN CARDINALITY scales by
  N (not N² — the failure mode of naive row duplication, which
  multiplies matches per key);
- documents mode: corpus scales by N, exact-dup mass scales by N, and
  replicas are pairwise text-disjoint (the per-token rename), so
  near-dup pair mass cannot grow quadratically.
"""

from __future__ import annotations

import importlib.util
import os

import pytest
from pyspark.sql import functions as F

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
BASE = "/root/testdata/sf0.001"


@pytest.fixture(scope="module")
def ss(request):
    spec = importlib.util.spec_from_file_location(
        "scale_stress", os.path.join(REPO, "tools", "scale_stress.py")
    )
    mod = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(mod)
    mod.BASE_SF = BASE
    return mod


def _dup_mass(df):
    return (
        df.groupBy("text")
        .agg(F.count(F.lit(1)).alias("n"))
        .where(F.col("n") > 1)
        .agg(F.coalesce(F.sum(F.col("n") - 1), F.lit(0)))
        .first()[0]
    )


def test_facts_synthesis_scales_join_cardinality_linearly(spark, ss, tmp_path):
    out = str(tmp_path / "x2")
    ss.synthesize(spark, 2, out)
    b_orders = spark.read.parquet(f"{BASE}/orders.parquet")
    b_li = spark.read.parquet(f"{BASE}/lineitem.parquet")
    s_orders = spark.read.parquet(f"{out}/orders.parquet")
    s_li = spark.read.parquet(f"{out}/lineitem.parquet")
    assert s_orders.count() == 2 * b_orders.count()
    assert s_li.count() == 2 * b_li.count()
    # the linearity claim: fact⋈fact matches scale by N, not N²
    b_join = b_li.join(
        b_orders, b_li.l_orderkey == b_orders.o_orderkey
    ).count()
    s_join = s_li.join(
        s_orders, s_li.l_orderkey == s_orders.o_orderkey
    ).count()
    assert s_join == 2 * b_join
    # replica key spaces are disjoint (shift unit covers the domain)
    unit = b_orders.agg(F.max("o_orderkey")).first()[0] + 1
    lo = s_orders.where(F.col("o_orderkey") < unit).count()
    assert lo == b_orders.count()
    # fixed dims are copied, not scaled
    assert (
        spark.read.parquet(f"{out}/nation.parquet").count()
        == spark.read.parquet(f"{BASE}/nation.parquet").count()
    )


def test_docs_synthesis_scales_dup_mass_linearly(spark, ss, tmp_path):
    out = str(tmp_path / "docs_x3")
    ss.synthesize_docs(spark, 3, out)
    base = spark.read.parquet(f"{BASE}/documents.parquet")
    scaled = spark.read.parquet(f"{out}/documents.parquet")
    n = base.count()
    assert scaled.count() == 3 * n
    assert scaled.select("doc_id").distinct().count() == 3 * n
    # exact-dup mass is linear: within-replica structure preserved,
    # zero cross-replica text collisions (bijective per-token rename)
    assert _dup_mass(scaled) == 3 * _dup_mass(base)
    # n_chars stays consistent with the rewritten text
    bad = scaled.where(F.length("text") != F.col("n_chars")).count()
    assert bad == 0
    # every replica-1 token carries the replica suffix (spot-check one
    # non-empty doc): disjoint token spaces across replicas
    unit = base.agg(F.max("doc_id")).first()[0] + 1
    r1 = (
        scaled.where(
            (F.col("doc_id") >= unit)
            & (F.col("doc_id") < 2 * unit)
            & (F.length("text") > 0)
        )
        .select(F.explode(F.split("text", " ")).alias("t"))
        .limit(200)
    )
    assert r1.where(~F.col("t").endswith("q1")).count() == 0
