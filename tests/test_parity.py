"""Reference-parity tests (SURVEY.md §5.2): the healthcare pipeline and
the two scalar functions the reference left untested
(migration.py:51-63, :65-78), plus writer semantics (R14-R16)."""

from __future__ import annotations

import random

import pytest
from pyspark.sql import Row
from pyspark.sql import functions as F

from projet5_spark.functions.dates import parse_date
from projet5_spark.functions.strings import normalize_name, title_case
from projet5_spark.plans.healthcare import (
    ADMISSION_KEY,
    PATIENT_KEY,
    duplicate_patients_check,
    healthcare_pipeline,
)
from projet5_spark.sources.writers import append_if_absent, write_parquet

# -- scalar parity ----------------------------------------------------------

TITLE_CASES = [
    "bobby JACKSON",
    "  leslie terRY ",
    "o'brien",
    "smith-jones",
    "d'angelo-o'neil",
    "mc donald   jr.",
    "3rd street kid",
    "",
    "a",
    "ñoño gürel-ève",
    "x" * 50,
    "jean-luc de la croix",
]


def test_title_case_matches_python(spark):
    """title_case must equal Python str.title() — the §7.4.1 trap that
    initcap gets wrong on internal punctuation."""
    df = spark.createDataFrame([(s,) for s in TITLE_CASES], ["s"])
    got = {r["s"]: r["t"] for r in df.select("s", title_case("s").alias("t")).collect()}
    for s in TITLE_CASES:
        assert got[s] == s.title(), f"{s!r}: {got[s]!r} != {s.title()!r}"


def test_title_case_random_strings(spark):
    rng = random.Random(42)
    alphabet = "abc XY-'3é "
    cases = [
        "".join(rng.choice(alphabet) for _ in range(rng.randint(0, 30)))
        for _ in range(300)
    ]
    df = spark.createDataFrame([(s,) for s in cases], ["s"])
    got = [r["t"] for r in df.select("s", title_case("s").alias("t")).collect()]
    want = [r["s"].title() for r in df.select("s").collect()]
    assert got == want


def test_normalize_name_null_and_trim(spark):
    df = spark.createDataFrame(
        [Row(s="  ada lovelace "), Row(s=None), Row(s="O'BRIEN")]
    )
    out = [r["n"] for r in df.select(normalize_name("s").alias("n")).collect()]
    assert out == ["Ada Lovelace", None, "O'Brien"]


def test_parse_date_iso_and_garbage(spark):
    df = spark.createDataFrame(
        [("2024-01-31",), ("not a date",), (None,)], ["s"]
    )
    out = [r["d"] for r in df.select(parse_date("s").alias("d")).collect()]
    assert str(out[0]) == "2024-01-31" and out[1] is None and out[2] is None


# -- healthcare fixture + pipeline ------------------------------------------


def _healthcare_rows():
    """Deterministic fixture with the §A-required properties: exact
    duplicates, multi-admission patients, admission-key collisions with
    differing non-key fields, and nulls."""
    rng = random.Random(7)
    names = ["bobby JacksOn", " leslie terRY", "o'brien", "smith-jones", "ada  lovelace"]
    rows = []
    for i in range(400):
        name = rng.choice(names)
        age = 20 + (hash(name) % 5) * 10
        gender = "Male" if i % 2 else "Female"
        blood = rng.choice(["A+", "O-", "B+"])
        adm = f"2024-{rng.randint(1, 12):02d}-{rng.randint(1, 28):02d}"
        rows.append(
            (
                name,
                age,
                gender,
                blood,
                rng.choice(["Flu", "Asthma"]),
                adm,
                f"Dr {rng.randint(1, 30)}",          # non-key attr varies
                rng.choice(["St Mary", "General"]),
                rng.choice(["Aetna", "Cigna"]),
                round(rng.uniform(100, 9999), 2),
                rng.randint(100, 120),                # few rooms → key collisions
                rng.choice(["Emergency", "Elective"]),
                adm,
                rng.choice(["Ibuprofen", "Aspirin"]),
                rng.choice(["Normal", "Abnormal"]),
            )
        )
    rows += rows[:20]  # exact full-row duplicates (R6/R7)
    rows.append((None, 30, "Male", "A+", "Flu", None, "Dr 1", "General",
                 "Aetna", 1.0, 101, "Emergency", None, "Aspirin", "Normal"))
    return rows


HEALTH_COLS = [
    "Name", "Age", "Gender", "Blood Type", "Medical Condition",
    "Date of Admission", "Doctor", "Hospital", "Insurance Provider",
    "Billing Amount", "Room Number", "Admission Type", "Discharge Date",
    "Medication", "Test Results",
]


@pytest.fixture(scope="module")
def health_raw(spark):
    return spark.createDataFrame(_healthcare_rows(), HEALTH_COLS)


def test_healthcare_pipeline_invariants(spark, health_raw):
    res = healthcare_pipeline(health_raw)

    # R19 flagship invariant: no duplicate patients (test_migration.py:29-34)
    assert duplicate_patients_check(res.patients).count() == 0
    # admissions unique on the natural key (R13)
    dup_adm = (
        res.admissions.groupBy(*ADMISSION_KEY).count().where(F.col("count") > 1)
    )
    assert dup_adm.count() == 0
    # every admission's patient_id resolves to exactly one patient (R12)
    orphans = res.admissions.join(res.patients, "patient_id", "left_anti")
    assert orphans.count() == 0
    # names normalized with exact .title() semantics (R8)
    names = [r["name"] for r in res.patients.select("name").collect() if r["name"]]
    assert all(n == n.strip().title() for n in names)
    assert any("O'Brien" == n for n in names)  # initcap would give O'brien
    # deterministic surrogate keys: re-running yields identical ids (R11)
    res2 = healthcare_pipeline(health_raw)
    ids1 = sorted(r["patient_id"] for r in res.patients.collect())
    ids2 = sorted(r["patient_id"] for r in res2.patients.collect())
    assert ids1 == ids2


def test_healthcare_fused_dedup_parity(spark, health_raw):
    """The fused plan (R7 elided, subsumed by R13 — see
    healthcare_pipeline docstring proof) must produce byte-identical
    patients and admissions to the unfused R7→R13 composition,
    including on planted exact-duplicate rows."""
    # plant exact full-row duplicates so R7 actually has work to do
    dup_raw = health_raw.unionAll(health_raw.limit(3))
    fused = healthcare_pipeline(dup_raw.coalesce(1), fuse_full_row_dedup=True)
    unfused = healthcare_pipeline(dup_raw.coalesce(1), fuse_full_row_dedup=False)
    from collections import Counter

    for a, b in ((fused.patients, unfused.patients), (fused.admissions, unfused.admissions)):
        assert Counter(map(tuple, a.collect())) == Counter(map(tuple, b.collect()))


def test_healthcare_first_seen_wins(spark):
    """R13: the surviving admission row carries the FIRST input row's
    non-key attributes (migration.py:200-202 semantics)."""
    rows = [
        ("ann", 30, "F", "A+", "Flu", "2024-01-01", "Dr FIRST", "General",
         "Aetna", 1.0, 101, "Emergency", "2024-01-02", "Aspirin", "Normal"),
        ("ann", 30, "F", "A+", "Flu", "2024-01-01", "Dr SECOND", "General",
         "Cigna", 2.0, 101, "Elective", "2024-01-03", "Ibuprofen", "Abnormal"),
    ]
    df = spark.createDataFrame(rows, HEALTH_COLS).coalesce(1)
    res = healthcare_pipeline(df)
    adm = res.admissions.collect()
    assert len(adm) == 1
    assert adm[0]["doctor"] == "Dr FIRST"
    assert adm[0]["insurance_provider"] == "Aetna"


# -- writers (R14/R15/R16) --------------------------------------------------


def test_append_if_absent_idempotent(spark, tmp_path):
    path = str(tmp_path / "t")
    df1 = spark.range(0, 10).withColumnRenamed("id", "k")
    assert append_if_absent(spark, df1, path, ["k"]) == 10
    # second run: nothing new
    assert append_if_absent(spark, df1, path, ["k"]) == 0
    # overlapping batch: only the new keys land
    df2 = spark.range(5, 15).withColumnRenamed("id", "k")
    assert append_if_absent(spark, df2, path, ["k"]) == 5
    assert spark.read.parquet(path).count() == 15


def test_write_parquet_partitioned(spark, tmp_path):
    path = str(tmp_path / "p")
    df = spark.createDataFrame(
        [(1, "a", 10.0), (2, "b", 20.0), (3, "a", 30.0)], ["id", "part", "v"]
    )
    write_parquet(df, path, partition_by=["part"], sort_within_by=["v"], desc=True)
    back = spark.read.parquet(path)
    assert back.count() == 3
    # partition pruning surface: reading one partition touches one dir
    assert back.where(F.col("part") == "a").count() == 2
