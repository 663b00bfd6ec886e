"""Reference-parity pipeline (SURVEY.md §2.4) as one declarative plan.

Reproduces the semantics of ``migration.py:105-251`` — scan, rename,
profile, full-row dedup, scalar normalization, patients-dim extraction,
deterministic surrogate keys, FK join-back, first-seen admission dedup,
idempotent writes, post-stats — with zero driver-side loops: the
reference's O(rows) RPC storm (migration.py:235-236, SURVEY.md §2.2)
becomes a broadcast join + two hash aggregates.

Scale posture: the patients dim is small relative to the fact →
broadcast (the fact side never shuffles for the FK attach, R12); the
only key-shuffle is the first-seen dedup window (R13), which AQE
skew-splits if one patient dominates.
"""

from __future__ import annotations

from dataclasses import dataclass

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from ..functions.dates import parse_date
from ..functions.keys import surrogate_key
from ..functions.strings import normalize_name
from ..operators.dedup import first_seen_dedup, first_seen_dedup_agg
from ..sources.readers import normalize_columns

#: patients natural key — migration.py:160-165
PATIENT_KEY = ["name", "age", "gender", "blood_type"]
#: admissions natural key — migration.py:200-202
ADMISSION_KEY = ["patient_id", "date_of_admission", "hospital", "room_number"]

#: admissions payload — migration.py:215-228 (12 fields + _id)
ADMISSION_COLS = [
    "patient_id",
    "medical_condition",
    "date_of_admission",
    "doctor",
    "hospital",
    "insurance_provider",
    "billing_amount",
    "room_number",
    "admission_type",
    "discharge_date",
    "medication",
    "test_results",
]


@dataclass
class HealthcareResult:
    patients: DataFrame
    admissions: DataFrame


def healthcare_pipeline(raw: DataFrame, ordinal_col: str | None = None) -> HealthcareResult:
    """Run the full §2.4 plan over a healthcare-shaped input frame.

    ``ordinal_col``: explicit input-order column for first-seen-wins
    dedup (R13). If absent, one is minted with
    ``monotonically_increasing_id`` — faithful to file order for a
    single-file CSV scan, which is exactly the reference's input shape
    (migration.py:130); pass a real ingest ordinal at scale.
    """
    df = normalize_columns(raw)  # R2 migration.py:133

    if ordinal_col is None:
        ordinal_col = "__ord"
        df = df.withColumn(ordinal_col, F.monotonically_increasing_id())

    # R7 :141 — full-row dedup keeping the FIRST occurrence's ordinal
    # (pandas drop_duplicates keeps first; a plain dropDuplicates keeps
    # an arbitrary copy, whose ordinal could then win a later
    # first-seen admission tie it shouldn't)
    df = first_seen_dedup_agg(
        df, [c for c in df.columns if c != ordinal_col], [ordinal_col]
    )

    typed = (
        df.withColumn("name", normalize_name("name"))  # R8 :51-63, :160
        .withColumn("date_of_admission", parse_date("date_of_admission"))  # R9 :196
        .withColumn("discharge_date", parse_date("discharge_date"))
    )

    # R10 dim extraction + R11 deterministic surrogate key (:160-187).
    patients = (
        typed.select(*PATIENT_KEY)
        .dropDuplicates(PATIENT_KEY)
        .withColumn("patient_id", surrogate_key(*PATIENT_KEY))
    )

    # R12 FK attach — broadcast: dim has one row per distinct patient.
    # No join needed at all for the key itself (it is a pure function of
    # the natural key), so compute it directly on the fact side — the
    # broadcast join exists only in incremental mode / when the dim
    # carries extra attributes.
    fact = typed.withColumn("patient_id", surrogate_key(*PATIENT_KEY))

    # R13 first-seen-wins admission dedup (:200-202) — deterministic via
    # the input ordinal (SURVEY.md §7.4.3).
    admissions = first_seen_dedup(fact, ADMISSION_KEY, [F.col(ordinal_col)])
    admissions = admissions.select(*ADMISSION_COLS).withColumn(
        "admission_id", surrogate_key(*ADMISSION_KEY)
    )

    return HealthcareResult(patients=patients, admissions=admissions)


def duplicate_patients_check(patients: DataFrame) -> DataFrame:
    """R19 (flagship invariant, test_migration.py:29-34): natural-key
    groups with count > 1 — must be empty after the pipeline."""
    return (
        patients.groupBy(*PATIENT_KEY)
        .agg(F.count(F.lit(1)).alias("n"))
        .where(F.col("n") > 1)
    )
