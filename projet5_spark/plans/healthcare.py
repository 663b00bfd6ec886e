"""Reference-parity pipeline (SURVEY.md §2.4) as one declarative plan.

Reproduces the semantics of ``migration.py:105-251`` — scan, rename,
profile, full-row dedup, scalar normalization, patients-dim extraction,
deterministic surrogate keys, FK join-back, first-seen admission dedup,
idempotent writes, post-stats — with zero driver-side loops: the
reference's O(rows) RPC storm (migration.py:235-236, SURVEY.md §2.2)
becomes a broadcast join + two hash aggregates.

Scale posture: the patients dim is small relative to the fact →
broadcast (the fact side never shuffles for the FK attach, R12); the
only key-shuffle is the first-seen dedup window (R13) — the standalone
R7 full-row dedup shuffle is elided by default because R13 provably
subsumes it (``healthcare_pipeline`` docstring proof) — issued at
pinned width so AQE's advisory-size coalescing cannot serialize the
sort/row_number/sha256 stage. Key skew is bounded by construction:
the dedup key is the four-column admission grain (patient, date,
hospital, room), far finer than any single hot patient.
"""

from __future__ import annotations

from dataclasses import dataclass

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from ..functions.dates import parse_date
from ..functions.keys import surrogate_key, tuple_digest
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


def healthcare_pipeline(
    raw: DataFrame,
    ordinal_col: str | None = None,
    fuse_full_row_dedup: bool = True,
) -> HealthcareResult:
    """Run the full §2.4 plan over a healthcare-shaped input frame.

    ``ordinal_col``: explicit input-order column for first-seen-wins
    dedup (R13). If absent, one is minted with
    ``monotonically_increasing_id`` — faithful to file order for a
    single-file CSV scan, which is exactly the reference's input shape
    (migration.py:130); pass a real ingest ordinal at scale.

    ``fuse_full_row_dedup`` (default True): skip the standalone R7
    full-row dedup aggregate — its effect on the admissions output is
    PROVABLY subsumed by the R13 first-seen admission dedup, so fusing
    removes one full-width fact shuffle from the composed plan.

    Proof of R13∘R7 ≡ R13: R7 groups on every non-ordinal column and
    keeps the min-ordinal row per group. Rows identical in all
    non-ordinal columns derive identical admission keys (patient_id is
    a pure function of the patient natural key; date/hospital/room are
    themselves row columns), so each R7 group lies inside one R13
    group. Let r* be the min-ordinal row of an R13 group. Any row that
    would out-rank r* in R7's group (identical full row, smaller
    ordinal) would also lie in r*'s R13 group with a smaller ordinal —
    contradicting r*'s minimality — so R7 always keeps r*, and R13
    picks r* with or without the R7 pass. The patients dim is built
    from the pre-dedup frame either way (its distinct is over the
    natural key, which full-row dedup cannot change). Parity is pinned
    by tests/test_parity.py::test_healthcare_fused_dedup_parity.
    """
    df = normalize_columns(raw)  # R2 migration.py:133

    if ordinal_col is None:
        ordinal_col = "__ord"
        df = df.withColumn(ordinal_col, F.monotonically_increasing_id())

    # R7 :141 — full-row dedup keeping the FIRST occurrence's ordinal
    # (pandas drop_duplicates keeps first; a plain dropDuplicates keeps
    # an arbitrary copy, whose ordinal could then win a later
    # first-seen admission tie it shouldn't). With fusion (default) the
    # stage is elided — see the subsumption proof in the docstring.
    pre_dedup = df
    if not fuse_full_row_dedup:
        # float_keys_canonical: the only float column is the billing
        # amount — a positive money decimal on every source this
        # pipeline mirrors (reference CSV parse, parquet fixtures) — so
        # -0.0/NaN cannot occur and the full-row fast path (plain hash
        # aggregate, r4 perf win) remains byte-safe
        df = first_seen_dedup_agg(
            df,
            [c for c in df.columns if c != ordinal_col],
            [ordinal_col],
            float_keys_canonical=True,
        )

    typed = (
        df.withColumn("date_of_admission", parse_date("date_of_admission"))  # R9 :196
        .withColumn("discharge_date", parse_date("discharge_date"))
    )

    # R8 normalization + R10 dim extraction + R11 surrogate key, all
    # DIM-SIDE: title_case is a regex-split + interpreted transform, so
    # evaluating it per distinct patient tuple (hundreds) instead of
    # per fact row (everything) is a ~fact/dim-ratio saving — and the
    # result is identical because the normalized name (hence the key)
    # is a pure function of the raw natural-key tuple. Two raw variants
    # that normalize to the same name collapse in the post-normalize
    # dedup exactly as the per-row form's dim dedup did.
    #
    # The distinct comes off the frame captured BEFORE the R7 dedup:
    # full-row dedup only removes duplicate rows, so the distinct
    # natural-key set is identical — and this branch then costs a
    # column-pruned scan, not a second evaluation of the R7 dedup
    # aggregate (Spark does not reuse the exchange between the fact
    # and key_map subtrees).
    dim_raw = pre_dedup.select(*PATIENT_KEY).dropDuplicates(PATIENT_KEY)
    dim_norm = dim_raw.select(
        *[F.col(c).alias(f"__raw_{c}") for c in PATIENT_KEY],
        normalize_name("name").alias("name"),
        *[F.col(c) for c in PATIENT_KEY if c != "name"],
    ).withColumn("patient_id", surrogate_key(*PATIENT_KEY))
    patients = dim_norm.select(*PATIENT_KEY, "patient_id").dropDuplicates(
        PATIENT_KEY
    )

    # R12 FK attach — broadcast of the (raw key → patient_id) map; the
    # fact side never evaluates the normalizer. Both sides join on one
    # injective 32-byte digest of the raw tuple (tuple_digest encodes
    # NULL distinctly, so plain equality ≡ the 4-column null-safe
    # conjunction this replaces): the broadcast hash table keys on 32
    # bytes instead of four string/int comparisons per probe, and the
    # map is still 1:1 because dim_raw is distinct on the raw tuple.
    key_map = dim_norm.select(
        tuple_digest(*[f"__raw_{c}" for c in PATIENT_KEY]).alias("__pk"),
        "patient_id",
    )
    fact = (
        typed.withColumn("__pk", tuple_digest(*PATIENT_KEY))
        .join(F.broadcast(key_map), "__pk")
        .drop("__pk")
    )

    # R13 first-seen-wins admission dedup (:200-202) — deterministic via
    # the input ordinal (SURVEY.md §7.4.3). The window form compiles to
    # WindowGroupLimit, which already prunes to top-1 per key below the
    # shuffle — measured equal to the min_by-aggregate variant here.
    # Explicit hash repartition on the dedup keys supplies the window's
    # required distribution at full width: the window's own exchange is
    # few-MB at fixture scale, so AQE advisory-size coalescing would
    # fold the sort + row_number + admission_id sha256 onto 1-2 tasks
    # (the round-6 SymSpell serialization mechanic, SCALING.md
    # "Local-fixture caveats"); a user-specified repartition is exempt
    # from coalescing and any hash partitioning on the keys satisfies
    # the window's ClusteredDistribution, so no second exchange is
    # added.
    spark = fact.sparkSession
    try:
        n_wide = int(spark.conf.get("spark.sql.shuffle.partitions"))
    except Exception:  # e.g. conf set to "auto" under AQE
        n_wide = spark.sparkContext.defaultParallelism
    admissions = first_seen_dedup(
        fact.repartition(n_wide, *ADMISSION_KEY), ADMISSION_KEY, [F.col(ordinal_col)]
    )
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


# ---------------------------------------------------------------------------
# Driver-facing registrations (SURVEY.md §7.1 flagship): the composed
# reference-parity pipeline run over a healthcare-shaped frame DERIVED
# deterministically from the `orders` fixture, so the DuckDB oracle can
# mirror the derivation and the full composition is hash-checked by the
# correctness gate — not just each Rn in isolation.
#
# Derivation (every attribute a pure function of order columns, mirrored
# 1:1 in the oracle SQL):
#   pid   = o_custkey % 400      → 400 distinct patients, ~4 customers
#                                  collapse onto each (planted R10 dupes)
#   name  = '  pAtIeNt 00NNN mC-D  '  → messy case/whitespace/punctuation
#                                  so R8 title-case parity actually bites
#                                  (initcap would get 'mc-5' wrong)
#   admission date = month-truncated o_orderdate → coarse enough that
#                                  distinct orders collide on the R13
#                                  admission key (~1.3k dup rows at
#                                  sf0.01), exercising first-seen-wins
#   ordinal = o_orderkey         → explicit, engine-independent input
#                                  order (SURVEY.md §7.4.3)
# ---------------------------------------------------------------------------

from .registry import query, quantize as _q  # noqa: E402

BLOOD_TYPES = ["A+", "A-", "B+", "B-", "AB+", "AB-", "O+", "O-"]
CONDITIONS = ["diabetes", "hypertension", "asthma", "arthritis", "cancer", "obesity"]
HOSPITALS = ["general hospital", "st mary", "unity clinic"]
INSURERS = ["aetna", "cigna", "medicare", "unitedhealth"]
MEDICATIONS = ["aspirin", "ibuprofen", "paracetamol", "penicillin", "lipitor"]
ADMISSION_TYPES = ["Emergency", "Elective", "Urgent"]
TEST_RESULTS = ["Normal", "Abnormal", "Inconclusive"]


def _pick_sql(options: list[str], idx_sql: str) -> str:
    """1-based element_at over a literal array; ``idx_sql`` is 0-based."""
    arr = "array(" + ", ".join(f"'{x}'" for x in options) + ")"
    return f"element_at({arr}, cast(({idx_sql}) + 1 as int))"


def healthcare_raw_from_orders(spark, sf_dir: str) -> DataFrame:
    """Healthcare-shaped raw frame (reference CSV shape, migration.py:130):
    one row per admission with patient attributes inlined, messy column
    names (exercises R2), string dates (exercises R9), duplicate natural
    keys (exercises R7/R10/R13).

    The synthetic columns are composed as SQL text — one py4j call for
    the whole projection instead of a few hundred Column-API round
    trips; this builder runs once per hc_* invocation, so the driver
    chatter was a measurable slice of each entry's bench time (r13,
    the operators/quantiles.py fix applied here)."""
    from ..sources.readers import fixture_table

    # single-file fixture fan-out (plans/llm.py::_spread rationale):
    # everything downstream of this scan — the healthcare derive, R8
    # normalization probes, tuple_digest sha256 per fact row, broadcast
    # probe — otherwise runs on the scan's one input split (measured
    # par=1.1 on 32 cores). A real ingest has thousands of splits.
    o = fixture_table(spark, sf_dir, "orders").repartition(
        spark.sparkContext.defaultParallelism
    )
    pid = "(o_custkey % 400)"
    adm = "cast(date_trunc('month', o_orderdate) as date)"
    return o.selectExpr(
        "o_orderkey AS __ord",
        f"concat('  pAtIeNt ', lpad(cast({pid} as string), 5, '0'), "
        f"' mC-', cast({pid} % 7 as string), '  ') AS Name",
        f"(18 + {pid} % 70) AS Age",
        f"(CASE WHEN {pid} % 2 = 0 THEN 'Male' ELSE 'Female' END) AS Gender",
        f"{_pick_sql(BLOOD_TYPES, f'{pid} % 8')} AS `Blood Type`",
        f"{_pick_sql(CONDITIONS, 'o_orderkey % 6')} AS `Medical Condition`",
        f"date_format({adm}, 'yyyy-MM-dd') AS `Date of Admission`",
        "concat('Dr ', cast(o_orderkey % 40 as string)) AS Doctor",
        f"{_pick_sql(HOSPITALS, 'o_custkey % 3')} AS Hospital",
        f"{_pick_sql(INSURERS, 'o_orderkey % 4')} AS `Insurance Provider`",
        "o_totalprice AS `Billing Amount`",
        f"({pid} % 20 + 100) AS `Room Number`",
        f"{_pick_sql(ADMISSION_TYPES, 'o_orderkey % 3')} AS `Admission Type`",
        f"date_format(date_add({adm}, cast(o_orderkey % 14 + 1 as int)), "
        f"'yyyy-MM-dd') AS `Discharge Date`",
        f"{_pick_sql(MEDICATIONS, 'o_orderkey % 5')} AS Medication",
        f"{_pick_sql(TEST_RESULTS, 'cast(floor(o_orderkey / 3) as bigint) % 3')}"
        f" AS `Test Results`",
    )


def _sql_case(expr: str, options: list[str]) -> str:
    whens = " ".join(f"WHEN {i} THEN '{v}'" for i, v in enumerate(options))
    return f"CASE {expr} {whens} END"


#: shared oracle fragment: distinct-patient attributes from pid
_P_ATTRS = f"""
       'Patient ' || lpad(CAST(pid AS VARCHAR), 5, '0') || ' Mc-' || CAST(pid % 7 AS VARCHAR) AS name,
       18 + pid % 70 AS age,
       CASE WHEN pid % 2 = 0 THEN 'Male' ELSE 'Female' END AS gender,
       {_sql_case('pid % 8', BLOOD_TYPES)} AS blood_type
"""

_P_KEY_SQL = "sha256(concat_ws(chr(31), name, CAST(age AS VARCHAR), gender, blood_type))"


@query(
    "hc_patients_dim",
    oracle=f"""
    WITH raw AS (SELECT DISTINCT o_custkey % 400 AS pid FROM orders),
    p AS (SELECT {_P_ATTRS} FROM raw)
    SELECT name, age, gender, blood_type, {_P_KEY_SQL} AS patient_id
    FROM p
    """,
)
def hc_patients_dim(spark, sf_dir: str) -> DataFrame:
    """R2+R7+R8+R10+R11 composed: the patients dimension produced by the
    full reference-parity pipeline (migration.py:160-187)."""
    res = healthcare_pipeline(healthcare_raw_from_orders(spark, sf_dir), ordinal_col="__ord")
    return res.patients.select("name", "age", "gender", "blood_type", "patient_id")


@query(
    "hc_admissions_first_seen",
    oracle=f"""
    WITH raw AS (
      SELECT o_orderkey AS ord,
             o_custkey % 400 AS pid,
             o_custkey % 3 AS h,
             o_orderkey AS k,
             o_totalprice,
             CAST(date_trunc('month', o_orderdate) AS DATE) AS adm
      FROM orders
    ), pat AS (
      SELECT pid, {_P_KEY_SQL} AS patient_id
      FROM (SELECT pid, {_P_ATTRS}
            FROM (SELECT DISTINCT pid FROM raw) d) p
    ), enr AS (
      SELECT ord,
             pat.patient_id,
             {_sql_case('k % 6', CONDITIONS)} AS medical_condition,
             adm AS date_of_admission,
             'Dr ' || CAST(k % 40 AS VARCHAR) AS doctor,
             {_sql_case('h', HOSPITALS)} AS hospital,
             {_sql_case('k % 4', INSURERS)} AS insurance_provider,
             floor((o_totalprice) * 1e2) / 1e2 AS billing_amount,
             pid % 20 + 100 AS room_number,
             {_sql_case('k % 3', ADMISSION_TYPES)} AS admission_type,
             adm + CAST(k % 14 + 1 AS INTEGER) AS discharge_date,
             {_sql_case('k % 5', MEDICATIONS)} AS medication,
             {_sql_case('(k // 3) % 3', TEST_RESULTS)} AS test_results
      FROM raw JOIN pat USING (pid)
    ), dedup AS (
      SELECT *, row_number() OVER (
        PARTITION BY patient_id, date_of_admission, hospital, room_number
        ORDER BY ord) AS rn
      FROM enr
    )
    SELECT patient_id, medical_condition,
           strftime(date_of_admission, '%Y-%m-%d') AS date_of_admission,
           doctor, hospital,
           insurance_provider, billing_amount, room_number, admission_type,
           strftime(discharge_date, '%Y-%m-%d') AS discharge_date,
           medication, test_results,
           sha256(concat_ws(chr(31), patient_id, CAST(date_of_admission AS VARCHAR),
                            hospital, CAST(room_number AS VARCHAR))) AS admission_id
    FROM dedup WHERE rn = 1
    """,
)
def hc_admissions_first_seen(spark, sf_dir: str) -> DataFrame:
    """The full composed pipeline's fact output: R2 rename → R7 full-row
    dedup → R8/R9 normalize → R11 surrogate keys → R13 first-seen-wins
    admission dedup (migration.py:196-236), hash-checked end-to-end."""
    res = healthcare_pipeline(healthcare_raw_from_orders(spark, sf_dir), ordinal_col="__ord")
    return (
        res.admissions.withColumn("billing_amount", _q(F.col("billing_amount"), 2))
        .withColumn("date_of_admission", F.date_format("date_of_admission", "yyyy-MM-dd"))
        .withColumn("discharge_date", F.date_format("discharge_date", "yyyy-MM-dd"))
    )


@query(
    "hc_duplicate_patients_check",
    oracle=f"""
    WITH raw AS (SELECT DISTINCT o_custkey % 400 AS pid FROM orders),
    p AS (SELECT {_P_ATTRS} FROM raw)
    SELECT name, age, gender, blood_type, count(*) AS n
    FROM p GROUP BY name, age, gender, blood_type HAVING count(*) > 1
    """,
)
def hc_duplicate_patients_check(spark, sf_dir: str) -> DataFrame:
    """R19 flagship invariant (reference test_migration.py:29-34): the
    patients dim has no duplicate natural keys — empty on both engines."""
    res = healthcare_pipeline(healthcare_raw_from_orders(spark, sf_dir), ordinal_col="__ord")
    return duplicate_patients_check(res.patients)


_K_ANON = 3


@query(
    "hc_k_anonymity_audit",
    oracle=f"""
    WITH raw AS (SELECT DISTINCT o_custkey % 400 AS pid FROM orders),
    p AS (SELECT pid, {_P_ATTRS} FROM raw),
    cells AS (
      SELECT CAST(floor(age / 10) * 10 AS BIGINT) AS age_band, gender, blood_type,
             count(*) AS n
      FROM p GROUP BY 1, 2, 3)
    SELECT age_band, gender, blood_type,
           CAST(n AS BIGINT) AS n,
           n < {_K_ANON} AS below_k
    FROM cells
    """,
)
def hc_k_anonymity_audit(spark, sf_dir: str) -> DataFrame:
    """k-anonymity audit over the patients dimension: group sizes per
    quasi-identifier cell (age band × gender × blood type) with a
    below-k flag — the privacy check a healthcare pipeline (the
    reference's domain) must run before any data release, since a cell
    smaller than k re-identifies its members.

    One hash aggregate over the (dimension-sized) patient set; at scale
    the quasi-identifier generalization lattice is explored by re-running
    this with coarser bands until no cell is below k."""
    res = healthcare_pipeline(
        healthcare_raw_from_orders(spark, sf_dir), ordinal_col="__ord"
    )
    cells = (
        res.patients.select(
            (F.floor(F.col("age") / 10) * 10).cast("long").alias("age_band"),
            "gender",
            "blood_type",
        )
        .groupBy("age_band", "gender", "blood_type")
        .agg(F.count(F.lit(1)).alias("n"))
    )
    return cells.select(
        "age_band",
        "gender",
        "blood_type",
        F.col("n").cast("long").alias("n"),
        (F.col("n") < _K_ANON).alias("below_k"),
    )


_L_DIV = 3


@query(
    "hc_l_diversity_audit",
    oracle=f"""
    WITH raw AS (SELECT DISTINCT o_custkey % 400 AS pid FROM orders),
    p AS (SELECT pid, {_P_ATTRS} FROM raw),
    cells AS (
      SELECT CAST(floor(age / 10) * 10 AS BIGINT) AS age_band, gender,
             count(*) AS n,
             count(DISTINCT blood_type) AS l
      FROM p GROUP BY 1, 2)
    SELECT age_band, gender,
           CAST(n AS BIGINT) AS n,
           CAST(l AS BIGINT) AS l,
           l < {_L_DIV} AS below_l
    FROM cells
    """,
)
def hc_l_diversity_audit(spark, sf_dir: str) -> DataFrame:
    """l-diversity audit over the patients dimension — the companion
    privacy check to :func:`hc_k_anonymity_audit`: a quasi-identifier
    cell (age band × gender) can satisfy k-anonymity yet still leak the
    sensitive attribute if every member shares one value, so each cell
    must contain at least l distinct sensitive values (blood type here).

    Same single hash aggregate as the k-audit with a count-distinct per
    cell; count-distinct over an 8-value domain is a tiny exact state
    (at scale Spark's partial aggregation keeps it a set of ≤8 entries
    per cell, no HLL needed). Cells below l get flagged for suppression
    or coarser generalization."""
    res = healthcare_pipeline(
        healthcare_raw_from_orders(spark, sf_dir), ordinal_col="__ord"
    )
    cells = (
        res.patients.select(
            (F.floor(F.col("age") / 10) * 10).cast("long").alias("age_band"),
            "gender",
            "blood_type",
        )
        .groupBy("age_band", "gender")
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.countDistinct("blood_type").alias("l"),
        )
    )
    return cells.select(
        "age_band",
        "gender",
        F.col("n").cast("long").alias("n"),
        F.col("l").cast("long").alias("l"),
        (F.col("l") < _L_DIV).alias("below_l"),
    )
