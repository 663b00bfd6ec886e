"""Custom stateful streaming operator via ``applyInPandasWithState``
(SURVEY.md §2.8): a per-user running profile the built-in aggregations
can't express incrementally (count + sum + max gap between consecutive
events), maintained in explicit GroupState.

Scale/ops notes:
- state is per-group (user) and bounded: four scalars per user;
- a processing-time timeout would evict idle users in a production
  deployment (kept NoTimeout here so the batch-equivalence test is
  exact);
- output mode "update": one refreshed profile row per user per
  micro-batch.
"""

from __future__ import annotations

from collections.abc import Iterable

import pandas as pd

from pyspark.sql import DataFrame
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout
from pyspark.sql.streaming.stateful_processor import (
    StatefulProcessor,
    StatefulProcessorHandle,
)
from pyspark.sql.types import (
    DoubleType,
    LongType,
    StringType,
    StructField,
    StructType,
)

PROFILE_SCHEMA = StructType(
    [
        StructField("user_id", LongType()),
        StructField("n_events", LongType()),
        StructField("sum_value", DoubleType()),
        StructField("max_gap_seconds", DoubleType()),
    ]
)

_STATE_SCHEMA = StructType(
    [
        StructField("n", LongType()),
        StructField("sum_cents", LongType()),
        StructField("last_ts_us", LongType()),
        StructField("max_gap_us", LongType()),
    ]
)


def _update_user_profile(
    key: tuple, pdfs: Iterable[pd.DataFrame], state: GroupState
) -> Iterable[pd.DataFrame]:
    """Fold this micro-batch's events for one user into running state.

    Values accumulate as integer cents / microseconds so re-ordering
    across micro-batches cannot drift the totals (same rationale as
    registry.gridsum).

    ``max_gap_seconds`` is order-SENSITIVE: state keeps only the last
    timestamp, so the exact-gap guarantee requires each user's events
    to arrive in ts order ACROSS micro-batches (within a batch we sort
    here). The certified entry satisfies this with a single-file
    source; a multi-file source under ``maxFilesPerTrigger=1`` whose
    file listing interleaves timestamps would violate it — we detect
    the regression below and raise rather than silently diverge from
    the batch oracle.
    """
    (user_id,) = key
    if state.exists:
        n, sum_cents, last_ts_us, max_gap_us = state.get
    else:
        n, sum_cents, last_ts_us, max_gap_us = 0, 0, None, 0

    import math

    # Concatenate the WHOLE micro-batch before sorting: the runtime
    # delivers a group's rows as an iterator of Arrow-sized chunks in
    # arbitrary order, so sorting each chunk alone would compute gaps
    # across wrong neighbors once a group spans multiple chunks.
    chunks = list(pdfs)
    batch = pd.concat(chunks) if chunks else pd.DataFrame()
    if len(batch):
        batch = batch.sort_values("ts")
        first_ts_us = int(pd.Timestamp(batch["ts"].iloc[0]).value // 1000)
        if last_ts_us is not None and first_ts_us < last_ts_us:
            raise ValueError(
                f"user {user_id}: micro-batch delivered ts "
                f"{first_ts_us}us earlier than state's last "
                f"{last_ts_us}us — out-of-order cross-batch delivery "
                "breaks the exact max_gap_seconds contract (state "
                "keeps only the last ts); feed this operator a "
                "ts-ordered source or drop the gap column"
            )
        for ts, value in zip(batch["ts"], batch["value"]):
            ts_us = int(pd.Timestamp(ts).value // 1000)
            if last_ts_us is not None:
                max_gap_us = max(max_gap_us, ts_us - last_ts_us)
            last_ts_us = ts_us
            n += 1
            # floor (not int(): that truncates toward zero) to match
            # the batch twin's F.floor cents grid on negative values
            sum_cents += math.floor(value * 100 + 0.5)

    state.update((n, sum_cents, last_ts_us, max_gap_us))
    yield pd.DataFrame(
        {
            "user_id": [user_id],
            "n_events": [n],
            "sum_value": [sum_cents / 100.0],
            "max_gap_seconds": [max_gap_us / 1e6],
        }
    )


def streaming_user_profiles(events: DataFrame) -> DataFrame:
    """Arbitrary-stateful per-user profile over the events stream."""
    return (
        events.select("user_id", "ts", "value")
        .groupBy("user_id")
        .applyInPandasWithState(
            _update_user_profile,
            outputStructType=PROFILE_SCHEMA,
            stateStructType=_STATE_SCHEMA,
            outputMode="update",
            timeoutConf=GroupStateTimeout.NoTimeout,
        )
    )


def batch_user_profiles(events: DataFrame) -> DataFrame:
    """Batch twin of :func:`streaming_user_profiles` (correctness
    oracle): same profile computed with window + aggregate."""
    from pyspark.sql import Window
    from pyspark.sql import functions as F

    w = Window.partitionBy("user_id").orderBy("ts")
    us = F.unix_micros(F.col("ts"))
    gaps = events.select(
        "user_id",
        "value",
        (us - F.lag(us).over(w)).alias("gap_us"),  # integer µs: exact
    )
    cents = F.floor(F.col("value") * 100.0 + F.lit(0.5)).cast("long")
    return gaps.groupBy("user_id").agg(
        F.count(F.lit(1)).alias("n_events"),
        (F.sum(cents) / 100.0).alias("sum_value"),
        (F.coalesce(F.max("gap_us"), F.lit(0)) / 1e6).alias("max_gap_seconds"),
    )


# --------------------------------------------------------------------------
# transformWithStateInPandas (Spark 4 stateful API)
# --------------------------------------------------------------------------

TYPE_STATS_SCHEMA = StructType(
    [
        StructField("event_type", StringType()),
        StructField("n_events", LongType()),
        StructField("sum_value", DoubleType()),
        StructField("max_value", DoubleType()),
    ]
)


class EventTypeStatsProcessor(StatefulProcessor):
    """Per-event-type running stats through the ``transformWithState``
    API — the Spark-4 successor of ``applyInPandasWithState``: state is
    named and typed (``ValueState`` here; List/Map state and timers are
    the richer surface), owned by a processor object with an explicit
    lifecycle, and requires the RocksDB state store provider.

    Accumulates integer cents (gridsum rationale) so micro-batch
    boundaries can't drift the totals vs the batch twin."""

    def init(self, handle: StatefulProcessorHandle) -> None:
        self._agg = handle.getValueState(
            "agg", "n BIGINT, sum_cents BIGINT, max_cents BIGINT"
        )

    def handleInputRows(self, key, rows, timerValues):  # noqa: ANN001
        import math

        n, sum_cents, max_cents = (
            self._agg.get() if self._agg.exists() else (0, 0, None)
        )
        for pdf in rows:
            for value in pdf["value"]:
                cents = math.floor(float(value) * 100 + 0.5)
                n += 1
                sum_cents += cents
                max_cents = cents if max_cents is None else max(max_cents, cents)
        self._agg.update((n, sum_cents, max_cents))
        yield pd.DataFrame(
            {
                "event_type": [key[0]],
                "n_events": [n],
                "sum_value": [sum_cents / 100.0],
                "max_value": [max_cents / 100.0],
            }
        )

    def close(self) -> None:
        pass


def streaming_event_type_stats(events: DataFrame) -> DataFrame:
    """Running per-type stats via ``transformWithStateInPandas``. The
    session must use the RocksDB state store provider
    (``spark.sql.streaming.stateStore.providerClass``) — the API
    requires it; the test sets and restores the conf.

    Dependency note: the API's driver-worker protocol imports
    ``google.protobuf``, absent from this container's site-packages —
    the test env bridges to a vendored pure-python copy
    (tests/_proto_shim, activated in conftest) so the end-to-end
    batch-twin test RUNS here; the processor's fold logic is
    additionally unit-tested with a fake handle, keeping the operator
    covered even where no protobuf exists at all."""
    return (
        events.select("event_type", "value")
        .groupBy("event_type")
        .transformWithStateInPandas(
            statefulProcessor=EventTypeStatsProcessor(),
            outputStructType=TYPE_STATS_SCHEMA,
            outputMode="update",
            timeMode="none",
        )
    )


def batch_event_type_stats(events: DataFrame) -> DataFrame:
    """Batch twin of :func:`streaming_event_type_stats`."""
    from pyspark.sql import functions as F

    cents = F.floor(F.col("value") * 100.0 + F.lit(0.5)).cast("long")
    return events.groupBy("event_type").agg(
        F.count(F.lit(1)).alias("n_events"),
        (F.sum(cents) / 100.0).alias("sum_value"),
        (F.max(cents) / 100.0).alias("max_value"),
    )


# --------------------------------------------------------------------------
# transformWithState richer state shapes: ListState and MapState
# --------------------------------------------------------------------------

USER_LIST_SCHEMA = StructType(
    [
        StructField("user_id", LongType()),
        StructField("n_events", LongType()),
        StructField("sum_value", DoubleType()),
        StructField("max_value", DoubleType()),
    ]
)


class UserValuesListProcessor(StatefulProcessor):
    """Per-user event-value ledger in a ``ListState`` — the state shape
    for "keep the raw per-key items" operators (replay buffers, top-K
    reservoirs, evidence lists). Each batch APPENDS the arriving cents
    values (``appendList`` — no read-modify-write of the whole list)
    and emits order-independent aggregates recomputed from the full
    list, so the final row per key is batch-boundary- and
    arrival-order-invariant."""

    def init(self, handle: StatefulProcessorHandle) -> None:
        self._vals = handle.getListState("vals", "c BIGINT")

    def handleInputRows(self, key, rows, timerValues):  # noqa: ANN001
        import math

        new = []
        for pdf in rows:
            for value in pdf["value"]:
                new.append((int(math.floor(float(value) * 100 + 0.5)),))
        if new:
            self._vals.appendList(new)
        cents = [c for (c,) in self._vals.get()]
        yield pd.DataFrame(
            {
                "user_id": [key[0]],
                "n_events": [len(cents)],
                "sum_value": [sum(cents) / 100.0],
                "max_value": [max(cents) / 100.0],
            }
        )

    def close(self) -> None:
        pass


def streaming_user_values_list(events: DataFrame) -> DataFrame:
    """Running per-user stats recomputed from a ``ListState`` ledger."""
    return (
        events.select("user_id", "value")
        .groupBy("user_id")
        .transformWithStateInPandas(
            statefulProcessor=UserValuesListProcessor(),
            outputStructType=USER_LIST_SCHEMA,
            outputMode="update",
            timeMode="none",
        )
    )


USER_TYPE_MAP_SCHEMA = StructType(
    [
        StructField("user_id", LongType()),
        StructField("event_type", StringType()),
        StructField("n_events", LongType()),
        StructField("sum_value", DoubleType()),
    ]
)


class UserTypeMapProcessor(StatefulProcessor):
    """Per-user per-event-type counters in a ``MapState`` — the state
    shape for keyed sub-aggregates (per-user per-item counts, per-key
    per-feature sketches) where the sub-key space is unbounded and
    only touched entries should cost anything. Each batch folds the
    arriving rows into ``(count, sum_cents)`` per event type via
    ``getValue``/``updateValue`` point lookups, then emits EVERY map
    entry for the key (``iterator``), so the last emitted rows per
    (user, type) are the final totals regardless of batch count."""

    def init(self, handle: StatefulProcessorHandle) -> None:
        self._m = handle.getMapState(
            "per_type", "event_type STRING", "n BIGINT, s BIGINT"
        )

    def handleInputRows(self, key, rows, timerValues):  # noqa: ANN001
        import math

        for pdf in rows:
            for etype, value in zip(pdf["event_type"], pdf["value"]):
                cents = int(math.floor(float(value) * 100 + 0.5))
                prev = (
                    self._m.getValue((etype,))
                    if self._m.containsKey((etype,))
                    else (0, 0)
                )
                self._m.updateValue((etype,), (prev[0] + 1, prev[1] + cents))
        types, ns, sums = [], [], []
        for (etype,), (n, s) in self._m.iterator():
            types.append(etype)
            ns.append(n)
            sums.append(s / 100.0)
        yield pd.DataFrame(
            {
                "user_id": [key[0]] * len(types),
                "event_type": types,
                "n_events": ns,
                "sum_value": sums,
            }
        )

    def close(self) -> None:
        pass


def streaming_user_type_map(events: DataFrame) -> DataFrame:
    """Per-(user, event-type) running totals from a ``MapState``."""
    return (
        events.select("user_id", "event_type", "value")
        .groupBy("user_id")
        .transformWithStateInPandas(
            statefulProcessor=UserTypeMapProcessor(),
            outputStructType=USER_TYPE_MAP_SCHEMA,
            outputMode="update",
            timeMode="none",
        )
    )


# --------------------------------------------------------------------------
# transformWithState event-time TIMERS: session-close emission
# --------------------------------------------------------------------------

SESSION_CLOSE_SCHEMA = StructType(
    [
        StructField("user_id", LongType()),
        StructField("kind", StringType()),
        StructField("n_events", LongType()),
    ]
)

_SESSION_GAP_MS = 30 * 60 * 1000


class SessionCloseTimerProcessor(StatefulProcessor):
    """Event-time TIMER lifecycle through transformWithState: each batch
    folds the per-user event count and (re)registers one session-close
    timer at ``last_event + 30 min`` (delete-then-register keeps exactly
    one live timer per key); when the WATERMARK passes a key's expiry,
    ``handleExpiredTimer`` emits the closed-session row. The timer API
    surface a production sessionizer uses — timeouts, TTL sweeps,
    scheduled flushes — exercised with named timers on the RocksDB
    store, not a processing-time heuristic."""

    def init(self, handle: StatefulProcessorHandle) -> None:
        self._h = handle
        self._st = handle.getValueState("st", "n BIGINT, last_ms BIGINT")

    def handleInputRows(self, key, rows, timerValues):  # noqa: ANN001
        n, last = self._st.get() if self._st.exists() else (0, 0)
        for pdf in rows:
            n += len(pdf)
            mx = int(pdf["ts"].max().value // 1_000_000)
            last = max(last, mx)
        self._st.update((n, last))
        for t in self._h.listTimers():
            self._h.deleteTimer(t)
        self._h.registerTimer(last + _SESSION_GAP_MS)
        yield pd.DataFrame(
            {"user_id": [key[0]], "kind": ["update"], "n_events": [n]}
        )

    def handleExpiredTimer(self, key, timerValues, expiredTimerInfo):  # noqa: ANN001
        n, _last = self._st.get()
        yield pd.DataFrame(
            {"user_id": [key[0]], "kind": ["closed"], "n_events": [n]}
        )

    def close(self) -> None:
        pass


def streaming_session_close_timers(events: DataFrame) -> DataFrame:
    """Per-user session-close rows emitted by event-time timers. The
    input stream must be watermarked (``timeMode='eventTime'`` fires
    timers on watermark advance)."""
    return (
        events.select("user_id", "ts")
        .groupBy("user_id")
        .transformWithStateInPandas(
            statefulProcessor=SessionCloseTimerProcessor(),
            outputStructType=SESSION_CLOSE_SCHEMA,
            outputMode="update",
            timeMode="eventTime",
        )
    )
