"""Custom stateful streaming operators via ``applyInPandasWithState``.

For semantics the built-in windowed/session aggregations can't express —
here, a per-user running profile that emits an anomaly flag whenever a new
event's value exceeds ``threshold_sigma`` standard deviations of the user's
running mean. State per key is O(1) (count, sum, sum-of-squares); the
per-batch computation is fully vectorized (numpy prefix sums over the Arrow
batch — no per-row Python), and timeouts bound state lifetime.
"""

from __future__ import annotations

from typing import Iterable, Iterator

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout

OUTPUT_SCHEMA = (
    "user_id bigint, event_id bigint, value double, zscore double, anomaly boolean"
)
STATE_SCHEMA = "cnt bigint, total double, total_sq double"


def _detect(
    key: tuple,
    pdfs: Iterator[pd.DataFrame],
    state: GroupState,
    threshold_sigma: float = 3.0,
    expire_ms: int | None = None,
) -> Iterable[pd.DataFrame]:
    if state.hasTimedOut:
        state.remove()
        return
    cnt0, sum0, sumsq0 = state.get if state.exists else (0, 0.0, 0.0)
    # concat + sort ONCE per batch: a user's rows can span several arrow
    # chunks with ts_ord interleaved across them (the _scd2_step lesson)
    chunks = [pdf for pdf in pdfs if len(pdf)]
    for pdf in ([pd.concat(chunks, ignore_index=True)] if chunks else []):
        pdf = pdf.sort_values(["ts_ord", "event_id"])
        v = pdf["value"].to_numpy(dtype=np.float64)
        n = len(v)
        # prefix aggregates EXCLUDING the current element, seeded with state
        cnts = cnt0 + np.arange(n, dtype=np.float64)
        sums = sum0 + np.concatenate(([0.0], np.cumsum(v)[:-1]))
        sumsqs = sumsq0 + np.concatenate(([0.0], np.cumsum(v * v)[:-1]))
        with np.errstate(divide="ignore", invalid="ignore"):
            means = sums / cnts
            variances = (sumsqs - sums * sums / cnts) / (cnts - 1)
            stds = np.sqrt(np.maximum(variances, 0.0))
            z = (v - means) / stds
        z[(cnts < 2) | ~np.isfinite(z)] = 0.0
        z = np.round(z, 6)
        yield pd.DataFrame(
            {
                "user_id": np.full(n, key[0], dtype=np.int64),
                "event_id": pdf["event_id"].to_numpy(dtype=np.int64),
                "value": v,
                "zscore": z,
                "anomaly": np.abs(z) > threshold_sigma,
            }
        )
        cnt0 += n
        sum0 += float(v.sum())
        sumsq0 += float((v * v).sum())
    state.update((cnt0, sum0, sumsq0))
    if expire_ms is not None:
        state.setTimeoutDuration(expire_ms)


def anomaly_flags(
    events: DataFrame, threshold_sigma: float = 3.0, expire_ms: int | None = None
) -> DataFrame:
    """Streaming per-user anomaly flags (append mode).

    ``events`` needs columns: user_id, event_id, value, ts_ord — any
    ordering-comparable event-time column (bigint epoch, timestamp, or
    timestamp_ntz all work; pandas sorts each the same way).
    Pass ``expire_ms`` on long-running production streams to expire idle
    per-key state (ProcessingTimeTimeout); leave None for bounded replays
    (availableNow) where timeout-firing batches would keep the query alive.
    """
    timeout = (
        GroupStateTimeout.ProcessingTimeTimeout
        if expire_ms is not None
        else GroupStateTimeout.NoTimeout
    )
    return events.groupBy("user_id").applyInPandasWithState(
        lambda key, pdfs, state: _detect(key, pdfs, state, threshold_sigma, expire_ms),
        outputStructType=OUTPUT_SCHEMA,
        stateStructType=STATE_SCHEMA,
        outputMode="append",
        timeoutConf=timeout,
    )


# ---------------------------------------------------------------------------
# transformWithState port (Spark 4's arbitrary-state API, successor of
# applyInPandasWithState): the SAME anomaly semantics implemented as a
# StatefulProcessor with a typed ValueState — composable state variables,
# per-state TTL, and timers, which the old API folds into one state tuple.
# Both implementations are kept: the batch/stream twins in tests assert
# they agree event-for-event.
# ---------------------------------------------------------------------------

try:  # Spark >= 4.0
    from pyspark.sql.streaming.stateful_processor import (
        StatefulProcessor,
        StatefulProcessorHandle,
    )

    _HAS_TWS = True
except ImportError:  # pragma: no cover - older Spark
    StatefulProcessor = object  # type: ignore[assignment,misc]
    _HAS_TWS = False


class AnomalyProcessor(StatefulProcessor):
    """Per-user running-profile anomaly detector on the transformWithState
    API. State = one ValueState of (cnt, total, total_sq); per-batch math
    is the same vectorized numpy prefix-sum as ``_detect``."""

    def __init__(self, threshold_sigma: float = 3.0, state_ttl_ms: int | None = None):
        self.threshold_sigma = threshold_sigma
        self.state_ttl_ms = state_ttl_ms

    def init(self, handle: "StatefulProcessorHandle") -> None:
        self._profile = handle.getValueState(
            "profile", STATE_SCHEMA, ttlDurationMs=self.state_ttl_ms
        )

    def handleInputRows(self, key, rows, timerValues):
        cnt0, sum0, sumsq0 = (
            self._profile.get() if self._profile.exists() else (0, 0.0, 0.0)
        )
        chunks = [pdf for pdf in rows if len(pdf)]
        for pdf in ([pd.concat(chunks, ignore_index=True)] if chunks else []):
            pdf = pdf.sort_values(["ts_ord", "event_id"])
            v = pdf["value"].to_numpy(dtype=np.float64)
            n = len(v)
            cnts = cnt0 + np.arange(n, dtype=np.float64)
            sums = sum0 + np.concatenate(([0.0], np.cumsum(v)[:-1]))
            sumsqs = sumsq0 + np.concatenate(([0.0], np.cumsum(v * v)[:-1]))
            with np.errstate(divide="ignore", invalid="ignore"):
                means = sums / cnts
                variances = (sumsqs - sums * sums / cnts) / (cnts - 1)
                stds = np.sqrt(np.maximum(variances, 0.0))
                z = (v - means) / stds
            z[(cnts < 2) | ~np.isfinite(z)] = 0.0
            z = np.round(z, 6)
            yield pd.DataFrame(
                {
                    "user_id": np.full(n, int(key[0]), dtype=np.int64),
                    "event_id": pdf["event_id"].to_numpy(dtype=np.int64),
                    "value": v,
                    "zscore": z,
                    "anomaly": np.abs(z) > self.threshold_sigma,
                }
            )
            cnt0 += n
            sum0 += float(v.sum())
            sumsq0 += float((v * v).sum())
        self._profile.update((cnt0, sum0, sumsq0))

    def close(self) -> None:
        pass


def anomaly_flags_tws(
    events: DataFrame,
    threshold_sigma: float = 3.0,
    state_ttl_ms: int | None = None,
) -> DataFrame:
    """``anomaly_flags`` on the transformWithState API (Spark 4+).

    Same input contract (user_id, event_id, value, ts_ord) and identical
    output; state expiry via the API's native per-state TTL instead of a
    processing-time timeout. Requires the RocksDB state store provider
    (``spark.sql.streaming.stateStore.providerClass``) and a Python
    environment with ``google.protobuf`` (the state-server protocol) — the
    parity test skips where protobuf is absent, the same honest gating as
    the library-bound media codecs.
    """
    if not _HAS_TWS:  # pragma: no cover
        raise ImportError("transformWithStateInPandas requires Spark >= 4.0")
    return events.groupBy("user_id").transformWithStateInPandas(
        statefulProcessor=AnomalyProcessor(threshold_sigma, state_ttl_ms),
        outputStructType=OUTPUT_SCHEMA,
        outputMode="append",
        timeMode="none",
    )


# ---------------------------------------------------------------------------
# Streaming funnel: the per-user funnel state machine (batch twin:
# operators/sequence.funnel_stages) as an applyInPandasWithState operator.
# ---------------------------------------------------------------------------

FUNNEL_OUTPUT = "user_id bigint, funnel_stage int, anchor bigint"
FUNNEL_STATE = "stage int, anchor bigint"


def _funnel_step(
    key: tuple,
    pdfs: Iterator[pd.DataFrame],
    state: GroupState,
    stages: tuple,
    max_gap: int | None,
) -> Iterable[pd.DataFrame]:
    """Advance one user's funnel over a batch.

    The transition is a data-dependent state machine, so it cannot be a
    single vectorized expression — but it vectorizes PER STAGE, not per
    row: each step is one boolean mask + first-index over the sorted batch
    (at most len(stages) passes per batch, however many rows arrive).
    Assumes event-time-ordered arrival across batches (the standard
    streaming-funnel contract; bound disorder upstream with a watermark
    sort or widen batches).
    """
    if state.hasTimedOut:  # pragma: no cover - no timeout configured
        state.remove()
        return
    stage, anchor = state.get if state.exists else (0, -1)
    for pdf in pdfs:
        if len(pdf) == 0:
            continue
        pdf = pdf.sort_values(["ep", "event_id"])
        types = pdf["event_type"].to_numpy()
        eps = pdf["ep"].to_numpy(dtype=np.int64)
        while stage < len(stages):
            mask = types == stages[stage]
            if stage > 0:
                mask &= eps > anchor
                if max_gap is not None:
                    mask &= eps <= anchor + max_gap
            idx = np.flatnonzero(mask)
            if len(idx) == 0:
                break
            anchor = int(eps[idx[0]])
            stage += 1
    state.update((stage, anchor))
    yield pd.DataFrame(
        {
            "user_id": [int(key[0])],
            "funnel_stage": [stage],
            "anchor": [anchor],
        }
    )


def funnel_stream(
    events: DataFrame,
    stages: tuple = ("signup", "click", "purchase"),
    max_gap: int | None = None,
) -> DataFrame:
    """Streaming funnel progression per user (append mode: one row per
    user per batch with the post-batch stage — the LAST row per user is
    the current funnel state). Input needs columns: user_id, event_id,
    ep (bigint event seconds), event_type; pre-filter to the funnel's
    event types upstream so state and batch work stay candidate-bounded
    (mirrors the batch operator's pre-filter)."""
    filtered = events.where(F.col("event_type").isin(list(stages)))
    return filtered.groupBy("user_id").applyInPandasWithState(
        lambda key, pdfs, state: _funnel_step(key, pdfs, state, tuple(stages), max_gap),
        outputStructType=FUNNEL_OUTPUT,
        stateStructType=FUNNEL_STATE,
        outputMode="append",
        timeoutConf=GroupStateTimeout.NoTimeout,
    )


# ---------------------------------------------------------------------------
# Streaming SCD2: the type-2 validity-interval chain (batch twin:
# catalog/events.q_scd2_history) as an applyInPandasWithState operator.
# ---------------------------------------------------------------------------

SCD2_OUTPUT = (
    "user_id bigint, status string, valid_from_day bigint, "
    "valid_to_day bigint, last_active_day bigint, n_active_days bigint, "
    "n_events bigint"
)
# open interval (status..n_events) + the still-accumulating current day
# (cur_*: the day's status is unknown until a LATER day arrives, because a
# later event inside the same day can still flip the day's last event)
SCD2_STATE = (
    "status string, valid_from bigint, last_active bigint, n_days bigint, "
    "n_events bigint, cur_day bigint, cur_ep bigint, cur_eid bigint, "
    "cur_et string, cur_n bigint"
)


def _scd2_step(
    key: tuple,
    pdfs: Iterator[pd.DataFrame],
    state: GroupState,
) -> Iterable[pd.DataFrame]:
    """Advance one user's SCD2 interval chain over a batch.

    EXACTLY the batch semantics (q_scd2_history): per observed day the
    LAST event (lexicographic max of (ep, event_id, event_type) — the
    struct-MAX argmax) is the day's status; consecutive observed days with
    the same status extend one interval; a status change observed on day d
    CLOSES the open interval with valid_to_day = d-1 and opens a new one.
    Only CLOSED intervals are emitted (append mode) — the open interval
    and the accumulating current day stay in state, exactly the batch rows
    whose valid_to_day is NULL. Assumes event-time-ordered arrival across
    batches (the streaming-funnel contract); within a batch rows are
    sorted. Per-batch work is one pandas groupby over the user's rows +
    a python fold over its DAYS (not rows) — state is O(1) per user.
    """
    if state.hasTimedOut:  # pragma: no cover - no timeout configured
        state.remove()
        return
    if state.exists:
        (status, vfrom, lact, ndays, nev,
         cday, cep, ceid, cet, cn) = state.get
    else:
        status = None
        vfrom = lact = ndays = nev = 0
        cday = None
        cep = ceid = cn = 0
        cet = ""
    closed: list[tuple] = []

    def fold_day(day: int, day_status: str, day_n: int) -> None:
        nonlocal status, vfrom, lact, ndays, nev
        if status is None:
            status, vfrom, lact, ndays, nev = day_status, day, day, 1, day_n
        elif day_status == status:
            lact, ndays, nev = day, ndays + 1, nev + day_n
        else:
            closed.append(
                (int(key[0]), status, vfrom, day - 1, lact, ndays, nev)
            )
            status, vfrom, lact, ndays, nev = day_status, day, day, 1, day_n

    # one user's batch rows can span several arrow chunks (maxRecordsPerBatch)
    # with days interleaved ACROSS chunks — concatenate and sort ONCE per
    # batch, or fold_day sees days out of order and emits wrong closed
    # intervals (per-user batch memory is already the operating model)
    chunks = [pdf for pdf in pdfs if len(pdf)]
    for pdf in ([pd.concat(chunks, ignore_index=True)] if chunks else []):
        pdf = pdf.sort_values(["ep", "event_id", "event_type"])
        days = (pdf["ep"].to_numpy(dtype=np.int64) // 86400)
        for day, grp in pdf.groupby(days, sort=True):
            day = int(day)
            last = grp.iloc[-1]
            g_ep, g_eid, g_et = int(last["ep"]), int(last["event_id"]), str(last["event_type"])
            if cday is not None and day == cday:
                cn += len(grp)
                if (g_ep, g_eid, g_et) > (cep, ceid, cet):
                    cep, ceid, cet = g_ep, g_eid, g_et
            else:
                if cday is not None:  # a later day arrived: cur day is final
                    fold_day(cday, cet, cn)
                cday, cep, ceid, cet, cn = day, g_ep, g_eid, g_et, len(grp)
    state.update((
        status, vfrom, lact, ndays, nev,
        cday, cep, ceid, cet, cn,
    ))
    if closed:
        yield pd.DataFrame(
            closed,
            columns=["user_id", "status", "valid_from_day", "valid_to_day",
                     "last_active_day", "n_active_days", "n_events"],
        )


def scd2_stream(events: DataFrame) -> DataFrame:
    """Streaming SCD2 validity intervals per user (append mode: one row
    per interval, emitted at the moment the interval CLOSES). Input needs
    columns: user_id, event_id, ep (bigint event seconds), event_type.

    TWIN CONTRACT vs batch q_scd2_history: a close is emitted once the
    status-CHANGE day (valid_to+1) is itself superseded by a later
    observed day — before that, the change day is the user's open day and
    a later same-day event could flip its status back, so the close is
    correctly deferred. Hence the stream's emitted set equals the batch
    rows with non-NULL valid_to_day EXCEPT those whose change day is the
    user's last observed day (pinned by the twin test). The open interval
    + pending day per user live in O(1) state, never in the output."""
    return events.groupBy("user_id").applyInPandasWithState(
        _scd2_step,
        outputStructType=SCD2_OUTPUT,
        stateStructType=SCD2_STATE,
        outputMode="append",
        timeoutConf=GroupStateTimeout.NoTimeout,
    )
