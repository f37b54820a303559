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
    for pdf in pdfs:
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
        for pdf in rows:
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
