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
