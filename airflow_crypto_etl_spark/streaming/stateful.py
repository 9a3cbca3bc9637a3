"""Custom stateful streaming operators via applyInPandasWithState.

The reference has no streaming state (SURVEY.md §2.10); this is the
engine's surface for operators that windows can't express — running
per-key accumulators, custom sessionization policies, CDC-style
last-value tracking. State is partitioned by key in the state store,
so memory scales with distinct keys per executor, not events.
"""

from __future__ import annotations

from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout
from pyspark.sql import types as T

RUNNING_TOTALS_SCHEMA = T.StructType(
    [
        T.StructField("user_id", T.LongType()),
        T.StructField("n_events", T.LongType()),
        T.StructField("total_value", T.DoubleType()),
        T.StructField("max_value", T.DoubleType()),
    ]
)

STATE_SCHEMA = T.StructType(
    [
        T.StructField("n", T.LongType()),
        T.StructField("total", T.DoubleType()),
        T.StructField("mx", T.DoubleType()),
    ]
)


def _update_running_totals(
    key: tuple, batches: Iterator[pd.DataFrame], state: GroupState
) -> Iterator[pd.DataFrame]:
    """Fold each micro-batch into (count, sum, max) state and emit the
    updated running totals for the key."""
    if state.exists:
        n, total, mx = state.get
    else:
        n, total, mx = 0, 0.0, float("-inf")
    for pdf in batches:
        n += len(pdf)
        total += float(pdf["value"].sum())
        if len(pdf):
            mx = max(mx, float(pdf["value"].max()))
    state.update((n, total, mx))
    yield pd.DataFrame(
        {"user_id": [key[0]], "n_events": [n], "total_value": [total], "max_value": [mx]}
    )


def running_totals_per_user(events_stream: DataFrame) -> DataFrame:
    """Streaming running totals per user — arbitrary stateful processing
    (update mode; state persists across micro-batches via the state
    store, checkpoint-recovered on restart)."""
    return events_stream.groupBy("user_id").applyInPandasWithState(
        _update_running_totals,
        outputStructType=RUNNING_TOTALS_SCHEMA,
        stateStructType=STATE_SCHEMA,
        outputMode="update",
        timeoutConf=GroupStateTimeout.NoTimeout,
    )


# ---------------------------------------------------------------------------
# transformWithState — the current-generation arbitrary-state API
# ---------------------------------------------------------------------------
#
# transformWithStateInPandas supersedes applyInPandasWithState: typed,
# composable state primitives (ValueState/ListState/MapState, TTL, timers)
# backed by the RocksDB state store. Its Python worker protocol needs
# `protobuf`, which is not installed in this container (and installs are
# disallowed), so the processor below is import-gated: the class/plan
# construction is real and the test exercises it only when protobuf is
# present.

TYPE_COUNTS_SCHEMA = "user_id bigint, event_type string, n_events bigint"

TWS_STATE_STORE_CONF = (
    "spark.sql.streaming.stateStore.providerClass",
    "org.apache.spark.sql.execution.streaming.state.RocksDBStateStoreProvider",
)


def _make_type_counts_processor():
    from pyspark.sql.streaming.stateful_processor import (
        StatefulProcessor,
        StatefulProcessorHandle,
    )

    class EventTypeCounts(StatefulProcessor):
        """Per-user running count per event type, kept in MapState — state
        size scales with (users × types) regardless of event volume, and
        only the types touched by a micro-batch are read or written."""

        def init(self, handle: StatefulProcessorHandle) -> None:
            self._counts = handle.getMapState(
                "counts", "event_type string", "n bigint"
            )

        def handleInputRows(self, key, rows, timerValues):
            delta: dict[str, int] = {}
            for pdf in rows:
                for et, c in pdf["event_type"].value_counts().items():
                    delta[et] = delta.get(et, 0) + int(c)
            users, types, ns = [], [], []
            for et, d in sorted(delta.items()):
                prev = (
                    self._counts.getValue((et,))
                    if self._counts.containsKey((et,))
                    else None
                )
                n = (prev[0] if prev else 0) + d
                self._counts.updateValue((et,), (n,))
                users.append(key[0])
                types.append(et)
                ns.append(n)
            yield pd.DataFrame(
                {"user_id": users, "event_type": types, "n_events": ns}
            )

        def close(self) -> None:
            pass

    return EventTypeCounts()


def event_type_counts_per_user(events_stream: DataFrame) -> DataFrame:
    """Streaming per-(user, event_type) running counts via
    transformWithStateInPandas (Update mode, RocksDB state store —
    set ``TWS_STATE_STORE_CONF`` on the session first)."""
    return events_stream.groupBy("user_id").transformWithStateInPandas(
        statefulProcessor=_make_type_counts_processor(),
        outputStructType=TYPE_COUNTS_SCHEMA,
        outputMode="Update",
        timeMode="None",
    )


# ---------------------------------------------------------------------------
# Stateful streaming EMA (Wilder / recursive form)
# ---------------------------------------------------------------------------
#
# The batch engine deliberately ships the FIR-truncated EMA
# (operators/timeseries.ema_fir) because the recursive form is not
# cross-engine portable. In STREAMING the recursive form is the natural
# one: per-symbol state carries yesterday's EMA and each micro-batch
# folds its ticks in event order — exactly the accumulator
# applyInPandasWithState exists for. The fold itself is vectorized
# (pandas ewm(adjust=False) seeded by prepending the carried state), so
# the per-batch cost is one Arrow transfer + one C-loop, not a Python
# per-row loop.

EMA_OUT_SCHEMA = T.StructType(
    [
        T.StructField("symbol", T.StringType()),
        T.StructField("n_ticks", T.LongType()),
        T.StructField("ema", T.DoubleType()),
    ]
)

EMA_STATE_SCHEMA = T.StructType(
    [
        T.StructField("n", T.LongType()),
        T.StructField("ema", T.DoubleType()),
    ]
)

EMA_PERIODS = 10


def _update_ema(
    key: tuple, batches: Iterator[pd.DataFrame], state: GroupState
) -> Iterator[pd.DataFrame]:
    alpha = 2.0 / (EMA_PERIODS + 1.0)
    n, ema = state.get if state.exists else (0, None)
    # n==0 state is the "never saw a row" sentinel (stored ema 0.0 is not
    # a real EMA then); treat it as unseeded so a spurious 0.0 can never
    # seed the recursion after an empty-batch invocation.
    if not n:
        ema = None
    # The iterator yields the group in ARROW-SIZED CHUNKS (~10k rows)
    # whose relative order is shuffle order, not event order — sorting
    # each chunk independently folds chunks out of order once a group
    # outgrows one chunk (found by the sf1 leg: 200k-row groups, EMA
    # badly wrong while n_ticks matched). Concatenate the micro-batch,
    # THEN sort once: the fold's total order must span the whole batch.
    chunks = [pdf for pdf in batches if len(pdf)]
    if chunks:
        pdf = pd.concat(chunks, ignore_index=True).sort_values(["tick_ts", "tick_id"])
        prices = pdf["price"].astype("float64")
        seed = [] if ema is None else [ema]
        series = pd.concat([pd.Series(seed, dtype="float64"), prices], ignore_index=True)
        ema = float(series.ewm(alpha=alpha, adjust=False).mean().iloc[-1])
        n += len(pdf)
    state.update((n, ema if ema is not None else 0.0))
    yield pd.DataFrame({"symbol": [key[0]], "n_ticks": [n], "ema": [ema]})


def streaming_ema(ticks_stream: DataFrame) -> DataFrame:
    """Per-symbol recursive EMA over a tick stream with cross-batch
    state (update mode; checkpoint-recovered). Input: the
    with_market_cols tick shape with price pre-cast to double."""
    return ticks_stream.groupBy("symbol").applyInPandasWithState(
        _update_ema,
        outputStructType=EMA_OUT_SCHEMA,
        stateStructType=EMA_STATE_SCHEMA,
        outputMode="update",
        timeoutConf=GroupStateTimeout.NoTimeout,
    )


# ---------------------------------------------------------------------------
# Streaming Gram-matrix maintenance (incremental sufficient statistics)
# ---------------------------------------------------------------------------

_GRAM_SUMS = ["sx1", "sx2", "sy", "sx11", "sx12", "sx22", "sx1y", "sx2y", "syy"]

GRAM_OUT_SCHEMA = T.StructType(
    [T.StructField("event_type", T.StringType()), T.StructField("n", T.LongType())]
    + [T.StructField(c, T.LongType()) for c in _GRAM_SUMS]
)

GRAM_STATE_SCHEMA = T.StructType(
    [T.StructField("n", T.LongType())]
    + [T.StructField(c, T.LongType()) for c in _GRAM_SUMS]
)


def _update_gram(
    key: tuple, batches: Iterator[pd.DataFrame], state: GroupState
) -> Iterator[pd.DataFrame]:
    """Fold each micro-batch's INTEGER feature rows (x1, x2, yq) into
    the 10 Gram/moment sums. Integer arithmetic end-to-end: the state
    is exactly the batch engine's sums no matter how the stream is
    micro-batched or which executor folds which chunk — the mergeable
    sufficient-statistics property that lets one model fit ride an
    unbounded stream with O(1) state per key."""
    vals = list(state.get) if state.exists else [0] * 10
    for pdf in batches:
        x1 = pdf["x1"].astype("int64")
        x2 = pdf["x2"].astype("int64")
        y = pdf["yq"].astype("int64")
        vals[0] += len(pdf)
        for i, s in enumerate(
            (x1, x2, y, x1 * x1, x1 * x2, x2 * x2, x1 * y, x2 * y, y * y)
        ):
            vals[1 + i] += int(s.sum())
    state.update(tuple(vals))
    out = {"event_type": [key[0]], "n": [vals[0]]}
    for i, c in enumerate(_GRAM_SUMS):
        out[c] = [vals[1 + i]]
    yield pd.DataFrame(out)


def streaming_gram(feature_stream: DataFrame) -> DataFrame:
    """Per-event-type streaming Gram sums over integer feature columns
    (x1, x2, yq). Update mode: one row per key per micro-batch."""
    return feature_stream.groupBy("event_type").applyInPandasWithState(
        _update_gram,
        outputStructType=GRAM_OUT_SCHEMA,
        stateStructType=GRAM_STATE_SCHEMA,
        outputMode="update",
        timeoutConf=GroupStateTimeout.NoTimeout,
    )
