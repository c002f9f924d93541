"""Custom stateful streaming operators (applyInPandasWithState).

The PromQL ``for: N minutes`` debounce (alerts.yaml:33,46,57 —
"condition must hold for N consecutive evaluations before alerting")
needs cross-batch state in live mode: a per-alert counter of consecutive
breached windows. Batch mode uses the window-over-window form
(operators.monitoring.sustained_breach); this is the streaming twin.
"""

from __future__ import annotations

from typing import Iterator

import pandas as pd

from pyspark.sql import DataFrame
from pyspark.sql import types as T
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout

ALERT_SCHEMA = T.StructType(
    [
        T.StructField("alert_key", T.StringType()),
        T.StructField("window_start", T.TimestampType()),
        T.StructField("value", T.DoubleType()),
        T.StructField("breach_run", T.IntegerType()),
        T.StructField("alert", T.BooleanType()),
    ]
)

_STATE_SCHEMA = T.StructType(
    [
        T.StructField("run", T.IntegerType()),
        T.StructField("last_window_us", T.LongType()),
    ]
)


def debounced_alerts(
    windowed: DataFrame,
    key_col: str,
    time_col: str,
    value_col: str,
    threshold: float,
    consecutive: int,
) -> DataFrame:
    """Stateful debounce over a keyed, windowed metric stream.

    State = length of the current breach run per alert key; survives
    micro-batches via the state store. Emits one row per input window
    with the running breach length and the debounced alert flag.
    """

    def fn(
        key: tuple, pdfs: Iterator[pd.DataFrame], state: GroupState
    ) -> Iterator[pd.DataFrame]:
        if state.exists:
            run, last_us = state.get
        else:
            run, last_us = 0, None
        rows = pd.concat(list(pdfs)).sort_values(time_col)
        out = {"alert_key": [], "window_start": [], "value": [], "breach_run": [], "alert": []}
        for _, row in rows.iterrows():
            ts_us = int(row[time_col].value // 1000)
            if last_us is not None and ts_us <= last_us:
                continue  # late/duplicate window: the run counter only
                # advances forward in time (watermark-style drop policy)
            last_us = ts_us
            run = run + 1 if row[value_col] > threshold else 0
            out["alert_key"].append(key[0])
            out["window_start"].append(row[time_col])
            out["value"].append(float(row[value_col]))
            out["breach_run"].append(run)
            out["alert"].append(run >= consecutive)
        state.update((run, last_us))
        yield pd.DataFrame(out)

    return windowed.groupBy(key_col).applyInPandasWithState(
        fn,
        outputStructType=ALERT_SCHEMA,
        stateStructType=_STATE_SCHEMA,
        outputMode="append",
        timeoutConf=GroupStateTimeout.NoTimeout,
    )


SPIKE_SCHEMA = T.StructType(
    [
        T.StructField("group_key", T.StringType()),
        T.StructField("bucket_start", T.TimestampType()),
        T.StructField("n_events", T.LongType()),
        T.StructField("mean_prev", T.DoubleType()),
        T.StructField("std_prev", T.DoubleType()),
        T.StructField("zscore", T.DoubleType()),
        T.StructField("spike", T.IntegerType()),
    ]
)

_SPIKE_STATE_SCHEMA = T.StructType(
    [
        T.StructField("history", T.ArrayType(T.LongType())),
        T.StructField("last_bucket_us", T.LongType()),
    ]
)


def streaming_zscore_spikes(
    windowed: DataFrame,
    key_col: str,
    time_col: str,
    count_col: str,
    lookback: int = 10,
    min_history: int = 5,
    z_threshold: float = 3.0,
) -> DataFrame:
    """Streaming twin of ``operators.monitoring.rolling_zscore_spikes``:
    per-key state is the last ``lookback`` bucket counts; each arriving
    bucket is scored against that history's mean/std, then appended.
    The moments are computed from exact integer sums — the identical
    formula as the batch operator, so the two twins agree bucket-for-
    bucket (pinned by a unit test). Late/duplicate buckets are dropped
    (the baseline only advances forward in time), matching the batch
    ROW-frame semantics on an ordered series.

    State per key is O(lookback) longs — thousands of groups cost
    kilobytes; the state store never grows with stream length.
    """
    if lookback < 2 or min_history < 2 or min_history > lookback:
        raise ValueError(
            f"need 2 <= min_history <= lookback, got {min_history}/{lookback}"
        )

    def fn(
        key: tuple, pdfs: Iterator[pd.DataFrame], state: GroupState
    ) -> Iterator[pd.DataFrame]:
        if state.exists:
            hist, last_us = state.get
            hist = list(hist)
        else:
            hist, last_us = [], None
        rows = pd.concat(list(pdfs)).sort_values(time_col)
        out = {c: [] for c in (
            "group_key", "bucket_start", "n_events",
            "mean_prev", "std_prev", "zscore", "spike",
        )}
        for _, row in rows.iterrows():
            ts_us = int(row[time_col].value // 1000)
            if last_us is not None and ts_us <= last_us:
                continue
            last_us = ts_us
            x = int(row[count_col])
            n = len(hist)
            mean = std = z = None
            spike = 0
            if n >= min_history:
                s1 = sum(hist)            # exact ints, same math as batch
                s2 = sum(v * v for v in hist)
                m = s1 / n
                var = (s2 - (s1 * s1) / n) / (n - 1)
                if var > 0:
                    sd = var ** 0.5
                    zz = (x - m) / sd
                    mean, std, z = round(m, 4), round(sd, 4), round(zz, 4)
                    spike = int(abs(zz) >= z_threshold)
            out["group_key"].append(key[0])
            out["bucket_start"].append(row[time_col])
            out["n_events"].append(x)
            out["mean_prev"].append(mean)
            out["std_prev"].append(std)
            out["zscore"].append(z)
            out["spike"].append(spike)
            hist.append(x)
            if len(hist) > lookback:
                hist = hist[-lookback:]
        state.update((hist, last_us))
        yield pd.DataFrame(out)

    return windowed.groupBy(key_col).applyInPandasWithState(
        fn,
        outputStructType=SPIKE_SCHEMA,
        stateStructType=_SPIKE_STATE_SCHEMA,
        outputMode="append",
        timeoutConf=GroupStateTimeout.NoTimeout,
    )


LATEST_SCHEMA = T.StructType(
    [
        T.StructField("key", T.StringType()),
        T.StructField("last_ts", T.TimestampType()),
        T.StructField("last_tiebreak", T.LongType()),
        T.StructField("last_state", T.StringType()),
    ]
)

_LATEST_STATE_SCHEMA = T.StructType(
    [
        T.StructField("ts_us", T.LongType()),
        T.StructField("tiebreak", T.LongType()),
        T.StructField("state", T.StringType()),
    ]
)


def streaming_latest_state(
    df: DataFrame,
    key_col: str,
    ts_col: str,
    tiebreak_col: str,
    state_col: str,
    ttl_seconds: float | None = None,
    watermark_delay: str = "10 seconds",
) -> DataFrame:
    """Streaming twin of ``operators.cdc.latest_state``: maintain the
    type-1 "current state" table incrementally. Per-key state is the
    single winning (ts, tiebreak, state) triple — O(1) per key, never
    grows with stream length; ordering is (ts, tiebreak) DESC exactly
    as the batch twin, so late/duplicate deliveries that lose the
    comparison mutate nothing.

    Emits, per key per micro-batch, the current row AFTER the batch —
    and only when the batch actually changed it (a changelog of
    current-state transitions, the foreachBatch-ready shape for
    upserting into a serving table). Batch/stream parity is pinned by
    a unit test.

    ``ttl_seconds`` bounds the state store — the property that keeps
    an unbounded-key stream (file ids, request ids) alive at 100 TB:
    a key whose newest event is ``ttl_seconds`` older than the stream's
    EVENT-TIME watermark (advanced by ``watermark_delay`` behind max
    event time) is EVICTED and a tombstone row (NULL last_state,
    last_tiebreak = -1) emitted so downstream upsert sinks can clear
    it; a later event for the key simply re-creates state. Event-time
    (not wall-clock) expiry keeps eviction deterministic and
    replay-safe — a reprocessed stream evicts identically. Without TTL
    the store grows with distinct keys forever.
    """
    use_ttl = ttl_seconds is not None
    if use_ttl and ttl_seconds <= 0:
        raise ValueError(f"ttl_seconds must be positive, got {ttl_seconds}")

    def fn(
        key: tuple, pdfs: Iterator[pd.DataFrame], state: GroupState
    ) -> Iterator[pd.DataFrame]:
        if use_ttl and state.hasTimedOut:
            state.remove()  # watermark passed last_event_ts + ttl
            yield pd.DataFrame(
                {
                    "key": [key[0]],
                    "last_ts": [None],
                    "last_tiebreak": [-1],
                    "last_state": [None],
                }
            )
            return
        cur = tuple(state.get) if state.exists else None
        changed = False
        for pdf in pdfs:
            for _, row in pdf.iterrows():
                # malformed events (NULL ts / NULL tiebreak) are skipped:
                # NaT.value is an int64 sentinel that would silently lose
                # every comparison, and int(None) would kill the query —
                # the batch twin's window ordering tolerates both
                if pd.isna(row[ts_col]) or pd.isna(row[tiebreak_col]):
                    continue
                ts_us = int(row[ts_col].value // 1000)
                tb = int(row[tiebreak_col])
                if cur is None or (ts_us, tb) > (cur[0], cur[1]):
                    st = row[state_col]
                    cur = (ts_us, tb, None if pd.isna(st) else str(st))
                    changed = True
        if changed:
            state.update(cur)
            if use_ttl:
                # expire when the watermark passes newest-event + ttl;
                # must stay ahead of the current watermark or Spark
                # rejects the timestamp
                state.setTimeoutTimestamp(
                    max(
                        cur[0] // 1000 + int(ttl_seconds * 1000),
                        state.getCurrentWatermarkMs() + 1,
                    )
                )
            yield pd.DataFrame(
                {
                    "key": [key[0]],
                    "last_ts": [pd.Timestamp(cur[0], unit="us")],
                    "last_tiebreak": [cur[1]],
                    "last_state": [cur[2]],
                }
            )
        else:
            if use_ttl and state.exists:
                # refreshing nothing: keep the eviction clock armed
                state.setTimeoutTimestamp(
                    max(
                        tuple(state.get)[0] // 1000 + int(ttl_seconds * 1000),
                        state.getCurrentWatermarkMs() + 1,
                    )
                )
            yield pd.DataFrame(
                {"key": [], "last_ts": [], "last_tiebreak": [], "last_state": []}
            )

    if use_ttl:
        df = df.withWatermark(ts_col, watermark_delay)
    return df.groupBy(key_col).applyInPandasWithState(
        fn,
        outputStructType=LATEST_SCHEMA,
        stateStructType=_LATEST_STATE_SCHEMA,
        outputMode="append",
        timeoutConf=(
            GroupStateTimeout.EventTimeTimeout
            if use_ttl
            else GroupStateTimeout.NoTimeout
        ),
    )


FUNNEL_SCHEMA = T.StructType(
    [
        T.StructField("key", T.StringType()),
        T.StructField("steps_completed", T.IntegerType()),
        T.StructField("step_times", T.ArrayType(T.DoubleType())),
    ]
)

_FUNNEL_STATE_SCHEMA = T.StructType(
    [T.StructField("times", T.ArrayType(T.DoubleType()))]
)


def streaming_funnel(
    df: DataFrame,
    key_col: str,
    ts_col: str,
    step_flag_cols: list[str],
    max_gap_seconds: float | None = None,
    tiebreak_col: str | None = None,
) -> DataFrame:
    """Streaming twin of ``operators.funnel.funnel_completion``: per-key
    state is the completion-time chain so far (O(steps) doubles — never
    grows with stream length). Each micro-batch's events are processed
    in event-time order and advance the chain greedily with the SAME
    rule as the batch twin (next needed step, strictly after the last
    completion, optional conversion window), so with per-key in-order
    delivery (ST2) the two agree exactly — pinned by a unit test.
    An event arriving AFTER a later-timestamped event already consumed
    (cross-batch disorder) cannot retro-fill a step: completions are
    monotone, the standard live-funnel approximation.

    ``step_flag_cols`` are boolean columns (pre-computed predicates —
    streaming-safe projection of the batch API's Column predicates).
    Emits one row per key per batch IFF the chain advanced.

    ``tiebreak_col`` (e.g. a unique event id) makes equal-timestamp
    ordering deterministic: the batch twin orders by (ts, tiebreak),
    and pandas' default quicksort is unstable, so without it two
    same-tick events could be consumed in either order and diverge
    from the batch result. With it, events sort by (ts, tiebreak)
    using a stable mergesort — exact batch parity.
    """
    if not step_flag_cols:
        raise ValueError("need at least one funnel step")
    n = len(step_flag_cols)

    def fn(
        key: tuple, pdfs: Iterator[pd.DataFrame], state: GroupState
    ) -> Iterator[pd.DataFrame]:
        times = list(state.get[0]) if state.exists else []
        before = len(times)
        sort_cols = [ts_col] + ([tiebreak_col] if tiebreak_col else [])
        rows = pd.concat(list(pdfs)).sort_values(sort_cols, kind="mergesort")
        for _, row in rows.iterrows():
            if len(times) >= n:
                break
            if pd.isna(row[ts_col]):
                # NULL ts: NaT.value is the int64 sentinel (-9.2e18 ns)
                # and would record a garbage completion at t≈-9.2e9; the
                # batch twin's NULL comparison never advances — skip
                continue
            t = row[ts_col].value / 1e9  # epoch seconds, µs precision
            flag = row[step_flag_cols[len(times)]]
            ok = bool(flag) and not pd.isna(flag)
            if ok and times:
                ok = t > times[-1] and (
                    max_gap_seconds is None or t <= times[-1] + max_gap_seconds
                )
            if ok:
                times.append(t)
        if len(times) > before:
            state.update((times,))
            yield pd.DataFrame(
                {
                    "key": [key[0]],
                    "steps_completed": [len(times)],
                    "step_times": [times],
                }
            )
        else:
            yield pd.DataFrame({"key": [], "steps_completed": [], "step_times": []})

    return df.groupBy(key_col).applyInPandasWithState(
        fn,
        outputStructType=FUNNEL_SCHEMA,
        stateStructType=_FUNNEL_STATE_SCHEMA,
        outputMode="append",
        timeoutConf=GroupStateTimeout.NoTimeout,
    )
