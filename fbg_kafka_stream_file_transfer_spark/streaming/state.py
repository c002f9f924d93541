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
