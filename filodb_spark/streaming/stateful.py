"""Custom stateful streaming operators (applyInPandasWithState).

The reference detects counter drops at ingest (detectDrops=true column
param, Column.scala:46, DoubleCounterAppender) keeping per-series state
in the write buffers. The Structured Streaming equivalent is a grouped
stateful map: state = last (ts, value) per series, persisted in the
state store across micro-batches (and across restarts via checkpoint).

This operator emits one event per detected counter reset — the
streaming building block for ingest-side monitoring; query-time rate
correction stays the source of truth (SURVEY §2.11).
"""

from __future__ import annotations

from typing import Iterable, Iterator, Tuple

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout

RESET_SCHEMA = "series string, ts long, value double, prev_value double"
STATE_SCHEMA = "last_ts long, last_value double"


def _detect_resets(key: Tuple[str],
                   pdfs: Iterator[pd.DataFrame],
                   state: GroupState) -> Iterator[pd.DataFrame]:
    (series,) = key
    if state.exists:
        last_ts, last_value = state.get
    else:
        last_ts, last_value = -1, None
    rows = pd.concat(list(pdfs)).sort_values("ts")
    out = []
    for ts, v in zip(rows["ts"], rows["value"]):
        ts = int(ts)
        if ts <= last_ts:
            continue  # out-of-order: dropped (append-only invariant)
        if last_value is not None and v < last_value:
            out.append((series, ts, float(v), float(last_value)))
        last_ts, last_value = ts, float(v)
    state.update((last_ts, last_value))
    yield pd.DataFrame(out, columns=["series", "ts", "value", "prev_value"])


def streaming_sessionize(stream: DataFrame, key_cols: Iterable[str],
                         gap: str = "30 minutes",
                         event_time_col: str = "event_time",
                         watermark_delay: str = "10 minutes",
                         value_col: str | None = "value") -> DataFrame:
    """Streaming sessionization: the incremental variant of
    operators.timeseries.sessionize, built on Spark's native
    session_window (dynamic-gap session state in the state store — no
    custom stateful UDF needed; state for a session is evicted once the
    watermark passes its close, so it is bounded by watermark + gap).

    Emits one row per CLOSED session (append mode semantics): keys,
    session start/end, event count, value sum. Late events within the
    watermark re-open/merge sessions exactly like the batch gap rule.
    """
    aggs = [F.count(F.lit(1)).alias("n_events")]
    if value_col is not None:
        aggs.append(F.sum(F.col(value_col)).alias("value_sum"))
    keys = [F.col(k) for k in key_cols]
    return (stream
            .withWatermark(event_time_col, watermark_delay)
            .groupBy(*keys, F.session_window(F.col(event_time_col), gap))
            .agg(*aggs)
            .select(*keys,
                    F.col("session_window.start").alias("session_start"),
                    F.col("session_window.end").alias("session_end"),
                    "n_events",
                    *(["value_sum"] if value_col is not None else [])))


def streaming_funnel(stream: DataFrame, steps: list[str],
                     key_col: str = "user_id", ts_col: str = "ts",
                     type_col: str = "event_type",
                     window_ms: int | None = None) -> DataFrame:
    """Incremental strict-order funnel: the streaming twin of
    operators.timeseries.funnel. Per-key state is the fixed-size tuple
    of matched step timestamps (D longs — bounded by construction, no
    per-event state growth), advanced as events arrive; each
    advancement emits (key, step, ts, completed). On in-order input the
    final per-key depths equal the batch funnel's exactly; out-of-order
    events that arrive after a later step already matched cannot
    retroactively rewrite the match (the documented stream-vs-batch
    delta — re-run the batch funnel for the closed-book answer, the
    same split every stream/batch pair here draws).

    Emits in append mode; completed=true on the row that reaches the
    final step."""
    D = len(steps)
    if D < 2:
        raise ValueError("funnel needs at least 2 steps")
    # key type follows the input (string user ids work like the batch twin)
    key_t = stream.schema[key_col].dataType.simpleString()
    out_schema = f"{key_col} {key_t}, step int, ts long, completed boolean"
    state_schema = ", ".join(f"t{d} long" for d in range(1, D + 1))

    def advance(key, pdfs, state: GroupState):
        (user,) = key
        ts_list = list(state.get) if state.exists else [None] * D
        rows = pd.concat(list(pdfs)).sort_values(ts_col)
        out = []
        for ts, et in zip(rows[ts_col], rows[type_col]):
            d = 0
            while d < D and ts_list[d] is not None:
                d += 1
            if d >= D:
                break                      # funnel already complete
            ts = int(ts)
            if et != steps[d]:
                continue
            if d > 0 and ts <= ts_list[d - 1]:
                continue                   # strictly-after semantics
            if window_ms is not None and d > 0 \
                    and ts - ts_list[0] > window_ms:
                continue
            ts_list[d] = ts
            out.append((user, d + 1, ts, d + 1 == D))
        state.update(tuple(ts_list))
        yield pd.DataFrame(out, columns=[key_col, "step", "ts",
                                         "completed"])

    src = stream.select(F.col(key_col), F.col(ts_col), F.col(type_col))
    return (src.groupBy(key_col)
            .applyInPandasWithState(advance,
                                    outputStructType=out_schema,
                                    stateStructType=state_schema,
                                    outputMode="append",
                                    timeoutConf=GroupStateTimeout.NoTimeout))


def streaming_rolling(stream: DataFrame, key_col: str = "user_id",
                      window_ms: int = 3600_000, ts_col: str = "ts",
                      value_col: str = "value",
                      max_state_rows: int = 10_000) -> DataFrame:
    """Incremental trailing-window features: the streaming twin of
    operators.timeseries.rolling_features. Per-key state is the samples
    inside the trailing window of the newest timestamp seen — bounded
    by the key's event rate x window (and hard-capped at
    `max_state_rows`, evicting oldest, as the state-store guard).

    Same-timestamp rows arriving in ONE batch share a frame exactly
    like the batch RANGE semantics; on in-order input the emitted
    features equal the batch operator's. Out-of-order rows older than
    the newest processed timestamp are dropped (append-only
    discipline; the batch re-run owns the closed-book answer — the
    same stream/batch split as funnel/dedup/downsample).

    Emits (key, ts, value, w_count, w_sum, w_mean) per event, append
    mode."""
    key_t = stream.schema[key_col].dataType.simpleString()
    out_schema = (f"{key_col} {key_t}, ts long, value double, "
                  "w_count long, w_sum double, w_mean double")
    state_schema = "ts array<bigint>, vals array<double>"

    def advance(key, pdfs, state: GroupState):
        (user,) = key
        buf_ts, buf_v = ([list(x) for x in state.get]
                         if state.exists else ([], []))
        last = buf_ts[-1] if buf_ts else None
        rows = pd.concat(list(pdfs)).sort_values(ts_col)
        out = []
        for ts, grp in rows.groupby(ts_col, sort=True):
            ts = int(ts)
            if last is not None and ts < last:
                continue                   # stale arrival: dropped
            for v in grp[value_col]:
                buf_ts.append(ts)
                buf_v.append(float(v))
            lo = ts - window_ms
            while buf_ts and (buf_ts[0] < lo
                              or len(buf_ts) > max_state_rows):
                buf_ts.pop(0)
                buf_v.pop(0)
            n, s = len(buf_ts), sum(buf_v)
            for v in grp[value_col]:
                out.append((user, ts, float(v), n, round(s, 6),
                            round(s / n, 6)))
            last = ts
        state.update((buf_ts, buf_v))
        yield pd.DataFrame(out, columns=[key_col, "ts", "value",
                                         "w_count", "w_sum", "w_mean"])

    src = stream.select(F.col(key_col), F.col(ts_col).alias("ts"),
                        F.col(value_col).alias("value"))
    return (src.groupBy(key_col)
            .applyInPandasWithState(advance,
                                    outputStructType=out_schema,
                                    stateStructType=state_schema,
                                    outputMode="append",
                                    timeoutConf=GroupStateTimeout.NoTimeout))


def reset_events(stream: DataFrame, series_col: str = "series",
                 ts_col: str = "ts", value_col: str = "value") -> DataFrame:
    """Streaming counter-reset events per series.

    Input: a streaming DataFrame with (series, ts, value). Output stream:
    one row per reset (value dropped below the last seen value), with
    out-of-order samples dropped against the persisted state.
    """
    src = stream.select(F.col(series_col).alias("series"),
                        F.col(ts_col).alias("ts"),
                        F.col(value_col).alias("value"))
    return (src.groupBy("series")
            .applyInPandasWithState(_detect_resets,
                                    outputStructType=RESET_SCHEMA,
                                    stateStructType=STATE_SCHEMA,
                                    outputMode="append",
                                    timeoutConf=GroupStateTimeout.NoTimeout))
