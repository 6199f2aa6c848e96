"""Streaming twin of operators/features.rolling_event_features.

Per-event history features computed ONLINE: a feature store's serving
path keeps each entity's tail state (previous event, last n-1 values,
running count) and emits one feature row per arriving event — the
same applyInPandasWithState shape as the streaming sessionizer, but
append-per-event (no timeout: there is nothing to flush, every input
row emits immediately).

Equivalence contract (pinned by the x_stream_rolling gate, which runs
the stream against the SAME oracle SQL as the batch gate): for a
single-batch input each entity's full history arrives in one group
call, the kernel sorts by (ts, event_id) — the batch operator's exact
window order — and the emitted rows equal the batch twin row-for-row.
Across batches the state carries (last_us, last_val, tail values,
count), so the concatenation of per-batch emissions still equals the
batch run over the concatenated input as long as event time is
non-decreasing between batches per entity (the file-source single-file
setup used here guarantees it trivially).

Scale: state is O(n_last) doubles per LIVE entity; the shuffle is the
same one Exchange on the entity key the batch window pays.
"""

from __future__ import annotations

FEATURE_OUT_SCHEMA = (
    "event_id bigint, user_id bigint, ts timestamp, value double, "
    "prev_value double, gap_us bigint, roll_mean double, cum_events bigint"
)
_STATE_SCHEMA = (
    "vals array<double>, cnt bigint, last_us bigint, last_val double"
)


def _rolling_with_state(n_last: int):
    import pandas as pd

    def fn(key, pdfs, state):
        if state.exists:
            vals_t, cnt, last_us, last_val = state.get
            vals = list(vals_t) if vals_t is not None else []
        else:
            vals, cnt, last_us, last_val = [], 0, None, None
        pdf = pd.concat(list(pdfs)).sort_values(["ts", "event_id"])
        out = []
        uid = key[0]
        for r in pdf.itertuples():
            ts_us = r.ts.value // 1000  # pandas ns epoch → µs
            window = vals[-(n_last - 1):] + [r.value]
            cnt += 1
            out.append(
                (
                    r.event_id,
                    uid,
                    r.ts,
                    r.value,
                    last_val,
                    (ts_us - last_us) if last_us is not None else None,
                    sum(window) / len(window),
                    cnt,
                )
            )
            vals = (vals + [r.value])[-(n_last - 1):]
            last_us, last_val = ts_us, r.value
        state.update((vals, cnt, last_us, last_val))
        yield pd.DataFrame(
            out,
            columns=[
                "event_id", "user_id", "ts", "value", "prev_value",
                "gap_us", "roll_mean", "cum_events",
            ],
        )

    return fn


def stream_rolling_features(
    spark,
    input_path: str,
    output_path: str,
    checkpoint_path: str,
    *,
    schema: str = (
        "event_id bigint, ts timestamp, user_id bigint, event_type string, "
        "value double, props string"
    ),
    n_last: int = 5,
    watermark: str = "30 minutes",
):
    """File-source stream → per-entity stateful rolling features →
    parquet, Trigger.AvailableNow."""
    from pyspark.sql.streaming.state import GroupStateTimeout

    events = (
        spark.readStream.schema(schema)
        .parquet(input_path)
        .withWatermark("ts", watermark)
    )
    feats = events.groupBy("user_id").applyInPandasWithState(
        _rolling_with_state(n_last),
        outputStructType=FEATURE_OUT_SCHEMA,
        stateStructType=_STATE_SCHEMA,
        outputMode="append",
        timeoutConf=GroupStateTimeout.NoTimeout,
    )
    return (
        feats.writeStream.format("parquet")
        .option("path", output_path)
        .option("checkpointLocation", checkpoint_path)
        .outputMode("append")
        .trigger(availableNow=True)
        .start()
    )
