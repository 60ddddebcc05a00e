"""Streaming per-user velocity rule — the stateful-streaming twin of the
batch ``burst_detection`` query (plans/queries_wave4.py).

Fraud/abuse velocity rules ("more than K events in 10 minutes") must run
ON the stream in production; this is the ``applyInPandasWithState``
spelling: per-user state carries (a) the trailing-window event buffer —
only events newer than ``max_seen_sec - window_sec``, so state is
bounded by the user's event rate x window, never their history — and
(b) the running peak counters.  Each micro-batch emits the user's
updated lifetime stats; with chronological arrival the final emitted row
per user is bit-identical to the batch query's rollup (asserted in
tests/test_wave4.py::test_streaming_velocity_equals_batch).

Out-of-order arrival (a late file with seconds below the state's
``max_seen_sec``) violates that contract: the late event's window may
already be evicted and later frames were already emitted.  Such events
are dropped EXPLICITLY and counted in the ``n_late`` output column —
observable, never a silent understatement.

Reference parity: the reference has no streaming surface; this extends
the round-barrier pattern of streaming/rounds.py:streaming_fedavg to a
sliding-window stateful operator (SURVEY.md §2.8).
"""

from __future__ import annotations

from typing import Iterator

import pandas as pd

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout
from pyspark.sql.types import (
    ArrayType,
    DoubleType,
    LongType,
    StructField,
    StructType,
)

EVENT_SCHEMA = StructType(
    [
        StructField("user_id", LongType()),
        StructField("sec", LongType()),
        StructField("value", DoubleType()),
    ]
)

STATE_SCHEMA = StructType(
    [
        StructField("secs", ArrayType(LongType())),
        StructField("vals", ArrayType(DoubleType())),
        StructField("peak_burst", LongType()),
        StructField("n_burst_events", LongType()),
        StructField("peak_value", DoubleType()),
        StructField("n_events", LongType()),
        StructField("max_seen_sec", LongType()),
        StructField("n_late", LongType()),
    ]
)

OUTPUT_SCHEMA = StructType(
    [
        StructField("user_id", LongType()),
        StructField("peak_burst", LongType()),
        StructField("n_burst_events", LongType()),
        StructField("peak_value", DoubleType()),
        StructField("n_events", LongType()),
        StructField("n_late", LongType()),
    ]
)


def _velocity_fn(window_sec: int, threshold: int):
    def fn(
        key: tuple,
        pdfs: Iterator[pd.DataFrame],
        state: GroupState,
    ) -> Iterator[pd.DataFrame]:
        if state.exists:
            (secs, vals, peak, n_burst, peak_val, n_ev,
             max_seen, n_late) = state.get
            secs, vals = list(secs), list(vals)
        else:
            secs, vals, peak, n_burst, peak_val, n_ev = [], [], 0, 0, 0.0, 0
            max_seen, n_late = None, 0
        new = pd.concat(list(pdfs), ignore_index=True)
        # Chronological-arrival contract across micro-batches: an event
        # older than the state's max seen second arrives after frames at
        # later seconds were already emitted (and its own window may be
        # evicted) — silently merging it would understate past bursts.
        # Drop such late events EXPLICITLY and count them in n_late so
        # contract violations are observable, not silent.
        if max_seen is not None:
            late_mask = new["sec"] < max_seen
            n_late += int(late_mask.sum())
            new = new[~late_mask]
        # process in event-time order, one distinct second at a time:
        # the batch query's RANGE frame includes ALL equal-timestamp
        # peers, so tied events must enter the buffer together and share
        # one frame reading
        new = new.sort_values(["sec", "value"], kind="mergesort")
        for sec, grp in new.groupby("sec", sort=True):
            c = len(grp)
            secs.extend([int(sec)] * c)
            vals.extend(float(v) for v in grp["value"].tolist())
            lo = sec - window_sec
            # retained buffer is sorted; drop events outside every
            # future window (they can never re-enter: sec only grows)
            while secs and secs[0] < lo:
                secs.pop(0)
                vals.pop(0)
            burst_n = len(secs)
            burst_v = float(sum(vals))
            n_ev += c
            if burst_n >= threshold:
                n_burst += c
            if burst_n > peak:
                peak = burst_n
            if burst_v > peak_val:
                peak_val = burst_v
        if len(new):
            max_seen = int(new["sec"].max()) if max_seen is None else max(
                max_seen, int(new["sec"].max())
            )
        state.update(
            (secs, vals, int(peak), int(n_burst), float(peak_val),
             int(n_ev), max_seen if max_seen is not None else -(1 << 62),
             int(n_late))
        )
        yield pd.DataFrame(
            {
                "user_id": [key[0]],
                "peak_burst": [int(peak)],
                "n_burst_events": [int(n_burst)],
                "peak_value": [float(peak_val)],
                "n_events": [int(n_ev)],
                "n_late": [int(n_late)],
            }
        )

    return fn


def streaming_velocity(
    spark: SparkSession,
    events_dir: str,
    window_sec: int = 600,
    threshold: int = 5,
) -> DataFrame:
    """Watch ``events_dir`` for (user_id, sec, value) parquet arrivals;
    emit each touched user's updated lifetime velocity stats per
    micro-batch."""
    events = spark.readStream.schema(EVENT_SCHEMA).parquet(events_dir)
    return events.groupBy("user_id").applyInPandasWithState(
        _velocity_fn(window_sec, threshold),
        outputStructType=OUTPUT_SCHEMA,
        stateStructType=STATE_SCHEMA,
        outputMode="append",
        timeoutConf=GroupStateTimeout.NoTimeout,
    )
