"""Custom stateful streaming operator: session aggregation with
``applyInPandasWithState`` (SURVEY §2.5: the reference has no streaming
at all — this is the Spark-first extension for event streams).

Per user, events are folded into sessions closed after ``gap`` of
event-time inactivity; closed sessions are emitted, open sessions live
in the state store and survive microbatches/restarts (checkpointed).
"""

from __future__ import annotations

from collections.abc import Iterator

import pandas as pd

from pyspark.sql import functions as F
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout

OUTPUT_SCHEMA = (
    "user_id long, session_start timestamp, session_end timestamp, n_events long"
)
STATE_SCHEMA = "start long, end long, n long"

GAP_US_DEFAULT = 1_800_000_000  # 30 min


def _fold_sessions(
    key, pdfs: Iterator[pd.DataFrame], state: GroupState, gap_us: int,
    use_timeout: bool,
) -> Iterator[pd.DataFrame]:
    (user_id,) = key
    if state.exists:
        start, end, n = state.get
    else:
        start = end = n = None
    closed = []
    if state.hasTimedOut:
        if n is not None:
            closed.append((start, end, n))
        state.remove()
        n = None
    else:
        ts_all = (
            pd.concat([p["ts"] for p in pdfs]).sort_values().astype("int64")
        )  # event-time micros
        for t in ts_all:
            t = int(t)
            if n is None:
                start, end, n = t, t, 1
            elif t - end > gap_us:
                closed.append((start, end, n))
                start, end, n = t, t, 1
            else:
                end = max(end, t)
                n += 1
        if n is not None:
            state.update((start, end, n))
            if use_timeout:
                # close the open session if no events arrive within the
                # gap (continuous mode only: a registered timeout keeps
                # an availableNow query alive indefinitely)
                state.setTimeoutDuration(gap_us // 1000)
    if closed:
        yield pd.DataFrame(
            {
                "user_id": [user_id] * len(closed),
                "session_start": pd.to_datetime([c[0] for c in closed], unit="us"),
                "session_end": pd.to_datetime([c[1] for c in closed], unit="us"),
                "n_events": [c[2] for c in closed],
            }
        )


def streaming_sessionize(
    spark,
    events_dir: str,
    schema,
    checkpoint_dir: str,
    gap_us: int = GAP_US_DEFAULT,
    queryName: str = "sessions",
    use_timeout: bool = False,
):
    """readStream -> stateful sessionization -> memory sink.

    ``use_timeout=True`` enables processing-time timeouts that close
    idle open sessions — for continuously-running queries. Leave False
    for drain-and-stop (availableNow) runs: a registered timeout keeps
    the query alive forever waiting for the timer.
    """
    ev = (
        spark.readStream.schema(schema)
        .parquet(events_dir)
        .select("user_id", F.unix_micros(F.col("ts").cast("timestamp")).alias("ts"))
    )

    def fold(key, pdfs, state):
        return _fold_sessions(key, pdfs, state, gap_us, use_timeout)

    out = ev.groupBy("user_id").applyInPandasWithState(
        fold,
        outputStructType=OUTPUT_SCHEMA,
        stateStructType=STATE_SCHEMA,
        outputMode="append",
        timeoutConf=(
            GroupStateTimeout.ProcessingTimeTimeout
            if use_timeout
            else GroupStateTimeout.NoTimeout
        ),
    )
    return (
        out.writeStream.outputMode("append")
        .format("memory")
        .queryName(queryName)
        .option("checkpointLocation", checkpoint_dir)
        .trigger(availableNow=True)
        .start()
    )
