"""Custom stateful streaming operator: gap-based sessionization with
``applyInPandasWithState`` — the arbitrary-state API the engine uses
where windowed aggregation can't express the semantics (SURVEY.md §2.9;
the batch twin is plans/catalog.py::sessionize).

Semantics: per user, a session closes when the next event arrives more
than ``gap_sec`` after the previous one; CLOSED sessions are emitted in
append mode, the open tail session rides in the state store across
micro-batches (and across restarts — the state store is checkpointed).
tests/test_operators.py pins the emitted sessions against the batch
window computation on the same bounded input.

The per-event Python loop here is the REFERENCE implementation of the
operator contract, not the 100 TB hot path: at scale the same
applyInPandasWithState shape holds (state is partitioned by user_id —
Spark shuffles each user's events to its state partition), with the
loop vectorized per batch the way kernels/ does elsewhere.
"""

from __future__ import annotations

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql.streaming.state import GroupStateTimeout

__all__ = ["stateful_sessions"]

OUT_SCHEMA = ("user_id long, start_ts long, end_ts long, n_events long")
STATE_SCHEMA = "start_ts long, last_ts long, n long"


def stateful_sessions(events: DataFrame, gap_sec: int = 1800) -> DataFrame:
    """events(user_id, ts, event_id, ...) stream -> closed sessions."""

    def fn(key, pdfs, state):
        (user_id,) = key
        if state.exists:
            start, last, n = state.get
        else:
            start, last, n = None, None, 0
        closed = []
        # Arrow hands the group's micro-batch data as MULTIPLE chunks in
        # shuffle order; sorting each chunk alone would process events
        # out of time order and regress `last` backwards — concatenate
        # the whole group, sort ONCE
        chunks = [pdf for pdf in pdfs if len(pdf)]
        if chunks:
            pdf = (pd.concat(chunks, ignore_index=True)
                   .sort_values(["ts", "event_id"]))
            for ts in pdf["ts"]:
                t = int(ts.timestamp())
                if last is None:
                    start, last, n = t, t, 1
                elif t - last > gap_sec:
                    closed.append((user_id, start, last, n))
                    start, last, n = t, t, 1
                else:
                    last, n = t, n + 1
        if last is not None:
            state.update((start, last, n))
        if closed:
            yield pd.DataFrame(
                closed,
                columns=["user_id", "start_ts", "end_ts", "n_events"])

    return events.groupBy("user_id").applyInPandasWithState(
        fn, OUT_SCHEMA, STATE_SCHEMA, "append",
        GroupStateTimeout.NoTimeout)
