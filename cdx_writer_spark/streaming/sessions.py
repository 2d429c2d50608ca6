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

The gap-split is vectorized numpy per group micro-batch (diff > gap ->
segment bounds -> per-segment start/end/count), so the only Python-level
work per group is O(sessions), not O(events) — the 100 TB hot-path shape
(state is partitioned by user_id; Spark shuffles each user's events to
its state partition).
"""

from __future__ import annotations

import numpy as np
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
        closed = None
        # Arrow hands the group's micro-batch data as MULTIPLE chunks in
        # shuffle order; sorting each chunk alone would process events
        # out of time order and regress `last` backwards — concatenate
        # the whole group, sort ONCE
        chunks = [pdf for pdf in pdfs if len(pdf)]
        if chunks:
            pdf = (pd.concat(chunks, ignore_index=True)
                   .sort_values(["ts", "event_id"]))
            t = (pdf["ts"].to_numpy(dtype="datetime64[ns]")
                 .astype("int64") // 1_000_000_000)
            # vectorized gap-split: an event more than gap_sec after its
            # predecessor starts a new segment
            cut = np.flatnonzero(np.diff(t) > gap_sec) + 1
            bounds = np.concatenate(([0], cut, [len(t)]))
            seg_start = t[bounds[:-1]]
            seg_end = t[bounds[1:] - 1]
            seg_n = np.diff(bounds)
            if last is not None:
                if int(t[0]) - last <= gap_sec:
                    # the open tail session extends into segment 0
                    seg_start = seg_start.copy()
                    seg_n = seg_n.copy()
                    seg_start[0] = start
                    seg_n[0] += n
                else:
                    # the open tail session closes as-is, ahead of them
                    seg_start = np.concatenate(([start], seg_start))
                    seg_end = np.concatenate(([last], seg_end))
                    seg_n = np.concatenate(([n], seg_n))
            start = int(seg_start[-1])
            last = int(seg_end[-1])
            n = int(seg_n[-1])
            if len(seg_start) > 1:
                closed = pd.DataFrame(
                    {"user_id": user_id,
                     "start_ts": seg_start[:-1],
                     "end_ts": seg_end[:-1],
                     "n_events": seg_n[:-1]})
        if last is not None:
            state.update((start, last, n))
        if closed is not None:
            yield closed

    return events.groupBy("user_id").applyInPandasWithState(
        fn, OUT_SCHEMA, STATE_SCHEMA, "append",
        GroupStateTimeout.NoTimeout)
