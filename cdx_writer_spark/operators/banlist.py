"""Banlist prefix-dedup (A2, reference tests/clean_the_banlist.py:138-146):
from a set of URL prefixes, drop every entry that has a SHORTER entry as
a prefix (the shorter ban subsumes the longer one).

Reference algorithm: sort the set shortest-first and keep a url only if
no already-kept url is its prefix — O(n·kept) single-process.  Identical
result, distributed: a url is dropped iff ANY other url in the set is a
strict prefix of it (the minimal such prefix is itself prefix-free, hence
always kept — so "kept prefix" and "any prefix" select the same set).

Scale shape: in LEXICOGRAPHIC order all extensions of a url follow it
contiguously, so one ordered scan with a single "last kept" cursor
decides every row.  Distributed = range-partition + per-partition scan
(mapInPandas), then a boundary fix: the last kept entry of an earlier
partition may prefix the head of a later one.  The driver only ever sees
ONE string per partition (its last kept entry) — partition-count
metadata, like distributed_top_k — from which the carry-in prefix per
partition follows sequentially:

  if a partition's last kept entry starts with the carry, EVERY entry of
  that partition does (any non-extension s with carry <= s would exceed
  the last entry at the first differing byte), so the whole partition is
  dropped and the carry rides through unchanged; otherwise the carry for
  the next partition is this partition's last kept entry.
"""

from __future__ import annotations

import pandas as pd
from pyspark.sql import DataFrame, functions as F

__all__ = ["prefix_free"]


SMALL_LIST_ROWS = 50_000


def prefix_free(urls: DataFrame, col: str = "url") -> DataFrame:
    """The prefix-free subset of a url-prefix table (one string column).

    Small lists (reference-scale exclude files, below SMALL_LIST_ROWS
    after dedup) skip the distributed machinery: one single-partition
    ordered scan, no checkpoints, no boundary-carry collect — the
    distributed path's 3 fixed Spark jobs otherwise dominate sub-second
    inputs."""
    # lazy checkpoint before counting: the count materializes the
    # distinct ONCE; both downstream paths then read the persisted
    # blocks instead of recomputing the dedup shuffle a second time
    d = urls.select(col).distinct().localCheckpoint(eager=False)
    n = d.count()
    if n < SMALL_LIST_ROWS:
        def scan_one(batches):
            last = None
            for pdf in batches:
                keep = []
                for u in pdf[col]:
                    if last is None or not u.startswith(last):
                        keep.append(u)
                        last = u
                yield pd.DataFrame({col: keep})

        return (d.coalesce(1).sortWithinPartitions(col)
                .mapInPandas(scan_one, f"`{col}` string"))
    # lazy checkpoints: the boundary-fix collect below is the first
    # consumer and materializes both frames in-line (no dedicated jobs);
    # later consumers read the persisted blocks
    ranged = (d.repartitionByRange(F.col(col))
              .sortWithinPartitions(col)
              .localCheckpoint(eager=False))

    def scan(batches):
        from pyspark import TaskContext
        pid = TaskContext.get().partitionId()
        last = None
        for pdf in batches:
            keep = []
            for u in pdf[col]:
                if last is None or not u.startswith(last):
                    keep.append(u)
                    last = u
            yield pd.DataFrame({col: keep, "_pid": [pid] * len(keep)})

    kept = ranged.mapInPandas(scan, f"{col} string, _pid int") \
                 .localCheckpoint(eager=False)
    # per-partition last kept entry = max (partition output is sorted)
    lasts = {r["_pid"]: r["_last"] for r in
             kept.groupBy("_pid").agg(F.max(col).alias("_last")).collect()}
    carry_in: dict[int, str] = {}
    carry = None
    for pid in sorted(lasts):
        if carry is not None:
            carry_in[pid] = carry
        if carry is None or not lasts[pid].startswith(carry):
            carry = lasts[pid]
    spark = urls.sparkSession
    if carry_in:
        cdf = spark.createDataFrame(
            [(p, c) for p, c in carry_in.items()], ["_pid", "_carry"])
        kept = (kept.join(F.broadcast(cdf), "_pid", "left")
                .filter(F.col("_carry").isNull()
                        | ~F.col(col).startswith(F.col("_carry"))))
    return kept.select(col)
