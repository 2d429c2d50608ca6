"""Scale-safe exclude-list filtering (F3, reference cdx_writer.py:625-633).

The reference checks each urlkey against every exclude prefix in a
per-record loop — fine for its 10^2-10^4-line lists.  Against a full
archive banlist (10^6+ prefixes, the clean_the_banlist.py use case) any
all-pairs shape — including Spark's broadcast nested-loop join — is
O(records x prefixes) compute, a scale-killer.  This module gives the
O((records + prefixes) log) alternative promised in SURVEY.md §2.3:

1. make the prefix list PREFIX-FREE (operators/banlist.py — a shorter
   ban subsumes every longer one), which guarantees that for any urlkey
   ``u`` the largest prefix ``p <= u`` in lexicographic order is THE
   only candidate match: every list element in ``(p, u]`` would have to
   start with ``p`` and so cannot coexist with it in a prefix-free set;
2. range-partition the union of urlkeys and prefixes on ONE shared set
   of bounds (tagged rows through a single repartitionByRange), sort
   within partitions with prefixes before identical urlkeys, and decide
   every record in one forward merge scan per partition — vectorized
   over runs of records sharing the same governing prefix;
3. fix the partition boundary exactly like banlist.py: the driver sees
   ONE string per partition (its last prefix), from which each
   partition's carry-in prefix follows sequentially.

Cost at scale: one range shuffle of the records (the only data-sized
move — there is no join, no per-prefix work per record), a shuffle of
the prefixes riding along, and partition-count metadata at the driver.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame, functions as F

__all__ = ["prefix_exclude_flag", "prefix_exclude_anti"]

_K, _TAG = "_xk", "_is_prefix"


def _ascii_below_del(arr) -> bool:
    """True iff every byte of every string in the Arrow array is < 0x7f
    (memory-speed scan of the raw UTF-8 buffer, ~1 ms / 5 MB)."""
    data = arr.buffers()[2]
    if data is None or len(data) == 0:
        return True
    return int(np.frombuffer(data, dtype=np.uint8).max()) < 0x7F


def _startswith_batch(keys: np.ndarray, gov: np.ndarray) -> np.ndarray:
    """Per-row ``keys[i].startswith(gov[i])`` (gov entries may be null).

    Fast path (pyarrow C kernels, measured 1.2-1.7x the zip loop at
    200k-row batches, any prefix density): because ``gov`` is the
    forward-fill of the sorted merge, ``gov <= key`` always holds, so
    ``key.startswith(gov)  <=>  key < gov + '\\x7f'`` — PROVIDED every
    code unit is below 0x7f.  SURT urlkeys are lowercase-ASCII by
    construction, so the raw-buffer guard almost never trips; when it
    does (exotic prefix lists), the exact per-row loop decides the
    whole batch.  (Run-grouping with a vectorized startswith per run
    was also measured: slower than the zip loop even at 11 runs/200k
    rows — pandas per-run slicing overhead dominates.)"""
    import pyarrow as pa
    import pyarrow.compute as pc
    ka = pa.array(keys, type=pa.string(), from_pandas=True)
    ga = pa.array(gov, type=pa.string(), from_pandas=True)
    if _ascii_below_del(ka) and _ascii_below_del(ga):
        hi = pc.binary_join_element_wise(ga, "\x7f", "")
        # the ge arm is implied by the ffill invariant (gov <= key) but
        # keeps the kernel correct for arbitrary inputs at ~no cost
        flag = pc.and_kleene(pc.greater_equal(ka, ga), pc.less(ka, hi))
        return pc.fill_null(flag, False).to_numpy(zero_copy_only=False)
    return np.array([isinstance(p, str) and k.startswith(p)
                     for k, p in zip(keys, gov)], dtype=bool)


def prefix_exclude_flag(records: DataFrame, prefixes: DataFrame,
                        key: str = "urlkey", flag_col: str = "excluded",
                        scratch: list | None = None) -> DataFrame:
    """Adds boolean ``flag_col``: True iff ``key`` starts with any prefix.

    ``prefixes`` is a one-column DataFrame (column ``prefix``).  Exact for
    arbitrary lists (subsumed prefixes are collapsed internally).

    ``scratch``: optional list — the checkpoint backing the merge is
    appended so loop-style callers can free its blocks with
    util.free_checkpoint once the result materializes; batch callers may
    ignore it (the blocks are bounded by the input and die with the
    session)."""
    from .banlist import prefix_free
    spark = records.sparkSession
    pf = prefix_free(prefixes.withColumnRenamed(prefixes.columns[0], "url"))

    cols = records.columns
    tagged_r = records.withColumn(_K, F.col(key)).withColumn(
        _TAG, F.lit(False))
    tagged_p = pf.select(F.col("url").alias(_K), F.lit(True).alias(_TAG))
    u = tagged_r.unionByName(tagged_p, allowMissingColumns=True)

    # one shared range partitioning for both sides; within a partition
    # prefixes sort BEFORE an identical urlkey (a prefix equal to the key
    # matches it), giving the merge scan its invariant: when a record row
    # is reached, the last prefix row seen is the largest prefix <= key.
    # Lazy checkpoint: the per-partition-last-prefix collect below is the
    # first consumer and materializes it — no extra job barrier; the
    # merge scan then reads the persisted blocks.
    ranged = (u.repartitionByRange(F.col(_K))
              .sortWithinPartitions(F.asc(_K), F.desc(_TAG))
              .localCheckpoint(eager=False))

    # partition-count metadata only: each partition's last (max) prefix
    lasts = {r["pid"]: r["last_p"] for r in
             (ranged.groupBy(F.spark_partition_id().alias("pid"))
              .agg(F.max(F.when(F.col(_TAG), F.col(_K))).alias("last_p"))
              .collect())}
    carry_in: dict[int, str] = {}
    carry = None
    for pid in sorted(lasts):
        if carry is not None:
            carry_in[pid] = carry
        if lasts[pid] is not None:
            carry = lasts[pid]
    bc = spark.sparkContext.broadcast(carry_in)

    schema_df = records.withColumn(flag_col, F.lit(False))
    out_schema = ", ".join(f"`{c}` {t}" for c, t in schema_df.dtypes)

    def scan(batches):
        from pyspark import TaskContext
        last = bc.value.get(TaskContext.get().partitionId())
        for pdf in batches:
            keys = pdf[_K]
            is_p = pdf[_TAG]
            # governing prefix per row = forward-fill of prefix rows over
            # the sorted batch, seeded with the carry-in
            gov = keys.where(is_p).reindex(pdf.index).ffill()
            if last is not None:
                gov = gov.fillna(last)
            if is_p.any():
                last_here = keys[is_p].iloc[-1]
                last = last_here
            rec = pdf[~is_p]
            if rec.empty:
                continue
            g = gov[~is_p]
            out = rec[cols].copy()
            out[flag_col] = _startswith_batch(rec[_K].to_numpy(),
                                              g.to_numpy())
            yield out

    if scratch is not None:
        scratch.append(ranged)
    return ranged.mapInPandas(scan, out_schema)


def prefix_exclude_anti(records: DataFrame, prefixes: DataFrame,
                        key: str = "urlkey",
                        scratch: list | None = None) -> DataFrame:
    """records minus every row whose ``key`` starts with any prefix."""
    flagged = prefix_exclude_flag(records, prefixes, key=key,
                                  scratch=scratch)
    return flagged.filter(~F.col("excluded")).drop("excluded")
