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

# Prefix-free lists up to this many entries are broadcast as ONE sorted
# array and probed per record with a vectorized binary search — the
# records side then never shuffles at all (the 10^10-record x 10^6-prefix
# archive-banlist shape: optimization guide §2.4 "remove shuffles
# outright" / §3.2 "reduce the big side before shuffling").  Above it
# (prefix lists too big to broadcast) the range-partitioned ordered
# merge below remains the scale path.  ~25 B/prefix -> ~250 MB at the
# cap, comparable to a routine broadcast-join build side.
BROADCAST_MAX_PREFIXES = 10_000_000
# plan-stats gate for the same decision without running a count() job:
# the optimizer's sizeInBytes estimate of the prefix frame (the signal
# Spark's own broadcast planning uses).  1 GiB estimated comfortably
# covers 10^6-10^7 short prefixes and is far below what a 10^9-row
# banlist estimates at.
BROADCAST_MAX_PREFIX_EST_BYTES = 1 << 30
# fixed-width kernels (driver prefix-free matrices, the probe's padded
# key matrix) cost rows x MAX length; a single long outlier line would
# blow that up quadratically vs the data size, so entries beyond this
# length route the whole list to the merge path instead (SURT prefixes
# are URL-sized, far below it)
MAX_FAST_PREFIX_LEN = 512


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


def _build_payload(raw) -> tuple:
    """Driver-side prefix-free reduction of a raw (dup-laden) prefix
    Series -> the broadcast payload, fully vectorized on the ASCII path:

    1. ascii-encode to a fixed-width bytes matrix and memcmp-sort;
    2. prefix-free via the interval trick: entry ``a[i]`` is subsumed
       iff some earlier entry ``p`` has ``p <= a[i] < p+'\\x7f'``, and
       because subsumed intervals NEST (``s`` startswith ``p`` implies
       ``s+'\\x7f' < p+'\\x7f'`` for sub-DEL data), the test collapses
       to one cumulative max over the per-entry upper bounds — no
       sequential Python scan (measured ~1s at 850k prefixes);
    3. the kept rows and their bounds ship as raw buffers.

    Non-ASCII / NUL / DEL lists (never SURT data) take the exact
    object-path: Python sort + last-kept scan, shipped as str objects.

    Memory guard: every matrix here (and the probe's padded key matrix)
    is rows x MAX length, so one multi-KB outlier line in an otherwise
    short list would inflate the cost quadratically vs its data size —
    width above MAX_FAST_PREFIX_LEN or a matrix beyond ~256 MB returns
    None and the caller takes the range-partitioned merge, whose cost is
    bounded by sum(len)."""
    vals = raw.dropna()
    try:
        arr = vals.to_numpy().astype("S")      # ascii; raises otherwise
        n = len(arr)
        if n == 0:
            return ("bytes", b"", "|S1", b"", "|S1", 0)
        L = arr.dtype.itemsize
        if L + 1 > MAX_FAST_PREFIX_LEN or n * (L + 1) > 256 * 1024 * 1024:
            return None
        M = np.ascontiguousarray(np.sort(arr)).view(np.uint8).reshape(n, L)
        if M.max() >= 0x7F:                    # DEL breaks the hi-bound
            raise UnicodeEncodeError("ascii", "", 0, 1, "del byte")
        # keys/prefixes carry no interior NULs (ascii strings), so the
        # per-row length is the nonzero count and the exclusive upper
        # bound is the row with '\x7f' appended at its length
        lens = (M != 0).sum(axis=1)
        if int(lens.sum()) != int(vals.str.len().sum()):
            # an interior NUL byte (legal in a Python str, ascii-encodable)
            # would corrupt both the length derivation and padded order
            raise UnicodeEncodeError("ascii", "", 0, 1, "interior NUL")
        H = np.zeros((n, L + 1), dtype=np.uint8)
        H[:, :L] = M
        H[np.arange(n), lens] = 0x7F
        hi_all = H.view(f"S{L + 1}").ravel()
        a_all = M.view(f"S{L}").ravel()
        # lexicographic running max by doubling (np.maximum has no bytes
        # loop, but elementwise comparison does): log2(n) vectorized
        # passes
        cummax = hi_all.copy()
        shift = 1
        while shift < n:
            tail, head = cummax[shift:], cummax[:-shift]
            cummax[shift:] = np.where(tail >= head, tail, head)
            shift *= 2
        kept = np.ones(n, dtype=bool)
        # compare against the bound cummax of STRICTLY EARLIER rows
        kept[1:] = ~(a_all[1:].astype(hi_all.dtype) < cummax[:-1])
        arr_b = np.ascontiguousarray(a_all[kept])
        hi_b = np.ascontiguousarray(hi_all[kept])
        return ("bytes", arr_b.tobytes(), arr_b.dtype.str,
                hi_b.tobytes(), hi_b.dtype.str, int(kept.sum()))
    except (UnicodeEncodeError, SystemError):
        plist: list[str] = []
        last = None
        for u in sorted(vals):
            if last is None or not u.startswith(last):
                plist.append(u)
                last = u
        return ("obj", plist)


def _prefix_flag_broadcast(records: DataFrame, prefixes: DataFrame,
                           key: str, flag_col: str) -> DataFrame | None:
    """Broadcast binary-search variant of the prefix flag.

    The RAW prefix rows come to the driver in one Arrow transfer
    (bounded by BROADCAST_MAX_PREFIXES; duplicates ride along — a
    distinct() here measured 3-4s of extra shuffle per call at 860k
    rows against a transfer saving that only pays on dup-heavy lists,
    and the driver reduction collapses duplicates anyway) and are made
    PREFIX-FREE there — the distributed prefix_free
    machinery (its own range shuffle + carry collect) exists for lists
    too big for one process, which this path by definition is not.
    Prefix-freeness makes the largest prefix <= key in lexicographic
    order the ONLY candidate match (the same lemma the merge path rests
    on).  The sorted list is broadcast once; each record batch runs one
    vectorized ``np.searchsorted`` (over a fixed-width bytes array —
    memcmp, no per-row Python — whenever the data is pure ASCII, with an
    object-array fallback otherwise) plus the existing pyarrow
    startswith kernel.  The records side is never shuffled,
    checkpointed or re-scanned.

    Broadcast payload: two fixed-width NumPy byte arrays shipped as raw
    buffers — the sorted prefix-free list and its per-entry exclusive
    upper bound ``p + '\\x7f'`` (``key.startswith(p) <=> p <= key <
    p+'\\x7f'`` for sub-DEL ASCII) — so worker-side deserialization is a
    memcpy.  A broadcast of the same list as 10^6 Python str objects was
    measured costing tens of seconds of first-task unpickling across the
    worker pool.  Non-ASCII/NUL/DEL data (never SURT keys) falls back to
    an exact object-array search per batch."""
    spark = records.sparkSession
    pcol = prefixes.columns[0]
    # the limit BOUNDS the driver collect even when the size estimate
    # lied low: at cap+1 rows we learn "too big" without having pulled
    # an arbitrarily large frame first
    raw = (prefixes.select(pcol).limit(BROADCAST_MAX_PREFIXES + 1)
           .toPandas()[pcol])
    if len(raw) > BROADCAST_MAX_PREFIXES:
        return None          # size estimate lied; caller takes the merge
    payload = _build_payload(raw)
    del raw
    if payload is None:
        return None          # pathological entry lengths; merge path
    bc = spark.sparkContext.broadcast(payload)
    cols = records.columns
    schema_df = records.withColumn(flag_col, F.lit(False))
    out_schema = ", ".join(f"`{c}` {t}" for c, t in schema_df.dtypes)

    key_i = cols.index(key)

    def probe(batches):
        import pyarrow as pa
        p = bc.value
        if p[0] == "bytes":
            _, ab, adt, hb, hdt, n_pfx = p
            pfx_b = np.frombuffer(ab, dtype=adt)
            pfx_hi = np.frombuffer(hb, dtype=hdt)
            pfx_obj = None
            width = pfx_hi.dtype.itemsize
        else:
            pfx_obj = np.array(p[1], dtype=object)
            n_pfx = len(pfx_obj)
            pfx_b = pfx_hi = None
            width = 0

        def decode_fallback():
            nonlocal pfx_obj
            if pfx_obj is None:
                pfx_obj = np.array([b.decode("ascii") for b in pfx_b],
                                   dtype=object)
            return pfx_obj

        def flags_exact(karr) -> np.ndarray:
            """Object-array path: exact for any data (non-ASCII, NUL/DEL,
            nulls)."""
            keys = karr.to_numpy(zero_copy_only=False)
            flag = np.zeros(len(keys), dtype=bool)
            mask = ~pd.isna(keys)
            if mask.any():
                po = decode_fallback()
                ks = keys[mask]
                idx = np.searchsorted(po, ks, side="right") - 1
                gov = np.where(idx >= 0, po[np.clip(idx, 0, None)], None)
                flag[mask] = _startswith_batch(ks, gov)
            return flag

        def flags_fast(karr) -> "np.ndarray | None":
            """memcpy path: the key column's raw UTF-8 buffer is padded
            into ONE fixed-width byte matrix (no per-row objects), then
            searchsorted + one vectorized compare against the broadcast
            hi-bounds decide every row.  Returns None when a guard trips
            (nulls, non-string offsets, any byte >= 0x7f)."""
            if pfx_b is None or karr.null_count or width > MAX_FAST_PREFIX_LEN:
                return None
            if pa.types.is_string(karr.type):
                off_dt = np.int32
            elif pa.types.is_large_string(karr.type):
                off_dt = np.int64
            else:
                return None
            bufs = karr.buffers()
            off = np.frombuffer(bufs[1], dtype=off_dt)[
                karr.offset: karr.offset + len(karr) + 1]
            data = np.frombuffer(bufs[2], dtype=np.uint8)
            seg = data[off[0]: off[-1]]
            if len(seg) and int(seg.max()) >= 0x7F:
                return None
            lens = np.diff(off)
            cl = np.minimum(lens, width)    # truncation-safe: a fixed-
            # width compare against entries of length <= width-1 is
            # decided within the first width bytes (hi ends in \x7f,
            # keys are sub-DEL)
            out = np.zeros((len(karr), width), dtype=np.uint8)
            pos = off[:-1, None] + np.arange(width)[None, :]
            m = np.arange(width)[None, :] < cl[:, None]
            out[m] = data[pos[m]]
            ks_b = out.view(f"S{width}").ravel()
            idx = np.searchsorted(pfx_b, ks_b, side="right") - 1
            safe = np.clip(idx, 0, None)
            return (idx >= 0) & (ks_b < pfx_hi[safe])

        for batch in batches:
            karr = batch.column(key_i)
            if isinstance(karr, pa.ChunkedArray):
                karr = karr.combine_chunks()
            if n_pfx and len(batch):
                flag = flags_fast(karr)
                if flag is None:
                    flag = flags_exact(karr)
            else:
                flag = np.zeros(len(batch), dtype=bool)
            yield pa.RecordBatch.from_arrays(
                list(batch.columns) + [pa.array(flag, type=pa.bool_())],
                names=cols + [flag_col])

    return records.mapInArrow(probe, out_schema)


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
    # Small-enough lists take the broadcast binary-search path: the
    # records side stays exactly where it was scanned — no range
    # shuffle, no checkpoint, no boundary-carry metadata pass.  Gate on
    # the optimizer's size ESTIMATE (free — no job): the same signal the
    # planner's own broadcast decisions use.  An over-estimate only
    # costs the merge path's extra shuffle; an under-estimate is bounded
    # by the row cap re-checked after the driver collect.
    try:
        est = int(prefixes._jdf.queryExecution()      # noqa: SLF001
                  .optimizedPlan().stats().sizeInBytes())
    except Exception:
        est = None
    if est is None:
        small = prefixes.count() <= BROADCAST_MAX_PREFIXES
    else:
        small = est <= BROADCAST_MAX_PREFIX_EST_BYTES
    if small:
        flagged = _prefix_flag_broadcast(records, prefixes, key, flag_col)
        if flagged is not None:
            return flagged

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
