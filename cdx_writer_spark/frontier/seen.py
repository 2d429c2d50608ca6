"""URL-seen set: exact anti-join + bloom pre-filter.

Design for 10^10 keys (north_rule):

* the *source of truth* is an exact LEFT ANTI join on a 64-bit url-hash,
  both sides hash-partitioned on the same key so the shuffle is co-located;
* a bloom filter only *pre-filters* candidates to cut shuffle volume — it
  never decides membership (false positives would drop novel URLs, so a
  bloom hit still goes through the exact join; a bloom miss is definitely
  novel and can skip it).

Two bloom deployments:
  1. Spark's built-in runtime bloom-filter join
     (``spark.sql.optimizer.runtime.bloomFilter.enabled`` — on in
     session.py's frontier profile) — zero code, optimizer-injected.
  2. The explicit filter below: built distributedly (per-partition numpy
     bitmaps OR-reduced), broadcast to executors, checked in an Arrow UDF.
     Size: n·ln(1/fpp)/ln²2 bits — 12 MB per 10^7 keys at 1% fpp, so a
     10^10-key crawl shards it per hash-partition (each partition's bloom
     covers only its shard; candidates are repartitioned the same way and
     consult only their shard's filter).
"""

from __future__ import annotations

import math

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame, functions as F, types as T

__all__ = ["bloom_params", "build_bloom", "bloom_prefilter", "anti_join_seen"]


def bloom_params(capacity: int, fpp: float = 0.01) -> tuple[int, int]:
    """(m_bits, k_hashes) for a target capacity/false-positive rate."""
    m = max(64, int(-capacity * math.log(fpp) / (math.log(2) ** 2)))
    m = (m + 63) // 64 * 64
    k = max(1, round(m / max(capacity, 1) * math.log(2)))
    return m, min(k, 8)


def build_bloom(df: DataFrame, key: str, capacity: int = 0,
                fpp: float = 0.01, m: int | None = None,
                k: int | None = None) -> tuple[bytes, int, int]:
    """Distributed bloom build: per-partition numpy bitmaps, OR-reduced.
    Returns (bitmap bytes, m_bits, k_hashes).

    Pass explicit ``m``/``k`` to build a DELTA bitmap compatible with an
    existing filter (same geometry) — the caller ORs the two byte strings.
    This is how the crawl loop maintains its seen-set filter incrementally:
    O(novel) per generation instead of an O(total) rebuild."""
    if m is None or k is None:
        m, k = bloom_params(capacity, fpp)
    hashed = df.select(
        F.xxhash64(F.col(key), F.lit(1)).alias("h1"),
        F.xxhash64(F.col(key), F.lit(2)).bitwiseOR(F.lit(1)).alias("h2"))

    n_words = m // 64

    def to_bitmap(batches):
        bits = np.zeros(n_words, dtype=np.uint64)
        for pdf in batches:
            h1 = pdf["h1"].to_numpy(dtype=np.uint64)
            h2 = pdf["h2"].to_numpy(dtype=np.uint64)
            for i in range(k):
                pos = (h1 + np.uint64(i) * h2) % np.uint64(m)
                np.bitwise_or.at(bits, (pos >> np.uint64(6)).astype(np.int64),
                                 np.uint64(1) << (pos & np.uint64(63)))
        yield pd.DataFrame({"bitmap": [bits.tobytes()]})

    schema = T.StructType([T.StructField("bitmap", T.BinaryType())])
    parts = hashed.mapInPandas(to_bitmap, schema).collect()
    acc = np.zeros(n_words, dtype=np.uint64)
    for row in parts:
        acc |= np.frombuffer(row["bitmap"], dtype=np.uint64)
    return acc.tobytes(), m, k


def bloom_prefilter(candidates: DataFrame, key: str, bitmap: bytes,
                    m: int, k: int) -> DataFrame:
    """Adds ``maybe_seen``: False ⇒ definitely novel (skip the exact join),
    True ⇒ must be resolved by the exact anti-join."""
    spark = candidates.sparkSession
    bc = spark.sparkContext.broadcast(bitmap)

    @F.pandas_udf(T.BooleanType())
    def might_contain(h1: pd.Series, h2: pd.Series) -> pd.Series:
        bits = np.frombuffer(bc.value, dtype=np.uint64)
        a = h1.to_numpy(dtype=np.uint64)
        b = h2.to_numpy(dtype=np.uint64)
        res = np.ones(len(a), dtype=bool)
        for i in range(k):
            pos = (a + np.uint64(i) * b) % np.uint64(m)
            word = bits[(pos >> np.uint64(6)).astype(np.int64)]
            res &= (word >> (pos & np.uint64(63))) & np.uint64(1) != 0
        return pd.Series(res)

    return candidates.withColumn(
        "maybe_seen",
        might_contain(F.xxhash64(F.col(key), F.lit(1)),
                      F.xxhash64(F.col(key), F.lit(2)).bitwiseOR(F.lit(1))))


def anti_join_seen(candidates: DataFrame, seen: DataFrame, key: str = "urlkey",
                   bloom: tuple[bytes, int, int] | None = None) -> DataFrame:
    """candidates − seen.  With a bloom sidecar, only the maybe-seen slice
    pays the join shuffle; the definite-novel slice is unioned back."""
    if bloom is None:
        return candidates.join(seen.select(key), key, "left_anti")
    bitmap, m, k = bloom
    flagged = bloom_prefilter(candidates, key, bitmap, m, k)
    novel = flagged.filter(~F.col("maybe_seen")).drop("maybe_seen")
    maybe = flagged.filter(F.col("maybe_seen")).drop("maybe_seen")
    resolved = maybe.join(seen.select(key), key, "left_anti")
    return novel.unionByName(resolved)
