"""Deduplication operators for web-scale training-data pipelines.

All operators are DataFrame→DataFrame, shuffle-aware, UDF-free where Spark
primitives suffice:

* exact          — one shuffle on the content digest (map-side combine)
* minhash_lsh    — shingle → K minhashes → B bands → bucket equi-join;
                   the *only* shuffles are the signature groupBy and the
                   band-bucket self-join (bucket keys are uniform by
                   construction → no skew)
* simhash        — 64-bit simhash via bit-bucketed token votes, Hamming
                   candidate pairs via band equi-join on 4 x 16-bit chunks
* jaccard_verify — exact shingle-Jaccard on candidate pairs only (the
                   verify stage after LSH; never run it all-pairs at scale)
* embedding_near_dup — cosine > threshold via random-hyperplane LSH
                   bucketing, then exact cosine inside buckets
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F

__all__ = ["exact", "minhash_lsh", "simhash", "simhash_signatures",
           "jaccard_verify", "embedding_near_dup", "shingles_col"]


def shingles_col(text_col: str = "text", n: int = 3):
    """Distinct word n-gram shingles of a text column (JVM-side).  The
    token array is bound once via a lambda variable so the split/filter is
    not re-evaluated per shingle index."""
    return F.expr(
        f"array_distinct(flatten(transform("
        f" array(filter(split({text_col}, ' '), t -> t <> '')),"
        f" toks -> CASE WHEN size(toks) >= {n} THEN"
        f"   transform(sequence(0, size(toks) - {n}),"
        f"     i -> concat_ws(' ', slice(toks, i + 1, {n})))"
        f" ELSE array() END)))")


def exact(docs: DataFrame, id_col: str = "doc_id",
          text_col: str = "text") -> DataFrame:
    """Exact dedup: keep min id per content digest.  Returns the kept rows
    with a dup_count column."""
    return (docs.groupBy(F.md5(F.col(text_col)).alias("content_hash"))
            .agg(F.min(id_col).alias(id_col),
                 F.count("*").alias("dup_count")))


def minhash_lsh(docs: DataFrame, id_col: str = "doc_id",
                text_col: str = "text", num_hashes: int = 16,
                bands: int = 4, shingle_n: int = 3) -> DataFrame:
    """Candidate near-dup pairs via MinHash + LSH banding.

    Returns (doc_a, doc_b) candidate pairs (a < b).  Tune num_hashes/bands
    for the similarity threshold s ≈ (1/B)^(1/R), R = num_hashes/bands."""
    rows_per_band = num_hashes // bands
    sh = docs.select(F.col(id_col).alias("_id"),
                     F.explode(shingles_col(text_col, shingle_n)).alias("sh"))
    seeds = docs.sparkSession.range(num_hashes).select(
        F.col("id").alias("seed"))
    sig = (sh.join(F.broadcast(seeds))
           .groupBy("_id", "seed")
           .agg(F.min(F.xxhash64(F.col("sh"), F.col("seed"))).alias("mh")))
    bandsdf = (sig.withColumn("band", F.floor(F.col("seed") / rows_per_band))
               .groupBy("_id", "band")
               .agg(F.xxhash64(F.concat_ws(
                   "|", F.transform(F.sort_array(F.collect_list("mh")),
                                    lambda x: x.cast("string"))))
                    .alias("bucket")))
    a, b = bandsdf.alias("a"), bandsdf.alias("b")
    return (a.join(b, (F.col("a.band") == F.col("b.band"))
                   & (F.col("a.bucket") == F.col("b.bucket"))
                   & (F.col("a._id") < F.col("b._id")))
            .select(F.col("a._id").alias("doc_a"),
                    F.col("b._id").alias("doc_b"))
            .distinct())


def simhash_signatures(docs: DataFrame, id_col: str = "doc_id",
                       text_col: str = "text", n_bits: int = 64,
                       hash_col=None) -> DataFrame:
    """(_id, simhash): the per-doc SimHash signature.

    simhash bit i = sign of Σ_tokens (hash(token) bit i ? +1 : -1), built
    entirely with JVM expressions: explode tokens → ONE ``groupBy(_id)``
    carrying all n_bits bit-vote counters as conditional sums (map-side
    partials make the shuffle O(docs × n_bits longs), NOT O(tokens ×
    n_bits) — the per-bit explode of the first cut shuffled 64× the
    token volume).  ``hash_col`` (token Column → long Column) defaults
    to xxhash64; injectable so the oracle-checked driver query can run
    this same plan with an md5-derived 32-bit hash DuckDB can
    reproduce."""
    if hash_col is None:
        hash_col = F.xxhash64
    toks = (docs.select(F.col(id_col).alias("_id"),
                        F.explode(F.expr(
                            f"filter(split({text_col}, ' '), t -> t <> '')"))
                        .alias("tok"))
            .withColumn("h", hash_col(F.col("tok"))))
    votes = [F.sum(F.when(F.expr(f"shiftright(h, {i}) & 1") == 1, 1)
                   .otherwise(-1)).alias(f"v{i}") for i in range(n_bits)]
    assemble = F.expr(" | ".join(
        f"(CASE WHEN v{i} > 0 THEN shiftleft(CAST(1 AS BIGINT), {i}) "
        f"ELSE CAST(0 AS BIGINT) END)" for i in range(n_bits)))
    return (toks.groupBy("_id").agg(*votes)
            .select("_id", assemble.alias("simhash")))


def simhash(docs: DataFrame, id_col: str = "doc_id", text_col: str = "text",
            hamming_band_bits: int = 16, n_bits: int = 64,
            hash_col=None) -> DataFrame:
    """n_bits SimHash per doc (simhash_signatures) + banded candidate
    pairs.  Near-dup candidates share at least one of the
    n_bits/hamming_band_bits chunks (≈ Hamming distance ≤ chunks-1
    guaranteed recall band trick)."""
    sim = simhash_signatures(docs, id_col, text_col, n_bits=n_bits,
                             hash_col=hash_col)
    chunks = sim.select(
        "_id", "simhash",
        F.explode(F.array(*[
            F.struct(F.lit(i).alias("chunk"),
                     F.shiftrightunsigned(F.col("simhash"),
                                          i * hamming_band_bits)
                     .bitwiseAND(F.lit((1 << hamming_band_bits) - 1))
                     .alias("val"))
            for i in range(n_bits // hamming_band_bits)])).alias("c"))
    chunks = chunks.select("_id", "simhash", "c.chunk", "c.val")
    a, b = chunks.alias("a"), chunks.alias("b")
    return (a.join(b, (F.col("a.chunk") == F.col("b.chunk"))
                   & (F.col("a.val") == F.col("b.val"))
                   & (F.col("a._id") < F.col("b._id")))
            .select(F.col("a._id").alias("doc_a"),
                    F.col("b._id").alias("doc_b"),
                    F.bit_count(F.col("a.simhash").bitwiseXOR(
                        F.col("b.simhash"))).alias("hamming"))
            .distinct())


def jaccard_verify(docs: DataFrame, pairs: DataFrame, id_col: str = "doc_id",
                   text_col: str = "text", shingle_n: int = 3,
                   threshold: float = 0.8) -> DataFrame:
    """Exact shingle-Jaccard on candidate pairs (the LSH verify stage)."""
    sh = docs.select(F.col(id_col).alias("_id"),
                     shingles_col(text_col, shingle_n).alias("shs"))
    a = sh.withColumnRenamed("_id", "doc_a").withColumnRenamed("shs", "sa")
    b = sh.withColumnRenamed("_id", "doc_b").withColumnRenamed("shs", "sb")
    joined = pairs.join(a, "doc_a").join(b, "doc_b")
    inter = F.size(F.array_intersect("sa", "sb"))
    union = F.size("sa") + F.size("sb") - inter
    return (joined.select("doc_a", "doc_b",
                          F.round(inter / union, 6).alias("jaccard"))
            .filter(F.col("jaccard") >= threshold))


def lsh_planes(n_planes: int, dim: int, seed: int = 7) -> list:
    """Deterministic random-hyperplane constants: uniform in [-1, 1) from
    the first 4 md5 bytes of ``seed:plane:dim_index``.  Pure function of
    its arguments — the SQL oracle inlines exactly these doubles as
    literals, so Spark and DuckDB evaluate the same sketch."""
    import hashlib
    return [[(int.from_bytes(
        hashlib.md5(f"{seed}:{p}:{d}".encode()).digest()[:4],
        "big") / 2**31 - 1.0) for d in range(dim)] for p in range(n_planes)]


def embedding_near_dup(emb: DataFrame, id_col: str = "vec_id",
                       vec_col: str = "embedding", n_planes: int = 12,
                       threshold: float = 0.95, seed: int = 7) -> DataFrame:
    """Cosine near-dup via random-hyperplane LSH: sign-sketch bucket join,
    exact cosine inside buckets.  Hyperplanes are pseudo-random but
    deterministic (md5 of (seed, plane, dim)), so the operator is stable
    across runs and parallelism."""
    dim = len(emb.select(vec_col).first()[0])
    plane = lsh_planes(n_planes, dim, seed)
    planes = F.array(*[F.array(*[F.lit(v) for v in row]) for row in plane])
    sketch = F.transform(
        planes, lambda pl: (F.aggregate(
            F.zip_with(F.col(vec_col), pl, lambda x, y: x * y),
            F.lit(0.0), lambda a, v: a + v) > 0).cast("int"))
    sk = emb.select(F.col(id_col).alias("_id"), F.col(vec_col).alias("_v"),
                    F.concat_ws("", *[F.element_at(sketch, i + 1)
                                      for i in range(n_planes)]).alias("bucket"))
    a, b = sk.alias("a"), sk.alias("b")
    dot = F.aggregate(F.zip_with(F.col("a._v"), F.col("b._v"),
                                 lambda x, y: x * y),
                      F.lit(0.0), lambda acc, v: acc + v)
    norm = (lambda side: F.sqrt(F.aggregate(
        F.zip_with(F.col(side), F.col(side), lambda x, y: x * y),
        F.lit(0.0), lambda acc, v: acc + v)))
    cos = dot / (norm("a._v") * norm("b._v"))
    return (a.join(b, (F.col("a.bucket") == F.col("b.bucket"))
                   & (F.col("a._id") < F.col("b._id")))
            .select(F.col("a._id").alias("vec_a"),
                    F.col("b._id").alias("vec_b"),
                    F.round(cos, 6).alias("cosine"))
            .filter(F.col("cosine") >= threshold))
