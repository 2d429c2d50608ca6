"""Similarity search over an embedding column (array<float>).

* brute_force_topk — exact cosine top-k: broadcast the query set, score via
  JVM higher-order functions (zip_with/aggregate — no Python in the loop),
  rank with a per-query window.  O(N·Q) but embarrassingly parallel; the
  correct baseline and the verifier for the approximate paths.
* ivf_topk — IVF-style ANN: k-means-lite centroids (deterministic seeded
  init, L iterations with DataFrame aggregations), assign vectors to their
  nearest centroid (the "inverted file"), probe only the closest n_probe
  cells per query.  The scale path: cuts scored candidates by
  n_probe/n_cells while recall stays high for clustered data.
* lsh bucketing for near-dup lives in operators/dedup.embedding_near_dup.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window, functions as F

__all__ = ["brute_force_topk", "ivf_topk", "ivf_topk_assigned",
           "cosine_expr"]


def _dot(a, b):
    return F.aggregate(F.zip_with(a, b, lambda x, y: x * y),
                       F.lit(0.0), lambda acc, v: acc + v)


def _norm(a):
    return F.sqrt(_dot(a, a))


def cosine_expr(a, b):
    return _dot(a, b) / (_norm(a) * _norm(b))


def brute_force_topk(emb: DataFrame, queries: DataFrame, k: int = 10,
                     id_col: str = "vec_id", vec_col: str = "embedding",
                     qid_col: str = "query_id", qvec_col: str = "qvec"
                     ) -> DataFrame:
    scored = (emb.crossJoin(F.broadcast(queries))
              .filter(F.col(id_col) != F.col(qid_col))
              .select(qid_col, id_col,
                      F.round(cosine_expr(F.col(vec_col), F.col(qvec_col)), 6)
                      .alias("cosine")))
    w = Window.partitionBy(qid_col).orderBy(F.desc("cosine"), id_col)
    return (scored.withColumn("rank", F.row_number().over(w))
            .filter(F.col("rank") <= k))


def kmeans_lite(emb: DataFrame, n_cells: int, iters: int = 3,
                vec_col: str = "embedding", seed: int = 11,
                id_col: str = "vec_id") -> DataFrame:
    """Deterministic centroids via DataFrame-only Lloyd iterations:
    init = hash-sampled rows; update = elementwise mean via posexplode."""
    hashed = emb.withColumn("_r", F.xxhash64(F.col(vec_col).cast("string"),
                                             F.lit(seed)))
    # hash-threshold pre-sample: don't order 10^10 rows for a handful of
    # centroids — ~1/8192 of rows pass the filter and only THAT sample is
    # ordered.  Deterministic (pure function of the data); small tables
    # where the sample can't fill n_cells fall back to the full scan, so
    # behavior at test scale is unchanged.
    sample = hashed.filter(F.pmod(F.col("_r"), F.lit(8192)) == 0)
    if sample.limit(n_cells).count() < n_cells:
        sample = hashed
    init = (sample.orderBy("_r").limit(n_cells)
            .select("_r", F.col(vec_col).alias("centroid")))
    cents = init.select(
        F.row_number().over(Window.orderBy("_r")).alias("cell"), "centroid")
    for _ in range(iters):
        assigned = _assign(emb, cents, vec_col, id_col)
        cents = (assigned
                 .select("cell", F.posexplode(vec_col).alias("pos", "val"))
                 .groupBy("cell", "pos").agg(F.avg("val").alias("m"))
                 .groupBy("cell")
                 .agg(F.transform(
                     F.array_sort(F.collect_list(F.struct("pos", "m"))),
                     lambda s: s.getField("m")).alias("centroid")))
    return cents


def _assign(emb: DataFrame, cents: DataFrame, vec_col: str,
            id_col: str = "vec_id") -> DataFrame:
    """Nearest cell per vector.  Groups on the scalar ``id_col`` ONLY —
    never on the array<float> column (an array grouping key would make the
    embedding bytes the shuffle-hash key; at 100 TB that shuffles the full
    vector payload as key material).  The vector and any metadata ride
    along as ``first()`` payloads (constant within each id group)."""
    scored = (emb.crossJoin(F.broadcast(cents))
              .withColumn("_sim", cosine_expr(F.col(vec_col), F.col("centroid"))))
    others = [c for c in emb.columns if c != id_col]
    # nearest cell per vector without a window: max_by keeps it one agg;
    # ties break to the lowest cell id (determinism across parallelism)
    return (scored.groupBy(id_col)
            .agg(*[F.first(c).alias(c) for c in others],
                 F.max_by("cell", F.struct(
                     F.col("_sim").alias("s"),
                     (-F.col("cell")).alias("nc"))).alias("cell")))


def ivf_topk_assigned(emb: DataFrame, queries: DataFrame, assign_col,
                      k: int = 10, n_probe: int = 2,
                      id_col: str = "vec_id", vec_col: str = "embedding",
                      qid_col: str = "query_id", qvec_col: str = "qvec",
                      round_digits: int = 4) -> DataFrame:
    """IVF ANN with an EXTERNAL cell assignment (``assign_col``: a Column
    over the emb row → int cell id) — the common production deployment
    where the codebook/partition map is trained offline and shipped with
    the data.  Centroids are derived as the per-cell elementwise mean;
    queries probe the ``n_probe`` nearest centroids (cosine, rounded to
    ``round_digits`` with cell-id tiebreak so the probe choice is stable
    across engines and float summation orders) and the exact top-k runs
    within probed cells only.  Same probe/score shape as ivf_topk minus
    the kmeans build, and fully ANSI-SQL-expressible — this is the
    oracle-checked IVF entry in the driver contract."""
    inverted = emb.withColumn("cell", assign_col)
    cents = (inverted
             .select("cell", F.posexplode(vec_col).alias("pos", "val"))
             .groupBy("cell", "pos")
             .agg(F.avg(F.col("val").cast("double")).alias("m"))
             .groupBy("cell")
             .agg(F.transform(
                 F.array_sort(F.collect_list(F.struct("pos", "m"))),
                 lambda s: s.getField("m")).alias("centroid")))
    qcells = (queries.crossJoin(F.broadcast(cents))
              .withColumn("_sim", F.round(
                  cosine_expr(F.col(qvec_col).cast("array<double>"),
                              F.col("centroid")), round_digits)))
    wq = Window.partitionBy(qid_col).orderBy(F.desc("_sim"), "cell")
    probes = (qcells.withColumn("_r", F.row_number().over(wq))
              .filter(F.col("_r") <= n_probe)
              .select(qid_col, qvec_col, "cell"))
    scored = (inverted.join(probes, "cell")
              .filter(F.col(id_col) != F.col(qid_col))
              .select(qid_col, id_col,
                      F.round(cosine_expr(F.col(vec_col), F.col(qvec_col)),
                              round_digits).alias("cosine")))
    w = Window.partitionBy(qid_col).orderBy(F.desc("cosine"), id_col)
    return (scored.withColumn("rank", F.row_number().over(w))
            .filter(F.col("rank") <= k)
            .select(qid_col, id_col, "cosine", "rank"))


def ivf_topk(emb: DataFrame, queries: DataFrame, k: int = 10,
             n_cells: int = 8, n_probe: int = 2, id_col: str = "vec_id",
             vec_col: str = "embedding", qid_col: str = "query_id",
             qvec_col: str = "qvec", iters: int = 2) -> DataFrame:
    """ANN: probe only the n_probe nearest centroid cells per query."""
    cents = kmeans_lite(emb, n_cells, iters=iters, vec_col=vec_col,
                        id_col=id_col)
    inverted = _assign(emb, cents, vec_col, id_col)  # vector -> cell
    qcells = (queries.crossJoin(F.broadcast(cents))
              .withColumn("_sim", cosine_expr(F.col(qvec_col), F.col("centroid"))))
    wq = Window.partitionBy(qid_col).orderBy(F.desc("_sim"), "cell")
    probes = (qcells.withColumn("_r", F.row_number().over(wq))
              .filter(F.col("_r") <= n_probe)
              .select(qid_col, qvec_col, "cell"))
    scored = (inverted.join(probes, "cell")
              .filter(F.col(id_col) != F.col(qid_col))
              .select(qid_col, id_col,
                      F.round(cosine_expr(F.col(vec_col), F.col(qvec_col)), 6)
                      .alias("cosine")))
    w = Window.partitionBy(qid_col).orderBy(F.desc("cosine"), id_col)
    return (scored.withColumn("rank", F.row_number().over(w))
            .filter(F.col("rank") <= k))
