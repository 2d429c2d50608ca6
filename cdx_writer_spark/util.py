"""Small runtime utilities shared across the engine."""

from __future__ import annotations

from pyspark.sql import DataFrame

__all__ = ["free_checkpoint", "ensure_checkpointed"]


def ensure_checkpointed(df: DataFrame) -> None:
    """Force a LAZY ``localCheckpoint(eager=False)`` frame to materialize
    NOW if nothing has touched it yet.

    A lazy checkpoint normally materializes inside its first consumer's
    job — but if every consumer so far could skip it (e.g. AQE
    propagating an empty relation through a join leg), the checkpoint
    still holds live lineage to upstream blocks.  Call this before
    freeing those upstream blocks; it is a no-op (one py4j round-trip)
    when the checkpoint already materialized."""
    try:
        plan = df._jdf.queryExecution().analyzed()
        if plan.getClass().getSimpleName() == "LogicalRDD":
            rdd = plan.rdd()
            if not rdd.isCheckpointed():
                df.count()
    except Exception:
        df.count()


def free_checkpoint(df: DataFrame) -> None:
    """Genuinely free the storage blocks behind a ``localCheckpoint``-ed
    DataFrame.

    ``Dataset.unpersist()`` only drops cache-manager entries and is a
    verified no-op for the RDD persisted by ``localCheckpoint`` on Spark
    4.1.2 (``getRDDStorageInfo`` still lists the blocks afterwards) — the
    blocks otherwise live until a JVM GC happens to collect the dropped
    reference, so a long crawl loop that "unpersists" its per-generation
    scratch frames still degrades as the block store fills.  The
    checkpointed Dataset's logical plan is a ``LogicalRDD`` wrapping the
    persisted RDD; unpersisting THAT RDD JVM-side frees the blocks
    immediately.

    Never call this on a frame whose blocks another live DataFrame still
    reads (lineage over the same LogicalRDD).
    """
    try:
        plan = df._jdf.queryExecution().analyzed()
        if plan.getClass().getSimpleName() == "LogicalRDD":
            plan.rdd().unpersist(False)
            return
    except Exception:
        pass
    df.unpersist()
