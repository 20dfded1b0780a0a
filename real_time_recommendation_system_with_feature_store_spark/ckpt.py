"""localCheckpoint block accounting.

``DataFrame.unpersist`` does NOT release localCheckpoint storage blocks (it
only touches the SQL cache manager), so code that checkpoints in a loop —
BPE training rounds, feature-store push compaction — must free superseded
checkpoints through the context's persistent-RDD registry or accumulate
dead block sets in executor storage for the session lifetime. Verified
against pyspark 4.1 (see operators/bpe.py history). Best effort by design:
a leak is preferable to crashing on a Spark-internals change.
"""

from __future__ import annotations


def checkpointed_rdd_ids(df) -> set:
    """RDD ids holding the storage blocks of a just-``localCheckpoint``-ed
    DataFrame, derived DIRECTLY from its plan (the LogicalRDD wrapping the
    checkpointed internal RDD). Unlike a before/after diff of
    ``getRDDStorageInfo`` this is race-free on a shared SparkContext: a
    concurrent job's persist landing between two snapshots can never be
    captured (and later force-unpersisted, which would crash the victim
    unrecoverably because localCheckpoint truncates lineage). Returns an
    empty set (= never freed, leak over crash) if Spark internals moved."""
    try:
        plan = df._jdf.queryExecution().analyzed()
        return {plan.rdd().id()}
    except Exception:
        return set()


def stored_rdd_ids(sc) -> set:
    """ids of RDDs currently holding storage blocks (driver-side, cheap)."""
    try:
        return {info.id() for info in sc._jsc.sc().getRDDStorageInfo()}
    except Exception:
        return set()


def unpersist_rdd_ids(sc, ids) -> None:
    """Free storage blocks of specific RDD ids via the persistent-RDD
    registry."""
    try:
        jmap = sc._jsc.sc().getPersistentRDDs()
        for i in ids:
            opt = jmap.get(i)
            if opt.isDefined():
                opt.get().unpersist(False)
    except Exception:
        pass
