"""The r13 materialization tiers (io.py): corpus waists persist lazily
with lineage kept, iterative chains truncate (reliably when a checkpoint
dir exists), and cold-path persists are FIFO-bounded so a long session
cannot accumulate unbounded storage (VERDICT r12 items 2/6)."""

from __future__ import annotations

import tempfile

from pyspark.sql import functions as F

from hive_reflex_spark import io as hio


def _n_persistent_rdds(spark) -> int:
    return spark.sparkContext._jsc.sc().getPersistentRDDs().size()


def test_tracked_persist_is_fifo_bounded(spark):
    """Repeated cold-path persists release old storage beyond the cap:
    the r12 cold paths leaked one persisted RDD per build, so a
    340-query registry sweep grew storage without bound."""
    hio.release_persisted()
    before = _n_persistent_rdds(spark)
    dfs = []
    for i in range(hio.PERSIST_CAP + 20):
        df = spark.range(10).select((F.col("id") + i).alias("v"))
        hio.tracked_persist(df)
        df.count()  # materialize so the block registers
        dfs.append(df)
    after = _n_persistent_rdds(spark)
    # everything beyond the cap must have been unpersisted (small slack:
    # unpersist(blocking=False) is async on the JVM side)
    assert after - before <= hio.PERSIST_CAP + 4, (
        f"persisted RDDs grew {after - before} > cap {hio.PERSIST_CAP}"
    )
    # eviction is SAFE: an evicted waist recomputes via lineage
    assert dfs[0].count() == 10
    hio.release_persisted()


def test_corpus_checkpoint_keeps_lineage(spark):
    """Corpus tier: persist(MEMORY_AND_DISK) + explicit action — blocks
    are disk-spillable and EVICTABLE, and lineage is kept so the plan
    (and executor-loss recovery) still reaches the source — the two
    properties r12's localCheckpoint lacked (VERDICT item 2)."""
    hio.release_persisted()
    src = spark.range(50).select("id", (F.col("id") % 5).alias("k"))
    waist = hio.corpus_checkpoint(src.groupBy("k").agg(F.count("*").alias("c")))
    lvl = waist.storageLevel
    assert lvl.useMemory and lvl.useDisk, "corpus tier must be MEMORY_AND_DISK"
    # lineage kept: the analyzed plan still contains the source Range
    assert "Range" in waist._jdf.queryExecution().analyzed().toString()
    # two references share one InMemoryRelation in the physical plan
    out = waist.join(waist.selectExpr("k", "c as c2"), "k")
    plan = out._jdf.queryExecution().executedPlan().toString()
    assert "InMemoryTableScan" in plan
    assert out.count() == 5
    hio.release_persisted()


def test_corpus_checkpoint_honors_lazy_plans_hook(spark):
    """Plan-shape tests read THROUGH corpus checkpoints exactly as they
    read through the r12 localCheckpoints."""
    src = spark.range(10)
    hio.set_lazy_plans(True)
    try:
        assert hio.corpus_checkpoint(src) is src
    finally:
        hio.set_lazy_plans(False)


def test_iterative_query_identical_with_reliable_checkpoint(spark, sf_smoke):
    """The chain tier's production path (reliable checkpoint when a dir
    is configured) must be value-identical to the local fallback on a
    real iterative query — q78's label propagation runs its whole loop
    through chain_checkpoint."""
    import __spark_entry__ as entrymod

    q = entrymod.queries()["q78_dedup_clusters"]
    base = {tuple(r) for r in q(spark, sf_smoke).collect()}
    with tempfile.TemporaryDirectory() as d:
        spark.sparkContext.setCheckpointDir(d)
        try:
            reliable = {tuple(r) for r in q(spark, sf_smoke).collect()}
        finally:
            getattr(spark._jsc.sc(), "checkpointDir_$eq")(
                spark._sc._jvm.scala.Option.empty()
            )
    assert base == reliable
    assert base, "fixture should produce clusters"


def test_chain_checkpoint_truncates_and_prefers_reliable(spark):
    """Chain tier: always truncates lineage (exponential-plan guard);
    uses the fault-tolerant reliable checkpoint when the deployment
    configured a dir, localCheckpoint otherwise."""
    src = spark.range(20).select((F.col("id") * 2).alias("v"))
    # no checkpoint dir (default local session): localCheckpoint
    ck = hio.chain_checkpoint(src)
    assert "Range" not in ck._jdf.queryExecution().analyzed().toString(), (
        "chain tier must truncate lineage"
    )
    assert ck.count() == 20
    # with a checkpoint dir: reliable checkpoint, same truncation
    with tempfile.TemporaryDirectory() as d:
        spark.sparkContext.setCheckpointDir(d)
        try:
            ck2 = hio.chain_checkpoint(src)
            assert "Range" not in (
                ck2._jdf.queryExecution().analyzed().toString()
            )
            assert ck2.count() == 20
        finally:
            # reset to "no dir" so the shared session's other tests keep
            # the localCheckpoint fallback ($-name needs getattr)
            getattr(spark._jsc.sc(), "checkpointDir_$eq")(
                spark._sc._jvm.scala.Option.empty()
            )
