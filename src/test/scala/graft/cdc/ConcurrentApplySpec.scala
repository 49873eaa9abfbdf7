package graft.cdc

import org.scalatest.funsuite.AnyFunSuite

import graft.TestSpark
import graft.changelog.ChangelogGen
import graft.lake.LakeTable

/** Two appliers racing on one lake: the atomic version-file rename is the
  * arbiter; losers retry against the refreshed snapshot (or get fenced), so
  * every batch lands exactly once regardless of interleaving. */
class ConcurrentApplySpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark

  test("two concurrent drivers on the same lake converge to the fold oracle") {
    val dir = TestSpark.tmpDir("race-cl")
    ChangelogGen.write(spark, dir, ChangelogGen.Config(
      nEvents = 3000, nConvs = 25, turnsPerConv = 6,
      pUpdate = 0.35, pDelete = 0.1, pDup = 0.1, segSize = 300))
    val lake = new LakeTable(spark, TestSpark.tmpDir("race-lake"))

    val errors = new java.util.concurrent.ConcurrentLinkedQueue[Throwable]()
    val threads = (1 to 2).map { i =>
      new Thread(() => {
        try new CdcDriver(spark, dir, lake, segmentsPerBatch = 1,
          nBuckets = 8, quiet = true).run()
        catch { case t: Throwable => errors.add(t) }
      }, s"applier-$i")
    }
    threads.foreach(_.start())
    threads.foreach(_.join(300000))
    assert(errors.isEmpty, s"applier failed: ${errors.peek()}")

    val snap = lake.currentSnapshot.get
    assert(snap.epoch == 10) // all 10 segments applied exactly once
    assert(CdcOracle.tableState(lake.read()) ==
      CdcOracle.fold(spark.read.parquet(dir)))
    // snapshot ids are a gap-free linear history
    assert(lake.snapshots.map(_.snapshotId) ==
      (0L to snap.snapshotId))
  }
}
