package graft.lake

import org.scalatest.funsuite.AnyFunSuite

import graft.TestSpark
import graft.cdc.{CdcApply, CdcDriver}
import graft.changelog.ChangelogGen

/** Snapshot-diff change feed + orphan GC: the derived delta between two
  * snapshots must reconcile with the cf_* counts the merge recorded when
  * it produced them, and orphan cleanup must never touch live state. */
class ChangeFeedReaderSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark

  test("between() reconciles with the merge's own change-feed counts") {
    val dir = TestSpark.tmpDir("cfr-cl")
    ChangelogGen.write(spark, dir, ChangelogGen.Config(
      nEvents = 3000, nConvs = 25, turnsPerConv = 6,
      pUpdate = 0.4, pDelete = 0.1, pDup = 0.1, segSize = 500))
    val lake = new LakeTable(spark, TestSpark.tmpDir("cfr-lake"))
    val driver = new CdcDriver(spark, dir, lake, segmentsPerBatch = 1,
      nBuckets = 8, quiet = true)
    driver.run(maxBatches = 3)
    val midSnap = lake.currentSnapshot.get.snapshotId
    val laterStats = driver.run() // remaining batches
    assert(laterStats.nonEmpty)

    val feed = ChangeFeedReader.between(spark, lake, midSnap)
    val counts = feed.groupBy("action").count().collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap

    // snapshot-diff actions == accumulated per-batch cf_* counts, except
    // that a key touched in several batches collapses to its NET action in
    // the diff — so reconcile against a key-level oracle instead:
    def stateOf(id: Long) = lake.readAt(id)
      .select("conv_id", "turn_idx", "_lsn").collect()
      .map(r => (r.getString(0), r.getInt(1)) -> r.getLong(2)).toMap
    val before = stateOf(midSnap)
    val after = stateOf(lake.currentSnapshot.get.snapshotId)
    val expInserted = (after.keySet -- before.keySet).size.toLong
    val expDeleted = (before.keySet -- after.keySet).size.toLong
    val expUpdated = (after.keySet & before.keySet)
      .count(k => after(k) != before(k)).toLong
    assert(counts.getOrElse("inserted", 0L) == expInserted)
    assert(counts.getOrElse("deleted", 0L) == expDeleted)
    assert(counts.getOrElse("updated", 0L) == expUpdated)
    assert(feed.count() == expInserted + expDeleted + expUpdated)

    // single-batch diff equals that batch's own cf counts (no collapsing)
    val oneBatchFeed = ChangeFeedReader.between(spark, lake,
      lake.currentSnapshot.get.snapshotId - 1)
    val one = oneBatchFeed.groupBy("action").count().collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    val lastCf = laterStats.last.actions
    assert(one.getOrElse("inserted", 0L) == lastCf.getOrElse("inserted", 0L))
    assert(one.getOrElse("deleted", 0L) == lastCf.getOrElse("deleted", 0L))
    assert(one.getOrElse("updated", 0L) == lastCf.getOrElse("updated", 0L))

    // full-history diff = current live state, all inserted
    val full = ChangeFeedReader.between(spark, lake, -1L)
    assert(full.filter(org.apache.spark.sql.functions
      .col("action") =!= "inserted").count() == 0)
    assert(full.count() == lake.read().count())
  }

  test("orphan GC removes aged crash leftovers only") {
    val dir = TestSpark.tmpDir("gc-cl")
    ChangelogGen.write(spark, dir, ChangelogGen.Config(
      nEvents = 1000, nConvs = 10, turnsPerConv = 4, segSize = 500))
    val lake = new LakeTable(spark, TestSpark.tmpDir("gc-lake"))
    new CdcDriver(spark, dir, lake, 1, 4, quiet = true).run()
    val stateBefore = lake.read().count()

    // crash leftovers: a data dir and a manifest no snapshot references
    val orphanDir = lake.newDataDir(99)
    ChangelogGen.events(spark, ChangelogGen.Config(nEvents = 100, nConvs = 5,
      turnsPerConv = 2, segSize = 1000), 0, 100, withEvolution = false)
      .drop("seg").write.parquet(orphanDir)
    lake.writeManifests(99, Map(0 -> Seq(
      DataFileMeta(s"$orphanDir/x.parquet", 0, 1, "a", "a"))))

    // too-young orphans survive (in-flight commit protection)
    val (d0, m0) = lake.gcOrphans(minAgeMs = 10 * 60 * 1000L)
    assert(d0 == 0 && m0 == 0)
    // aged orphans are collected
    val (d1, m1) = lake.gcOrphans(minAgeMs = 0L)
    assert(d1 == 1 && m1 == 1)
    assert(lake.orphanDataDirs().isEmpty)
    assert(lake.read().count() == stateBefore)
    // live snapshots and their manifests untouched: replay still fenced
    val stats = new CdcDriver(spark, dir, lake, 1, 4, quiet = true).run()
    assert(stats.forall(_.skipped))
  }
}
