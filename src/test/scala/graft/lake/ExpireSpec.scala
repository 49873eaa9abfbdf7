package graft.lake

import org.scalatest.funsuite.AnyFunSuite

import graft.TestSpark
import graft.cdc.{CdcDriver, CdcOracle}
import graft.changelog.ChangelogGen

class ExpireSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark

  test("expireSnapshots deletes only files unreachable from retained snapshots") {
    val dir = TestSpark.tmpDir("expire-cl")
    ChangelogGen.write(spark, dir, ChangelogGen.Config(
      nEvents = 2000, nConvs = 20, turnsPerConv = 6,
      pUpdate = 0.3, pDelete = 0.1, pDup = 0.05, segSize = 400))
    val lake = new LakeTable(spark, TestSpark.tmpDir("expire-lake"))
    new CdcDriver(spark, dir, lake, segmentsPerBatch = 1, nBuckets = 8,
      quiet = true).run()
    assert(lake.snapshots.size == 5)
    val state = CdcOracle.tableState(lake.read())

    val (snaps, files) = lake.expireSnapshots(keepLast = 2)
    assert(snaps == 3 && files > 0)
    assert(lake.snapshots.size == 2)
    // current state unaffected and fully readable
    assert(CdcOracle.tableState(lake.read()) == state)
    // every retained file exists
    assert(lake.snapshots.flatMap(_.files).forall(f =>
      new java.io.File(f.path).exists()))
    // expiring down to 1 works and is idempotent
    lake.expireSnapshots(keepLast = 1)
    assert(lake.expireSnapshots(keepLast = 1) == ((0, 0)))
    assert(CdcOracle.tableState(lake.read()) == state)
    // resume against the expired lake is still fenced
    val stats = new CdcDriver(spark, dir, lake, 1, 8, quiet = true).run()
    assert(stats.forall(_.skipped))
  }

  test("expireSnapshotsOlderThan expires by commit age; head and tags" +
      " survive any age") {
    val dir = TestSpark.tmpDir("expire-age-cl")
    ChangelogGen.write(spark, dir, ChangelogGen.Config(
      nEvents = 2000, nConvs = 20, turnsPerConv = 6,
      pUpdate = 0.3, pDelete = 0.1, pDup = 0.05, segSize = 400))
    val lake = new LakeTable(spark, TestSpark.tmpDir("expire-age-lake"))
    new CdcDriver(spark, dir, lake, segmentsPerBatch = 1, nBuckets = 8,
      quiet = true).run()
    val all = lake.snapshots
    assert(all.size == 5)
    val state = CdcOracle.tableState(lake.read())

    def versionFile(id: Long): java.io.File =
      new java.io.File(f"${lake.root}/meta/v$id%012d.json")
    // nothing old enough yet: everything just committed
    assert(lake.expireSnapshotsOlderThan(3600 * 1000L) == ((0, 0)))

    // age the three oldest version files by 8 days; tag the middle one
    val dayMs = 24 * 3600 * 1000L
    all.take(3).foreach(s => assert(
      versionFile(s.snapshotId).setLastModified(
        System.currentTimeMillis() - 8 * dayMs)))
    lake.tag("audit-pin", all(1).snapshotId)

    val (snaps, files) = lake.expireSnapshotsOlderThan(7 * dayMs)
    assert(snaps == 2 && files > 0,
      s"two unpinned aged snapshots expire, got ($snaps, $files)")
    val left = lake.snapshots.map(_.snapshotId)
    assert(left == Seq(all(1).snapshotId, all(3).snapshotId,
      all(4).snapshotId), s"tagged + young survive: $left")
    assert(CdcOracle.tableState(lake.read()) == state)
    assert(CdcOracle.tableState(lake.readAt(all(1).snapshotId)) ==
      CdcOracle.tableState(lake.readAt(all(1).snapshotId))) // readable

    // the HEAD never expires, no matter how old
    lake.snapshots.foreach(s => assert(
      versionFile(s.snapshotId).setLastModified(
        System.currentTimeMillis() - 30 * dayMs)))
    lake.untag("audit-pin")
    val (snaps2, _) = lake.expireSnapshotsOlderThan(7 * dayMs)
    assert(snaps2 == 2)
    assert(lake.snapshots.map(_.snapshotId) == Seq(all(4).snapshotId))
    assert(CdcOracle.tableState(lake.read()) == state)
  }
}
