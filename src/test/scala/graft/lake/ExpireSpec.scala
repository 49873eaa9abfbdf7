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
}
