package graft.lake

import org.scalatest.funsuite.AnyFunSuite

import graft.TestSpark
import graft.cdc.CdcApply
import graft.changelog.ChangelogGen

class LakeTableSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark

  private def smallBatch(lo: Long, hi: Long) =
    ChangelogGen.events(spark,
      ChangelogGen.Config(nEvents = hi, nConvs = 10, turnsPerConv = 4,
        segSize = 1000000), lo, hi, withEvolution = false).drop("seg")

  test("commit is fenced on epoch: replaying a batch is a no-op") {
    val lake = new LakeTable(spark, TestSpark.tmpDir("fence"))
    val b1 = smallBatch(0, 100)
    val s1 = CdcApply.apply(lake, b1, epoch = 1, nBuckets = 4)
    assert(!s1.skipped && s1.snapshot.snapshotId == 0)
    val s1again = CdcApply.apply(lake, b1, epoch = 1, nBuckets = 4)
    assert(s1again.skipped)
    assert(lake.currentSnapshot.get.snapshotId == 0)
    val s2 = CdcApply.apply(lake, smallBatch(100, 200), epoch = 2, nBuckets = 4)
    assert(!s2.skipped && s2.snapshot.snapshotId == 1)
  }

  test("crash between data write and metadata commit leaves invisible orphans") {
    val lake = new LakeTable(spark, TestSpark.tmpDir("orphan"))
    CdcApply.apply(lake, smallBatch(0, 100), epoch = 1, nBuckets = 4)
    val before = lake.read().count()
    // simulate: a later attempt wrote data files but died before commit
    val orphanDir = lake.newDataDir(99)
    smallBatch(100, 200).write.parquet(orphanDir)
    assert(lake.read().count() == before) // readers see manifest files only
    // listing paths come back absolute (Hadoop FS qualifies them)
    assert(lake.orphanDataDirs().exists(p =>
      new java.io.File(p).getCanonicalPath ==
        new java.io.File(orphanDir).getCanonicalPath))
    // resumed processing is unaffected
    val s = CdcApply.apply(lake, smallBatch(100, 200), epoch = 2, nBuckets = 4)
    assert(!s.skipped)
  }

  test("snapshots are immutable history; bucket pruning reads subset of files") {
    val lake = new LakeTable(spark, TestSpark.tmpDir("hist"))
    CdcApply.apply(lake, smallBatch(0, 300), epoch = 1, nBuckets = 4)
    CdcApply.apply(lake, smallBatch(300, 600), epoch = 2, nBuckets = 4)
    assert(lake.snapshots.map(_.snapshotId) == Seq(0L, 1L))
    val snap = lake.currentSnapshot.get
    val buckets = snap.files.map(_.bucket).toSet
    assert(buckets.subsetOf((0 until 4).toSet))
    // pruned read returns only rows hashing to that bucket
    val b0 = buckets.head
    val pruned = lake.readBuckets(Some(Set(b0)))
    import org.apache.spark.sql.functions._
    val wrongBucket = pruned
      .filter(CdcApply.bucketOf(col("conv_id"), 4) =!= lit(b0)).count()
    assert(wrongBucket == 0)
    assert(pruned.count() > 0)
    // file stats present
    assert(snap.files.forall(f => f.rows > 0 && f.minKey <= f.maxKey))
  }

  test("duplicate version commit raises CommitConflict") {
    val lake = new LakeTable(spark, TestSpark.tmpDir("conflict"))
    CdcApply.apply(lake, smallBatch(0, 50), epoch = 1, nBuckets = 4)
    val cur = lake.currentSnapshot.get
    intercept[CommitConflictException] {
      lake.commit(cur.copy(epoch = cur.epoch + 1)) // same snapshotId
    }
  }
}
