package graft.lake

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.TestSpark
import graft.cdc.{CdcApply, CdcDriver, CdcOracle}
import graft.changelog.ChangelogGen

/** Incremental (bucket-subset) compaction + bucket-disjoint commit rebase:
  * background maintenance must never stall ingest. A cold-bucket compaction
  * that loses the version race to a concurrent source batch REBASES onto
  * the winner when the batch touched only other buckets
  * (LakeTable.commitRebasing — Iceberg's commit-retry validation scoped to
  * the rewritten files); a winner that touched a compacted bucket is a real
  * conflict and fails loudly for recompute. */
class RebaseCompactionSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark

  private def build(mor: Boolean = false): (LakeTable, String) = {
    val dir = TestSpark.tmpDir("rebase-cl")
    ChangelogGen.write(spark, dir, ChangelogGen.Config(
      nEvents = 3000, nConvs = 50, turnsPerConv = 4,
      pUpdate = 0.35, pDelete = 0.08, pDup = 0.05, segSize = 750))
    val lake = new LakeTable(spark, TestSpark.tmpDir("rebase-lake"))
    new CdcDriver(spark, dir, lake, segmentsPerBatch = 1, nBuckets = 8,
      quiet = true, mor = mor, morCompactChain = 0).run()
    (lake, dir)
  }

  /** one-row update batch addressed to a specific existing conversation */
  private def batchFor(conv: String, lsn: Long) =
    spark.range(1).select(
      lit("U").as("op"), lit(conv).as("conv_id"), lit(0).as("turn_idx"),
      lit("user").as("role"), lit("racing write").as("text"),
      lit(null).cast("string").as("tool"),
      lit("2024-01-01").cast("timestamp").as("ts"),
      lit(lsn).as("_lsn"), lit(0).as("_src_part"), lit(lsn).as("_src_off"))

  private def convInBucket(lake: LakeTable, pred: Int => Boolean): String = {
    val n = lake.currentSnapshot.get.nBuckets
    lake.read().select("conv_id").distinct().collect().map(_.getString(0))
      .find(c => pred(LakeTable.bucketOfValue(c, n)))
      .getOrElse(fail("no conversation in wanted buckets"))
  }

  test("incremental compaction rewrites only the chosen buckets") {
    val (lake, _) = build()
    val before = lake.currentSnapshot.get
    val want = CdcOracle.tableState(lake.read())
    val bs = Set(0, 1)

    val st = Compaction.compact(lake, buckets = Some(bs))
    val after = lake.currentSnapshot.get
    // untouched buckets carry the parent's manifest refs by PATH identity
    assert(after.manifests.filterNot(r => bs(r.bucket)).toSet ==
      before.manifests.filterNot(r => bs(r.bucket)).toSet)
    // chosen buckets got fresh refs
    assert(after.manifests.filter(r => bs(r.bucket)).toSet !=
      before.manifests.filter(r => bs(r.bucket)).toSet)
    // stats cover only what was read
    assert(st.rowsBefore ==
      before.manifests.filter(r => bs(r.bucket)).map(_.rows).sum)
    // live state unchanged
    assert(CdcOracle.tableState(lake.read()) == want)
  }

  test("cold-bucket compaction rebases over disjoint concurrent ingest") {
    for (mor <- Seq(false, true)) {
      val (lake, _) = build(mor)
      val before = lake.currentSnapshot.get
      val cold = Set(0, 1)
      val hotConv = convInBucket(lake, b => !cold(b))
      val preState = CdcOracle.tableState(lake.read())

      Compaction.beforeCommitHook = () =>
        CdcApply.apply(lake, batchFor(hotConv, 90000000L),
          before.epoch + 1, nBuckets = before.nBuckets)
      try Compaction.compact(lake, buckets = Some(cold))
      finally Compaction.beforeCommitHook = () => ()

      val after = lake.currentSnapshot.get
      // the rebase adopted the winner's epoch (the source batch landed)
      assert(after.epoch == before.epoch + 1,
        s"mor=$mor: expected winner's epoch, got ${after.epoch}")
      // both effects visible: the racing write AND the compacted state
      val got = CdcOracle.tableState(lake.read())
      val expect = preState.updated((hotConv, 0),
        got((hotConv, 0))) // racing write wins turn 0 of hotConv
      assert(got((hotConv, 0)).text == "racing write", s"mor=$mor")
      assert(got == expect, s"mor=$mor: state diverged beyond the racing row")
      // linear history: compaction's snapshot follows the winner's
      assert(lake.snapshots.map(_.snapshotId) == (0L to after.snapshotId))
    }
  }

  test("concurrent ingest into a compacted bucket conflicts loudly") {
    val (lake, _) = build()
    val before = lake.currentSnapshot.get
    val cold = Set(0, 1)
    val coldConv = convInBucket(lake, b => cold(b))

    Compaction.beforeCommitHook = () =>
      CdcApply.apply(lake, batchFor(coldConv, 91000000L),
        before.epoch + 1, nBuckets = before.nBuckets)
    try {
      intercept[CommitConflictException] {
        Compaction.compact(lake, buckets = Some(cold))
      }
    } finally Compaction.beforeCommitHook = () => ()

    // the loser left no trace: winner's state is intact and re-runnable
    val got = CdcOracle.tableState(lake.read())
    assert(got((coldConv, 0)).text == "racing write")
    Compaction.compact(lake, buckets = Some(cold)) // clean re-run lands
    assert(CdcOracle.tableState(lake.read()) == got)
  }

  test("rebase survives multiple disjoint winners (retry loop)") {
    val (lake, _) = build()
    val before = lake.currentSnapshot.get
    val cold = Set(0)
    val hot1 = convInBucket(lake, b => !cold(b))

    var fired = false
    Compaction.beforeCommitHook = () => if (!fired) {
      fired = true
      CdcApply.apply(lake, batchFor(hot1, 92000000L),
        before.epoch + 1, nBuckets = before.nBuckets)
      CdcApply.apply(lake, batchFor(hot1, 92000001L),
        before.epoch + 2, nBuckets = before.nBuckets)
    }
    try Compaction.compact(lake, buckets = Some(cold))
    finally Compaction.beforeCommitHook = () => ()
    assert(lake.currentSnapshot.get.epoch == before.epoch + 2)
    assert(CdcOracle.tableState(lake.read())((hot1, 0)).text == "racing write")
  }
}
