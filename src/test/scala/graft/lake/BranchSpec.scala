package graft.lake

import org.scalatest.funsuite.AnyFunSuite

import graft.TestSpark
import graft.cdc.{CdcDriver, CdcOracle}
import graft.changelog.ChangelogGen

/** Writable branches (write-audit-publish): shallow fork, full engine
  * surface on the branch, fast-forward-only publish as one atomic commit,
  * discard deletes only branch-written files, fork point retention-proof. */
class BranchSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark

  private def changelog(name: String): String = {
    val dir = TestSpark.tmpDir(s"br-cl-$name")
    ChangelogGen.write(spark, dir, ChangelogGen.Config(
      nEvents = 3000, nConvs = 25, turnsPerConv = 6,
      pUpdate = 0.35, pDelete = 0.1, pDup = 0.1, segSize = 500))
    dir
  }

  private def replay(dir: String, lake: LakeTable,
                     maxBatches: Int = Int.MaxValue) =
    new CdcDriver(spark, dir, lake, segmentsPerBatch = 1, nBuckets = 8,
      quiet = true).run(maxBatches = maxBatches)

  test("WAP: branch ingests while main stays put; publish fast-forwards;" +
      " replayed batches stay fenced") {
    val dir = changelog("wap")
    val main = new LakeTable(spark, TestSpark.tmpDir("br-main"))
    replay(dir, main, maxBatches = 3)
    val mainBefore = CdcOracle.tableState(main.read())
    val forkSnap = main.currentSnapshot.get

    val b = Branch.create(main, "audit")
    assert(b.baseSnapshotId == forkSnap.snapshotId)
    assert(main.tags.get(Branch.tagName("audit")).contains(forkSnap.snapshotId))
    val branch = Branch.table(main, "audit")
    // shallow: the fork reads the parent's bytes, no data copied
    assert(!LakeIO.exists(s"${branch.root}/data"))
    assert(CdcOracle.tableState(branch.read()) == mainBefore)

    // ingest the REST of the feed into the branch (epoch resumes)
    replay(dir, branch)
    val oracle = CdcOracle.fold(spark.read.option("mergeSchema", "true")
      .parquet(dir))
    assert(CdcOracle.tableState(branch.read()) == oracle)
    assert(CdcOracle.tableState(main.read()) == mainBefore) // main untouched
    assert(Branch.list(main).map(_.name) == Seq("audit"))

    val headEpoch = branch.currentSnapshot.get.epoch
    val published = Branch.publish(main, "audit")
    assert(CdcOracle.tableState(main.read()) == oracle)
    assert(published.epoch == headEpoch)
    assert(published.snapshotId == forkSnap.snapshotId + 1)
    assert(Branch.list(main).isEmpty)
    assert(!main.tags.contains(Branch.tagName("audit")))

    // exactly-once survives the publish: a full re-replay is fenced
    assert(replay(dir, main).forall(_.skipped))
    // the name is immediately reusable
    val b2 = Branch.create(main, "audit")
    assert(b2.baseSnapshotId == main.currentSnapshot.get.snapshotId)
    Branch.discard(main, "audit")
  }

  test("discard leaves main byte-identical and deletes only what the" +
      " branch wrote") {
    val dir = changelog("discard")
    val main = new LakeTable(spark, TestSpark.tmpDir("br-d-main"))
    replay(dir, main, maxBatches = 3)
    val before = CdcOracle.tableState(main.read())
    Branch.create(main, "bad")
    val branch = Branch.table(main, "bad")
    replay(dir, branch)
    assert(LakeIO.exists(s"${branch.root}/data"))
    val deleted = Branch.discard(main, "bad")
    assert(deleted > 0)
    assert(CdcOracle.tableState(main.read()) == before)
    assert(!main.tags.contains(Branch.tagName("bad")))
    // this generation's data files are gone
    val left = LakeIO.list(s"${main.root}/branches/bad/data")
      .flatMap { case (_, p, _) => LakeIO.list(p) }
      .flatMap { case (_, p, isDir) => if (isDir) LakeIO.list(p) else Nil }
      .count(_._1.endsWith(".parquet"))
    assert(left == 0, s"$left parquet files survived discard")
  }

  test("publish refuses when main moved since the fork") {
    val dir = changelog("conflict")
    val main = new LakeTable(spark, TestSpark.tmpDir("br-c-main"))
    replay(dir, main, maxBatches = 2)
    Branch.create(main, "stale")
    val branch = Branch.table(main, "stale")
    replay(dir, branch, maxBatches = 4)
    replay(dir, main, maxBatches = 3) // main advances one more batch
    val e = intercept[CommitConflictException](Branch.publish(main, "stale"))
    assert(e.getMessage.contains("re-branch"))
    // conflict leaves the branch alive for inspection
    assert(Branch.list(main).map(_.name) == Seq("stale"))
    Branch.discard(main, "stale")
  }

  test("main expire cannot break the branch: fork point is tag-pinned") {
    val dir = changelog("retain")
    val main = new LakeTable(spark, TestSpark.tmpDir("br-r-main"))
    replay(dir, main, maxBatches = 2)
    Branch.create(main, "pin")
    val branch = Branch.table(main, "pin")
    val branchState = CdcOracle.tableState(branch.read())
    replay(dir, main) // main moves on
    main.expireSnapshots(1)
    // base snapshot and its files survived the expiry
    assert(CdcOracle.tableState(branch.read()) == branchState)
    Branch.discard(main, "pin")
  }

  test("constraints audited on the branch travel with the publish," +
      " including drops") {
    val dir = changelog("checks")
    val main = new LakeTable(spark, TestSpark.tmpDir("br-k-main"))
    replay(dir, main, maxBatches = 2)
    main.addCheck("old_rule", "turn_idx >= 0")
    Branch.create(main, "rules")
    val branch = Branch.table(main, "rules")
    branch.dropCheck("old_rule")
    branch.addCheck("new_rule", "turn_idx < 1000000")
    replay(dir, branch, maxBatches = 3) // stage something to publish
    Branch.publish(main, "rules")
    assert(main.checks.keySet == Set("new_rule"))
  }
}
