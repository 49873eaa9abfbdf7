package graft.cdc

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.TestSpark
import graft.changelog.ChangelogGen
import graft.lake.LakeTable

/** Multi-feed ingest: independently-replayed named sources interleave into
  * one table, each fencing on its own per-source epoch, with namespaced
  * partition lineage — and the final state equals the election over the
  * UNION of the feeds. */
class MultiSourceSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark

  private val cfg = ChangelogGen.Config(
    nEvents = 4000, nConvs = 30, turnsPerConv = 6,
    pUpdate = 0.35, pDelete = 0.1, pDup = 0.1, segSize = 500)

  /** Feed A = events [0, 2000) in its own dir; feed B = [2000, 4000) in
    * another — same conversation population, globally-comparable lsns. */
  private def twoFeeds(name: String): (String, String) = {
    val dirA = TestSpark.tmpDir(s"ms-a-$name")
    ChangelogGen.write(spark, dirA, cfg.copy(nEvents = 2000))
    val dirB = TestSpark.tmpDir(s"ms-b-$name")
    ChangelogGen.events(spark, cfg, 2000, 4000, withEvolution = false)
      .withColumn("p", col("_src_part"))
      .repartition(1)
      .write.mode("overwrite").partitionBy("seg", "p").parquet(dirB)
    (dirA, dirB)
  }

  /** Oracle feed: the union the engine saw — feed B's partition ids are
    * namespaced by partBase=1000, exactly as the driver rewrites them. */
  private def union(dirA: String, dirB: String) =
    spark.read.option("mergeSchema", "true").parquet(dirA)
      .drop("seg", "p")
      .unionByName(spark.read.option("mergeSchema", "true").parquet(dirB)
        .drop("seg", "p")
        .withColumn("_src_part", col("_src_part") + lit(1000)),
        allowMissingColumns = true)

  private def driver(dir: String, lake: LakeTable, src: String, base: Int) =
    new CdcDriver(spark, dir, lake, segmentsPerBatch = 1, nBuckets = 8,
      quiet = true, source = Some(src), partBase = base)

  test("two feeds interleave, each exactly-once; state == union election") {
    val (dirA, dirB) = twoFeeds("basic")
    val lake = new LakeTable(spark, TestSpark.tmpDir("ms-lake"))
    val a = driver(dirA, lake, "feedA", 0)
    val b = driver(dirB, lake, "feedB", 1000)
    a.run(maxBatches = 2)
    b.run(maxBatches = 3)
    a.run() // rest of A
    b.run() // rest of B

    val oracle = CdcOracle.fold(union(dirA, dirB))
    assert(CdcOracle.tableState(lake.read()) == oracle)

    val snap = lake.currentSnapshot.get
    assert(snap.sourceEpoch("feedA") == 4) // 4 segments consumed
    assert(snap.sourceEpoch("feedB") == 8) // segs 4..7, exclusive bound
    // lineage is per-(feed, partition): namespaces never collide
    val parts = snap.lineage.map(_.srcPart).toSet
    assert(parts.exists(_ < 1000) && parts.exists(_ >= 1000))

    // redelivery of EITHER feed is fenced without disturbing the other
    assert(driver(dirA, lake, "feedA", 0).run().forall(_.skipped))
    assert(driver(dirB, lake, "feedB", 1000).run().forall(_.skipped))
    assert(CdcOracle.tableState(lake.read()) == oracle)
  }

  test("a feed resumes mid-stream while the other is already done") {
    val (dirA, dirB) = twoFeeds("resume")
    val lake = new LakeTable(spark, TestSpark.tmpDir("ms-r-lake"))
    driver(dirB, lake, "feedB", 1000).run() // B fully first
    driver(dirA, lake, "feedA", 0).run(maxBatches = 1) // A crashes early
    // "restart" A with a fresh driver: per-source cursor resumes it
    val stats = driver(dirA, lake, "feedA", 0).run()
    assert(stats.nonEmpty && stats.forall(!_.skipped))
    assert(CdcOracle.tableState(lake.read()) == CdcOracle.fold(union(dirA, dirB)))
  }

  test("a streaming tailer and a batch backfill interleave as named feeds") {
    val (dirA, dirB) = twoFeeds("stream")
    val lake = new LakeTable(spark, TestSpark.tmpDir("ms-s-lake"))
    val ckpt = TestSpark.tmpDir("ms-s-ckpt")
    // live feed A through the tailer (its own checkpoint + source binding)
    CdcStream.run(spark, dirA, lake, ckpt,
      graft.model.Schemas.changeEventSchema, nBuckets = 8,
      maxFilesPerTrigger = 4, source = Some("live"))
    // batch backfill B lands next to it
    driver(dirB, lake, "backfill", 1000).run()
    assert(CdcOracle.tableState(lake.read()) == CdcOracle.fold(union(dirA, dirB)))
    // drained stream re-run: fenced per source, nothing moves
    val sid = lake.currentSnapshot.get.snapshotId
    CdcStream.run(spark, dirA, lake, ckpt,
      graft.model.Schemas.changeEventSchema, nBuckets = 8,
      maxFilesPerTrigger = 4, source = Some("live"))
    assert(lake.currentSnapshot.get.snapshotId == sid)
    // a FRESH checkpoint for a source that already progressed must refuse
    val e = intercept[IllegalStateException] {
      CdcStream.run(spark, dirA, lake, TestSpark.tmpDir("ms-s-ckpt2"),
        graft.model.Schemas.changeEventSchema, nBuckets = 8,
        source = Some("live"))
    }
    // refused either as a binding mismatch (source already bound to its
    // original checkpoint) or as prior per-source progress
    assert(e.getMessage.contains("for source live") ||
      e.getMessage.contains("already progressed"))

    // the other refusal branch: a source with BATCH progress but no
    // stream binding yet must also refuse a fresh checkpoint
    val e2 = intercept[IllegalStateException] {
      CdcStream.run(spark, dirB, lake, TestSpark.tmpDir("ms-s-ckpt3"),
        graft.model.Schemas.changeEventSchema, nBuckets = 8,
        source = Some("backfill"))
    }
    assert(e2.getMessage.contains("already progressed"))
  }

  test("two feeds applied CONCURRENTLY race through commit retries and" +
      " both land exactly once") {
    val (dirA, dirB) = twoFeeds("race")
    val lake = new LakeTable(spark, TestSpark.tmpDir("ms-race-lake"))
    val errors = new java.util.concurrent.ConcurrentLinkedQueue[Throwable]()
    val threads = Seq(
      new Thread(() => {
        try driver(dirA, lake, "feedA", 0).run()
        catch { case t: Throwable => errors.add(t) }
      }, "feedA"),
      new Thread(() => {
        try driver(dirB, lake, "feedB", 1000).run()
        catch { case t: Throwable => errors.add(t) }
      }, "feedB"))
    threads.foreach(_.start())
    threads.foreach(_.join(300000))
    assert(errors.isEmpty, s"feed failed: ${errors.peek()}")
    val snap = lake.currentSnapshot.get
    assert(snap.sourceEpoch("feedA") == 4 && snap.sourceEpoch("feedB") == 8)
    assert(CdcOracle.tableState(lake.read()) == CdcOracle.fold(union(dirA, dirB)))
    // gap-free linear snapshot history despite the races
    assert(lake.snapshots.map(_.snapshotId) == (0L to snap.snapshotId))
  }

  test("maintenance (compaction) carries source cursors; single-source" +
      " tables stay sourceEpochs-free") {
    val (dirA, dirB) = twoFeeds("maint")
    val lake = new LakeTable(spark, TestSpark.tmpDir("ms-m-lake"))
    driver(dirA, lake, "feedA", 0).run()
    graft.lake.Compaction.compact(lake)
    assert(lake.currentSnapshot.get.sourceEpoch("feedA") == 4)
    driver(dirB, lake, "feedB", 1000).run()
    assert(CdcOracle.tableState(lake.read()) == CdcOracle.fold(union(dirA, dirB)))

    // a plain single-feed replay keeps the legacy scalar-epoch contract
    val solo = new LakeTable(spark, TestSpark.tmpDir("ms-solo"))
    new CdcDriver(spark, dirA, solo, segmentsPerBatch = 1, nBuckets = 8,
      quiet = true).run()
    assert(solo.currentSnapshot.get.sourceEpochsOrEmpty.isEmpty)
    assert(solo.currentSnapshot.get.epoch == 4)
  }
}
