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

  /** A maintenance apply (migration) racing a source applier must never be
    * silently dropped: whichever side loses the commit race recomputes
    * against the winner's state (CrossMerge re-synthesizes its batch; the
    * source retry is epoch-fenced or re-merges) — the round-2 verdict's
    * lost-migration bug. Both effects must land regardless of interleaving. */
  test("migration racing a source applier lands exactly once, never dropped") {
    import org.apache.spark.sql.functions._
    for (round <- 0 until 3) { // vary interleaving odds across rounds
      val dir = TestSpark.tmpDir(s"xrace-cl-$round")
      ChangelogGen.write(spark, dir, ChangelogGen.Config(
        nEvents = 2000, nConvs = 12, turnsPerConv = 6,
        pUpdate = 0.3, pDelete = 0.05, segSize = 1000))
      val lake = new LakeTable(spark, TestSpark.tmpDir(s"xrace-lake-$round"))
      new CdcDriver(spark, dir, lake, 2, 8, quiet = true).run()
      val convs = lake.read().select("conv_id").distinct()
        .orderBy("conv_id").limit(2).collect().map(_.getString(0))
      val Array(from, to) = convs
      val preMergeWant = { // expected post-migration turns of `to`
        def turnsOf(c: String) = lake.read().filter(col("conv_id") === c)
          .collect().map(r => r.getAs[Int]("turn_idx") ->
            ((r.getAs[Long]("_lsn"), r.getAs[String]("text")))).toMap
        val f = turnsOf(from); val t = turnsOf(to)
        (f.keySet ++ t.keySet).map { k =>
          k -> ((f.get(k), t.get(k)) match {
            case (Some((fl, ft)), Some((tl, tt))) => if (fl > tl) ft else tt
            case (Some((_, ft)), None) => ft
            case (None, Some((_, tt))) => tt
            case _ => fail("unreachable")
          })
        }.toMap
      }
      val epoch0 = lake.currentSnapshot.get.epoch
      val srcBatch = spark.range(1).select(
        lit("I").as("op"), lit("conv-race-src").as("conv_id"),
        lit(0).as("turn_idx"), lit("user").as("role"), lit("racer").as("text"),
        lit(null).cast("string").as("tool"),
        lit("2024-01-01").cast("timestamp").as("ts"),
        lit(88888888L).as("_lsn"), lit(0).as("_src_part"),
        lit(88888888L).as("_src_off"))
      val errors = new java.util.concurrent.ConcurrentLinkedQueue[Throwable]()
      val tMerge = new Thread(() => {
        try { CrossMerge.mergeConversations(lake, Seq(from -> to)); () }
        catch { case t: Throwable => errors.add(t); () }
      }, "migrator")
      val tSrc = new Thread(() => {
        try { CdcApply.apply(lake, srcBatch, epoch0 + 1, nBuckets = 8); () }
        catch { case t: Throwable => errors.add(t); () }
      }, "source-applier")
      if (round % 2 == 0) { tMerge.start(); tSrc.start() }
      else { tSrc.start(); tMerge.start() }
      tMerge.join(120000); tSrc.join(120000)
      assert(errors.isEmpty, s"racer failed: ${errors.peek()}")
      // BOTH effects landed: migration consumed `from` into `to`...
      assert(lake.read().filter(col("conv_id") === from).isEmpty)
      val got = lake.read().filter(col("conv_id") === to)
        .collect().map(r => r.getAs[Int]("turn_idx") ->
          r.getAs[String]("text")).toMap
      assert(got == preMergeWant, "migration writes lost in the race")
      // ...and the source batch applied with its epoch
      assert(lake.read().filter(col("conv_id") === "conv-race-src")
        .count() == 1)
      assert(lake.currentSnapshot.get.epoch == epoch0 + 1)
    }
  }
}
