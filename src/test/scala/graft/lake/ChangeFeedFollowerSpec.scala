package graft.lake

import org.scalatest.funsuite.AnyFunSuite

import graft.TestSpark
import graft.cdc.CdcDriver
import graft.changelog.ChangelogGen

/** Exactly-once downstream drain of the change feed: per-step drains and a
  * folded catch-up must both reconcile with key-level before/after oracles,
  * re-drains must no-op, and a crash between the delta write and the cursor
  * publish must heal into the identical batch. */
class ChangeFeedFollowerSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark

  private def mkLake(tag: String): (LakeTable, CdcDriver) = {
    val dir = TestSpark.tmpDir(s"cff-cl-$tag")
    ChangelogGen.write(spark, dir, ChangelogGen.Config(
      nEvents = 3000, nConvs = 25, turnsPerConv = 6,
      pUpdate = 0.4, pDelete = 0.1, pDup = 0.1, segSize = 500))
    val lake = new LakeTable(spark, TestSpark.tmpDir(s"cff-lake-$tag"))
    (lake, new CdcDriver(spark, dir, lake, segmentsPerBatch = 1,
      nBuckets = 8, quiet = true))
  }

  private def stateOf(lake: LakeTable, id: Long) =
    lake.readAt(id).select("conv_id", "turn_idx", "_lsn").collect()
      .map(r => (r.getString(0), r.getInt(1)) -> r.getLong(2)).toMap

  private def deltaOracle(lake: LakeTable, from: Long, to: Long)
      : (Long, Long, Long) = {
    val before = if (from < 0) Map.empty[(String, Int), Long]
      else stateOf(lake, from)
    val after = stateOf(lake, to)
    ((after.keySet -- before.keySet).size.toLong,
     (before.keySet -- after.keySet).size.toLong,
     (after.keySet & before.keySet).count(k => after(k) != before(k)).toLong)
  }

  private def countsOf(out: String): Map[String, Long] =
    spark.read.parquet(out).groupBy("action").count().collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap

  test("per-step drains reconcile; re-drain no-ops; catch-up folds") {
    val (lake, driver) = mkLake("steps")
    val consumer = TestSpark.tmpDir("cff-consumer")

    // first drain: full live image as inserted
    driver.run(maxBatches = 2)
    val s1 = ChangeFeedFollower.drain(spark, lake, consumer).get
    assert(s1.from == -1L)
    val (ins1, del1, upd1) = deltaOracle(lake, -1L, s1.to)
    assert(countsOf(s1.out).getOrElse("inserted", 0L) == ins1)
    assert(del1 == 0L && upd1 == 0L)

    // current → no-op
    assert(ChangeFeedFollower.drain(spark, lake, consumer).isEmpty)

    // one more batch, one drain — exact single-step delta
    driver.run(maxBatches = 1)
    val s2 = ChangeFeedFollower.drain(spark, lake, consumer).get
    assert(s2.from == s1.to && s2.to == s1.to + 1)
    val (ins2, del2, upd2) = deltaOracle(lake, s2.from, s2.to)
    val c2 = countsOf(s2.out)
    assert(c2.getOrElse("inserted", 0L) == ins2)
    assert(c2.getOrElse("deleted", 0L) == del2)
    assert(c2.getOrElse("updated", 0L) == upd2)

    // two missed batches fold into ONE catch-up delta
    driver.run(maxBatches = 2)
    val s3 = ChangeFeedFollower.drain(spark, lake, consumer).get
    assert(s3.from == s2.to && s3.to == s2.to + 2)
    val (ins3, del3, upd3) = deltaOracle(lake, s3.from, s3.to)
    assert(s3.rows == ins3 + del3 + upd3)
    assert(ChangeFeedFollower.cursor(consumer) == s3.to)
  }

  test("crash between delta write and cursor publish heals identically") {
    val (lake, driver) = mkLake("crash")
    val consumer = TestSpark.tmpDir("cff-crash")
    driver.run(maxBatches = 2)
    ChangeFeedFollower.drain(spark, lake, consumer)
    driver.run(maxBatches = 1)

    // simulate the crash: compute and write the delta batch but die before
    // the cursor publish (mangle the output to prove the re-run overwrites)
    val from = ChangeFeedFollower.cursor(consumer)
    val to = lake.currentSnapshot.get.snapshotId
    val out = s"$consumer/delta_${from}_$to"
    ChangeFeedReader.between(spark, lake, from, to)
      .limit(1).write.mode("overwrite").parquet(out) // partial output
    assert(ChangeFeedFollower.cursor(consumer) == from, "cursor unmoved")

    val healed = ChangeFeedFollower.drain(spark, lake, consumer).get
    assert(healed.from == from && healed.to == to && healed.out == out)
    val (ins, del, upd) = deltaOracle(lake, from, to)
    assert(healed.rows == ins + del + upd)
    val c = countsOf(out)
    assert(c.getOrElse("inserted", 0L) == ins)
    assert(c.getOrElse("deleted", 0L) == del)
    assert(c.getOrElse("updated", 0L) == upd)
  }

  test("image columns ride along; compaction between drains nets to zero") {
    val (lake, driver) = mkLake("img")
    val consumer = TestSpark.tmpDir("cff-img")
    driver.run(maxBatches = 2)
    val s1 = ChangeFeedFollower.drain(spark, lake, consumer,
      imageCols = Seq("text")).get
    val cols = spark.read.parquet(s1.out).columns.toSet
    assert(cols.contains("pre_text") && cols.contains("post_text"))

    // maintenance-only window: compaction commits a snapshot with zero net
    // row changes — the drain advances the cursor with an empty batch
    Compaction.compact(lake)
    val s2 = ChangeFeedFollower.drain(spark, lake, consumer).get
    assert(s2.rows == 0L)
    assert(ChangeFeedFollower.cursor(consumer) ==
      lake.currentSnapshot.get.snapshotId)
  }
}
