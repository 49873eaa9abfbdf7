package graft.streaming

import scala.collection.mutable

import org.apache.spark.sql.streaming.Trigger
import org.scalatest.funsuite.AnyFunSuite

import graft.TestSpark
import graft.cdc.CdcDriver
import graft.changelog.ChangelogGen
import graft.lake.LakeTable

/** The change feed as a Structured Streaming source: the first batch is the
  * full live image, later batches are exact snapshot diffs, the checkpoint
  * resumes mid-history, and an expired diff base fails loudly instead of
  * emitting a silent empty batch. */
class GraftChangesSourceSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark

  private def mkLake(tag: String): (LakeTable, CdcDriver) = {
    val dir = TestSpark.tmpDir(s"gcs-cl-$tag")
    ChangelogGen.write(spark, dir, ChangelogGen.Config(
      nEvents = 3000, nConvs = 25, turnsPerConv = 6,
      pUpdate = 0.4, pDelete = 0.1, pDup = 0.1, segSize = 500))
    val lake = new LakeTable(spark, TestSpark.tmpDir(s"gcs-lake-$tag"))
    (lake, new CdcDriver(spark, dir, lake, segmentsPerBatch = 1,
      nBuckets = 8, quiet = true))
  }

  private def stateOf(lake: LakeTable, id: Long) =
    lake.readAt(id).select("conv_id", "turn_idx", "_lsn").collect()
      .map(r => (r.getString(0), r.getInt(1)) -> r.getLong(2)).toMap

  /** (inserted, deleted, updated) between two snapshots, from row states. */
  private def deltaOracle(lake: LakeTable, from: Long, to: Long) = {
    val before = if (from < 0) Map.empty[(String, Int), Long]
      else stateOf(lake, from)
    val after = stateOf(lake, to)
    ((after.keySet -- before.keySet).size.toLong,
     (before.keySet -- after.keySet).size.toLong,
     (after.keySet & before.keySet).count(k => after(k) != before(k)).toLong)
  }

  /** Drain the stream to exhaustion with AvailableNow; returns per-action
    * row counts summed over every micro-batch, plus the batch count. */
  private def drain(lakeRoot: String, checkpoint: String,
                    options: Map[String, String] = Map.empty)
      : (Map[String, Long], Int) = {
    val counts = mutable.Map.empty[String, Long].withDefaultValue(0L)
    var batches = 0
    val reader = spark.readStream.format("graft-changes")
      .option("path", lakeRoot)
    options.foreach { case (k, v) => reader.option(k, v) }
    val q = reader.load().writeStream
      .trigger(Trigger.AvailableNow())
      .option("checkpointLocation", checkpoint)
      .foreachBatch { (df: org.apache.spark.sql.DataFrame, _: Long) =>
        val rows = df.groupBy("action").count().collect()
        counts.synchronized {
          batches += 1
          rows.foreach(r => counts(r.getString(0)) += r.getLong(1))
        }
      }.start()
    q.awaitTermination()
    (counts.toMap.withDefaultValue(0L), batches)
  }

  test("full image first, exact deltas after, checkpoint resumes") {
    val (lake, driver) = mkLake("steps")
    val ckpt = TestSpark.tmpDir("gcs-ckpt")

    driver.run(maxBatches = 2)
    val head1 = lake.currentSnapshot.get.snapshotId
    val (c1, _) = drain(lake.root, ckpt)
    val (ins1, del1, upd1) = deltaOracle(lake, -1L, head1)
    assert(c1("inserted") == ins1 && del1 == 0 && upd1 == 0)
    assert(c1("deleted") == 0 && c1("updated") == 0)

    // nothing new: the drained stream emits no rows
    val (c2, _) = drain(lake.root, ckpt)
    assert(c2.values.sum == 0)

    // two more commits fold into the checkpoint-resumed drain
    driver.run(maxBatches = 2)
    val head2 = lake.currentSnapshot.get.snapshotId
    val (c3, _) = drain(lake.root, ckpt)
    val (ins3, del3, upd3) = deltaOracle(lake, head1, head2)
    assert(c3("inserted") == ins3)
    assert(c3("deleted") == del3)
    assert(c3("updated") == upd3)
  }

  test("images ride along; none suppresses them; startfrom skips backfill") {
    val (lake, driver) = mkLake("opts")
    driver.run(maxBatches = 1)
    val head = lake.currentSnapshot.get.snapshotId

    val withImages = spark.readStream.format("graft-changes")
      .option("path", lake.root).load()
    assert(withImages.columns.contains("post_text"))
    assert(withImages.columns.contains("pre_role"))

    val bare = spark.readStream.format("graft-changes")
      .option("path", lake.root).option("images", "none").load()
    assert(!bare.columns.exists(_.startsWith("post_")) ||
      bare.columns.filter(_.startsWith("post_")).sameElements(Array("post_lsn")))
    assert(bare.columns.contains("post_lsn"))

    intercept[IllegalArgumentException] {
      spark.readStream.format("graft-changes")
        .option("path", lake.root).option("images", "no_such_col").load()
    }

    // startfrom=head: the backfill is skipped, only later commits stream
    val ckpt = TestSpark.tmpDir("gcs-ckpt-sf")
    val (c0, _) = drain(lake.root, ckpt,
      Map("startfrom" -> head.toString, "images" -> "text"))
    assert(c0.values.sum == 0)
    driver.run(maxBatches = 1)
    val head2 = lake.currentSnapshot.get.snapshotId
    val (c1, _) = drain(lake.root, ckpt,
      Map("startfrom" -> head.toString, "images" -> "text"))
    val (ins, del, upd) = deltaOracle(lake, head, head2)
    assert(c1("inserted") == ins && c1("deleted") == del &&
      c1("updated") == upd)
  }

  test("expiry under the consumer: committed history aging out is benign, " +
       "a genuine replay gap fails loudly") {
    def messages(t: Throwable): Seq[String] =
      if (t == null) Nil
      else Option(t.getMessage).toSeq ++ messages(t.getCause)

    // benign: the last batch is COMMITTED, then its from-base expires.
    // Restart recovery re-fetches that batch and discards it unexecuted —
    // the stream must carry on, not brick.
    val (lakeB, driverB) = mkLake("exp-benign")
    val ckptB = TestSpark.tmpDir("gcs-ckpt-expb")
    driverB.run(maxBatches = 1)
    drain(lakeB.root, ckptB)
    driverB.run(maxBatches = 2)
    drain(lakeB.root, ckptB) // committed through the current head
    val headB = lakeB.currentSnapshot.get.snapshotId
    lakeB.expireSnapshots(keepLast = 1) // only the head survives
    val (c0, _) = drain(lakeB.root, ckptB) // restart: recovery fetch only
    assert(c0.values.sum == 0)
    driverB.run(maxBatches = 1) // new delta from the RETAINED head
    val (c1, _) = drain(lakeB.root, ckptB)
    val (ins, del, upd) =
      deltaOracle(lakeB, headB, lakeB.currentSnapshot.get.snapshotId)
    assert(c1("inserted") == ins && c1("deleted") == del &&
      c1("updated") == upd)

    // loud: rows the consumer never saw aged out — the genuine replay must
    // fail with the retention message, never emit a silent empty batch
    val (lakeL, driverL) = mkLake("exp-loud")
    val ckptL = TestSpark.tmpDir("gcs-ckpt-expl")
    driverL.run(maxBatches = 1)
    drain(lakeL.root, ckptL) // checkpoint holds the first head
    driverL.run(maxBatches = 3)
    lakeL.expireSnapshots(keepLast = 1) // the checkpointed base is gone
    val e = intercept[Exception] { drain(lakeL.root, ckptL) }
    assert(messages(e).exists(_.contains("expired under the consumer")))
  }

  test("Trigger.AvailableNow is first-class: the drain target pins at " +
       "trigger start while the live head keeps moving") {
    val (lake, driver) = mkLake("availnow")
    driver.run(maxBatches = 2)
    val source = new GraftChangesSource(spark, lake.root, Nil, -1L,
      GraftChangesSource.feedSchema(lake, Nil))
    val pinned = lake.currentSnapshot.get.snapshotId
    source.prepareForTriggerAvailableNow()
    driver.run(maxBatches = 2) // upstream advances during the drain
    val head = lake.currentSnapshot.get.snapshotId
    assert(head > pinned)
    // admission control answers the PINNED head (deterministic drain end);
    // progress reporting answers the live one
    assert(source.latestOffset(null,
      org.apache.spark.sql.connector.read.streaming.ReadLimit.allAvailable())
      .json.trim.toLong == pinned)
    assert(source.reportLatestOffset().json.trim.toLong == head)
    // and the engine accepts the source as SupportsTriggerAvailableNow —
    // AvailableNow uses the multi-batch executor, not the single-batch
    // fallback whose restart can under-drain after a crash mid-commit
    assert(source.isInstanceOf[
      org.apache.spark.sql.connector.read.streaming.SupportsTriggerAvailableNow])
  }
}
