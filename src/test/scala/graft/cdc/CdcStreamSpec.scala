package graft.cdc

import org.scalatest.funsuite.AnyFunSuite

import graft.TestSpark
import graft.changelog.ChangelogGen
import graft.lake.LakeTable
import graft.model.Schemas

/** The Structured Streaming front-end: file-source tail + foreachBatch MERGE
  * fenced on the checkpointed batchId (north rule's binlog tailer shape). */
class CdcStreamSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark

  test("streaming replay equals fold oracle and resumes from checkpoint") {
    val dir = TestSpark.tmpDir("stream-cl")
    val cfg = ChangelogGen.Config(
      nEvents = 3000, nConvs = 30, turnsPerConv = 8,
      pUpdate = 0.35, pDelete = 0.08, pDup = 0.1, segSize = 500)
    ChangelogGen.write(spark, dir, cfg)

    val lake = new LakeTable(spark, TestSpark.tmpDir("stream-lake"))
    val agg = new LakeTable(spark, TestSpark.tmpDir("stream-agg"))
    val ckpt = TestSpark.tmpDir("stream-ckpt")

    // first run: consume at most a few files per trigger, AvailableNow drains all
    CdcStream.run(spark, dir, lake, ckpt, Schemas.changeEventSchema,
      nBuckets = 8, maxFilesPerTrigger = 2, aggLake = Some(agg))
    val events = spark.read.parquet(dir)
    assert(CdcOracle.tableState(lake.read()) == CdcOracle.fold(events))
    // streaming-maintained derived table equals recompute-from-scratch
    val gotAgg = agg.read().select("conv_id", "n_turns").collect()
      .map(r => (r.getString(0), r.getInt(1))).toMap
    val wantAgg = lake.read().groupBy("conv_id").count().collect()
      .map(r => (r.getString(0), r.getLong(1).toInt)).toMap
    assert(gotAgg == wantAgg)
    val snapAfter = lake.currentSnapshot.get

    // re-run against the same checkpoint: nothing new -> no new snapshots
    CdcStream.run(spark, dir, lake, ckpt, Schemas.changeEventSchema,
      nBuckets = 8, maxFilesPerTrigger = 2)
    assert(lake.currentSnapshot.get.snapshotId == snapAfter.snapshotId)

    // append two more segments mid-stream; the tailer picks up only the delta
    val more = ChangelogGen.Config(cfg.nEvents + 1000, nConvs = 30,
      turnsPerConv = 8, pUpdate = 0.35, pDelete = 0.08, pDup = 0.1, segSize = 500)
    ChangelogGen.events(spark, more, cfg.nEvents, more.nEvents, withEvolution = false)
      .withColumn("p", org.apache.spark.sql.functions.col("_src_part"))
      .repartition(1)
      .write.mode("append").partitionBy("seg", "p").parquet(dir)
    CdcStream.run(spark, dir, lake, ckpt, Schemas.changeEventSchema,
      nBuckets = 8, maxFilesPerTrigger = 2)
    val eventsAll = spark.read.parquet(dir)
    assert(CdcOracle.tableState(lake.read()) == CdcOracle.fold(eventsAll))
    assert(lake.currentSnapshot.get.snapshotId > snapAfter.snapshotId)
  }
}
