package graft.changelog

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.TestSpark
import graft.cdc.{CdcDriver, CdcOracle}
import graft.lake.LakeTable

/** Debezium-style JSON-envelope changelog source (JsonChangelog): the
  * reference's native input is JSON envelopes (jobs-core Event.scala:7-93);
  * here the same engine replays either the parquet segment flavor (footer
  * fast paths) or the JSON flavor (schema sidecar + PERMISSIVE parse,
  * corrupt lines quarantined) to the same final state. */
class JsonChangelogSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark

  private def gen(withEvolution: Boolean): String = {
    val dir = TestSpark.tmpDir("jsoncl")
    ChangelogGen.write(spark, dir, ChangelogGen.Config(
      nEvents = 3000, nConvs = 40, turnsPerConv = 5,
      pUpdate = 0.35, pDelete = 0.08, pDup = 0.05, segSize = 750,
      evolveAt = if (withEvolution) 1500 else 0))
    dir
  }

  test("JSON replay equals parquet replay (incl. mid-stream evolution)") {
    val pq = gen(withEvolution = true)
    val js = TestSpark.tmpDir("jsoncl-conv")
    JsonChangelog.fromParquet(spark, pq, js)

    val lakeP = new LakeTable(spark, TestSpark.tmpDir("json-lakeP"))
    new CdcDriver(spark, pq, lakeP, segmentsPerBatch = 2, nBuckets = 8,
      quiet = true).run()
    val lakeJ = new LakeTable(spark, TestSpark.tmpDir("json-lakeJ"))
    new CdcDriver(spark, js, lakeJ, segmentsPerBatch = 2, nBuckets = 8,
      quiet = true, format = "json").run()

    assert(CdcOracle.tableState(lakeJ.read()) ==
      CdcOracle.tableState(lakeP.read()))
    assert(lakeJ.currentSnapshot.get.epoch == lakeP.currentSnapshot.get.epoch)
    // evolution column present on both (JSON: from the sidecar's union
    // schema; parquet: versioned mid-stream)
    assert(lakeJ.read().columns.contains("tool_meta"))
  }

  test("deleted keys stay deleted through the before-image envelope") {
    val pq = gen(withEvolution = false)
    val js = TestSpark.tmpDir("jsoncl-del")
    JsonChangelog.fromParquet(spark, pq, js)
    val oracle = CdcOracle.fold(spark.read.parquet(pq).drop("seg", "p"))
    val lake = new LakeTable(spark, TestSpark.tmpDir("json-lakeD"))
    new CdcDriver(spark, js, lake, segmentsPerBatch = 4, nBuckets = 8,
      quiet = true, format = "json").run()
    assert(CdcOracle.tableState(lake.read()) == oracle)
  }

  test("corrupt lines and unknown ops quarantine; valid rows apply") {
    val pq = gen(withEvolution = false)
    val js = TestSpark.tmpDir("jsoncl-bad")
    JsonChangelog.fromParquet(spark, pq, js)
    // vandalize segment 0 with an extra part file: one garbage line, one
    // unknown-op envelope (a NEW file — appending would invalidate the
    // local FS .crc sidecar, which a real broker/object store has no
    // analogue of)
    val shard0 = new java.io.File(s"$js/seg=0").listFiles()
      .filter(_.isDirectory).head
    val extra = "this is not json\n" +
      """{"op":"x","after":{"conv_id":"conv-00000001","turn_idx":0},""" +
      """"source":{"lsn":1,"part":0,"off":1}}""" + "\n"
    java.nio.file.Files.writeString(
      new java.io.File(shard0, "part-extra-garbage.txt").toPath, extra)

    val oracle = CdcOracle.fold(spark.read.parquet(pq).drop("seg", "p"))
    val lake = new LakeTable(spark, TestSpark.tmpDir("json-lakeQ"))
    val stats = new CdcDriver(spark, js, lake, segmentsPerBatch = 4,
      nBuckets = 8, quiet = true, format = "json").run()
    assert(stats.map(_.failedEvents).sum == 2L,
      s"expected 2 quarantined, got ${stats.map(_.failedEvents).sum}")
    assert(CdcOracle.tableState(lake.read()) == oracle)
  }

  test("streaming tailer over the JSON flavor equals the batch replay") {
    val pq = gen(withEvolution = true)
    val js = TestSpark.tmpDir("jsoncl-stream")
    JsonChangelog.fromParquet(spark, pq, js)

    val lakeB = new LakeTable(spark, TestSpark.tmpDir("json-lakeSB"))
    new CdcDriver(spark, js, lakeB, segmentsPerBatch = 2, nBuckets = 8,
      quiet = true, format = "json").run()

    val lakeS = new LakeTable(spark, TestSpark.tmpDir("json-lakeSS"))
    graft.cdc.CdcStream.run(spark, js, lakeS,
      TestSpark.tmpDir("json-ckpt"), new org.apache.spark.sql.types.StructType(),
      nBuckets = 8, maxFilesPerTrigger = 4, format = "json")
    assert(CdcOracle.tableState(lakeS.read()) ==
      CdcOracle.tableState(lakeB.read()))
  }

  test("parseLines round-trips in-memory envelope strings") {
    val rowSchema = org.apache.spark.sql.types.StructType(Seq(
      org.apache.spark.sql.types.StructField("conv_id",
        org.apache.spark.sql.types.StringType),
      org.apache.spark.sql.types.StructField("turn_idx",
        org.apache.spark.sql.types.IntegerType),
      org.apache.spark.sql.types.StructField("text",
        org.apache.spark.sql.types.StringType)))
    val lines = spark.createDataFrame(java.util.List.of[org.apache.spark.sql.Row](
      org.apache.spark.sql.Row("""{"op":"c","after":{"conv_id":"a","turn_idx":0,"text":"hi"},"source":{"lsn":1,"part":0,"off":1}}"""),
      org.apache.spark.sql.Row("""{"op":"u","after":{"conv_id":"a","turn_idx":0,"text":"hi2"},"source":{"lsn":2,"part":0,"off":2}}"""),
      org.apache.spark.sql.Row("""{"op":"d","before":{"conv_id":"a","turn_idx":0},"source":{"lsn":3,"part":0,"off":3}}""")),
      org.apache.spark.sql.types.StructType(Seq(
        org.apache.spark.sql.types.StructField("value",
          org.apache.spark.sql.types.StringType))))
    val batch = JsonChangelog.parseLines(lines, rowSchema)
    val rows = batch.orderBy("_lsn").collect()
    assert(rows.map(_.getAs[String]("op")).toSeq == Seq("I", "U", "D"))
    assert(rows(1).getAs[String]("text") == "hi2")
    assert(rows(2).getAs[String]("conv_id") == "a") // key from before-image
  }
}
