package graft.sources

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.execution.SparkPlan
import org.apache.spark.sql.execution.adaptive.AdaptiveSparkPlanExec
import org.apache.spark.sql.execution.datasources.v2.BatchScanExec
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.TestSpark
import graft.cdc.CdcApply
import graft.lake.LakeTable

/** Columnar V2 catalog reads on copy-on-write: no election to run, only
  * the tombstone filter, so batches flow zero-copy from the vectorized
  * parquet reader (clean batches reprojected over the same vectors;
  * tombstoned batches compacted). The plan must SHOW a columnar scan, the
  * results must equal the engine's own read path exactly — including
  * tombstone filtering — and merge-on-read must stay row-based (the
  * per-bucket LWW election is row-at-a-time). */
class ColumnarReadSpec extends AnyFunSuite {
  lazy val spark: SparkSession = {
    val s = TestSpark.spark
    s.conf.set("spark.sql.catalog.graft", "graft.sources.GraftCatalog")
    s
  }

  private def batch(rows: Seq[(String, Int, Long, String)]): DataFrame = {
    import spark.implicits._
    rows.toDF("conv_id", "turn_idx", "_lsn", "op")
      .withColumn("role",
        when(col("turn_idx") % 2 === 0, "user").otherwise("assistant"))
      .withColumn("text", concat(lit("t-"), col("_lsn")))
      .withColumn("tool", lit(null).cast("string"))
      .withColumn("ts", to_timestamp(lit("2024-03-01T00:00:00")))
      .withColumn("_src_part", (col("_lsn") % 4).cast("int"))
      .withColumn("_src_off", col("_lsn"))
  }

  private def seed(name: String, mor: Boolean): (LakeTable, String) = {
    val dir = TestSpark.tmpDir(name)
    val lake = new LakeTable(spark, dir)
    val w1 = (0 until 24).flatMap(c =>
      (0 until 4).map(t => (f"conv$c%02d", t, (c * 4 + t).toLong, "U")))
    CdcApply.apply(lake, batch(w1), epoch = 1, nBuckets = 8, mor = mor)
    // deletes land tombstones inside otherwise-live files
    val w2 = (0 until 3).flatMap(c =>
      (0 until 2).map(t => (f"conv$c%02d", t, (500 + c * 2 + t).toLong, "D")))
    CdcApply.apply(lake, batch(w2), epoch = 2, nBuckets = 8, mor = mor)
    (lake, dir)
  }

  /** The executed scan node, unwrapped from AQE. */
  private def scanOf(df: DataFrame): BatchScanExec = {
    df.collect() // finalize the adaptive plan first
    def strip(p: SparkPlan): SparkPlan = p match {
      case a: AdaptiveSparkPlanExec => strip(a.executedPlan)
      case other => other
    }
    strip(df.queryExecution.executedPlan)
      .collectFirst { case b: BatchScanExec => b }
      .getOrElse(fail("no BatchScanExec in the plan"))
  }

  test("CoW catalog scan is columnar and equals the engine read exactly") {
    val (lake, dir) = seed("col-cow", mor = false)
    val df = spark.sql(
      s"SELECT conv_id, turn_idx, role, text, ts FROM graft.`$dir`")
    assert(scanOf(df).supportsColumnar,
      "copy-on-write catalog scan must be columnar")
    val got = df.collect().map(_.toString).sorted.toSeq
    val want = lake.read()
      .select("conv_id", "turn_idx", "role", "text", "ts")
      .collect().map(_.toString).sorted.toSeq
    assert(got == want, "columnar read diverges from the engine read")
    // tombstoned keys must be gone
    assert(!got.exists(_.startsWith("[conv00,0,")),
      "a tombstoned row leaked through the columnar path")
  }

  test("columnar batches compact tombstones without copying clean batches") {
    val (lake, dir) = seed("col-count", mor = false)
    // row counts: 24*4 seeded - 6 deleted = 90
    val n = spark.sql(
      s"SELECT conv_id FROM graft.`$dir` WHERE role = 'user'").count()
    val want = lake.read().filter(col("role") === "user").count()
    assert(n == want)
  }

  test("merge-on-read stays row-based (election is row-at-a-time)") {
    val (lake, dir) = seed("col-mor", mor = true)
    val df = spark.sql(
      s"SELECT conv_id, turn_idx, text FROM graft.`$dir`")
    assert(!scanOf(df).supportsColumnar,
      "MoR scan must not claim columnar support")
    val got = df.collect().map(_.toString).sorted.toSeq
    val want = lake.read().select("conv_id", "turn_idx", "text")
      .collect().map(_.toString).sorted.toSeq
    assert(got == want)
  }

  test("columnar + runtime filtering + SPJ surfaces stay exact") {
    val (lake, dir) = seed("col-rtf", mor = false)
    import spark.implicits._
    val dimDir = TestSpark.tmpDir("col-rtf-dim")
    (0 until 24).map(c => (f"conv$c%02d", if (c % 7 == 0) 1 else 0))
      .toDF("conv_id", "pick").write.mode("overwrite").parquet(dimDir)
    spark.read.parquet(dimDir).createOrReplaceTempView("col_dim")
    val df = spark.sql(
      s"""SELECT t.conv_id, t.turn_idx FROM graft.`$dir` t
         |JOIN col_dim d ON t.conv_id = d.conv_id WHERE d.pick = 1""".stripMargin)
    val got = df.collect().map(_.toString).sorted.toSeq
    val want = lake.read()
      .join(spark.read.parquet(dimDir).filter(col("pick") === 1), "conv_id")
      .select("conv_id", "turn_idx")
      .collect().map(_.toString).sorted.toSeq
    assert(got == want)
  }
}
