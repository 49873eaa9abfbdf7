package graft.lake

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.TestSpark
import graft.cdc.CdcApply

/** Table-level CHECK constraints: enforced inside the merge's validation
  * pass (violations quarantined with reason check:<name>, never merged),
  * SQL NULL semantics (NULL passes; a column the batch doesn't carry reads
  * as the NULL the merge would store), existing-data validation on add,
  * and the footer fast path stands down while constraints exist. */
class CheckConstraintSpec extends AnyFunSuite {
  lazy val spark: SparkSession = TestSpark.spark

  private def batch(rows: Seq[(String, Int, java.lang.Double, Long)]): DataFrame = {
    import spark.implicits._
    rows.toDF("conv_id", "turn_idx", "score", "_lsn")
      .withColumn("op", lit("U"))
      .withColumn("role", lit("user"))
      .withColumn("_src_part", lit(0))
      .withColumn("_src_off", col("_lsn"))
  }

  private def quarantineReasons(lake: LakeTable, epoch: Long): Seq[String] = {
    val dir = s"${lake.root}/quarantine/epoch=$epoch"
    if (!LakeIO.exists(dir)) return Nil
    spark.read.parquet(dir).select("_reason").collect()
      .map(_.getString(0)).toSeq
  }

  test("violations quarantine with check:<name>; conforming rows merge;" +
      " NULL passes") {
    val lake = new LakeTable(spark, TestSpark.tmpDir("chk-basic"))
    CdcApply.apply(lake, batch(Seq(("a", 0, 1.0, 1L))), epoch = 1, nBuckets = 4)
    lake.addCheck("score_nonneg", "score >= 0")

    val st = CdcApply.apply(lake, batch(Seq(
      ("a", 1, 2.0, 10L),           // conforming
      ("b", 0, -5.0, 11L),          // violates
      ("c", 0, null, 12L))),        // NULL passes (SQL CHECK)
      epoch = 2, nBuckets = 4)
    assert(st.failedEvents == 1)
    assert(quarantineReasons(lake, 2) == Seq("check:score_nonneg"))
    val keys = lake.read().select("conv_id", "turn_idx").collect()
      .map(r => (r.getString(0), r.getInt(1))).toSet
    assert(keys == Set(("a", 0), ("a", 1), ("c", 0)),
      "the violating row must not merge; the null row must")
  }

  test("a check on a column the batch doesn't carry reads as NULL") {
    val lake = new LakeTable(spark, TestSpark.tmpDir("chk-missing"))
    CdcApply.apply(lake, batch(Seq(("a", 0, 1.0, 1L))), epoch = 1, nBuckets = 4)
    lake.addCheck("score_ok", "score >= 0")
    lake.addCheck("score_set", "score IS NOT NULL")
    // batch WITHOUT the score column: score_ok passes (NULL), score_set rejects
    import spark.implicits._
    val noScore = Seq(("d", 0, 20L)).toDF("conv_id", "turn_idx", "_lsn")
      .withColumn("op", lit("U")).withColumn("role", lit("user"))
      .withColumn("_src_part", lit(0)).withColumn("_src_off", col("_lsn"))
    val st = CdcApply.apply(lake, noScore, epoch = 2, nBuckets = 4)
    assert(st.failedEvents == 1)
    assert(quarantineReasons(lake, 2) == Seq("check:score_set"))
  }

  test("addCheck validates existing rows; novalidate skips; drop restores") {
    val lake = new LakeTable(spark, TestSpark.tmpDir("chk-add"))
    CdcApply.apply(lake, batch(Seq(("a", 0, -1.0, 1L))), epoch = 1, nBuckets = 4)
    intercept[IllegalArgumentException] {
      lake.addCheck("score_nonneg", "score >= 0")
    }
    lake.addCheck("score_nonneg", "score >= 0", validateExisting = false)
    assert(lake.checks == Map("score_nonneg" -> "score >= 0"))
    // immutable: re-add refuses, drop + enforcementless re-ingest works
    intercept[CommitConflictException] {
      lake.addCheck("score_nonneg", "score >= -100")
    }
    val blocked = CdcApply.apply(lake, batch(Seq(("b", 0, -2.0, 10L))),
      epoch = 2, nBuckets = 4)
    assert(blocked.failedEvents == 1)
    assert(lake.dropCheck("score_nonneg"))
    val ok = CdcApply.apply(lake, batch(Seq(("b", 1, -3.0, 11L))),
      epoch = 3, nBuckets = 4)
    assert(ok.failedEvents == 0)
    assert(lake.read().filter(col("score") === -3.0).count() == 1)
  }

  test("constraints disable the footer keys-null-free shortcut") {
    val lake = new LakeTable(spark, TestSpark.tmpDir("chk-fastpath"))
    CdcApply.apply(lake, batch(Seq(("a", 0, 1.0, 1L))), epoch = 1, nBuckets = 4)
    lake.addCheck("score_nonneg", "score >= 0")
    // keysNullFree=true (the footer-proved fast path) must NOT skip the
    // constraint scan — the violation still quarantines
    val st = CdcApply.apply(lake, batch(Seq(("e", 0, -9.0, 30L))),
      epoch = 2, nBuckets = 4,
      probeInfo = Some(CdcApply.ProbeInfo(1L,
        Seq(PartitionLineage(0, 30L, 30L)), keysNullFree = true)))
    assert(st.failedEvents == 1)
    assert(quarantineReasons(lake, 2) == Seq("check:score_nonneg"))
    assert(lake.lookup("e").isEmpty)
  }

  test("a typo'd expression fails at add time, not in the next merge") {
    val lake = new LakeTable(spark, TestSpark.tmpDir("chk-typo"))
    CdcApply.apply(lake, batch(Seq(("a", 0, 1.0, 1L))), epoch = 1, nBuckets = 4)
    intercept[Exception] { lake.addCheck("bad", "score >=") }
    assert(lake.checks.isEmpty)
  }
}
