package graft.cdc

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.TestSpark
import graft.lake.LakeTable

/** Dead-letter replay: quarantined events re-validated against the
  * table's CURRENT rules, clean rows merged at their ORIGINAL lsns (LWW
  * decides — no resurrection of superseded data), still-bad rows returned
  * to their original quarantine address, idempotent consumption. */
class RequeueSpec extends AnyFunSuite {
  lazy val spark: SparkSession = TestSpark.spark

  private def ev(rows: Seq[(String, Int, java.lang.Double, Long)]): DataFrame = {
    import spark.implicits._
    rows.toDF("conv_id", "turn_idx", "score", "_lsn")
      .withColumn("op", lit("U"))
      .withColumn("_src_part", lit(0))
      .withColumn("_src_off", col("_lsn"))
  }

  test("after dropping the offending constraint, clean dead letters merge" +
      " at original lsns; structurally-bad rows stay quarantined") {
    val lake = new LakeTable(spark, TestSpark.tmpDir("rq-basic"))
    CdcApply.apply(lake, ev(Seq(("a", 0, 1.0, 1L))), epoch = 1, nBuckets = 4)
    lake.addCheck("score_nonneg", "score >= 0")

    // batch 2: one constraint violation + one structurally-bad event
    import spark.implicits._
    val bad = ev(Seq(("b", 0, -5.0, 10L)))
      .unionByName(Seq((null.asInstanceOf[String], 0, 3.0, 11L))
        .toDF("conv_id", "turn_idx", "score", "_lsn")
        .withColumn("op", lit("U")).withColumn("_src_part", lit(0))
        .withColumn("_src_off", col("_lsn")))
    val st2 = CdcApply.apply(lake, bad, epoch = 2, nBuckets = 4)
    assert(st2.failedEvents == 2)

    // batch 3 moves on; it also stores a NEWER image of b/0, so the
    // requeued (-5.0, lsn 10) event must LOSE LWW
    CdcApply.apply(lake, ev(Seq(("b", 0, 7.0, 20L))), epoch = 3, nBuckets = 4)

    lake.dropCheck("score_nonneg")
    val rq = Requeue.requeue(lake, 2L)
    assert(rq.found == 2 && rq.applied && rq.stillFailed == 1)
    // the constraint-violating row is clean now but OLDER than lsn 20:
    // LWW keeps the stored image
    val b0 = lake.lookup("b").collect()
    assert(b0.length == 1 && b0.head.getAs[Double]("score") == 7.0)
    // the null-key row is back at its original address
    val q = spark.read.parquet(s"${lake.root}/quarantine/epoch=2")
    assert(q.count() == 1)
    assert(q.select("_reason").head().getString(0) == "null_key")
    // epoch untouched by the maintenance merge; the feed continues
    assert(lake.currentSnapshot.get.epoch == 3)

    // idempotent: a second requeue finds only the still-bad row, applies
    // nothing, and leaves it in place
    val rq2 = Requeue.requeue(lake, 2L)
    assert(rq2.found == 1 && !rq2.applied && rq2.stillFailed == 1)
    assert(spark.read.parquet(s"${lake.root}/quarantine/epoch=2").count() == 1)
  }

  test("a requeued event NEWER than stored state wins LWW") {
    val lake = new LakeTable(spark, TestSpark.tmpDir("rq-newer"))
    CdcApply.apply(lake, ev(Seq(("a", 0, 1.0, 1L))), epoch = 1, nBuckets = 4)
    lake.addCheck("score_cap", "score < 100")
    CdcApply.apply(lake, ev(Seq(("a", 0, 500.0, 10L))), epoch = 2, nBuckets = 4)
    assert(lake.lookup("a").head().getAs[Double]("score") == 1.0)
    lake.dropCheck("score_cap")
    val rq = Requeue.requeue(lake, 2L)
    assert(rq.applied && rq.stillFailed == 0)
    assert(lake.lookup("a").head().getAs[Double]("score") == 500.0)
  }

  test("requeue of an epoch with no quarantine is a no-op") {
    val lake = new LakeTable(spark, TestSpark.tmpDir("rq-noop"))
    CdcApply.apply(lake, ev(Seq(("a", 0, 1.0, 1L))), epoch = 1, nBuckets = 4)
    val rq = Requeue.requeue(lake, 99L)
    assert(rq.found == 0 && !rq.applied)
  }
}
