package graft.cdc

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.TestSpark
import graft.changelog.ChangelogGen
import graft.lake.LakeTable

/** Filtered/projected row-level replica maintained from the change feed
  * (graft.cdc.Replica): after every refresh the replica must equal
  * `SELECT keyCols, cols FROM source WHERE predicate` EXACTLY — including
  * rows that LEAVE the predicate via an update (they must be deleted from
  * the replica, the classic mirror-maintenance bug). Refreshes are epoch-
  * fenced and catch-up by construction; the (predicate, cols) contract is
  * persisted at creation and a different one is refused. */
class ReplicaSpec extends AnyFunSuite {
  lazy val spark: SparkSession = TestSpark.spark

  private val PRED = "role = 'assistant'"
  private val COLS = Seq("role", "text")

  private def batch(rows: Seq[(String, Int, String, String, Long)]): DataFrame = {
    import spark.implicits._
    rows.toDF("conv_id", "turn_idx", "role", "text", "_lsn")
      .withColumn("op", when(col("role") === "DEL", lit("D")).otherwise(lit("U")))
      .withColumn("role",
        when(col("role") === "DEL", lit(null).cast("string"))
          .otherwise(col("role")))
      .withColumn("_src_part", lit(0))
      .withColumn("_src_off", col("_lsn"))
  }

  private def expected(source: LakeTable): Set[(String, Int, String, String)] =
    source.read().filter(expr(PRED))
      .select("conv_id", "turn_idx", "role", "text").collect()
      .map(r => (r.getString(0), r.getInt(1), r.getString(2), r.getString(3)))
      .toSet

  private def actual(replica: LakeTable): Set[(String, Int, String, String)] =
    replica.read().select("conv_id", "turn_idx", "role", "text").collect()
      .map(r => (r.getString(0), r.getInt(1), r.getString(2), r.getString(3)))
      .toSet

  private def roundtrip(name: String, mor: Boolean): Unit = {
    val source = new LakeTable(spark, TestSpark.tmpDir(s"$name-src"))
    val replica = new LakeTable(spark, TestSpark.tmpDir(s"$name-rep"))
    def refresh() =
      Replica.refresh(spark, source, replica, PRED, COLS, nBuckets = 4)

    // batch 1: a mix of matching and non-matching rows
    CdcApply.apply(source, batch(Seq(
      ("a", 0, "user", "a0", 1L), ("a", 1, "assistant", "a1", 2L),
      ("b", 0, "assistant", "b0", 3L), ("b", 1, "user", "b1", 4L),
      ("c", 0, "assistant", "c0", 5L))),
      epoch = 1, nBuckets = 8, mor = mor)
    assert(refresh().isDefined)
    assert(actual(replica) == expected(source))
    assert(actual(replica).map(_._1) == Set("a", "b", "c"))

    // batch 2: b0 LEAVES the predicate (update to user), a0 ENTERS it,
    // c is deleted at the source, and a1 gets a newer text
    CdcApply.apply(source, batch(Seq(
      ("b", 0, "user", "b0v2", 6L), ("a", 0, "assistant", "a0v2", 7L),
      ("c", 0, "DEL", null, 8L), ("a", 1, "assistant", "a1v2", 9L))),
      epoch = 2, nBuckets = 8, mor = mor)
    assert(refresh().isDefined)
    assert(actual(replica) == expected(source))
    assert(!actual(replica).exists(r => r._1 == "b" && r._2 == 0),
      "a row that left the predicate must be deleted from the replica")
    assert(!actual(replica).exists(_._1 == "c"))
    assert(actual(replica).contains(("a", 1, "assistant", "a1v2")))

    // replayed refresh is fenced into a no-op
    assert(refresh().isEmpty)
  }

  test("replica equals SELECT-WHERE after inserts/updates/exits/deletes (CoW)") {
    roundtrip("rep-cow", mor = false)
  }

  test("replica equals SELECT-WHERE over a merge-on-read source") {
    roundtrip("rep-mor", mor = true)
  }

  test("catch-up: one refresh folds several missed source batches") {
    val source = new LakeTable(spark, TestSpark.tmpDir("rep-catchup-src"))
    val replica = new LakeTable(spark, TestSpark.tmpDir("rep-catchup-rep"))
    CdcApply.apply(source, batch(Seq(("a", 0, "assistant", "a0", 1L))),
      epoch = 1, nBuckets = 4)
    CdcApply.apply(source, batch(Seq(("b", 0, "assistant", "b0", 2L))),
      epoch = 2, nBuckets = 4)
    CdcApply.apply(source, batch(Seq(("a", 0, "user", "a0v2", 3L))),
      epoch = 3, nBuckets = 4)
    val st = Replica.refresh(spark, source, replica, PRED, COLS, 4).get
    assert(st.fromSnapshot == -1L)
    assert(actual(replica) == expected(source))
    assert(actual(replica).map(_._1) == Set("b"))
  }

  test("the persisted contract refuses a different predicate or cols") {
    val source = new LakeTable(spark, TestSpark.tmpDir("rep-cfg-src"))
    val replica = new LakeTable(spark, TestSpark.tmpDir("rep-cfg-rep"))
    CdcApply.apply(source, batch(Seq(("a", 0, "assistant", "a0", 1L))),
      epoch = 1, nBuckets = 4)
    Replica.refresh(spark, source, replica, PRED, COLS, 4)
    CdcApply.apply(source, batch(Seq(("b", 0, "assistant", "b0", 2L))),
      epoch = 2, nBuckets = 4)
    intercept[IllegalArgumentException] {
      Replica.refresh(spark, source, replica, "role = 'user'", COLS, 4)
    }
    intercept[IllegalArgumentException] {
      Replica.refresh(spark, source, replica, PRED, Seq("role"), 4)
    }
    // attached-mode (no args) picks the persisted contract up
    assert(Replica.refreshAttached(spark, source, replica).isDefined)
    assert(actual(replica) == expected(source))
  }

  test("driver-attached replica survives a mid-replay stop/resume") {
    val dir = TestSpark.tmpDir("rep-driver-log")
    ChangelogGen.write(spark, dir, ChangelogGen.Config(
      nEvents = 4000, nConvs = 30, turnsPerConv = 6,
      pUpdate = 0.4, pDelete = 0.05, pDup = 0.05, segSize = 1000))
    val lake = new LakeTable(spark, TestSpark.tmpDir("rep-driver-lake"))
    val replica = new LakeTable(spark, TestSpark.tmpDir("rep-driver-rep"))
    def driver() = new CdcDriver(spark, dir, lake, segmentsPerBatch = 1,
      nBuckets = 8, quiet = true, replica = Some(replica),
      replicaWhere = PRED, replicaCols = COLS)
    driver().run(maxBatches = 2) // stop mid-replay
    driver().run()               // resume: catch-up then finish
    assert(actual(replica) == expected(lake))
    // full re-run: everything fenced, replica unchanged
    val before = actual(replica)
    assert(driver().run().forall(_.skipped))
    assert(actual(replica) == before)
  }
}
