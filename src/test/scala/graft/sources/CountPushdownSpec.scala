package graft.sources

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.TestSpark
import graft.cdc.CdcApply
import graft.lake.LakeTable

/** Metadata-only COUNT(*): `Snapshot.liveRows` is maintained from the
  * change feed's audited transitions (inserted - deleted per merge), so a
  * bare `SELECT count(*)` through the V2 catalog answers from the snapshot
  * JSON — provably without data IO (the spec deletes a data file from disk
  * and the count still answers). Any WHERE clause or a poisoned lineage
  * (change-feed-disabled commit) falls back to the real scan. */
class CountPushdownSpec extends AnyFunSuite {
  lazy val spark: SparkSession = {
    val s = TestSpark.spark
    s.conf.set("spark.sql.catalog.graft", "graft.sources.GraftCatalog")
    s
  }

  private def batch(rows: Seq[(String, Int, Long, String)]): DataFrame = {
    import spark.implicits._
    rows.toDF("conv_id", "turn_idx", "_lsn", "op")
      .withColumn("role", lit("user"))
      .withColumn("text", concat(lit("t-"), col("_lsn")))
      .withColumn("_src_part", (col("_lsn") % 4).cast("int"))
      .withColumn("_src_off", col("_lsn"))
  }

  /** wave1: 32 convs x 4 turns = 128 live. wave2: 8 updates, 8 deletes of
    * live keys, 4 inserts of new keys -> 124 live. */
  private def seed(name: String, mor: Boolean,
                   cf: Boolean = true): (LakeTable, String) = {
    val dir = TestSpark.tmpDir(name)
    val lake = new LakeTable(spark, dir)
    val w1 = (0 until 32).flatMap(c =>
      (0 until 4).map(t => (f"conv$c%02d", t, (c * 4 + t).toLong, "U")))
    CdcApply.apply(lake, batch(w1), epoch = 1, nBuckets = 8, mor = mor,
      changeFeed = cf)
    val w2 =
      (0 until 2).flatMap(c => (0 until 4).map(t =>
        (f"conv$c%02d", t, (1000 + c * 4 + t).toLong, "D"))) ++
      (2 until 4).flatMap(c => (0 until 4).map(t =>
        (f"conv$c%02d", t, (1100 + c * 4 + t).toLong, "U"))) ++
      (0 until 4).map(t => ("convX", t, (1200 + t).toLong, "U"))
    CdcApply.apply(lake, batch(w2), epoch = 2, nBuckets = 8, mor = mor,
      changeFeed = cf)
    (lake, dir)
  }

  private def countSql(dir: String, suffix: String = ""): Long =
    spark.sql(s"SELECT count(*) FROM graft.`$dir`$suffix").head().getLong(0)

  test("bare count(*) answers from metadata — no data IO (CoW)") {
    val (lake, dir) = seed("cnt-cow", mor = false)
    val truth = lake.read().count()
    assert(truth == 124L, "seed arithmetic drifted")
    assert(lake.currentSnapshot.get.liveRows == truth,
      "audited liveRows diverges from the scanned truth")
    assert(countSql(dir) == truth)

    // the proof it never touched data: remove a data file from disk —
    // the metadata count still answers, a WHERE-count (real scan) breaks
    val victim = lake.currentSnapshot.get.files.head.path
    assert(new java.io.File(victim).delete(), s"could not delete $victim")
    assert(countSql(dir) == truth,
      "count(*) read data files — pushdown did not happen")
    intercept[Exception] {
      spark.sql(s"SELECT count(*) FROM graft.`$dir` WHERE turn_idx >= 0")
        .head()
    }
  }

  test("merge-on-read: blind appends report unknown; count falls back") {
    val (lake, dir) = seed("cnt-mor", mor = true)
    assert(lake.currentSnapshot.get.liveRows == -1L,
      "a MoR append has no write-side audit — it must not claim a count")
    assert(countSql(dir) == lake.read().count())
    // folds carry the (unknown) count rather than inventing one
    CdcApply.foldBuckets(lake, (0 until 8).toSet)
    assert(lake.currentSnapshot.get.liveRows == -1L)
    assert(countSql(dir) == 124L)
  }

  test("WHERE blocks the pushdown; filtered counts stay exact") {
    val (lake, dir) = seed("cnt-where", mor = false)
    val truth = lake.read().filter(col("turn_idx") >= 2).count()
    assert(countSql(dir, " WHERE turn_idx >= 2") == truth)
  }

  test("change-feed-disabled commit poisons the lineage; count falls back") {
    val (lake, dir) = seed("cnt-nocf", mor = false, cf = false)
    assert(lake.currentSnapshot.get.liveRows == -1L,
      "a cf-disabled merge must not claim an audited count")
    assert(countSql(dir) == lake.read().count(),
      "fallback scan count diverges")
  }

  test("DML and maintenance keep the audited count exact") {
    val (lake, dir) = seed("cnt-dml", mor = false)
    graft.sql.GraftDml.sql(lake, "DELETE FROM lake WHERE conv_id = 'conv05'")
    assert(lake.currentSnapshot.get.liveRows == 120L)
    assert(countSql(dir) == 120L)
    graft.lake.Compaction.compact(lake) // rewrite: live set unchanged
    assert(countSql(dir) == 120L)
  }

  test("time travel counts the pinned snapshot, not the head") {
    val (lake, dir) = seed("cnt-tt", mor = false)
    val firstId = lake.snapshots.map(_.snapshotId).min
    assert(countSql(dir, s" VERSION AS OF $firstId") == 128L,
      "time travel must answer from the pinned snapshot's own count")
    assert(countSql(dir) == 124L)
  }
}
