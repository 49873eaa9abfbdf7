package graft.sql

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.TestSpark
import graft.cdc.CdcApply
import graft.lake.LakeTable

/** SQL DML (DELETE/UPDATE … WHERE) through the epoch-fenced maintenance
  * merge: semantics (tombstones that fence re-delivery, full-image updates,
  * additive SET of a new column), physics (untouched buckets carried by
  * path), and the admin-op contract (epoch kept — the source feed is never
  * fenced; time travel sees the pre-DML state; concurrent source commits
  * retry, not lose). */
class GraftDmlSpec extends AnyFunSuite {
  lazy val spark: SparkSession = TestSpark.spark

  private def batch(rows: Seq[(String, Int, Long)]): DataFrame = {
    import spark.implicits._
    rows.toDF("conv_id", "turn_idx", "_lsn")
      .withColumn("op", lit("U"))
      .withColumn("role", lit("user"))
      .withColumn("text", concat(lit("t-"), col("_lsn")))
      .withColumn("_src_part", (col("_lsn") % 4).cast("int"))
      .withColumn("_src_off", col("_lsn"))
  }

  /** 24 convs x 4 turns. */
  private def seed(name: String, mor: Boolean = false): LakeTable = {
    val lake = new LakeTable(spark, TestSpark.tmpDir(name))
    val rows = (0 until 24).flatMap { c =>
      (0 until 4).map(t => (f"conv$c%02d", t, (c * 4 + t).toLong))
    }
    CdcApply.apply(lake, batch(rows), epoch = 1, nBuckets = 8, mor = mor)
    lake
  }

  private def keysOf(df: DataFrame): Set[(String, Int)] =
    df.select("conv_id", "turn_idx").collect()
      .map(r => (r.getString(0), r.getInt(1))).toSet

  test("DELETE: matched rows tombstoned, untouched buckets carried by path," +
      " epoch kept, time travel intact") {
    val lake = seed("dml-del")
    val pre = lake.currentSnapshot.get
    val preKeys = keysOf(lake.read())

    val st = GraftDml.sql(lake,
      "DELETE FROM lake WHERE conv_id = 'conv03' OR conv_id = 'conv07'")
    assert(!st.skipped && st.rowsIn == 8)
    assert(st.actions.getOrElse("deleted", 0L) == 8)

    val post = lake.currentSnapshot.get
    assert(post.epoch == pre.epoch, "DML must not consume source-epoch space")
    assert(keysOf(lake.read()) ==
      preKeys.filterNot(k => k._1 == "conv03" || k._1 == "conv07"))
    assert(lake.lookup("conv03").isEmpty)

    // copy-on-write physics: only the matched conversations' buckets rewrote
    val touched = Set("conv03", "conv07")
      .map(LakeTable.bucketOfValue(_, pre.nBuckets))
    val preRefs = pre.manifests.map(r => r.bucket -> r.path).toMap
    post.manifests.foreach { r =>
      if (touched.contains(r.bucket)) assert(r.path != preRefs(r.bucket))
      else assert(r.path == preRefs(r.bucket),
        s"untouched bucket ${r.bucket} must carry its manifest by path")
    }

    // time travel: the pre-DML snapshot still shows the rows
    assert(keysOf(lake.readAt(pre.snapshotId)) == preKeys)

    // the feed continues: next source epoch applies normally
    CdcApply.apply(lake, batch(Seq(("conv90", 0, 500L))), epoch = 2,
      nBuckets = 8)
    assert(keysOf(lake.read()).contains(("conv90", 0)))
  }

  test("DELETE tombstones fence a late re-delivery of older images") {
    val lake = seed("dml-del-fence")
    GraftDml.delete(lake, "conv_id = 'conv05'")
    // at-least-once: the original (pre-delete) images show up again in a
    // later batch at a higher epoch — their lsns are below the tombstones'
    val redeliver = batch((0 until 4).map(t => ("conv05", t, (5 * 4 + t).toLong)))
    CdcApply.apply(lake, redeliver, epoch = 2, nBuckets = 8)
    assert(lake.lookup("conv05").isEmpty,
      "a DML delete must not be undone by re-delivered older images")
  }

  test("UPDATE: full-image rewrite of matched winners; parser handles" +
      " commas and keywords inside literals") {
    val lake = seed("dml-upd")
    val expect = lake.read()
      .withColumn("role",
        when(col("turn_idx") >= 2, upper(col("role"))).otherwise(col("role")))
      .withColumn("text",
        when(col("turn_idx") >= 2, concat(col("text"), lit(", where x")))
          .otherwise(col("text")))
      .select("conv_id", "turn_idx", "role", "text")
      .collect().map(_.toString).toSet

    val st = GraftDml.sql(lake,
      "UPDATE lake SET role = upper(role), " +
      "text = concat(text, ', where x') WHERE turn_idx >= 2")
    assert(st.rowsIn == 24 * 2)
    assert(st.actions.getOrElse("updated", 0L) == 48)
    val got = lake.read().select("conv_id", "turn_idx", "role", "text")
      .collect().map(_.toString).toSet
    assert(got == expect)
  }

  test("UPDATE SET of a new column is additive schema evolution") {
    val lake = seed("dml-upd-new")
    GraftDml.sql(lake,
      "UPDATE lake SET flagged = 'pii' WHERE conv_id = 'conv01'")
    val df = lake.read()
    assert(df.columns.contains("flagged"))
    val byConv = df.select("conv_id", "flagged").collect()
      .map(r => r.getString(0) -> Option(r.getString(1))).toMap
    assert(byConv("conv01") == Some("pii"))
    assert(byConv("conv02").isEmpty, "unmatched rows must read null")
  }

  test("MoR table: DELETE/UPDATE append deltas; parent chain carried") {
    val lake = seed("dml-mor", mor = true)
    val pre = lake.currentSnapshot.get
    GraftDml.delete(lake, "conv_id = 'conv04'")
    GraftDml.update(lake, Seq("role" -> "'admin'"), "conv_id = 'conv06'")
    val post = lake.currentSnapshot.get
    // appends: every parent manifest is still referenced
    val postPaths = post.manifests.map(_.path).toSet
    assert(pre.manifests.forall(r => postPaths.contains(r.path)))
    assert(lake.lookup("conv04").isEmpty)
    assert(lake.lookup("conv06").select("role").collect()
      .forall(_.getString(0) == "admin"))
    assert(lake.read().count() == 23 * 4)
  }

  test("no-op DML: zero matched rows commits nothing") {
    val lake = seed("dml-noop")
    val pre = lake.currentSnapshot.get.snapshotId
    val st = GraftDml.delete(lake, "conv_id = 'no-such-conv'")
    assert(st.skipped && st.rowsIn == 0)
    assert(lake.currentSnapshot.get.snapshotId == pre)
  }

  test("refusals: key/internal SET, missing WHERE, unsupported statement") {
    val lake = seed("dml-refuse")
    intercept[IllegalArgumentException] {
      GraftDml.sql(lake, "UPDATE lake SET conv_id = 'x' WHERE true")
    }
    intercept[IllegalArgumentException] {
      GraftDml.sql(lake, "UPDATE lake SET _lsn = 0 WHERE true")
    }
    intercept[IllegalArgumentException] {
      GraftDml.sql(lake, "DELETE FROM lake")
    }
    intercept[IllegalArgumentException] {
      GraftDml.sql(lake, "INSERT INTO lake VALUES (1)")
    }
  }

  test("a concurrent source commit retries the DML — both effects land") {
    val lake = seed("dml-race")
    val dml = new Thread(() =>
      GraftDml.delete(lake, "conv_id = 'conv08'"))
    val src = new Thread(() =>
      CdcApply.apply(lake, batch(Seq(("conv09", 0, 900L), ("conv09", 1, 901L))),
        epoch = 2, nBuckets = 8))
    dml.start(); src.start(); dml.join(30000); src.join(30000)
    assert(lake.lookup("conv08").isEmpty, "the DML delete must land")
    assert(lake.lookup("conv09").filter(col("_lsn") >= 900).count() == 2,
      "the source batch must land")
  }
}
