package graft.lake

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.TestSpark
import graft.cdc.CdcApply

/** Deep clone: byte-identical independent copy at a snapshot — state
  * equality (CoW and MoR chains), feed-resume parity (epoch carried),
  * constraint inheritance, and true independence (source expiry/GC and
  * divergent writes cannot touch the clone). */
class CloneSpec extends AnyFunSuite {
  lazy val spark: SparkSession = TestSpark.spark

  private def batch(rows: Seq[(String, Int, Long)]): DataFrame = {
    import spark.implicits._
    rows.toDF("conv_id", "turn_idx", "_lsn")
      .withColumn("op", when(col("_lsn") % 7 === 0, "D").otherwise("U"))
      .withColumn("text", concat(lit("t-"), col("_lsn")))
      .withColumn("_src_part", lit(0))
      .withColumn("_src_off", col("_lsn"))
  }

  private def rowsOf(lake: LakeTable): Set[String] =
    lake.read().select("conv_id", "turn_idx", "text", "_lsn")
      .collect().map(_.toString).toSet

  private def feed(n: Int) = (0 until n).map(i =>
    (f"conv${i % 20}%02d", i % 5, i.toLong))

  test("clone equals the source at the chosen snapshot — CoW and MoR") {
    for (mor <- Seq(false, true)) {
      val src = new LakeTable(spark, TestSpark.tmpDir(s"cl-src-$mor"))
      CdcApply.apply(src, batch(feed(200)), epoch = 1, nBuckets = 8, mor = mor)
      CdcApply.apply(src, batch((200 until 300).map(i =>
        (f"conv${i % 20}%02d", i % 5, i.toLong))), epoch = 2, nBuckets = 8,
        mor = mor)
      val taggedId = src.tag("mid") // current head (epoch 2)
      CdcApply.apply(src, batch((300 until 350).map(i =>
        (f"conv${i % 20}%02d", i % 5, i.toLong))), epoch = 3, nBuckets = 8,
        mor = mor)

      // clone at head
      val head = new LakeTable(spark, TestSpark.tmpDir(s"cl-head-$mor"))
      val hs = Clone.deepClone(src, head.root)
      assert(rowsOf(head) == rowsOf(src))
      assert(hs.epoch == 3 && hs.mor == mor)
      // clone at the tagged (historical) snapshot
      val mid = new LakeTable(spark, TestSpark.tmpDir(s"cl-mid-$mor"))
      Clone.deepClone(src, mid.root, taggedId)
      val expectMid = src.readAt(taggedId)
        .select("conv_id", "turn_idx", "text", "_lsn")
        .collect().map(_.toString).toSet
      assert(rowsOf(mid) == expectMid)
    }
  }

  test("clone is a valid resume point for the same feed (epoch carried)") {
    val src = new LakeTable(spark, TestSpark.tmpDir("cl-resume-src"))
    CdcApply.apply(src, batch(feed(200)), epoch = 1, nBuckets = 8)
    val dst = new LakeTable(spark, TestSpark.tmpDir("cl-resume-dst"))
    Clone.deepClone(src, dst.root)
    // replaying batch 1 against the clone is FENCED (epoch carried) ...
    val fenced = CdcApply.apply(dst, batch(feed(200)), epoch = 1, nBuckets = 8)
    assert(fenced.skipped)
    // ... and the feed continues identically on both
    CdcApply.apply(src, batch((200 until 260).map(i => ("convXX", i % 5, i.toLong))),
      epoch = 2, nBuckets = 8)
    CdcApply.apply(dst, batch((200 until 260).map(i => ("convXX", i % 5, i.toLong))),
      epoch = 2, nBuckets = 8)
    assert(rowsOf(dst) == rowsOf(src))
  }

  test("independence: source expiry/GC and divergent writes don't touch the clone") {
    val src = new LakeTable(spark, TestSpark.tmpDir("cl-ind-src"))
    CdcApply.apply(src, batch(feed(200)), epoch = 1, nBuckets = 8)
    val preState = rowsOf(src)
    val dst = new LakeTable(spark, TestSpark.tmpDir("cl-ind-dst"))
    Clone.deepClone(src, dst.root)

    // source moves on and reclaims aggressively
    CdcApply.apply(src, batch((200 until 400).map(i =>
      (f"conv${i % 20}%02d", i % 5, i.toLong))), epoch = 2, nBuckets = 8)
    src.expireSnapshots(1)
    src.gcOrphans(0L)
    assert(rowsOf(dst) == preState, "clone must survive source reclaim")

    // clone diverges without touching the source
    graft.sql.GraftDml.delete(dst, "turn_idx = 0")
    assert(rowsOf(dst) != preState)
    assert(rowsOf(src).exists(_.contains("conv03")), "source unchanged")
  }

  test("constraints travel; tags don't; non-empty destination refused") {
    val src = new LakeTable(spark, TestSpark.tmpDir("cl-meta-src"))
    CdcApply.apply(src, batch(feed(100)), epoch = 1, nBuckets = 8)
    src.addCheck("turn_ok", "turn_idx < 100")
    src.tag("keepme")
    val dst = new LakeTable(spark, TestSpark.tmpDir("cl-meta-dst"))
    Clone.deepClone(src, dst.root)
    assert(dst.checks == Map("turn_ok" -> "turn_idx < 100"))
    assert(dst.tags.isEmpty)
    intercept[IllegalArgumentException] {
      Clone.deepClone(src, dst.root)
    }
  }
}
