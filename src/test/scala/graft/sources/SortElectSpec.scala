package graft.sources

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.TestSpark
import graft.cdc.CdcApply
import graft.lake.LakeTable

/** Spillable MoR election: a bucket chain past
  * `spark.graft.mor.electHashMaxRows` elects its LWW winners through
  * Spark's external row sorter (disk-spilling under memory pressure)
  * instead of the O(live keys) executor-heap hash map. The spec seeds a
  * deliberately SKEWED table — one conversation holds ~10x the turns of
  * the rest, re-updated across several delta batches with deletes mixed
  * in — and pins result equality between the two election strategies and
  * the engine's own read path. */
class SortElectSpec extends AnyFunSuite {
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
      .withColumn("_src_part", lit(0))
      .withColumn("_src_off", col("_lsn"))
  }

  private def seed(name: String): (LakeTable, String) = {
    val dir = TestSpark.tmpDir(name)
    val lake = new LakeTable(spark, dir)
    // hot conversation: 400 turns; 15 cold ones: 40 each. Three delta
    // waves re-update every turn (chains of length 3 per bucket), with
    // the hot conv's low turns deleted in the last wave.
    def wave(n: Int): Seq[(String, Int, Long, String)] = {
      val base = n * 10000L
      (0 until 400).map(t => ("convHOT", t, base + t,
        if (n == 3 && t < 50) "D" else "U")) ++
      (1 to 15).flatMap(c => (0 until 40).map(t =>
        (f"conv$c%02d", t, base + 1000 + c * 40 + t, "U")))
    }
    (1 to 3).foreach(n =>
      CdcApply.apply(lake, batch(wave(n)), epoch = n, nBuckets = 4,
        mor = true))
    (lake, dir)
  }

  test("sort election equals hash election and the engine read, with skew") {
    val (lake, dir) = seed("sortelect")
    val sql = s"SELECT conv_id, turn_idx, text FROM graft.`$dir`"

    spark.conf.set("spark.graft.mor.electHashMaxRows", "100000000")
    val viaHash = spark.sql(sql).collect().map(_.toString).sorted.toSeq

    spark.conf.set("spark.graft.mor.electHashMaxRows", "0")
    try {
      val viaSort = spark.sql(sql).collect().map(_.toString).sorted.toSeq
      assert(viaSort == viaHash, "sort and hash elections diverge")
      val want = lake.read().select("conv_id", "turn_idx", "text")
        .collect().map(_.toString).sorted.toSeq
      assert(viaSort == want, "sort election diverges from the engine read")
      // the winners are the wave-3 images, minus the deleted low turns
      assert(!viaSort.exists(_.startsWith("[convHOT,0,")),
        "a deleted turn survived the sort election")
      assert(viaSort.exists(_ == "[convHOT,399,t-30399]"),
        "wave-3 winner image missing")
      assert(viaSort.count(_.startsWith("[convHOT,")) == 350)
    } finally spark.conf.set("spark.graft.mor.electHashMaxRows", "4000000")
  }

  test("point-lookup shapes stay exact under the sort path") {
    val (lake, dir) = seed("sortelect-pt")
    spark.conf.set("spark.graft.mor.electHashMaxRows", "0")
    try {
      val got = spark.sql(
        s"SELECT turn_idx, text FROM graft.`$dir` WHERE conv_id = 'conv07'")
        .collect().map(_.toString).sorted.toSeq
      val want = lake.lookup("conv07").select("turn_idx", "text")
        .collect().map(_.toString).sorted.toSeq
      assert(got == want && got.size == 40)
    } finally spark.conf.set("spark.graft.mor.electHashMaxRows", "4000000")
  }
}
