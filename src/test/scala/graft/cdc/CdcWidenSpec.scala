package graft.cdc

import org.apache.spark.sql.Row
import org.apache.spark.sql.types._
import org.scalatest.funsuite.AnyFunSuite

import graft.TestSpark
import graft.changelog.ChangelogGen
import graft.lake.LakeTable

/** Widening schema evolution (Schemas.widen): a stored numeric column may
  * grow to a lossless wider type mid-stream — int→long, float→double —
  * with old narrow files upcast at read; anything lossy or incompatible
  * fails loudly instead of coercing. */
class CdcWidenSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark

  private def batch(rows: Seq[Row], scoreType: DataType) = {
    val schema = StructType(Seq(
      StructField("op", StringType), StructField("conv_id", StringType),
      StructField("turn_idx", IntegerType), StructField("score", scoreType),
      StructField("_lsn", LongType), StructField("_src_part", IntegerType),
      StructField("_src_off", LongType)))
    spark.createDataFrame(spark.sparkContext.parallelize(rows, 2), schema)
  }

  test("int column widens to long; old narrow files upcast at read") {
    val lake = new LakeTable(spark, TestSpark.tmpDir("widen-il"))
    CdcApply.apply(lake, batch(Seq(
      Row("I", "c1", 0, 7, 1L, 0, 1L),
      Row("I", "c2", 0, 8, 2L, 0, 2L)), IntegerType), epoch = 1, nBuckets = 4)
    val v1 = lake.currentSnapshot.get
    assert(v1.schema("score").dataType == IntegerType)
    // the counter outgrows int32 mid-stream
    CdcApply.apply(lake, batch(Seq(
      Row("U", "c2", 0, 5000000000L, 3L, 0, 3L),
      Row("I", "c3", 0, 6000000000L, 4L, 0, 4L)), LongType),
      epoch = 2, nBuckets = 4)
    val v2 = lake.currentSnapshot.get
    assert(v2.schema("score").dataType == LongType)
    assert(v2.schemaVersion == v1.schemaVersion + 1,
      "type widening must bump the schema version")
    val got = lake.read().collect()
      .map(r => r.getAs[String]("conv_id") -> r.getAs[Long]("score")).toMap
    // c1's row still lives in a v1 (int32) file — upcast at read
    assert(got == Map("c1" -> 7L, "c2" -> 5000000000L, "c3" -> 6000000000L))
    // time travel to the pre-widening snapshot keeps the narrow schema
    assert(lake.readAt(v1.snapshotId).schema("score").dataType == IntegerType)
  }

  test("float widens to double; narrow later batches upcast into the table") {
    val lake = new LakeTable(spark, TestSpark.tmpDir("widen-fd"))
    CdcApply.apply(lake, batch(Seq(Row("I", "c1", 0, 1.5f, 1L, 0, 1L)),
      FloatType), epoch = 1, nBuckets = 4)
    CdcApply.apply(lake, batch(Seq(Row("U", "c1", 0, 2.25, 2L, 0, 2L)),
      DoubleType), epoch = 2, nBuckets = 4)
    assert(lake.currentSnapshot.get.schema("score").dataType == DoubleType)
    // a NARROW batch arriving after the widening upcasts losslessly and
    // does NOT bump the version again
    val v = lake.currentSnapshot.get.schemaVersion
    CdcApply.apply(lake, batch(Seq(Row("I", "c2", 0, 3.5f, 3L, 0, 3L)),
      FloatType), epoch = 3, nBuckets = 4)
    assert(lake.currentSnapshot.get.schemaVersion == v)
    val got = lake.read().collect()
      .map(r => r.getAs[String]("conv_id") -> r.getAs[Double]("score")).toMap
    assert(got == Map("c1" -> 2.25, "c2" -> 3.5))
  }

  private def nbatch(rows: Seq[Row], extraCols: Seq[StructField]) = {
    val schema = StructType(Seq(
      StructField("op", StringType), StructField("conv_id", StringType),
      StructField("turn_idx", IntegerType)) ++ extraCols ++ Seq(
      StructField("_lsn", LongType), StructField("_src_part", IntegerType),
      StructField("_src_off", LongType)))
    spark.createDataFrame(spark.sparkContext.parallelize(rows, 2), schema)
  }

  test("nested evolution: struct gains a field, nested int widens to long;" +
      " old files read back null-filled and upcast") {
    val lake = new LakeTable(spark, TestSpark.tmpDir("widen-nest"))
    val m1 = StructType(Seq(
      StructField("src", StringType), StructField("n", IntegerType)))
    CdcApply.apply(lake, nbatch(Seq(
      Row("I", "c1", 0, Row("a", 7), 1L, 0, 1L),
      Row("I", "c2", 0, Row("b", 8), 2L, 0, 2L)),
      Seq(StructField("meta", m1))), epoch = 1, nBuckets = 4)
    // the UDT-shaped feed evolves: a new nested field + n outgrows int32
    val m2 = StructType(Seq(
      StructField("src", StringType), StructField("n", LongType),
      StructField("extra", StringType)))
    CdcApply.apply(lake, nbatch(Seq(
      Row("U", "c2", 0, Row("b2", 5000000000L, "x"), 3L, 0, 3L),
      Row("I", "c3", 0, null, 4L, 0, 4L)),
      Seq(StructField("meta", m2))), epoch = 2, nBuckets = 4)
    val v2 = lake.currentSnapshot.get
    assert(graft.model.Schemas.sameIgnoringNull(
      v2.schema("meta").dataType, m2),
      s"expected widened struct $m2, got ${v2.schema("meta").dataType}")
    val got = lake.read().collect()
      .map(r => r.getAs[String]("conv_id") -> r.getAs[Row]("meta")).toMap
    assert(got("c1") == Row("a", 7L, null),
      "old narrow file: nested int upcast, new field null")
    assert(got("c2") == Row("b2", 5000000000L, "x"))
    assert(got("c3") == null, "a null struct stays null, not Row(null,..)")
    // a LATER batch still on the narrow shape upcasts into the table
    CdcApply.apply(lake, nbatch(Seq(Row("U", "c1", 0, Row("a2", 9), 5L, 0, 5L)),
      Seq(StructField("meta", m1))), epoch = 3, nBuckets = 4)
    val c1 = lake.read().filter(org.apache.spark.sql.functions.col("conv_id")
      === "c1").head().getAs[Row]("meta")
    assert(c1 == Row("a2", 9L, null))
  }

  test("nested evolution: array-of-struct elements and map values widen") {
    val lake = new LakeTable(spark, TestSpark.tmpDir("widen-nest-am"))
    val h1 = ArrayType(StructType(Seq(StructField("d", IntegerType))))
    val t1 = MapType(StringType, IntegerType)
    CdcApply.apply(lake, nbatch(Seq(
      Row("I", "c1", 0, Seq(Row(3), Row(4)), Map("a" -> 1), 1L, 0, 1L)),
      Seq(StructField("hops", h1), StructField("tags", t1))),
      epoch = 1, nBuckets = 4)
    val h2 = ArrayType(StructType(Seq(
      StructField("d", LongType), StructField("w", StringType))))
    val t2 = MapType(StringType, LongType)
    CdcApply.apply(lake, nbatch(Seq(
      Row("I", "c2", 0, Seq(Row(9000000000L, "y")), Map("b" -> 5000000000L),
        2L, 0, 2L)),
      Seq(StructField("hops", h2), StructField("tags", t2))),
      epoch = 2, nBuckets = 4)
    val s = lake.currentSnapshot.get
    assert(graft.model.Schemas.sameIgnoringNull(s.schema("hops").dataType, h2))
    assert(graft.model.Schemas.sameIgnoringNull(s.schema("tags").dataType, t2))
    val got = lake.read().collect().map(r =>
      r.getAs[String]("conv_id") ->
        ((r.getAs[Seq[Row]]("hops"), r.getAs[Map[String, Long]]("tags")))).toMap
    assert(got("c1") == ((Seq(Row(3L, null), Row(4L, null)), Map("a" -> 1L))))
    assert(got("c2") == ((Seq(Row(9000000000L, "y")), Map("b" -> 5000000000L))))
  }

  test("incompatible nested change fails loudly; map keys never widen") {
    val lake = new LakeTable(spark, TestSpark.tmpDir("widen-nest-bad"))
    val m1 = StructType(Seq(StructField("n", IntegerType)))
    CdcApply.apply(lake, nbatch(Seq(Row("I", "c1", 0, Row(1), 1L, 0, 1L)),
      Seq(StructField("meta", m1))), epoch = 1, nBuckets = 4)
    val mBad = StructType(Seq(StructField("n", StringType)))
    val e = intercept[IllegalArgumentException] {
      CdcApply.apply(lake, nbatch(Seq(Row("U", "c1", 0, Row("s"), 2L, 0, 2L)),
        Seq(StructField("meta", mBad))), epoch = 2, nBuckets = 4)
    }
    assert(e.getMessage.contains("meta"))
    // a map whose KEY type changes is a re-keying, never a widening
    val lake2 = new LakeTable(spark, TestSpark.tmpDir("widen-nest-mk"))
    CdcApply.apply(lake2, nbatch(Seq(Row("I", "c1", 0, Map(1 -> 1L), 1L, 0, 1L)),
      Seq(StructField("tags", MapType(IntegerType, LongType)))),
      epoch = 1, nBuckets = 4)
    intercept[IllegalArgumentException] {
      CdcApply.apply(lake2, nbatch(Seq(Row("U", "c1", 0, Map(2L -> 1L), 2L, 0, 2L)),
        Seq(StructField("tags", MapType(LongType, LongType)))),
        epoch = 2, nBuckets = 4)
    }
  }

  test("incompatible and lossy type changes fail loudly") {
    val lake = new LakeTable(spark, TestSpark.tmpDir("widen-bad"))
    CdcApply.apply(lake, batch(Seq(Row("I", "c1", 0, 9000000000L, 1L, 0, 1L)),
      LongType), epoch = 1, nBuckets = 4)
    // long -> double would silently lose integer precision above 2^53
    val e1 = intercept[IllegalArgumentException] {
      CdcApply.apply(lake, batch(Seq(Row("U", "c1", 0, 1.0, 2L, 0, 2L)),
        DoubleType), epoch = 2, nBuckets = 4)
    }
    assert(e1.getMessage.contains("not a lossless widening"))
    // string vs long is a feed-contract break
    val e2 = intercept[IllegalArgumentException] {
      CdcApply.apply(lake, batch(Seq(Row("U", "c1", 0, "oops", 2L, 0, 2L)),
        StringType), epoch = 2, nBuckets = 4)
    }
    assert(e2.getMessage.contains("incompatible type change"))
  }

  test("driver replay with mid-stream widening: CoW and MoR agree") {
    val dir = TestSpark.tmpDir("widen-cl")
    // enough keys (200 x 10) that some LWW winners predate the widening cut
    // — those rows live in int32 files and must upcast at read
    ChangelogGen.write(spark, dir, ChangelogGen.Config(
      nEvents = 4000, nConvs = 200, turnsPerConv = 10,
      pUpdate = 0.4, pDelete = 0.05, pDup = 0.05, segSize = 500,
      evolveAt = 3000, widenAt = 2000))
    def replay(name: String, morMode: Boolean) = {
      val lake = new LakeTable(spark, TestSpark.tmpDir(name))
      new CdcDriver(spark, dir, lake, segmentsPerBatch = 1, nBuckets = 8,
        quiet = true, mor = morMode).run()
      lake
    }
    val cow = replay("widen-cow", morMode = false)
    val mor = replay("widen-mor", morMode = true)
    for (lake <- Seq(cow, mor)) {
      val s = lake.currentSnapshot.get
      assert(s.schema("latency_ms").dataType == LongType,
        s"${lake.root}: latency_ms not widened")
      assert(s.schema.fieldNames.contains("tool_meta")) // additive still works
    }
    def state(l: LakeTable) = l.read().collect().map { r =>
      (r.getAs[String]("conv_id"), r.getAs[Int]("turn_idx")) ->
        (r.getAs[Long]("_lsn"), r.getAs[Long]("latency_ms"))
    }.toMap
    val cs = state(cow)
    assert(cs == state(mor), "CoW and MoR disagree after widening")
    // post-cut winners really exceed int32 (the widening was load-bearing)
    assert(cs.values.exists(_._2 > Int.MaxValue.toLong))
    // pre-cut winners kept their original int-range values
    assert(cs.values.exists(v => v._2 <= Int.MaxValue.toLong && v._2 >= 0))
  }
}
