package graft.cdc

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.TestSpark
import graft.changelog.ChangelogGen
import graft.lake.LakeTable

/** Partial-column patch events (op='P'): non-null columns overlay the
  * current image, nulls leave it untouched — the reference's map put-all /
  * field-level hash update (ActivityAggregatesFunction.scala:301-310,
  * UserMetadataUpdater.scala:86-105) as a merge mode. */
class CdcPatchSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark

  private def mkEvent(op: String, conv: String, turn: Int, role: String,
                      text: String, lsn: Long) = {
    import spark.implicits._
    Seq((op, conv, turn, role, text, null.asInstanceOf[String],
      if (op == "P") null else new java.sql.Timestamp(1700000000000L + lsn),
      lsn, 0, lsn))
      .toDF("op", "conv_id", "turn_idx", "role", "text", "tool", "ts",
        "_lsn", "_src_part", "_src_off")
  }

  test("hand-built patch scenarios: overlay, ignore-stale, resurrect") {
    val lake = new LakeTable(spark, TestSpark.tmpDir("patch-micro"))
    def applyB(df: org.apache.spark.sql.DataFrame, epoch: Long) =
      CdcApply.apply(lake, df, epoch, nBuckets = 4, patchEnabled = true)

    // full insert, then a text-only patch in a later batch
    applyB(mkEvent("I", "c1", 0, "user", "hello", 10), 1)
    applyB(mkEvent("P", "c1", 0, null, "patched", 20), 2)
    val r1 = lake.read().filter(col("conv_id") === "c1").head()
    assert(r1.getAs[String]("text") == "patched")
    assert(r1.getAs[String]("role") == "user") // untouched by the patch
    assert(r1.getAs[Long]("_lsn") == 20)

    // stale patch redelivery (lsn below the image) is a no-op
    applyB(mkEvent("P", "c1", 0, "assistant", "stale", 15), 3)
    val r2 = lake.read().filter(col("conv_id") === "c1").head()
    assert(r2.getAs[String]("text") == "patched" &&
      r2.getAs[String]("role") == "user" && r2.getAs[Long]("_lsn") == 20)

    // delete, then a newer patch resurrects with ONLY its own fields
    applyB(mkEvent("D", "c1", 0, "user", "gone", 30), 4)
    assert(lake.read().filter(col("conv_id") === "c1").isEmpty)
    applyB(mkEvent("P", "c1", 0, "system", null, 40), 5)
    val r3 = lake.read().filter(col("conv_id") === "c1").head()
    assert(r3.getAs[String]("role") == "system")
    assert(r3.getAs[String]("text") == null) // not inherited from pre-delete
    assert(r3.getAs[Long]("_lsn") == 40)

    // a patch on a never-seen key creates a partial row
    applyB(mkEvent("P", "c9", 3, null, "fresh", 50), 6)
    val r4 = lake.read().filter(col("conv_id") === "c9").head()
    assert(r4.getAs[String]("text") == "fresh" && r4.getAs[String]("role") == null)

    // patch older than a tombstone does NOT resurrect
    applyB(mkEvent("D", "c9", 3, null, null, 60), 7)
    applyB(mkEvent("P", "c9", 3, null, "zombie", 55), 8)
    assert(lake.read().filter(col("conv_id") === "c9").isEmpty)
  }

  private def mkUnset(conv: String, turn: Int, unset: Seq[String],
                      role: String, lsn: Long) = {
    import spark.implicits._
    Seq((("P"), conv, turn, role, null.asInstanceOf[String],
      null.asInstanceOf[String], null.asInstanceOf[java.sql.Timestamp],
      lsn, 0, lsn, unset))
      .toDF("op", "conv_id", "turn_idx", "role", "text", "tool", "ts",
        "_lsn", "_src_part", "_src_off", "unset_cols")
  }

  test("unset_cols clears fields: set -> unset -> LWW + tombstone interplay") {
    val lake = new LakeTable(spark, TestSpark.tmpDir("unset-micro"))
    def applyB(df: org.apache.spark.sql.DataFrame, epoch: Long) =
      CdcApply.apply(lake, df, epoch, nBuckets = 4, patchEnabled = true)

    // full image, then a patch that CLEARS text (null alone could not)
    applyB(mkEvent("I", "u1", 0, "user", "hello", 10), 1)
    applyB(mkUnset("u1", 0, Seq("text"), null, 20), 2)
    val r1 = lake.read().filter(col("conv_id") === "u1").head()
    assert(r1.getAs[String]("text") == null, "unset must clear the column")
    assert(r1.getAs[String]("role") == "user") // untouched survives
    assert(r1.getAs[Long]("_lsn") == 20)

    // a STALE unset (lsn below the image) is ignored like any stale patch
    applyB(mkEvent("U", "u1", 0, "assistant", "fresh", 30), 3)
    applyB(mkUnset("u1", 0, Seq("text"), null, 25), 4)
    val r2 = lake.read().filter(col("conv_id") === "u1").head()
    assert(r2.getAs[String]("text") == "fresh" && r2.getAs[Long]("_lsn") == 30)

    // unset+set in ONE patch: the unset wins for its column, the set lands
    applyB(mkUnset("u1", 0, Seq("role"), "system", 40), 5)
    val r3 = lake.read().filter(col("conv_id") === "u1").head()
    assert(r3.getAs[String]("role") == null, "unset beats set for same column")
    assert(r3.getAs[String]("text") == "fresh")

    // unset survives LWW against a redelivered older full image (no
    // resurrection of the cleared value)
    applyB(mkEvent("U", "u1", 0, "assistant", "fresh", 30), 6)
    val r4 = lake.read().filter(col("conv_id") === "u1").head()
    assert(r4.getAs[String]("role") == null && r4.getAs[Long]("_lsn") == 40)

    // tombstone then a NEWER unset-only patch: resurrect with all-null fields
    applyB(mkEvent("D", "u1", 0, null, null, 50), 7)
    applyB(mkUnset("u1", 0, Seq("text"), null, 60), 8)
    val r5 = lake.read().filter(col("conv_id") === "u1").head()
    assert(r5.getAs[String]("text") == null && r5.getAs[String]("role") == null)
    assert(r5.getAs[Long]("_lsn") == 60)
  }

  test("generated unset changelog matches the unset-aware fold oracle") {
    val dir = TestSpark.tmpDir("unset-cl")
    val cfg = ChangelogGen.Config(
      nEvents = 4000, nConvs = 30, turnsPerConv = 6,
      pUpdate = 0.25, pDelete = 0.08, pDup = 0.1, pPatch = 0.3,
      pUnset = 0.5, segSize = 500)
    ChangelogGen.write(spark, dir, cfg)
    val events = spark.read.parquet(dir)
    assert(events.filter(size(col("unset_cols")) > 0).count() > 0,
      "fixture must contain actual unsets")

    val lake = new LakeTable(spark, TestSpark.tmpDir("unset-lake"))
    new CdcDriver(spark, dir, lake, segmentsPerBatch = 2, nBuckets = 8,
      quiet = true, patchEnabled = true).run()
    assert(CdcOracle.tableState(lake.read()) ==
      CdcOracle.fold(events, patchEnabled = true))

    // kill/resume with unsets in flight
    val lake2 = new LakeTable(spark, TestSpark.tmpDir("unset-lake2"))
    new CdcDriver(spark, dir, lake2, 2, 8, quiet = true,
      patchEnabled = true).run(maxBatches = 2)
    new CdcDriver(spark, dir, lake2, 2, 8, quiet = true,
      patchEnabled = true).run()
    assert(CdcOracle.tableState(lake2.read()) ==
      CdcOracle.tableState(lake.read()))
  }

  test("generated patch changelog matches the patch-aware fold oracle") {
    val dir = TestSpark.tmpDir("patch-cl")
    val cfg = ChangelogGen.Config(
      nEvents = 4000, nConvs = 30, turnsPerConv = 6,
      pUpdate = 0.25, pDelete = 0.08, pDup = 0.1, pPatch = 0.25, segSize = 500)
    ChangelogGen.write(spark, dir, cfg)
    val events = spark.read.parquet(dir)
    assert(events.filter(col("op") === "P").count() > 0)

    val lake = new LakeTable(spark, TestSpark.tmpDir("patch-lake"))
    new CdcDriver(spark, dir, lake, segmentsPerBatch = 2, nBuckets = 8,
      quiet = true, patchEnabled = true).run()
    assert(CdcOracle.tableState(lake.read()) ==
      CdcOracle.fold(events, patchEnabled = true))

    // kill/resume convergence with patches in flight
    val lake2 = new LakeTable(spark, TestSpark.tmpDir("patch-lake2"))
    new CdcDriver(spark, dir, lake2, 2, 8, quiet = true,
      patchEnabled = true).run(maxBatches = 2)
    new CdcDriver(spark, dir, lake2, 2, 8, quiet = true,
      patchEnabled = true).run()
    assert(CdcOracle.tableState(lake2.read()) ==
      CdcOracle.tableState(lake.read()))
  }

  private def mkMapEvent(op: String, conv: String, turn: Int,
                         attrs: Map[String, Long], lsn: Long,
                         unset: Seq[String] = null) = {
    import spark.implicits._
    Seq((op, conv, turn, attrs, lsn, 0, lsn, Option(unset)))
      .toDF("op", "conv_id", "turn_idx", "attrs",
        "_lsn", "_src_part", "_src_off", "unset_cols")
      .withColumn("unset_cols", col("unset_cols"))
  }

  test("map put-all: additive patches merge entries; replace mode replaces") {
    def attrsOf(lake: LakeTable, conv: String): Map[String, Long] = {
      val r = lake.read().filter(col("conv_id") === conv).head()
      Option(r.getAs[Map[String, Long]]("attrs")).getOrElse(Map.empty)
    }
    // CONTROL: without the contract a patch replaces the whole column
    val plain = new LakeTable(spark, TestSpark.tmpDir("map-replace"))
    CdcApply.apply(plain, mkMapEvent("I", "m1", 0, Map("a" -> 1L, "b" -> 2L), 10),
      1, nBuckets = 4, patchEnabled = true)
    CdcApply.apply(plain, mkMapEvent("P", "m1", 0, Map("b" -> 20L, "c" -> 3L), 20),
      2, nBuckets = 4, patchEnabled = true)
    assert(attrsOf(plain, "m1") == Map("b" -> 20L, "c" -> 3L),
      "replace mode: the patch map replaces the stored map wholesale")

    // PUT-ALL: the contract makes the same feed merge entries
    val lake = new LakeTable(spark, TestSpark.tmpDir("map-putall"))
    lake.setMapPutAll("attrs")
    def applyB(df: org.apache.spark.sql.DataFrame, epoch: Long) =
      CdcApply.apply(lake, df, epoch, nBuckets = 4, patchEnabled = true)
    applyB(mkMapEvent("I", "m1", 0, Map("a" -> 1L, "b" -> 2L), 10), 1)
    applyB(mkMapEvent("P", "m1", 0, Map("b" -> 20L, "c" -> 3L), 20), 2)
    assert(attrsOf(lake, "m1") == Map("a" -> 1L, "b" -> 20L, "c" -> 3L),
      "put-all: patch entries merge in, patch wins collisions")

    // two patches in ONE batch fold in lsn order — the early patch's
    // untouched entries survive the later partial patch
    applyB(mkMapEvent("P", "m1", 0, Map("d" -> 4L), 30)
      .unionByName(mkMapEvent("P", "m1", 0, Map("b" -> 200L), 40)), 3)
    assert(attrsOf(lake, "m1") ==
      Map("a" -> 1L, "b" -> 200L, "c" -> 3L, "d" -> 4L))

    // stale patch (lsn below the image) is ignored
    applyB(mkMapEvent("P", "m1", 0, Map("z" -> 99L), 15), 4)
    assert(attrsOf(lake, "m1") ==
      Map("a" -> 1L, "b" -> 200L, "c" -> 3L, "d" -> 4L))

    // explicit unset clears the whole map; a later patch rebuilds from empty
    applyB(mkMapEvent("P", "m1", 0, null, 50, unset = Seq("attrs")), 5)
    assert(attrsOf(lake, "m1") == Map.empty, "unset clears the map")
    applyB(mkMapEvent("P", "m1", 0, Map("e" -> 5L), 60), 6)
    assert(attrsOf(lake, "m1") == Map("e" -> 5L))

    // a NEWER full image replaces wholesale (put-all is patch-only)
    applyB(mkMapEvent("U", "m1", 0, Map("f" -> 6L), 70), 7)
    assert(attrsOf(lake, "m1") == Map("f" -> 6L))

    // tombstone, then a newer patch resurrects with ONLY its own entries
    applyB(mkMapEvent("D", "m1", 0, null, 80), 8)
    assert(lake.read().filter(col("conv_id") === "m1").isEmpty)
    applyB(mkMapEvent("P", "m1", 0, Map("g" -> 7L), 90), 9)
    assert(attrsOf(lake, "m1") == Map("g" -> 7L),
      "resurrection carries only the patch's entries")

    // unset + newer patch in the SAME batch: fold order holds (clear, then set)
    applyB(mkMapEvent("P", "m1", 0, null, 100, unset = Seq("attrs"))
      .unionByName(mkMapEvent("P", "m1", 0, Map("h" -> 8L), 110)), 10)
    assert(attrsOf(lake, "m1") == Map("h" -> 8L))
    // ...and a clear NEWER than a set in the same batch ends empty
    applyB(mkMapEvent("P", "m1", 0, Map("i" -> 9L), 120)
      .unionByName(mkMapEvent("P", "m1", 0, null, 130, unset = Seq("attrs"))), 11)
    assert(attrsOf(lake, "m1") == Map.empty)
  }

  test("map put-all contract refuses non-map columns at merge time") {
    val lake = new LakeTable(spark, TestSpark.tmpDir("map-notmap"))
    lake.setMapPutAll("role") // declared before the schema exists: allowed
    val e = intercept[IllegalArgumentException] {
      CdcApply.apply(lake, mkEvent("I", "c1", 0, "user", "hello", 10),
        1, nBuckets = 4, patchEnabled = true)
    }
    assert(e.getMessage.contains("requires a map column"))
    assert(lake.dropMapPutAll("role"))
  }

  test("patch events are quarantined when patch support is disabled") {
    val dir = TestSpark.tmpDir("patch-off-cl")
    ChangelogGen.write(spark, dir, ChangelogGen.Config(
      nEvents = 1500, nConvs = 15, turnsPerConv = 4,
      pUpdate = 0.2, pDelete = 0.05, pPatch = 0.2, segSize = 500))
    val events = spark.read.parquet(dir)
    val nPatch = events.filter(col("op") === "P").count()
    assert(nPatch > 0)
    val lake = new LakeTable(spark, TestSpark.tmpDir("patch-off-lake"))
    val stats = new CdcDriver(spark, dir, lake, 2, 8, quiet = true).run()
    assert(stats.map(_.failedEvents).sum == nPatch)
    assert(CdcOracle.tableState(lake.read()) ==
      CdcOracle.fold(events, patchEnabled = false))
    val quar = spark.read.parquet(s"${lake.root}/quarantine")
    assert(quar.filter(col("_reason") === "bad_op").count() == nPatch)
  }

  test("patch changelog with evolution column mid-stream stays correct") {
    val dir = TestSpark.tmpDir("patch-ev-cl")
    val cfg = ChangelogGen.Config(
      nEvents = 2000, nConvs = 20, turnsPerConv = 5,
      pUpdate = 0.25, pDelete = 0.05, pDup = 0.05, pPatch = 0.2,
      segSize = 400, evolveAt = 1200)
    ChangelogGen.write(spark, dir, cfg)
    val lake = new LakeTable(spark, TestSpark.tmpDir("patch-ev-lake"))
    new CdcDriver(spark, dir, lake, 1, 8, quiet = true,
      patchEnabled = true).run()
    val events = spark.read.option("mergeSchema", "true").parquet(dir)
    assert(CdcOracle.tableState(lake.read()) ==
      CdcOracle.fold(events, patchEnabled = true))
    assert(lake.currentSnapshot.get.schemaVersion == 2)
  }
}
