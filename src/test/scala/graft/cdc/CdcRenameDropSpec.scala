package graft.cdc

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.TestSpark
import graft.changelog.ChangelogGen
import graft.lake.LakeTable
import graft.model.Schemas

/** Rename/drop schema evolution on stable field ids (Iceberg column
  * identity, carried on parquet's field-id metadata): RENAME is a
  * metadata-only commit whose new schema resolves OLD data files by id, so
  * the column's history appears under the new name with zero rewrite; DROP
  * removes the field from the current schema only, and a later re-use of
  * the name is a NEW column (fresh id) whose old values never resurrect.
  * Completes the evolution story next to additive (round 1) and widening
  * (round 3) — the reference's entity schemas drifted exactly this way
  * across its job generations (user-cache-updater 1.0 -> 2.0 field set,
  * user-org-jobs/user-cache-updater-2.0/.../UserMetadataUpdater.scala:86-105). */
class CdcRenameDropSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark

  private def build(mor: Boolean = false): LakeTable = {
    val dir = TestSpark.tmpDir("ren-cl")
    ChangelogGen.write(spark, dir, ChangelogGen.Config(
      nEvents = 2000, nConvs = 40, turnsPerConv = 4,
      pUpdate = 0.3, pDelete = 0.05, pDup = 0.05, segSize = 500))
    val lake = new LakeTable(spark, TestSpark.tmpDir("ren-lake"))
    new CdcDriver(spark, dir, lake, segmentsPerBatch = 2, nBuckets = 8,
      quiet = true, mor = mor).run()
    lake
  }

  private def batchRow(conv: String, lsn: Long, cols: Map[String, String]) = {
    val base = spark.range(1).select(
      lit("U").as("op"), lit(conv).as("conv_id"), lit(0).as("turn_idx"),
      lit("user").as("role"), lit("renamed text").as("text"),
      lit("2024-01-01").cast("timestamp").as("ts"),
      lit(lsn).as("_lsn"), lit(0).as("_src_part"), lit(lsn).as("_src_off"))
    cols.foldLeft(base) { case (df, (c, v)) => df.withColumn(c, lit(v)) }
  }

  test("rename is metadata-only and resolves old files by field id") {
    val lake = build()
    val before = lake.currentSnapshot.get
    assert(Schemas.hasFieldIds(before.schema), "fresh tables carry field ids")
    val want = lake.read().select("conv_id", "turn_idx", "tool")
      .collect().map(_.toSeq).toSet
    assert(want.exists(_(2) != null), "need non-null tool values")

    val after = lake.renameColumn("tool", "tool_name")
    // zero data rewritten: same manifests, same files
    assert(after.manifests == before.manifests)
    assert(after.schemaVersion == before.schemaVersion + 1)
    // same field id under the new name
    val idBefore = Schemas.fieldId(before.schema("tool")).get
    assert(Schemas.fieldId(lake.currentSnapshot.get.schema("tool_name"))
      .contains(idBefore))

    val got = lake.read().select("conv_id", "turn_idx", "tool_name")
      .collect().map(_.toSeq).toSet
    assert(got == want, "old files' values must appear under the new name")
    // time travel still shows the historic name
    assert(lake.readAt(before.snapshotId).columns.contains("tool"))
    assert(!lake.read().columns.contains("tool"))
  }

  test("post-rename batches merge under the new name; old name re-adds") {
    val lake = build()
    lake.renameColumn("tool", "tool_name")
    val conv = lake.read().select("conv_id").head().getString(0)
    val e1 = lake.currentSnapshot.get.epoch

    CdcApply.apply(lake, batchRow(conv, 50000000L,
      Map("tool_name" -> "bash")), e1 + 1, nBuckets = 8)
    val row = lake.read().filter(col("conv_id") === conv &&
      col("turn_idx") === 0).head()
    assert(row.getAs[String]("tool_name") == "bash")

    // a feed still emitting the OLD name re-creates it as a NEW column
    // (additive evolution; documented consequence — coordinate feeds)
    CdcApply.apply(lake, batchRow(conv, 60000000L,
      Map("tool" -> "python")), e1 + 2, nBuckets = 8)
    val sch = lake.currentSnapshot.get.schema
    assert(sch.fieldNames.contains("tool") &&
      sch.fieldNames.contains("tool_name"))
    assert(Schemas.fieldId(sch("tool")).get >
      Schemas.fieldId(sch("tool_name")).get, "re-added name gets a fresh id")
    val others = lake.read().filter(col("conv_id") =!= conv)
    assert(others.filter(col("tool").isNotNull).count() == 0,
      "old rows must not leak values into the re-added column")
  }

  test("drop removes the column; a re-added name never resurrects values") {
    val lake = build()
    val before = lake.currentSnapshot.get
    val hadTools = lake.read().filter(col("tool").isNotNull).count()
    assert(hadTools > 0)

    val dropped = lake.dropColumn("tool")
    assert(dropped.manifests == before.manifests, "drop is metadata-only")
    assert(!lake.read().columns.contains("tool"))
    // history intact under time travel
    assert(lake.readAt(before.snapshotId)
      .filter(col("tool").isNotNull).count() == hadTools)

    // re-add via a batch: fresh id, old values stay dead
    val conv = lake.read().select("conv_id").head().getString(0)
    CdcApply.apply(lake, batchRow(conv, 70000000L,
      Map("tool" -> "grep")), before.epoch + 1, nBuckets = 8)
    val live = lake.read().filter(col("tool").isNotNull).collect()
    assert(live.length == 1 && live.head.getAs[String]("conv_id") == conv,
      s"only the new write may have a tool value, got ${live.length}")
  }

  test("rename on a merge-on-read table resolves chains correctly") {
    val lake = build(mor = true)
    val want = lake.read().select("conv_id", "turn_idx", "tool")
      .collect().map(_.toSeq).toSet
    lake.renameColumn("tool", "tool_v2")
    val got = lake.read().select("conv_id", "turn_idx", "tool_v2")
      .collect().map(_.toSeq).toSet
    assert(got == want)
  }

  test("compaction and point lookup survive a rename") {
    val lake = build()
    lake.renameColumn("tool", "tool_name")
    val want = lake.read().collect().map(_.toSeq).toSet
    graft.lake.Compaction.compact(lake, targetFileRows = 200L)
    assert(lake.read().collect().map(_.toSeq).toSet == want)
    val conv = lake.read().select("conv_id").head().getString(0)
    val viaLookup = lake.lookup(conv).collect().map(_.toSeq).toSet
    val viaScan = lake.read().filter(col("conv_id") === conv)
      .collect().map(_.toSeq).toSet
    assert(viaLookup == viaScan && viaLookup.nonEmpty)
  }

  test("a dropped column's field id is never recycled") {
    val lake = build()
    val n = lake.currentSnapshot.get.nBuckets
    val convs = lake.read().select("conv_id").distinct()
      .collect().map(_.getString(0))
    // conv1 and conv2 in DIFFERENT buckets, so conv1's bucket file (which
    // physically stores the dropped column's bytes under its id) stays
    // live after conv2's batch rewrites only conv2's bucket
    val conv1 = convs.head
    val conv2 = convs.find(c =>
      LakeTable.bucketOfValue(c, n) != LakeTable.bucketOfValue(conv1, n)).get
    val e0 = lake.currentSnapshot.get.epoch

    CdcApply.apply(lake, batchRow(conv1, 80000000L,
      Map("extra" -> "keepme")), e0 + 1, nBuckets = n)
    val idExtra = Schemas.fieldId(
      lake.currentSnapshot.get.schema("extra")).get
    lake.dropColumn("extra")
    CdcApply.apply(lake, batchRow(conv2, 80000001L,
      Map("extra2" -> "fresh")), e0 + 2, nBuckets = n)

    val sch = lake.currentSnapshot.get.schema
    assert(Schemas.fieldId(sch("extra2")).get > idExtra,
      "a dropped id must never be recycled (lastFieldId high-water mark)")
    // the dropped column's stored bytes must not surface under extra2
    val withVal = lake.read().filter(col("extra2").isNotNull).collect()
    assert(withVal.length == 1 &&
      withVal.head.getAs[String]("conv_id") == conv2 &&
      withVal.head.getAs[String]("extra2") == "fresh",
      s"dropped values resurrected: ${withVal.mkString(";")}")
  }

  test("public reads carry no field-id metadata (derived writes are safe)") {
    val lake = build()
    assert(!lake.read().schema.fields.exists(
      _.metadata.contains(Schemas.FieldIdKey)))
    // the classic leak: multi-aliasing one column and writing parquet —
    // with leaked ids this writes a duplicate-id file unreadable under
    // id-matching
    val out = graft.TestSpark.tmpDir("fid-leak")
    lake.read().select(col("text").as("a"), col("text").as("b"))
      .write.mode("overwrite").parquet(out)
    assert(spark.read.parquet(out).count() == lake.read().count())
  }

  test("refusals: key columns, internal columns, collisions") {
    val lake = build()
    intercept[IllegalArgumentException](lake.renameColumn("conv_id", "cid"))
    intercept[IllegalArgumentException](lake.renameColumn("turn_idx", "ti"))
    intercept[IllegalArgumentException](lake.renameColumn("_lsn", "lsn"))
    intercept[IllegalArgumentException](lake.renameColumn("tool", "text"))
    intercept[IllegalArgumentException](lake.renameColumn("nope", "x"))
    intercept[IllegalArgumentException](lake.dropColumn("conv_id"))
    intercept[IllegalArgumentException](lake.dropColumn("_tombstone"))
    intercept[IllegalArgumentException](lake.dropColumn("nope"))
  }

  test("nested rename/drop are refused loudly (field ids are top-level)") {
    val lake = build()
    val er = intercept[IllegalArgumentException](
      lake.renameColumn("meta.src", "meta.source"))
    assert(er.getMessage.contains("nested"),
      s"refusal must name the nested boundary: ${er.getMessage}")
    val ed = intercept[IllegalArgumentException](lake.dropColumn("meta.src"))
    assert(ed.getMessage.contains("nested"),
      s"refusal must name the nested boundary: ${ed.getMessage}")
  }
}
