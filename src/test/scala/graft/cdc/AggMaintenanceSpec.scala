package graft.cdc

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.TestSpark
import graft.changelog.ChangelogGen
import graft.lake.LakeTable

/** The derived conv_agg table stays consistent with the main table after an
  * incremental multi-batch replay — equal to recomputing the aggregates from
  * scratch over final state (the reference's activity-agg invariant). */
class AggMaintenanceSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark

  private def aggOf(lake: LakeTable): Map[String, (Int, Int, Int, Long, Map[String, Int])] =
    lake.read()
      .groupBy("conv_id")
      .agg(count(lit(1)).cast("int").as("n_turns"),
        count(when(col("role") === "tool", 1)).cast("int").as("n_tool_turns"),
        max("turn_idx").as("max_turn_idx"),
        max("_lsn").as("last_lsn"))
      .collect()
      .map(r => r.getString(0) -> ((r.getInt(1), r.getInt(2), r.getInt(3),
        r.getLong(4), Map.empty[String, Int]))).toMap

  test("incrementally maintained conv_agg equals recompute-from-scratch") {
    val dir = TestSpark.tmpDir("agg-cl")
    // high delete rate + few turns per conv so some conversations vanish
    ChangelogGen.write(spark, dir, ChangelogGen.Config(
      nEvents = 4000, nConvs = 40, turnsPerConv = 3,
      pUpdate = 0.3, pDelete = 0.3, pDup = 0.1, segSize = 500))
    val main = new LakeTable(spark, TestSpark.tmpDir("agg-main"))
    val agg = new LakeTable(spark, TestSpark.tmpDir("agg-derived"))
    new CdcDriver(spark, dir, main, segmentsPerBatch = 2, nBuckets = 8,
      quiet = true, aggLake = Some(agg)).run()

    // derived table contents
    val got = agg.read().collect().map { r =>
      r.getAs[String]("conv_id") -> ((r.getAs[Int]("n_turns"),
        r.getAs[Int]("n_tool_turns"), r.getAs[Int]("max_turn_idx"),
        r.getAs[Long]("last_lsn"),
        Option(r.getJavaMap[String, Int](r.fieldIndex("role_counts")))
          .map(m => scala.jdk.CollectionConverters.MapHasAsScala(m).asScala.toMap)
          .getOrElse(Map.empty)))
    }.toMap

    // recompute from final main state
    val want = main.read()
      .groupBy("conv_id")
      .agg(count(lit(1)).cast("int").as("n"),
        count(when(col("role") === "tool", 1)).cast("int").as("nt"),
        max("turn_idx").as("mx"), max("_lsn").as("ml"))
      .collect()
      .map(r => r.getString(0) -> ((r.getInt(1), r.getInt(2), r.getInt(3), r.getLong(4))))
      .toMap
    val wantRoles = main.read().groupBy("conv_id", "role").count().collect()
      .groupBy(_.getString(0))
      .map { case (c, rs) =>
        c -> rs.map(r => r.getString(1) -> r.getLong(2).toInt).toMap }

    assert(got.keySet == want.keySet, "conv sets differ (stale or missing aggs)")
    got.foreach { case (c, (n, nt, mx, ml, roles)) =>
      assert((n, nt, mx, ml) == want(c), s"agg mismatch for $c")
      assert(roles == wantRoles(c), s"role_counts mismatch for $c")
    }

    // rerun the whole driver: everything fenced, agg table unchanged
    val snapBefore = agg.currentSnapshot.get.snapshotId
    new CdcDriver(spark, dir, main, 2, 8, quiet = true, aggLake = Some(agg)).run()
    assert(agg.currentSnapshot.get.snapshotId == snapBefore)
  }

  test("agg catch-up: enabling the derived table after the fact backfills it") {
    val dir = TestSpark.tmpDir("agg-late-cl")
    ChangelogGen.write(spark, dir, ChangelogGen.Config(
      nEvents = 2000, nConvs = 20, turnsPerConv = 4,
      pUpdate = 0.3, pDelete = 0.2, pDup = 0.05, segSize = 500))
    val main = new LakeTable(spark, TestSpark.tmpDir("agg-late-main"))
    // replay fully WITHOUT the derived table
    new CdcDriver(spark, dir, main, 2, 8, quiet = true).run()
    // now attach an empty agg table: all batches fence, catch-up backfills
    val agg = new LakeTable(spark, TestSpark.tmpDir("agg-late-agg"))
    val stats = new CdcDriver(spark, dir, main, 2, 8, quiet = true,
      aggLake = Some(agg)).run()
    assert(stats.forall(_.skipped))
    val got = agg.read().select("conv_id", "n_turns").collect()
      .map(r => (r.getString(0), r.getInt(1))).toMap
    val want = main.read().groupBy("conv_id").count().collect()
      .map(r => (r.getString(0), r.getLong(1).toInt)).toMap
    assert(got == want)
    assert(agg.currentSnapshot.get.epoch == main.currentSnapshot.get.epoch)
  }

  test("kill/resume with derived table converges to the same aggregates") {
    val dir = TestSpark.tmpDir("agg-kill-cl")
    ChangelogGen.write(spark, dir, ChangelogGen.Config(
      nEvents = 3000, nConvs = 25, turnsPerConv = 4,
      pUpdate = 0.3, pDelete = 0.2, pDup = 0.1, segSize = 300))
    val mainRef = new LakeTable(spark, TestSpark.tmpDir("agg-kr-main-ref"))
    val aggRef = new LakeTable(spark, TestSpark.tmpDir("agg-kr-agg-ref"))
    new CdcDriver(spark, dir, mainRef, 2, 8, quiet = true,
      aggLake = Some(aggRef)).run()

    val main = new LakeTable(spark, TestSpark.tmpDir("agg-kr-main"))
    val agg = new LakeTable(spark, TestSpark.tmpDir("agg-kr-agg"))
    new CdcDriver(spark, dir, main, 2, 8, quiet = true,
      aggLake = Some(agg)).run(maxBatches = 2) // "kill" after 2 batches
    new CdcDriver(spark, dir, main, 2, 8, quiet = true,
      aggLake = Some(agg)).run() // resume

    def dump(l: LakeTable) = l.read()
      .select("conv_id", "n_turns", "max_turn_idx", "last_lsn")
      .collect().map(r => (r.getString(0), r.getInt(1), r.getInt(2), r.getLong(3)))
      .toSet
    assert(dump(agg) == dump(aggRef))
  }
}
