package graft.cdc

import org.scalatest.funsuite.AnyFunSuite

import graft.TestSpark
import graft.changelog.ChangelogGen
import graft.lake.LakeTable

/** End-to-end CDC correctness vs the sequential fold oracle — the translated
  * reference invariants (SURVEY.md §5): replay-idempotence, LWW, deletes,
  * kill/resume convergence, schema evolution, skew-salting equivalence. */
class CdcSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark

  private def changelog(name: String, cfg: ChangelogGen.Config): String = {
    val dir = TestSpark.tmpDir(name)
    ChangelogGen.write(spark, dir, cfg)
    dir
  }

  private def allEvents(dir: String) =
    spark.read.option("mergeSchema", "true").parquet(dir)

  test("insert-only replay matches fold oracle") {
    val dir = changelog("ins", ChangelogGen.Config(
      nEvents = 2000, nConvs = 40, turnsPerConv = 10,
      pUpdate = 0.0, pDelete = 0.0, pDup = 0.0, segSize = 500))
    val lake = new LakeTable(spark, TestSpark.tmpDir("ins-lake"))
    new CdcDriver(spark, dir, lake, segmentsPerBatch = 2, nBuckets = 16,
      quiet = true).run()
    assert(CdcOracle.tableState(lake.read()) == CdcOracle.fold(allEvents(dir)))
  }

  test("snapshot retention bounds history; state and derived tables intact") {
    val dir = changelog("retain", ChangelogGen.Config(
      nEvents = 8000, nConvs = 50, turnsPerConv = 8,
      pUpdate = 0.3, pDelete = 0.08, pDup = 0.1, segSize = 1000))
    // reference replay: unbounded history
    val ref = new LakeTable(spark, TestSpark.tmpDir("retain-ref"))
    new CdcDriver(spark, dir, ref, segmentsPerBatch = 1, nBuckets = 8,
      quiet = true).run()
    // retained replay with derived agg + search index, restarted mid-way
    // (exercises catch-up paths against an expired-history commit log)
    val lake = new LakeTable(spark, TestSpark.tmpDir("retain-lake"))
    val agg = new LakeTable(spark, TestSpark.tmpDir("retain-agg"))
    val idx = new LakeTable(spark, TestSpark.tmpDir("retain-idx"))
    def driver() = new CdcDriver(spark, dir, lake, segmentsPerBatch = 1,
      nBuckets = 8, quiet = true, aggLake = Some(agg),
      searchIndex = Some(idx), indexCompactChain = 3, keepSnapshots = 2)
    driver().run(maxBatches = 4)
    driver().run() // "restart": catch-up + remaining batches
    assert(lake.snapshots.size <= 2,
      s"${lake.snapshots.size} snapshots retained under keep=2")
    assert(agg.snapshots.size <= 2)
    // final state identical to the unbounded-history replay
    assert(CdcOracle.tableState(lake.read()) == CdcOracle.tableState(ref.read()))
    // reclaimed: dead copy-on-write files actually deleted from disk
    val liveFiles = lake.snapshots.flatMap(_.files.map(_.path)).toSet
    val onDisk = graft.lake.LakeIO.list(s"${lake.root}/data")
      .filter(_._3).flatMap { case (_, d, _) =>
        graft.lake.LakeIO.list(d).filter(_._3).flatMap { case (_, bd, _) =>
          graft.lake.LakeIO.list(bd).map(_._2).filter(_.endsWith(".parquet"))
        }
      }.toSet
    assert((onDisk -- liveFiles).isEmpty,
      s"${(onDisk -- liveFiles).size} dead data files left on disk")
    // derived agg equals a from-scratch recompute over the final state
    // (read() already filters tombstones)
    val expect = ref.read()
      .groupBy("conv_id").count().collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    val got = agg.read().collect()
      .map(r => r.getAs[String]("conv_id") -> r.getAs[Int]("n_turns").toLong)
      .toMap
    assert(got == expect, "derived conv_agg diverged under retention")
    // index equals a fresh full rebuild over the final state
    val full = new LakeTable(spark, TestSpark.tmpDir("retain-idx-full"))
    graft.search.SearchIndex.refresh(spark, lake, full, nBuckets = 8)
    def postings(t: LakeTable) =
      graft.search.SearchIndex.resolvedPostings(t).collect()
        .map(r => (r.getString(0), r.getString(1), r.getInt(2),
          r.getAs[Number](3).longValue)).toSet
    assert(postings(idx) == postings(full), "index diverged under retention")
  }

  test("mixed I/U/D with duplicate deliveries matches fold oracle (LWW)") {
    val dir = changelog("mix", ChangelogGen.Config(
      nEvents = 4000, nConvs = 30, turnsPerConv = 8,
      pUpdate = 0.4, pDelete = 0.1, pDup = 0.15, segSize = 500))
    val lake = new LakeTable(spark, TestSpark.tmpDir("mix-lake"))
    new CdcDriver(spark, dir, lake, segmentsPerBatch = 3, nBuckets = 16,
      quiet = true).run()
    val oracle = CdcOracle.fold(allEvents(dir))
    assert(oracle.nonEmpty)
    assert(CdcOracle.tableState(lake.read()) == oracle)
    // deletes actually happened: some keys were touched then removed
    assert(lake.read().count() == oracle.size)
  }

  test("whole-changelog redelivery is a no-op (epoch fencing, exactly-once)") {
    val dir = changelog("redeliver", ChangelogGen.Config(
      nEvents = 1500, nConvs = 20, turnsPerConv = 6,
      pUpdate = 0.3, pDelete = 0.05, pDup = 0.1, segSize = 500))
    val lake = new LakeTable(spark, TestSpark.tmpDir("re-lake"))
    new CdcDriver(spark, dir, lake, segmentsPerBatch = 1, nBuckets = 8,
      quiet = true).run()
    val snapAfter = lake.currentSnapshot.get
    // rerun the whole driver: every batch must be fenced out
    val stats2 = new CdcDriver(spark, dir, lake, segmentsPerBatch = 1,
      nBuckets = 8, quiet = true).run()
    assert(stats2.forall(_.skipped))
    assert(lake.currentSnapshot.get.snapshotId == snapAfter.snapshotId)
    // and a manual replay of an old batch is also fenced
    val oldBatch = spark.read.parquet(s"$dir/seg=0")
    val s = CdcApply.apply(lake, oldBatch, epoch = 1, nBuckets = 8)
    assert(s.skipped)
  }

  test("kill mid-replay and resume from checkpoint converges") {
    val cfg = ChangelogGen.Config(
      nEvents = 3000, nConvs = 25, turnsPerConv = 8,
      pUpdate = 0.35, pDelete = 0.08, pDup = 0.1, segSize = 300)
    val dir = changelog("kill", cfg)
    // reference run: single uninterrupted replay
    val lakeRef = new LakeTable(spark, TestSpark.tmpDir("kill-ref"))
    new CdcDriver(spark, dir, lakeRef, 2, 8, quiet = true).run()
    // interrupted run: stop after 2 batches ("kill"), then a brand-new
    // driver instance resumes purely from the lake commit log
    val lake = new LakeTable(spark, TestSpark.tmpDir("kill-lake"))
    val first = new CdcDriver(spark, dir, lake, 2, 8, quiet = true)
      .run(maxBatches = 2)
    assert(first.size == 2)
    new CdcDriver(spark, dir, lake, 2, 8, quiet = true).run()
    assert(CdcOracle.tableState(lake.read()) ==
      CdcOracle.tableState(lakeRef.read()))
    assert(CdcOracle.tableState(lake.read()) == CdcOracle.fold(allEvents(dir)))
  }

  test("additive schema evolution mid-stream (tool_meta)") {
    val cfg = ChangelogGen.Config(
      nEvents = 2000, nConvs = 20, turnsPerConv = 6,
      pUpdate = 0.3, pDelete = 0.05, pDup = 0.05, segSize = 400,
      evolveAt = 1200)
    val dir = changelog("evolve", cfg)
    val lake = new LakeTable(spark, TestSpark.tmpDir("evolve-lake"))
    new CdcDriver(spark, dir, lake, segmentsPerBatch = 1, nBuckets = 8,
      quiet = true).run()
    val snap = lake.currentSnapshot.get
    assert(snap.schemaVersion == 2)
    assert(snap.schema.fieldNames.contains("tool_meta"))
    val state = CdcOracle.tableState(lake.read())
    assert(state == CdcOracle.fold(allEvents(dir)))
    // rows whose winner predates the cut-in have null tool_meta, later ones not
    assert(state.values.exists(t => t.lsn < 1200 && t.toolMeta.isEmpty))
    assert(state.values.exists(t => t.lsn >= 1200 && t.toolMeta.nonEmpty))
  }

  test("zipf-skewed changelog: salted run equals unsalted run") {
    val cfg = ChangelogGen.Config(
      nEvents = 3000, nConvs = 200, turnsPerConv = 4,
      pUpdate = 0.5, pDelete = 0.05, pDup = 0.1, skew = 3.0, segSize = 1000)
    val dir = changelog("zipf", cfg)
    val plain = new LakeTable(spark, TestSpark.tmpDir("zipf-plain"))
    new CdcDriver(spark, dir, plain, 2, 8, saltBuckets = 0, quiet = true).run()
    val salted = new LakeTable(spark, TestSpark.tmpDir("zipf-salted"))
    new CdcDriver(spark, dir, salted, 2, 8, saltBuckets = 8, quiet = true).run()
    val st = CdcOracle.tableState(salted.read())
    assert(st == CdcOracle.tableState(plain.read()))
    assert(st == CdcOracle.fold(allEvents(dir)))
  }

  test("change-feed counts reconcile with the fold oracle's state diff") {
    val cfg = ChangelogGen.Config(
      nEvents = 3000, nConvs = 30, turnsPerConv = 6,
      pUpdate = 0.4, pDelete = 0.1, pDup = 0.15, segSize = 500)
    val dir = changelog("cf", cfg)
    val lake = new LakeTable(spark, TestSpark.tmpDir("cf-lake"))
    val driver = new CdcDriver(spark, dir, lake, segmentsPerBatch = 1,
      nBuckets = 8, quiet = true)

    // incremental oracle: key -> (lsn, live?); an event applies only if its
    // lsn exceeds the stored one (redelivered old events lose LWW)
    var oracle = Map.empty[(String, Int), (Long, Boolean)]
    ChangelogGen.listSegments(dir).foreach { seg =>
      val stats = driver.run(maxBatches = 1)
      assert(stats.size == 1 && !stats.head.skipped)
      val before = oracle
      spark.read.parquet(s"$dir/seg=$seg")
        .collect().sortBy(_.getAs[Long]("_lsn"))
        .foreach { r =>
          val key = (r.getAs[String]("conv_id"), r.getAs[Int]("turn_idx"))
          val lsn = r.getAs[Long]("_lsn")
          val live = r.getAs[String]("op") != "D"
          oracle.get(key) match {
            case Some((l, _)) if l >= lsn => // older redelivery: ignore
            case _ => oracle = oracle + (key -> ((lsn, live)))
          }
        }
      def liveKeys(m: Map[(String, Int), (Long, Boolean)]) =
        m.iterator.filter(_._2._2).map(_._1).toSet
      val (lb, la) = (liveKeys(before), liveKeys(oracle))
      val expInserted = (la -- lb).size.toLong
      val expDeleted = (lb -- la).size.toLong
      val expUpdated = (la & lb).count(k => before(k)._1 != oracle(k)._1).toLong
      val a = stats.head.actions
      assert(a.getOrElse("inserted", 0L) == expInserted, s"seg $seg inserted")
      assert(a.getOrElse("deleted", 0L) == expDeleted, s"seg $seg deleted")
      assert(a.getOrElse("updated", 0L) == expUpdated, s"seg $seg updated")
      // every surviving (live or tombstone) row in touched buckets is
      // classified exactly once
      assert(a.values.sum == stats.head.rowsOut, s"seg $seg totals")
      // and the counts are persisted on the snapshot for consumers
      assert(stats.head.snapshot.metrics.contains("cf_inserted"))
    }
    assert(CdcOracle.tableState(lake.read()) == CdcOracle.fold(allEvents(dir)))
  }

  test("lineage records per-source-partition offset ranges and metrics") {
    val cfg = ChangelogGen.Config(
      nEvents = 1000, nConvs = 10, turnsPerConv = 5,
      pDup = 0.0, nSrcPartitions = 4, segSize = 250)
    val dir = changelog("lineage", cfg)
    val lake = new LakeTable(spark, TestSpark.tmpDir("lineage-lake"))
    new CdcDriver(spark, dir, lake, 1, 8, quiet = true).run()
    val snap = lake.currentSnapshot.get
    assert(snap.lineage.map(_.srcPart).sorted == Seq(0, 1, 2, 3))
    assert(snap.lineage.forall(l => l.minOff >= 0 && l.maxOff <= 999))
    assert(snap.lineage.exists(_.maxOff == 999) ||
      snap.lineage.map(_.maxOff).max >= 990) // last events present
    assert(snap.metrics.contains("eventsPerSec") ||
      snap.metrics.contains("rowsIn"))
    // every intermediate snapshot also carries metrics
    assert(lake.snapshots.forall(_.metrics.contains("rowsIn")))
  }
}
