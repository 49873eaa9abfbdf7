package graft.cdc

import org.scalatest.funsuite.AnyFunSuite

import graft.TestSpark
import graft.changelog.ChangelogGen
import graft.lake.LakeTable

/** Merge-on-read (LSM) ingest mode: delta appends + read-side LWW
  * resolution + per-bucket chain folds must be observationally identical to
  * the copy-on-write merge — same final state, same fencing/kill-resume
  * guarantees, same derived-table/change-feed/retention behavior. */
class CdcMorSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark

  private def changelog(name: String, cfg: ChangelogGen.Config): String = {
    val dir = TestSpark.tmpDir(name)
    ChangelogGen.write(spark, dir, cfg)
    dir
  }

  private def allEvents(dir: String) =
    spark.read.option("mergeSchema", "true").parquet(dir)

  private val updateHeavy = ChangelogGen.Config(
    nEvents = 8000, nConvs = 40, turnsPerConv = 8,
    pUpdate = 0.5, pDelete = 0.08, pDup = 0.1, segSize = 1000)

  test("MoR replay matches the fold oracle and the CoW replay") {
    val dir = changelog("mor", updateHeavy)
    val cow = new LakeTable(spark, TestSpark.tmpDir("mor-cow"))
    new CdcDriver(spark, dir, cow, segmentsPerBatch = 1, nBuckets = 8,
      quiet = true).run()
    val mor = new LakeTable(spark, TestSpark.tmpDir("mor-lake"))
    new CdcDriver(spark, dir, mor, segmentsPerBatch = 1, nBuckets = 8,
      quiet = true, mor = true, morCompactChain = 0).run()
    assert(mor.currentSnapshot.exists(_.mor), "table not marked MoR")
    // un-folded: at least one bucket's chain holds several delta segments
    val chains = CdcApply.chainLengths(mor.currentSnapshot.get)
    assert(chains.values.max > 1, s"no delta chain grew: $chains")
    val oracle = CdcOracle.fold(allEvents(dir))
    assert(CdcOracle.tableState(mor.read()) == oracle)
    assert(CdcOracle.tableState(mor.read()) == CdcOracle.tableState(cow.read()))
  }

  test("replayed MoR batches are fenced (exactly-once under redelivery)") {
    val dir = changelog("mor-fence", updateHeavy)
    val mor = new LakeTable(spark, TestSpark.tmpDir("mor-fence-lake"))
    def driver() = new CdcDriver(spark, dir, mor, segmentsPerBatch = 2,
      nBuckets = 8, quiet = true, mor = true, morCompactChain = 0)
    driver().run(maxBatches = 2)
    val snapAfterPartial = mor.currentSnapshot.get.snapshotId
    driver().run() // resume: finishes the rest
    val finalState = CdcOracle.tableState(mor.read())
    val finalSnap = mor.currentSnapshot.get.snapshotId
    assert(finalSnap > snapAfterPartial)
    val stats = driver().run() // full re-run: everything fenced
    assert(stats.forall(_.skipped))
    assert(mor.currentSnapshot.get.snapshotId == finalSnap)
    assert(CdcOracle.tableState(mor.read()) == finalState)
  }

  test("chain fold rewrites only the chosen buckets and preserves state") {
    val dir = changelog("mor-fold", updateHeavy)
    val mor = new LakeTable(spark, TestSpark.tmpDir("mor-fold-lake"))
    new CdcDriver(spark, dir, mor, segmentsPerBatch = 1, nBuckets = 8,
      quiet = true, mor = true, morCompactChain = 0).run()
    val before = CdcOracle.tableState(mor.read())
    val snap0 = mor.currentSnapshot.get
    val chains0 = CdcApply.chainLengths(snap0)
    val (foldB, coldB) = (chains0.keys.min, chains0.keys.max)
    val coldRefs0 = snap0.manifests.filter(_.bucket == coldB).map(_.path)

    val st = CdcApply.foldBuckets(mor, Set(foldB))
    val snap1 = mor.currentSnapshot.get
    assert(snap1.epoch == snap0.epoch, "fold must not consume epoch space")
    assert(snap1.mor, "fold must keep the table MoR")
    assert(CdcApply.chainLengths(snap1)(foldB) == 1,
      "folded bucket should hold one manifest")
    // cold bucket's chain carried BY PATH, not rewritten
    assert(snap1.manifests.filter(_.bucket == coldB).map(_.path) == coldRefs0)
    assert(st.touchedSet == Set(foldB))
    assert(CdcOracle.tableState(mor.read()) == before)

    // threshold policy folds every due bucket
    val folded = CdcApply.maybeFold(mor, 2)
    assert(folded == CdcApply.chainLengths(snap1).filter(_._2 >= 2).keySet)
    assert(CdcApply.chainLengths(mor.currentSnapshot.get).values.max == 1)
    assert(CdcOracle.tableState(mor.read()) == before)
  }

  test("automatic fold policy bounds chains during replay") {
    val dir = changelog("mor-auto", updateHeavy)
    val mor = new LakeTable(spark, TestSpark.tmpDir("mor-auto-lake"))
    new CdcDriver(spark, dir, mor, segmentsPerBatch = 1, nBuckets = 8,
      quiet = true, mor = true, morCompactChain = 3).run()
    val chains = CdcApply.chainLengths(mor.currentSnapshot.get)
    assert(chains.values.max <= 3, s"chain exceeded threshold: $chains")
    assert(CdcOracle.tableState(mor.read()) == CdcOracle.fold(allEvents(dir)))
  }

  test("MoR with retention reclaims folded chains; derived tables intact") {
    val dir = changelog("mor-retain", updateHeavy)
    val ref = new LakeTable(spark, TestSpark.tmpDir("mor-retain-ref"))
    new CdcDriver(spark, dir, ref, segmentsPerBatch = 1, nBuckets = 8,
      quiet = true).run()
    val mor = new LakeTable(spark, TestSpark.tmpDir("mor-retain-lake"))
    val agg = new LakeTable(spark, TestSpark.tmpDir("mor-retain-agg"))
    new CdcDriver(spark, dir, mor, segmentsPerBatch = 1, nBuckets = 8,
      quiet = true, mor = true, morCompactChain = 3, keepSnapshots = 2,
      aggLake = Some(agg)).run()
    assert(mor.snapshots.size <= 2)
    assert(CdcOracle.tableState(mor.read()) == CdcOracle.tableState(ref.read()))
    // folded-away delta files actually reclaimed from disk
    val liveFiles = mor.snapshots.flatMap(_.files.map(_.path)).toSet
    val onDisk = graft.lake.LakeIO.list(s"${mor.root}/data")
      .filter(_._3).flatMap { case (_, d, _) =>
        graft.lake.LakeIO.list(d).filter(_._3).flatMap { case (_, bd, _) =>
          graft.lake.LakeIO.list(bd).map(_._2).filter(_.endsWith(".parquet"))
        }
      }.toSet
    assert((onDisk -- liveFiles).isEmpty,
      s"${(onDisk -- liveFiles).size} dead delta files left on disk")
    // derived agg (maintained through LwwResolve'd reads) matches recompute
    val expect = ref.read().groupBy("conv_id").count().collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    val got = agg.read().collect()
      .map(r => r.getAs[String]("conv_id") -> r.getAs[Int]("n_turns").toLong)
      .toMap
    assert(got == expect, "derived conv_agg diverged on MoR source")
  }

  test("change feed between MoR snapshots matches the CoW feed") {
    val dir = changelog("mor-feed", updateHeavy)
    val cow = new LakeTable(spark, TestSpark.tmpDir("mor-feed-cow"))
    val mor = new LakeTable(spark, TestSpark.tmpDir("mor-feed-lake"))
    new CdcDriver(spark, dir, cow, segmentsPerBatch = 4, nBuckets = 8,
      quiet = true).run()
    new CdcDriver(spark, dir, mor, segmentsPerBatch = 4, nBuckets = 8,
      quiet = true, mor = true, morCompactChain = 0).run()
    def feed(lake: LakeTable) = {
      val ids = lake.snapshots.map(_.snapshotId)
      graft.lake.ChangeFeedReader
        .between(spark, lake, ids.head, ids.last, imageCols = Seq("text"))
        .collect().map(r => (r.getAs[String]("conv_id"),
          r.getAs[Int]("turn_idx"), r.getAs[String]("action"),
          r.getAs[String]("post_text"))).toSet
    }
    assert(feed(mor) == feed(cow))
  }

  test("point lookup resolves the chain to the latest live version") {
    val dir = changelog("mor-lookup", updateHeavy)
    val mor = new LakeTable(spark, TestSpark.tmpDir("mor-lookup-lake"))
    new CdcDriver(spark, dir, mor, segmentsPerBatch = 1, nBuckets = 8,
      quiet = true, mor = true, morCompactChain = 0).run()
    val oracle = CdcOracle.fold(allEvents(dir))
    val someConv = oracle.keys.map(_._1).head
    val got = mor.lookup(someConv).collect()
      .map(r => (r.getAs[String]("conv_id"), r.getAs[Int]("turn_idx")) ->
        r.getAs[Long]("_lsn")).toMap
    val want = oracle.filter(_._1._1 == someConv)
      .map { case (k, t) => k -> t.lsn }
    assert(got == want, "lookup returned stale or duplicate versions")
  }

  test("mid-stream schema evolution lands on a MoR table") {
    val dir = changelog("mor-evolve", ChangelogGen.Config(
      nEvents = 4000, nConvs = 30, turnsPerConv = 8,
      pUpdate = 0.4, pDelete = 0.05, pDup = 0.05, segSize = 500,
      evolveAt = 2000))
    val mor = new LakeTable(spark, TestSpark.tmpDir("mor-evolve-lake"))
    new CdcDriver(spark, dir, mor, segmentsPerBatch = 1, nBuckets = 8,
      quiet = true, mor = true, morCompactChain = 3).run()
    val snap = mor.currentSnapshot.get
    assert(snap.schemaVersion > 1, "evolution did not bump the version")
    assert(snap.schema.fieldNames.contains("tool_meta"))
    assert(CdcOracle.tableState(mor.read()) == CdcOracle.fold(allEvents(dir)))
  }

  test("patch feeds are refused on MoR tables") {
    val dir = changelog("mor-patch", ChangelogGen.Config(
      nEvents = 500, nConvs = 10, turnsPerConv = 5, segSize = 500))
    val mor = new LakeTable(spark, TestSpark.tmpDir("mor-patch-lake"))
    val e = intercept[IllegalArgumentException] {
      new CdcDriver(spark, dir, mor, segmentsPerBatch = 1, nBuckets = 8,
        quiet = true, mor = true, patchEnabled = true).run()
    }
    assert(e.getMessage.contains("merge-on-read"))
  }

  test("MoR state is invariant to delivery permutation, segmentation, fold points") {
    val cfg = ChangelogGen.Config(
      nEvents = 1200, nConvs = 15, turnsPerConv = 5,
      pUpdate = 0.4, pDelete = 0.1, pDup = 0.1, pBad = 0.1, segSize = 300)
    val d1 = TestSpark.tmpDir("mor-prop-cl1")
    ChangelogGen.write(spark, d1, cfg)
    val events = spark.read.parquet(d1).drop("seg")
    // deterministic pseudo-random permutation, re-segmented differently
    val rnd = new scala.util.Random(11)
    val shuffled = rnd.shuffle(events.collect().toList)
    val d2 = TestSpark.tmpDir("mor-prop-cl2")
    shuffled.zipWithIndex.groupBy(_._2 / 200).foreach { case (seg, rows) =>
      spark.createDataFrame(
          spark.sparkContext.parallelize(rows.map(_._1)), events.schema)
        .write.parquet(s"$d2/seg=$seg")
    }
    def replay(dir: String, segs: Int, chain: Int) = {
      val lake = new LakeTable(spark, TestSpark.tmpDir("mor-prop-lake"))
      new CdcDriver(spark, dir, lake, segs, nBuckets = 8, quiet = true,
        mor = true, morCompactChain = chain).run()
      CdcOracle.tableState(lake.read())
    }
    val s1 = replay(d1, segs = 2, chain = 0) // raw chains, never folded
    val s2 = replay(d2, segs = 1, chain = 2) // aggressive folding
    val s3 = replay(d2, segs = 3, chain = 3)
    assert(s1.nonEmpty)
    assert(s1 == s2 && s1 == s3)
    assert(s1 == CdcOracle.fold(events))
  }

  test("two concurrent MoR appenders converge exactly-once") {
    val dir = changelog("mor-race", ChangelogGen.Config(
      nEvents = 3000, nConvs = 25, turnsPerConv = 6,
      pUpdate = 0.35, pDelete = 0.1, pDup = 0.1, segSize = 300))
    val lake = new LakeTable(spark, TestSpark.tmpDir("mor-race-lake"))
    val errors = new java.util.concurrent.ConcurrentLinkedQueue[Throwable]()
    val threads = (1 to 2).map { i =>
      new Thread(() => {
        try new CdcDriver(spark, dir, lake, segmentsPerBatch = 1,
          nBuckets = 8, quiet = true, mor = true, morCompactChain = 3).run()
        catch { case t: Throwable => errors.add(t) }
      }, s"mor-applier-$i")
    }
    threads.foreach(_.start())
    threads.foreach(_.join(300000))
    assert(errors.isEmpty, s"appender failed: ${errors.peek()}")
    assert(lake.currentSnapshot.get.epoch == 10)
    assert(CdcOracle.tableState(lake.read()) ==
      CdcOracle.fold(spark.read.parquet(dir)))
  }

  test("streaming tailer in MoR mode matches the batch replay") {
    val dir = changelog("mor-stream", updateHeavy)
    val batchLake = new LakeTable(spark, TestSpark.tmpDir("mor-stream-batch"))
    new CdcDriver(spark, dir, batchLake, segmentsPerBatch = 1, nBuckets = 8,
      quiet = true, mor = true, morCompactChain = 3).run()
    val streamLake = new LakeTable(spark, TestSpark.tmpDir("mor-stream-lake"))
    val schema = org.apache.spark.sql.types.StructType(
      spark.read.option("mergeSchema", "true")
        .option("recursiveFileLookup", "true").parquet(dir).schema
        .fields.filterNot(f => f.name == "p" || f.name == "seg"))
    CdcStream.run(spark, dir, streamLake,
      TestSpark.tmpDir("mor-stream-ckpt"), schema, nBuckets = 8,
      maxFilesPerTrigger = 16, mor = true, morCompactChain = 3)
    assert(streamLake.currentSnapshot.exists(_.mor))
    assert(CdcOracle.tableState(streamLake.read()) ==
      CdcOracle.tableState(batchLake.read()))
  }

  test("storage mode is a table property: the stored flag beats the caller") {
    val dir = changelog("mor-sticky", ChangelogGen.Config(
      nEvents = 2000, nConvs = 20, turnsPerConv = 8,
      pUpdate = 0.4, pDelete = 0.05, pDup = 0.05, segSize = 500))
    val mor = new LakeTable(spark, TestSpark.tmpDir("mor-sticky-lake"))
    new CdcDriver(spark, dir, mor, segmentsPerBatch = 1, nBuckets = 8,
      quiet = true, mor = true, morCompactChain = 0).run(maxBatches = 2)
    // resume WITHOUT the flag: table stays MoR (appends, not rewrites)
    new CdcDriver(spark, dir, mor, segmentsPerBatch = 1, nBuckets = 8,
      quiet = true).run()
    assert(mor.currentSnapshot.exists(_.mor))
    assert(CdcOracle.tableState(mor.read()) == CdcOracle.fold(allEvents(dir)))
  }
}
