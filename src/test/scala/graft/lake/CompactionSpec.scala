package graft.lake

import org.scalatest.funsuite.AnyFunSuite

import graft.TestSpark
import graft.cdc.{CdcDriver, CdcOracle}
import graft.changelog.ChangelogGen

class CompactionSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark

  private def build(): (String, LakeTable) = {
    val dir = TestSpark.tmpDir("compact-cl")
    ChangelogGen.write(spark, dir, ChangelogGen.Config(
      nEvents = 3000, nConvs = 25, turnsPerConv = 6,
      pUpdate = 0.35, pDelete = 0.15, pDup = 0.1, segSize = 500))
    val lake = new LakeTable(spark, TestSpark.tmpDir("compact-lake"))
    new CdcDriver(spark, dir, lake, segmentsPerBatch = 1, nBuckets = 8,
      quiet = true).run()
    (dir, lake)
  }

  test("compaction drops tombstones, preserves live state, keeps epoch") {
    val (dir, lake) = build()
    val before = CdcOracle.tableState(lake.read())
    val snapBefore = lake.currentSnapshot.get
    val rawBefore = lake.readBuckets(None).count()
    assert(rawBefore > before.size) // tombstones present

    val stats = Compaction.compact(lake, tombstoneWatermark = Long.MaxValue)
    assert(stats.tombstonesDropped == rawBefore - before.size)
    assert(lake.readBuckets(None).count() == before.size) // all tombstones gone
    assert(CdcOracle.tableState(lake.read()) == before) // live state unchanged
    val snapAfter = lake.currentSnapshot.get
    assert(snapAfter.epoch == snapBefore.epoch) // no source progress consumed
    assert(snapAfter.snapshotId == snapBefore.snapshotId + 1)

    // a full re-replay after compaction is still completely fenced
    val stats2 = new CdcDriver(spark, dir, lake, 1, 8, quiet = true).run()
    assert(stats2.forall(_.skipped))
  }

  test("partial watermark keeps newer tombstones (late-arrival safety)") {
    val (_, lake) = build()
    val raw = lake.readBuckets(None)
    import org.apache.spark.sql.functions._
    val tombLsns = raw.filter(col("_tombstone")).select("_lsn")
      .collect().map(_.getLong(0)).sorted
    assume(tombLsns.length >= 2)
    val mid = tombLsns(tombLsns.length / 2)
    Compaction.compact(lake, tombstoneWatermark = mid)
    val keptTombs = lake.readBuckets(None).filter(col("_tombstone"))
      .select("_lsn").collect().map(_.getLong(0)).sorted
    assert(keptTombs.toSeq == tombLsns.filter(_ >= mid).toSeq)
  }

  test("rebucket changes bucket count mid-stream; appliers adopt it") {
    val dir = TestSpark.tmpDir("rebucket-cl")
    ChangelogGen.write(spark, dir, ChangelogGen.Config(
      nEvents = 3000, nConvs = 25, turnsPerConv = 6,
      pUpdate = 0.35, pDelete = 0.15, pDup = 0.1, segSize = 500))
    val lake = new LakeTable(spark, TestSpark.tmpDir("rebucket-lake"))
    // apply first half with 8 buckets
    new CdcDriver(spark, dir, lake, segmentsPerBatch = 1, nBuckets = 8,
      quiet = true).run(maxBatches = 3)
    assert(lake.currentSnapshot.get.nBuckets == 8)
    val st = Compaction.rebucket(lake, newBuckets = 32)
    assert(st.snapshot.nBuckets == 32)
    assert(lake.currentSnapshot.get.files.forall(_.bucket < 32))
    // continue the replay: the driver's stale nBuckets=8 seed is ignored,
    // applies adopt 32 from the snapshot
    new CdcDriver(spark, dir, lake, segmentsPerBatch = 1, nBuckets = 8,
      quiet = true).run()
    assert(lake.currentSnapshot.get.nBuckets == 32)
    assert(CdcOracle.tableState(lake.read()) ==
      CdcOracle.fold(spark.read.parquet(dir)))
  }

  /** Total shuffle-write bytes of every stage that completes while `body`
    * runs — the evidence for the aligned-rebucket "no exchange" claim.
    * The async listener bus is drained by running a marker job with a
    * distinctive call site AFTER the body: the bus is FIFO, so once the
    * marker's stage is observed, every stage of the body has been too. */
  private def shuffleBytesDuring(body: => Unit): Long = {
    val marker = s"graft-drain-marker-${System.nanoTime()}"
    val bytes = new java.util.concurrent.atomic.AtomicLong(0L)
    val done = new java.util.concurrent.atomic.AtomicBoolean(false)
    val listener = new org.apache.spark.scheduler.SparkListener {
      override def onStageCompleted(
          s: org.apache.spark.scheduler.SparkListenerStageCompleted): Unit =
        if (s.stageInfo.name.startsWith(marker)) done.set(true)
        else bytes.addAndGet(
          s.stageInfo.taskMetrics.shuffleWriteMetrics.bytesWritten)
    }
    spark.sparkContext.addSparkListener(listener)
    try {
      body
      spark.sparkContext.setCallSite(marker)
      try spark.sparkContext.parallelize(1 to 1, 1).count()
      finally spark.sparkContext.clearCallSite()
      val deadline = System.nanoTime() + 30_000_000_000L
      while (!done.get() && System.nanoTime() < deadline) Thread.sleep(20)
      assert(done.get(), "listener bus did not drain")
      bytes.get()
    } finally spark.sparkContext.removeSparkListener(listener)
  }

  test("aligned rebucket split (8 -> 32) is shuffle-free, preserves state," +
      " and new-count lookups hit") {
    val (_, lake) = build()
    val before = CdcOracle.tableState(lake.read())
    val rawBefore = lake.readBuckets(None).count() // incl. tombstones
    val shuffled = shuffleBytesDuring {
      val st = Compaction.rebucket(lake, 32)
      assert(st.snapshot.metrics.get("rebucketShuffleFree").contains(1.0))
    }
    assert(shuffled == 0L, s"aligned split wrote $shuffled shuffle bytes")
    val after = lake.currentSnapshot.get
    assert(after.nBuckets == 32 && after.files.forall(_.bucket < 32))
    assert(CdcOracle.tableState(lake.read()) == before)
    assert(lake.readBuckets(None).count() == rawBefore) // tombstones kept
    // a point lookup under the NEW count routes to the right bucket
    val someKey = before.keys.head._1
    import org.apache.spark.sql.functions.col
    assert(lake.lookup(someKey).count() ==
      lake.read().filter(col("conv_id") === someKey).count())
  }

  test("aligned rebucket merge (8 -> 4) is shuffle-free and preserves state") {
    val (_, lake) = build()
    val before = CdcOracle.tableState(lake.read())
    val shuffled = shuffleBytesDuring {
      val st = Compaction.rebucket(lake, 4)
      assert(st.snapshot.metrics.get("rebucketShuffleFree").contains(1.0))
    }
    assert(shuffled == 0L, s"aligned merge wrote $shuffled shuffle bytes")
    assert(lake.currentSnapshot.get.nBuckets == 4)
    assert(lake.currentSnapshot.get.files.forall(_.bucket < 4))
    assert(CdcOracle.tableState(lake.read()) == before)
  }

  test("non-aligned rebucket (8 -> 12) falls back to repartition") {
    val (_, lake) = build()
    val before = CdcOracle.tableState(lake.read())
    val shuffled = shuffleBytesDuring {
      val st = Compaction.rebucket(lake, 12)
      assert(st.snapshot.metrics.get("rebucketShuffleFree").contains(0.0))
    }
    assert(shuffled > 0L)
    assert(lake.currentSnapshot.get.nBuckets == 12)
    assert(CdcOracle.tableState(lake.read()) == before)
  }

  test("time travel: pre-compaction snapshots remain readable") {
    val (_, lake) = build()
    val oldSnap = lake.currentSnapshot.get
    Compaction.compact(lake, tombstoneWatermark = Long.MaxValue)
    // files listed by the old snapshot still exist on disk
    assert(oldSnap.files.forall(f => new java.io.File(f.path).exists()))
    val oldRows = spark.read.schema(oldSnap.schema)
      .parquet(oldSnap.files.map(_.path): _*)
    assert(oldRows.count() == oldSnap.files.map(_.rows).sum)
  }
}
