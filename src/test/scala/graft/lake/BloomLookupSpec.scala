package graft.lake

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.TestSpark
import graft.cdc.{CdcApply, CdcDriver}
import graft.changelog.ChangelogGen

/** File-level membership pruning for point lookups: the writer enables a
  * parquet bloom filter on the leading bucket-key column
  * (LakeIO.bloomWriteOptions), and `lookupFilesKeyed` probes each candidate
  * file's bloom — or, for fully-dictionary-encoded chunks, the chunk
  * dictionary — to skip files that provably don't hold the key. This is
  * what min/max can't do inside a bucket: fresh merge output is
  * hash-ordered, so every file's [minKey, maxKey] spans the bucket.
  * Reference analogue: Cassandra's per-SSTable bloom filter in front of
  * the reference's point reads (jobs-core CassandraUtil.scala:29-77). */
class BloomLookupSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark

  /** MoR lake with unbounded chains (no auto-fold): 4 single-segment
    * batches append 4 delta files per touched bucket. */
  private def morLake(): LakeTable = {
    val dir = TestSpark.tmpDir("bloom-cl")
    ChangelogGen.write(spark, dir, ChangelogGen.Config(
      nEvents = 4000, nConvs = 60, turnsPerConv = 4,
      pUpdate = 0.4, pDelete = 0.05, pDup = 0.05, segSize = 1000))
    val lake = new LakeTable(spark, TestSpark.tmpDir("bloom-lake"))
    new CdcDriver(spark, dir, lake, segmentsPerBatch = 1, nBuckets = 8,
      quiet = true, mor = true, morCompactChain = 0).run()
    lake
  }

  private def oneRowBatch(conv: String, lsn: Long) =
    spark.range(1).select(
      lit("I").as("op"), lit(conv).as("conv_id"), lit(0).as("turn_idx"),
      lit("user").as("role"), lit("bloom probe").as("text"),
      lit(null).cast("string").as("tool"),
      lit("2024-01-01").cast("timestamp").as("ts"),
      lit(lsn).as("_lsn"), lit(0).as("_src_part"), lit(lsn).as("_src_off"))

  /** A never-written key that min/max pruning CANNOT reject: lexically
    * inside several candidate files' [minKey, maxKey] of whatever bucket it
    * hashes to (the conv ids are dense `conv-0000NNNN` strings, so
    * `conv-0000NNNN-x<i>` sits between NNNN and NNNN+1). */
  private def ghostInsideRanges(lake: LakeTable, minFiles: Int): String = {
    val convs = lake.read().select("conv_id").distinct()
      .collect().map(_.getString(0)).sorted
    val candidates = for (c <- convs.init.iterator; i <- (0 until 8).iterator)
      yield s"$c-x$i"
    candidates.find(g =>
        lake.lookupFilesKeyed(Seq(g), bloom = false).size >= minFiles)
      .getOrElse(fail(s"no ghost key with >=$minFiles min/max-kept files"))
  }

  test("negative lookup: membership evidence prunes every chain file") {
    val lake = morLake()
    assert(lake.currentSnapshot.get.mor)
    val ghost = ghostInsideRanges(lake, minFiles = 3)

    val unpruned = lake.lookupFilesKeyed(Seq(ghost), bloom = false)
    assert(unpruned.size >= 3, "min/max alone keeps chain files")
    val pruned = lake.lookupFilesKeyed(Seq(ghost))
    assert(pruned.isEmpty,
      s"bloom/dictionary evidence should prove absence, kept ${pruned.size}")
    assert(lake.lookup(ghost).count() == 0)
  }

  test("positive lookup: a key present in one chain file opens only it") {
    val lake = morLake()
    val before = lake.currentSnapshot.get
    // insert a NEW key that min/max can't separate from the existing chain:
    // the older chain files of its bucket lexically cover it but don't
    // contain it — only membership evidence isolates the fresh delta
    val conv = ghostInsideRanges(lake, minFiles = 3)
    CdcApply.apply(lake, oneRowBatch(conv, 99999999L), before.epoch + 1,
      nBuckets = before.nBuckets)

    val unpruned = lake.lookupFilesKeyed(Seq(conv), bloom = false)
    val pruned = lake.lookupFilesKeyed(Seq(conv))
    assert(unpruned.size >= 4, s"chain + fresh delta, got ${unpruned.size}")
    assert(pruned.size == 1, s"only the fresh delta holds the key: $pruned")
    val got = lake.lookup(conv).collect()
    assert(got.length == 1 && got.head.getAs[String]("text") == "bloom probe")
  }

  test("lookup equals a full-scan filter for every conversation") {
    val lake = morLake()
    val convs = lake.read().select("conv_id").distinct()
      .collect().map(_.getString(0)).take(10)
    for (c <- convs) {
      val got = lake.lookup(c).collect().map(_.toSeq).toSet
      val want = lake.read().filter(col("conv_id") === c)
        .collect().map(_.toSeq).toSet
      assert(got == want, s"lookup($c) diverged")
      assert(got.nonEmpty)
    }
  }

  test("probe is conclusive on compacted (CoW) files too, and typed") {
    // plain CoW lake; compaction also writes bloom options
    val dir = TestSpark.tmpDir("bloom-cow-cl")
    ChangelogGen.write(spark, dir, ChangelogGen.Config(
      nEvents = 2000, nConvs = 40, turnsPerConv = 4,
      pUpdate = 0.3, pDelete = 0.05, pDup = 0.05, segSize = 500))
    val lake = new LakeTable(spark, TestSpark.tmpDir("bloom-cow-lake"))
    new CdcDriver(spark, dir, lake, segmentsPerBatch = 2, nBuckets = 4,
      quiet = true).run()
    Compaction.compact(lake, targetFileRows = 200L)
    val snap = lake.currentSnapshot.get
    val aFile = snap.files.head
    val conv = spark.read.parquet(aFile.path)
      .select("conv_id").head().getString(0)
    assert(ParquetFooters.mightContain(aFile.path, "conv_id", conv)
      .contains(true))
    assert(ParquetFooters.mightContain(aFile.path, "conv_id", "zzz_absent")
      .contains(false))
    // long-typed probe against the _lsn column (no bloom configured there:
    // dictionary fallback or inconclusive — must never claim absence of a
    // present value)
    val lsn = spark.read.parquet(aFile.path).select("_lsn").head().getLong(0)
    assert(ParquetFooters.mightContain(aFile.path, "_lsn", lsn) != Some(false))
    // unknown column is inconclusive, not an error
    assert(ParquetFooters.mightContain(aFile.path, "no_such_col", "x").isEmpty)
  }
}
