package graft.search

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.TestSpark
import graft.cdc.CdcApply
import graft.lake.LakeTable

/** The inverted index stays consistent with the source table through
  * inserts, text updates (old postings retracted) and deletes, is refreshed
  * idempotently, and answers term queries from pruned IO. */
class SearchIndexSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  import spark.implicits._

  private def batch(rows: Seq[(String, String, Int, String, Long)]) =
    rows.toDF("op", "conv_id", "turn_idx", "text", "_lsn")
      .withColumn("_src_part", lit(0))
      .withColumn("_src_off", col("_lsn"))

  /** Brute-force AND search over the source's live rows. */
  private def bruteForce(main: LakeTable, terms: Seq[String]): Set[(String, Int, Long)] = {
    val t = main.read()
      .select(col("conv_id"), col("turn_idx"),
        explode(SearchIndex.terms(col("text"))).as("term"))
      .filter(col("term").isin(terms: _*))
      .groupBy("conv_id", "turn_idx")
      .agg(countDistinct("term").as("nt"), count(lit(1)).as("score"))
      .filter(col("nt") === terms.size)
      .collect()
    t.map(r => (r.getString(0), r.getInt(1), r.getLong(3))).toSet
  }

  private def searched(index: LakeTable, terms: Seq[String]): Set[(String, Int, Long)] =
    SearchIndex.search(spark, index, terms, topK = 100).collect()
      .map(r => (r.getString(0), r.getInt(1), r.getLong(2))).toSet

  test("incremental refresh tracks inserts, updates and deletes") {
    val main = new LakeTable(spark, TestSpark.tmpDir("si-main"))
    val index = new LakeTable(spark, TestSpark.tmpDir("si-index"))

    // batch 1: initial corpus
    CdcApply.apply(main, batch(Seq(
      ("I", "c1", 0, "the quick brown fox jumps", 1L),
      ("I", "c1", 1, "lazy dog sleeps, the dog dreams", 2L),
      ("I", "c2", 0, "quick silver fox runs", 3L),
      ("I", "c3", 0, "Dogs and foxes! A fox story.", 4L))), epoch = 1, nBuckets = 4)
    assert(SearchIndex.refresh(spark, main, index, nBuckets = 8).isDefined)

    // full build matches brute force
    for (q <- Seq(Seq("fox"), Seq("quick", "fox"), Seq("dog"), Seq("the")))
      assert(searched(index, q) == bruteForce(main, q), s"query $q after build")

    // batch 2: update c1/0 (fox -> wolf), delete c3/0, insert c4
    CdcApply.apply(main, batch(Seq(
      ("U", "c1", 0, "the quick brown wolf jumps", 10L),
      ("D", "c3", 0, null, 11L),
      ("I", "c4", 0, "a fox and a dog walk in", 12L))), epoch = 2, nBuckets = 4)
    val st = SearchIndex.refresh(spark, main, index, nBuckets = 8)
    assert(st.isDefined && st.get.fromSourceSnapshot == 0 &&
      st.get.toSourceSnapshot == 1)

    // retractions applied: c1/0 no longer matches "fox", c3/0 gone entirely
    for (q <- Seq(Seq("fox"), Seq("wolf"), Seq("quick", "fox"), Seq("dog"),
        Seq("the"), Seq("story")))
      assert(searched(index, q) == bruteForce(main, q), s"query $q after update")
    assert(!searched(index, Seq("fox")).exists(_._1 == "c3"))

    // tf scoring: c1/1 has "dog" twice
    val dogTop = SearchIndex.search(spark, index, Seq("dog"), topK = 1)
      .collect().head
    assert(dogTop.getString(0) == "c1" && dogTop.getInt(1) == 1 &&
      dogTop.getLong(2) == 2L)

    // idempotent: nothing new to index
    val snapBefore = index.currentSnapshot.get.snapshotId
    assert(SearchIndex.refresh(spark, main, index).isEmpty)
    assert(index.currentSnapshot.get.snapshotId == snapBefore)
  }

  test("query IO is pruned to the query terms' buckets") {
    val main = new LakeTable(spark, TestSpark.tmpDir("si-prune-main"))
    val index = new LakeTable(spark, TestSpark.tmpDir("si-prune-index"))
    val rows = (0 until 200).map(i =>
      ("I", s"c$i", 0, s"word$i common shared text", i.toLong + 1))
    CdcApply.apply(main, batch(rows), epoch = 1, nBuckets = 4)
    SearchIndex.refresh(spark, main, index, nBuckets = 16)
    val snap = index.currentSnapshot.get
    val oneTermFiles = index.lookupFilesKeyed(Seq("word7")).map(_.path).toSet
    assert(oneTermFiles.nonEmpty, "term must be addressable")
    assert(oneTermFiles.size < snap.totalFiles,
      s"lookup opened ${oneTermFiles.size} of ${snap.totalFiles} files — no pruning")
    // and the pruned read still answers correctly
    assert(searched(index, Seq("word7")) == Set(("c7", 0, 1L)))
  }

  test("pipeline-maintained index equals a fresh full rebuild") {
    import graft.cdc.CdcDriver
    import graft.changelog.ChangelogGen
    val dir = TestSpark.tmpDir("si-pipe")
    val cl = s"$dir/changelog"
    ChangelogGen.write(spark, cl, ChangelogGen.Config(
      nEvents = 20000, nConvs = 120, skew = 1.1,
      evolveAt = 10000, segSize = 5000))
    val main = new LakeTable(spark, s"$dir/lake")
    val idx = new LakeTable(spark, s"$dir/idx")
    // per-batch maintenance: 4 segments, 1 per batch -> 4 refreshes
    new CdcDriver(spark, cl, main, segmentsPerBatch = 1, nBuckets = 8,
      quiet = true, searchIndex = Some(idx)).run()
    assert(SearchIndex.indexedSourceSnapshot(idx) ==
      main.currentSnapshot.get.snapshotId)
    // a fresh one-shot build over the final state must agree posting-for-
    // posting (per-batch incrementality loses nothing)
    val full = new LakeTable(spark, s"$dir/idx-full")
    SearchIndex.refresh(spark, main, full, nBuckets = 8)
    def postings(t: LakeTable): Set[(String, String, Int, Long)] =
      SearchIndex.resolvedPostings(t).collect()
        .map(r => (r.getString(0), r.getString(1), r.getInt(2),
          r.getAs[Number](3).longValue)).toSet
    assert(postings(idx) == postings(full))
    // re-replay: every batch fenced, index refresh no-ops, state unchanged
    val snapBefore = idx.currentSnapshot.get.snapshotId
    new CdcDriver(spark, cl, main, segmentsPerBatch = 1, nBuckets = 8,
      quiet = true, searchIndex = Some(idx)).run()
    assert(idx.currentSnapshot.get.snapshotId == snapBefore)
    // compaction folds the 4-refresh delta log into one resolved chain:
    // fewer files, identical logical content, identical search results
    val before = searched(idx, Seq("merge"))
    val filesBefore = idx.currentSnapshot.get.files.size
    assert(SearchIndex.compact(idx).isDefined)
    assert(idx.currentSnapshot.get.files.size < filesBefore)
    assert(postings(idx) == postings(full))
    assert(searched(idx, Seq("merge")) == before)
    // the epoch survives compaction, so the next refresh still fences
    assert(SearchIndex.refresh(spark, main, idx).isEmpty)
  }

  test("auto-compaction bounds the delta chain during a maintained replay") {
    import graft.cdc.CdcDriver
    import graft.changelog.ChangelogGen
    val dir = TestSpark.tmpDir("si-autocompact")
    val cl = s"$dir/changelog"
    ChangelogGen.write(spark, cl, ChangelogGen.Config(
      nEvents = 16000, nConvs = 80, skew = 1.1,
      evolveAt = -1, segSize = 2000))
    val main = new LakeTable(spark, s"$dir/lake")
    val idx = new LakeTable(spark, s"$dir/idx")
    // 8 segments, 1 per batch -> 8 refreshes; merge policy folds at chain 3,
    // so the LSM read amplification never exceeds the threshold (an
    // unmerged index would be at chain length 8 here and unbounded at 10^10).
    // keepSnapshots=2: superseded delta files reclaim as the policy runs
    // (keep=0 would retain every delta snapshot per the keep-all contract).
    new CdcDriver(spark, cl, main, segmentsPerBatch = 1, nBuckets = 8,
      quiet = true, searchIndex = Some(idx), indexCompactChain = 3,
      keepSnapshots = 2).run()
    assert(SearchIndex.maxChainLength(idx) <= 3,
      s"chain ${SearchIndex.maxChainLength(idx)} exceeds the merge threshold")
    assert(SearchIndex.indexedSourceSnapshot(idx) ==
      main.currentSnapshot.get.snapshotId)
    // superseded delta files were reclaimed, not just superseded
    assert(idx.snapshots.size <= 3, s"${idx.snapshots.size} snapshots retained")
    // logical content identical to a fresh one-shot build
    val full = new LakeTable(spark, s"$dir/idx-full")
    SearchIndex.refresh(spark, main, full, nBuckets = 8)
    def postings(t: LakeTable): Set[(String, String, Int, Long)] =
      SearchIndex.resolvedPostings(t).collect()
        .map(r => (r.getString(0), r.getString(1), r.getInt(2),
          r.getAs[Number](3).longValue)).toSet
    assert(postings(idx) == postings(full))
    // epoch fencing survives the interleaved maintenance commits
    assert(SearchIndex.refresh(spark, main, idx).isEmpty)
  }

  test("per-bucket compact rewrites only the chosen buckets") {
    val main = new LakeTable(spark, TestSpark.tmpDir("si-pb-main"))
    val idx = new LakeTable(spark, TestSpark.tmpDir("si-pb-idx"))
    CdcApply.apply(main, batch((0 until 60).map(i =>
      ("I", s"c$i", 0, s"alpha$i beta$i gamma$i", i.toLong + 1))),
      epoch = 1, nBuckets = 4)
    SearchIndex.refresh(spark, main, idx, nBuckets = 8)
    // one-document update: its few terms touch a strict subset of buckets,
    // so the second refresh leaves the other buckets at chain length 1
    CdcApply.apply(main, batch(Seq(
      ("U", "c5", 0, "delta5 beta5", 100L))), epoch = 2, nBuckets = 4)
    SearchIndex.refresh(spark, main, idx, nBuckets = 8)
    val before = idx.currentSnapshot.get.manifests
      .groupBy(_.bucket).view.mapValues(_.map(_.path).toSet).toMap
    val hot = before.collect { case (b, ps) if ps.size >= 2 => b }.toSet
    val cold = before.keySet -- hot
    assert(hot.nonEmpty && cold.nonEmpty, s"need both: hot=$hot cold=$cold")
    val posBefore = SearchIndex.resolvedPostings(idx).collect().toSet
    assert(SearchIndex.compact(idx, Some(hot)).isDefined)
    val after = idx.currentSnapshot.get.manifests
      .groupBy(_.bucket).view.mapValues(_.map(_.path).toSet).toMap
    // cold buckets: manifests carried by path, never rewritten
    cold.foreach(b => assert(after(b) == before(b),
      s"cold bucket $b was rewritten"))
    // hot buckets: folded to one fresh chain each
    hot.foreach { b =>
      assert(after.getOrElse(b, Set.empty).size <= 1, s"bucket $b not folded")
      assert((after.getOrElse(b, Set.empty) -- before(b)).size ==
        after.getOrElse(b, Set.empty).size, s"bucket $b kept old manifests")
    }
    assert(SearchIndex.resolvedPostings(idx).collect().toSet == posBefore)
  }

  test("stop list is fixed at creation, filters postings and queries") {
    val main = new LakeTable(spark, TestSpark.tmpDir("si-stop-main"))
    val index = new LakeTable(spark, TestSpark.tmpDir("si-stop-index"))
    CdcApply.apply(main, batch(Seq(
      ("I", "a", 0, "the quick fox", 1L),
      ("I", "b", 0, "the slow dog", 2L))), epoch = 1, nBuckets = 2)
    SearchIndex.refresh(spark, main, index, nBuckets = 4,
      stopTerms = Set("the"))
    // hot term carries no postings at all
    assert(SearchIndex.documentFrequencies(index).collect()
      .forall(_.getString(0) != "the"))
    // queries drop the stop term instead of AND-failing every document
    assert(searched(index, Seq("the", "fox")) == Set(("a", 0, 1L)))
    // all-stop / all-blank query = empty result, not an error
    assert(SearchIndex.search(spark, index, Seq("the", "  ")).collect().isEmpty)
    // query terms pass the same tokenization as indexing
    assert(searched(index, Seq("Fox!")) == Set(("a", 0, 1L)))
    // an update under the same persisted list stays consistent
    CdcApply.apply(main, batch(Seq(
      ("U", "a", 0, "the quick wolf", 5L))), epoch = 2, nBuckets = 2)
    SearchIndex.refresh(spark, main, index, nBuckets = 4)
    assert(searched(index, Seq("wolf")) == Set(("a", 0, 1L)))
    assert(searched(index, Seq("fox")).isEmpty)
    // changing the list after creation is refused loudly
    val e = intercept[IllegalArgumentException] {
      CdcApply.apply(main, batch(Seq(
        ("I", "c", 0, "another row", 9L))), epoch = 3, nBuckets = 2)
      SearchIndex.refresh(spark, main, index, nBuckets = 4,
        stopTerms = Set("quick"))
    }
    assert(e.getMessage.contains("stop list"))
  }

  test("document frequencies surface hot terms") {
    val main = new LakeTable(spark, TestSpark.tmpDir("si-df-main"))
    val index = new LakeTable(spark, TestSpark.tmpDir("si-df-index"))
    CdcApply.apply(main, batch(Seq(
      ("I", "a", 0, "x common", 1L),
      ("I", "b", 0, "y common", 2L),
      ("I", "c", 0, "z common common", 3L))), epoch = 1, nBuckets = 2)
    SearchIndex.refresh(spark, main, index, nBuckets = 4)
    val dfs = SearchIndex.documentFrequencies(index).collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(dfs("common") == 3 && dfs("x") == 1)
  }
}
