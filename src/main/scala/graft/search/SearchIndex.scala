package graft.search

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.cdc.CdcApply
import graft.lake.{ChangeFeedReader, LakeTable}
import graft.model.Schemas

/**
 * Incrementally-maintained inverted text index over a transcript lake — the
 * Spark-native restatement of the reference's secondary search index
 * (reference S11: every entity update is mirrored into Elasticsearch from
 * the same stream, jobs-core ElasticSearchUtil.scala:62-106
 * addDocument/updateDocument; e.g. user-ownership-transfer updates the user
 * search doc per event, UserOwnershipTransferFunction.scala). Instead of a
 * remote search cluster, the index IS a second LakeTable of postings
 *
 *   postings(term string, conv_id string, turn_idx int, tf int)
 *   KeySpec(bucketCols = [term], keyCols = [term, conv_id, turn_idx])
 *
 * maintained through the SAME epoch-fenced exactly-once MERGE as every other
 * table, so fencing, kill/resume, time travel, compaction and GC all hold
 * for the index with no new machinery.
 *
 * Incrementality: a refresh reads the source lake's snapshot-diff change
 * feed WITH before/after text images (ChangeFeedReader `imageCols` — the
 * Debezium before/after envelope) and synthesizes a posting changelog:
 * the old image's terms are retracted (op=D at lsn 2e), the new image's
 * terms upserted (op=U at lsn 2e+1, so a term present in both old and new
 * deterministically survives with the new tf). Cost is O(changed rows'
 * text), never a corpus rescan; the index epoch encodes the last indexed
 * source snapshot, so a replayed refresh is fenced exactly like a replayed
 * source batch.
 *
 * Scale shape: postings are hash-bucketed by term, so a query reads ONLY
 * the buckets (and, via per-file min/max term stats, only the files) of its
 * query terms — O(query) IO on a 100 TB corpus, the point-read pattern the
 * reference gets from ES. Hot terms ("the") skew their bucket; production
 * indexes drop them with a stop list derived from [[documentFrequencies]]
 * (fixed at index creation so retract/assert stay symmetric across
 * refreshes), the same way DedupOps caps hot shingles.
 */
object SearchIndex {

  /** Posting-table key contract: one row per (term, document key). */
  val postingKeys: Schemas.KeySpec =
    Schemas.KeySpec(Seq("term"), Seq("term", "conv_id", "turn_idx"))

  /** Search terms of a text column: non-empty words of the normalized form
    * (lowercase, punctuation stripped — TextFunctions.normalized, so the
    * index and the exact-dedup/fingerprint surface agree on tokenization). */
  def terms(text: Column): Column =
    filter(split(graft.functions.TextFunctions.normalized(text), " "),
      t => length(t) > 0)

  /** (term, conv_id, turn_idx, tf) postings of live rows. */
  private def postings(rows: DataFrame, textCol: String): DataFrame =
    rows.select(col("conv_id"), col("turn_idx"),
        explode(terms(col(textCol))).as("term"))
      .groupBy("term", "conv_id", "turn_idx")
      .agg(count(lit(1)).cast("int").as("tf"))

  /** The source snapshot id the index has indexed through (-1 = nothing).
    * Encoded in the index lake's epoch (epoch = source snapshot id + 2, so
    * epochs stay strictly positive and monotone with source commits). */
  def indexedSourceSnapshot(index: LakeTable): Long =
    index.currentSnapshot.map(_.epoch - 2).getOrElse(-1L)

  final case class RefreshStats(
      fromSourceSnapshot: Long,
      toSourceSnapshot: Long,
      changedRows: Long,
      apply: CdcApply.ApplyStats)

  /** The index's persisted stop list ("the"-grade hot terms excluded from
    * indexing — they skew their term bucket and poison AND-query pruning at
    * corpus scale, the same hot-key problem DedupOps caps with dfCap). The
    * list is FIXED at index creation and stored beside the index so every
    * later refresh retracts and asserts under the same term set — a
    * refresh-to-refresh change would strand old postings of newly-stopped
    * terms. Derive candidates from [[documentFrequencies]] on a built
    * index, then rebuild with the chosen list. */
  def stopList(index: LakeTable): Set[String] = {
    val f = s"${index.root}/stoplist.txt"
    if (!graft.lake.LakeIO.exists(f)) Set.empty
    else new String(graft.lake.LakeIO.readBytes(f), "UTF-8")
      .split("\n").map(_.trim).filter(_.nonEmpty).toSet
  }

  private def persistStopList(index: LakeTable, terms: Set[String]): Unit =
    if (terms.nonEmpty) {
      graft.lake.LakeIO.mkdirs(index.root)
      graft.lake.LakeIO.publishExclusive(s"${index.root}/stoplist.txt",
        terms.toSeq.sorted.mkString("\n").getBytes("UTF-8"))
    }

  /** Bring the index up to date with `source`'s current snapshot. A fresh
    * index does a full build through the same code path (diff against the
    * empty table = everything inserted). Idempotent: a refresh against an
    * already-indexed snapshot is epoch-fenced into a no-op. `textCol` must
    * be a string column of the source table. */
  def refresh(
      spark: SparkSession,
      source: LakeTable,
      index: LakeTable,
      textCol: String = "text",
      nBuckets: Int = 64,
      /** hot terms to exclude; honored on the FIRST build and persisted —
        * later refreshes always use the persisted list (see [[stopList]]) */
      stopTerms: Set[String] = Set.empty): Option[RefreshStats] = {
    val srcSnap = source.currentSnapshot.getOrElse(return None)
    val stored = stopList(index)
    val stop =
      if (index.currentSnapshot.isEmpty) { // first build fixes the list
        persistStopList(index, stopTerms)
        // publishExclusive never overwrites: if a crashed first build
        // already persisted a DIFFERENT list, surface it instead of
        // silently indexing under the in-memory one
        val effective = stopList(index)
        require(stopTerms.isEmpty || effective == stopTerms,
          s"index ${index.root} already carries stop list $effective from " +
          "an earlier (crashed) build; pass that list or clear the " +
          "directory to change it")
        effective
      } else {
        require(stopTerms.isEmpty || stopTerms == stored,
          s"index ${index.root} was built with stop list $stored; a " +
          "different list would strand old postings — rebuild the index " +
          "to change it")
        stored
      }
    require(srcSnap.keySpec == Schemas.KeySpec.transcripts,
      s"SearchIndex indexes transcript-keyed tables; this lake is keyed " +
      s"${srcSnap.keySpec}")
    val from = indexedSourceSnapshot(index)
    if (from >= srcSnap.snapshotId) return None // already current
    require(source.snapshots.exists(s => s.snapshotId == from) || from < 0,
      s"index is at source snapshot $from which has been expired from " +
      s"${source.root}; rebuild the index (drop its directory) or expire " +
      "less aggressively")

    val feed = ChangeFeedReader.between(spark, source, from,
      srcSnap.snapshotId, imageCols = Seq(textCol))
    // The posting changelog. LSNs: retractions at 2e, assertions at 2e+1
    // (e = this refresh's index epoch) — monotone across refreshes and
    // within one refresh the new image's postings win LWW over the
    // retraction of a term the row still contains.
    val epoch = srcSnap.snapshotId + 2
    def dropStop(df: DataFrame): DataFrame =
      if (stop.isEmpty) df
      else df.filter(!col("term").isin(stop.toSeq: _*))
    val retract = dropStop(postings(
      feed.filter(col(s"pre_$textCol").isNotNull), s"pre_$textCol"))
      .withColumn("op", lit(Schemas.OpDelete))
      .withColumn("_lsn", lit(epoch * 2))
    val assert_ = dropStop(postings(
      feed.filter(col("action") =!= "deleted" &&
        col(s"post_$textCol").isNotNull), s"post_$textCol"))
      .withColumn("op", lit(Schemas.OpUpdate))
      .withColumn("_lsn", lit(epoch * 2 + 1))
    val batch = retract.unionByName(assert_)
      .withColumn("_src_part", lit(0))
      .withColumn("_src_off", col("_lsn"))

    val stats = CdcApply.apply(index, batch, epoch, nBuckets = nBuckets,
      keys = postingKeys)
    Some(RefreshStats(from, srcSnap.snapshotId, stats.rowsIn, stats))
  }

  /** AND-semantics term search against the index: documents containing ALL
    * `queryTerms`, ranked by total term frequency (ties by key). IO is
    * pruned to the query terms' buckets AND, through the per-file
    * [minKey, maxKey] term stats, to the files whose term range covers a
    * query term — the lake-native analogue of an ES term query. */
  def search(
      spark: SparkSession,
      index: LakeTable,
      queryTerms: Seq[String],
      topK: Int = 10): DataFrame = {
    val emptyResult = {
      import org.apache.spark.sql.types._
      spark.createDataFrame(
        spark.sparkContext.emptyRDD[org.apache.spark.sql.Row],
        StructType(Seq(StructField("conv_id", StringType),
          StructField("turn_idx", IntegerType),
          StructField("score", LongType))))
    }
    val snap = index.currentSnapshot.getOrElse(return emptyResult)
    // Query terms MUST pass the same tokenization the index used
    // (TextFunctions.normalized: lowercase, non-alphanumerics to spaces) —
    // "Fox!" has to find the posting stored as "fox", and "don't" has to
    // become the two indexed terms "don"/"t". Stop-listed terms carry no
    // postings: drop them from the query (standard search-engine behavior),
    // and an all-stop/all-blank query is an empty result, not an error.
    val stop = stopList(index)
    val wanted = queryTerms
      .flatMap(_.toLowerCase.replaceAll("[^a-z0-9\\s]", " ").split("\\s+"))
      .distinct.filter(t => t.nonEmpty && !stop.contains(t))
    if (wanted.isEmpty) return emptyResult
    val files = wanted.flatMap(t => index.lookupFilesKeyed(Seq(t)))
      .map(_.path).distinct
    val base =
      if (files.isEmpty)
        spark.createDataFrame(
          spark.sparkContext.emptyRDD[org.apache.spark.sql.Row], snap.schema)
      else spark.read.schema(snap.schema).parquet(files: _*)
    val live = (if (base.columns.contains("_tombstone"))
      base.filter(!col("_tombstone")) else base)
      .filter(col("term").isin(wanted: _*))
    live.groupBy("conv_id", "turn_idx")
      .agg(count(lit(1)).as("_nterms"), sum(col("tf")).as("score"))
      .filter(col("_nterms") === wanted.size) // postings are unique per term
      .select(col("conv_id"), col("turn_idx"), col("score"))
      .orderBy(col("score").desc, col("conv_id"), col("turn_idx"))
      .limit(topK)
  }

  /** Per-term document frequency from the index (for stop-listing hot terms
    * or IDF weighting) — a metadata-light aggregate over the postings. */
  def documentFrequencies(index: LakeTable): DataFrame =
    index.read().groupBy("term").agg(count(lit(1)).as("df"))
}
