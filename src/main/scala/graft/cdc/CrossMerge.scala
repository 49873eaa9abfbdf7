package graft.cdc

import org.apache.spark.sql.functions._

import graft.lake.LakeTable

/**
 * Cross-entity migration merge as a lake-to-lake engine operation — the
 * reference's merge-user-courses job (MergeOperations.scala:49: migrate
 * only the batches missing from the target = anti-join;
 * MergeOperations.scala:78-99 + Commons.scala:76-118: field-level merge for
 * colliding rows), restated over the transcript lake: merge conversation
 * `from` into conversation `to`.
 *
 * Semantics per (from, to) pair:
 *  - turns present only in `from` migrate to `to` (anti-join inserts),
 *  - colliding turns keep the image with the higher original lsn
 *    (the LWW analogue of the reference's max-merge combiner),
 *  - all `from` turns are deleted.
 *
 * The whole operation is ONE synthesized change batch applied through
 * CdcApply under the caller's epoch — so exactly-once fencing, change-feed
 * accounting, quarantine, derived-table maintenance (via touchedSet) and
 * time travel all hold for migrations exactly as for source batches. Reads
 * are bucket-pruned to the conversations' buckets (point-read shape).
 */
object CrossMerge {

  /** Merge each (from, to) conversation pair; `from` conversations are
    * consumed. Pairs must not chain within one call (a conv may appear on
    * only one side). Applied as a MAINTENANCE operation: the commit keeps
    * the current epoch, so migrations never consume source-epoch space
    * (an epoch bump here would silently fence the next changelog segment
    * or streaming batch — permanent data loss). Re-running the same
    * migration is a no-op (the source is already consumed).
    *
    * Concurrency: if a source applier commits while the migration is in
    * flight, the maintenance apply surfaces a [[graft.lake.CommitConflictException]]
    * — the migration batch is then RECOMPUTED from the winner's state and
    * re-applied (the migration either lands on current state or, after
    * `maxAttempts` lost races, fails loudly; it is never silently dropped —
    * the reference applies every missing batch exactly once,
    * lms-jobs/merge-user-courses/.../MergeOperations.scala:49). */
  def mergeConversations(
      lake: LakeTable,
      pairs: Seq[(String, String)],
      maxAttempts: Int = 5): CdcApply.ApplyStats = {
    var last: graft.lake.CommitConflictException = null
    var attempt = 0
    while (attempt < maxAttempts) {
      attempt += 1
      try return mergeOnce(lake, pairs)
      catch { case e: graft.lake.CommitConflictException => last = e }
    }
    throw new graft.lake.CommitConflictException(
      s"migration lost $maxAttempts commit races: ${last.getMessage}")
  }

  private def mergeOnce(
      lake: LakeTable,
      pairs: Seq[(String, String)]): CdcApply.ApplyStats = {
    require(pairs.nonEmpty, "no pairs to merge")
    val froms = pairs.map(_._1).toSet
    val tos = pairs.map(_._2).toSet
    require(froms.intersect(tos).isEmpty && froms.size == pairs.size,
      "pairs must not chain or repeat a source within one merge batch")
    val spark = lake.spark
    import spark.implicits._

    val snap = lake.currentSnapshot.getOrElse(
      throw new IllegalStateException("cannot migrate in an empty lake"))
    require(snap.keySpec == graft.model.Schemas.KeySpec.transcripts,
      s"CrossMerge migrates transcript-keyed tables; this lake is keyed " +
      s"${snap.keySpec}")
    val nB = snap.nBuckets
    val buckets = pairs.flatMap { case (f, t) =>
      Seq(LakeTable.bucketOfValue(f, nB), LakeTable.bucketOfValue(t, nB))
    }.toSet
    val state0 = lake.readBuckets(Some(buckets))
    // MoR chains hold superseded versions: resolve LWW winners first, or
    // the migration would synthesize upserts from stale images (and hand
    // several versions of one turn the same synthetic lsn).
    val state =
      if (snap.mor && state0.columns.contains("_lsn"))
        graft.plans.LwwResolve.resolve(state0, snap.keySpec, nB,
          spark.sessionState.conf.numShufflePartitions)
      else state0
    val live =
      if (state.columns.contains("_tombstone"))
        state.filter(!col("_tombstone")).drop("_tombstone")
      else state

    val pairDf = broadcast(pairs.zipWithIndex
      .map { case ((f, t), i) => (f, t, i) }
      .toDF("_mg_from", "_mg_to", "_mg_idx"))
    val fromRows = live.join(pairDf, col("conv_id") === col("_mg_from"))
    // re-running a finished migration (sources already consumed) is a
    // no-op — don't rewrite the target buckets for nothing
    if (fromRows.limit(1).isEmpty)
      return CdcApply.ApplyStats(snap, skipped = true, 0, 0, 0, 0.0)
    val toLsn = live.join(pairDf, col("conv_id") === col("_mg_to"))
      .select(col("_mg_from").as("_c_from"), col("turn_idx").as("_c_turn"),
        col("_lsn").as("_c_lsn"))

    // winner election per target turn: the from-image migrates iff the
    // target lacks the turn or holds an older image
    val migrating = fromRows.join(toLsn,
        col("_mg_from") === col("_c_from") &&
          col("turn_idx") === col("_c_turn"), "left")
      .filter(col("_c_lsn").isNull || col("_lsn") > col("_c_lsn"))

    val dataCols = live.columns.toSeq
      .filterNot(Set("conv_id", "_lsn", "_src_part", "_src_off",
        "_mg_from", "_mg_to", "_c_from", "_c_turn", "_c_lsn"))
    // Synthesized lsn base: above every STORED lsn of the touched
    // conversations INCLUDING tombstones — a stale delete with a high lsn
    // must not beat the (explicit, administrative) migration. Per-pair
    // offset keeps multi-source merges into one target deterministic:
    // later pairs in the caller's list win colliding turns.
    val maxLsnRow = state.join(pairDf,
        col("conv_id") === col("_mg_from") || col("conv_id") === col("_mg_to"))
      .agg(max("_lsn")).head()
    val synthBase = (if (maxLsnRow.isNullAt(0)) 0L else maxLsnRow.getLong(0)) + 1

    val upserts = migrating.select(
      (Seq(lit("U").as("op"), col("_mg_to").as("conv_id"),
        col("_mg_idx")) ++ dataCols.map(col)): _*)
    val deletes = fromRows.select(
      (Seq(lit("D").as("op"), col("conv_id"), col("_mg_idx")) ++
        dataCols.map(col)): _*)
    val batch = upserts.unionByName(deletes)
      .withColumn("_lsn", lit(synthBase) + col("_mg_idx"))
      .withColumn("_src_part", lit(-1)) // engine-synthesized, not source data
      .withColumn("_src_off", lit(synthBase) + col("_mg_idx"))
      .drop("_mg_idx")

    // Synthesized-batch size: one bucket-pruned count so ApplyStats.rowsIn /
    // eventsPerSec report the migration's real row volume (admin op — the
    // extra small job is fine). Lineage covers the synthesized lsn range
    // [synthBase, synthBase + pairs.size - 1] (per-pair offsets 0..size-1).
    val nBatch = batch.count()
    // every batch row's conv_id is one of the pair convs, whose buckets
    // are exactly `buckets` — provably complete hint
    CdcApply.apply(lake, batch, epoch = snap.epoch, nBuckets = nB,
      maintenance = true, validate = false,
      probeInfo = Some(CdcApply.ProbeInfo(nBatch,
        Seq(graft.lake.PartitionLineage(-1, synthBase,
          synthBase + pairs.size - 1)))),
      touchedHint = Some(buckets))
  }
}
