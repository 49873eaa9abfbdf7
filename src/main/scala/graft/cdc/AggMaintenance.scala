package graft.cdc

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

import graft.lake.LakeTable

/**
 * Incrementally-maintained derived aggregate table — the reference's
 * flagship business logic (ActivityAggregatesFunction.scala:55-119: per
 * window batch, recompute each touched enrolment's aggregates from state
 * and upsert them, including map-valued agg columns,
 * test.cql:32-41 `agg map<text,int>`) restated on the same MERGE primitive:
 *
 *   conv_agg(conv_id, n_turns, n_tool_turns, role_counts: map<string,int>,
 *            max_turn_idx, last_lsn)
 *
 * After each transcript batch is applied, the aggregates of every
 * conversation in the TOUCHED buckets are recomputed from lake state
 * (bucket-pruned read — the reference's batched `SELECT ... IN` shape) and
 * upserted into a second LakeTable through CdcApply itself: the agg rows
 * are synthesized as change events keyed (conv_id, turn_idx=0) with
 * lsn = epoch, so exactly-once, fencing, kill/resume and time travel all
 * hold for the derived table for free.
 *
 * Scale design: the derived table is bucketed by the SAME hash function and
 * bucket count as the main lake, so a main-table bucket id selects exactly
 * the agg files holding those conversations — per-batch maintenance cost
 * (including delete detection) is O(touched buckets) on BOTH tables, never
 * a full scan of the derived table. Conversations whose turns all
 * disappeared become delete events (tombstoned in the agg table).
 */
object AggMaintenance {

  /** Recompute aggregates for all conversations in main-table `buckets` of
    * `mainLake` and upsert them into `aggLake` under `epoch`. A new aggLake
    * is seeded with the main lake's bucket count (alignment gives pruned
    * delete detection); an existing aggLake keeps its own count — if that
    * count differs from the main lake's (e.g. after Compaction.rebucket of
    * either table), delete detection falls back to a full agg-table read. */
  def maintain(
      spark: SparkSession,
      mainLake: LakeTable,
      aggLake: LakeTable,
      buckets: Set[Int],
      epoch: Long,
      /** refresh after an epoch-NEUTRAL main-table change (CrossMerge):
        * the agg table is already at `epoch`, so the upsert must commit as
        * maintenance (same epoch, next snapshot) instead of fencing out. */
      maintenance: Boolean = false): CdcApply.ApplyStats = {
    mainLake.currentSnapshot.foreach(s =>
      require(s.keySpec == graft.model.Schemas.KeySpec.transcripts,
        s"conv_agg maintenance aggregates transcript-keyed tables; this " +
        s"lake is keyed ${s.keySpec}"))
    val mainBuckets = mainLake.currentSnapshot.map(_.nBuckets).getOrElse(64)
    val state0 = mainLake.readBuckets(Some(buckets))
    // MoR main lake: the touched buckets hold multi-version chains; resolve
    // LWW winners before aggregating or superseded versions double-count.
    val state = mainLake.currentSnapshot match {
      case Some(s) if s.mor && state0.columns.contains("_lsn") =>
        graft.plans.LwwResolve.resolve(state0, s.keySpec, s.nBuckets,
          spark.sessionState.conf.numShufflePartitions)
      case _ => state0
    }
    val live = if (state.columns.contains("_tombstone"))
      state.filter(!col("_tombstone")) else state

    val perConv = live.groupBy("conv_id").agg(
      count(lit(1)).cast("int").as("n_turns"),
      count(when(col("role") === "tool", 1)).cast("int").as("n_tool_turns"),
      max(col("turn_idx")).as("max_turn_idx"),
      max(col("_lsn")).as("last_lsn"))
    // role_counts as a real map<string,int> (reference: agg map<text,int>)
    val roleCounts = live.groupBy("conv_id", "role")
      .agg(count(lit(1)).cast("int").as("n"))
      .groupBy("conv_id")
      .agg(map_from_entries(
        sort_array(collect_list(struct(col("role"), col("n"))))).as("role_counts"))
    val upserts = perConv.join(roleCounts, "conv_id")

    // Agg rows for touched-bucket conversations that no longer have any live
    // turn -> deletes. Only touched buckets can have changed, and when the
    // agg table shares the main bucket scheme the read prunes to exactly the
    // touched buckets' files (the fix for the round-1 full-scan finding).
    val aggNB = aggLake.currentSnapshot.map(_.nBuckets)
    val deletedConvs = aggNB match {
      case None => None // empty agg table: nothing to delete
      case Some(n) =>
        val existing =
          if (n == mainBuckets) aggLake.readBuckets(Some(buckets))
          else aggLake.readBuckets(None) // bucket schemes diverged: full read
        val liveAgg =
          if (existing.columns.contains("_tombstone"))
            existing.filter(!col("_tombstone"))
          else existing
        Some(liveAgg
          .select(col("conv_id"))
          .filter(CdcApply.bucketOf(col("conv_id"), mainBuckets)
            .isin(buckets.toSeq.map(Integer.valueOf): _*))
          .join(upserts.select("conv_id"), Seq("conv_id"), "left_anti"))
    }

    val evUpserts = upserts
      .withColumn("op", lit("U"))
      .withColumn("turn_idx", lit(0))
    val batch0 = deletedConvs match {
      case None => evUpserts
      case Some(dc) =>
        evUpserts.unionByName(
          dc.withColumn("op", lit("D")).withColumn("turn_idx", lit(0)),
          allowMissingColumns = true)
    }
    // Synthesized agg-row lsn: (epoch << 16) + next agg snapshot id.
    // The sub-epoch component matters for EPOCH-NEUTRAL refreshes (after a
    // CrossMerge migration): a refresh reusing the bare epoch would TIE
    // with the previous refresh's rows at the same epoch, and LWW's
    // stored-row tie-break would discard the new images/tombstones.
    // Monotonic across refreshes: epoch never decreases, and the agg
    // snapshot id strictly increases with every commit.
    val rowLsn = epoch * 65536L +
      aggLake.currentSnapshot.map(_.snapshotId + 1).getOrElse(0L)
    val batch = batch0
      .withColumn("_lsn", lit(rowLsn))
      .withColumn("_src_part", lit(0))
      .withColumn("_src_off", lit(rowLsn))

    // The batch is engine-synthesized above (keys from lake state, ops
    // literal): skip the validation count, hand the lineage over directly,
    // and — when the bucket schemes are aligned — hand over the touched
    // buckets too (every batch conv comes from main buckets `buckets`, and
    // alignment makes its agg bucket the same id). Saves three Spark jobs
    // per maintained micro-batch vs routing through the generic probes.
    val hint = if (aggNB.forall(_ == mainBuckets)) Some(buckets) else None
    // a lagging agg table (crash window) still heals through the normal
    // epoch-advancing path even when the caller asked for maintenance
    val aggEpoch = aggLake.currentSnapshot.map(_.epoch).getOrElse(0L)
    CdcApply.apply(aggLake, batch, epoch, nBuckets = mainBuckets,
      probeInfo = Some(CdcApply.ProbeInfo(0L,
        Seq(graft.lake.PartitionLineage(0, epoch, epoch)))),
      validate = false, touchedHint = hint,
      maintenance = maintenance && aggEpoch == epoch)
  }

  /** Reconcile a derived table that lags the main lake: a crash between the
    * main commit and `maintain` (or attaching a fresh/late agg table) leaves
    * aggEpoch < mainEpoch while the replayed main batch fences — so the
    * missed buckets are recovered from the lake commit log itself (files
    * that appeared in snapshots after aggEpoch). If the main table was
    * re-bucketed anywhere in the missed range, old-space bucket ids no
    * longer address current buckets — fall back to maintaining ALL current
    * buckets rather than silently missing conversations. */
  def catchUp(
      spark: SparkSession, mainLake: LakeTable, aggLake: LakeTable): Unit = {
    val mainSnap = mainLake.currentSnapshot.getOrElse(return)
    val aggEpoch = aggLake.currentSnapshot.map(_.epoch).getOrElse(0L)
    if (aggEpoch >= mainSnap.epoch) return
    val missedBuckets = Derived.missedBuckets(mainLake, aggEpoch)
    if (missedBuckets.nonEmpty)
      maintain(spark, mainLake, aggLake, missedBuckets, mainSnap.epoch)
    ()
  }
}
