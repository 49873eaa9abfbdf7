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
 * hold for the derived table for free. Conversations whose turns all
 * disappeared become delete events (tombstoned in the agg table).
 */
object AggMaintenance {

  /** Recompute aggregates for all conversations in `buckets` of `mainLake`
    * and upsert them into `aggLake` under `epoch`. */
  def maintain(
      spark: SparkSession,
      mainLake: LakeTable,
      aggLake: LakeTable,
      buckets: Set[Int],
      epoch: Long,
      nBuckets: Int = 16): CdcApply.ApplyStats = {
    val mainBuckets = mainLake.currentSnapshot.map(_.nBuckets).getOrElse(64)
    val state = mainLake.readBuckets(Some(buckets))
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

    // agg rows for touched-bucket conversations that no longer have any live
    // turn -> deletes (only touched buckets can have changed)
    val deletedConvs = aggLake.currentSnapshot match {
      case None => None
      case Some(_) =>
        Some(aggLake.read()
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
    val batch = batch0
      .withColumn("_lsn", lit(epoch))
      .withColumn("_src_part", lit(0))
      .withColumn("_src_off", lit(epoch))

    CdcApply.apply(aggLake, batch, epoch, nBuckets)
  }
}
