package graft.cdc

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

import graft.lake.{LakeIO, LakeTable}

/**
 * Generalized incrementally-maintained MATERIALIZED VIEW: any set of Spark
 * SQL aggregate expressions grouped by the main table's bucket key, kept
 * in sync per batch at O(touched buckets) — the fourth derived-table shape
 * next to the fixed-schema aggregate table (AggMaintenance, which this
 * generalizes), the inverted search index, and the row-level replica. The
 * reference hand-writes one Flink job per derived aggregate
 * (ActivityAggregatesFunction, AssessmentAggregator, …); here a view is
 * DECLARED as `name=aggExpr` pairs and the engine owns the maintenance.
 *
 * Grouping is pinned to the main table's bucket columns: a group's rows
 * all live in one main bucket, so recomputing the groups of the TOUCHED
 * buckets from bucket-pruned state is exact — never a full scan, and
 * delete detection (groups whose last row vanished) prunes the same way
 * because the view table shares the main table's hash layout (bucket
 * count seeded at creation; a later divergence via rebucket of either
 * table falls back to a full view read, like AggMaintenance).
 *
 * The agg list is the view's CONTRACT: persisted beside the table at
 * creation (matview-config.json, exclusive publish), parsed eagerly so a
 * typo fails at declaration, and refused if a later refresh passes a
 * different list (silently switching aggregates would leave stale columns
 * no refresh ever recomputes). Exactly-once/fencing/kill-resume hold
 * because maintenance rides the normal epoch-fenced MERGE with the same
 * sub-epoch lsn discipline as AggMaintenance.
 */
object MatView {

  final case class AggCol(name: String, expr: String)
  final case class Config(aggs: Seq[AggCol])

  private val mapper = new com.fasterxml.jackson.databind.ObjectMapper()
    .registerModule(com.fasterxml.jackson.module.scala.DefaultScalaModule)

  private def configPath(view: LakeTable): String =
    s"${view.root}/meta/matview-config.json"
  private def cursorPath(view: LakeTable): String =
    s"${view.root}/meta/matview-cursor.json"

  /** Last main-table SNAPSHOT id this view has folded. Snapshot-based (not
    * epoch-based) so catch-up also sees EPOCH-NEUTRAL main mutations — DML
    * merges, CrossMerge migrations, rollbacks — which the epoch cursor of
    * the fixed agg table misses until the next source batch. */
  def syncedMainSnapshot(view: LakeTable): Option[Long] = {
    val p = cursorPath(view)
    if (!LakeIO.exists(p)) None
    else Some(mapper.readTree(LakeIO.readBytes(p)).get("mainSnapshotId").asLong)
  }

  private def persistCursor(view: LakeTable, mainSnapshotId: Long): Unit =
    LakeIO.writeBytes(cursorPath(view),
      mapper.writeValueAsBytes(Map("mainSnapshotId" -> mainSnapshotId)))

  /** The persisted view contract, None before the first maintenance. */
  def config(view: LakeTable): Option[Config] = {
    val p = configPath(view)
    if (!LakeIO.exists(p)) None
    else Some(mapper.readValue(LakeIO.readBytes(p), classOf[Config]))
  }

  private def persistConfig(spark: SparkSession, view: LakeTable,
                            cfg: Config): Config = {
    require(cfg.aggs.nonEmpty, "a materialized view needs at least one " +
      "aggregate column (name=aggExpr)")
    val names = cfg.aggs.map(_.name)
    require(names.distinct == names, s"duplicate view column in $names")
    // parse NOW: a typo must fail at declaration, not inside maintenance
    // (functions.expr is lazy in the unified-Column API — use the parser)
    cfg.aggs.foreach(a => spark.sessionState.sqlParser.parseExpression(a.expr))
    LakeIO.mkdirs(s"${view.root}/meta")
    if (!LakeIO.publishExclusive(configPath(view),
        mapper.writeValueAsBytes(cfg)))
      config(view).getOrElse(
        throw new IllegalStateException("concurrent view creation raced"))
    else cfg
  }

  /** Recompute the view rows of all groups in main-table `buckets` and
    * upsert them into `viewLake` under `epoch`; groups with no remaining
    * live row become deletes. `aggs` declares a NEW view's contract; an
    * existing view's persisted contract is authoritative and a differing
    * `aggs` is refused. */
  def maintain(
      spark: SparkSession,
      mainLake: LakeTable,
      viewLake: LakeTable,
      buckets: Set[Int],
      epoch: Long,
      maintenance: Boolean = false,
      aggs: Option[Config] = None): CdcApply.ApplyStats = {
    val mainSnap = mainLake.currentSnapshot.getOrElse(
      throw new IllegalStateException(
        s"${mainLake.root} has no snapshot — nothing to maintain from"))
    val groupCols = mainSnap.keySpec.bucketCols
    val cfg = config(viewLake) match {
      case Some(stored) =>
        aggs.filter(_ != stored).foreach { a =>
          throw new IllegalArgumentException(
            s"view contract mismatch: stored ${stored.aggs}, passed " +
            s"${a.aggs} — a view's aggregate list is fixed at creation")
        }
        stored
      case None => persistConfig(spark, viewLake, aggs.getOrElse(
        throw new IllegalArgumentException(
          s"${viewLake.root} is a new view: pass its aggregate list")))
    }
    require(!cfg.aggs.exists(a => groupCols.contains(a.name)),
      s"agg column names collide with group key $groupCols")

    val mainBuckets = mainSnap.nBuckets
    val state0 = mainLake.readBuckets(Some(buckets))
    val state =
      if (mainSnap.mor && state0.columns.contains("_lsn"))
        graft.plans.LwwResolve.resolve(state0, mainSnap.keySpec, mainBuckets,
          spark.sessionState.conf.numShufflePartitions)
      else state0
    val live = if (state.columns.contains("_tombstone"))
      state.filter(!col("_tombstone")) else state

    val upserts = live.groupBy(groupCols.map(col): _*)
      .agg(expr(cfg.aggs.head.expr).as(cfg.aggs.head.name),
        cfg.aggs.tail.map(a => expr(a.expr).as(a.name)): _*)

    // groups in the touched buckets whose every live row vanished → deletes
    val viewNB = viewLake.currentSnapshot.map(_.nBuckets)
    val deleted = viewNB match {
      case None => None // empty view: nothing to delete
      case Some(n) =>
        val existing =
          if (n == mainBuckets) viewLake.readBuckets(Some(buckets))
          else viewLake.readBuckets(None) // layouts diverged: full read
        val liveView =
          if (existing.columns.contains("_tombstone"))
            existing.filter(!col("_tombstone"))
          else existing
        Some(liveView
          .select(groupCols.map(col): _*)
          .filter(CdcApply.bucketOfCols(groupCols.map(col), mainBuckets)
            .isin(buckets.toSeq.map(Integer.valueOf): _*))
          .join(upserts.select(groupCols.map(col): _*), groupCols, "left_anti"))
    }

    val evUpserts = upserts.withColumn("op", lit("U"))
    val batch0 = deleted match {
      case None => evUpserts
      case Some(d) =>
        evUpserts.unionByName(d.withColumn("op", lit("D")),
          allowMissingColumns = true)
    }
    // sub-epoch lsn, monotone across refreshes (see AggMaintenance): an
    // epoch-neutral refresh must not TIE with the previous refresh's rows
    val rowLsn = epoch * 65536L +
      viewLake.currentSnapshot.map(_.snapshotId + 1).getOrElse(0L)
    val batch = batch0
      .withColumn("_lsn", lit(rowLsn))
      .withColumn("_src_part", lit(0))
      .withColumn("_src_off", lit(rowLsn))

    val hint = if (viewNB.forall(_ == mainBuckets)) Some(buckets) else None
    val viewEpoch = viewLake.currentSnapshot.map(_.epoch).getOrElse(0L)
    val stats = CdcApply.apply(viewLake, batch, epoch, nBuckets = mainBuckets,
      probeInfo = Some(CdcApply.ProbeInfo(0L,
        Seq(graft.lake.PartitionLineage(0, epoch, epoch)))),
      validate = false, touchedHint = hint,
      maintenance = maintenance && viewEpoch == epoch,
      keys = graft.model.Schemas.KeySpec(groupCols, groupCols))
    // record the main snapshot whose state this refresh folded — a crash
    // between the view commit and the cursor write only re-folds the same
    // groups next time (idempotent)
    persistCursor(viewLake, mainSnap.snapshotId)
    stats
  }

  /** Reconcile a view that lags the main lake: heals the crash window,
    * backfills a view attached after the fact, and — because the cursor is
    * snapshot-based — also folds EPOCH-NEUTRAL main mutations (DML,
    * migrations, rollforward compaction rebases) that epoch-cursored
    * derived tables only pick up with explicit coupling. */
  def catchUp(spark: SparkSession, mainLake: LakeTable, viewLake: LakeTable,
              aggs: Option[Config] = None): Unit = {
    val mainSnap = mainLake.currentSnapshot.getOrElse(return)
    val viewEpoch = viewLake.currentSnapshot.map(_.epoch).getOrElse(0L)
    val missed = syncedMainSnapshot(viewLake) match {
      case Some(cid) =>
        if (cid >= mainSnap.snapshotId) return
        Derived.missedBucketsWhere(mainLake, _.snapshotId > cid)
      case None => // new view (or pre-cursor): epoch-lag backfill
        if (viewEpoch >= mainSnap.epoch) return
        Derived.missedBucketsWhere(mainLake, _.epoch > viewEpoch)
    }
    if (missed.nonEmpty)
      maintain(spark, mainLake, viewLake, missed, mainSnap.epoch,
        maintenance = viewEpoch == mainSnap.epoch, aggs = aggs)
    else persistCursor(viewLake, mainSnap.snapshotId) // nothing data-visible
    ()
  }
}

/** Shared derived-table machinery. */
private[cdc] object Derived {
  /** Epoch-lag form (the fixed agg table's contract). */
  def missedBuckets(mainLake: LakeTable, sinceEpoch: Long): Set[Int] =
    missedBucketsWhere(mainLake, _.epoch > sinceEpoch)

  /** Main-table buckets whose manifests changed in any snapshot matching
    * `lagging` — O(snapshots × buckets) metadata compare, no manifest
    * loads. Diffing runs over CONSECUTIVE RETAINED snapshots, so expired
    * history accumulates into the first retained pair (a superset — safe);
    * the oldest retained snapshot diffs against None = all its buckets.
    * Falls back to ALL current buckets when the table was re-bucketed
    * inside the lagging range (old-space ids no longer address current
    * buckets). */
  def missedBucketsWhere(mainLake: LakeTable,
                         lagging: graft.lake.Snapshot => Boolean): Set[Int] = {
    val mainSnap = mainLake.currentSnapshot.getOrElse(return Set.empty)
    val snaps = mainLake.snapshots
    val missed = snaps.zip(None +: snaps.map(Some(_)))
      .collect { case (s, parentOpt) if lagging(s) => (s, parentOpt) }
    if (missed.exists(_._1.nBuckets != mainSnap.nBuckets))
      (0 until mainSnap.nBuckets).toSet
    else missed.flatMap { case (s, parentOpt) =>
      val parentRefs = parentOpt
        .map(_.manifests.map(r => r.bucket -> r.path).toMap)
        .getOrElse(Map.empty[Int, String])
      s.manifests.filter(r => !parentRefs.get(r.bucket).contains(r.path))
        .map(_.bucket)
    }.toSet
  }
}
