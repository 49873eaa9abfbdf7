package graft.cdc

import org.apache.spark.sql.functions._

import graft.lake.LakeTable

/**
 * Dead-letter REPLAY: re-ingest a quarantined epoch's events after the
 * cause is fixed (a CHECK constraint dropped/corrected, a feed bug patched
 * with DML to follow) — the reference's failed-event reprocessing loop,
 * where every job re-consumes its failed-events topic
 * (ActivityAggregateUpdaterConfig.scala:66-67 failedEventOutputTag and the
 * corresponding re-ingest consumers), restated over the engine's quarantine
 * store.
 *
 * Semantics:
 *  - events keep their ORIGINAL lsns, so LWW decides naturally: a
 *    quarantined event older than what later batches stored simply loses
 *    (no resurrection), a quarantined event still newest wins — replaying
 *    dead letters can never reorder history.
 *  - applied as a MAINTENANCE merge (epoch kept): requeueing never fences
 *    the live feed, and a commit race with a source batch recomputes.
 *  - validation runs HERE, against the table's current rules: rows that
 *    still fail are written straight back to `quarantine/epoch=N` (their
 *    original address) and only clean rows enter the merge — so after a
 *    requeue that dir holds exactly the still-bad rows, other epochs'
 *    quarantine records are never touched, and the full pre-requeue set
 *    is preserved in a `requeued-epoch=N-<id>` sibling for audit.
 *  - idempotent: the source dir is consumed (moved aside) first; a second
 *    requeue of the same epoch finds only what still fails.
 *  - full-image ops only (I/U/D): a patch feed's dead letters need the
 *    feed's own patchEnabled contract and re-fail here by design.
 */
object Requeue {

  final case class RequeueStats(found: Long, applied: Boolean,
                                stillFailed: Long, archivedTo: String)

  /** Replay the dead letters of `epoch`. No-op when that epoch has no
    * quarantine (found = 0). */
  def requeue(lake: LakeTable, epoch: Long,
              maxAttempts: Int = 5): RequeueStats = {
    val spark = lake.spark
    val qdir = s"${lake.root}/quarantine/epoch=$epoch"
    if (!graft.lake.LakeIO.exists(qdir))
      return RequeueStats(0L, applied = false, 0L, "")
    val cur = lake.currentSnapshot.getOrElse(
      throw new IllegalStateException(
        s"${lake.root} has no snapshot — nothing to requeue into"))

    // consume the source dir FIRST (idempotence; audit copy kept)
    val archived = s"${lake.root}/quarantine/requeued-epoch=$epoch-" +
      java.util.UUID.randomUUID().toString.take(8)
    val fs = graft.lake.LakeIO.fs(qdir)
    if (!fs.rename(new org.apache.hadoop.fs.Path(qdir),
        new org.apache.hadoop.fs.Path(archived)))
      throw new IllegalStateException(
        s"could not move $qdir aside (concurrent requeue?)")

    val batch = spark.read.parquet(archived).drop("_reason")
    // validate against the table's CURRENT rules (the fix the operator just
    // made is what this replay exists to pick up)
    val allowed = Seq(graft.model.Schemas.OpInsert,
      graft.model.Schemas.OpUpdate, graft.model.Schemas.OpDelete)
    val ks = cur.keySpec
    val reason = lake.checks.toSeq.sortBy(_._1)
      .foldLeft(CdcApply.invalidReason(allowed, ks)) { case (r, (n, e)) =>
        r.when(CdcApply.checkColumn(spark, e, batch.columns.toSeq) <=>
          lit(false), s"check:$n")
      }
    val still = batch.withColumn("_reason", reason)
      .filter(col("_reason").isNotNull)
    val nStill = still.count()
    if (nStill > 0) // still-bad rows return to their original address
      still.write.mode("overwrite").parquet(qdir)
    val clean = batch.filter(reason.isNull)
    val nClean = clean.count()
    if (nClean == 0)
      return RequeueStats(nStill, applied = false, nStill, archived)

    var last: graft.lake.CommitConflictException = null
    var attempt = 0
    while (attempt < maxAttempts) {
      attempt += 1
      try {
        val snap = lake.currentSnapshot.get
        CdcApply.apply(lake, clean, epoch = snap.epoch,
          nBuckets = snap.nBuckets, maintenance = true, validate = false,
          probeInfo = Some(CdcApply.ProbeInfo(nClean, Nil)))
        return RequeueStats(nClean + nStill, applied = true, nStill, archived)
      } catch {
        case e: graft.lake.CommitConflictException => last = e
      }
    }
    throw new graft.lake.CommitConflictException(
      s"requeue of epoch $epoch lost $maxAttempts commit races: " +
      last.getMessage)
  }
}
