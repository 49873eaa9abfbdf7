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
 *  - CRASH-SAFE (round-3 advice): an archive is only a completed requeue
 *    when it carries a `_REQUEUED` marker. The failure path restores the
 *    archive to `quarantine/epoch=N` before rethrowing, and a HARD crash
 *    (kill between the rename and the merge) leaves an unmarked archive
 *    that the next requeue of the same epoch restores first — so clean
 *    rows can never silently leave the replay pipeline (a re-run used to
 *    find the dir missing and report found=0 as fully drained). Restoring
 *    after a merge that actually committed is safe: events keep their
 *    original lsns, so the LWW re-merge is a no-op by construction.
 *  - full-image ops only (I/U/D): a patch feed's dead letters need the
 *    feed's own patchEnabled contract and re-fail here by design.
 */
object Requeue {

  final case class RequeueStats(found: Long, applied: Boolean,
                                stillFailed: Long, archivedTo: String)

  /** Marker file naming a COMPLETED requeue's audit archive. Spark writes
    * `_SUCCESS` into every parquet dir (including the quarantine dir the
    * archive started as), so completion needs its own name. */
  private val marker = "_REQUEUED"

  private def fsRename(from: String, to: String): Boolean =
    graft.lake.LakeIO.fs(from).rename(
      new org.apache.hadoop.fs.Path(from), new org.apache.hadoop.fs.Path(to))

  /** Archives of `epoch` that never completed (no `_REQUEUED` marker) — a
    * crashed or failed prior requeue stranded the full pre-requeue row set
    * there. Newest first (the newest is always the fullest: each run's
    * archive starts as the restore of its predecessor). */
  private def orphanArchives(lake: LakeTable, epoch: Long): Seq[String] = {
    val qroot = s"${lake.root}/quarantine"
    if (!graft.lake.LakeIO.exists(qroot)) return Nil
    graft.lake.LakeIO.list(qroot)
      .collect { case (n, p, true)
        if n.startsWith(s"requeued-epoch=$epoch-") &&
          !graft.lake.LakeIO.exists(s"$p/$marker") => p }
      .sorted.reverse
  }

  /** Put the full pre-requeue set back at the quarantine address: the
    * still-bad subset a failed run may have already written there is a
    * subset of the archive, so it is replaced, not merged. */
  private def restore(lake: LakeTable, epoch: Long, archived: String): Unit = {
    val qdir = s"${lake.root}/quarantine/epoch=$epoch"
    if (graft.lake.LakeIO.exists(qdir)) graft.lake.LakeIO.delete(qdir)
    if (!fsRename(archived, qdir))
      throw new IllegalStateException(
        s"could not restore $archived to $qdir (concurrent requeue?)")
  }

  /** Replay the dead letters of `epoch`. No-op when that epoch has no
    * quarantine (found = 0). */
  def requeue(lake: LakeTable, epoch: Long,
              maxAttempts: Int = 5): RequeueStats = {
    val spark = lake.spark
    val qdir = s"${lake.root}/quarantine/epoch=$epoch"
    // heal a crashed prior requeue: unmarked archives hold the full set
    orphanArchives(lake, epoch).headOption.foreach(restore(lake, epoch, _))
    if (!graft.lake.LakeIO.exists(qdir))
      return RequeueStats(0L, applied = false, 0L, "")
    val cur = lake.currentSnapshot.getOrElse(
      throw new IllegalStateException(
        s"${lake.root} has no snapshot — nothing to requeue into"))

    // consume the source dir FIRST (idempotence; audit copy kept)
    val archived = s"${lake.root}/quarantine/requeued-epoch=$epoch-" +
      java.util.UUID.randomUUID().toString.take(8)
    if (!fsRename(qdir, archived))
      throw new IllegalStateException(
        s"could not move $qdir aside (concurrent requeue?)")

    try {
      val batch = spark.read.parquet(archived).drop("_reason")
      // validate against the table's CURRENT rules (the fix the operator
      // just made is what this replay exists to pick up)
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
      if (nClean == 0) {
        // nothing to merge — the requeue is complete (all rows are back at
        // the quarantine address); mark the archive so it is never restored
        graft.lake.LakeIO.writeBytes(s"$archived/$marker", Array.emptyByteArray)
        return RequeueStats(nStill, applied = false, nStill, archived)
      }

      var last: graft.lake.CommitConflictException = null
      var attempt = 0
      while (attempt < maxAttempts) {
        attempt += 1
        try {
          val snap = lake.currentSnapshot.get
          CdcApply.apply(lake, clean, epoch = snap.epoch,
            nBuckets = snap.nBuckets, maintenance = true, validate = false,
            probeInfo = Some(CdcApply.ProbeInfo(nClean, Nil)))
          // merge committed and still-bad rows are at their address: the
          // archive is now a pure audit copy — mark it completed
          graft.lake.LakeIO.writeBytes(s"$archived/$marker",
            Array.emptyByteArray)
          return RequeueStats(nClean + nStill, applied = true, nStill, archived)
        } catch {
          case e: graft.lake.CommitConflictException => last = e
        }
      }
      throw new graft.lake.CommitConflictException(
        s"requeue of epoch $epoch lost $maxAttempts commit races: " +
        last.getMessage)
    } catch {
      // any failure after the consume-rename: put the FULL set back at the
      // quarantine address (replacing a partial still-bad rewrite), so the
      // next requeue sees everything — nothing strands in the archive
      case e: Throwable =>
        try restore(lake, epoch, archived)
        catch { case r: Throwable => e.addSuppressed(r) }
        throw e
    }
  }
}
