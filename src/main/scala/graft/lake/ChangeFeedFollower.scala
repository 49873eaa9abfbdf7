package graft.lake

import org.apache.spark.sql.SparkSession

/**
 * Exactly-once downstream consumer of the snapshot-diff change feed: each
 * `drain` folds everything committed since the consumer's persisted cursor
 * into ONE delta batch on disk and atomically advances the cursor — the
 * Spark-side analogue of the reference's re-emit jobs, which push every
 * processed batch's deltas to downstream Kafka topics
 * (ActivityAggregatesFunction.scala:244-248 audit/start/complete side-outs,
 * relay-jobs' topic-to-topic forwarding) — except pull-based and replayable,
 * because the feed derives from the table's own committed history.
 *
 * Consumer-dir layout (all under `consumerDir`, owned by the consumer, not
 * the lake):
 *   cursor/v<snapshotId>   — exclusively-published marker files; the cursor
 *                            is the MAX. Publishing is link(2)/rename
 *                            create-if-absent (LakeIO.publishExclusive), so
 *                            two racing drains agree on one winner.
 *   delta_<from>_<to>/     — the folded delta batch as parquet
 *                            (key cols, action, pre_lsn, post_lsn
 *                            [, pre_/post_ image cols]).
 *
 * Exactly-once across kill -9: the delta batch is written BEFORE the cursor
 * advances, and the write is deterministic (same from/to → same rows), so a
 * crash between the two steps re-runs as an overwrite of the same directory
 * followed by the cursor publish. Consumers must therefore treat a
 * delta directory as visible ONLY once `cursor >= to` — the directory name
 * carries both ends so that check is local.
 *
 * Catch-up is O(changed buckets) like every snapshot diff: ten missed
 * batches fold into one diff over the union of their touched buckets, NOT
 * ten separate scans. A compaction/rebucket between drains changes every
 * manifest ref, so that drain degrades to a full-table diff that nets to
 * zero rows — correct, just not pruned (same property as Replica.refresh).
 */
object ChangeFeedFollower {

  final case class DrainStats(from: Long, to: Long, rows: Long, out: String)

  private def cursorDir(consumerDir: String) = s"$consumerDir/cursor"

  /** The consumer's persisted position: the highest snapshot id already
    * drained, or -1 before the first drain (the first batch is then the
    * full live image as `inserted` rows). */
  def cursor(consumerDir: String): Long = {
    val dir = cursorDir(consumerDir)
    if (!LakeIO.exists(dir)) -1L
    else LakeIO.list(dir).collect {
      case (name, _, false) if name.startsWith("v") =>
        name.stripPrefix("v").toLong
    }.foldLeft(-1L)(math.max)
  }

  /** Drain everything committed since the cursor into one delta batch.
    * Returns None when the consumer is current (nothing committed since).
    * Safe to call from several processes and safe to kill at any point —
    * see the class doc for the commit protocol. */
  def drain(
      spark: SparkSession,
      lake: LakeTable,
      consumerDir: String,
      imageCols: Seq[String] = Nil): Option[DrainStats] = {
    val to = lake.currentSnapshot.map(_.snapshotId).getOrElse(return None)
    val from = cursor(consumerDir)
    if (to <= from) return None
    val out = s"$consumerDir/delta_${from}_$to"
    val delta = ChangeFeedReader.between(spark, lake, from, to, imageCols)
    // overwrite: a crashed prior attempt at the SAME (from, to) left a
    // partial directory that deterministically re-produces here
    LakeIO.ensureMicrosTimestamps(spark)
    delta.write.mode("overwrite").parquet(out)
    val rows = spark.read.parquet(out).count()
    LakeIO.mkdirs(cursorDir(consumerDir))
    // losing the race to a concurrent drain of the same consumerDir is
    // fine: both computed identical content for identical (from, to)
    LakeIO.publishExclusive(s"${cursorDir(consumerDir)}/v$to",
      Array.emptyByteArray)
    Some(DrainStats(from, to, rows, out))
  }
}
