package graft.cdc

import org.apache.spark.sql.SparkSession

import graft.changelog.ChangelogGen
import graft.lake.LakeTable

/**
 * Deterministic incremental driver: tails a changelog directory of
 * `seg=N/` parquet segments and applies them to the lake table in
 * micro-batches of `segmentsPerBatch` segments.
 *
 * The checkpoint IS the lake commit log: each snapshot's `epoch` is the
 * number of source segments applied so far, so resume-after-kill needs no
 * side state — a fresh driver reads the current snapshot and continues from
 * `epoch` (reference analogue: Flink checkpoint + store-checksum-after-write,
 * FlinkUtil.scala:16-32 + CollectionProgressCompleteFunction.scala:58-62;
 * ours is strictly stronger because data+position commit atomically).
 *
 * Per-batch metrics (rows/sec) are printed as one JSON line each and stored
 * in the snapshot metadata (north rule: per-batch rows/sec + lineage).
 */
final class CdcDriver(
    spark: SparkSession,
    changelogDir: String,
    lake: LakeTable,
    segmentsPerBatch: Int = 4,
    nBuckets: Int = 64,
    saltBuckets: Int = 0,
    quiet: Boolean = false) {

  /** Apply up to `maxBatches` pending micro-batches; returns per-batch stats.
    * Safe to call again after a crash or mid-run stop. */
  def run(maxBatches: Int = Int.MaxValue): Seq[CdcApply.ApplyStats] = {
    val segs = ChangelogGen.listSegments(changelogDir)
    val applied = lake.currentSnapshot.map(_.epoch).getOrElse(0L)
    val pending = segs.filter(_ >= applied)
    val out = scala.collection.mutable.ArrayBuffer[CdcApply.ApplyStats]()
    pending.grouped(segmentsPerBatch).take(maxBatches).foreach { group =>
      val paths = group.map(s => s"$changelogDir/seg=$s")
      val batch = spark.read
        .option("mergeSchema", "true") // additive evolution across segments
        .parquet(paths: _*)
      // epoch = exclusive upper segment bound -> fencing token
      val epoch = group.max + 1
      val stats = CdcApply.apply(lake, batch, epoch, nBuckets, saltBuckets)
      out += stats
      if (!quiet) {
        val s = stats
        println(
          s"""{"batchEpoch":$epoch,"snapshotId":${s.snapshot.snapshotId},""" +
          s""""rowsIn":${s.rowsIn},"rowsOut":${s.rowsOut},""" +
          s""""touchedBuckets":${s.touchedBuckets},""" +
          f""""durationSec":${s.durationSec}%.3f,"rowsPerSec":${s.eventsPerSec}%.1f,""" +
          s""""skipped":${s.skipped}}""")
      }
    }
    out.toSeq
  }
}
