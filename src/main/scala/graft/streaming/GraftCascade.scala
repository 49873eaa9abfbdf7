package graft.streaming

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/**
 * Lake→lake cascading: map a `graft-changes` delta stream into the
 * changelog-event shape the `graft` sink (and every other CdcApply
 * front-end) consumes, so a downstream lake follows an upstream one —
 * the Spark-native restatement of the reference's chained topologies,
 * where one Flink job's output topic is the next job's input
 * (relay-jobs' topic-to-topic forwarding; ActivityAggregatesFunction
 * side-outs feeding downstream consumers):
 *
 * {{{
 *   spark.readStream.format("graft-changes")
 *     .option("path", upstream).option("withsnapshot", "true").load()
 *     .transform(GraftCascade.toEvents)       // optionally .filter/.select
 *     .writeStream.format("graft-lake")
 *     .option("path", downstream).option("checkpointLocation", ckpt)
 *     .start()
 * }}}
 *
 * Versioning: the downstream `_lsn` is the upstream COMMIT SNAPSHOT ID
 * (`withsnapshot=true`), not the upstream row lsn. Each micro-batch is a
 * snapshot diff — at most one row per key — and snapshot ids are strictly
 * increasing, so the stamped version is per-key monotonic downstream. That
 * makes the cascade follow everything the feed can report, including an
 * upstream ROLLBACK: the feed shows a rollback as an `updated` row whose
 * lsn moved DOWN (ChangeFeedReader), which could never win a downstream
 * LWW election keyed on upstream lsns (the downstream's stored higher lsn
 * beats it, and the engine breaks lsn ties toward stored state). It also
 * covers deletes, whose tombstone lsn the live-image diff cannot carry
 * (`post_lsn` is null for `deleted` rows).
 *
 * Consequence: the downstream lake's lsn domain is OWNED by its cascade —
 * the same ownership rule as any single-writer feed. Chain further
 * cascades off the downstream's own change feed; don't mix a cascade with
 * direct writes into one table unless the direct feed's lsns are
 * comparable (they won't be).
 *
 * Lineage: `_src_part` 0, `_src_off` = the upstream snapshot id, so the
 * downstream snapshot's per-partition lineage records exactly which
 * upstream snapshot range each commit folded in.
 */
object GraftCascade {

  /** Delta rows (action, pre_/post_*, `_commit_snapshot`) → changelog
    * events (op, business columns, `_lsn`, lineage). Requires
    * `withsnapshot=true` on the source (see class doc for why the stamp is
    * the only sound downstream version). */
  def toEvents(delta: DataFrame): DataFrame = {
    val cols = delta.columns
    require(cols.contains("_commit_snapshot"),
      "GraftCascade.toEvents needs the _commit_snapshot stamp — subscribe " +
      "with .option(\"withsnapshot\", \"true\")")
    require(cols.contains("action") && cols.contains("post_lsn"),
      s"not a graft-changes delta frame (have: ${cols.mkString(", ")})")
    val keyCols = cols.takeWhile(_ != "action").toSeq
    val imageCols = cols.collect {
      case c if c.startsWith("post_") && c != "post_lsn" =>
        c.stripPrefix("post_")
    }.toSeq
    require(imageCols.nonEmpty,
      "cascade needs the business images — subscribe with images=* (the " +
      "default), not images=none")
    val out: Seq[Column] =
      (when(col("action") === "deleted", lit("D")).otherwise(lit("U"))
        .as("op") +:
        keyCols.map(col)) ++
      imageCols.map(c => col(s"post_$c").as(c)) ++
      Seq(col("_commit_snapshot").as("_lsn"),
          lit(0).as("_src_part"),
          col("_commit_snapshot").as("_src_off"))
    delta.select(out: _*)
  }
}
