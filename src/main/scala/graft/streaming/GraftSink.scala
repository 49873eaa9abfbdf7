package graft.streaming

import org.apache.spark.sql.{DataFrame, SQLContext, SparkSession}
import org.apache.spark.sql.execution.streaming.Sink
import org.apache.spark.sql.graft.GraftBridge
import org.apache.spark.sql.sources.{DataSourceRegister, StreamSinkProvider}
import org.apache.spark.sql.streaming.OutputMode

import graft.cdc.{CdcApply, CdcStream}
import graft.lake.{LakeIO, LakeTable}
import graft.model.Schemas

/**
 * The lake as a first-class Structured Streaming SINK:
 *
 * {{{
 *   events.writeStream.format("graft-lake")
 *     .option("path", "/data/transcripts")
 *     .option("checkpointLocation", ckpt)
 *     .start()
 * }}}
 *
 * Each micro-batch runs the same epoch-fenced CDC MERGE as the batch
 * driver and the foreachBatch tailer (CdcApply): the sink is exactly-once
 * because the commit epoch is the checkpointed batchId + 1 — a crashed and
 * re-delivered batch fences to a no-op — and the checkpoint⇄lake binding
 * refuses the fresh-checkpoint-against-populated-lake footgun the same way
 * CdcStream does. This completes the streaming surface the reference wires
 * job-by-job (each Flink job both consumes AND re-emits Kafka topics,
 * FlinkKafkaConnector.scala:13-18): with the `graft-changes` SOURCE on one
 * lake and this sink on another, a cascading lake→transform→lake pipeline
 * is plain `readStream → select → writeStream`, checkpointed end-to-end,
 * with exactly-once at both ends (see [[GraftCascade]]).
 *
 * Input contract = the changelog-event shape (CdcApply): `op` plus the
 * business/key columns, `_lsn` as the global version, `_src_part`/`_src_off`
 * lineage. Rows are arbitrary transformed streams, not files — so there is
 * no footer fast path here; the merge pays the one probe pass a JSON feed
 * pays (documented trade, BASELINE.md round-3 JSON numbers).
 *
 * Options (contract values seed a NEW lake; an existing lake's stored
 * contract is authoritative, exactly like the batch driver):
 *   nbuckets, salt       — bucket layout / skew salting for the merge
 *   keycols, bucketcols  — csv KeySpec seed (default transcripts)
 *   patch                — accept op='P' partial-column patches
 *   changefeed           — per-batch delta classification (default true)
 *   mor                  — merge-on-read seed; `morchain` bounds chains
 *   keep                 — expire all but the newest N snapshots per batch
 *   source               — named feed: per-source fencing (multi-feed)
 */
class GraftSinkProvider extends StreamSinkProvider with DataSourceRegister {

  override def shortName(): String = "graft-lake"

  override def createSink(
      sqlContext: SQLContext,
      parameters: Map[String, String],
      partitionColumns: Seq[String],
      outputMode: OutputMode): Sink = {
    require(partitionColumns.isEmpty,
      "graft buckets on the table's key spec — partitionBy is not the knob")
    val path = parameters.getOrElse("path", throw new IllegalArgumentException(
      "graft sink requires .option(\"path\", <lake root>)"))
    val ckpt = parameters.getOrElse("checkpointLocation",
      throw new IllegalArgumentException(
        "graft sink requires .option(\"checkpointLocation\", …) — its " +
        "exactly-once fence is the checkpointed batchId"))
    val keys = (parameters.get("keycols"), parameters.get("bucketcols")) match {
      case (None, None) => Schemas.KeySpec.transcripts
      case (Some(kc), bc) =>
        val keyCols = kc.split(",").map(_.trim).filter(_.nonEmpty).toSeq
        val bucketCols = bc.map(_.split(",").map(_.trim).filter(_.nonEmpty)
          .toSeq).getOrElse(keyCols)
        Schemas.KeySpec(bucketCols, keyCols)
      case (None, Some(_)) => throw new IllegalArgumentException(
        "bucketcols without keycols — pass both (or neither for the " +
        "transcripts default)")
    }
    new GraftSink(sqlContext.sparkSession, path, ckpt,
      nBuckets = parameters.get("nbuckets").map(_.toInt).getOrElse(64),
      saltBuckets = parameters.get("salt").map(_.toInt).getOrElse(0),
      keys = keys,
      patchEnabled = parameters.get("patch").exists(_.toBoolean),
      changeFeed = parameters.get("changefeed").forall(_.toBoolean),
      mor = parameters.get("mor").exists(_.toBoolean),
      morChain = parameters.get("morchain").map(_.toInt).getOrElse(16),
      keep = parameters.get("keep").map(_.toInt).getOrElse(0),
      source = parameters.get("source").filter(_.nonEmpty))
  }
}

class GraftSink(
    spark: SparkSession,
    path: String,
    checkpointDir: String,
    nBuckets: Int,
    saltBuckets: Int,
    keys: Schemas.KeySpec,
    patchEnabled: Boolean,
    changeFeed: Boolean,
    mor: Boolean,
    morChain: Int,
    keep: Int,
    source: Option[String]) extends Sink {

  LakeIO.mkdirs(path)
  private val lake = new LakeTable(spark, path)
  // same data-loss guard as the tailer: pairing a FRESH checkpoint with a
  // populated lake would restart batchIds at 0 and silently fence every
  // early batch — refuse at sink construction, before any batch runs
  CdcStream.bindOrRefuse(lake, checkpointDir, source)

  override def addBatch(batchId: Long, data: DataFrame): Unit = {
    val batch = GraftBridge.batchDataFrame(spark, data)
    val stats = CdcApply.apply(lake, batch, epoch = batchId + 1,
      nBuckets = nBuckets, saltBuckets = saltBuckets,
      patchEnabled = patchEnabled, changeFeed = changeFeed, mor = mor,
      keys = keys, source = source)
    if (!stats.skipped && morChain > 0 && lake.currentSnapshot.exists(_.mor))
      CdcApply.maybeFold(lake, morChain)
    if (!stats.skipped && keep > 0) lake.expireSnapshots(keep)
    // the same per-batch metrics line every other front-end emits (the
    // north rule's per-batch rows/sec + lineage contract): stderr, so a
    // CLI's stdout stays a clean JSON protocol
    val cf = Seq("inserted", "updated", "deleted", "delete_noop", "carried")
      .map(k => s""""$k":${stats.actions.getOrElse(k, 0L)}""").mkString(",")
    System.err.println(
      s"""{"sink":"$path","batchId":$batchId,""" +
      s""""snapshotId":${stats.snapshot.snapshotId},""" +
      s""""rowsIn":${stats.rowsIn},"rowsOut":${stats.rowsOut},""" +
      s""""failedEvents":${stats.failedEvents},""" +
      s""""touchedBuckets":${stats.touchedBuckets},""" +
      f""""durationSec":${stats.durationSec}%.3f,""" +
      f""""rowsPerSec":${stats.eventsPerSec}%.1f,""" +
      s""""skipped":${stats.skipped},"changeFeed":{$cf}}""")
  }

  override def toString: String = s"GraftSink[$path]"
}
