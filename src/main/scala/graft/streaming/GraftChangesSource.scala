package graft.streaming

import org.apache.spark.sql.{DataFrame, SQLContext, SparkSession}
import org.apache.spark.sql.connector.read.streaming.{ReadLimit, SupportsTriggerAvailableNow, Offset => OffsetV2}
import org.apache.spark.sql.execution.streaming.{Offset, Source}
import org.apache.spark.sql.execution.streaming.runtime.LongOffset
import org.apache.spark.sql.functions.col
import org.apache.spark.sql.graft.GraftBridge
import org.apache.spark.sql.sources.{DataSourceRegister, StreamSourceProvider}
import org.apache.spark.sql.types._

import graft.lake.{ChangeFeedReader, LakeIO, LakeTable}

/**
 * The lake's change feed as a Structured Streaming SOURCE:
 *
 * {{{
 *   spark.readStream.format("graft-changes")
 *     .option("path", "/data/transcripts")
 *     .load()                       // key cols, action, pre_/post_lsn,
 *                                   // pre_/post_<image col> per row delta
 * }}}
 *
 * Each micro-batch is the snapshot-diff between the last streamed snapshot
 * (checkpointed by Structured Streaming as the source offset) and the
 * current head — the push-based twin of the pull-based
 * [[graft.lake.ChangeFeedFollower]], and the Spark-native restatement of
 * the reference's re-emit topology (every processed batch's deltas are
 * forwarded to downstream Kafka topics: audit/start/complete side-outs,
 * ActivityAggregatesFunction.scala:108-117, relay-jobs' topic-to-topic
 * forwarding). Downstream gets the full streaming surface for free:
 * watermarks, windowed aggs, foreachBatch into any sink.
 *
 * Contract:
 *  - offsets are SNAPSHOT IDS; ten missed commits fold into ONE batch
 *    costing O(changed buckets), not ten scans (ChangeFeedReader).
 *  - the first batch (no checkpoint) is the full live image as `inserted`
 *    rows — or start at a known snapshot/tag with `.option("startfrom", x)`.
 *  - `images` picks the business columns carried as before/after images:
 *    `*` (default, all), `none`, or a comma list.
 *  - replays are deterministic while the diffed snapshots are retained:
 *    keep snapshot retention (expire keep=/olderthan=) longer than the
 *    longest consumer outage, or the source fails LOUDLY (never a silent
 *    empty batch) telling the operator to re-seed.
 *  - schema is pinned at stream start (the V1 source contract); a widening
 *    evolution under a RUNNING stream fails loudly — restart the stream to
 *    adopt the new schema.
 */
class GraftChangesSourceProvider extends StreamSourceProvider
    with DataSourceRegister {

  override def shortName(): String = "graft-changes"

  override def sourceSchema(
      sqlContext: SQLContext,
      schema: Option[StructType],
      providerName: String,
      parameters: Map[String, String]): (String, StructType) = {
    require(schema.isEmpty,
      "graft-changes derives its schema from the lake — do not pass one")
    val (lake, imageCols) =
      GraftChangesSource.resolve(sqlContext.sparkSession, parameters)
    (shortName(), GraftChangesSource.feedSchema(lake, imageCols,
      GraftChangesSource.withSnapshot(parameters)))
  }

  override def createSource(
      sqlContext: SQLContext,
      metadataPath: String,
      schema: Option[StructType],
      providerName: String,
      parameters: Map[String, String]): Source = {
    val spark = sqlContext.sparkSession
    val (lake, imageCols) = GraftChangesSource.resolve(spark, parameters)
    val startFrom = parameters.get("startfrom").map { v =>
      v.toLongOption.orElse(lake.tags.get(v)).getOrElse(
        throw new IllegalArgumentException(
          s"startfrom '$v' is neither a snapshot id nor a tag in ${lake.root}"))
    }.getOrElse(-1L)
    val stamp = GraftChangesSource.withSnapshot(parameters)
    new GraftChangesSource(spark, lake.root, imageCols, startFrom,
      GraftChangesSource.feedSchema(lake, imageCols, stamp), stamp)
  }
}

object GraftChangesSource {

  /** Lake + image-column list from reader options (shared by schema
    * resolution and source construction so both see one interpretation). */
  private[streaming] def resolve(spark: SparkSession,
                                 parameters: Map[String, String])
      : (LakeTable, Seq[String]) = {
    val path = parameters.getOrElse("path", throw new IllegalArgumentException(
      "graft-changes requires .option(\"path\", <lake root>)"))
    require(LakeIO.exists(s"$path/meta"), s"no lake at $path")
    val lake = new LakeTable(spark, path)
    val snap = lake.currentSnapshot.getOrElse(
      throw new IllegalStateException(
        s"$path has no snapshot yet — commit a first batch before " +
        "subscribing to its changes"))
    val business = snap.schema.fields.map(_.name)
      .filterNot(n => n.startsWith("_") || snap.keySpec.keyCols.contains(n))
      .toSeq
    val imageCols = parameters.get("images") match {
      case None | Some("*") => business
      case Some("none")     => Nil
      case Some(csv) =>
        val cols = csv.split(",").map(_.trim).filter(_.nonEmpty).toSeq
        val bad = cols.filterNot(business.contains)
        require(bad.isEmpty,
          s"images ${bad.mkString(", ")} are not business columns of $path " +
          s"(have: ${business.mkString(", ")})")
        cols
    }
    (lake, imageCols)
  }

  /** `withsnapshot=true` appends a `_commit_snapshot` column — the batch's
    * target snapshot id, constant per micro-batch. A cascading consumer
    * ([[GraftCascade.toEvents]]) uses it as the downstream version: each
    * micro-batch is a snapshot diff (at most ONE row per key), so the
    * stamped id is per-key monotonic across batches, which makes the
    * cascade follow even a ROLLBACK upstream (where the upstream lsn moves
    * DOWN and could never win a downstream LWW election). */
  private[streaming] def withSnapshot(parameters: Map[String, String])
      : Boolean = parameters.get("withsnapshot").exists(_.toBoolean)

  /** The delta-row schema: key columns (table types), action,
    * pre_/post_lsn, then pre_/post_ images — exactly
    * [[ChangeFeedReader.between]]'s column order. */
  private[streaming] def feedSchema(lake: LakeTable,
                                    imageCols: Seq[String],
                                    stampSnapshot: Boolean = false)
      : StructType = {
    val snap = lake.currentSnapshot.get
    val byName = snap.schema.fields.map(f => f.name -> f).toMap
    val keys = snap.keySpec.keyCols.map(k =>
      StructField(k, byName(k).dataType, nullable = true))
    val core = Seq(
      StructField("action", StringType, nullable = true),
      StructField("pre_lsn", LongType, nullable = true),
      StructField("post_lsn", LongType, nullable = true))
    val images = imageCols.flatMap { c =>
      val t = byName(c).dataType
      Seq(StructField(s"pre_$c", t, nullable = true),
          StructField(s"post_$c", t, nullable = true))
    }
    val stamp = if (stampSnapshot)
      Seq(StructField("_commit_snapshot", LongType, nullable = true))
    else Nil
    StructType(keys ++ core ++ images ++ stamp)
  }
}

class GraftChangesSource(
    spark: SparkSession,
    lakeRoot: String,
    imageCols: Seq[String],
    startFrom: Long,
    declared: StructType,
    stampSnapshot: Boolean = false)
    extends Source with SupportsTriggerAvailableNow {

  private def lake = new LakeTable(spark, lakeRoot)

  override def schema: StructType = declared

  /** The head snapshot id — Structured Streaming checkpoints it as this
    * source's offset, giving resume-exactly-where-left-off for free. */
  override def getOffset: Option[Offset] =
    lake.currentSnapshot.map(s => LongOffset(s.snapshotId))

  // ---- Trigger.AvailableNow (first-class, not the single-batch fallback):
  // the drain target is the head snapshot PINNED when the trigger starts,
  // so the query terminates deterministically even while the upstream
  // keeps committing — and a restart that must first re-run an
  // uncommitted batch still continues to the pinned head instead of
  // exiting after that one batch (the fallback's documented caveat).
  @volatile private var pinnedHead: Option[Long] = None

  override def prepareForTriggerAvailableNow(): Unit =
    pinnedHead = lake.currentSnapshot.map(_.snapshotId)

  override def getDefaultReadLimit: ReadLimit = ReadLimit.allAvailable()

  /** Admission control: snapshot diffs have no meaningful sub-batch read
    * limit (a diff's cost is O(changed buckets) regardless of where it
    * ends), so every trigger reads to the head — pinned under
    * AvailableNow, live otherwise. */
  override def latestOffset(start: OffsetV2, limit: ReadLimit): OffsetV2 =
    pinnedHead.orElse(lake.currentSnapshot.map(_.snapshotId))
      .map(LongOffset.apply).orNull

  override def reportLatestOffset(): OffsetV2 =
    lake.currentSnapshot.map(s => LongOffset(s.snapshotId)).orNull

  // LongOffset round-trips its value through json; recovered offsets may
  // arrive as SerializedOffset, so parse the json rather than pattern-match
  private def at(o: Offset): Long = o.json.trim.toLong

  override def getBatch(start: Option[Offset], end: Offset): DataFrame = {
    val from = start.map(at).getOrElse(startFrom)
    val to = at(end)
    val delta0 =
      try ChangeFeedReader.between(spark, lake, from, to, imageCols)
      catch {
        case e: NoSuchElementException =>
          // An expired diff end fails at EXECUTION, not here: on restart the
          // engine re-issues getBatch for the last already-committed batch
          // and discards the result without running it (V1 source-state
          // recovery) — failing eagerly would brick a healthy stream whose
          // committed history aged out. A genuine replay that actually NEEDS
          // the rows computes the frame and hits the error loudly.
          val msg =
            s"graft-changes cannot diff snapshots $from..$to of $lakeRoot — " +
            "a diffed snapshot expired under the consumer (" + e.getMessage +
            "). Keep retention (expire keep=/olderthan=) longer than " +
            "consumer lag, or drop the checkpoint to re-seed from the live " +
            "image."
          return GraftBridge.streamingPoisonFrame(spark, declared, msg)
      }
    // the stamp is constant per micro-batch (the diff's target snapshot)
    val delta = if (stampSnapshot)
      delta0.withColumn("_commit_snapshot",
        org.apache.spark.sql.functions.lit(to)) else delta0
    // pin the stream-start schema: a widening evolution mid-stream would
    // otherwise flow rows the checkpointed plan can't read — fail loudly
    val got = delta.schema
    val drift = declared.zip(got).collectFirst {
      case (d, g) if d.name != g.name || d.dataType != g.dataType =>
        s"${g.name}: ${g.dataType.simpleString} (stream pinned " +
        s"${d.name}: ${d.dataType.simpleString})"
    }.orElse(if (got.size != declared.size)
      Some(s"${got.size} columns (stream pinned ${declared.size})") else None)
    if (drift.isDefined)
      throw new IllegalStateException(
        s"$lakeRoot evolved under a running stream — ${drift.get}; restart " +
        "the stream to adopt the new schema (the checkpoint carries on from " +
        "its last offset)")
    GraftBridge.streamingDataFrame(spark,
      delta.select(declared.fieldNames.map(col).toIndexedSeq: _*), declared)
  }

  override def commit(end: Offset): Unit = () // retention governs history

  override def stop(): Unit = ()
}
