package graft.lake

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/**
 * Snapshot-diff change feed: the row-level deltas between two committed
 * snapshots, for downstream incremental consumers (the reference emits
 * audit/start/complete delta events to Kafka on every merge,
 * ActivityAggregatesFunction.scala:244-248, side-outs :108-117 — here the
 * feed is derived on demand from the table's own history, so it is exact,
 * replayable, and costs nothing at ingest time).
 *
 * Scale shape: only buckets whose manifest ref CHANGED between the two
 * snapshots are read (O(changed buckets) metadata + data), then old and new
 * bucket contents full-outer-join on the key — the same join size as one
 * merge of those buckets.
 */
object ChangeFeedReader {

  /** Per-key deltas from `fromSnapshotId` (exclusive) to `toSnapshotId`
    * (inclusive; default current). Returns
    * (conv_id, turn_idx, action, pre_lsn, post_lsn) with action in
    * inserted | updated | deleted — carried rows (no lsn movement) are not
    * part of a delta feed. `fromSnapshotId = -1` diffs against the empty
    * table (everything live becomes `inserted`).
    *
    * `imageCols` additionally carries the BEFORE and AFTER images of the
    * named business columns as `pre_<col>` / `post_<col>` (the Debezium
    * before/after envelope) — what an incremental index or downstream
    * materialization needs to retract the old value, not just learn the key
    * changed (SearchIndex retracts a row's old postings from `pre_text`). */
  def between(
      spark: SparkSession,
      lake: LakeTable,
      fromSnapshotId: Long,
      toSnapshotId: Long = -1L,
      imageCols: Seq[String] = Nil): DataFrame = {
    val snaps = lake.snapshots
    val to = if (toSnapshotId < 0) snaps.last
      else snaps.find(_.snapshotId == toSnapshotId).getOrElse(
        throw new NoSuchElementException(s"no snapshot $toSnapshotId"))
    val fromOpt =
      if (fromSnapshotId < 0) None
      else Some(snaps.find(_.snapshotId == fromSnapshotId).getOrElse(
        throw new NoSuchElementException(s"no snapshot $fromSnapshotId")))

    // changed buckets by manifest-ref identity (O(buckets) compare). A
    // bucket is compared by its ref-path SET: merge-on-read snapshots carry
    // several refs per bucket (the delta chain), and an append changes the
    // set without replacing the existing refs.
    val fromRefs = fromOpt
      .map(_.manifests.groupBy(_.bucket)
        .map { case (b, rs) => b -> rs.map(_.path).toSet })
      .getOrElse(Map.empty[Int, Set[String]])
    val changed = to.manifests.groupBy(_.bucket)
      .collect { case (b, rs)
        if fromRefs.getOrElse(b, Set.empty[String]) != rs.map(_.path).toSet => b }
      .toSet
    // buckets that vanished entirely (rebucketing) force a full diff
    val vanished = fromRefs.keySet -- to.manifests.map(_.bucket).toSet
    val diffBuckets =
      if (vanished.nonEmpty || fromOpt.exists(_.nBuckets != to.nBuckets)) None
      else Some(changed)

    def side(s: Snapshot, buckets: Option[Set[Int]]): DataFrame = {
      val refs = buckets match {
        case None => s.manifests
        case Some(bs) => s.manifests.filter(r => bs.contains(r.bucket))
      }
      val files = Manifests.loadAll(refs)
      val base0 =
        if (files.isEmpty)
          spark.createDataFrame(
            spark.sparkContext.emptyRDD[org.apache.spark.sql.Row], s.schema)
        else spark.read.schema(s.schema).parquet(files.map(_.path): _*)
      // MoR snapshots hold multi-version chains: resolve each side to its
      // LWW winners BEFORE the live filter, or a superseded old version
      // would join as a phantom second row per key.
      val base =
        if (s.mor && base0.columns.contains("_lsn"))
          graft.plans.LwwResolve.resolve(base0, s.keySpec, s.nBuckets,
            spark.sessionState.conf.numShufflePartitions)
        else base0
      val live = if (base.columns.contains("_tombstone"))
        base.filter(!col("_tombstone")) else base
      // image cols absent on one side (pre-evolution snapshot) read as
      // nulls OF THE TABLE'S TYPE — a bare lit(null) would give the delta
      // frame a void column, which breaks schema-pinned streaming
      // consumers and parquet dumps of the feed. The NEWEST schema is the
      // type authority: a restart-recovery diff can span two snapshots
      // that BOTH predate the column a running consumer's schema carries.
      val present = live.columns.toSet
      val images = imageCols.map(c =>
        if (present.contains(c)) col(c)
        else typeOf.get(c).map(t => lit(null).cast(t).as(c))
          .getOrElse(lit(null).as(c)))
      live.select((keyCols.map(col) :+ col("_lsn")) ++ images: _*)
    }

    // key-generic: diff on the table's stored key spec
    lazy val keyCols = to.keySpec.keyCols
    lazy val typeOf = snaps.last.schema.fields.map(f => f.name -> f.dataType).toMap
    val newSide = side(to, diffBuckets)
    val oldSide = fromOpt match {
      case None => spark.createDataFrame(
        spark.sparkContext.emptyRDD[org.apache.spark.sql.Row],
        newSide.schema)
      case Some(f) => side(f, diffBuckets)
    }
    val pre = oldSide.select(keyCols.map(col) ++
      (col("_lsn").as("pre_lsn") +:
        imageCols.map(c => col(c).as(s"pre_$c"))): _*)
    val post = newSide.select(keyCols.map(col) ++
      (col("_lsn").as("post_lsn") +:
        imageCols.map(c => col(c).as(s"post_$c"))): _*)
    pre.join(post, keyCols, "full_outer")
      .select(keyCols.map(col) ++ Seq(
        when(col("pre_lsn").isNull, "inserted")
          .when(col("post_lsn").isNull, "deleted")
          // ANY lsn movement is an update — including DOWNWARD, which is
          // how a rollback shows up in the feed (the winner reverted to an
          // older image). Carried = the identical winner on both sides.
          .when(col("post_lsn") =!= col("pre_lsn"), "updated")
          .otherwise(lit("carried")).as("action"),
        col("pre_lsn"), col("post_lsn")) ++
        imageCols.flatMap(c => Seq(col(s"pre_$c"), col(s"post_$c"))): _*)
      .filter(col("action") =!= "carried")
      // the delta is a NEW schema, not the table: pre_x/post_x aliases
      // inherit one source column's field id, and writing that pair to
      // parquet would produce duplicate ids (unreadable under id-matching)
      .transform(graft.model.Schemas.stripFieldIds)
  }
}
