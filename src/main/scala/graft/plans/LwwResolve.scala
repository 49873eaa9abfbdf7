package graft.plans

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

import graft.model.Schemas

/**
 * Read-side LWW resolution for merge-on-read (MoR) tables: collapse a
 * multi-version row set (base rows + appended delta rows, every row carrying
 * `_lsn` and `_tombstone`) to one winning version per key.
 *
 * This is the read half of the LSM trade the ingest path makes when a lake
 * runs in append mode (CdcApply `mor`): writes stop paying copy-on-write
 * amplification, reads pay one clustering exchange + sort to elect winners.
 * The plan is the same shape as the merge's own winner election —
 * Exchange -> Project(_kh,_bk) -> Sort -> SortedLwwDedup — so the
 * resolution streams with O(1) memory per task instead of buffering window
 * groups (see [[SortedLwwDedup]] for why WindowExec is the wrong operator
 * here). Tombstones are NOT filtered: a tombstone can be the winner, and
 * callers differ on whether they need to see it (public reads drop it,
 * compaction keeps it until the watermark allows dropping).
 *
 * Ties on `_lsn` (a redelivered duplicate appended in two different
 * batches) are byte-identical rows, so the arbitrary tie winner is
 * deterministic in content.
 */
object LwwResolve {

  /** One live version per key of `df` (which must carry the key columns,
    * `_lsn`, and — if deletes exist — `_tombstone`). `nPart` sizes the
    * clustering exchange; every key stays whole within a task because the
    * partitioning is a function of the bucket columns. */
  def resolve(df: DataFrame, ks: Schemas.KeySpec, nB: Int,
              nPart: Int): DataFrame = {
    require(nB <= (1 << 17), s"bucket count $nB exceeds the 17-bit _bk field")
    val withB = df.withColumn("_rb",
      graft.cdc.CdcApply.bucketOfCols(ks.bucketCols.map(col), nB))
    val orderSpec: Seq[(String, Boolean)] =
      (("_bk" -> false) +: ("_kh" -> false) +: ks.keyCols.map(_ -> false)) :+
        ("_lsn" -> true)
    val sorted = withB
      .repartition(math.max(nPart, 1), col("_rb"))
      .withColumn("_kh", xxhash64(ks.bucketCols.map(col): _*))
      .withColumn("_bk", shiftleft(col("_rb").cast("long"), 46)
        .bitwiseOR(shiftrightunsigned(col("_kh"), 18)))
      .sortWithinPartitions(orderSpec.map { case (n, desc) =>
        if (desc) col(n).desc else col(n)
      }: _*)
    SortedLwwDedup.dedup(sorted, Seq("_rb"), "_kh" +: ks.keyCols, orderSpec,
      rollupCol = None)
      .drop("_rb", "_kh", "_bk")
  }
}
