package graft.sources

import java.util

import org.apache.spark.rdd.RDD
import org.apache.spark.sql.{DataFrame, Row, SQLContext}
import org.apache.spark.sql.connector.catalog.{SupportsRead, Table, TableCapability}
import org.apache.spark.sql.connector.read.{Scan, ScanBuilder, V1Scan}
import org.apache.spark.sql.sources.{BaseRelation, TableScan}
import org.apache.spark.sql.types.StructType
import org.apache.spark.sql.util.CaseInsensitiveStringMap

/** A lake's BOOKKEEPING as suffix tables through the catalog,
  * Iceberg-style (`db.table.files`):
  *
  * {{{
  *   SELECT * FROM graft.`/data/transcripts`.`files`
  *   SELECT * FROM graft.`/data/transcripts`.`snapshots`
  *   SELECT * FROM graft.`/data/transcripts`.`changes`                -- last commit's delta
  *   SELECT * FROM graft.`/data/transcripts`.`changes` VERSION AS OF '3..7'
  * }}}
  *
  * Kinds `files | snapshots | lineage | tags | branches` reuse the
  * driver-built frames of [[graft.sql.GraftSql.metadataTables]] (O(metadata));
  * `changes` is the snapshot-diff feed ([[graft.lake.ChangeFeedReader]]) —
  * a genuinely distributed plan, carrying before/after images of every
  * business column (the Debezium envelope).
  *
  * All of these read through Spark's [[V1Scan]] bridge: the frame is
  * already a full Catalyst plan (or a local relation), so re-expressing it
  * as a V2 Batch would only re-wrap RDD partitions the plan produces
  * anyway. Read-only by construction.
  */
final class GraftMetaTable(ident: String, df: DataFrame)
    extends Table with SupportsRead {

  override def name(): String = ident

  override def schema(): StructType = df.schema

  override def capabilities(): util.Set[TableCapability] = {
    val s = new util.HashSet[TableCapability]()
    s.add(TableCapability.BATCH_READ)
    s
  }

  override def newScanBuilder(options: CaseInsensitiveStringMap): ScanBuilder =
    new ScanBuilder {
      override def build(): Scan = new V1Scan {
        override def readSchema(): StructType = df.schema
        override def description(): String = ident
        override def toV1TableScan[T <: BaseRelation with TableScan](
            context: SQLContext): T =
          new BaseRelation with TableScan {
            override def sqlContext: SQLContext = context
            override def schema: StructType = df.schema
            override def buildScan(): RDD[Row] = df.rdd
          }.asInstanceOf[T]
      }
    }
}
