package graft.sources

import java.util

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.catalyst.analysis.{NoSuchFunctionException, NoSuchTableException}
import org.apache.spark.sql.connector.catalog._
import org.apache.spark.sql.connector.catalog.functions.UnboundFunction
import org.apache.spark.sql.connector.expressions.Transform
import org.apache.spark.sql.types.StructType
import org.apache.spark.sql.util.CaseInsensitiveStringMap

import graft.lake.{LakeIO, LakeTable}

/** A Spark V2 catalog over graft lakes, addressed by PATH:
  *
  * {{{
  *   spark.conf spark.sql.catalog.graft = graft.sources.GraftCatalog
  *   SELECT * FROM graft.`/data/transcripts`
  *   SELECT * FROM graft.`/data/transcripts` VERSION AS OF 3       -- snapshot id / tag
  *   SELECT * FROM graft.`/data/transcripts` TIMESTAMP AS OF '...' -- commit time
  * }}}
  *
  * This is the FRONT DOOR for plain Spark sessions: no session extensions,
  * no temp-view registration — any SQL engine feature composes with the
  * scan ([[GraftScan]]), which prunes files from lake metadata, reports
  * bucket partitioning for storage-partitioned joins, and resolves
  * merge-on-read chains inside the reader.
  *
  * Also a [[FunctionCatalog]]: Catalyst resolves the `bucket` transform the
  * table reports against [[GraftBucketFunction]] — required for V2
  * bucketing (storage-partitioned joins) to engage.
  *
  * Tables are CREATED by the ingest/DML path (the lake's key contract,
  * bucketing, and schema identity live in its own metadata), so the
  * catalog's DDL surface is read-only: createTable/alterTable/dropTable
  * refuse with the supported alternative spelled out.
  *
  * Reference analogue: the reference exposes its stores through service
  * clients (Cassandra/ES/Mongo, jobs-core CassandraUtil.scala); Spark-first,
  * the store IS a queryable catalog.
  */
class GraftCatalog extends TableCatalog with FunctionCatalog {

  private var catalogName: String = "graft"

  override def initialize(name: String,
                          options: CaseInsensitiveStringMap): Unit = {
    catalogName = name
  }

  override def name(): String = catalogName

  private def path(ident: Identifier): String =
    (ident.namespace() :+ ident.name()).mkString("/")

  private def lakeFor(ident: Identifier): LakeTable = {
    val p = path(ident)
    if (!LakeIO.exists(s"$p/meta"))
      throw new NoSuchTableException(ident)
    new LakeTable(SparkSession.active, p)
  }

  override def listTables(namespace: Array[String]): Array[Identifier] =
    Array.empty // lakes are path-addressed; there is no namespace listing

  private val metaKinds =
    Set("files", "snapshots", "lineage", "tags", "branches", "changes")

  /** `graft.`/path/to/lake`.`files`` — the ident's NAME is a metadata
    * kind and its namespace is a lake. None when the ident addresses a
    * lake directly (or nothing at all). */
  private def metaFor(ident: Identifier,
                      version: Option[String]): Option[Table] = {
    val kind = ident.name().toLowerCase(java.util.Locale.ROOT)
    val parent = ident.namespace().mkString("/")
    if (!metaKinds.contains(kind) || parent.isEmpty ||
        !LakeIO.exists(s"$parent/meta")) None
    else {
      val spark = SparkSession.active
      val lake = new LakeTable(spark, parent)
      val label = s"graft.`$parent`.`$kind`"
      if (kind == "changes")
        Some(new GraftMetaTable(label, changesFrame(spark, lake, version)))
      else {
        if (version.isDefined) throw new UnsupportedOperationException(
          s"VERSION AS OF on `$kind` is not supported — the frame already " +
          "describes every retained snapshot; filter it instead")
        Some(new GraftMetaTable(label,
          graft.sql.GraftSql.metadataTables(spark, parent)(kind)))
      }
    }
  }

  /** The snapshot-diff change feed as a table. `version` picks the span:
    * `'from..to'` (ids or tags, from EXCLUSIVE per the feed contract),
    * a single `'to'` (that commit's delta vs its parent), or None — the
    * LAST commit's delta. Carries before/after images of every business
    * column. */
  private def changesFrame(spark: SparkSession, lake: LakeTable,
                           version: Option[String]) = {
    val head = lake.currentSnapshot.getOrElse(throw new IllegalStateException(
      s"${lake.root} has no snapshot — no changes to read"))
    def resolve(v: String): Long = v.trim.toLongOption
      .orElse(lake.tags.get(v.trim))
      .getOrElse(throw new IllegalArgumentException(
        s"'$v' is neither a snapshot id nor a tag in ${lake.root}"))
    // parentId = -1 on a root commit: diff vs the empty table (everything
    // inserted). An EXPIRED parent must fail loudly instead (between()
    // throws NoSuchElement) — diffing vs empty would fake insertions.
    def parentOf(id: Long): Long =
      lake.snapshots.find(_.snapshotId == id)
        .map(_.parentId).getOrElse(-1L)
    val (from, to) = version match {
      case None => (parentOf(head.snapshotId), head.snapshotId)
      case Some(v) if v.contains("..") =>
        val Array(a, b) = v.split("\\.\\.", 2)
        (resolve(a), resolve(b))
      case Some(v) =>
        val id = resolve(v); (parentOf(id), id)
    }
    val ks = head.keySpec
    val imageCols = head.schema.fields.map(_.name)
      .filterNot(n => n.startsWith("_") || ks.keyCols.contains(n)).toSeq
    graft.lake.ChangeFeedReader.between(spark, lake, from, to, imageCols)
  }

  override def loadTable(ident: Identifier): Table =
    metaFor(ident, None).getOrElse {
      val lake = lakeFor(ident)
      val snap = lake.currentSnapshot.getOrElse(
        throw new NoSuchTableException(ident))
      new GraftTable(lake, snap)
    }

  /** `VERSION AS OF x`: a snapshot id, or a tag/branch name (on a
    * `changes` suffix table: a `'from..to'` span). */
  override def loadTable(ident: Identifier, version: String): Table =
    metaFor(ident, Some(version)).getOrElse {
      val lake = lakeFor(ident)
      val id = version.toLongOption
        .orElse(lake.tags.get(version))
        .getOrElse(throw new NoSuchTableException(ident))
      val snap = lake.snapshots.find(_.snapshotId == id).getOrElse(
        throw new IllegalArgumentException(
          s"no snapshot $version in ${lake.root} (expired or never committed)"))
      new GraftTable(lake, snap)
    }

  /** `TIMESTAMP AS OF t` (micros since epoch, per the V2 contract). */
  override def loadTable(ident: Identifier, timestamp: Long): Table = {
    if (metaFor(ident, None).isDefined)
      throw new UnsupportedOperationException(
        s"TIMESTAMP AS OF on `${ident.name()}` is not supported — use " +
        "VERSION AS OF (snapshot ids / tags; 'from..to' on `changes`)")
    val lake = lakeFor(ident)
    val id = lake.snapshotIdAsOf(timestamp / 1000L).getOrElse(
      throw new IllegalArgumentException(
        s"${lake.root} has no snapshot committed at or before " +
        s"${java.time.Instant.ofEpochMilli(timestamp / 1000L)}"))
    new GraftTable(lake, lake.snapshots.find(_.snapshotId == id).get)
  }

  override def tableExists(ident: Identifier): Boolean =
    LakeIO.exists(s"${path(ident)}/meta")

  override def createTable(ident: Identifier, schema: StructType,
                           partitions: Array[Transform],
                           properties: util.Map[String, String]): Table =
    throw new UnsupportedOperationException(
      "graft tables are created by the ingest path (CdcDriver / CdcApply — " +
      "the key contract and bucketing live in lake metadata); CREATE TABLE " +
      "through the catalog is not supported")

  override def alterTable(ident: Identifier, changes: TableChange*): Table =
    throw new UnsupportedOperationException(
      "ALTER through the catalog is not supported — use the engine's " +
      "evolution operations (rename/dropcol CLI, additive adoption on ingest)")

  override def dropTable(ident: Identifier): Boolean =
    throw new UnsupportedOperationException(
      "DROP through the catalog is not supported — a lake is a directory; " +
      "delete it with storage tooling once nothing references it")

  override def renameTable(oldIdent: Identifier, newIdent: Identifier): Unit =
    throw new UnsupportedOperationException(
      "RENAME through the catalog is not supported (path-addressed tables)")

  // ------------------------------------------------------ FunctionCatalog
  override def listFunctions(namespace: Array[String]): Array[Identifier] =
    Array(Identifier.of(Array.empty, "bucket"))

  override def loadFunction(ident: Identifier): UnboundFunction =
    if (ident.namespace().isEmpty && ident.name() == "bucket")
      GraftBucketFunction
    else throw new NoSuchFunctionException(ident)
}
