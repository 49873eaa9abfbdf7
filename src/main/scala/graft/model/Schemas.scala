package graft.model

import org.apache.spark.sql.types._

/**
 * Core data contracts of the CDC engine (SURVEY.md §7.1).
 *
 * The changelog event mirrors the reference's envelope identity/ordering
 * fields: the dedup/order token `lsn` plays the role of the reference's
 * event checksum + timestamp (reference: jobs-core Event.scala:15-19,54-56),
 * and (src_partition, src_offset) is the Kafka lineage pair the reference
 * carries on JobRequest (reference: JobRequestSerde.scala:22-35).
 */
object Schemas {

  /** Target lake-table business columns (BASELINE.json input_hint).
    * Key columns are declared nullable because a real changelog contains
    * garbage: the engine validates and quarantines rather than assuming
    * the feed honors the contract (CdcApply.invalidReason). */
  val transcriptFields: Seq[StructField] = Seq(
    StructField("conv_id", StringType, nullable = true),
    StructField("turn_idx", IntegerType, nullable = true),
    StructField("role", StringType, nullable = true),
    StructField("text", StringType, nullable = true),
    StructField("tool", StringType, nullable = true),
    StructField("ts", TimestampType, nullable = true)
  )

  /** Engine metadata columns persisted in the lake table rows: the change
    * sequence that won LWW for this row plus its source lineage. */
  val metaFields: Seq[StructField] = Seq(
    StructField("_lsn", LongType, nullable = true),
    StructField("_src_part", IntegerType, nullable = true),
    StructField("_src_off", LongType, nullable = true)
  )

  /** Changelog event schema (v1, before schema evolution). */
  val changeEventSchema: StructType = StructType(
    StructField("op", StringType, nullable = true) +:
      transcriptFields ++: metaFields
  )

  /** Additive evolution column that appears mid-stream (FIXTURES.md §2.3.6). */
  val evolutionField: StructField =
    StructField("tool_meta", StringType, nullable = true)

  /** Changelog event schema (v2, after additive evolution). */
  val changeEventSchemaV2: StructType =
    StructType(changeEventSchema.fields :+ evolutionField)

  /** Tombstone marker column persisted on lake rows (deletes keep their lsn
    * so out-of-order re-deliveries cannot resurrect keys; public reads
    * filter it — LakeTable.read). */
  val tombstoneField: StructField =
    StructField("_tombstone", BooleanType, nullable = false)

  /** Lake row schema for an event schema: business cols + engine meta cols
    * (op replaced by the persisted tombstone flag). */
  def lakeSchemaFor(eventSchema: StructType): StructType =
    StructType(eventSchema.fields.filterNot(_.name == "op") :+ tombstoneField)

  val keyCols: Seq[String] = Seq("conv_id", "turn_idx")

  val OpInsert = "I"
  val OpUpdate = "U"
  val OpDelete = "D"

  /** Partial-column (patch) update: only the event's NON-NULL business
    * columns overwrite the current image; null means "not set" (the
    * Debezium-partial-image convention). Opt-in via `patchEnabled` — the
    * reference's map put-all / field-level hash update semantics
    * (ActivityAggregatesFunction.scala:301-310,
    * user-cache-updater-2.0 UserMetadataUpdater.scala:86-105). */
  val OpPatch = "P"
}
