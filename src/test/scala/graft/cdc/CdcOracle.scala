package graft.cdc

import org.apache.spark.sql.{DataFrame, Row}

/** Sequential in-memory reference fold of a changelog: the correctness
  * oracle (FIXTURES.md: "Oracle: sequential foldLeft over LSN-sorted events
  * into a Map[(conv_id, turn_idx), Turn]"). */
object CdcOracle {

  final case class Turn(
      convId: String, turnIdx: Int, role: String, text: String,
      tool: String, tsMillis: Long, lsn: Long, srcPart: Int, srcOff: Long,
      toolMeta: Option[String])

  private def turnOf(r: Row, hasMeta: Boolean): Turn = Turn(
    r.getAs[String]("conv_id"), r.getAs[Int]("turn_idx"),
    r.getAs[String]("role"), r.getAs[String]("text"), r.getAs[String]("tool"),
    r.getAs[java.sql.Timestamp]("ts").getTime, r.getAs[Long]("_lsn"),
    r.getAs[Int]("_src_part"), r.getAs[Long]("_src_off"),
    if (hasMeta) Option(r.getAs[String]("tool_meta")) else None)

  /** Fold delivered events (any order, duplicates allowed) by ascending lsn:
    * I/U upsert, D delete. Malformed events (null key/turn/lsn, unknown op)
    * are skipped — the engine quarantines them (CdcApply.invalidReason). */
  def fold(events: DataFrame): Map[(String, Int), Turn] = {
    val hasMeta = events.columns.contains("tool_meta")
    val rows = events.collect().toSeq
      .filter { r =>
        val cid = r.getAs[String]("conv_id")
        cid != null && cid.trim.nonEmpty &&
          !r.isNullAt(r.fieldIndex("turn_idx")) &&
          !r.isNullAt(r.fieldIndex("_lsn")) &&
          Set("I", "U", "D").contains(r.getAs[String]("op"))
      }
      .map(r => (r.getAs[Long]("_lsn"), r))
      .sortBy(_._1)
    rows.foldLeft(Map.empty[(String, Int), Turn]) { case (acc, (_, r)) =>
      val key = (r.getAs[String]("conv_id"), r.getAs[Int]("turn_idx"))
      r.getAs[String]("op") match {
        case "D" => acc - key
        case _ => acc + (key -> turnOf(r, hasMeta))
      }
    }
  }

  /** Read the lake table into the same shape for comparison. */
  def tableState(table: DataFrame): Map[(String, Int), Turn] = {
    val hasMeta = table.columns.contains("tool_meta")
    table.collect().toSeq.map { r =>
      (r.getAs[String]("conv_id"), r.getAs[Int]("turn_idx")) -> turnOf(r, hasMeta)
    }.toMap
  }
}
