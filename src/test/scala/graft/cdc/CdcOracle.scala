package graft.cdc

import org.apache.spark.sql.{DataFrame, Row}

/** Sequential in-memory reference fold of a changelog: the correctness
  * oracle (FIXTURES.md: "Oracle: sequential foldLeft over LSN-sorted events
  * into a Map[(conv_id, turn_idx), Turn]"). */
object CdcOracle {

  final case class Turn(
      convId: String, turnIdx: Int, role: String, text: String,
      tool: String, tsMillis: Option[Long], lsn: Long, srcPart: Int,
      srcOff: Long, toolMeta: Option[String])

  private def turnOf(r: Row, hasMeta: Boolean): Turn = Turn(
    r.getAs[String]("conv_id"), r.getAs[Int]("turn_idx"),
    r.getAs[String]("role"), r.getAs[String]("text"), r.getAs[String]("tool"),
    Option(r.getAs[java.sql.Timestamp]("ts")).map(_.getTime),
    r.getAs[Long]("_lsn"),
    r.getAs[Int]("_src_part"), r.getAs[Long]("_src_off"),
    if (hasMeta) Option(r.getAs[String]("tool_meta")) else None)

  /** Fold delivered events (any order, duplicates allowed) by ascending lsn:
    * I/U upsert, D delete; with `patchEnabled`, P overlays only its
    * non-null business fields (creating a partial row on an absent/deleted
    * key). Malformed events (null key/turn/lsn, unknown op) are skipped —
    * the engine quarantines them (CdcApply.invalidReason). */
  def fold(events: DataFrame,
           patchEnabled: Boolean = false): Map[(String, Int), Turn] = {
    val hasMeta = events.columns.contains("tool_meta")
    val validOps = if (patchEnabled) Set("I", "U", "D", "P") else Set("I", "U", "D")
    val rows = events.collect().toSeq
      .filter { r =>
        val cid = r.getAs[String]("conv_id")
        cid != null && cid.trim.nonEmpty &&
          !r.isNullAt(r.fieldIndex("turn_idx")) &&
          !r.isNullAt(r.fieldIndex("_lsn")) &&
          validOps.contains(r.getAs[String]("op"))
      }
      .map(r => (r.getAs[Long]("_lsn"), r))
      .sortBy(_._1)
    rows.foldLeft(Map.empty[(String, Int), Turn]) { case (acc, (_, r)) =>
      val key = (r.getAs[String]("conv_id"), r.getAs[Int]("turn_idx"))
      r.getAs[String]("op") match {
        case "D" => acc - key
        case "P" =>
          val t = turnOf(r, hasMeta)
          // explicit column clears (unset_cols): applied after sets
          val unset: Set[String] =
            if (!r.schema.fieldNames.contains("unset_cols")) Set.empty
            else Option(r.getAs[scala.collection.Seq[String]]("unset_cols"))
              .map(_.toSet).getOrElse(Set.empty)
          val base = acc.getOrElse(key,
            Turn(key._1, key._2, null, null, null, None, t.lsn, t.srcPart,
              t.srcOff, None))
          acc + (key -> base.copy(
            role = if (unset("role")) null
              else if (t.role != null) t.role else base.role,
            text = if (unset("text")) null
              else if (t.text != null) t.text else base.text,
            tool = if (unset("tool")) null
              else if (t.tool != null) t.tool else base.tool,
            tsMillis = if (unset("ts")) None
              else t.tsMillis.orElse(base.tsMillis),
            toolMeta = if (unset("tool_meta")) None
              else t.toolMeta.orElse(base.toolMeta),
            lsn = t.lsn, srcPart = t.srcPart, srcOff = t.srcOff))
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
