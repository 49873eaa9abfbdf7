package graft.sources

import org.apache.spark.sql.connector.expressions.{Expression => V2Expression, GeneralScalarExpression, Literal => V2Literal, NamedReference}
import org.apache.spark.sql.connector.expressions.filter.Predicate
import org.apache.spark.sql.types._

/** Renders the V2 `Predicate` tree Spark hands to `SupportsDeleteV2` back
  * into a Spark-SQL boolean expression, so the catalog's `DELETE FROM`
  * rides the SAME validated merge as the engine's own DML
  * ([[graft.sql.GraftDml.delete]] takes a WHERE string).
  *
  * Deliberately conservative: only predicates whose evaluation the engine
  * can reproduce EXACTLY round-trip (comparisons, null tests, boolean
  * connectives, IN — over top-level columns and plain literals). Anything
  * else returns None and `canDeleteWhere` refuses, so Spark reports the
  * unsupported condition at ANALYSIS time instead of the engine guessing
  * semantics at run time.
  *
  * Literals render through type-faithful constructors
  * (`timestamp_micros`, `date_from_unix_date`) rather than formatted
  * strings, so the round-trip is independent of the session time zone.
  */
object V2PredicateSql {

  /** SQL for the conjunction, or None if any conjunct is untranslatable. */
  def conjunction(predicates: Array[Predicate]): Option[String] =
    if (predicates.isEmpty) Some("true")
    else {
      val parts = predicates.toSeq.map(translate)
      if (parts.exists(_.isEmpty)) None
      else Some(parts.flatten.mkString("(", ") AND (", ")"))
    }

  def translate(e: V2Expression): Option[String] = e match {
    case g: GeneralScalarExpression =>
      val kids = g.children()
      g.name() match {
        case "ALWAYS_TRUE" => Some("true")
        case "ALWAYS_FALSE" => Some("false")
        case "AND" | "OR" =>
          for { l <- translate(kids(0)); r <- translate(kids(1)) }
            yield s"($l) ${g.name()} ($r)"
        case "NOT" => translate(kids(0)).map(c => s"NOT ($c)")
        case "IS_NULL" => translate(kids(0)).map(c => s"($c) IS NULL")
        case "IS_NOT_NULL" => translate(kids(0)).map(c => s"($c) IS NOT NULL")
        case op @ ("=" | "<>" | "<" | "<=" | ">" | ">=") =>
          for { l <- translate(kids(0)); r <- translate(kids(1)) }
            yield s"($l) $op ($r)"
        case "IN" =>
          val vals = kids.drop(1).toSeq.map(translate)
          if (vals.exists(_.isEmpty)) None
          else translate(kids(0)).map(c =>
            s"($c) IN (${vals.flatten.mkString(", ")})")
        case _ => None
      }
    case r: NamedReference =>
      // nested fields are out: the merge's predicate contract is top-level
      r.fieldNames() match {
        case Array(one) => Some(s"`${one.replace("`", "``")}`")
        case _ => None
      }
    case l: V2Literal[_] => literalSql(l.value(), l.dataType())
    case _ => None
  }

  /** Parser-mode-independent string literal: how a quoted literal reads
    * back depends on `spark.sql.parser.escapedStringLiterals` (a backslash
    * is an escape char in the default mode but a plain character in the
    * legacy mode), so any string that would need escaping renders as
    * `decode(unhex('…'), 'UTF-8')` — byte-exact under every parser conf.
    * Benign strings keep the readable quoted form. */
  private def stringSql(s: String): String =
    if (s.forall(c => c != '\'' && c != '\\' && c >= ' ')) s"'$s'"
    else {
      val hex = s.getBytes("UTF-8").map(b => f"$b%02x").mkString
      s"decode(unhex('$hex'), 'UTF-8')"
    }

  private def literalSql(v: Any, dt: DataType): Option[String] = (v, dt) match {
    case (null, _) => Some("NULL")
    case (s: org.apache.spark.unsafe.types.UTF8String, _: StringType) =>
      Some(stringSql(s.toString))
    case (s: String, _: StringType) =>
      Some(stringSql(s))
    case (b: java.lang.Boolean, BooleanType) => Some(b.toString)
    case (n: java.lang.Number, ByteType | ShortType | IntegerType) =>
      Some(n.intValue().toString)
    case (n: java.lang.Number, LongType) => Some(n.longValue().toString + "L")
    case (n: java.lang.Number, FloatType | DoubleType) =>
      val d = n.doubleValue()
      if (d.isNaN || d.isInfinite) None else Some(s"CAST($d AS DOUBLE)")
    case (d: java.math.BigDecimal, t: DecimalType) =>
      Some(s"CAST(${d.toPlainString} AS DECIMAL(${t.precision},${t.scale}))")
    case (d: org.apache.spark.sql.types.Decimal, t: DecimalType) =>
      Some(s"CAST(${d.toJavaBigDecimal.toPlainString} " +
        s"AS DECIMAL(${t.precision},${t.scale}))")
    case (days: java.lang.Integer, DateType) =>
      Some(s"date_from_unix_date($days)")
    case (micros: java.lang.Long, TimestampType) =>
      Some(s"timestamp_micros(${micros}L)")
    case _ => None
  }
}
