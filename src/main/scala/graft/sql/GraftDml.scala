package graft.sql

import org.apache.spark.sql.functions._

import graft.cdc.CdcApply
import graft.lake.{LakeTable, PartitionLineage}
import graft.model.Schemas

/**
 * SQL DML over a graft lake: `DELETE FROM t WHERE …` and
 * `UPDATE t SET c = expr, … WHERE …`, compiled into ONE synthesized change
 * batch applied through the same epoch-fenced MERGE as source batches
 * (the CrossMerge pattern) — so exactly-once fencing, tombstone persistence,
 * change-feed accounting, derived-table maintenance (via touchedSet), time
 * travel and commit-race retry all hold for admin mutations exactly as for
 * CDC ingest. The reference's equivalent is its admin-triggered state
 * rewrites (e.g. merge-user-courses deleting consumed source rows,
 * lms-jobs/merge-user-courses/.../MergeOperations.scala:49-99) — restated
 * here as declarative predicates instead of per-key client calls.
 *
 * Scale shape: the matched-row read goes through [[GraftSql.table]], so the
 * WHERE clause file-prunes (zone maps, bucket + key-range, bloom) before any
 * data IO; the write rewrites only the matched rows' buckets (copy-on-write)
 * or appends per-bucket deltas (merge-on-read). A predicate touching 0.1% of
 * a 100 TB table reads and writes ~0.1% of it.
 *
 * Semantics:
 *  - DELETE persists tombstones at an lsn above every stored lsn of the
 *    touched buckets, so late re-deliveries of older images cannot resurrect
 *    the keys (same discipline as feed deletes).
 *  - UPDATE writes full-image upserts computed from the current LWW winners
 *    (merge-on-read chains are resolved before the SET expressions apply).
 *  - `SET new_col = expr` on a column the table lacks ADDS it through the
 *    normal additive schema evolution; an incompatible type change fails
 *    loudly (CdcApply widening rules).
 *  - Key columns and internal `_` columns cannot be SET (identity moves are
 *    [[graft.cdc.CrossMerge]] territory).
 *  - The commit is a MAINTENANCE commit: it keeps the current epoch, so the
 *    next source segment / streaming batch is never fenced out by an admin
 *    mutation. Concurrency: a source commit landing mid-DML surfaces as a
 *    commit conflict and the whole statement recomputes against the winner's
 *    state (bounded attempts) — the mutation lands on current state or fails
 *    loudly, never silently.
 */
object GraftDml {

  /** Parse and run one DML statement. The table name in the statement is
    * documentation only — the lake IS the table. */
  def sql(lake: LakeTable, statement: String,
          maxAttempts: Int = 5): CdcApply.ApplyStats = {
    val s = statement.trim
    val lower = s.toLowerCase(java.util.Locale.ROOT)
    if (lower.startsWith("delete")) {
      val afterFrom = keywordTail(s, "delete", "from")
      val wi = topLevelKeyword(afterFrom, "where").getOrElse(
        throw new IllegalArgumentException(
          "DELETE requires a WHERE clause (use WHERE true to match all rows)"))
      delete(lake, afterFrom.substring(wi + "where".length).trim, maxAttempts)
    } else if (lower.startsWith("update")) {
      val afterSet = keywordTail(s, "update", "set")
      val wi = topLevelKeyword(afterSet, "where").getOrElse(
        throw new IllegalArgumentException(
          "UPDATE requires a WHERE clause (use WHERE true to match all rows)"))
      val sets = splitTopLevel(afterSet.substring(0, wi), ',').map { a =>
        val eq = a.indexOf('=')
        require(eq > 0, s"malformed assignment: $a")
        (a.substring(0, eq).trim, a.substring(eq + 1).trim)
      }
      update(lake, sets, afterSet.substring(wi + "where".length).trim,
        maxAttempts)
    } else throw new IllegalArgumentException(
      s"unsupported DML (DELETE FROM … WHERE … | UPDATE … SET … WHERE …): $s")
  }

  /** Tombstone every live row matching `whereSql`. */
  def delete(lake: LakeTable, whereSql: String,
             maxAttempts: Int = 5): CdcApply.ApplyStats =
    withConflictRetry(maxAttempts) { once(lake, None, whereSql) }

  /** Rewrite every live row matching `whereSql` with the SET expressions
    * applied (full-image upserts from the current winners). */
  def update(lake: LakeTable, sets: Seq[(String, String)], whereSql: String,
             maxAttempts: Int = 5): CdcApply.ApplyStats = {
    require(sets.nonEmpty, "UPDATE needs at least one SET assignment")
    val names = sets.map(_._1)
    require(names.distinct.size == names.size,
      s"duplicate SET columns: ${names.mkString(", ")}")
    withConflictRetry(maxAttempts) { once(lake, Some(sets), whereSql) }
  }

  private def withConflictRetry(maxAttempts: Int)(
      body: => CdcApply.ApplyStats): CdcApply.ApplyStats = {
    var last: graft.lake.CommitConflictException = null
    var attempt = 0
    while (attempt < maxAttempts) {
      attempt += 1
      try return body
      catch { case e: graft.lake.CommitConflictException => last = e }
    }
    throw new graft.lake.CommitConflictException(
      s"DML lost $maxAttempts commit races: ${last.getMessage}")
  }

  private def once(lake: LakeTable, sets: Option[Seq[(String, String)]],
                   whereSql: String): CdcApply.ApplyStats = {
    val spark = lake.spark
    val snap = lake.currentSnapshot.getOrElse(
      throw new IllegalStateException(
        s"no snapshot committed in ${lake.root} — nothing to mutate"))
    val ks = snap.keySpec
    sets.foreach(_.foreach { case (c, _) =>
      require(!ks.keyCols.contains(c),
        s"key column $c cannot be SET — identity moves are CrossMerge " +
        "territory (delete + re-insert under the new key)")
      require(!c.startsWith("_") && c != "op",
        s"internal column $c cannot be SET")
    })
    // Matched LIVE rows through the pruned SQL relation, pinned to `snap`
    // (snapshot isolation: the maintenance apply below conflicts loudly if
    // the table moved, and the caller's retry recomputes from fresh state).
    val matched = GraftSql.table(spark, lake.root, asOf = snap.snapshotId)
      .filter(expr(whereSql))
    // One probe job: the matched buckets AND the matched row count.
    val probe = matched
      .groupBy(CdcApply.bucketOfCols(ks.bucketCols.map(col), snap.nBuckets)
        .as("b"))
      .count().collect()
    val buckets = probe.map(_.getInt(0)).toSet
    val nMatched = probe.map(_.getLong(1)).sum
    if (nMatched == 0)
      return CdcApply.ApplyStats(snap, skipped = true, 0, 0, 0, 0.0)
    // Synthesized lsn: strictly above every STORED lsn of the touched
    // buckets — including tombstones and superseded MoR chain versions
    // (readBuckets is the raw read) — so a late re-delivery of an older
    // image can never beat the administrative mutation.
    val maxRow = lake.readBuckets(Some(buckets)).agg(max("_lsn")).head()
    val synthLsn = (if (maxRow.isNullAt(0)) 0L else maxRow.getLong(0)) + 1
    val mutated = sets match {
      case None => matched.withColumn("op", lit(Schemas.OpDelete))
      case Some(ss) =>
        ss.foldLeft(matched) { case (df, (c, e)) => df.withColumn(c, expr(e)) }
          .withColumn("op", lit(Schemas.OpUpdate))
    }
    val batch = mutated
      .withColumn("_lsn", lit(synthLsn))
      .withColumn("_src_part", lit(-1)) // engine-synthesized, not source data
      .withColumn("_src_off", lit(synthLsn))
    // `buckets` is provably complete: every batch row's bucket values come
    // from matched rows, whose buckets are exactly `buckets`. (On MoR tables
    // the hint is unused — appends derive touched from the written files.)
    CdcApply.apply(lake, batch, epoch = snap.epoch, nBuckets = snap.nBuckets,
      maintenance = true, validate = false,
      probeInfo = Some(CdcApply.ProbeInfo(nMatched,
        Seq(PartitionLineage(-1, synthLsn, synthLsn)))),
      touchedHint = Some(buckets))
  }

  // ------------------------------------------------------------- parsing

  /** Tail of `s` after leading keyword `k1`, the table name, and keyword
    * `k2` ("delete from <t> …" → tail after <t>; "update <t> set …" → tail
    * after set). Case-insensitive, whitespace-tolerant. */
  private def keywordTail(s: String, k1: String, k2: String): String = {
    val toks = s.split("\\s+", 4)
    val (t2, rest) =
      if (k1 == "delete") {
        require(toks.length >= 4 && toks(1).equalsIgnoreCase(k2),
          s"malformed $k1 statement: $s")
        (toks(2), toks(3))
      } else {
        require(toks.length >= 4 && toks(2).equalsIgnoreCase(k2),
          s"malformed $k1 statement: $s")
        (toks(1), toks(3))
      }
    require(t2.nonEmpty, s"missing table name in: $s")
    rest
  }

  /** Index of the first occurrence of word `kw` at paren/quote depth 0,
    * on its own word boundaries; None if absent. */
  private def topLevelKeyword(s: String, kw: String): Option[Int] = {
    var i = 0; var depth = 0; var quote: Char = 0
    val n = s.length; val k = kw.length
    while (i < n) {
      val c = s.charAt(i)
      if (quote != 0) {
        if (c == quote) quote = 0
        i += 1
      } else c match {
        case '\'' | '"' | '`' => quote = c; i += 1
        case '(' => depth += 1; i += 1
        case ')' => depth -= 1; i += 1
        case _ =>
          if (depth == 0 && s.regionMatches(true, i, kw, 0, k) &&
              (i == 0 || !Character.isLetterOrDigit(s.charAt(i - 1))) &&
              (i + k >= n || !Character.isLetterOrDigit(s.charAt(i + k))))
            return Some(i)
          i += 1
      }
    }
    None
  }

  /** Split on `sep` at paren/quote depth 0 (SET lists whose expressions
    * contain commas inside function calls or string literals). */
  private def splitTopLevel(s: String, sep: Char): Seq[String] = {
    val out = Seq.newBuilder[String]
    var start = 0; var i = 0; var depth = 0; var quote: Char = 0
    while (i < s.length) {
      val c = s.charAt(i)
      if (quote != 0) { if (c == quote) quote = 0 }
      else c match {
        case '\'' | '"' | '`' => quote = c
        case '(' => depth += 1
        case ')' => depth -= 1
        case `sep` if depth == 0 =>
          out += s.substring(start, i); start = i + 1
        case _ =>
      }
      i += 1
    }
    out += s.substring(start)
    out.result().map(_.trim).filter(_.nonEmpty)
  }
}
