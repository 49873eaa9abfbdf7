package graft.changelog

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/**
 * Deterministic, fully-distributed synthetic changelog generator.
 *
 * Produces the "binlog/WAL" the CDC engine tails: segment directories
 * `seg=N/` of parquet change events over a transcripts table keyed by
 * (conv_id, turn_idx). Every field is a pure Catalyst expression of the
 * global delivery index `i` (via xxhash64), so the output is byte-identical
 * regardless of parallelism or partitioning — no RNG state, no driver loop.
 *
 * Modeled behaviours (mirroring the reference's fixture scenarios,
 * FIXTURES.md §2.3):
 *  - inserts / updates / deletes on (conv_id, turn_idx) with strictly
 *    increasing lsn (= effective event index),
 *  - at-least-once duplicate deliveries: a delivery slot can re-emit an
 *    EARLIER event verbatim (same lsn/payload), possibly in a later segment
 *    (reference analogue: Kafka redelivery + Redis-checksum dedup,
 *    DeDupEngine.scala:23-42),
 *  - zipf-ish hot-conversation skew (reference analogue: explicit window
 *    shards, ActivityAggregateUpdaterStreamTask.scala:80-86),
 *  - additive schema evolution: `tool_meta` column appears from a cut-in
 *    delivery index onward (segments before are written without it).
 */
object ChangelogGen {

  final case class Config(
      nEvents: Long,
      nConvs: Long = 1000L,
      turnsPerConv: Int = 50,
      pUpdate: Double = 0.30,
      pDelete: Double = 0.05,
      pDup: Double = 0.05,
      /** >1.0 concentrates events on low conv indices (hot conversations). */
      skew: Double = 1.0,
      nSrcPartitions: Int = 8,
      segSize: Long = 100000L,
      /** delivery index at which tool_meta starts existing; <0 = never. */
      evolveAt: Long = -1L,
      /** widening evolution: when >= 0 the changelog carries a numeric
        * `latency_ms` column that is INT32 in segments before this delivery
        * index and INT64 (with values beyond 2^31) from it onward — the
        * counter-outgrows-its-type case Schemas.widen promotes. <0 = no
        * such column. */
      widenAt: Long = -1L,
      /** probability an event is malformed (null key / null turn / bad op)
        * — exercises the dead-letter quarantine path. */
      pBad: Double = 0.0,
      /** probability of a partial-column patch event (op='P': only a hashed
        * subset of role/text/ts is set, the rest null = untouched). */
      pPatch: Double = 0.0,
      /** probability a patch event also CLEARS columns via `unset_cols`
        * (Schemas.UnsetCol): a hashed subset of its untouched columns is
        * explicitly unset. >0 adds the unset_cols column to the changelog. */
      pUnset: Double = 0.0,
      /** parquet files per (segment, source partition) — a real binlog
        * archive is one file chain per shard; >1 adds scan parallelism. */
      filesPerSeg: Int = 2,
      seed: Long = 42L
  ) {
    // a zero segment size divides silently into garbage segment numbers
    // (CLI gen with a misplaced 0 positional produced an empty changelog
    // and exit 0 — a silent no-op a replay then reports as "drained")
    require(segSize > 0, s"segSize must be positive, got $segSize")
    require(nEvents > 0 && nConvs > 0,
      s"nEvents/nConvs must be positive, got $nEvents/$nConvs")
  }

  private val vocab: Seq[String] = Seq(
    "the", "fast", "key", "order", "sort", "table", "scan", "merge", "part",
    "window", "small", "hash", "join", "batch", "stream", "spark", "dup",
    "group", "query", "row", "data", "slow", "filter", "customer", "line",
    "value", "agg", "column", "big", "vector", "a", "turn", "tool", "model",
    "chat", "reply", "plan", "code", "test", "run")

  /** Build the change-event DataFrame for delivery indices [lo, hi).
    * `latWide`: this chunk writes `latency_ms` as long (post-widenAt
    * segments); the VALUE stays a pure function of the effective event
    * index, so a verbatim redelivery of a pre-cut event carries its
    * original (int-range) value regardless of the chunk's column type. */
  def events(spark: SparkSession, cfg: Config, lo: Long, hi: Long,
             withEvolution: Boolean, latWide: Boolean = false): DataFrame = {
    val df = spark.range(lo, hi).toDF("i")

    def h(c: org.apache.spark.sql.Column, salt: String) =
      xxhash64(c, lit(cfg.seed), lit(salt))
    // uniform in [0,1) derived from a 64-bit hash
    def u01(c: org.apache.spark.sql.Column, salt: String) =
      (pmod(h(c, salt), lit(1000000L)).cast("double")) / 1000000.0

    // At-least-once duplicate delivery: slot i may re-deliver event i-d.
    val isDup = (u01(col("i"), "dup") < cfg.pDup) && (col("i") > 0)
    val back = pmod(h(col("i"), "dupoff"), lit(64L)) + 1L
    val eRaw = when(isDup, greatest(col("i") - back, lit(0L))).otherwise(col("i"))
    val withE = df.withColumn("e", eRaw)

    val e = col("e")
    // zipf-ish conversation pick: skew>1 concentrates on low indices
    val convIdx = floor(lit(cfg.nConvs.toDouble) *
      pow(u01(e, "conv"), lit(cfg.skew))).cast("long")
    val convId = concat(lit("conv-"), lpad(convIdx.cast("string"), 8, "0"))
    val turnIdx = pmod(h(e, "turn"), lit(cfg.turnsPerConv.toLong)).cast("int")

    val opR = u01(e, "op")
    val opClean = when(opR < cfg.pDelete, lit("D"))
      .when(opR < cfg.pDelete + cfg.pUpdate, lit("U"))
      .when(opR < cfg.pDelete + cfg.pUpdate + cfg.pPatch, lit("P"))
      .otherwise(lit("I"))

    // Malformed events (deterministic like everything else): kind 0 nulls
    // the key, kind 1 nulls the turn index, kind 2 emits an unknown op —
    // each must land in the quarantine, never in the merge.
    val isBad = u01(e, "bad") < cfg.pBad
    val badKind = pmod(h(e, "badkind"), lit(3L))
    val op = when(isBad && badKind === 2, lit("X")).otherwise(opClean)

    val roleIdx = pmod(h(e, "role"), lit(4L)).cast("int")
    val role = element_at(
      array(lit("user"), lit("assistant"), lit("system"), lit("tool")),
      roleIdx + 1)
    val tool = when(role === "tool",
      concat(lit("tool-"), pmod(h(e, "tool"), lit(7L)).cast("string")))
      .otherwise(lit(null).cast("string"))

    val vocabArr = array(vocab.map(lit): _*)
    val nWords = (pmod(h(e, "len"), lit(17L)) + lit(8L)).cast("int")
    val text = concat_ws(" ",
      transform(sequence(lit(0), nWords),
        w => element_at(vocabArr,
          (pmod(xxhash64(e, w, lit(cfg.seed)), lit(vocab.size.toLong)) + 1L)
            .cast("int"))))

    val ts = timestamp_seconds(lit(1700000000L) + e)
    val srcPart = pmod(xxhash64(convId), lit(cfg.nSrcPartitions.toLong)).cast("int")

    // Patch events set only a hashed non-empty subset of (role, text, ts);
    // unset columns are null ("not touched"), and tool is never patched.
    val isP = op === "P"
    val pbits = pmod(h(e, "pbits"), lit(8L))
    val setRole = pbits.bitwiseAND(lit(1L)) === 1L
    val setText = (pbits.bitwiseAND(lit(2L)) === 2L) || pbits === 0L
    val setTs = pbits.bitwiseAND(lit(4L)) === 4L

    val base = withE
      .withColumn("op", op)
      .withColumn("conv_id",
        when(isBad && badKind === 0, lit(null).cast("string")).otherwise(convId))
      .withColumn("turn_idx",
        when(isBad && badKind === 1, lit(null).cast("int")).otherwise(turnIdx))
      .withColumn("role",
        when(isP && !setRole, lit(null).cast("string")).otherwise(role))
      .withColumn("text",
        when(isP && !setText, lit(null).cast("string")).otherwise(text))
      .withColumn("tool", when(isP, lit(null).cast("string")).otherwise(tool))
      .withColumn("ts", when(isP && !setTs, lit(null).cast("timestamp")).otherwise(ts))
      .withColumn("_lsn", e)
      .withColumn("_src_part", srcPart)
      .withColumn("_src_off", e)

    // Explicit column clears: a patch may unset a hashed subset of the
    // columns it did NOT set (role and/or ts), carried in unset_cols.
    val doUnset = isP && (u01(e, "unset") < cfg.pUnset)
    val ubits = pmod(h(e, "ubits"), lit(3L)) + 1L // 1..3: role, ts, both
    val base2 =
      if (cfg.pUnset <= 0) base
      else base.withColumn(graft.model.Schemas.UnsetCol,
        when(doUnset, array_remove(array(
          when(!setRole && ubits.bitwiseAND(lit(1L)) === 1L, lit("role"))
            .otherwise(lit("")),
          when(!setTs && ubits.bitwiseAND(lit(2L)) === 2L, lit("ts"))
            .otherwise(lit(""))), ""))
          .otherwise(lit(null).cast("array<string>")))

    val base3 =
      if (cfg.widenAt < 0) base2
      else {
        val latBase = pmod(h(e, "lat"), lit(1000000L))
        val lat = when(e >= cfg.widenAt, latBase + lit(3000000000L))
          .otherwise(latBase)
        base2.withColumn("latency_ms",
          if (latWide) lat.cast("long") else lat.cast("int"))
      }
    val withMeta =
      if (withEvolution) base3.withColumn("tool_meta",
        when(e >= cfg.evolveAt && !isP,
          concat(lit("""{"v":"""), pmod(h(e, "tm"), lit(100L)).cast("string"),
            lit("}"))).otherwise(lit(null).cast("string")))
      else base3

    val cols = Seq("op", "conv_id", "turn_idx", "role", "text", "tool", "ts",
      "_lsn", "_src_part", "_src_off") ++
      (if (cfg.widenAt >= 0) Seq("latency_ms") else Nil) ++
      (if (cfg.pUnset > 0) Seq(graft.model.Schemas.UnsetCol) else Nil) ++
      (if (withEvolution) Seq("tool_meta") else Nil)
    withMeta.withColumn("seg", (col("i") / cfg.segSize).cast("long"))
      .select((cols :+ "seg").map(col): _*)
  }

  /** Write the changelog as `dir/seg=N/p=P/` parquet directories — one file
    * chain per (segment, source partition), the layout of a real sharded
    * binlog/WAL archive. The `p` path value duplicates the `_src_part` data
    * column so that tailers can derive per-partition lineage and row counts
    * from parquet FOOTERS alone (CdcDriver.probeFromFooters), no data scan.
    * If `evolveAt >= 0`, segments wholly before the cut-in are written with
    * the v1 schema (no tool_meta) and later segments with v2 — a genuine
    * mid-stream additive schema change as seen by the tailer. */
  def write(spark: SparkSession, dir: String, cfg: Config): Unit =
    writeRange(spark, dir, cfg, 0L, cfg.nEvents, overwriteFirst = true)

  /** Write only the segments for delivery indices [lo, hi) — the CHUNKED
    * generation path for endurance runs whose full changelog would not fit
    * on disk: generate a chunk, replay it, delete the applied segment dirs,
    * repeat (`CdcMain endure`). Everything an event carries derives from
    * its delivery index, so the same cfg+range always writes identical
    * bytes — regenerating a partially-applied chunk after a crash is safe
    * (already-applied segments are fenced by epoch anyway). `lo` must be
    * segment-aligned; `cfg.nEvents` stays the TOTAL (cut-in points like
    * evolveAt are absolute delivery indices, independent of chunking). */
  def writeRange(spark: SparkSession, dir: String, cfg: Config,
                 lo: Long, hi: Long, overwriteFirst: Boolean = false): Unit = {
    require(lo % cfg.segSize == 0,
      s"chunk start $lo must be segment-aligned (segSize=${cfg.segSize})")
    require(lo < hi && hi <= cfg.nEvents, s"bad chunk [$lo, $hi)")
    def aligned(at: Long): Long =
      if (at < 0) cfg.nEvents
      else math.min((at / cfg.segSize) * cfg.segSize, cfg.nEvents) // segment-aligned
    val evolveCut = aligned(cfg.evolveAt)
    val widenCut = aligned(cfg.widenAt)
    val chunk = pmod(xxhash64(col("_lsn")), lit(cfg.filesPerSeg.toLong))
    def part(df: org.apache.spark.sql.DataFrame, l: Long, h: Long) =
      df.withColumn("p", col("_src_part"))
        .repartition(
          (((h - l) / cfg.segSize + 1) * cfg.nSrcPartitions * cfg.filesPerSeg).toInt,
          col("seg"), col("p"), chunk)
    val cuts = (Seq(lo, hi) ++
      Seq(evolveCut, widenCut).filter(c => c > lo && c < hi))
      .distinct.sorted
    cuts.sliding(2).foreach { case Seq(l, h) =>
      part(events(spark, cfg, l, h,
          withEvolution = l >= evolveCut, latWide = l >= widenCut), l, h)
        .write.mode(if (overwriteFirst && l == lo) "overwrite" else "append")
        .partitionBy("seg", "p").parquet(dir)
      case _ => ()
    }
  }

  /** Sorted list of segment indices present under `dir`. */
  def listSegments(dir: String): Seq[Long] =
    graft.lake.LakeIO.list(dir)
      .filter { case (name, _, isDir) => isDir && name.startsWith("seg=") }
      .map(_._1.stripPrefix("seg=").toLong)
      .sorted
}
