package graft.lake

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.TestSpark
import graft.cdc.CdcApply

/** File-level zone maps (per-file INT32/INT64 min/max collected from the
  * parquet footers at write) and the pruned range scan built on them:
  * `LakeTable.scanRange` must equal `read().filter(range)` EXACTLY while
  * opening only the files/buckets the zones cannot rule out. Pruning
  * granularity is file-level on copy-on-write and bucket-level on
  * merge-on-read (a key's LWW election needs its whole delta chain — see
  * the stale-winner trap case below). */
class ZoneMapSpec extends AnyFunSuite {
  lazy val spark: SparkSession = TestSpark.spark

  private def tsLit(s: String): String = s // ISO timestamp literal
  private def micros(s: String): Long =
    java.time.LocalDateTime.parse(s).toInstant(java.time.ZoneOffset.UTC)
      .toEpochMilli * 1000L

  /** A changelog batch: one upsert per (conv, turn) with the given ts. */
  private def batch(rows: Seq[(String, Int, String, Long)]): DataFrame = {
    import spark.implicits._
    rows.toDF("conv_id", "turn_idx", "tstr", "_lsn")
      .withColumn("op", lit("U"))
      .withColumn("role", lit("user"))
      .withColumn("text", concat(lit("t-"), col("_lsn")))
      .withColumn("tool", lit(null).cast("string"))
      .withColumn("ts", to_timestamp(col("tstr")))
      .drop("tstr")
      .withColumn("_src_part", (col("_lsn") % 4).cast("int"))
      .withColumn("_src_off", col("_lsn"))
  }

  private def collectState(df: DataFrame): Set[(String, Int, Long)] =
    df.select("conv_id", "turn_idx", "_lsn").collect()
      .map(r => (r.getString(0), r.getInt(1), r.getLong(2))).toSet

  /** 48 convs inserted in window W1, then ONE conv updated in window W2 —
    * the CDC-natural zone-map shape: most buckets' files keep old ts
    * bounds, only the touched bucket's files reach into W2. */
  private def seedLake(name: String, mor: Boolean): (LakeTable, String, Int) = {
    val lake = new LakeTable(spark, TestSpark.tmpDir(name))
    val w1 = (0 until 48).flatMap { c =>
      (0 until 4).map(t =>
        (f"conv$c%02d", t, tsLit(s"2024-01-0${1 + c % 5}T00:00:00"),
         (c * 4 + t).toLong))
    }
    CdcApply.apply(lake, batch(w1), epoch = 1, nBuckets = 16, mor = mor)
    val hot = "conv07"
    val w2 = (0 until 4).map(t =>
      (hot, t, tsLit("2024-02-01T12:00:00"), 1000L + t))
    CdcApply.apply(lake, batch(w2), epoch = 2, nBuckets = 16, mor = mor)
    (lake, hot, LakeTable.bucketOfValues(Seq(hot), 16))
  }

  private def rangeEquals(lake: LakeTable, col0: String, lo: Long, hi: Long)
      : Unit = {
    val viaScan = collectState(lake.scanRange(col0, lo, hi))
    val residual = lake.read().schema(col0).dataType match {
      case org.apache.spark.sql.types.TimestampType =>
        expr(s"unix_micros(`$col0`)").between(lit(lo), lit(hi))
      case _ => col(col0).between(lit(lo), lit(hi))
    }
    val viaFull = collectState(lake.read().filter(residual))
    assert(viaScan == viaFull,
      s"pruned scan diverged from full-scan filter on $col0 [$lo,$hi]")
  }

  test("CoW: recent-window scan prunes every untouched bucket's files") {
    val (lake, hot, hotBucket) = seedLake("zone-cow", mor = false)
    val (lo, hi) = (micros("2024-02-01T00:00:00"), micros("2024-02-02T00:00:00"))
    val (kept, total) = lake.scanRangeFiles("ts", lo, hi)
    assert(total > 1, "test lake should hold several files")
    assert(kept.nonEmpty && kept.forall(_.bucket == hotBucket),
      s"only the updated bucket may survive pruning: ${kept.map(_.bucket)}")
    assert(kept.size < total, s"no pruning happened ($total files)")
    rangeEquals(lake, "ts", lo, hi)
    val got = collectState(lake.scanRange("ts", lo, hi))
    assert(got.map(_._1) == Set(hot))
  }

  test("CoW: disjoint range opens zero files; full range opens all") {
    val (lake, _, _) = seedLake("zone-cow-edge", mor = false)
    val (none, total) =
      lake.scanRangeFiles("ts", micros("2030-01-01T00:00:00"), Long.MaxValue)
    assert(none.isEmpty && total > 0)
    assert(lake.scanRange("ts", micros("2030-01-01T00:00:00"),
      Long.MaxValue).isEmpty)
    val (all, t2) = lake.scanRangeFiles("ts", 0L, Long.MaxValue)
    assert(all.size == t2)
    rangeEquals(lake, "ts", 0L, Long.MaxValue)
  }

  test("MoR: bucket-granular pruning keeps the hot bucket's WHOLE chain") {
    val (lake, _, hotBucket) = seedLake("zone-mor", mor = true)
    val (lo, hi) = (micros("2024-02-01T00:00:00"), micros("2024-02-02T00:00:00"))
    val (kept, total) = lake.scanRangeFiles("ts", lo, hi)
    assert(kept.map(_.bucket).toSet == Set(hotBucket))
    // the chain: batch-1 delta (W1 ts, would be file-pruned) must be kept
    assert(kept.size >= 2,
      s"hot bucket's whole delta chain must be read, got ${kept.size} file(s)")
    assert(kept.size < total)
    rangeEquals(lake, "ts", lo, hi)
  }

  test("MoR stale-winner trap: old version in range, winner outside") {
    // conv's INSERT ts is inside the queried window; its UPDATE (the LWW
    // winner) is outside. File-level pruning would wrongly resurrect the
    // old version — bucket-level reads the chain and excludes the key.
    val lake = new LakeTable(spark, TestSpark.tmpDir("zone-trap"))
    CdcApply.apply(lake,
      batch(Seq(("trap", 0, tsLit("2024-01-05T00:00:00"), 1L))),
      epoch = 1, nBuckets = 4, mor = true)
    CdcApply.apply(lake,
      batch(Seq(("trap", 0, tsLit("2024-03-01T00:00:00"), 2L))),
      epoch = 2, nBuckets = 4, mor = true)
    val got = lake.scanRange("ts",
      micros("2024-01-01T00:00:00"), micros("2024-01-31T00:00:00"))
    assert(got.isEmpty,
      "stale version leaked: winner's ts is outside the window")
    rangeEquals(lake, "ts",
      micros("2024-01-01T00:00:00"), micros("2024-01-31T00:00:00"))
  }

  test("zones survive compaction and keep pruning") {
    val (lake, _, hotBucket) = seedLake("zone-compact", mor = false)
    Compaction.compact(lake)
    val (lo, hi) = (micros("2024-02-01T00:00:00"), micros("2024-02-02T00:00:00"))
    val (kept, total) = lake.scanRangeFiles("ts", lo, hi)
    assert(kept.nonEmpty && kept.forall(_.bucket == hotBucket))
    assert(kept.size < total)
    rangeEquals(lake, "ts", lo, hi)
  }

  test("clustered compaction makes zones selective on an aged table") {
    // Hash-bucketed writes spray each batch's time range across all
    // buckets, so an aged table's per-bucket files all span the full ts
    // history and a window scan prunes nothing. cluster=ts re-sorts each
    // bucket's rewrite on ts and splits files, making them ts-disjoint.
    val lake = new LakeTable(spark, TestSpark.tmpDir("zone-cluster"))
    val rows = (0 until 64).flatMap { c =>
      (0 until 8).map { t =>
        val day = 1 + (c * 8 + t) % 28 // ts uncorrelated with bucket
        (f"conv$c%02d", t, tsLit(f"2024-01-$day%02dT00:00:00"),
         (c * 8 + t).toLong)
      }
    }
    CdcApply.apply(lake, batch(rows), epoch = 1, nBuckets = 4)
    val (lo, hi) = (micros("2024-01-01T00:00:00"), micros("2024-01-04T00:00:00"))
    val (kept0, total0) = lake.scanRangeFiles("ts", lo, hi)
    assert(kept0.size == total0, "pre-clustering, every file spans all ts")
    Compaction.compact(lake, targetFileRows = 32L,
      clusterCol = Some("ts"))
    val (kept, total) = lake.scanRangeFiles("ts", lo, hi)
    assert(total >= 8, s"file split produced only $total files")
    assert(kept.size <= total / 2,
      s"clustered zones should prune most files: ${kept.size}/$total")
    // per bucket the kept files must be ts-disjoint from the pruned ones
    rangeEquals(lake, "ts", lo, hi)
    // key lookups still work (string min/max now loose, bucket pruning only)
    val one = lake.lookup("conv07").collect()
    assert(one.length == 8)
  }

  test("_lsn and turn_idx zones: change-cursor and INT32 domains") {
    val (lake, hot, _) = seedLake("zone-lsn", mor = false)
    // change-cursor read: only the second batch's lsn range
    val viaLsn = collectState(lake.scanRange("_lsn", 1000L, 2000L))
    assert(viaLsn.map(_._1) == Set(hot))
    rangeEquals(lake, "_lsn", 1000L, 2000L)
    val (kept, total) = lake.scanRangeFiles("_lsn", 1000L, 2000L)
    assert(kept.size < total, "lsn zones should prune cold files")
    rangeEquals(lake, "turn_idx", 1, 2)
  }

  test("multi-range conjunction intersects pruning and residuals") {
    val (lake, hot, hotBucket) = seedLake("zone-multi", mor = false)
    val (lo, hi) = (micros("2024-02-01T00:00:00"), micros("2024-02-02T00:00:00"))
    // ts window AND lsn cursor: only the hot bucket's recent file survives
    val ranges = Seq(("ts", lo, hi), ("_lsn", 1000L, 2000L))
    val (kept, total) = lake.scanRangesFiles(ranges)
    assert(kept.nonEmpty && kept.forall(_.bucket == hotBucket))
    assert(kept.size < total)
    val got = collectState(lake.scanRanges(ranges))
    assert(got.map(_._1) == Set(hot))
    val viaFull = collectState(lake.read()
      .filter(expr(s"unix_micros(ts)").between(lit(lo), lit(hi)) &&
        col("_lsn").between(lit(1000L), lit(2000L))))
    assert(got == viaFull)
    // conjunction with a disjoint second range prunes everything
    val (none, _) = lake.scanRangesFiles(
      Seq(("ts", lo, hi), ("_lsn", 900000L, 900001L)))
    assert(none.isEmpty)
    assert(lake.scanRanges(
      Seq(("ts", lo, hi), ("_lsn", 900000L, 900001L))).isEmpty)
  }

  test("unsupported or unknown columns fail loudly") {
    val (lake, _, _) = seedLake("zone-bad", mor = false)
    intercept[IllegalArgumentException] { lake.scanRange("role", 0L, 1L) }
    intercept[IllegalArgumentException] { lake.scanRange("nope", 0L, 1L) }
  }

  test("pre-zone manifests (null zone arrays) are kept, never pruned") {
    val meta = DataFileMeta("p", 0, 1L, "", "", null, null, null)
    assert(meta.zone("ts").isEmpty)
    assert(meta.mayOverlap("ts", 0L, 1L))
  }

  test("zorder clustering prunes on EVERY clustered column; " +
       "lexicographic only on the first") {
    // ts and _lsn deliberately UNCORRELATED: day follows i, lsn follows a
    // bit-reversed permutation of i — a single sort order can serve one
    // dimension only, the Z-value serves both. Enough rows per bucket that
    // a file covers a FINE z-curve block (z-order pruning is a resolution
    // game: with only ~4 files per bucket each file spans a whole quadrant
    // and two dimensions cannot both prune).
    def perm(i: Int): Int = // 10-bit reversal (1024 rows)
      (0 until 10).foldLeft(0)((a, b) => a | (((i >> b) & 1) << (9 - b)))
    val rows = (0 until 128).flatMap { c =>
      (0 until 8).map { t =>
        val i = c * 8 + t
        (f"conv$c%03d", t, tsLit(f"2024-01-${1 + i % 28}%02dT00:00:00"),
         perm(i).toLong)
      }
    }
    def seedOne(tag: String): LakeTable = {
      val l = new LakeTable(spark, TestSpark.tmpDir(s"zorder-$tag"))
      CdcApply.apply(l, batch(rows), epoch = 1, nBuckets = 2)
      l
    }
    val tsWin = (micros("2024-01-01T00:00:00"), micros("2024-01-04T00:00:00"))
    val lsnWin = (0L, 127L) // an eighth of the bit-reversed lsn domain

    val zl = seedOne("z")
    Compaction.compact(zl, targetFileRows = 32L,
      clusterCols = Seq("ts", "_lsn"), zorder = true)
    val (ktsZ, totZ) = zl.scanRangeFiles("ts", tsWin._1, tsWin._2)
    val (klsnZ, _) = zl.scanRangeFiles("_lsn", lsnWin._1, lsnWin._2)
    assert(totZ >= 24, s"file split produced only $totZ files")
    assert(ktsZ.size <= totZ / 2,
      s"zorder should prune the ts window: ${ktsZ.size}/$totZ")
    assert(klsnZ.size <= totZ / 2,
      s"zorder should prune the lsn window TOO: ${klsnZ.size}/$totZ")
    rangeEquals(zl, "ts", tsWin._1, tsWin._2)
    rangeEquals(zl, "_lsn", lsnWin._1, lsnWin._2)

    // same table, same columns, lexicographic: the SECOND column's zones
    // all span the full domain — nothing prunes in the lsn dimension
    val ll = seedOne("lex")
    Compaction.compact(ll, targetFileRows = 32L,
      clusterCols = Seq("ts", "_lsn"))
    val (ktsL, totL) = ll.scanRangeFiles("ts", tsWin._1, tsWin._2)
    val (klsnL, _) = ll.scanRangeFiles("_lsn", lsnWin._1, lsnWin._2)
    assert(ktsL.size <= totL / 2, "lexicographic still prunes its lead col")
    assert(klsnL.size > klsnZ.size,
      s"zorder must beat lexicographic on the second column " +
      s"(${klsnZ.size} vs ${klsnL.size} files)")
    rangeEquals(ll, "_lsn", lsnWin._1, lsnWin._2)
  }

  test("BitInterleave64: known z-values, order preservation, codegen") {
    import graft.expressions.{BitInterleave64, NativeKernels}
    assert(NativeKernels.z2(1L, 0L) == 1L)
    assert(NativeKernels.z2(0L, 1L) == 2L)
    assert(NativeKernels.z2(0xFFFFL, 0L) == 0x55555555L)
    assert(NativeKernels.z2(0L, 0xFFFFL) == 0xAAAAAAAAL)
    assert(NativeKernels.z3(1L, 1L, 1L) == 7L)
    assert(NativeKernels.z4(0L, 0L, 0L, 2L) == 128L)
    // quadrant monotonicity: both lanes smaller => z smaller
    for (a <- 0 to 15; b <- 0 to 15; a2 <- a + 1 to 16; b2 <- b + 1 to 16)
      assert(NativeKernels.z2(a.toLong, b.toLong) <
             NativeKernels.z2(a2.toLong, b2.toLong))
    // the Catalyst expression agrees with the kernel through codegen
    import spark.implicits._
    val bridge = org.apache.spark.sql.graft.GraftBridge
    val df = (0 until 256).map(i => (i.toLong, (255 - i).toLong)).toDF("a", "b")
    val got = df.select(bridge.column(BitInterleave64(Seq(
        bridge.expression(col("a")), bridge.expression(col("b")))))
      .as("z")).as[Long].collect()
    (0 until 256).foreach(i =>
      assert(got(i) == NativeKernels.z2(i.toLong, (255 - i).toLong)))
  }
}
