package graft

import org.apache.spark.sql.SparkSession

import graft.cdc.CdcDriver
import graft.changelog.ChangelogGen
import graft.lake.LakeTable

/**
 * Per-round benchmark main. Emits cumulative JSON lines — one after each
 * completed block, each a complete well-formed object — so a crash in a
 * late block still leaves every earlier block's numbers in the output tail
 * (round-3 lesson: the driver's bench died in the soak and `parsed` was
 * null for the WHOLE round). The final line is the full artifact:
 *   {"metric":"total","value":<sec>,"unit":"sec","queries":{...},"sf":...,
 *    "cdc":{"events":N,"throughput_full":ev/s,"throughput_full_nocf":ev/s,
 *           "full_cores":C,"throughput_n":ev/s,"throughput_4n":ev/s,
 *           "n_cores":2,"four_n_cores":8,"scaling_efficiency":r,
 *           "pinned":bool,"steal_pct":{"n":max,"four_n":max},
 *           "spread":{"n":x,"four_n":y},
 *           "mor":{...},"lookup":{...},"soak":{...}},
 *    "disk":{"free_start_gb":..,"free_min_gb":..,"high_water_gb":..}}
 *
 * DISK HYGIENE (round-3 verdict item #1 — the driver bench ENOSPC'd):
 *  - everything lives under ONE fixed base `target/bench`, which is wiped
 *    at startup (reclaims a crashed prior run), wiped at the end, and
 *    wiped by a JVM shutdown hook as a last resort;
 *  - `spark.local.dir` (shuffle spill) points under the same base, so
 *    spill from a killed run never strands in /tmp;
 *  - every bench lake is deleted in a `finally` right after its timing
 *    (one changelog per block is reused across runs; at no point do two
 *    timed lakes coexist);
 *  - bench lakes run with the engine's own `keepSnapshots=2` retention,
 *    so copy-on-write history never accumulates during a run;
 *  - the soak block preflights free disk and scales its event count down
 *    (with a printed note) instead of running the filesystem out.
 *
 * Pair runs are CPU-affinity-pinned to exactly N (resp. 4N) CPUs via
 * taskset when available ("N cores" = N CPUs, as on a real N-executor
 * cluster — not N task slots plus helper threads on spare cores), and each
 * run's /proc/stat hypervisor-steal share is published: an efficiency
 * number taken under visible steal is evidence of host noise, not engine
 * regression.
 *
 * The cdc block is the north-rule metric: the same changelog replayed at N
 * and 4N cores (fresh session each, shuffle partitions scaled), throughput
 * at both, efficiency = thr(4N) / (4 * thr(N)). N=2 vs 4N=8 is used for the
 * scaling pair because this host shows 20-30% hypervisor steal when all 32
 * vCPUs burst, which corrupts any measurement at 32; a separate full-core
 * run still reports headline throughput.
 *
 * Measurement discipline (round-2 verdict "bench robustness"): the N and 4N
 * runs are INTERLEAVED (N,4N,N,4N,...) so slow host drift hits both
 * configurations equally, each reports the MEDIAN of `SPARK_GRAFT_BENCH_RUNS`
 * (default 3) runs, and the relative spread (max-min)/median is published so
 * a noisy round is visible instead of silently trusted. Every fresh session
 * replays a small same-shape changelog UNTIMED first: codegen/JIT/class
 * loading are constant per-session costs that would otherwise consume a much
 * larger fraction of the short 4N run than of the long N run, biasing the
 * efficiency ratio downward (standard JVM benchmarking hygiene).
 * `throughput_full_nocf` replays with the change feed off — the per-round
 * tracked cost of the default-on audit counts.
 */
object Bench {

  /** Headline query subset: representative, bounded runtime at sf0.1
    * (the O(n^2) verification pair queries are exercised at sf0.01 by the
    * correctness gate instead). */
  private val headline = Seq(
    "q01_pricing_agg", "q02_filter_project", "q04_checksum", "q06_lww_latest",
    "q07_merge_upsert", "q08_join_dim", "q09_join_fact", "q12_full_outer",
    "q14_argmax", "q15_rollup", "q21_window_time", "q22_dedup_exact",
    "q23_minhash_lsh", "q24_simhash", "q28_ann_brute", "q29_ann_lsh",
    "q30_text_quality", "q31_lang_id", "q32_fingerprint", "q35_transcript_lww")

  /** Recursive delete; tolerates concurrent-delete races and absent paths. */
  private def rm(f: java.io.File): Unit =
    graft.lake.LakeIO.delete(f.getPath)

  // One fixed base: a crashed prior run's leftovers are reclaimed by the
  // wipe at startup (a nanotime-suffixed dir — the round-3 design — is
  // never reclaimed by anyone).
  private val base = new java.io.File("target/bench")
  private val localDir = new java.io.File(base, "spark-local")

  private def session(cores: Int): SparkSession = {
    val s = SparkSession.builder()
      .master(s"local[$cores]")
      .appName(s"graft-bench-$cores")
      .config("spark.sql.shuffle.partitions", math.max(cores, 8))
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.files.maxPartitionBytes", s"${32 * 1024 * 1024}")
      .config("spark.local.dir", localDir.getPath) // spill under the wiped base
      // shuffle files live until the driver GCs their dead dependencies
      // (default periodic GC: 30 min) — a long soak block would accumulate
      // tens of GB of spill inside one session; 2 min bounds the window
      .config("spark.cleaner.periodicGC.interval", "2min")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    s.sparkContext.setLogLevel("WARN")
    s
  }

  private def timeSec[A](f: => A): Double = {
    val t0 = System.nanoTime(); f; (System.nanoTime() - t0) / 1e9
  }

  /** Pin this JVM to `n` CPUs (taskset), so "N cores" means N CPUs — not N
    * task slots plus free-riding GC/JIT/shuffle-IO helper threads on the
    * other 30 (a real N-executor cluster has no spare cores to bleed onto;
    * measured: unpinned local[2] runs ~5% above pinned 2-CPU). Returns
    * false (and leaves affinity alone) where taskset is unavailable. */
  private def pinCpus(n: Int): Boolean = try {
    val pid = ProcessHandle.current().pid()
    // -a pins ALL existing threads, not just the main one — GC and JIT
    // compiler threads were created at JVM startup and would otherwise
    // keep their full-machine mask, which is exactly the free-riding this
    // pinning exists to stop. Its exit code is unreliable on a JVM (any
    // thread exiting between enumeration and set fails the whole command),
    // so success is judged by reading the affinity back.
    val set = new ProcessBuilder("taskset", "-apc", s"0-${n - 1}", pid.toString)
      .redirectErrorStream(true).start()
    scala.io.Source.fromInputStream(set.getInputStream).mkString // drain
    set.waitFor()
    val get = new ProcessBuilder("taskset", "-pc", pid.toString).start()
    val out = scala.io.Source.fromInputStream(get.getInputStream).mkString
    get.waitFor()
    val listed = out.trim.split(":").last.trim.split(",").flatMap { tok =>
      tok.split("-") match {
        case Array(a, b) => a.trim.toInt to b.trim.toInt
        case Array(a) if a.trim.nonEmpty => Seq(a.trim.toInt)
        case _ => Seq.empty[Int]
      }
    }.toSet
    listed == (0 until n).toSet
  } catch { case _: Exception => false }

  /** Cumulative (steal, total) jiffies summed over cpu0..cpu(n-1) from
    * /proc/stat — the CPUs a pinned run actually uses. Measuring over the
    * whole-machine line would dilute steal on 2 pinned CPUs by ~16x on a
    * 32-vCPU host (and by a different factor for the 8-CPU run, making the
    * two numbers incomparable). */
  private def cpuStat(nCpus: Int): Option[(Long, Long)] = try {
    val src = scala.io.Source.fromFile("/proc/stat")
    val lines = try src.getLines().toList finally src.close()
    val wanted = (0 until nCpus).map(i => s"cpu$i").toSet
    val rows = lines.filter(l => wanted.contains(l.takeWhile(_ != ' ')))
    if (rows.isEmpty) None
    else Some(rows.map { l =>
      val f = l.trim.split("\\s+").drop(1).map(_.toLong)
      (f(7), f.take(8).sum)
    }.reduce((a, b) => (a._1 + b._1, a._2 + b._2)))
  } catch { case _: Exception => None }

  /** Steal share (percent) of the first `nCpus` CPUs' time across `f`. */
  private def stealDuring[A](nCpus: Int)(f: => A): (A, Double) = {
    val s0 = cpuStat(nCpus); val r = f; val s1 = cpuStat(nCpus)
    val pct = (for ((a, b) <- s0.zip(s1)) yield {
      val dt = (b._2 - a._2).toDouble
      if (dt <= 0) 0.0 else 100.0 * (b._1 - a._1) / dt
    }).getOrElse(0.0)
    (r, pct)
  }

  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32").toInt
    val cdcEvents = sys.env.getOrElse("SPARK_GRAFT_CDC_EVENTS", "32000000").toLong
    val scalePair = (2, 8) // N and 4N cores for the scaling-efficiency pair

    rm(base); base.mkdirs(); localDir.mkdirs()
    // Last-resort reclamation: a kill/OOM mid-run still frees the disk the
    // next process needs (regular paths below delete eagerly, not here).
    Runtime.getRuntime.addShutdownHook(new Thread(() => rm(base)))

    // Disk telemetry: free space sampled at every block boundary; the final
    // line reports the high-water mark so BASELINE.md can state the bench's
    // real footprint instead of guessing.
    val freeStart = base.getUsableSpace
    var freeMin = freeStart
    def sampleDisk(): Unit = { freeMin = math.min(freeMin, base.getUsableSpace) }
    def gb(b: Long): Double = b / 1e9

    // ---- incremental emission: each block boundary prints ONE complete
    // cumulative JSON line to STDERR (so a late-block crash still leaves
    // every earlier block's numbers in the output tail — the round-3
    // failure mode); the FINAL call prints the same complete line to
    // STDOUT, keeping the driver contract of exactly one stdout JSON line.
    var qJson = "{}"
    var qTotal = 0.0
    val cdcParts = scala.collection.mutable.LinkedHashMap[String, String]()
    def emit(toStdout: Boolean = false): Unit = {
      sampleDisk()
      val cdc = if (cdcParts.isEmpty) ""
        else cdcParts.values.mkString(""","cdc":{""", ",", "}")
      val line =
        f"""{"metric":"total","value":$qTotal%.3f,"unit":"sec","queries":$qJson,"sf":"$sfDir"""" +
        cdc +
        f""","disk":{"free_start_gb":${gb(freeStart)}%.1f,"free_min_gb":${gb(freeMin)}%.1f,""" +
        f""""high_water_gb":${gb(freeStart - freeMin)}%.1f}}"""
      if (toStdout) println(line) else System.err.println(line)
    }

    // ---- query timings at full parallelism
    val spark = session(cpus)
    // warm up executor pool / codegen / file listing so the first measured
    // query doesn't absorb session startup
    spark.read.parquet(s"$sfDir/lineitem.parquet").count()
    val qTimes = headline.flatMap { name =>
      Queries.all.get(name).map { fn =>
        val sec = timeSec { fn(spark, sfDir).write.format("noop").mode("overwrite").save() }
        name -> sec
      }
    }
    qJson = qTimes.map { case (k, v) => f""""$k":$v%.3f""" }.mkString("{", ",", "}")
    qTotal = qTimes.map(_._2).sum
    emit()

    // ---- CDC replay bench: one changelog, replayed per core-config
    val changelog = new java.io.File(base, "changelog").getPath
    val cfg = ChangelogGen.Config(
      nEvents = cdcEvents, nConvs = math.max(cdcEvents / 200, 10L),
      skew = 1.2, evolveAt = cdcEvents / 2,
      segSize = math.max(cdcEvents / 4, 1L))
    ChangelogGen.write(spark, changelog, cfg)
    // Small same-shape changelog (schema evolution mid-stream included) used
    // to warm each fresh session BEFORE its timed run: whole-stage codegen
    // (Janino), parquet reader/writer class loading and JIT are fixed
    // per-session costs that would otherwise sit inside the timed region —
    // and, being constant, they eat a far larger fraction of the short
    // 4N-core run than of the long N-core run, structurally depressing the
    // measured scaling efficiency below what the engine actually does.
    val warmCl = new java.io.File(base, "warm-changelog").getPath
    ChangelogGen.write(spark, warmCl, ChangelogGen.Config(
      nEvents = 500000, nConvs = 2500, skew = 1.2,
      evolveAt = 250000, segSize = 125000))
    def warmup(s: SparkSession): Unit = {
      val warmLake = new java.io.File(base, "warm-lake")
      try {
        new CdcDriver(s, warmCl, new LakeTable(s, warmLake.getPath),
          segmentsPerBatch = 4, nBuckets = 64, quiet = true).run()
        ()
      } finally rm(warmLake) // each warmup reclaims its lake immediately
    }

    /** Timed replay into a fresh lake; the lake is DELETED in finally —
      * its timing is the product, the files are not. `keepLake` keeps the
      * finished lake on disk for a follow-up block (caller deletes). */
    def replayThroughput(s: SparkSession, tag: String,
                         changeFeed: Boolean = true,
                         keepLake: Boolean = false): Double = {
      val lakeFile = new java.io.File(base, s"lake-$tag")
      if (lakeFile.exists()) rm(lakeFile)
      try {
        val lake = new LakeTable(s, lakeFile.getPath)
        val sec = timeSec {
          new CdcDriver(s, changelog, lake, segmentsPerBatch = 4,
            nBuckets = 64, quiet = true, changeFeed = changeFeed,
            keepSnapshots = 2).run()
        }
        cdcEvents / sec
      } finally { sampleDisk(); if (!keepLake) rm(lakeFile) }
    }

    def median(xs: Seq[Double]): Double = {
      val s = xs.sorted; s(s.size / 2)
    }
    def spread(xs: Seq[Double]): Double =
      if (xs.isEmpty) 0.0 else (xs.max - xs.min) / median(xs)

    // Full-core headline runs: same discipline as the scaling pair —
    // interleaved cf/nocf, median of N (a single 32-vCPU run on this host
    // has swung 10x across steal bursts within one day). The WITHIN-pair
    // order alternates per iteration: in one long-lived JVM the later run
    // of a pair rides warmer JIT/page cache, and a fixed cf-first order
    // once inflated the apparent change-feed cost to 2.2x when a direct
    // alternating A/B measures 6-9%.
    val benchRuns = sys.env.getOrElse("SPARK_GRAFT_BENCH_RUNS", "3").toInt
    warmup(spark) // query session has run no merge yet — warm the CDC path
    val fullRuns = (1 to benchRuns).map { i =>
      if (i % 2 == 1) {
        val cf = replayThroughput(spark, s"full-r$i")
        val no = replayThroughput(spark, s"full-nocf-r$i", changeFeed = false)
        (cf, no)
      } else {
        val no = replayThroughput(spark, s"full-nocf-r$i", changeFeed = false)
        val cf = replayThroughput(spark, s"full-r$i")
        (cf, no)
      }
    }
    val thrFull = median(fullRuns.map(_._1))
    val thrFullNoCf = median(fullRuns.map(_._2))
    val fullSpread = spread(fullRuns.map(_._1))
    cdcParts += "full" ->
      (f""""events":$cdcEvents,"throughput_full":$thrFull%.1f,""" +
       f""""throughput_full_nocf":$thrFullNoCf%.1f,"full_cores":$cpus,""" +
       f""""runs":$benchRuns,"spread_full":$fullSpread%.3f""")
    emit()

    // ---- MoR vs CoW on the workload MoR exists for: many small update
    // batches trickling into a table they keep touching everywhere. Each
    // batch hits ~every bucket with few rows per bucket, so copy-on-write
    // rewrites the WHOLE table per batch while merge-on-read appends
    // O(batch) and amortizes folds (auto-fold chain 16). The headline
    // replay above is the opposite shape (4 huge batches) where CoW is
    // already right — both numbers published so the trade is visible.
    // SPARK_GRAFT_MOR_EVENTS=0 disables.
    val morEvents = sys.env.getOrElse("SPARK_GRAFT_MOR_EVENTS", "4000000").toLong
    val trickleCl = new java.io.File(base, "trickle-changelog")
    val lastMorLake = new java.io.File(base, "lake-trickle-mor-last")
    val morBlock: Option[(Double, Double, Int)] =
      if (morEvents <= 0) None
      else {
        val nBatches = 64
        ChangelogGen.write(spark, trickleCl.getPath, ChangelogGen.Config(
          nEvents = morEvents, nConvs = math.max(morEvents / 200, 10L),
          skew = 1.2, evolveAt = morEvents / 2,
          segSize = math.max(morEvents / nBatches, 1L)))
        def trickle(tag: String, morMode: Boolean, keepLake: Boolean): Double = {
          val lakeFile =
            if (keepLake) lastMorLake else new java.io.File(base, s"lake-trickle-$tag")
          if (lakeFile.exists()) rm(lakeFile)
          try {
            val lake = new LakeTable(spark, lakeFile.getPath)
            val sec = timeSec {
              new CdcDriver(spark, trickleCl.getPath, lake, segmentsPerBatch = 1,
                nBuckets = 64, quiet = true, mor = morMode,
                keepSnapshots = 2).run()
            }
            morEvents / sec
          } finally { sampleDisk(); if (!keepLake) rm(lakeFile) }
        }
        // interleaved, median-of-runs — same discipline as the pair bench
        // (capped at 2 pairs: the CoW side is deliberately the slow shape,
        // and the tracked quantity is the RATIO, which interleaving keeps
        // honest even under host drift — see BASELINE.md round-3 pairs).
        // The LAST MoR lake is kept for the lookup block below and deleted
        // there.
        val nPairs = math.min(benchRuns, 2)
        val runs = (1 to nPairs).map { i =>
          (trickle(s"cow-r$i", morMode = false, keepLake = false),
            trickle(s"mor-r$i", morMode = true, keepLake = i == nPairs))
        }
        Some((median(runs.map(_._1)), median(runs.map(_._2)), nBatches))
      }
    morBlock.foreach { case (cow, mor, b) =>
      cdcParts += "mor" ->
        (f""""mor":{"events":$morEvents,"batches":$b,""" +
         f""""throughput_cow":$cow%.1f,"throughput_mor":$mor%.1f,""" +
         f""""speedup":${mor / cow}%.2f}""")
    }

    // ---- point-lookup latency + membership pruning on the MoR lake the
    // trickle block just built (multi-file bucket chains — the shape the
    // per-file bloom/dictionary evidence exists for). Positive lookups
    // time the whole driver path (prune + one small Spark job); negative
    // lookups must prune to ZERO files and run no job at all.
    morBlock.foreach { _ =>
      try {
        val lake = new LakeTable(spark, lastMorLake.getPath)
        val snap = lake.currentSnapshot.get
        val convs = lake.read().select("conv_id").distinct()
          .orderBy("conv_id").limit(16).collect().map(_.getString(0))
        lake.lookup(convs.head).count() // warm the lookup path once
        def ms(f: => Unit): Double = { val t = System.nanoTime(); f
          (System.nanoTime() - t) / 1e6 }
        val pos = convs.map(c => ms { lake.lookup(c).count() }).sorted
        val ghosts = convs.map(_ + "-x0")
        var ghostFiles = 0
        val neg = ghosts.map(g => ms {
          ghostFiles += lake.lookupFilesKeyed(Seq(g)).size }).sorted
        val chainAvg = snap.totalFiles.toDouble / snap.nBuckets
        val posFilesPruned = convs.map(c =>
          lake.lookupFilesKeyed(Seq(c), bloom = false).size -
            lake.lookupFilesKeyed(Seq(c)).size).sum
        cdcParts += "lookup" ->
          (f""""lookup":{"chain_avg":$chainAvg%.1f,""" +
           f""""pos_ms_p50":${pos(pos.length / 2)}%.1f,""" +
           f""""neg_ms_p50":${neg(neg.length / 2)}%.1f,""" +
           f""""neg_files_opened":$ghostFiles,""" +
           f""""pos_files_pruned":$posFilesPruned}""")
      } finally { rm(lastMorLake); rm(trickleCl) }
    }
    // ---- V2 catalog surfaces (q68/q69/q74/q75-shape): columnar CoW scan
    // vs forced row mode, storage-partitioned join, runtime (join-driven)
    // pruning, and metadata-only counts — tracked per round like
    // cdc/mor/lookup. SPARK_GRAFT_CATALOG_EVENTS=0 disables.
    // default sized so the scan A/B discriminates: at 4M events (400k live
    // rows) both modes sit inside the ~0.17 s fixed cost (planning + 64
    // tasks); 64M events (6.4M rows) shows the columnar 1.48x cleanly
    val catEvents =
      sys.env.getOrElse("SPARK_GRAFT_CATALOG_EVENTS", "64000000").toLong
    if (catEvents > 0) {
      import org.apache.spark.sql.functions.{col, count, lit, when}
      val catCl = new java.io.File(base, "catalog-changelog")
      val catLake = new java.io.File(base, "lake-catalog")
      val catLake2 = new java.io.File(base, "lake-catalog2")
      val catDim = new java.io.File(base, "catalog-dim")
      try {
        // segment size capped at 4M so a raised SPARK_GRAFT_CATALOG_EVENTS
        // stays within the per-batch heap guidance (build.sbt -Xmx notes)
        ChangelogGen.write(spark, catCl.getPath, ChangelogGen.Config(
          nEvents = catEvents, nConvs = math.max(catEvents / 200, 10L),
          skew = 1.2,
          segSize = math.max(math.min(catEvents / 4, 4000000L), 1L)))
        // keepSnapshots=2: without retention a multi-batch CoW build holds
        // every superseded bucket file — at a raised CATALOG_EVENTS that is
        // O(batches x table) disk and an ENOSPC (measured the hard way)
        val lake = new LakeTable(spark, catLake.getPath)
        new CdcDriver(spark, catCl.getPath, lake, segmentsPerBatch = 2,
          nBuckets = 64, quiet = true, keepSnapshots = 2).run()
        val lake2 = new LakeTable(spark, catLake2.getPath)
        new CdcDriver(spark, catCl.getPath, lake2, segmentsPerBatch = 2,
          nBuckets = 64, quiet = true, keepSnapshots = 2).run()
        // tombstone-GC compaction (feed done => watermark above all lsns):
        // clean files flip the scan columnar, which is what the A/B below
        // measures against the forced row path
        graft.lake.Compaction.compact(lake, tombstoneWatermark = Long.MaxValue)
        lake.expireSnapshots(2)
        spark.conf.set("spark.sql.catalog.graft", "graft.sources.GraftCatalog")
        val root = lake.root
        def scanSec(columnar: Boolean): Double = {
          spark.conf.set("spark.graft.catalog.columnar", columnar.toString)
          try timeSec {
            spark.sql(
              s"SELECT conv_id, turn_idx, role, text FROM graft.`$root`")
              .write.format("noop").mode("overwrite").save()
          } finally spark.conf.set("spark.graft.catalog.columnar", "true")
        }
        scanSec(true) // warm manifests/listing once, untimed
        // interleaved columnar/row pairs, median — same discipline as cdc
        val scans = (1 to math.min(benchRuns, 3)).map { i =>
          if (i % 2 == 1) { val c = scanSec(true); val r = scanSec(false); (c, r) }
          else { val r = scanSec(false); val c = scanSec(true); (c, r) }
        }
        val colSec = median(scans.map(_._1))
        val rowSec = median(scans.map(_._2))
        def msOf(f: => Unit): Double = {
          val t = System.nanoTime(); f; (System.nanoTime() - t) / 1e6 }
        val cntMs = msOf {
          spark.sql(s"SELECT count(*) FROM graft.`$root`").head() }
        val cntWhereMs = msOf { spark.sql(
          s"SELECT count(*) FROM graft.`$root` WHERE turn_idx >= 0").head() }
        // runtime (join-driven) pruning: selective parquet-backed dim
        val picked = lake.read().select("conv_id").distinct()
          .orderBy("conv_id").limit(8).collect().map(_.getString(0)).toSeq
        lake.read().select("conv_id").distinct()
          .withColumn("pick",
            when(col("conv_id").isin(picked: _*), 1).otherwise(0))
          .write.mode("overwrite").parquet(catDim.getPath)
        spark.read.parquet(catDim.getPath)
          .createOrReplaceTempView("bench_cat_dim")
        graft.sources.GraftScan.clearRuntimeFilterReport(root)
        val dppSec = timeSec {
          spark.sql(
            s"""SELECT t.conv_id, t.turn_idx, t.text FROM graft.`$root` t
               |JOIN bench_cat_dim d ON t.conv_id = d.conv_id
               |WHERE d.pick = 1""".stripMargin)
            .write.format("noop").mode("overwrite").save()
        }
        val rep = graft.sources.GraftScan.runtimeFilterReport(root)
        // storage-partitioned join: two equally-bucketed lakes on the
        // bucket+key columns — plans with zero exchanges (q69 shape)
        val spjSec = timeSec {
          spark.sql(
            s"""SELECT count(*) FROM graft.`$root` t
               |JOIN graft.`${lake2.root}` u
               |  ON t.conv_id = u.conv_id AND t.turn_idx = u.turn_idx""".stripMargin)
            .head()
        }
        cdcParts += "catalog" ->
          (f""""catalog":{"events":$catEvents,""" +
           f""""scan_columnar_sec":$colSec%.2f,"scan_row_sec":$rowSec%.2f,""" +
           f""""columnar_speedup":${rowSec / colSec}%.2f,""" +
           f""""meta_count_ms":$cntMs%.0f,"meta_count_where_ms":$cntWhereMs%.0f,""" +
           f""""dpp_join_sec":$dppSec%.2f,""" +
           s""""dpp_buckets":"${rep.map(r => s"${r.bucketsBefore}->${r.bucketsAfter}").getOrElse("none")}",""" +
           f""""spj_join_sec":$spjSec%.2f}""")
      } finally {
        sampleDisk(); rm(catLake); rm(catLake2); rm(catDim); rm(catCl)
      }
    }
    emit()
    spark.stop()
    SparkSession.clearActiveSession(); SparkSession.clearDefaultSession()

    // Affinity-pinned pair runs: warmup happens under the SAME pinning as
    // the measurement (JIT/C2 compile threads would otherwise do the warmup
    // work on unpinned spare cores and understate the N-core cost).
    val pinned = pinCpus(scalePair._1) // probe once; per-run below
    pinCpus(cpus)
    def inCores(cores: Int)(f: SparkSession => Double): (Double, Double) = {
      if (pinned) pinCpus(cores)
      val s = session(cores)
      // steal is sampled over the CPUs the run actually occupies: the first
      // `cores` only when pinning is in effect, else the whole machine (an
      // unpinned run schedules anywhere, so a cpu0..n-1 sample would be
      // unrelated to the run's own steal exposure)
      val stealCpus =
        if (pinned) cores else Runtime.getRuntime.availableProcessors()
      try { warmup(s); stealDuring(stealCpus)(f(s)) }
      finally {
        s.stop()
        SparkSession.clearActiveSession(); SparkSession.clearDefaultSession()
        if (pinned) pinCpus(cpus)
      }
    }
    // Interleaved N/4N pairs: host drift (steal, writeback) hits both
    // configurations symmetrically instead of biasing whichever ran last.
    val pairRuns = (1 to benchRuns).map { i =>
      val n = inCores(scalePair._1)(s =>
        replayThroughput(s, s"c${scalePair._1}-r$i"))
      val fn = inCores(scalePair._2)(s =>
        replayThroughput(s, s"c${scalePair._2}-r$i"))
      (n, fn)
    }
    val nRuns = pairRuns.map(_._1._1)
    val fnRuns = pairRuns.map(_._2._1)
    val stealN = pairRuns.map(_._1._2)
    val steal4n = pairRuns.map(_._2._2)
    val thrN = median(nRuns)
    val thr4n = median(fnRuns)
    val efficiency = thr4n / (4.0 * thrN)
    cdcParts += "pair" ->
      (f""""throughput_n":$thrN%.1f,"throughput_4n":$thr4n%.1f,""" +
       f""""n_cores":${scalePair._1},"four_n_cores":${scalePair._2},""" +
       f""""scaling_efficiency":$efficiency%.3f,"pinned":$pinned,""" +
       f""""steal_pct":{"n":${stealN.max}%.1f,"four_n":${steal4n.max}%.1f},""" +
       f""""spread":{"n":${spread(nRuns)}%.3f,"four_n":${spread(fnRuns)}%.3f}""")
    emit()
    rm(new java.io.File(changelog)) // pair runs were its last consumer

    // ---- 10^8-event soak replay at full cores (round-over-round tracked;
    // SPARK_GRAFT_SOAK_EVENTS=0 disables). 25M-event batches per the heap
    // guidance (build.sbt default -Xmx24g). Free-disk preflight: the soak
    // is the bench's biggest footprint (changelog ~70 B/event + lake +
    // shuffle spill); budgeted at 200 B/event against at most 60% of the
    // currently-free space, the event count scales DOWN (multiple of 4M,
    // so segment math stays exact) instead of filling the filesystem —
    // the scaling is printed in the JSON (`soak.scaled_from`).
    val soakAsk = sys.env.getOrElse("SPARK_GRAFT_SOAK_EVENTS", "100000000").toLong
    val soakBudgetBytesPerEvent = 200L
    val soakCap = base.getUsableSpace * 6 / 10 / soakBudgetBytesPerEvent
    val soakEvents =
      if (soakAsk <= soakCap) soakAsk
      else math.max(soakCap / 4000000L * 4000000L, 4000000L)
    val soak: Option[(Long, Double, Int)] =
      if (soakAsk <= 0) None
      else {
        val s = session(cpus)
        val soakCl = new java.io.File(base, "soak-changelog")
        val soakLake = new java.io.File(base, "lake-soak")
        try {
          ChangelogGen.write(s, soakCl.getPath, ChangelogGen.Config(
            nEvents = soakEvents, nConvs = math.max(soakEvents / 200, 10L),
            skew = 1.2, evolveAt = soakEvents / 2,
            segSize = math.max(soakEvents / 4, 1L)))
          warmup(s)
          val lake = new LakeTable(s, soakLake.getPath)
          var batches = 0
          val sec = timeSec {
            batches = new CdcDriver(s, soakCl.getPath, lake, segmentsPerBatch = 1,
              nBuckets = 64, quiet = true, keepSnapshots = 2).run().size
          }
          Some((soakEvents, soakEvents / sec, batches))
        } finally {
          sampleDisk(); rm(soakLake); rm(soakCl)
          s.stop()
          SparkSession.clearActiveSession(); SparkSession.clearDefaultSession()
        }
      }
    soak.foreach { case (n, thr, b) =>
      val scaledNote = if (n != soakAsk) s""","scaled_from":$soakAsk""" else ""
      cdcParts += "soak" ->
        f""""soak":{"events":$n,"throughput":$thr%.1f,"batches":$b,"cores":$cpus$scaledNote}"""
    }
    emit(toStdout = true) // the one stdout JSON line — the artifact
    rm(base)
  }
}
