package graft.lake

/**
 * Metadata-only maintenance advisor: reads the CURRENT snapshot's per-bucket
 * manifest refs (rows + file counts are already in the snapshot JSON) and
 * the snapshot log, and turns them into concrete maintenance advice —
 * which buckets to fold/compact, when the bucket count has outgrown its
 * layout (aligned `rebucket` target), where ingest skew concentrates, and
 * when the retained snapshot history warrants an `expire`.
 *
 * The whole examination is O(nBuckets) DRIVER work from one metadata file:
 * no Spark job, no manifest loads, no data IO — so it can run on every
 * batch boundary of a 100 TB table for free. This is the judgment loop the
 * reference leaves to human operators of its stores (Cassandra compaction
 * tuning, index maintenance); table formats ship it as maintenance actions
 * (OPTIMIZE advisors); here it is a first-class engine surface.
 *
 * `applySafe` executes only the NON-DESTRUCTIVE advice (fold / incremental
 * compact of the worst buckets, capped per run so maintenance never
 * monopolizes the cluster): `rebucket` changes the table layout and
 * `expire` drops time-travel history, so those remain operator decisions.
 */
object Doctor {

  final case class Thresholds(
      /** flag buckets whose manifest chain exceeds this many files */
      chainMax: Int = 16,
      /** advise rebucketing when mean stored rows per bucket exceed this */
      rowsPerBucketTarget: Long = 4_000_000L,
      /** advise rebucketing when mean stored BYTES per bucket exceed this
        * — catches wide/blob-heavy rows a row-count threshold misses
        * (ignored when the snapshot predates byte stats, i.e. all 0) */
      bytesPerBucketTarget: Long = 1L << 30,
      /** never advise growing past this many buckets */
      maxBuckets: Int = 4096,
      /** flag skew when the hottest bucket exceeds mean × this factor */
      skewFactor: Double = 4.0,
      /** advise expiry when more snapshots than this are retained */
      keepSnapshots: Int = 32,
      /** escalate dead-letter advice when a quarantine epoch has sat
        * unresolved longer than this (reference shape: 7-day TTL,
        * activity-aggregate-updater.conf:36) */
      quarantineMaxAgeMs: Long = 7L * 24 * 3600 * 1000,
      /** at most this many buckets folded/compacted per applySafe run */
      applyCap: Int = 32)

  final case class Advice(action: String, args: String, reason: String)

  final case class Report(
      snapshotId: Long, epoch: Long, nBuckets: Int, mor: Boolean,
      rows: Long, files: Int, snapshotsRetained: Int,
      /** compressed data bytes (0 when the snapshot predates byte stats) */
      bytes: Long, meanBytesPerBucket: Long, maxBytesPerBucket: Long,
      meanRowsPerBucket: Long, maxRowsPerBucket: Long, maxChain: Int,
      chainedBuckets: Seq[Int], hotBuckets: Seq[Int],
      /** quarantine dirs still holding dead letters (epoch ids) */
      quarantinedEpochs: Seq[Long],
      /** live (unpublished, undiscarded) branches */
      liveBranches: Seq[String],
      advice: Seq[Advice])

  def examine(lake: LakeTable,
              t: Thresholds = Thresholds()): Option[Report] = {
    val cur = lake.currentSnapshot.getOrElse(return None)
    val snapCount = lake.snapshots.size
    // a MoR bucket's delta chain is SEVERAL refs with the same bucket id
    // (one per appended batch) — aggregate per bucket before judging
    val byBucket = cur.manifests.groupBy(_.bucket).map { case (b, refs) =>
      (b, refs.map(_.rows).sum, refs.map(_.nFiles).sum, refs.map(_.bytes).sum)
    }.toSeq
    val rows = byBucket.map(_._2).sum
    val bytes = byBucket.map(_._4).sum
    val mean = if (cur.nBuckets > 0) rows / math.max(cur.nBuckets, 1) else 0L
    // bytes == 0 ⇒ pre-byte-stats snapshot: size judgments disabled, the
    // row-count thresholds carry the advice alone (old behavior)
    val meanB = if (cur.nBuckets > 0) bytes / math.max(cur.nBuckets, 1) else 0L
    val maxRows = if (byBucket.isEmpty) 0L else byBucket.map(_._2).max
    val maxBytes = if (byBucket.isEmpty) 0L else byBucket.map(_._4).max
    val maxChain = if (byBucket.isEmpty) 0 else byBucket.map(_._3).max
    // worst chains first, so a capped applySafe run always takes the
    // buckets that hurt read amplification the most
    val chained = byBucket.filter(_._3 > t.chainMax)
      .sortBy(-_._3).map(_._1)
    // hot by rows OR by bytes: a bucket of few huge rows (blob columns)
    // skews scan time just as hard as one of many small rows
    val hot = byBucket
      .filter(r => (mean > 0 && r._2 > mean * t.skewFactor) ||
                   (meanB > 0 && r._4 > meanB * t.skewFactor))
      .sortBy(r => -math.max(
        if (mean > 0) r._2.toDouble / mean else 0.0,
        if (meanB > 0) r._4.toDouble / meanB else 0.0))
      .map(_._1)

    val advice = Seq.newBuilder[Advice]
    if (chained.nonEmpty) {
      val take = chained.take(t.applyCap)
      if (cur.mor)
        advice += Advice("fold", take.mkString(","),
          s"${chained.size} bucket(s) carry delta chains > ${t.chainMax} " +
          s"files (worst ${maxChain}): read-side LWW election pays the " +
          "chain on every scan")
      else
        advice += Advice("compact", s"buckets=${take.mkString(",")}",
          s"${chained.size} bucket(s) hold > ${t.chainMax} files " +
          s"(worst ${maxChain}): small-file read amplification")
    }
    val overRows = mean > t.rowsPerBucketTarget
    val overBytes = meanB > t.bytesPerBucketTarget
    if ((overRows || overBytes) && cur.nBuckets < t.maxBuckets) {
      // smallest power-of-two multiple that brings BOTH means back under
      // their targets — aligned, so the rewrite is shuffle-free (Compaction)
      var k = 2
      while ((mean / k > t.rowsPerBucketTarget ||
              meanB / k > t.bytesPerBucketTarget) &&
             cur.nBuckets * k.toLong * 2 <= t.maxBuckets) k *= 2
      // the maxBuckets cap must stay a MULTIPLE of the current count —
      // min(nBuckets*k, maxBuckets) could advise a non-multiple, and
      // Compaction.rebucket then falls back to a full repartition,
      // contradicting the shuffle-free claim the operator acts on
      val capped = math.min(cur.nBuckets.toLong * k, t.maxBuckets.toLong)
      val newN = (capped / cur.nBuckets * cur.nBuckets).toInt
      if (newN >= cur.nBuckets * 2) { // a <2x aligned growth isn't worth it
        val why =
          if (overRows && overBytes)
            s"mean $mean rows and $meanB bytes/bucket exceed targets " +
            s"${t.rowsPerBucketTarget} rows / ${t.bytesPerBucketTarget} bytes"
          else if (overBytes)
            s"mean $meanB bytes/bucket exceeds target " +
            s"${t.bytesPerBucketTarget} (rows mean $mean is fine — " +
            "wide/blob-heavy rows)"
          else
            s"mean $mean rows/bucket exceeds target ${t.rowsPerBucketTarget}"
        advice += Advice("rebucket", newN.toString,
          s"$why; aligned ${cur.nBuckets} -> $newN split is shuffle-free")
      }
    }
    if (hot.nonEmpty)
      advice += Advice("salt", "",
        s"bucket(s) ${hot.take(8).mkString(",")} hold > ${t.skewFactor}x " +
        s"the mean rows or bytes (hottest $maxRows rows / $maxBytes bytes " +
        s"vs means $mean / $meanB): hot business keys — consider " +
        "ingest-side salting (replay saltBuckets) and clustered " +
        "compaction of those buckets")
    if (snapCount > t.keepSnapshots)
      advice += Advice("expire", t.keepSnapshots.toString,
        s"$snapCount snapshots retained (> ${t.keepSnapshots}): metadata " +
        "and dead-file footprint grows per commit; tags survive expiry")

    // dead-letter backlog: epochs whose quarantine dir still holds rows —
    // each is a pending operator decision (fix the cause, then `requeue`)
    val qdir = s"${lake.root}/quarantine"
    val quarantined =
      if (!LakeIO.exists(qdir)) Nil
      else LakeIO.list(qdir)
        .collect { case (n, _, true) if n.startsWith("epoch=") =>
          n.stripPrefix("epoch=").toLong }
        .sorted
    if (quarantined.nonEmpty) {
      // age-escalation: a backlog older than the bound is no longer "will
      // get to it" — it is silently diverging state (reference 7-day TTL)
      val now = System.currentTimeMillis()
      val aged = quarantined.filter(e =>
        now - LakeIO.mtime(s"$qdir/epoch=$e") > t.quarantineMaxAgeMs)
      val ageNote =
        if (aged.isEmpty) ""
        else s"; epoch(s) ${aged.mkString(",")} exceed the " +
          s"${t.quarantineMaxAgeMs / 3600000}h age bound — resolve NOW " +
          "or the feed gap becomes operationally invisible"
      advice += Advice("requeue", quarantined.mkString(","),
        s"${quarantined.size} epoch(s) hold dead letters: after fixing " +
        "the cause (constraint, feed bug), replay them — LWW keeps " +
        s"replays order-safe$ageNote")
    }
    // long-lived branches pin their fork point against expiry forever
    val branches = Branch.list(lake).map(_.name)
    if (branches.nonEmpty)
      advice += Advice("branch", branches.mkString(","),
        s"${branches.size} live branch(es) pin their fork snapshots " +
        "against retention: publish or discard when the audit concludes")

    Some(Report(cur.snapshotId, cur.epoch, cur.nBuckets, cur.mor,
      rows, byBucket.map(_._3).sum, snapCount, bytes, meanB, maxBytes,
      mean, maxRows, maxChain,
      chained, hot, quarantined, branches, advice.result()))
  }

  /** Execute the report's non-destructive advice: `fold` for MoR chains,
    * incremental `compact buckets=…` for CoW small files (both capped at
    * [[Thresholds.applyCap]] buckets, both epoch-preserving maintenance
    * commits that rebase/recompute on races). Returns the actions run.
    * `rebucket`/`expire`/`salt` advice is reported but never auto-run. */
  def applySafe(lake: LakeTable, report: Report,
                t: Thresholds = Thresholds()): Seq[String] =
    report.advice.flatMap {
      case Advice("fold", buckets, _) =>
        val bs = buckets.split(",").filter(_.nonEmpty).map(_.toInt).toSet
        val st = graft.cdc.CdcApply.foldBuckets(lake, bs)
        Some(s"fold:${bs.size}buckets:snapshot=${st.snapshot.snapshotId}")
      case Advice("compact", args, _) =>
        val bs = args.stripPrefix("buckets=")
          .split(",").filter(_.nonEmpty).map(_.toInt).toSet
        val st = Compaction.compact(lake, buckets = Some(bs))
        Some(s"compact:${bs.size}buckets:snapshot=${st.snapshot.snapshotId}")
      case _ => None
    }
}
