package graft.cdc

import org.apache.spark.sql.SparkSession

import graft.changelog.ChangelogGen
import graft.lake.LakeTable

/**
 * Deterministic incremental driver: tails a changelog directory of
 * `seg=N/` parquet segments and applies them to the lake table in
 * micro-batches of `segmentsPerBatch` segments.
 *
 * The checkpoint IS the lake commit log: each snapshot's `epoch` is the
 * number of source segments applied so far, so resume-after-kill needs no
 * side state — a fresh driver reads the current snapshot and continues from
 * `epoch` (reference analogue: Flink checkpoint + store-checksum-after-write,
 * FlinkUtil.scala:16-32 + CollectionProgressCompleteFunction.scala:58-62;
 * ours is strictly stronger because data+position commit atomically).
 *
 * Per-batch metrics (rows/sec) are printed as one JSON line each and stored
 * in the snapshot metadata (north rule: per-batch rows/sec + lineage).
 */
object CdcDriver {
  /** Effective retention for a run: the caller's `keepSnapshots`, floored
    * when a derived table or search index is attached (their catch-up /
    * refresh base must never be expired from under them); 0 = keep
    * everything. With a BATCHED index refresh (`indexEvery` > 1) the
    * index's diff base lags up to `indexEvery` main commits — each possibly
    * paired with a fold maintenance commit — so the floor grows to
    * 2 x indexEvery. Shared by the batch driver and the streaming tailer. */
  private[cdc] def effectiveKeep(keepSnapshots: Int, hasDerived: Boolean,
                                 indexEvery: Int = 1): Int =
    if (keepSnapshots <= 0) 0
    else if (hasDerived)
      math.max(keepSnapshots, math.max(2, 2 * math.max(indexEvery, 1)))
    else keepSnapshots

  /** Per-batch retention step shared by the batch driver and the tailer. */
  private[cdc] def expireRetained(lake: LakeTable, aggLake: Option[LakeTable],
                                  keep: Int,
                                  replica: Option[LakeTable] = None,
                                  matView: Option[LakeTable] = None): Unit =
    if (keep > 0) {
      lake.expireSnapshots(keep)
      aggLake.foreach(_.expireSnapshots(keep))
      replica.foreach(_.expireSnapshots(keep))
      matView.foreach(_.expireSnapshots(keep))
      ()
    }
}

final class CdcDriver(
    spark: SparkSession,
    changelogDir: String,
    lake: LakeTable,
    segmentsPerBatch: Int = 4,
    nBuckets: Int = 64,
    saltBuckets: Int = 0,
    quiet: Boolean = false,
    /** optional derived conv_agg table, maintained after every batch
      * (AggMaintenance) under the same epoch fencing */
    aggLake: Option[LakeTable] = None,
    /** the feed contains op='P' partial-column patch events */
    patchEnabled: Boolean = false,
    /** classify + count per-row change actions (CdcApply change feed);
      * turn off for pure-ingest throughput */
    changeFeed: Boolean = true,
    /** optional secondary search index (graft.search.SearchIndex postings
      * table), refreshed after every batch from the change-feed images —
      * the reference mirrors every entity update into Elasticsearch from
      * the same stream (ElasticSearchUtil.scala:62-106) */
    searchIndex: Option[LakeTable] = None,
    /** auto-compact the index once any bucket's delta chain reaches this
      * many segments (LSM merge policy; 0 = never — manual CLI only) */
    indexCompactChain: Int = 16,
    /** refresh the search index every N applied batches instead of every
      * batch (1 = per batch). The refresh is a NET snapshot diff, so
      * batching both amortizes the fixed posting-write fan-out (one
      * bucketed delta write per refresh, not per batch) and indexes a
      * hot key's text ONCE per window instead of once per update — the
      * posting write amplification that capped index-on replay
      * throughput. The run's final batch always triggers a catch-up
      * refresh, so a completed run leaves the index current; retention is
      * floored at 2 x indexEvery so the diff base survives (effectiveKeep). */
    indexEvery: Int = 1,
    /** snapshot retention: after each batch, expire all but the newest N
      * snapshots of the lake (and derived agg table), reclaiming data files
      * only they reference. 0 = keep everything (manual `expire` CLI).
      * Copy-on-write retains every superseded bucket file until expiry, so
      * an unbounded-history 10^10-event replay would hold O(batches x
      * touched data) on disk; retention bounds that at O(N x table).
      * Trade: time travel / snapshot-diff change feeds reach back only N
      * snapshots. When a derived table or search index is attached, the
      * effective floor is 2 so their catch-up/refresh base (at most one
      * snapshot behind, crash windows included) is never expired from
      * under them. */
    keepSnapshots: Int = 0,
    /** merge-on-read ingest (seeds a NEW table; an existing table's stored
      * mode wins): batches append per-bucket delta files instead of
      * rewriting touched buckets — O(batch) writes for update-heavy trickle
      * feeds into a large table; readers resolve LWW over the chain. See
      * CdcApply `mor`. */
    mor: Boolean = false,
    /** automatic LSM merge policy for a MoR lake: after each batch, fold
      * any bucket whose delta chain reached this many segments
      * (CdcApply.maybeFold; 0 = never — manual CLI `fold` only). */
    morCompactChain: Int = 16,
    /** optional filtered/projected row-level replica (graft.cdc.Replica),
      * refreshed after every batch from the change feed — the reference
      * mirrors entity subsets into Redis/ES from the same stream. The
      * contract persists with the replica; where/cols seed a NEW one. */
    replica: Option[LakeTable] = None,
    replicaWhere: String = "",
    replicaCols: Seq[String] = Nil,
    /** optional generalized materialized view (graft.cdc.MatView): SQL
      * aggregates grouped by the bucket key, maintained after every batch
      * at O(touched buckets). `matViewAggs` declares a NEW view's contract
      * (name=aggExpr pairs); an existing view's persisted contract wins. */
    matView: Option[LakeTable] = None,
    matViewAggs: Seq[MatView.AggCol] = Nil,
    /** MULTI-FEED ingest: name this driver's feed and it fences on its own
      * per-source epoch (snapshot.sourceEpochs) — several drivers tailing
      * DIFFERENT changelogs interleave into one table, each exactly-once.
      * Pair with a distinct `partBase` per feed so lineage stays
      * per-(feed, partition). The feeds own lsn comparability: lsn is the
      * global LWW version across all of them. */
    source: Option[String] = None,
    /** added to every `_src_part` (data column AND lineage) — the
      * namespace that keeps two feeds' partition ids distinct. */
    partBase: Int = 0,
    /** changelog segment format: "parquet" (default — footer-derived
      * probe/schema/lineage, the performance path) or "json"
      * (Debezium-style envelopes, graft.changelog.JsonChangelog — pays a
      * parse per event and the merge's fallback probe scan; corrupt lines
      * quarantine). */
    format: String = "parquet") {

  private val matViewCfg: Option[MatView.Config] =
    if (matViewAggs.nonEmpty) Some(MatView.Config(matViewAggs)) else None

  /** Apply up to `maxBatches` pending micro-batches; returns per-batch stats.
    * Safe to call again after a crash or mid-run stop. */
  def run(maxBatches: Int = Int.MaxValue): Seq[CdcApply.ApplyStats] = {
    // Derived-table catch-up: a crash between the main commit and the agg
    // maintain leaves the agg table at an older epoch while the main batch
    // is fenced on resume — reconcile from the lake commit log (also the
    // path that backfills a derived table enabled after the fact).
    aggLake.foreach(al => AggMaintenance.catchUp(spark, lake, al))
    // SearchIndex.refresh is inherently catch-up (indexes from whatever
    // source snapshot the index last saw) — one call heals a crash that
    // landed between a main commit and its index refresh.
    searchIndex.foreach(si => graft.search.SearchIndex.refresh(spark, lake, si))
    // Replica.refresh is likewise catch-up (diffs from whatever source
    // snapshot the replica last folded) — heals the same crash window.
    replica.foreach(r =>
      Replica.refreshAttached(spark, lake, r, replicaWhere, replicaCols))
    // MatView.catchUp heals the same crash window AND backfills a view
    // attached after the fact (new views need the declared agg list).
    matView.foreach(v => MatView.catchUp(spark, lake, v, matViewCfg))
    val segs = ChangelogGen.listSegments(changelogDir)
    // EPOCH-DOMAIN GUARDS (round-3 advice): epochs are only comparable
    // within one driver discipline. An UNNAMED replay resumes from the
    // scalar epoch — on a multi-feed table that is a global commit COUNTER
    // (advances per commit across all feeds), not a segment cursor, so a
    // plain replay would silently skip segments and report them drained.
    // Likewise a source whose epochs were minted by a streaming checkpoint
    // (batchId-based) must not be advanced by segment-based batch epochs.
    lake.currentSnapshot.foreach { s =>
      if (source.isEmpty && s.sourceEpochsOrEmpty.nonEmpty)
        throw new IllegalStateException(
          s"${lake.root} is ingested by NAMED sources " +
          s"(${s.sourceEpochsOrEmpty.keys.toSeq.sorted.mkString(",")}): an " +
          "unnamed replay would resume from the global commit counter and " +
          "skip segments — name this feed (source=...)")
    }
    val boundCkpt = lake.streamBinding(source.getOrElse(""))
    if (boundCkpt.isDefined)
      throw new IllegalStateException(
        s"${lake.root} source '${source.getOrElse("")}' is bound to " +
        s"streaming checkpoint ${boundCkpt.get}: its epochs are " +
        "checkpoint-relative batchIds, not segment cursors — drive it with " +
        "CdcStream (or use a differently-named source for batch backfill)")
    val applied = lake.currentSnapshot.map(s =>
      source match {
        case Some(id) => s.sourceEpoch(id) // per-feed resume cursor
        case None => s.epoch
      }).getOrElse(0L)
    val pending = segs.filter(_ >= applied)
    val out = scala.collection.mutable.ArrayBuffer[CdcApply.ApplyStats]()
    var appliedBatches = 0L
    pending.grouped(segmentsPerBatch).take(maxBatches).foreach { group =>
      val paths = group.map(s => s"$changelogDir/seg=$s")
      val probe =
        if (format == "json") None // no footers; merge runs its probe scan
        else CdcApply.phase("driver-footer-probe") { probeFromFooters(paths) }
      // The footer probe already read every file's footer — its embedded
      // Spark schema JSONs give the batch's (additively merged) schema for
      // free, so the usual distributed mergeSchema inference job (a serial
      // per-batch cost that Amdahl-limits scaling) only runs as a fallback.
      val batch0 = CdcApply.phase("driver-read-schema") {
        if (format == "json")
          graft.changelog.JsonChangelog.readSegments(spark, paths, changelogDir)
        else probe.flatMap(p => FooterProbe.mergedSchema(p.schemaJsons)) match {
          case Some(sc) => spark.read.schema(sc)
            .option("basePath", changelogDir).parquet(paths: _*)
          case None => spark.read
            .option("mergeSchema", "true") // additive evolution across segments
            .option("basePath", changelogDir) // seg=/p= dirs share one root
            .parquet(paths: _*)
        }
      }
      // `seg=`/`p=` path dirs (sharded binlog layout) surface as partition
      // columns duplicating the data; their real job is footer probing
      val batch1 = batch0.drop("p", "seg")
      // multi-feed: namespace this feed's partition ids (data + lineage)
      val batch =
        if (partBase == 0) batch1
        else batch1.withColumn("_src_part",
          org.apache.spark.sql.functions.col("_src_part") +
            org.apache.spark.sql.functions.lit(partBase))
      val shiftedProbe =
        if (partBase == 0) probe
        else probe.map(p => p.copy(lineage = p.lineage.map(l =>
          l.copy(srcPart = l.srcPart + partBase))))
      // epoch = exclusive upper segment bound -> fencing token
      val epoch = group.max + 1
      val stats = CdcApply.apply(lake, batch, epoch, nBuckets, saltBuckets,
        probeInfo = shiftedProbe, patchEnabled = patchEnabled,
        changeFeed = changeFeed, mor = mor, source = source)
      // LSM merge policy: bound the MoR delta chains before derived-table /
      // retention work (the fold is a maintenance commit at the same epoch)
      if (!stats.skipped && lake.currentSnapshot.exists(_.mor))
        CdcApply.maybeFold(lake, morCompactChain)
      // derived tables key on the COMMITTED global epoch (== the driver's
      // epoch for a single feed; distinct from the per-source epoch when
      // several feeds interleave)
      aggLake.foreach { al =>
        if (!stats.skipped && stats.touchedSet.nonEmpty)
          AggMaintenance.maintain(spark, lake, al, stats.touchedSet,
            stats.snapshot.epoch)
      }
      matView.foreach { v =>
        if (!stats.skipped && stats.touchedSet.nonEmpty)
          MatView.maintain(spark, lake, v, stats.touchedSet,
            stats.snapshot.epoch, aggs = matViewCfg)
      }
      val keep = CdcDriver.effectiveKeep(keepSnapshots,
        aggLake.isDefined || searchIndex.isDefined || replica.isDefined ||
          matView.isDefined, indexEvery)
      if (!stats.skipped) {
        appliedBatches += 1
        searchIndex.foreach { si =>
          if (indexEvery <= 1 || appliedBatches % indexEvery == 0) {
            graft.search.SearchIndex.refresh(spark, lake, si)
            graft.search.SearchIndex.maybeCompact(si, indexCompactChain, keep)
          }
        }
        replica.foreach(r =>
          Replica.refreshAttached(spark, lake, r, replicaWhere, replicaCols))
      }
      CdcDriver.expireRetained(lake, aggLake, keep, replica, matView)
      out += stats
      if (!quiet) {
        val s = stats
        val cf = Seq("inserted", "updated", "deleted", "delete_noop", "carried")
          .map(k => s""""$k":${s.actions.getOrElse(k, 0L)}""").mkString(",")
        println(
          s"""{"batchEpoch":$epoch,"snapshotId":${s.snapshot.snapshotId},""" +
          s""""rowsIn":${s.rowsIn},"rowsOut":${s.rowsOut},""" +
          s""""failedEvents":${s.failedEvents},""" +
          s""""touchedBuckets":${s.touchedBuckets},""" +
          f""""durationSec":${s.durationSec}%.3f,"rowsPerSec":${s.eventsPerSec}%.1f,""" +
          s""""skipped":${s.skipped},"changeFeed":{$cf}}""")
      }
    }
    // batched refresh: the window may end mid-cycle — catch the index up so
    // a completed run always leaves it current (fenced no-op when it is)
    if (indexEvery > 1 && appliedBatches > 0) searchIndex.foreach { si =>
      graft.search.SearchIndex.refresh(spark, lake, si)
      graft.search.SearchIndex.maybeCompact(si, indexCompactChain,
        CdcDriver.effectiveKeep(keepSnapshots, hasDerived = true, indexEvery))
    }
    out.toSeq
  }

  /** Per-source-partition lineage + row count for a batch straight from the
    * footers of the changelog's parquet files under `seg=N/p=P/` (driver
    * metadata IO only; no cluster scan — shared with the streaming tailer,
    * see [[FooterProbe]]). Returns None if the layout lacks `p=` dirs (flat
    * segments fall back to the probe scan).
    *
    * The null-free proof must cover the LAKE'S OWN key columns: probing the
    * transcript names against a generic-key table would "prove" the wrong
    * columns null-free and let a null real key skip validation — so the spec
    * comes from the current snapshot (fresh lakes seed as transcripts, which
    * is also what this driver's CdcApply call seeds). */
  private def probeFromFooters(segDirs: Seq[String]): Option[CdcApply.ProbeInfo] = {
    val ks = lake.currentSnapshot.map(_.keySpec)
      .getOrElse(graft.model.Schemas.KeySpec.transcripts)
    FooterProbe.fromSegDirs(segDirs, ks.keyCols.toSet + "_lsn",
      bucketKeys = ks.bucketCols)
  }
}
