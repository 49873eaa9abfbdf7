package graft.lake

/**
 * Deep clone: a fully INDEPENDENT copy of a lake at a chosen snapshot —
 * the disaster-recovery / dev-copy operation (≍ Delta DEEP CLONE; a
 * shallow, manifest-sharing clone is deliberately not offered because the
 * source's retention/GC would silently break it, the documented footgun of
 * shallow clones).
 *
 * Mechanics: every data file's BYTES are copied (per-file key stats, zone
 * maps, bloom filters, MoR delta chains and tombstones are preserved
 * exactly — no re-election, no rewrite skew), per-bucket manifests are
 * rebuilt under the destination with identical stats, and ONE v0 snapshot
 * carries the source's schema (field ids included), key spec, bucket
 * count, storage mode, EPOCH and lineage — so replaying the source's
 * changelog against the clone fences exactly like the source (the clone is
 * a valid resume point for the same feed), and CHECK constraints carry
 * over (table-level rules, like the schema). Tags do NOT carry (they pin
 * snapshot ids that don't exist in the clone's single-snapshot history).
 *
 * Scale shape: the unit of work is one file copy — embarrassingly
 * parallel. Locally the driver fans it through ParquetFooters.parMap; a
 * cluster deployment fans the same file list through a distributed copy
 * (distcp-style) and runs the identical manifest rebuild, which is
 * O(files) metadata work.
 */
object Clone {

  /** Copy `src` as of `asOf` (a snapshot id; -1 = current) into the empty
    * `dstRoot`. Returns the clone's v0 snapshot. */
  def deepClone(src: LakeTable, dstRoot: String, asOf: Long = -1L): Snapshot = {
    val snap =
      if (asOf < 0) src.currentSnapshot.getOrElse(
        throw new IllegalStateException(s"no snapshot in ${src.root}"))
      else src.snapshots.find(_.snapshotId == asOf).getOrElse(
        throw new NoSuchElementException(
          s"no snapshot $asOf in ${src.root} (expired or never committed)"))
    val dst = new LakeTable(src.spark, dstRoot)
    require(dst.currentSnapshot.isEmpty,
      s"clone destination $dstRoot already holds a table")

    // copy every data file of the chosen snapshot, bucket structure kept;
    // the MoR chain ORDER within a bucket is positional in the manifest, so
    // metas are rebuilt in manifest order with only the path swapped
    val dataDir = s"$dstRoot/data/clone-${snap.snapshotId}"
    val work: Seq[(Int, Seq[DataFileMeta])] = snap.manifests.map { ref =>
      ref.bucket -> Manifests.load(ref)
    }
    val copied: Seq[(Int, Seq[DataFileMeta])] =
      ParquetFooters.parMap(work) { case (bucket, files) =>
        bucket -> files.map { f =>
          val name = f.path.split('/').last
          val to = s"$dataDir/b=$bucket/$name"
          LakeIO.copy(f.path, to)
          f.copy(path = to)
        }
      }
    // one manifest per (bucket, source manifest) pair keeps MoR delta
    // chains segment-for-segment identical (fold thresholds behave the same)
    val refs = copied.flatMap { case (bucket, files) =>
      dst.writeManifests(snap.snapshotId, Map(bucket -> files))
    }
    // constraints are table-level rules: they travel with the data
    src.checks.foreach { case (n, e) => dst.addCheck(n, e,
      validateExisting = false) }
    dst.commit(Snapshot(
      snapshotId = 0L, parentId = -1L, epoch = snap.epoch,
      schemaJson = snap.schemaJson, schemaVersion = snap.schemaVersion,
      nBuckets = snap.nBuckets, manifests = refs, lineage = snap.lineage,
      metrics = Map("clonedFromSnapshot" -> snap.snapshotId.toDouble,
        "rows" -> snap.totalRows.toDouble),
      bucketCols = snap.bucketCols, keyCols = snap.keyCols, mor = snap.mor,
      sourceEpochs = snap.sourceEpochsOrEmpty,
      lastFieldId = snap.lastFieldId,
      liveRows = snap.liveRows))
  }
}
