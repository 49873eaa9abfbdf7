package graft.cdc

/**
 * Footer-derived batch metadata shared by the batch driver and the streaming
 * tailer: per-source-partition lineage + row count + key-null-freedom proof
 * for a set of changelog parquet files, computed from parquet FOOTERS on the
 * driver (O(files) metadata IO, no cluster scan — the reference reads the
 * same lineage token off each Kafka record, JobRequestSerde.scala:22-35).
 *
 * With this in hand, CdcApply needs exactly ONE data pass per batch: the
 * validation count rides the merge via `observe`, the lineage probe and the
 * row count come from here, and dense batches skip the bucket probe.
 */
object FooterProbe {

  private val partRe = raw"/p=(\d+)/".r

  /** Probe from `seg=N/p=P/` segment directories (batch driver layout).
    * Returns None when the layout lacks `p=` dirs (flat segments fall back
    * to CdcApply's probe scan). */
  def fromSegDirs(segDirs: Seq[String], keyCols: Set[String],
                  bucketKey: String = "conv_id"): Option[CdcApply.ProbeInfo] = {
    val perPart = segDirs.flatMap { d =>
      graft.lake.LakeIO.list(d)
        .filter { case (name, _, isDir) => isDir && name.startsWith("p=") }
        .flatMap { case (name, path, _) =>
          val part = name.stripPrefix("p=").toInt
          graft.lake.LakeIO.list(path)
            .filter(_._1.endsWith(".parquet")).map(f => part -> f._2)
        }
    }
    fromFiles(perPart, keyCols, bucketKey)
  }

  /** Probe from concrete data-file paths (the streaming micro-batch's
    * `DataFrame.inputFiles`): source partition parsed from the `/p=P/` path
    * component. Returns None if any file lacks it. */
  def fromInputFiles(paths: Seq[String], keyCols: Set[String],
                     bucketKey: String = "conv_id"): Option[CdcApply.ProbeInfo] = {
    val perPart = paths.map { p =>
      partRe.findFirstMatchIn(p) match {
        case Some(m) => m.group(1).toInt -> p
        case None => return None // flat layout: fall back to the probe scan
      }
    }
    fromFiles(perPart, keyCols, bucketKey)
  }

  /** Core: (srcPartition, filePath) pairs -> ProbeInfo, or None when any
    * populated file lacks `_src_off` footer stats (recording corrupted
    * lineage bounds would be worse than one probe scan). */
  def fromFiles(perPart: Seq[(Int, String)], keyCols: Set[String],
                bucketKey: String = "conv_id"): Option[CdcApply.ProbeInfo] = {
    if (perPart.isEmpty) return None
    val stats = graft.lake.ParquetFooters.parMap(perPart) { case (part, path) =>
      val (n, bounds) = graft.lake.ParquetFooters.longStats(path, "_src_off")
      // The applier may skip the key checks of the validation scan only if
      // footers PROVE them impossible: zero nulls in the key columns AND
      // the bucket-key min excludes empty/whitespace-leading strings (an
      // all-blank key sorts before any printable character, so it would BE
      // the min if present).
      val nullFree = graft.lake.ParquetFooters.nullCounts(path, keyCols)
        .exists(_.values.forall(_ == 0L))
      val (_, minKey, _) =
        graft.lake.ParquetFooters.stringStats(path, bucketKey)
      val nonBlank = minKey.nonEmpty && minKey.head > ' '
      (part, n, bounds, nullFree && nonBlank)
    }
    if (stats.exists(s => s._2 > 0 && s._3.isEmpty)) return None
    val lineage = stats.filter(_._3.nonEmpty).groupBy(_._1).map {
      case (part, xs) =>
        graft.lake.PartitionLineage(part,
          xs.map(_._3.get._1).min, xs.map(_._3.get._2).max)
    }.toSeq.sortBy(_.srcPart)
    Some(CdcApply.ProbeInfo(stats.map(_._2).sum, lineage,
      keysNullFree = stats.forall(_._4)))
  }
}
