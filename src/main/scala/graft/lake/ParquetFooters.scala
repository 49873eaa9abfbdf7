package graft.lake

import org.apache.hadoop.conf.Configuration
import org.apache.hadoop.fs.Path
import org.apache.parquet.hadoop.ParquetFileReader
import org.apache.parquet.hadoop.util.HadoopInputFile

/** Driver-side parquet footer metadata reads: row counts + column min/max
  * without touching data pages — the write/read-side metrics collection a
  * real table format keeps in its manifests. O(files) small IOs; callers
  * parallelize over files. */
object ParquetFooters {

  private val conf = new Configuration()

  /** (rows, min, max) of a string column, from footer statistics. */
  def stringStats(path: String, column: String): (Long, String, String) = {
    withFooter(path) { footer =>
      var rows = 0L; var mn: String = null; var mx: String = null
      footer.getBlocks.forEach { block =>
        rows += block.getRowCount
        block.getColumns.forEach { c =>
          if (c.getPath.toDotString == column && c.getStatistics != null &&
              !c.getStatistics.isEmpty) {
            val lo = c.getStatistics.minAsString()
            val hi = c.getStatistics.maxAsString()
            if (mn == null || lo < mn) mn = lo
            if (mx == null || hi > mx) mx = hi
          }
        }
      }
      (rows, Option(mn).getOrElse(""), Option(mx).getOrElse(""))
    }
  }

  /** (rows, Some((min, max))) of an int64 column from footer statistics —
    * None when any populated block lacks statistics for the column, so
    * callers fall back to a scan instead of recording corrupted bounds. */
  def longStats(path: String, column: String): (Long, Option[(Long, Long)]) = {
    withFooter(path) { footer =>
      var rows = 0L; var mn = Long.MaxValue; var mx = Long.MinValue
      var missing = false
      footer.getBlocks.forEach { block =>
        rows += block.getRowCount
        var found = false
        block.getColumns.forEach { c =>
          if (c.getPath.toDotString == column && c.getStatistics != null &&
              !c.getStatistics.isEmpty) {
            found = true
            val lo = c.getStatistics.genericGetMin.asInstanceOf[java.lang.Long]
            val hi = c.getStatistics.genericGetMax.asInstanceOf[java.lang.Long]
            if (lo < mn) mn = lo
            if (hi > mx) mx = hi
          }
        }
        if (!found && block.getRowCount > 0) missing = true
      }
      (rows, if (missing || mn > mx) None else Some((mn, mx)))
    }
  }

  /** Total null counts for `columns`, or None if any populated block lacks
    * statistics for one of them (callers must then assume nulls exist). */
  def nullCounts(path: String, columns: Set[String]): Option[Map[String, Long]] = {
    withFooter(path) { footer =>
      val acc = scala.collection.mutable.Map(columns.toSeq.map(_ -> 0L): _*)
      var missing = false
      footer.getBlocks.forEach { block =>
        val seen = scala.collection.mutable.Set[String]()
        block.getColumns.forEach { c =>
          val name = c.getPath.toDotString
          if (columns.contains(name)) {
            if (c.getStatistics != null && c.getStatistics.isNumNullsSet) {
              acc(name) += c.getStatistics.getNumNulls
              seen += name
            }
          }
        }
        if (block.getRowCount > 0 && seen.size < columns.size) missing = true
      }
      if (missing) None else Some(acc.toMap)
    }
  }

  private def withFooter[A](path: String)(
      f: org.apache.parquet.hadoop.metadata.ParquetMetadata => A): A = {
    val reader = ParquetFileReader.open(
      HadoopInputFile.fromPath(new Path(path), conf))
    try f(reader.getFooter) finally reader.close()
  }

  /** Parallel map over independent footer reads. */
  def parMap[A, B](xs: Seq[A], threads: Int = 16)(f: A => B): Seq[B] = {
    import scala.collection.parallel.CollectionConverters._
    val par = xs.par
    par.tasksupport = new scala.collection.parallel.ForkJoinTaskSupport(
      new java.util.concurrent.ForkJoinPool(threads))
    par.map(f).seq
  }
}
