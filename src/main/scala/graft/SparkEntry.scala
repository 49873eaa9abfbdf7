package graft
import org.apache.spark.sql.{SparkSession, DataFrame}

import graft.cdc.CdcDriver
import graft.changelog.ChangelogGen
import graft.lake.LakeTable

/** Driver contract — see /root/repo/SURVEY.md §7 + the builder prompt. */
object SparkEntry {

  /** Flagship: the CDC engine end-to-end — generate a deterministic
    * transcript changelog (inserts/updates/deletes/duplicate deliveries),
    * replay it through the epoch-fenced LWW MERGE into the lake table, and
    * return the final transcript state. */
  def entry(spark: SparkSession): DataFrame = {
    // Fixed dir, wiped before AND after: a crashed prior invocation's
    // leftovers are reclaimed, and nothing is left behind (round-3 verdict:
    // the old nanotime-suffixed dir leaked per call).
    def rm(f: java.io.File): Unit =
      graft.lake.LakeIO.delete(f.getPath)
    val base = new java.io.File("target/entry")
    rm(base); base.mkdirs()
    try {
      val changelog = new java.io.File(base, "changelog").getPath
      ChangelogGen.write(spark, changelog, ChangelogGen.Config(
        nEvents = 2000, nConvs = 40, turnsPerConv = 10,
        pUpdate = 0.3, pDelete = 0.05, pDup = 0.05, segSize = 500))
      val lake = new LakeTable(spark, new java.io.File(base, "lake").getPath)
      new CdcDriver(spark, changelog, lake, segmentsPerBatch = 2, nBuckets = 16,
        quiet = true).run()
      // Materialize the (small) final state so the returned DataFrame does
      // not lazily reference lake files the finally below deletes.
      val out = lake.read()
      spark.createDataFrame(
        new java.util.ArrayList(java.util.Arrays.asList(out.collect(): _*)),
        out.schema)
    } finally rm(base)
  }

  /** One entry per implemented operator from SURVEY.md §2 (+ the
    * training-data-pipeline operator set). Implementations in Queries.scala. */
  def queries: Map[String, (SparkSession, String) => DataFrame] = Queries.all

  /** DuckDB-runnable oracle SQL per query (exact parity contract documented
    * in Queries.scala / OracleSql.scala). */
  def oracleSql: Map[String, String] = OracleSql.all
}
