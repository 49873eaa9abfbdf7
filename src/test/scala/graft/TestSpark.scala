package graft

import org.apache.spark.sql.SparkSession

object TestSpark {
  lazy val spark: SparkSession = {
    val s = SparkSession.builder()
      .master("local[4]")
      .appName("graft-test")
      .config("spark.sql.shuffle.partitions", "8")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    s.sparkContext.setLogLevel("WARN")
    s
  }

  /** Fresh scratch dir under target/ (tests must not write outside the repo). */
  def tmpDir(name: String): String = {
    val d = new java.io.File(s"target/test-tmp/$name-${System.nanoTime()}")
    d.mkdirs()
    d.getPath
  }
}
