package graft.tools
/** CPU-scaling probe: pure-compute Spark job, no IO. */
object CpuScale {
  def main(args: Array[String]): Unit = {
    val c = args(0)
    val spark = org.apache.spark.sql.SparkSession.builder().master(s"local[$c]")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    import org.apache.spark.sql.functions._
    val t0 = System.nanoTime()
    spark.range(0, 2000000000L, 1, c.toInt * 4)
      .select(sum(xxhash64(col("id")).cast("decimal(38,0)"))).head()
    println(f"cores=$c sec=${(System.nanoTime() - t0) / 1e9}%.2f")
    spark.stop()
  }
}
