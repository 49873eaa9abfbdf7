package graft.tools
/** Scan-scaling probe over the generated changelog. */
object ScanScale {
  def main(args: Array[String]): Unit = {
    val spark = org.apache.spark.sql.SparkSession.builder()
      .master(s"local[${args(0)}]")
      .config("spark.sql.files.maxPartitionBytes", s"${16 * 1024 * 1024}")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    import org.apache.spark.sql.functions._
    def t(n: String)(f: => Any) = {
      val t0 = System.nanoTime(); f
      println(f"$n: ${(System.nanoTime() - t0) / 1e9}%.2f s")
    }
    val df = spark.read.parquet(args(1))
    t("count")(df.count())
    t("count2")(df.count())
    t("hashagg 3col") {
      df.select(col("_src_part"), col("_src_off"), xxhash64(col("conv_id")).as("h"))
        .groupBy("_src_part").agg(count(lit(1)), avg("h")).collect()
    }
    t("scan all cols noop")(df.write.format("noop").mode("overwrite").save())
    spark.stop()
  }
}
