package graft.tools
/** Time a single catalog query: QTime <name> <sfDir> [cores]. */
object QTime {
  def main(args: Array[String]): Unit = {
    val cores = if (args.length > 2) args(2) else "32"
    val spark = org.apache.spark.sql.SparkSession.builder()
      .master(s"local[$cores]")
      .config("spark.sql.shuffle.partitions", cores)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val t0 = System.nanoTime()
    val n = graft.Queries.all(args(0))(spark, args(1)).count()
    println(f"${args(0)}: ${(System.nanoTime() - t0) / 1e9}%.2f s, $n rows")
    spark.stop()
  }
}
