package graft.tools
/** Dump formatted physical plans of catalog queries: PlanDump <sfDir> <name>... */
object PlanDump {
  def main(args: Array[String]): Unit = {
    val spark = org.apache.spark.sql.SparkSession.builder()
      .master("local[4]")
      .config("spark.sql.shuffle.partitions", "4")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    args.drop(1).foreach { name =>
      println(s"===== $name =====")
      graft.Queries.all(name)(spark, args(0)).explain("formatted")
    }
    spark.stop()
  }
}
