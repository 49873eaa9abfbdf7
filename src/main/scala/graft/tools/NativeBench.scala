package graft.tools
import org.apache.spark.sql.functions._
/** One-off: native XxMinHash64 expression vs declarative transform/array_min. */
object NativeBench {
  def main(args: Array[String]): Unit = {
    val spark = org.apache.spark.sql.SparkSession.builder().master("local[8]")
      .config("spark.sql.shuffle.partitions", "8")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    graft.expressions.GraftFunctions.register(spark)
    val docs = spark.read.parquet(s"${args(0)}/documents.parquet")
    docs.count()
    def t(n: String)(f: => Any) = {
      val t0 = System.nanoTime(); f
      println(f"$n: ${(System.nanoTime() - t0) / 1e9}%.2f s")
    }
    t("declarative xxhash64 minhash (8 hashes, char-5)") {
      graft.operators.DedupOps.withMinhashSignature64(docs, "text", 5, 8, "sig")
        .write.format("noop").mode("overwrite").save()
    }
    t("native graft_minhash64 (8 hashes, byte-5)") {
      docs.select(call_function("graft_minhash64", col("text"), lit(5), lit(8)).as("sig"))
        .write.format("noop").mode("overwrite").save()
    }
    spark.stop()
  }
}
