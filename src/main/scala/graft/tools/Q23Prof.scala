package graft.tools
import org.apache.spark.sql.functions._
import graft.operators.DedupOps
/** Temporary profiling for q23 stages. */
object Q23Prof {
  def main(args: Array[String]): Unit = {
    val spark = org.apache.spark.sql.SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    def t(n: String)(f: => Any) = {
      val t0 = System.nanoTime(); val r = f
      println(f"$n: ${(System.nanoTime() - t0) / 1e9}%.2f s ($r)")
    }
    val docs = spark.read.parquet(s"${args(0)}/documents.parquet")
    t("warm")(docs.count())
    val withSig = DedupOps.withMinhashSignature(
      docs.select(col("doc_id"), col("text")), "text", 5, 4, "_sig")
    t("signature only")(withSig.write.format("noop").mode("overwrite").save())
    val cands = DedupOps.lshCandidates(withSig, "doc_id", "_sig", 2, 2)
    t("candidates")(cands.count())
    val sh = DedupOps.withWordShingleSet(
      docs.select(col("doc_id"), col("text")), "text", 3, "sh")
    t("wordshingles only")(sh.write.format("noop").mode("overwrite").save())
    t("full q23")(graft.Queries.all("q23_minhash_lsh")(spark, args(0)).count())
    spark.stop()
  }
}
