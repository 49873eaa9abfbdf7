package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Scratch harness: stage-by-stage timing + explain of the MERGE plan. */
object PlanDebug {
  def main(args: Array[String]): Unit = {
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder().master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val dir = args(0)

    def time(name: String)(f: => Any): Unit = {
      val t0 = System.nanoTime()
      val r = f
      println(f"$name: ${(System.nanoTime() - t0) / 1e9}%.2f s ($r)")
    }

    val batch = spark.read.parquet(dir)
    time("scan+count")(batch.count())
    time("scan noop")(batch.write.format("noop").mode("overwrite").save())
    time("probe") {
      batch.select(col("_src_part"), col("_src_off"),
          pmod(xxhash64(col("conv_id")), lit(64L)).cast("int").as("b"))
        .groupBy("_src_part")
        .agg(min("_src_off"), max("_src_off"), count(lit(1)), collect_set("b"))
        .collect().length
    }
    val allCols = batch.columns.filterNot(_ == "op").toIndexedSeq
    val withTomb = batch.withColumn("_tombstone", col("op") === "D").drop("op")
    val rowStruct = struct((allCols :+ "_tombstone").map(col): _*)
    val winners = withTomb
      .groupBy(col("conv_id"), col("turn_idx"))
      .agg(max_by(rowStruct, col("_lsn")).as("w"))
      .select(col("w.*"))
    winners.explain("formatted")
    time("lww agg noop")(winners.write.format("noop").mode("overwrite").save())
    val merged = winners.withColumn("b",
      pmod(xxhash64(col("conv_id")), lit(64L)).cast("int"))
    time("lww+repart+write parquet") {
      merged.repartition(64, col("b"))
        .write.mode("overwrite").partitionBy("b").parquet("target/perf/dbg-out")
    }
    time("lww+write-nopartition") {
      merged.repartition(64, col("b"))
        .write.mode("overwrite").parquet("target/perf/dbg-out2")
    }
    spark.stop()
  }
}
