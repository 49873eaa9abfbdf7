package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window

/** Variant timing for the LWW winner + bucket write. */
object PlanDebug2 {
  def main(args: Array[String]): Unit = {
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder().master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.maxConcurrentOutputFileWriters",
        sys.env.getOrElse("MAXW", "0"))
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val dir = args(0)

    def time(name: String)(f: => Any): Unit = {
      val t0 = System.nanoTime()
      val r = f
      println(f"$name: ${(System.nanoTime() - t0) / 1e9}%.2f s")
    }

    val batch = spark.read.parquet(dir)
      .withColumn("_tombstone", col("op") === "D").drop("op")
    batch.count() // warm fs cache / file index

    // (a) current: max_by struct agg
    val allCols = batch.columns.toIndexedSeq
    val rowStruct = struct(allCols.map(col): _*)
    val wA = batch.groupBy("conv_id", "turn_idx")
      .agg(max_by(rowStruct, col("_lsn")).as("w")).select(col("w.*"))
    time("a: max_by struct agg")(wA.write.format("noop").mode("overwrite").save())

    // (b) window row_number
    val win = Window.partitionBy("conv_id", "turn_idx")
      .orderBy(col("_lsn").desc)
    val wB = batch.withColumn("_rn", row_number().over(win))
      .filter(col("_rn") === 1).drop("_rn")
    time("b: window row_number")(wB.write.format("noop").mode("overwrite").save())

    // (c) hash-agg max lsn + rejoin + per-partition dedup via window again? ->
    //     rejoin then dropDuplicates over keys
    val maxl = batch.groupBy(col("conv_id").as("c"), col("turn_idx").as("t"))
      .agg(max("_lsn").as("ml"))
    val wC = batch.join(maxl,
        col("conv_id") === col("c") && col("turn_idx") === col("t") &&
          col("_lsn") === col("ml"))
      .drop("c", "t", "ml")
      .dropDuplicates("conv_id", "turn_idx")
    time("c: maxlsn join + dropDup")(wC.write.format("noop").mode("overwrite").save())

    // write variants on (b)'s output
    val merged = wB.withColumn("b",
      pmod(xxhash64(col("conv_id")), lit(64L)).cast("int"))
    time("w1: repart(b)+sortWithin(b)+partitionBy") {
      merged.repartition(64, col("b")).sortWithinPartitions("b")
        .write.mode("overwrite").partitionBy("b").parquet("target/perf/w1")
    }
    time("w2: repart(b)+partitionBy (writer sorts)") {
      merged.repartition(64, col("b"))
        .write.mode("overwrite").partitionBy("b").parquet("target/perf/w2")
    }
    time("w3: plain write") {
      merged.repartition(64, col("b"))
        .write.mode("overwrite").parquet("target/perf/w3")
    }
    spark.stop()
  }
}
