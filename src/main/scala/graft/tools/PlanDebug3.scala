package graft.tools

import org.apache.spark.sql.{Encoders, Row, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window

/** One-shuffle LWW variants: bucket repartition + partition-local dedup. */
object PlanDebug3 {
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
      f
      println(f"$name: ${(System.nanoTime() - t0) / 1e9}%.2f s")
    }

    val batch = spark.read.parquet(dir)
      .withColumn("_tombstone", col("op") === "D").drop("op")
      .withColumn("b", pmod(xxhash64(col("conv_id")), lit(64L)).cast("int"))
    batch.count()

    val sorted = batch.repartition(64, col("b"))
      .sortWithinPartitions(col("b"), col("conv_id"), col("turn_idx"), col("_lsn").desc)

    // (d) lag-based first-of-key, window partitioned by b (no extra exchange)
    val w = Window.partitionBy("b")
      .orderBy(col("conv_id"), col("turn_idx"), col("_lsn").desc)
    val wD = sorted
      .withColumn("_pc", lag("conv_id", 1).over(w))
      .withColumn("_pt", lag("turn_idx", 1).over(w))
      .filter(col("_pc").isNull || col("_pc") =!= col("conv_id") ||
        col("_pt") =!= col("turn_idx"))
      .drop("_pc", "_pt")
    time("d: lag filter noop")(wD.write.format("noop").mode("overwrite").save())
    time("d: lag filter + partitionBy write") {
      wD.write.mode("overwrite").partitionBy("b").parquet("target/perf/wd")
    }

    // (e) mapPartitions first-of-key
    val schema = sorted.schema
    val ci = schema.fieldIndex("conv_id"); val ti = schema.fieldIndex("turn_idx")
    val wE = sorted.mapPartitions { it =>
      var lastC: String = null; var lastT: Int = -1; var any = false
      it.flatMap { r =>
        val c = r.getString(ci); val t = r.getInt(ti)
        if (any && c == lastC && t == lastT) None
        else { lastC = c; lastT = t; any = true; Some(r) }
      }
    }(Encoders.row(schema))
    time("e: mapPartitions noop")(wE.write.format("noop").mode("overwrite").save())
    time("e: mapPartitions + partitionBy write") {
      wE.write.mode("overwrite").partitionBy("b").parquet("target/perf/we")
    }
    wD.explain("formatted")
    spark.stop()
  }
}
