package graft.tools
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Scratch diagnostic: row-level diff of two lakes' live states. */
object DiffJson {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[8]")
      .config("spark.sql.shuffle.partitions", "8")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val a = new graft.lake.LakeTable(spark, args(0)).read()
    val b = new graft.lake.LakeTable(spark, args(1)).read()
    println("schemaA=" + a.schema.map(f => f.name + ":" + f.dataType.simpleString).mkString(","))
    println("schemaB=" + b.schema.map(f => f.name + ":" + f.dataType.simpleString).mkString(","))
    val cols = a.columns.toSeq
    val d1 = a.exceptAll(b.select(cols.map(col): _*))
    val d2 = b.select(cols.map(col): _*).exceptAll(a)
    println("onlyA=" + d1.count() + " onlyB=" + d2.count())
    d1.orderBy("conv_id", "turn_idx").limit(3).collect()
      .foreach(r => println("A: " + r))
    d2.orderBy("conv_id", "turn_idx").limit(3).collect()
      .foreach(r => println("B: " + r))
    spark.stop()
  }
}
