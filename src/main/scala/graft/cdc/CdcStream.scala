package graft.cdc

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.streaming.Trigger
import org.apache.spark.sql.types.StructType

import graft.lake.LakeTable

/**
 * Structured Streaming front-end for the same MERGE: tails the changelog
 * directory with the built-in file source and applies each micro-batch via
 * `foreachBatch`, fenced on the checkpointed `batchId` as the commit epoch.
 *
 * foreachBatch is at-least-once — after a crash the last batch can be
 * re-delivered with the same batchId; the lake commit's epoch fence turns
 * that into exactly-once (the Spark-native version of the reference's
 * at-least-once Kafka sinks + conditional writes,
 * FlinkKafkaConnector.scala:18 + AssessmentAggregatorFunction.scala:138-162).
 *
 * Epochs: streaming batchIds restart at the checkpoint, so they are offset
 * by +1 (epoch = batchId + 1) to keep epoch 0 meaning "nothing applied".
 */
object CdcStream {

  def run(
      spark: SparkSession,
      changelogDir: String,
      lake: LakeTable,
      checkpointDir: String,
      schema: StructType,
      nBuckets: Int = 64,
      saltBuckets: Int = 0,
      maxFilesPerTrigger: Int = 16,
      aggLake: Option[LakeTable] = None): Unit = {
    val src = spark.readStream
      .schema(schema)
      .option("maxFilesPerTrigger", maxFilesPerTrigger)
      // recursive lookup: tails both flat `seg=N/` and sharded `seg=N/p=P/`
      // archive layouts without partition-column inference
      .option("recursiveFileLookup", "true")
      .parquet(changelogDir)
    val q = src.writeStream
      .trigger(Trigger.AvailableNow())
      .option("checkpointLocation", checkpointDir)
      .foreachBatch { (batch: org.apache.spark.sql.DataFrame, batchId: Long) =>
        val stats = CdcApply.apply(lake, batch, epoch = batchId + 1,
          nBuckets, saltBuckets)
        aggLake.foreach { al =>
          if (!stats.skipped && stats.touchedSet.nonEmpty)
            AggMaintenance.maintain(spark, lake, al, stats.touchedSet,
              epoch = batchId + 1)
        }
        ()
      }
      .start()
    q.awaitTermination()
  }
}
