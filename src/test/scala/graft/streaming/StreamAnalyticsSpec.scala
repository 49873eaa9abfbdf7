package graft.streaming

import java.sql.Timestamp

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.streaming.OutputMode
import org.scalatest.funsuite.AnyFunSuite

import graft.TestSpark
import graft.streaming.StreamAnalytics._

class StreamAnalyticsSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark

  private def ev(conv: String, turn: Int, role: String, hour: Int, lsn: Long) =
    TurnEvent(conv, turn, role, Timestamp.valueOf(f"2024-01-01 $hour%02d:15:00"), lsn)

  test("watermarked windowed turn counts aggregate by event-time hour") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val src = MemoryStream[TurnEvent]
    val q = windowedTurnCounts(src.toDF(), watermark = "1 hour", windowLen = "1 hour")
      .writeStream.format("memory").queryName("wtc")
      .outputMode(OutputMode.Update()).start()
    src.addData(
      ev("c1", 0, "user", 10, 1), ev("c1", 1, "assistant", 10, 2),
      ev("c2", 0, "user", 10, 3), ev("c2", 1, "user", 11, 4))
    q.processAllAvailable()
    val got = spark.table("wtc")
      .collect().map(r => (r.getTimestamp(0).toString, r.getString(1), r.getLong(2)))
      .toSet
    assert(got == Set(
      ("2024-01-01 10:00:00.0", "user", 2L),
      ("2024-01-01 10:00:00.0", "assistant", 1L),
      ("2024-01-01 11:00:00.0", "user", 1L)))
    q.stop()
  }

  test("mapGroupsWithState accumulates per-conversation progress across batches") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val src = MemoryStream[TurnEvent]
    val q = conversationProgress(src.toDS())
      .writeStream.format("memory").queryName("cp")
      .outputMode(OutputMode.Update()).start()

    src.addData(ev("c1", 0, "user", 10, 1), ev("c1", 1, "assistant", 10, 2))
    q.processAllAvailable()
    src.addData(ev("c1", 2, "user", 11, 7), ev("c2", 0, "tool", 11, 5))
    q.processAllAvailable()

    // latest state per conversation (memory sink in Update mode appends;
    // take the row with max turns_seen per key)
    val latest = spark.table("cp").collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2), r.getInt(3)))
      .groupBy(_._1).map { case (k, xs) => k -> xs.maxBy(_._2) }
    assert(latest("c1") == ("c1", 3L, 7L, 2))
    assert(latest("c2") == ("c2", 1L, 5L, 1))
    q.stop()
  }
}
