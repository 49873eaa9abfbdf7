package graft.streaming

import org.apache.spark.sql.{DataFrame, Dataset}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout}

/**
 * Streaming analytics over the transcript changelog — the Structured
 * Streaming surface beyond the CDC tailer itself: event-time windowed
 * aggregation with a watermark (late-data bound) and keyed custom state via
 * `mapGroupsWithState`.
 *
 * The CDC MERGE deliberately needs NO streaming state (LWW + snapshot is
 * stateless per batch — SURVEY.md §7.3); these operators cover the
 * reference's windowed/keyed-state shapes (count windows W2, keyed process
 * functions W6 — ActivityAggregateUpdaterStreamTask.scala:33-35,
 * CertificateGeneratorStreamTask.scala:83-85) for consumers that want
 * rolling statistics rather than table state.
 */
object StreamAnalytics {

  final case class TurnEvent(
      conv_id: String, turn_idx: Int, role: String,
      ts: java.sql.Timestamp, lsn: Long)

  final case class ConvProgress(
      conv_id: String, turns_seen: Long, max_lsn: Long, distinct_roles: Int)

  /** Per-role turn counts over event-time tumbling windows; the watermark
    * bounds state and drops data later than `watermark`. */
  def windowedTurnCounts(
      events: DataFrame,
      watermark: String = "10 minutes",
      windowLen: String = "1 hour"): DataFrame =
    events
      .withWatermark("ts", watermark)
      .groupBy(window(col("ts"), windowLen).as("win"), col("role"))
      .agg(count(lit(1)).as("n_turns"))
      .select(col("win.start").as("window_start"), col("role"), col("n_turns"))

  /** Keyed custom state: running per-conversation progress accumulated
    * across micro-batches (turns seen, high-water LSN, role diversity). */
  def conversationProgress(events: Dataset[TurnEvent]): Dataset[ConvProgress] = {
    import events.sparkSession.implicits._
    events
      .groupByKey(_.conv_id)
      .mapGroupsWithState[(Long, Long, Set[String]), ConvProgress](
        GroupStateTimeout.NoTimeout) {
        (convId: String, it: Iterator[TurnEvent],
         state: GroupState[(Long, Long, Set[String])]) =>
          val (turns0, maxLsn0, roles0) =
            state.getOption.getOrElse((0L, -1L, Set.empty[String]))
          var turns = turns0; var maxLsn = maxLsn0; var roles = roles0
          it.foreach { e =>
            turns += 1
            if (e.lsn > maxLsn) maxLsn = e.lsn
            roles += e.role
          }
          state.update((turns, maxLsn, roles))
          ConvProgress(convId, turns, maxLsn, roles.size)
      }
  }
}
