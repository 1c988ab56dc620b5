package graft.streaming

import graft.normalize.Normalizer
import graft.transcripts.Turn
import org.apache.spark.sql.{DataFrame, Dataset}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}

/** Structured Streaming front end for the transcript pipeline. The
  * reference is pure batch (SURVEY.md §2.10), so this is the engine's
  * scale extension: the same normalize chain applied to a turn stream,
  * with (a) watermarked per-tool windowed counts and (b) stateful
  * conversation assembly via flatMapGroupsWithState (the streaming
  * analogue of the batch groupBy-concat stage) emitting a conversation
  * document once its stream of turns goes quiet.
  */
object StreamingNormalize {

  /** Normalize a streaming turn table (same Column chain as batch —
    * identical semantics by construction). */
  def normalizedTurns(turns: DataFrame): DataFrame =
    turns
      .withColumn("text_norm", Normalizer.normalize(col("text")))
      .withColumn("tool_norm", Normalizer.normTool(col("tool")))

  /** Watermarked windowed tool-usage counts (event time = ts). */
  def toolWindowCounts(turns: DataFrame): DataFrame =
    normalizedTurns(turns)
      .filter(col("tool_norm").isNotNull)
      .withWatermark("ts", "10 minutes")
      .groupBy(window(col("ts"), "5 minutes"), col("tool_norm"))
      .agg(count(lit(1)).as("cnt"))
      .select(col("window.start").as("win_start"), col("tool_norm"), col("cnt"))

  /** Streaming KEYED dedup of turns at ingest:
    * `dropDuplicatesWithinWatermark` on the turn identity (the input
    * hint's stable (conv_id, turn_idx) key by default) — first
    * delivery wins, later re-deliveries of the same key within `delay`
    * are dropped even if their payload differs. That is deliberately
    * STRONGER than batch D1's full-row distinct: at-least-once
    * transports re-send the same turn identity, and two payloads under
    * one identity is a producer bug the stable-ordering invariant
    * forbids. Callers that do want the exact streaming face of D1 pass
    * `keys = all columns`. State for a key is dropped once the
    * event-time watermark passes it, so state size tracks the
    * in-flight delay window — NOT the corpus — the only shape that
    * survives a 10^12-turn stream (an unbounded `dropDuplicates`
    * would pin every key ever seen in the state store). */
  def dedupTurnsStream(
      turns: DataFrame,
      delay: String = "10 minutes",
      keys: Seq[String] = Seq("conv_id", "turn_idx")): DataFrame =
    turns
      .withWatermark("ts", delay)
      .dropDuplicatesWithinWatermark(keys)

  case class ConvState(turns: List[(Int, String)])
  case class ConvDoc(conv_id: String, n_turns: Int, doc: String)

  /** Stateful conversation assembly: buffer turns per conv_id, emit the
    * ordered concatenated document once the event-time watermark passes
    * the conversation's last turn by `gapMs` (a session-gap close).
    * Event-time timeouts make this deterministic and replayable — no
    * wall-clock dependence, which also keeps tests hermetic. */
  def assembleConversations(
      turns: Dataset[Turn],
      gapMs: Long = 60000,
      watermarkDelay: String = "0 seconds"): Dataset[ConvDoc] = {
    import turns.sparkSession.implicits._
    turns
      .withWatermark("ts", watermarkDelay)
      .groupByKey(_.conv_id)
      .flatMapGroupsWithState[ConvState, ConvDoc](
        OutputMode.Append(), GroupStateTimeout.EventTimeTimeout()) {
        case (convId, rows, state: GroupState[ConvState]) =>
          if (state.hasTimedOut) {
            val st = state.getOption.getOrElse(ConvState(Nil))
            state.remove()
            val ordered = st.turns.sortBy(_._1)
            Iterator.single(ConvDoc(convId, ordered.size, ordered.map(_._2).mkString("")))
          } else {
            val st = state.getOption.getOrElse(ConvState(Nil))
            val incoming = rows.toList
            val merged = ConvState(st.turns ++ incoming.map(t => (t.turn_idx, t.text)))
            state.update(merged)
            val lastTs = incoming.map(_.ts.getTime).max
            state.setTimeoutTimestamp(lastTs + gapMs)
            Iterator.empty
          }
      }
  }
}
