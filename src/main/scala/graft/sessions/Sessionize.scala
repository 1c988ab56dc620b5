package graft.sessions

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Gap-based sessionization (T1) — split each key's ordered event/turn
  * stream into sessions wherever the inter-event gap exceeds a
  * threshold. The transcript-pipeline primitive the reference's batch
  * flow has no analogue of: agent/conversation streams arrive as flat
  * turn or event logs, and downstream linkage (per-session normalize →
  * block → match) needs session boundaries first.
  *
  * Scale shape: ONE shuffle on the partition key, then everything is
  * window functions inside each key's sorted run — `lag` to find gaps,
  * a running `sum` (prefix sum of gap flags) to number sessions. No
  * iteration, no driver state, no data-dependent fan-out; a 10^12-turn
  * table sessionizes in a single pass per the usual sort-based window
  * exec. The per-key sort is the unavoidable cost of the semantics
  * (session numbering is a prefix property); keys are independent so
  * skew only matters for a single key hotter than one executor's sort
  * budget — at that point split by coarse time range first and stitch
  * boundaries, which [[assignSessions]] callers can do above this op.
  *
  * All arithmetic is exact integer microseconds (`unix_micros`), so
  * results are partitioning-independent and DuckDB-hashable bit for bit.
  */
object Sessionize {

  /** Adds `session_idx` (0-based per key, in `tsCol, tieCol` order): a
    * new session starts when the gap from the previous event exceeds
    * `gapSeconds`. First event of a key is always session 0.
    */
  def assignSessions(
      df: DataFrame,
      keyCol: String = "user_id",
      tsCol: String = "ts",
      tieCol: String = "event_id",
      gapSeconds: Long = 1800L): DataFrame = {
    val w = Window.partitionBy(keyCol).orderBy(col(tsCol), col(tieCol))
    val run = w.rowsBetween(Window.unboundedPreceding, Window.currentRow)
    // cast handles TIMESTAMP_NTZ sources (parquet naive timestamps):
    // under the engine-wide UTC session zone the cast is the identity on
    // the microsecond value, matching DuckDB's epoch_us on naive ts
    val us = unix_micros(col(tsCol).cast("timestamp"))
    val gapUs = lit(gapSeconds * 1000000L)
    // first row: lag is null -> flag 0 (no boundary before the stream)
    val boundary = when(us - lag(us, 1).over(w) > gapUs, 1).otherwise(0)
    df.withColumn("session_idx", sum(boundary).over(run).cast("int"))
  }

  /** Incremental sessionization over a committed assignment: fold a
    * batch of new events into `oldAssigned` (a prior [[assignSessions]]
    * output) by recomputing ONLY the keys the batch touches — session
    * numbering is a per-key prefix property, so untouched keys pass
    * through verbatim and the result provably equals running
    * [[assignSessions]] over old ∪ new from scratch. Cost is
    * increment-shaped: one anti-join + a window over the touched keys'
    * events, nothing over the rest of the corpus. At-least-once
    * tolerant: replayed events (same key + tie) dedup before the
    * window, so re-delivering a batch cannot split a session.
    */
  def assignSessionsIncremental(
      oldAssigned: DataFrame,
      newEvents: DataFrame,
      keyCol: String = "user_id",
      tsCol: String = "ts",
      tieCol: String = "event_id",
      gapSeconds: Long = 1800L): DataFrame = {
    val touched = newEvents.select(col(keyCol)).distinct()
    val untouched = oldAssigned.join(touched, Seq(keyCol), "left_anti")
    val replay = oldAssigned.drop("session_idx")
      .unionByName(newEvents)
      .join(touched, Seq(keyCol), "left_semi")
      .dropDuplicates(keyCol, tieCol)
    untouched.unionByName(
      assignSessions(replay, keyCol, tsCol, tieCol, gapSeconds))
  }

  /** Per-session summary over [[assignSessions]] output: event count,
    * start/end timestamps and exact `duration_us` (BIGINT microseconds —
    * integer, so no float-division hashing hazards). One map-side
    * combinable groupBy; the window pass above is the only sort.
    */
  def sessionStats(
      df: DataFrame,
      keyCol: String = "user_id",
      tsCol: String = "ts"): DataFrame =
    df.groupBy(col(keyCol), col("session_idx"))
      .agg(
        count(lit(1)).as("n_events"),
        min(col(tsCol)).as("start_ts"),
        max(col(tsCol)).as("end_ts"),
        (unix_micros(max(col(tsCol)).cast("timestamp")) -
          unix_micros(min(col(tsCol)).cast("timestamp")))
          .as("duration_us"))

  // -------------------------------------------------------------------
  // DuckDB mirrors
  // -------------------------------------------------------------------

  /** Mirror of [[assignSessions]] as a SELECT over table `src`; emits
    * `keyCol, tieCol, tsCol, session_idx`. */
  def assignSessionsSqlDuck(
      src: String,
      keyCol: String = "user_id",
      tsCol: String = "ts",
      tieCol: String = "event_id",
      gapSeconds: Long = 1800L): String =
    s"""SELECT $keyCol, $tieCol, $tsCol,
       |       CAST(SUM(CASE WHEN prev_us IS NOT NULL
       |                      AND us - prev_us > ${gapSeconds * 1000000L}
       |                     THEN 1 ELSE 0 END)
       |            OVER (PARTITION BY $keyCol ORDER BY $tsCol, $tieCol
       |                  ROWS UNBOUNDED PRECEDING) AS INT) AS session_idx
       |FROM (SELECT $keyCol, $tieCol, $tsCol,
       |             epoch_us($tsCol) AS us,
       |             lag(epoch_us($tsCol)) OVER (
       |               PARTITION BY $keyCol ORDER BY $tsCol, $tieCol) AS prev_us
       |      FROM $src)""".stripMargin

  /** Mirror of [[assignSessions]] + [[sessionStats]]; emits
    * `keyCol, session_idx, n_events, start_ts, end_ts, duration_us`. */
  def sessionStatsSqlDuck(
      src: String,
      keyCol: String = "user_id",
      tsCol: String = "ts",
      tieCol: String = "event_id",
      gapSeconds: Long = 1800L): String =
    s"""SELECT $keyCol, session_idx,
       |       count(*) AS n_events,
       |       min($tsCol) AS start_ts,
       |       max($tsCol) AS end_ts,
       |       epoch_us(max($tsCol)) - epoch_us(min($tsCol)) AS duration_us
       |FROM (${assignSessionsSqlDuck(src, keyCol, tsCol, tieCol, gapSeconds)})
       |GROUP BY $keyCol, session_idx""".stripMargin
}
