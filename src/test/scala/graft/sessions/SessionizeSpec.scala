package graft.sessions

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** Gap-based sessionization (T1): boundary semantics (strict `>` on the
  * gap, first row always session 0), tie ordering, stats arithmetic,
  * partitioning invariance, and the fixture actually splitting. */
class SessionizeSpec extends SparkSpec {

  private def ts(s: String) = java.sql.Timestamp.valueOf(s)

  private def events(rows: (Long, Long, String)*) = {
    import spark.implicits._
    rows.map { case (u, e, t) => (u, e, ts(t)) }
      .toDF("user_id", "event_id", "ts")
  }

  test("boundary semantics: gap == threshold stays, gap > threshold splits") {
    val df = events(
      (1L, 0L, "2024-01-01 00:00:00"),
      (1L, 1L, "2024-01-01 00:30:00"), // gap == 1800s -> same session
      (1L, 2L, "2024-01-01 01:00:01"), // gap 1801s -> new session
      (1L, 3L, "2024-01-01 01:00:02"),
      (2L, 4L, "2024-01-05 00:00:00")) // other key: its own session 0
    val got = Sessionize.assignSessions(df, gapSeconds = 1800L)
      .select("event_id", "session_idx").collect()
      .map(r => r.getLong(0) -> r.getInt(1)).toMap
    assert(got == Map(0L -> 0, 1L -> 0, 2L -> 1, 3L -> 1, 4L -> 0))
  }

  test("ties on ts break by tie column; singleton stats are zero-duration") {
    val df = events(
      (1L, 2L, "2024-01-01 00:00:00"),
      (1L, 1L, "2024-01-01 00:00:00"), // same ts: event 1 sorts first
      (1L, 3L, "2024-01-02 00:00:00"))
    val sess = Sessionize.assignSessions(df, gapSeconds = 60L)
    val stats = Sessionize.sessionStats(sess).collect()
      .map(r => (r.getInt(1), r.getLong(2), r.getLong(5))).sortBy(_._1)
    // session 0 = the two tied events (duration 0us), session 1 = singleton
    assert(stats.toSeq == Seq((0, 2L, 0L), (1, 1L, 0L)))
  }

  test("stats duration is exact integer microseconds") {
    val df = events(
      (7L, 0L, "2024-01-01 00:00:00"),
      (7L, 1L, "2024-01-01 00:10:30"))
    val r = Sessionize.sessionStats(
      Sessionize.assignSessions(df, gapSeconds = 3600L)).collect()(0)
    assert(r.getLong(2) == 2L && r.getLong(5) == 630L * 1000000L)
  }

  test("incremental fold equals full recompute, tolerates replay, skips untouched keys") {
    val ev = spark.read.parquet(s"$sf0001/events.parquet")
      .select("user_id", "event_id", "ts")
    val isOld = col("event_id") % 2 === 0
    val prior = Sessionize.assignSessions(ev.filter(isOld), gapSeconds = 43200L)
    val increment = ev.filter(!isOld)
      .unionAll(ev.filter(isOld && col("event_id") % 10 === 0)) // replayed slice
    val got = Sessionize.assignSessionsIncremental(prior, increment,
      gapSeconds = 43200L).select("event_id", "session_idx")
      .collect().map(r => r.getLong(0) -> r.getInt(1)).toMap
    val want = Sessionize.assignSessions(ev, gapSeconds = 43200L)
      .select("event_id", "session_idx")
      .collect().map(r => r.getLong(0) -> r.getInt(1)).toMap
    assert(got == want)
    // untouched keys pass through the prior assignment verbatim: an
    // increment touching ONE key changes nothing anywhere else
    val oneKey = ev.filter(!isOld).limit(1)
    val k = oneKey.collect()(0).getLong(0)
    val folded = Sessionize.assignSessionsIncremental(prior, oneKey,
      gapSeconds = 43200L)
    val othersBefore = prior.filter(col("user_id") =!= k)
      .collect().map(_.toString).toSet
    val othersAfter = folded.filter(col("user_id") =!= k)
      .collect().map(_.toString).toSet
    assert(othersBefore == othersAfter)
  }

  test("partitioning-independent on the events fixture, and it really splits") {
    val ev = spark.read.parquet(s"$sf0001/events.parquet")
    val a = Sessionize.assignSessions(ev, gapSeconds = 43200L)
      .select("event_id", "session_idx").collect()
      .map(r => r.getLong(0) -> r.getInt(1)).toMap
    val b = Sessionize.assignSessions(ev.repartition(17), gapSeconds = 43200L)
      .select("event_id", "session_idx").collect()
      .map(r => r.getLong(0) -> r.getInt(1)).toMap
    assert(a == b)
    assert(a.values.exists(_ > 0), "12h gap should split at least one user")
    // session count per user = max idx + 1; every user has session 0
    val perUser = Sessionize.assignSessions(ev, gapSeconds = 43200L)
      .groupBy("user_id").agg(min(col("session_idx")).as("mn"))
      .collect().map(_.getInt(1))
    assert(perUser.forall(_ == 0))
  }
}
