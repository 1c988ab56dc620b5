package graft.temporal

import graft.SparkSpec
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Binned range join (T3): boundary inclusivity, bin-crossing
  * intervals, no-dedup-needed exactness vs brute force, plan shape,
  * bin-width and partitioning invariance. */
class RangeJoinSpec extends SparkSpec {

  private def ts(s: String) = java.sql.Timestamp.valueOf(s)

  private def pts(rows: (Long, Long, String)*): DataFrame = {
    import spark.implicits._
    rows.map { case (u, e, t) => (u, e, ts(t)) }.toDF("user_id", "event_id", "ts")
  }
  private def ivs(rows: (Long, Long, String, String)*): DataFrame = {
    import spark.implicits._
    rows.map { case (u, w, lo, hi) => (u, w, ts(lo), ts(hi)) }
      .toDF("user_id", "win_id", "win_lo", "win_hi")
  }

  private def run(p: DataFrame, i: DataFrame, binSeconds: Long = 3600L): Set[(Long, Long)] =
    RangeJoin.pointInInterval(p, i, "user_id", "ts", "win_lo", "win_hi", binSeconds)
      .select("event_id", "win_id").collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet

  private def brute(p: DataFrame, i: DataFrame): Set[(Long, Long)] =
    p.join(i, Seq("user_id"))
      .filter(col("ts") >= col("win_lo") && col("ts") <= col("win_hi"))
      .select("event_id", "win_id").collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet

  test("inclusive endpoints, bin-crossing interval, key isolation, one row per pair") {
    val p = pts(
      (1L, 1L, "2024-01-01 10:00:00"), // == lo -> in
      (1L, 2L, "2024-01-01 12:00:00"), // == hi -> in
      (1L, 3L, "2024-01-01 12:00:01"), // just past hi -> out
      (1L, 4L, "2024-01-01 09:59:59"), // just before lo -> out
      (2L, 5L, "2024-01-01 11:00:00")) // other key -> out
    val i = ivs((1L, 100L, "2024-01-01 10:00:00", "2024-01-01 12:00:00"))
    // interval spans 3 hourly bins; matched pairs must appear EXACTLY once
    val out = RangeJoin.pointInInterval(p, i, "user_id", "ts", "win_lo", "win_hi", 3600L)
      .select("event_id", "win_id").collect().map(r => (r.getLong(0), r.getLong(1)))
    assert(out.length == out.distinct.length, "pair emitted more than once")
    assert(out.toSet == Set(1L -> 100L, 2L -> 100L))
  }

  test("equals brute force on the events fixture; overlapping windows fan out") {
    val ev = spark.read.parquet(s"$sf0001/events.parquet")
    val p = ev.select("user_id", "event_id", "ts")
    val i = ev.filter(col("event_type") === "error")
      .select(col("user_id"), col("event_id").as("win_id"),
        col("ts").as("win_lo"), (col("ts") + expr("INTERVAL 1 HOUR")).as("win_hi"))
    val got = run(p, i)
    assert(got == brute(p, i))
    assert(got.nonEmpty)
    // an error event always falls inside its own window
    val selfPairs = i.select(col("win_id")).collect().map(_.getLong(0)).toSet
    assert(selfPairs.subsetOf(got.map(_._2)))
  }

  test("bin width does not change the result") {
    val ev = spark.read.parquet(s"$sf0001/events.parquet")
    val p = ev.select("user_id", "event_id", "ts")
    val i = ev.filter(col("event_type") === "error")
      .select(col("user_id"), col("event_id").as("win_id"),
        col("ts").as("win_lo"), (col("ts") + expr("INTERVAL 1 HOUR")).as("win_hi"))
    assert(run(p, i, 600L) == run(p, i, 7200L))
  }

  test("plan has no cartesian and joins on the bin key; partitioning-independent") {
    val p = pts((1 to 40).map(i =>
      ((i % 4).toLong, i.toLong, f"2024-01-01 ${i % 24}%02d:${i % 60}%02d:00")): _*)
    val i = ivs((1 to 10).map(k =>
      ((k % 4).toLong, (100 + k).toLong,
        f"2024-01-01 ${k * 2 % 24}%02d:00:00", f"2024-01-01 ${(k * 2 + 3) % 24}%02d:00:00")): _*)
      .filter(col("win_lo") <= col("win_hi"))
    val out = RangeJoin.pointInInterval(p, i, "user_id", "ts", "win_lo", "win_hi", 1800L)
    val plan = out.queryExecution.executedPlan.toString
    assert(!plan.contains("CartesianProduct") && !plan.contains("BroadcastNestedLoopJoin"),
      s"range join must stay an equi-join:\n$plan")
    assert(plan.contains("__bin"), "join key must include the bin")
    assert(run(p, i, 1800L) == brute(p, i))
    assert(run(p.repartition(9), i.repartition(2), 1800L) == run(p, i, 1800L))
  }

  // ---------------------------------------------------------------
  // T5 intervalOverlap
  // ---------------------------------------------------------------

  private def ivl(rows: (Long, Long, String, String)*): DataFrame = {
    import spark.implicits._
    rows.map { case (u, w, lo, hi) => (u, w, ts(lo), ts(hi)) }
      .toDF("user_id", "a_id", "a_lo", "a_hi")
  }
  private def ivr(rows: (Long, Long, String, String)*): DataFrame = {
    import spark.implicits._
    rows.map { case (u, w, lo, hi) => (u, w, ts(lo), ts(hi)) }
      .toDF("user_id", "b_id", "b_lo", "b_hi")
  }
  private def runOv(l: DataFrame, r: DataFrame, binSeconds: Long = 3600L): Seq[(Long, Long)] =
    RangeJoin.intervalOverlap(l, r, "user_id", "a_lo", "a_hi", "b_lo", "b_hi", binSeconds)
      .select("a_id", "b_id").collect().toSeq
      .map(x => (x.getLong(0), x.getLong(1)))
  private def bruteOv(l: DataFrame, r: DataFrame): Set[(Long, Long)] =
    l.join(r, Seq("user_id"))
      .filter(col("a_lo") <= col("b_hi") && col("b_lo") <= col("a_hi"))
      .select("a_id", "b_id").collect()
      .map(x => (x.getLong(0), x.getLong(1))).toSet

  test("interval overlap: inclusive touch, containment, exactly-once across bins") {
    val a = ivl(
      (1L, 1L, "2024-01-01 10:00:00", "2024-01-01 12:00:00"),
      (1L, 2L, "2024-01-01 00:00:00", "2024-01-02 00:00:00"), // long: 25 bins
      (2L, 3L, "2024-01-01 10:00:00", "2024-01-01 12:00:00"))
    val b = ivr(
      (1L, 10L, "2024-01-01 12:00:00", "2024-01-01 13:00:00"), // touches a1's hi -> in
      (1L, 11L, "2024-01-01 12:00:01", "2024-01-01 13:00:00"), // just past -> out vs a1
      (1L, 12L, "2024-01-01 10:30:00", "2024-01-01 10:40:00"), // inside a1
      (3L, 13L, "2024-01-01 10:00:00", "2024-01-01 12:00:00")) // other key
    val got = runOv(a, b)
    assert(got.length == got.distinct.length, "pair emitted more than once")
    assert(got.toSet == bruteOv(a, b))
    assert(got.toSet == Set(1L -> 10L, 1L -> 12L, 2L -> 10L, 2L -> 11L, 2L -> 12L))
  }

  test("interval overlap equals brute force on the events fixture; invariances hold") {
    val ev = spark.read.parquet(s"$sf0001/events.parquet")
    val a = ev.filter(col("event_type") === "error")
      .select(col("user_id"), col("event_id").as("a_id"),
        col("ts").as("a_lo"), (col("ts") + expr("INTERVAL 1 HOUR")).as("a_hi"))
    val b = ev.filter(col("event_type") === "signup")
      .select(col("user_id"), col("event_id").as("b_id"),
        col("ts").as("b_lo"), (col("ts") + expr("INTERVAL 2 HOUR")).as("b_hi"))
    val got = runOv(a, b)
    assert(got.length == got.distinct.length, "dup pair on fixture")
    assert(got.toSet == bruteOv(a, b))
    // bin-width and partitioning invariance
    assert(runOv(a, b, 600L).toSet == got.toSet)
    assert(runOv(a, b, 86400L).toSet == got.toSet)
    assert(runOv(a.repartition(9), b.repartition(2)).toSet == got.toSet)
    // plan stays an equi-join on the bin
    val plan = RangeJoin.intervalOverlap(a, b, "user_id", "a_lo", "a_hi", "b_lo", "b_hi")
      .queryExecution.executedPlan.toString
    assert(!plan.contains("CartesianProduct") && !plan.contains("BroadcastNestedLoopJoin"))
  }
}
