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
}
