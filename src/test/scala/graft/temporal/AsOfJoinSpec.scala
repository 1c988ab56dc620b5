package graft.temporal

import graft.SparkSpec
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** As-of join (T2): semantics on hand-built interleavings, equality
  * with a brute-force range-join formulation, single-exchange plan
  * shape, partitioning invariance. */
class AsOfJoinSpec extends SparkSpec {

  private def ts(s: String) = java.sql.Timestamp.valueOf(s)

  private def lhs(rows: (Long, Long, String)*): DataFrame = {
    import spark.implicits._
    rows.map { case (u, e, t) => (u, e, ts(t)) }.toDF("user_id", "event_id", "ts")
  }
  private def rhs(rows: (Long, Long, String)*): DataFrame = {
    import spark.implicits._
    rows.map { case (u, e, t) => (u, ts(t), e) }
      .toDF("user_id", "err_ts", "err_event_id")
  }

  /** Brute force: range join + greatest-(ts, tie) pick per left row. */
  private def brute(l: DataFrame, r: DataFrame): DataFrame = {
    val j = l.join(r, Seq("user_id"), "left")
      .withColumn("__ok", col("err_ts") <= col("ts"))
      .withColumn("__rank", row_number().over(
        Window.partitionBy("user_id", "event_id")
          .orderBy(col("__ok").desc, col("err_ts").desc, col("err_event_id").desc)))
      .filter(col("__rank") === 1)
    j.select(col("user_id"), col("event_id"), col("ts"),
      when(col("__ok"), col("err_ts")).as("err_ts"),
      when(col("__ok"), col("err_event_id")).as("err_event_id"))
  }

  private def run(l: DataFrame, r: DataFrame): Set[String] =
    AsOfJoin.nearestPrior(l, r, "user_id", "ts", "err_ts", "err_event_id")
      .collect().map(_.toString).toSet

  test("prior pick, inclusive equality, tie to greatest, left-only keys null") {
    val l = lhs(
      (1L, 10L, "2024-01-01 12:00:00"), // between r1 and r2 -> r1
      (1L, 11L, "2024-01-02 00:00:00"), // equal to r2 -> inclusive
      (1L, 12L, "2023-12-31 00:00:00"), // before all -> null
      (2L, 20L, "2024-06-01 00:00:00"), // ties at same ts -> greatest id
      (3L, 30L, "2024-01-01 00:00:00")) // key with no right rows -> null
    val r = rhs(
      (1L, 100L, "2024-01-01 00:00:00"),
      (1L, 101L, "2024-01-02 00:00:00"),
      (2L, 200L, "2024-05-01 00:00:00"),
      (2L, 201L, "2024-05-01 00:00:00"))
    val got = AsOfJoin.nearestPrior(l, r, "user_id", "ts", "err_ts", "err_event_id")
      .collect().map(x => x.getLong(1) -> (if (x.isNullAt(4)) -1L else x.getLong(4))).toMap
    assert(got == Map(10L -> 100L, 11L -> 101L, 12L -> -1L, 20L -> 201L, 30L -> -1L))
  }

  test("equals brute force on the events fixture") {
    val ev = spark.read.parquet(s"$sf0001/events.parquet")
    val l = ev.select("user_id", "event_id", "ts")
    val r = ev.filter(col("event_type") === "error")
      .select(col("user_id"), col("ts").as("err_ts"), col("event_id").as("err_event_id"))
    val got = run(l, r)
    val want = brute(l, r).collect().map(_.toString).toSet
    assert(got == want)
    assert(got.nonEmpty)
  }

  test("plan: one exchange, no join operator") {
    val ev = spark.read.parquet(s"$sf0001/events.parquet")
    val out = AsOfJoin.nearestPrior(
      ev.select("user_id", "event_id", "ts"),
      ev.filter(col("event_type") === "error")
        .select(col("user_id"), col("ts").as("err_ts"), col("event_id").as("err_event_id")),
      "user_id", "ts", "err_ts", "err_event_id")
    val plan = out.queryExecution.executedPlan.toString
    val exchanges = "Exchange hashpartitioning".r.findAllIn(plan).size
    assert(exchanges == 1, s"expected exactly one exchange:\n$plan")
    assert(!plan.contains("SortMergeJoin") && !plan.contains("BroadcastHashJoin")
      && !plan.contains("CartesianProduct"), "as-of must not plan a join")
  }

  test("partitioning-independent") {
    val l = lhs((1 to 50).map(i =>
      ((i % 5).toLong, i.toLong, f"2024-01-${i % 28 + 1}%02d 0${i % 9}:00:00")): _*)
    val r = rhs((1 to 30).map(i =>
      ((i % 5).toLong, (1000 + i).toLong, f"2024-01-${(i * 3) % 28 + 1}%02d 0${i % 9}:30:00")): _*)
    assert(run(l.repartition(7), r.repartition(3)) == run(l, r))
    // and equals brute force on this interleaving too
    assert(run(l, r) == brute(l, r).collect().map(_.toString).toSet)
  }
}
