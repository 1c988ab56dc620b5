package graft.cluster

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** Assignment drift metrics (A20): hand topology with known counts,
  * identity and incremental-fold invariants, partitioning
  * invariance. */
class AssignmentDriftSpec extends SparkSpec {

  private def asg(rows: (String, String)*) = {
    import spark.implicits._
    rows.toDF("id", "component")
  }

  private def row(df: org.apache.spark.sql.DataFrame) = {
    val r = df.collect()(0)
    df.columns.zipWithIndex.map { case (c, i) => c -> r.get(i) }.toMap
  }

  test("hand topology: split, merge, add, remove, move — exact counts") {
    // prior: A={a1,a2,a3}, B={b1,b2}, D={d1} (d1 then removed)
    // current: A splits into {a1,a2} and {a3}; B merges with new ids
    // {n1,n2} into one cluster; d1 gone
    val prior = asg(
      "a1" -> "a1", "a2" -> "a1", "a3" -> "a1",
      "b1" -> "b1", "b2" -> "b1", "d1" -> "d1")
    val cur = asg(
      "a1" -> "a1", "a2" -> "a1", "a3" -> "a3",
      "b1" -> "b1", "b2" -> "b1", "n1" -> "b1", "n2" -> "b1")
    val m = row(AssignmentDrift.drift(prior, cur))
    assert(m("n_prior_ids") == 6L && m("n_current_ids") == 7L)
    assert(m("n_common") == 5L && m("n_added") == 2L && m("n_removed") == 1L)
    assert(m("n_moved") == 1L) // a3
    assert(m("n_prior_components") == 3L && m("n_current_components") == 3L)
    assert(m("n_split_components") == 1L)  // prior A spans a1+a3
    assert(m("n_merged_components") == 0L) // no current cluster draws 2 prior ones
    // pairs over common ids: prior A C(3,2)=3 + B C(2,2)=1 = 4;
    // current (common only): {a1,a2}=1, {a3}=0, {b1,b2}=1 -> 2; kept = 2
    assert(m("pairs_prior") == 4L && m("pairs_current") == 2L && m("pairs_kept") == 2L)
    assert(m("pair_recall") == 0.5 && m("pair_precision") == 1.0)
  }

  test("identity: zero churn, both ratios 1.0") {
    val a = asg((1 to 20).map(i => (s"id$i", s"c${i % 4}")): _*)
    val m = row(AssignmentDrift.drift(a, a))
    assert(m("n_added") == 0L && m("n_removed") == 0L && m("n_moved") == 0L)
    assert(m("n_split_components") == 0L && m("n_merged_components") == 0L)
    assert(m("pair_recall") == 1.0 && m("pair_precision") == 1.0)
  }

  test("empty-overlap ratios are NULL, not a divide-by-zero") {
    // all-singleton snapshots: zero co-clustered pairs on both sides
    val p = asg("x1" -> "x1", "x2" -> "x2")
    val c = asg("x1" -> "x1", "x2" -> "x2")
    val m = row(AssignmentDrift.drift(p, c))
    assert(m("pairs_prior") == 0L && m("pair_recall") == null &&
      m("pair_precision") == null)
  }

  test("incremental fold invariant on the fixture: no splits, pair recall 1.0") {
    val edges = graft.SparkEntry.addrMatchLev(spark, sf0001).localCheckpoint(true)
    val inPrior =
      substring(md5(concat_ws("|", col("left_id"), col("right_id"))), 1, 1) <= "7"
    val prior = ConnectedComponents.run(
      edges.filter(inPrior), "left_id", "right_id")
    val full = ConnectedComponents.runIncremental(
      prior, edges.filter(not(inPrior)), "left_id", "right_id")
    val m = row(AssignmentDrift.drift(prior, full))
    // adding edges can only merge or grow clusters, never split them,
    // and co-clustered pairs stay co-clustered
    assert(m("n_removed") == 0L && m("n_split_components") == 0L)
    assert(m("pair_recall") == 1.0)
    assert(m("n_common") == prior.count())
    graft.util.CheckpointHygiene.free(prior)
    graft.util.CheckpointHygiene.free(full)
    graft.util.CheckpointHygiene.free(edges)
  }

  test("partitioning-independent") {
    val rows = (1 to 50).map(i => (s"id$i", s"c${i % 7}"))
    val rows2 = (1 to 55).map(i => (s"id$i", s"c${i % 5}"))
    import spark.implicits._
    val a = row(AssignmentDrift.drift(
      rows.toDF("id", "component").repartition(1),
      rows2.toDF("id", "component").repartition(1)))
    val b = row(AssignmentDrift.drift(
      rows.toDF("id", "component").repartition(9),
      rows2.toDF("id", "component").repartition(3)))
    assert(a == b)
  }
}
