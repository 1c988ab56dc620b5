package graft.cluster

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** Oversized-cluster split by threshold escalation (A19): hand
  * topologies (bridge break, isolation, pass-through, label
  * uniqueness), independent union-find check, partitioning
  * invariance. */
class ClusterSplitSpec extends SparkSpec {

  private def edges(rows: (String, String, Double)*) = {
    import spark.implicits._
    rows.toDF("left_id", "right_id", "score")
  }

  private def split(e: org.apache.spark.sql.DataFrame, maxMembers: Int, minScore: Double) = {
    val asg = ConnectedComponents.run(e, "left_id", "right_id")
    val out = ClusterSplit.splitOversized(e, asg, maxMembers, minScore)
      .collect().map(r => (r.getString(0), r.getString(1), r.getBoolean(2)))
      .sortBy(_._1)
    graft.util.CheckpointHygiene.free(asg)
    out
  }

  test("weak bridge breaks, confident sub-entities survive, small clusters pass through") {
    // a1-a2-a3 strong, bridged to b1-b2 by one weak edge (the chaining
    // shape); c1-c2 is small and passes through even though its edge
    // is weak
    val e = edges(
      ("a1", "a2", 99.0), ("a2", "a3", 98.0),
      ("a3", "b1", 76.0), // the bridge
      ("b1", "b2", 97.0),
      ("c1", "c2", 80.0))
    val got = split(e, maxMembers = 3, minScore = 90.0)
    assert(got.toSeq == Seq(
      ("a1", "a1", true), ("a2", "a1", true), ("a3", "a1", true),
      ("b1", "b1", true), ("b2", "b1", true),
      ("c1", "c1", false), ("c2", "c1", false)))
  }

  test("members losing every strong edge become singletons; labels never collide") {
    // one oversized star whose every edge is weak: all members isolate
    val e = edges(
      ("z1", "z2", 80.0), ("z1", "z3", 80.0), ("z1", "z4", 80.0))
    val got = split(e, maxMembers = 2, minScore = 90.0)
    assert(got.toSeq == Seq(
      ("z1", "z1", true), ("z2", "z2", true),
      ("z3", "z3", true), ("z4", "z4", true)))
    // labels are min member ids of disjoint sets -> globally unique
    val labels = got.map(_._2)
    assert(labels.toSet.size == got.map(x => (x._2, x._3)).distinct.map(_._1).toSet.size)
  }

  test("split == independent union-find on the strong subgraph of oversized clusters") {
    // random-ish deterministic graph: 40 vertices, chain + extra edges,
    // scores alternating strong/weak
    val rows = (1 to 39).map { i =>
      (f"v$i%02d", f"v${i + 1}%02d", if (i % 3 == 0) 70.0 + i % 10 else 95.0 + i % 5)
    } ++ Seq(("v05", "v11", 92.0), ("v20", "v30", 96.5))
    val e = {
      import spark.implicits._
      rows.toDF("left_id", "right_id", "score")
    }
    val maxM = 4
    val minS = 90.0
    val asg = ConnectedComponents.run(e, "left_id", "right_id")
    val got = ClusterSplit.splitOversized(e, asg, maxM, minS)
      .collect().map(r => (r.getString(0), r.getString(1))).toMap

    // driver-side union-find replica
    val asgM = asg.collect().map(r => (r.getString(0), r.getString(1))).toMap
    graft.util.CheckpointHygiene.free(asg)
    val sizes = asgM.values.groupBy(identity).map { case (k, v) => (k, v.size) }
    val parent = scala.collection.mutable.Map[String, String]()
    def find(x: String): String = {
      val p = parent.getOrElse(x, x)
      if (p == x) x else { val r = find(p); parent(x) = r; r }
    }
    def union(a: String, b: String): Unit = {
      val (ra, rb) = (find(a), find(b))
      if (ra != rb) parent(if (ra < rb) rb else ra) = if (ra < rb) ra else rb
    }
    val bigIds = asgM.filter { case (_, c) => sizes(c) > maxM }.keySet
    rows.foreach { case (l, r, s) =>
      if (s >= minS && bigIds(l) && bigIds(r)) union(l, r)
    }
    val want = asgM.map { case (id, c) =>
      if (sizes(c) <= maxM) (id, c)
      else {
        // min member id of the union-find class
        val root = find(id)
        val members = bigIds.filter(find(_) == root)
        (id, members.min)
      }
    }
    assert(got == want)
  }

  test("partitioning-independent") {
    import spark.implicits._
    val rows = (1 to 30).map(i =>
      (s"p${i % 10}", s"p${(i % 10) + 1}", if (i % 2 == 0) 97.0 else 82.0))
    val e1 = rows.toDF("left_id", "right_id", "score").repartition(1)
    val e7 = rows.toDF("left_id", "right_id", "score").repartition(7)
    val a1 = ConnectedComponents.run(e1, "left_id", "right_id")
    val a7 = ConnectedComponents.run(e7, "left_id", "right_id")
    val g1 = ClusterSplit.splitOversized(e1, a1, 3, 90.0).collect().map(_.toString).sorted
    val g7 = ClusterSplit.splitOversized(e7, a7, 3, 90.0).collect().map(_.toString).sorted
    graft.util.CheckpointHygiene.free(a1)
    graft.util.CheckpointHygiene.free(a7)
    assert(g1.toSeq == g7.toSeq)
  }
}
