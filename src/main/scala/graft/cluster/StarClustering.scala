package graft.cluster

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Single-pass hub-assignment clustering of the match graph — the
  * bounded-diameter alternative to transitive closure
  * ([[ConnectedComponents]]). Relational adaptation of star/center
  * clustering from the duplicate-detection clustering literature
  * (Aslam et al., "The Star Clustering Algorithm", JGAA 2004;
  * Hassanzadeh & Miller's clustering-for-dedup evaluation, VLDB J.
  * 2009): each record attaches to the strongest hub in its one-hop
  * neighborhood — the neighbor (or itself) with the highest degree,
  * ties broken by smallest id — and the hub's id is the cluster label.
  *
  * Why a second clusterer exists at all: transitive closure merges
  * through every accepted edge, so one borderline false match chains
  * two real entities into one cluster ("chaining"). Star assignment
  * never follows paths — a record lands at most one hop from its hub —
  * so a single bad edge costs one misassigned record, not a merged
  * cluster. The price is the mirror error: a true component whose
  * records disagree on the locally-strongest hub splits. Use CC when
  * edges are high-precision, star when recall-heavy matchers make
  * chaining the dominant risk; [[ClusterMetrics]] quantifies the trade
  * on labeled data.
  *
  * Determinism: degree and the (degree DESC, id ASC) argmax are
  * order-independent, so the output is identical under any
  * partitioning — DuckDB-oracle-hashable (window-function mirror, no
  * recursion). Unlike the greedy sequential star algorithm, hub choice
  * is purely local, so labels need not be self-consistent (a hub's own
  * hub may differ); consumers wanting fixed-point semantics should run
  * [[ConnectedComponents]].
  *
  * Scale shape (the point at 10^12 edges): NO iteration — one
  * distinct, one degree aggregation, one key join, one window, all
  * hash-partitioned on vertex id. Compared to CC's O(log n) rounds of
  * two shuffles each, star is a constant three-shuffle pipeline and is
  * embarrassingly AQE-friendly; there is no convergence state to
  * checkpoint.
  */
object StarClustering {

  /** Assign every vertex of the (undirected) match graph to a cluster.
    *
    * @param matches pair DataFrame; only (`leftCol`, `rightCol`) are
    *                read, duplicates and orientation are normalized away
    * @return (id, cluster) — one row per distinct vertex
    */
  def assign(matches: DataFrame, leftCol: String = "left_id",
      rightCol: String = "right_id"): DataFrame = {
    val e = matches.select(col(leftCol).as("u"), col(rightCol).as("v"))
    // Symmetrize + dedup once so degree is a plain count afterwards.
    val edges = e.union(e.select(col("v"), col("u"))).distinct()
    val deg = edges.groupBy(col("u").as("id")).agg(count(lit(1)).as("deg"))
    // Candidate hubs = neighbors plus the vertex itself (isolated-free
    // by construction: every vertex here has >= 1 edge).
    val nbr = edges.select(col("u").as("id"), col("v").as("nb"))
      .union(deg.select(col("id"), col("id").as("nb")))
    val cand = nbr.join(deg.select(col("id").as("nb"), col("deg")), "nb")
    val best = Window.partitionBy("id").orderBy(col("deg").desc, col("nb").asc)
    cand.withColumn("rn", row_number().over(best))
      .filter(col("rn") === 1)
      .select(col("id"), col("nb").as("cluster"))
  }
}
