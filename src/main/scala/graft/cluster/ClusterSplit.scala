package graft.cluster

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Oversized-cluster repair by score-threshold escalation — the
  * standard production fix for transitive-closure over-merging at web
  * scale. Connected components accept EVERY edge above the match
  * threshold, so one borderline false match chains two real entities,
  * and on boilerplate-heavy corpora the chaining compounds into a
  * "black-hole" component that swallows thousands of entities (the
  * big-component pathology described in the ER clustering literature,
  * e.g. Hassanzadeh & Miller, VLDB J. 2009, and the reason
  * [[GoldenRecord.medoid]] carries a member cap). Splitting re-examines
  * ONLY the clusters that exceed a size bound: their internal edges are
  * re-filtered at an escalated score threshold and the subgraph is
  * re-clustered, so weak bridge edges — the chaining culprits, by
  * construction the lowest-scoring links — break, while confident
  * sub-entities stay together. Clusters within the bound pass through
  * untouched.
  *
  * Determinism and labels: sub-component labels are the min member id
  * (the [[ConnectedComponents]] convention), and components partition
  * the vertex set, so pass-through and re-clustered labels can never
  * collide; members that lose every internal edge at the escalated
  * threshold become singletons labeled by their own id. Output is a
  * pure function of (edges, assignments, bounds) — partitioning
  * independent, DuckDB-oracle-hashable.
  *
  * Precondition: `assignments` is edge-closed over `edges` (each
  * edge's endpoints share a component — true of any
  * [[ConnectedComponents]] output over the same edge set). The
  * re-clustering then never merges two prior components.
  *
  * Scale shape (the point at 10^12 edges): cost ∝ the flagged
  * clusters' subgraphs only. The size aggregation and the two
  * semi-joins are linear id/component-keyed shuffles; the CC re-run
  * sees just the strong edges of oversized clusters — on a healthy
  * clustering that is a vanishing fraction of the graph, and on a
  * pathological one it is exactly the part that must be re-done. The
  * pass-through side never reads cluster content at all. */
object ClusterSplit {

  /** Split every cluster larger than `maxMembers` by re-clustering its
    * internal edges at `minScore`.
    *
    * @param edges       scored match edges (leftCol, rightCol, scoreCol)
    * @param assignments (idCol, componentCol) — the transitive closure
    *                    of `edges` (see precondition above)
    * @return (id, component, split) — `split = true` marks rows whose
    *         source cluster was oversized (their `component` is the
    *         escalated-threshold sub-component label) */
  def splitOversized(
      edges: DataFrame,
      assignments: DataFrame,
      maxMembers: Int,
      minScore: Double,
      idCol: String = "id",
      componentCol: String = "component",
      leftCol: String = "left_id",
      rightCol: String = "right_id",
      scoreCol: String = "score"): DataFrame = {
    val asg = assignments.select(col(idCol).as("id"), col(componentCol).as("component"))
    val sized = asg.join(
      asg.groupBy("component").agg(count(lit(1)).as("cnt")), Seq("component"))
    val small = sized.filter(col("cnt") <= maxMembers)
      .select(col("id"), col("component"), lit(false).as("split"))
    val bigIds = sized.filter(col("cnt") > maxMembers).select("id")
    // strong internal edges of oversized clusters: both endpoints big
    // (edge-closure makes "both big" ⇒ "same oversized cluster")
    val strong = edges.filter(col(scoreCol) >= minScore)
      .join(bigIds.withColumnRenamed("id", leftCol), Seq(leftCol), "left_semi")
      .join(bigIds.withColumnRenamed("id", rightCol), Seq(rightCol), "left_semi")
      .select(col(leftCol), col(rightCol))
    val cc2 = ConnectedComponents.run(strong, leftCol, rightCol)
    val isolated = bigIds.join(cc2.select("id"), Seq("id"), "left_anti")
      .select(col("id"), col("id").as("component"))
    small.unionByName(
      cc2.unionByName(isolated).withColumn("split", lit(true)))
  }

  /** DuckDB mirror as CTEs + final SELECT, continuing a chain that
    * already defines `m(left_id, right_id, score)` (the scored match
    * edges) and `cc(id, component)` (their transitive closure). Same
    * shortest-roundtrip recursive-CTE closure as the a_clusters
    * oracle, applied to the escalated-threshold subgraph. */
  def splitOversizedSqlDuck(maxMembers: Int, minScore: Double): String =
    s"""siz AS (SELECT component, count(*) AS cnt FROM cc GROUP BY component),
       |smallc AS (
       |  SELECT c.id, c.component FROM cc c
       |  JOIN siz s ON c.component = s.component WHERE s.cnt <= $maxMembers),
       |bigv AS (
       |  SELECT c.id FROM cc c
       |  JOIN siz s ON c.component = s.component WHERE s.cnt > $maxMembers),
       |strongm AS (
       |  SELECT m.left_id, m.right_id FROM m
       |  JOIN bigv bl ON m.left_id = bl.id
       |  JOIN bigv br ON m.right_id = br.id
       |  WHERE m.score >= CAST($minScore AS DOUBLE)),
       |strong AS (SELECT left_id AS u, right_id AS v FROM strongm
       |           UNION SELECT right_id, left_id FROM strongm),
       |sverts AS (SELECT DISTINCT u AS id FROM strong),
       |cc2 AS (SELECT id, component FROM (
       |  WITH RECURSIVE reach2(id, r) AS (
       |    SELECT id, id FROM sverts
       |    UNION
       |    SELECT reach2.id, e.v FROM reach2 JOIN strong e ON reach2.r = e.u
       |  )
       |  SELECT id, min(r) AS component FROM reach2 GROUP BY id
       |)),
       |iso AS (
       |  SELECT b.id, b.id AS component FROM bigv b
       |  LEFT JOIN sverts s ON b.id = s.id WHERE s.id IS NULL)
       |SELECT id, component, false AS split FROM smallc
       |UNION ALL SELECT id, component, true AS split FROM cc2
       |UNION ALL SELECT id, component, true AS split FROM iso
       |""".stripMargin
}
