package graft.cluster

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Drift metrics between two cluster-assignment snapshots — the
  * monitoring companion to the incremental path
  * ([[ConnectedComponents.runIncremental]],
  * [[GoldenRecord.mergeIncremental]]). A production linkage pipeline
  * folding ingest batches needs to answer, per fold: how many records
  * moved label, how many clusters split or merged, and how much of the
  * co-cluster structure survived — a sudden drop in pair stability is
  * the canonical symptom of a corrupt batch or a chaining melt, caught
  * here before it reaches golden records. Counts follow the
  * split/merge bookkeeping of clustering-comparison practice (the same
  * contingency table that drives Rand-style indices, cf.
  * [[ClusterMetrics]] — which compares a clustering against GOLD
  * labels, where this compares two SNAPSHOTS of the same pipeline).
  *
  * Exactness and determinism: every count is an exact integer from one
  * full-outer id join and its (prior component × new component)
  * contingency cells; the pair ratios divide exact BIGINT pair counts.
  * No sampling, no floating accumulation — partitioning independent
  * and DuckDB-oracle-hashable.
  *
  * Scale shape (the point at 10^12 rows): one id-keyed full-outer join
  * of two vertex-sized tables, then component-keyed aggregations of
  * the (usually far smaller) cell table — all linear, no iteration, no
  * driver-side state. Pair counts come from the cell/margin totals
  * (`s*(s-1)/2`), never from materializing pairs. */
object AssignmentDrift {

  /** One metrics row comparing `prior` to `current` (both
    * (idCol, componentCol)):
    *
    *   - `n_prior_ids` / `n_current_ids` / `n_common` / `n_added` /
    *     `n_removed`: membership churn
    *   - `n_moved`: common ids whose label changed (labels are
    *     comparable across snapshots under the min-member-id
    *     convention both CC paths share)
    *   - `n_prior_components` / `n_current_components`
    *   - `n_split_components`: prior components whose common members
    *     land in ≥ 2 current components
    *   - `n_merged_components`: current components drawing common
    *     members from ≥ 2 prior components
    *   - `pairs_prior` / `pairs_current` / `pairs_kept`: co-clustered
    *     pair totals over common ids, and `pair_recall` =
    *     kept/prior, `pair_precision` = kept/current (NULL when the
    *     denominator is 0) */
  def drift(
      prior: DataFrame,
      current: DataFrame,
      idCol: String = "id",
      componentCol: String = "component"): DataFrame = {
    val p = prior.select(col(idCol).as("id"), col(componentCol).as("pc"))
    val c = current.select(col(idCol).as("id"), col(componentCol).as("nc"))
    val j = p.join(c, Seq("id"), "full_outer")

    val membership = j.agg(
      count(when(col("pc").isNotNull && col("nc").isNotNull, 1)).as("n_common"),
      count(when(col("pc").isNull, 1)).as("n_added"),
      count(when(col("nc").isNull, 1)).as("n_removed"),
      count(when(col("pc").isNotNull && col("nc").isNotNull &&
        col("pc") =!= col("nc"), 1)).as("n_moved"))

    val cells = j.filter(col("pc").isNotNull && col("nc").isNotNull)
      .groupBy("pc", "nc").agg(count(lit(1)).as("m"))
    val byPc = cells.groupBy("pc")
      .agg(sum("m").as("s"), count(lit(1)).as("d"))
      .agg(
        count(when(col("d") > 1, 1)).as("n_split_components"),
        coalesce(sum(expr("s * (s - 1) div 2")), lit(0L)).as("pairs_prior"))
    val byNc = cells.groupBy("nc")
      .agg(sum("m").as("s"), count(lit(1)).as("d"))
      .agg(
        count(when(col("d") > 1, 1)).as("n_merged_components"),
        coalesce(sum(expr("s * (s - 1) div 2")), lit(0L)).as("pairs_current"))
    val kept = cells.agg(
      coalesce(sum(expr("m * (m - 1) div 2")), lit(0L)).as("pairs_kept"))
    val comps = p.agg(countDistinct("pc").as("n_prior_components"))
      .crossJoin(c.agg(countDistinct("nc").as("n_current_components")))
    val ids = p.agg(count(lit(1)).as("n_prior_ids"))
      .crossJoin(c.agg(count(lit(1)).as("n_current_ids")))

    ids.crossJoin(membership).crossJoin(comps)
      .crossJoin(byPc).crossJoin(byNc).crossJoin(kept)
      .withColumn("pair_recall",
        when(col("pairs_prior") > 0,
          col("pairs_kept").cast("double") / col("pairs_prior")))
      .withColumn("pair_precision",
        when(col("pairs_current") > 0,
          col("pairs_kept").cast("double") / col("pairs_current")))
      .select(
        col("n_prior_ids"), col("n_current_ids"), col("n_common"),
        col("n_added"), col("n_removed"), col("n_moved"),
        col("n_prior_components"), col("n_current_components"),
        col("n_split_components"), col("n_merged_components"),
        col("pairs_prior"), col("pairs_current"), col("pairs_kept"),
        col("pair_recall"), col("pair_precision"))
  }

  /** DuckDB mirror as CTEs + final SELECT, continuing a chain that
    * already defines `pasg(id, component)` (prior) and
    * `nasg(id, component)` (current). Sums over BIGINT cells are cast
    * back to BIGINT (DuckDB widens to HUGEINT); `//` is DuckDB's
    * integer division (`div` on the Spark side) — `s*(s-1)` is even,
    * so both are exact. */
  def driftSqlDuck: String =
    s"""j AS (
       |  SELECT coalesce(p.id, n.id) AS id, p.component AS pc, n.component AS nc
       |  FROM pasg p FULL OUTER JOIN nasg n ON p.id = n.id),
       |cells AS (
       |  SELECT pc, nc, CAST(count(*) AS BIGINT) AS m FROM j
       |  WHERE pc IS NOT NULL AND nc IS NOT NULL GROUP BY pc, nc),
       |bypc AS (
       |  SELECT CAST(count(CASE WHEN d > 1 THEN 1 END) AS BIGINT) AS n_split_components,
       |         CAST(coalesce(sum((s * (s - 1)) // 2), 0) AS BIGINT) AS pairs_prior
       |  FROM (SELECT pc, CAST(sum(m) AS BIGINT) AS s, count(*) AS d
       |        FROM cells GROUP BY pc)),
       |bync AS (
       |  SELECT CAST(count(CASE WHEN d > 1 THEN 1 END) AS BIGINT) AS n_merged_components,
       |         CAST(coalesce(sum((s * (s - 1)) // 2), 0) AS BIGINT) AS pairs_current
       |  FROM (SELECT nc, CAST(sum(m) AS BIGINT) AS s, count(*) AS d
       |        FROM cells GROUP BY nc)),
       |kept AS (
       |  SELECT CAST(coalesce(sum((m * (m - 1)) // 2), 0) AS BIGINT) AS pairs_kept
       |  FROM cells),
       |membership AS (
       |  SELECT
       |    CAST(count(CASE WHEN pc IS NOT NULL AND nc IS NOT NULL THEN 1 END) AS BIGINT) AS n_common,
       |    CAST(count(CASE WHEN pc IS NULL THEN 1 END) AS BIGINT) AS n_added,
       |    CAST(count(CASE WHEN nc IS NULL THEN 1 END) AS BIGINT) AS n_removed,
       |    CAST(count(CASE WHEN pc IS NOT NULL AND nc IS NOT NULL AND pc <> nc THEN 1 END) AS BIGINT) AS n_moved
       |  FROM j),
       |idtot AS (
       |  SELECT (SELECT CAST(count(*) AS BIGINT) FROM pasg) AS n_prior_ids,
       |         (SELECT CAST(count(*) AS BIGINT) FROM nasg) AS n_current_ids,
       |         (SELECT CAST(count(DISTINCT component) AS BIGINT) FROM pasg) AS n_prior_components,
       |         (SELECT CAST(count(DISTINCT component) AS BIGINT) FROM nasg) AS n_current_components)
       |SELECT
       |  n_prior_ids, n_current_ids, n_common, n_added, n_removed, n_moved,
       |  n_prior_components, n_current_components,
       |  n_split_components, n_merged_components,
       |  pairs_prior, pairs_current, pairs_kept,
       |  CASE WHEN pairs_prior > 0
       |       THEN CAST(pairs_kept AS DOUBLE) / pairs_prior END AS pair_recall,
       |  CASE WHEN pairs_current > 0
       |       THEN CAST(pairs_kept AS DOUBLE) / pairs_current END AS pair_precision
       |FROM idtot, membership, bypc, bync, kept
       |""".stripMargin
}
