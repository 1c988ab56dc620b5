package graft.cluster

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Golden-record survivorship (A15) — the step AFTER clustering that
  * every production ER pipeline needs and the reference stops short of:
  * collapse each entity cluster to ONE canonical record via
  * deterministic survivorship rules. Rules here are the classic trio
  * (Talburt's ER texts; Christen, "Data Matching", ch. 2.5 calls this
  * the merge/fusion step):
  *
  *   - `canonical_id`  — smallest member id (stable join handle),
  *   - `text_mode`     — most frequent value, ties to the
  *     lexicographically smallest (majority vote survivorship),
  *   - `text_longest`  — longest value, same tie-break (most-complete
  *     survivorship, the usual rule for free-text fields).
  *
  * Scale shape: one id-keyed join (records → assignments), ONE
  * data-sized groupBy per rule family — `(component, value)` counts
  * feed BOTH value rules, so the full text column is shuffled exactly
  * once — then window ranks over the (much smaller) distinct-value
  * table and a map-side-combinable scalar agg for id/count. No
  * windows over raw records, no collect, no iteration. Every rule is
  * an exact integer/lexicographic argmax → partitioning-independent
  * and DuckDB-hashable.
  */
object GoldenRecord {

  /** One canonical row per cluster.
    *
    * @param records     (idCol, textCol) — one row per member record
    * @param assignments (idCol, componentCol) — e.g.
    *                    [[ConnectedComponents.run]] output
    * @return (component, canonical_id, n_members, text_mode, text_longest)
    */
  def merge(
      records: DataFrame,
      assignments: DataFrame,
      idCol: String = "id",
      textCol: String = "text",
      componentCol: String = "component"): DataFrame = {
    val rec = records.select(col(idCol).as("id"), col(textCol).as("t"))
      .join(assignments.select(col(idCol).as("id"), col(componentCol).as("component")), Seq("id"))
    val scalar = rec.groupBy(col("component"))
      .agg(min(col("id")).as("canonical_id"), count(lit(1)).as("n_members"))
    // one pass over the records carries the text; both value rules rank
    // the distinct-value table, never the raw records
    val counts = rec.groupBy(col("component"), col("t"))
      .agg(count(lit(1)).as("cnt"))
    def pick(w: org.apache.spark.sql.expressions.WindowSpec, as: String) =
      counts.withColumn("rn", row_number().over(w))
        .filter(col("rn") === 1).select(col("component"), col("t").as(as))
    val mode = pick(
      Window.partitionBy("component").orderBy(col("cnt").desc, col("t").asc), "text_mode")
    val longest = pick(
      Window.partitionBy("component").orderBy(length(col("t")).desc, col("t").asc), "text_longest")
    scalar.join(mode, Seq("component")).join(longest, Seq("component"))
  }

  /** Multi-field survivorship — the production golden-record shape:
    * one canonical row per cluster with a PER-FIELD rule (`"mode"` =
    * majority vote, `"longest"` = most-complete), NULLs skipped per
    * field (a member missing a field never outvotes members that have
    * it; a field null across the whole cluster stays NULL). This is
    * the per-attribute fusion step of Christen ch. 2.5 / Talburt —
    * and exactly the "mixed-field Franken-record" [[medoid]]'s
    * scaladoc contrasts: fields may come from different members.
    *
    * Scale shape: the N field columns are STACKED into
    * (component, field, value) rows once — one explode, one
    * data-sized groupBy for all fields together, windows only over
    * the distinct-value table, then a tiny per-component pivot. Cost
    * is one shuffle of the stacked data regardless of N, never N
    * per-field shuffles.
    *
    * @param fields (column, rule) pairs; rule ∈ {"mode", "longest"};
    *               output column is named `<column>_<rule>`
    * @return (component, canonical_id, n_members, <column>_<rule>…) */
  def mergeFields(
      records: DataFrame,
      assignments: DataFrame,
      fields: Seq[(String, String)],
      idCol: String = "id",
      componentCol: String = "component"): DataFrame = {
    require(fields.nonEmpty && fields.forall(f => f._2 == "mode" || f._2 == "longest"),
      s"rules must be mode|longest: $fields")
    require(fields.map(_._1).distinct.size == fields.size,
      s"field columns must be distinct (alias a column to apply two rules): $fields")
    val rec = records
      .join(assignments.select(col(idCol).as(idCol), col(componentCol).as("component")),
        Seq(idCol))
    val scalar = rec.groupBy(col("component"))
      .agg(min(col(idCol)).as("canonical_id"), count(lit(1)).as("n_members"))
    val stacked = rec.select(col("component"),
      explode(array(fields.map { case (c, _) =>
        struct(lit(c).as("field"), col(c).cast("string").as("value"))
      }: _*)).as("fv"))
      .select(col("component"), col("fv.field").as("field"), col("fv.value").as("value"))
      .filter(col("value").isNotNull)
    val counts = stacked.groupBy("component", "field", "value")
      .agg(count(lit(1)).as("cnt"))
    val wMode = Window.partitionBy("component", "field")
      .orderBy(col("cnt").desc, col("value").asc)
    val wLong = Window.partitionBy("component", "field")
      .orderBy(length(col("value")).desc, col("value").asc)
    val isPicked = fields.map { case (c, rule) =>
      col("field") === c && (if (rule == "mode") col("rn_mode") else col("rn_long")) === 1
    }.reduce(_ || _)
    val picked = counts
      .withColumn("rn_mode", row_number().over(wMode))
      .withColumn("rn_long", row_number().over(wLong))
      .filter(isPicked)
    val pivoted = picked.groupBy("component")
      .agg(fields.map { case (c, rule) =>
        max(when(col("field") === c, col("value"))).as(s"${c}_$rule")
      }.head, fields.tail.map { case (c, rule) =>
        max(when(col("field") === c, col("value"))).as(s"${c}_$rule")
      }: _*)
    // left join: a component whose every member is NULL in every field
    // still gets its scalar row (field columns NULL)
    scalar.join(pivoted, Seq("component"), "left")
  }

  /** Mirror of [[mergeFields]]: expects `grecN(component, id, <cols>…)`
    * (the already-joined member records with the raw field columns) in
    * scope; CTE chain + final SELECT matching [[mergeFields]]'s output
    * column names. */
  def mergeFieldsSqlDuck(fields: Seq[(String, String)]): String = {
    val stacked = fields.map { case (c, _) =>
      s"SELECT component, '$c' AS field, CAST($c AS VARCHAR) AS value FROM grecN WHERE $c IS NOT NULL"
    }.mkString("\n       UNION ALL ")
    val pickedCond = fields.map { case (c, rule) =>
      s"(field = '$c' AND ${if (rule == "mode") "rn_mode" else "rn_long"} = 1)"
    }.mkString(" OR ")
    val pivotCols = fields.map { case (c, rule) =>
      s"max(CASE WHEN field = '$c' THEN value END) AS ${c}_$rule"
    }.mkString(", ")
    val outCols = fields.map { case (c, rule) => s"p.${c}_$rule" }.mkString(", ")
    s"""gm_scalar AS (SELECT component, min(id) AS canonical_id,
       |                     count(*) AS n_members FROM grecN GROUP BY component),
       |gm_st AS ($stacked),
       |gm_cnt AS (SELECT component, field, value, count(*) AS cnt
       |           FROM gm_st GROUP BY component, field, value),
       |gm_rank AS (SELECT component, field, value,
       |  row_number() OVER (PARTITION BY component, field
       |                     ORDER BY cnt DESC, value ASC) AS rn_mode,
       |  row_number() OVER (PARTITION BY component, field
       |                     ORDER BY length(value) DESC, value ASC) AS rn_long
       |  FROM gm_cnt),
       |gm_pick AS (SELECT component, field, value FROM gm_rank WHERE $pickedCond),
       |gm_piv AS (SELECT component, $pivotCols FROM gm_pick GROUP BY component)
       |SELECT s.component, s.canonical_id, s.n_members, $outCols
       |FROM gm_scalar s LEFT JOIN gm_piv p ON s.component = p.component""".stripMargin
  }

  /** The recompute set for ANY per-cluster derived table between two
    * assignment snapshots: (labels to recompute, prior labels to
    * drop). A component is untouched ⇔ none of its members changed
    * label, appeared, or VANISHED; since CC labels are the component's
    * min member id, an untouched component has an identical member set
    * AND label, so its derived row (survivorship, medoid) is still
    * exact — the same touched-keys argument as incremental
    * sessionization. r06 (ADVICE r05): ids present in the prior
    * snapshot but absent from the new one — the shrink case the
    * grow/merge-only precondition used to leave silently stale — now
    * put their OLD component into both sets, so its prior row is
    * dropped and, if the label still has members, recomputed from the
    * new snapshot (a label with no remaining members simply emits no
    * row). The one remaining documented precondition is record-text
    * immutability: a changed text under an unchanged (id, component)
    * is invisible to any assignment diff. Cost: one id-keyed join plus
    * one anti-join of vertex-sized assignment tables; no cluster
    * CONTENT is read for untouched components. */
  private def touchedComponents(
      priorAsg: DataFrame, newAsg: DataFrame): (DataFrame, DataFrame) = {
    val moved = newAsg.join(
      priorAsg.withColumnRenamed("component", "old_component"), Seq("id"), "left")
      .filter(col("old_component").isNull ||
        col("old_component") =!= col("component"))
    val vanished = priorAsg.join(newAsg.select("id"), Seq("id"), "left_anti")
      .select(col("component").as("old_component"))
    val stale = moved.filter(col("old_component").isNotNull)
      .select("old_component").unionByName(vanished)
      .select(col("old_component").as("component")).distinct()
    (moved.select("component")
      .unionByName(vanished.select(col("old_component").as("component")))
      .distinct(),
      stale)
  }

  private def asgCanon(df: DataFrame, idCol: String, componentCol: String) =
    df.select(col(idCol).as("id"), col(componentCol).as("component"))

  /** Incremental [[merge]]: fold a new assignments snapshot (grown or
    * merged clusters — the [[ConnectedComponents.runIncremental]]
    * output) into a prior survivorship table, recomputing ONLY touched
    * components and passing every untouched golden row through
    * unchanged. Provably = `merge(records, newAssignments)`: a golden
    * row is a deterministic function of (label, member multiset), both
    * unchanged for untouched components; touched components are
    * recomputed by the full rule. Per-batch cost ∝ members of touched
    * clusters, not corpus size — the survivorship table of a 10^12-row
    * corpus is foldable per ingest instead of rebuilt.
    *
    * @param records FULL committed record table (id, text); the
    *                touched-component semi-join prunes the scan. */
  def mergeIncremental(
      priorGolden: DataFrame,
      priorAssignments: DataFrame,
      newAssignments: DataFrame,
      records: DataFrame,
      idCol: String = "id",
      textCol: String = "text",
      componentCol: String = "component"): DataFrame = {
    val (recompute, stale) = touchedComponents(
      asgCanon(priorAssignments, idCol, componentCol),
      asgCanon(newAssignments, idCol, componentCol))
    val keep = priorGolden.join(
      recompute.unionByName(stale).distinct(), Seq("component"), "left_anti")
    val touchedAsg = asgCanon(newAssignments, idCol, componentCol)
      .join(recompute, Seq("component"), "left_semi")
    keep.unionByName(
      merge(records.select(col(idCol).as("id"), col(textCol).as("text")),
        touchedAsg))
  }

  /** Incremental [[medoid]] — same touched-component fold as
    * [[mergeIncremental]] (the medoid row, including the `capped`
    * flag, is a deterministic function of (label, member multiset)). */
  def medoidIncremental(
      priorMedoid: DataFrame,
      priorAssignments: DataFrame,
      newAssignments: DataFrame,
      records: DataFrame,
      idCol: String = "id",
      textCol: String = "text",
      componentCol: String = "component",
      maxMembers: Int = 256): DataFrame = {
    val (recompute, stale) = touchedComponents(
      asgCanon(priorAssignments, idCol, componentCol),
      asgCanon(newAssignments, idCol, componentCol))
    val keep = priorMedoid.join(
      recompute.unionByName(stale).distinct(), Seq("component"), "left_anti")
    val touchedAsg = asgCanon(newAssignments, idCol, componentCol)
      .join(recompute, Seq("component"), "left_semi")
    keep.unionByName(
      medoid(records.select(col(idCol).as("id"), col(textCol).as("text")),
        touchedAsg, maxMembers = maxMembers))
  }

  // -------------------------------------------------------------------
  // DuckDB mirror
  // -------------------------------------------------------------------

  /** Cluster MEDOID selection (A16) — the distance-based canonical
    * record: per cluster, the member minimizing the SUM of edit
    * distances to every other member (ties to the smallest id),
    * with that sum exposed as a cluster-cohesion statistic. The
    * complement of [[merge]]'s per-field rules: the medoid is a real,
    * whole record (never a Franken-record of mixed fields), the usual
    * choice when downstream consumers need one representative
    * transcript/address verbatim.
    *
    * Scale shape: one id-keyed join, then pairwise distances WITHIN
    * each cluster only — a self-equi-join on `component`, Σ|cluster|²
    * scored pairs total, each through the codegen'd `levenshtein`.
    * That quadratic is intrinsic to exact medoids and fine at the
    * match-cluster scale this pipeline produces (clusters are entity
    * groups, tens of members) — but transitive CC over a
    * boilerplate-heavy corpus is exactly where a degenerate
    * million-member cluster appears, and at 100× ONE such cluster is
    * 10¹² levenshtein pairs inside a single key. The quadratic is
    * therefore GUARDED: clusters with more than `maxMembers` members
    * never enter the self-join — they surface with the deterministic
    * min-id representative (the same stable handle [[merge]] elects),
    * a NULL `dist_sum` (honest: the cohesion statistic was not
    * computed) and `capped = true`, so downstream consumers can route
    * them to [[merge]]'s linear rules or a sampled re-run. Singletons
    * never join (no partner rows) and re-enter with dist_sum 0 via the
    * left join. Integer sums, lexicographic ties —
    * partitioning-independent and DuckDB-hashable.
    *
    * @param maxMembers clusters above this size skip the quadratic
    *                   (default 256 ⇒ ≤ ~65k pairs per cluster)
    * @return (component, medoid_id, dist_sum, capped)
    */
  def medoid(
      records: DataFrame,
      assignments: DataFrame,
      idCol: String = "id",
      textCol: String = "text",
      componentCol: String = "component",
      maxMembers: Int = 256): DataFrame = {
    require(maxMembers >= 1, s"maxMembers must be >= 1, got $maxMembers")
    val rec = records.select(col(idCol).as("id"), col(textCol).as("t"))
      .join(assignments.select(col(idCol).as("id"), col(componentCol).as("component")),
        Seq("id"))
    val sizes = rec.groupBy("component")
      .agg(count(lit(1)).as("n_mem"), min(col("id")).as("min_id"))
    val recS = rec.join(
      sizes.filter(col("n_mem") <= maxMembers).select("component"), Seq("component"))
    val sums = recS
      .join(recS.select(col("component"), col("id").as("id2"), col("t").as("t2")),
        Seq("component"))
      .filter(col("id") =!= col("id2"))
      .groupBy("component", "id")
      .agg(sum(levenshtein(col("t"), col("t2")).cast("bigint")).as("dist_sum"))
    val exact = recS.select("component", "id")
      .join(sums, Seq("component", "id"), "left")
      .withColumn("dist_sum", coalesce(col("dist_sum"), lit(0L)))
      .withColumn("rn", row_number().over(
        Window.partitionBy("component").orderBy(col("dist_sum").asc, col("id").asc)))
      .filter(col("rn") === 1)
      .select(col("component"), col("id").as("medoid_id"), col("dist_sum"),
        lit(false).as("capped"))
    val capped = sizes.filter(col("n_mem") > maxMembers)
      .select(col("component"), col("min_id").as("medoid_id"),
        lit(null).cast("long").as("dist_sum"), lit(true).as("capped"))
    exact.unionByName(capped)
  }

  /** Mirror of [[medoid]]: expects `grec(component, id, t)` in scope,
    * like [[mergeSqlDuck]]. */
  def medoidSqlDuck(maxMembers: Int = 256): String =
    s"""md_sz AS (SELECT component, count(*) AS n_mem, min(id) AS min_id
       |  FROM grec GROUP BY component),
       |md_rec AS (SELECT g.component, g.id, g.t FROM grec g JOIN md_sz z
       |  ON g.component = z.component AND z.n_mem <= $maxMembers),
       |md_pair AS (SELECT a.component, a.id,
       |    CAST(sum(levenshtein(a.t, b.t)) AS BIGINT) AS dist_sum
       |  FROM md_rec a JOIN md_rec b
       |    ON a.component = b.component AND a.id <> b.id
       |  GROUP BY a.component, a.id),
       |md_all AS (SELECT g.component, g.id,
       |    COALESCE(p.dist_sum, CAST(0 AS BIGINT)) AS dist_sum
       |  FROM md_rec g LEFT JOIN md_pair p
       |    ON g.component = p.component AND g.id = p.id)
       |SELECT component, medoid_id, dist_sum, capped FROM (
       |  SELECT component, id AS medoid_id, dist_sum, false AS capped FROM (
       |    SELECT component, id, dist_sum, row_number() OVER (
       |      PARTITION BY component ORDER BY dist_sum ASC, id ASC) AS rn
       |    FROM md_all) WHERE rn = 1
       |  UNION ALL
       |  SELECT component, min_id AS medoid_id, CAST(NULL AS BIGINT) AS dist_sum,
       |         true AS capped
       |  FROM md_sz WHERE n_mem > $maxMembers)""".stripMargin

  /** Mirror of [[merge]]: expects a CTE `grec(component, id, t)` (the
    * already-joined member records) in scope; CTE chain + final SELECT
    * `(component, canonical_id, n_members, text_mode, text_longest)`. */
  def mergeSqlDuck: String =
    s"""gr_scalar AS (SELECT component, min(id) AS canonical_id,
       |                     count(*) AS n_members FROM grec GROUP BY component),
       |gr_cnt AS (SELECT component, t, count(*) AS cnt FROM grec GROUP BY component, t),
       |gr_mode AS (SELECT component, t AS text_mode FROM (
       |  SELECT component, t, row_number() OVER (
       |    PARTITION BY component ORDER BY cnt DESC, t ASC) AS rn FROM gr_cnt)
       |  WHERE rn = 1),
       |gr_long AS (SELECT component, t AS text_longest FROM (
       |  SELECT component, t, row_number() OVER (
       |    PARTITION BY component ORDER BY length(t) DESC, t ASC) AS rn FROM gr_cnt)
       |  WHERE rn = 1)
       |SELECT s.component, s.canonical_id, s.n_members, m.text_mode, l.text_longest
       |FROM gr_scalar s
       |JOIN gr_mode m ON s.component = m.component
       |JOIN gr_long l ON s.component = l.component""".stripMargin
}
