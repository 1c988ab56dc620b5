package graft.cluster

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Cluster-quality metrics (A13) — the literature-standard entity-
  * resolution evaluation suite over a predicted clustering vs gold
  * entity labels: pairwise precision/recall/F1 (pair counting),
  * Adjusted Rand Index (Hubert-Arabie chance-corrected pair counting)
  * and B-cubed precision/recall/F1 (per-record purity/completeness —
  * the ER-community standard because it weights clusters by size).
  *
  * Everything derives from ONE contingency table
  * `(cluster, entity) → n_cg` plus its margins — three small groupBys
  * over the assignment table and 1-row aggregates crossJoined back, so
  * the cost is a single pass regardless of cluster count. Pair counts
  * C(n,2) are exact integers (`(n²-n) >> 1`), making pairwise P/R and
  * ARI bit-deterministic with no tricks; B-cubed's per-cell fractional
  * terms (n_cg²/n_c) are quantized to the same 1e-6 integer grid the
  * Fellegi-Sunter EM uses, so its sums are order-independent too —
  * all three metric families hash-match a DuckDB SQL mirror.
  *
  * n² stays exact below 2^53 ⇒ valid to ~9.4e7 records per cluster
  * and ~3e9 total records; beyond that the >> 1 trick needs decimal
  * widening (not a sandbox concern, noted for the 100-TB reader).
  */
object ClusterMetrics {

  /** `assign`: one row per record with its predicted cluster and gold
    * entity. Returns ONE row: n_records, n_clusters, n_entities,
    * pair_precision/recall/f1, ari, bcubed_precision/recall/f1. */
  def metrics(
      assign: DataFrame,
      clusterCol: String = "component",
      entityCol: String = "entity"): DataFrame = {
    val a = assign.select(col(clusterCol).as("c"), col(entityCol).as("g"))
    val cells = a.groupBy("c", "g").agg(count(lit(1)).as("n_cg"))
    val rws = a.groupBy("c").agg(count(lit(1)).as("n_c"))
    val cls = a.groupBy("g").agg(count(lit(1)).as("n_g"))
    def c2(c: org.apache.spark.sql.Column) = shiftright(c * c - c, 1)
    def q6(num: org.apache.spark.sql.Column, den: org.apache.spark.sql.Column) =
      round((lit(1000000.0) * num.cast("double")) / den.cast("double"), 0).cast("long")
    val cellAgg = cells.join(rws, Seq("c")).join(cls, Seq("g")).agg(
      sum(c2(col("n_cg"))).as("sum_cells"),
      sum(q6(col("n_cg") * col("n_cg"), col("n_c"))).as("sp"),
      sum(q6(col("n_cg") * col("n_cg"), col("n_g"))).as("sr"))
    val rowAgg = rws.agg(sum(c2(col("n_c"))).as("sum_rows"),
      count(lit(1)).as("n_clusters"))
    val colAgg = cls.agg(sum(c2(col("n_g"))).as("sum_cols"),
      count(lit(1)).as("n_entities"))
    val nAgg = a.agg(count(lit(1)).as("n_records"))
    // Degenerate-input guards (all-singleton clusterings, trivial
    // inputs) are EXPLICIT CASEs mirrored in the SQL: Spark's ANSI mode
    // raises on double division by zero where DuckDB yields NaN, so a
    // shared definition is required for parity anyway. Conventions:
    // no predicted / no gold pairs → precision / recall 0; P+R = 0 →
    // F1 0; ARI denominator 0 (both clusterings trivial) → 1 (sklearn).
    def f1(p: org.apache.spark.sql.Column, r: org.apache.spark.sql.Column) =
      when(p + r === 0.0, 0.0).otherwise(((lit(2.0) * p) * r) / (p + r))
    cellAgg.crossJoin(rowAgg).crossJoin(colAgg).crossJoin(nAgg)
      .withColumn("tot_pairs", c2(col("n_records")))
      .withColumn("pair_precision",
        when(col("sum_rows") === 0L, 0.0)
          .otherwise(col("sum_cells").cast("double") / col("sum_rows").cast("double")))
      .withColumn("pair_recall",
        when(col("sum_cols") === 0L, 0.0)
          .otherwise(col("sum_cells").cast("double") / col("sum_cols").cast("double")))
      .withColumn("bcubed_precision",
        col("sp").cast("double") / (col("n_records") * lit(1000000L)).cast("double"))
      .withColumn("bcubed_recall",
        col("sr").cast("double") / (col("n_records") * lit(1000000L)).cast("double"))
      .withColumn("expected",
        when(col("tot_pairs") === 0L, 0.0)
          .otherwise((col("sum_rows").cast("double") * col("sum_cols").cast("double")) /
            col("tot_pairs").cast("double")))
      .withColumn("ari_den",
        ((col("sum_rows").cast("double") + col("sum_cols").cast("double")) / lit(2.0)) -
          col("expected"))
      .withColumn("ari",
        when(col("ari_den") === 0.0, 1.0)
          .otherwise((col("sum_cells").cast("double") - col("expected")) / col("ari_den")))
      .withColumn("pair_f1", f1(col("pair_precision"), col("pair_recall")))
      .withColumn("bcubed_f1", f1(col("bcubed_precision"), col("bcubed_recall")))
      .select("n_records", "n_clusters", "n_entities",
        "pair_precision", "pair_recall", "pair_f1", "ari",
        "bcubed_precision", "bcubed_recall", "bcubed_f1")
  }

  // -------------------------------------------------------------------
  // DuckDB mirror
  // -------------------------------------------------------------------

  /** CTE chain + final SELECT, mirror of [[metrics]]. Assumes a prior
    * CTE `asg(c, g)` — one row per record. */
  def metricsSqlDuck: String =
    """cmx AS (SELECT c, g, count(*) AS n_cg FROM asg GROUP BY 1, 2),
      |rws AS (SELECT c, count(*) AS n_c FROM asg GROUP BY 1),
      |cls AS (SELECT g, count(*) AS n_g FROM asg GROUP BY 1),
      |cell_agg AS (
      |  SELECT sum((n_cg * n_cg - n_cg) >> 1) AS sum_cells,
      |    sum(CAST(round((CAST(1000000.0 AS DOUBLE) * CAST(n_cg * n_cg AS DOUBLE)) / CAST(n_c AS DOUBLE)) AS BIGINT)) AS sp,
      |    sum(CAST(round((CAST(1000000.0 AS DOUBLE) * CAST(n_cg * n_cg AS DOUBLE)) / CAST(n_g AS DOUBLE)) AS BIGINT)) AS sr
      |  FROM cmx JOIN rws USING (c) JOIN cls USING (g)),
      |row_agg AS (SELECT sum((n_c * n_c - n_c) >> 1) AS sum_rows, count(*) AS n_clusters FROM rws),
      |col_agg AS (SELECT sum((n_g * n_g - n_g) >> 1) AS sum_cols, count(*) AS n_entities FROM cls),
      |n_agg AS (SELECT count(*) AS n_records FROM asg),
      |b1 AS (SELECT *, (n_records * n_records - n_records) >> 1 AS tot_pairs
      |       FROM cell_agg CROSS JOIN row_agg CROSS JOIN col_agg CROSS JOIN n_agg),
      |b2 AS (SELECT *,
      |  CASE WHEN sum_rows = 0 THEN CAST(0.0 AS DOUBLE)
      |       ELSE CAST(sum_cells AS DOUBLE) / CAST(sum_rows AS DOUBLE) END AS pair_precision,
      |  CASE WHEN sum_cols = 0 THEN CAST(0.0 AS DOUBLE)
      |       ELSE CAST(sum_cells AS DOUBLE) / CAST(sum_cols AS DOUBLE) END AS pair_recall,
      |  CAST(sp AS DOUBLE) / CAST(n_records * 1000000 AS DOUBLE) AS bcubed_precision,
      |  CAST(sr AS DOUBLE) / CAST(n_records * 1000000 AS DOUBLE) AS bcubed_recall,
      |  CASE WHEN tot_pairs = 0 THEN CAST(0.0 AS DOUBLE)
      |       ELSE (CAST(sum_rows AS DOUBLE) * CAST(sum_cols AS DOUBLE)) / CAST(tot_pairs AS DOUBLE) END AS expected
      |  FROM b1),
      |b3 AS (SELECT *,
      |  ((CAST(sum_rows AS DOUBLE) + CAST(sum_cols AS DOUBLE)) / CAST(2.0 AS DOUBLE)) - expected AS ari_den
      |  FROM b2)
      |SELECT n_records, n_clusters, n_entities, pair_precision, pair_recall,
      |  CASE WHEN pair_precision + pair_recall = CAST(0.0 AS DOUBLE) THEN CAST(0.0 AS DOUBLE)
      |       ELSE ((CAST(2.0 AS DOUBLE) * pair_precision) * pair_recall) / (pair_precision + pair_recall) END AS pair_f1,
      |  CASE WHEN ari_den = CAST(0.0 AS DOUBLE) THEN CAST(1.0 AS DOUBLE)
      |       ELSE (CAST(sum_cells AS DOUBLE) - expected) / ari_den END AS ari,
      |  bcubed_precision, bcubed_recall,
      |  CASE WHEN bcubed_precision + bcubed_recall = CAST(0.0 AS DOUBLE) THEN CAST(0.0 AS DOUBLE)
      |       ELSE ((CAST(2.0 AS DOUBLE) * bcubed_precision) * bcubed_recall) / (bcubed_precision + bcubed_recall) END AS bcubed_f1
      |FROM b3""".stripMargin
}
