package graft.transcripts

import graft.normalize.Normalizer
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Tool-call sequence features (T4) — the transcript-native comparison
  * field the reference's single-text flow has no analogue of: a
  * conversation is ALSO the ordered sequence of tools its agent
  * invoked, and two transcripts of the same underlying session keep
  * similar tool traces even when their text diverges. Canonicalize
  * each tool spelling ([[Normalizer.normTool]] — the graft mirror of
  * the reference's abbreviation table), order by `turn_idx`, and emit
  * the distinct set of adjacent-call bigrams `a>b` — an order-aware
  * set representation that any token-set operator downstream (Jaccard
  * enrichment, [[graft.blocking.SetSimJoin]], MinHash) consumes as-is.
  *
  * Scale shape: one groupBy on conv_id (map-side combinable
  * collect_list of small structs), per-group array ops — no joins, no
  * windows, no shuffle beyond the one aggregation.
  */
object ToolSequences {

  /** Per conversation: distinct canonical tool-call bigrams in turn
    * order. Conversations with no tool turns are absent; a single tool
    * call yields an empty set. Output: (conv_id, tk array<string>). */
  def bigramTokens(spark: SparkSession, sfDir: String, variants: Int = 3): DataFrame = {
    val n = size(col("sq")) - 1
    Transcripts.turns(spark, sfDir, variants).toDF()
      .filter(col("tool").isNotNull)
      .select(col("conv_id"), col("turn_idx"), Normalizer.normTool(col("tool")).as("nt"))
      .groupBy("conv_id")
      .agg(array_sort(collect_list(struct(col("turn_idx"), col("nt")))).as("sq"))
      .select(col("conv_id"), array_distinct(
        zip_with(
          slice(col("sq"), lit(1), greatest(n, lit(0))),
          slice(col("sq"), lit(2), greatest(n, lit(0))),
          (x, y) => concat(x.getField("nt"), lit(">"), y.getField("nt")))).as("tk"))
  }

  /** Enrich candidate pairs with the tool-sequence Jaccard: exact
    * integer intersection/union over the bigram sets, NULL when either
    * side has no sequence or both sets are empty (no evidence ≠ zero
    * similarity). Pairs keep their columns; one left join per side. */
  def jaccardEnrich(
      pairs: DataFrame,
      tokens: DataFrame,
      leftIdCol: String = "left_id",
      rightIdCol: String = "right_id"): DataFrame = {
    val lt = tokens.select(col("conv_id").as(leftIdCol), col("tk").as("l_tk"))
    val rt = tokens.select(col("conv_id").as(rightIdCol), col("tk").as("r_tk"))
    val inter = size(array_intersect(col("l_tk"), col("r_tk")))
    val uni = size(col("l_tk")) + size(col("r_tk")) - inter
    pairs.join(lt, Seq(leftIdCol), "left").join(rt, Seq(rightIdCol), "left")
      .withColumn("toolseq_jaccard",
        when(col("l_tk").isNull || col("r_tk").isNull || uni === 0,
          lit(null).cast("double"))
          .otherwise(inter.cast("double") / uni.cast("double")))
      .drop("l_tk", "r_tk")
  }

  // -------------------------------------------------------------------
  // DuckDB mirrors
  // -------------------------------------------------------------------

  /** CTEs replaying [[bigramTokens]] from the `transcripts` CTE:
    * defines `ttk(conv_id, tk)`. */
  def bigramTokensCteDuck: String =
    s"""tool_turns AS (
       |  SELECT conv_id, turn_idx, ${Normalizer.normToolSqlDuck("tool")} AS nt
       |  FROM transcripts WHERE tool IS NOT NULL),
       |tseq AS (SELECT conv_id, list(nt ORDER BY turn_idx) AS sq
       |         FROM tool_turns GROUP BY conv_id),
       |ttk AS (SELECT conv_id, list_distinct(list_transform(
       |          generate_series(1, len(sq) - 1),
       |          i -> sq[i] || '>' || sq[i + 1])) AS tk
       |        FROM tseq)""".stripMargin

  /** Mirror of [[jaccardEnrich]] over a pairs CTE `mp(left_id,
    * right_id, ...)` and `ttk`; selects `extraCols` through. */
  def jaccardEnrichSqlDuck(extraCols: Seq[String]): String = {
    val extra = extraCols.map("p." + _).mkString(", ")
    s"""SELECT p.left_id, p.right_id, $extra,
       |  CASE WHEN a.tk IS NULL OR b.tk IS NULL
       |         OR len(a.tk) + len(b.tk) - len(list_intersect(a.tk, b.tk)) = 0
       |       THEN NULL
       |       ELSE CAST(len(list_intersect(a.tk, b.tk)) AS DOUBLE)
       |            / CAST(len(a.tk) + len(b.tk) - len(list_intersect(a.tk, b.tk)) AS DOUBLE)
       |  END AS toolseq_jaccard
       |FROM mp p
       |LEFT JOIN ttk a ON p.left_id = a.conv_id
       |LEFT JOIN ttk b ON p.right_id = b.conv_id""".stripMargin
  }
}
