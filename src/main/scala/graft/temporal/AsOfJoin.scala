package graft.temporal

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Distributed as-of join (T2) — for every left row, attach the single
  * right row of the same key with the greatest timestamp ≤ the left
  * row's timestamp (LEFT semantics: nulls when no prior right row).
  * The temporal primitive behind "state as of event time" features —
  * time-since-last-error, latest prior order, config active at send
  * time — that Spark has no built-in operator for.
  *
  * Implementation is the sort-merge formulation, not a join: tag both
  * sides, UNION them, and run ONE ordered window per key —
  * `last(payload, ignoreNulls)` over a running frame carries the most
  * recent right payload forward into each left row. One shuffle on the
  * key, one sort, zero join fan-out: cost is O((|L|+|R|) log) per key
  * regardless of how many right rows precede each left row, where a
  * naive `ts <= ts` range join would be O(|L|·|R|) per key. This is
  * the plan a 100-TB as-of needs — the union preserves a single
  * exchange, and the running `last` is a constant-state streaming
  * window (no re-scan per row).
  *
  * Determinism: right rows order before left rows at equal timestamps
  * (`ts >= ts` matches, as-of-inclusive), and equal-timestamp right
  * rows resolve to the greatest `rightTieCol` — the same row an
  * ORDER-BY-tie-deduped DuckDB ASOF JOIN picks, which is exactly how
  * the oracle checks it.
  */
object AsOfJoin {

  /** Left as-of join. `right`'s non-key columns (which must not collide
    * with `left`'s — rename before calling) all become payload columns
    * on the output; `rightTieCol` breaks equal-timestamp ties (greatest
    * wins).
    */
  def nearestPrior(
      left: DataFrame,
      right: DataFrame,
      keyCol: String,
      leftTsCol: String,
      rightTsCol: String,
      rightTieCol: String): DataFrame = {
    val leftCols = left.columns.filterNot(_ == keyCol).toSeq
    val payCols = right.columns.filterNot(_ == keyCol).toSeq
    val collide = leftCols.toSet.intersect(payCols.toSet)
    require(collide.isEmpty, s"rename right columns colliding with left: $collide")
    val paySchema = org.apache.spark.sql.types.StructType(
      right.select(payCols.map(col): _*).schema.fields)
    val rightU = right.select(
      Seq(
        col(keyCol),
        col(rightTsCol).cast("timestamp").as("__ts"),
        lit(0).as("__side"),
        col(rightTieCol).cast("long").as("__tie"),
        struct(payCols.map(col): _*).as("__pay")) ++
        leftCols.map(c => lit(null).cast(left.schema(c).dataType).as(c)): _*)
    val leftU = left.select(
      Seq(
        col(keyCol),
        col(leftTsCol).cast("timestamp").as("__ts"),
        lit(1).as("__side"),
        lit(null).cast("long").as("__tie"),
        lit(null).cast(paySchema).as("__pay")) ++
        leftCols.map(col): _*)
    // right-before-left at equal ts (inclusive as-of); among equal-ts
    // right rows the LAST in tie order (the greatest tie) wins
    val w = Window.partitionBy(keyCol)
      .orderBy(col("__ts").asc, col("__side").asc, col("__tie").asc)
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    rightU.unionAll(leftU)
      .withColumn("__m", last(col("__pay"), ignoreNulls = true).over(w))
      .filter(col("__side") === 1)
      .select(col(keyCol) +: leftCols.map(col) ++:
        payCols.map(c => col("__m").getField(c).as(c)): _*)
  }

  // -------------------------------------------------------------------
  // DuckDB mirror
  // -------------------------------------------------------------------

  /** Mirror of [[nearestPrior]] using DuckDB's native ASOF LEFT JOIN —
    * an INDEPENDENT implementation of the semantics, not a replay of
    * the window formulation. Equal-timestamp right ties are deduped to
    * the greatest `rightTie` first (the row the Spark side picks).
    * `leftSrc`/`rightSrc` are table/CTE names; emits all left columns
    * then all right payload columns.
    */
  def nearestPriorSqlDuck(
      leftSrc: String,
      rightSrc: String,
      keyCol: String,
      leftTs: String,
      rightTs: String,
      rightTie: String,
      leftCols: Seq[String],
      payCols: Seq[String]): String = {
    val lsel = (keyCol +: leftCols).map("l." + _).mkString(", ")
    val psel = payCols.map("r." + _).mkString(", ")
    s"""SELECT $lsel, $psel
       |FROM $leftSrc l ASOF LEFT JOIN (
       |  SELECT * FROM (
       |    SELECT *, row_number() OVER (
       |      PARTITION BY $keyCol, $rightTs ORDER BY $rightTie DESC) AS __rn
       |    FROM $rightSrc) WHERE __rn = 1
       |) r ON l.$keyCol = r.$keyCol AND l.$leftTs >= r.$rightTs""".stripMargin
  }
}
