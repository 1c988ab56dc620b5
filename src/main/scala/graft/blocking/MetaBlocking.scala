package graft.blocking

import org.apache.spark.sql.{DataFrame, Column}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Token blocking + meta-blocking (J28) — the web-scale dirty-ER
  * candidate generator: every record joins one block per (distinct)
  * token of its normalized text, oversized blocks are purged, and the
  * surviving block graph is pruned by EDGE WEIGHT rather than scored
  * pair by pair. Weights: CBS (common blocks — how many surviving
  * blocks the two records share) and its Jaccard normalization.
  * Pruning: WEP (weight-edge pruning — keep edges at or above the mean
  * weight) and CNP (cardinality-node pruning — top-k neighbors per
  * left record). Complements the single-key [[BlockKeys]] path and the
  * MinHash-LSH bands: token blocking catches pairs that share ANY
  * distinctive token, at the cost of a weighted-graph cleaning stage —
  * exactly the Papadakis-style meta-blocking pipeline.
  *
  * Scale shape: membership explode is map-side; block purging bounds
  * the join fan-out to cap² per surviving block (the cap is a fraction
  * of the side's record count, so purging is scale-free); the
  * pair-weight aggregation is ONE shuffle with map-side combine; WEP's
  * global mean is a 1-row aggregate broadcast back (no driver
  * round-trip); CNP is the same top-k window the matcher already uses.
  * Every weight is an exact integer (CBS) or a quotient of exact
  * integers (Jaccard), so results are partitioning-independent and
  * DuckDB-hashable with no quantization tricks.
  */
object MetaBlocking {

  case class MbConfig(
      /** Purge blocks holding more than this fraction of a side's
        * records — frequent tokens ("mahalle", bare digits) carry no
        * identity signal and dominate the fan-out. */
      maxBlockFrac: Double = 0.15,
      /** CNP: neighbors kept per left record. */
      cnpK: Int = 3)

  /** (id, tok) membership: distinct non-empty whitespace tokens of the
    * (already normalized) text. */
  def membership(df: DataFrame, idCol: String, textCol: String): DataFrame =
    df.select(col(idCol).as("id"), explode(split(col(textCol), " ")).as("tok"))
      .filter(col("tok") =!= "")
      .distinct()

  /** Weighted candidate edges between `left` and `right`:
    * (left_id, right_id, cbs, jacc) over surviving blocks. */
  def pairWeights(
      left: DataFrame,
      right: DataFrame,
      cfg: MbConfig = MbConfig(),
      idCol: String = "id",
      textCol: String = "text"): DataFrame = {
    val lm = membership(left, idCol, textCol)
    val rm = membership(right, idCol, textCol)
    // scale-free purging caps: floor(frac * |side|), computed in-plan
    val capL = left.agg(floor(lit(cfg.maxBlockFrac) * count(lit(1))).as("cap_l"))
    val capR = right.agg(floor(lit(cfg.maxBlockFrac) * count(lit(1))).as("cap_r"))
    val surviving = lm.groupBy("tok").agg(count(lit(1)).as("nl"))
      .join(rm.groupBy("tok").agg(count(lit(1)).as("nr")), Seq("tok"), "inner")
      .crossJoin(broadcast(capL)).crossJoin(broadcast(capR))
      .filter(col("nl") <= col("cap_l") && col("nr") <= col("cap_r"))
      .select("tok")
    val lm2 = lm.join(surviving, Seq("tok"), "inner")
    val rm2 = rm.join(surviving, Seq("tok"), "inner")
    // per-record surviving-block cardinalities (Jaccard denominators)
    val bl = lm2.groupBy("id").agg(count(lit(1)).as("bl"))
      .withColumnRenamed("id", "left_id")
    val br = rm2.groupBy("id").agg(count(lit(1)).as("br"))
      .withColumnRenamed("id", "right_id")
    lm2.withColumnRenamed("id", "left_id")
      .join(rm2.withColumnRenamed("id", "right_id"), Seq("tok"), "inner")
      .groupBy("left_id", "right_id").agg(count(lit(1)).as("cbs"))
      .join(bl, Seq("left_id"))
      .join(br, Seq("right_id"))
      .select(col("left_id"), col("right_id"), col("cbs"),
        (col("cbs").cast("double") /
          (col("bl") + col("br") - col("cbs")).cast("double")).as("jacc"))
  }

  /** Weight-edge pruning: keep edges whose CBS is at or above the mean
    * CBS — the classic global WEP threshold. The mean is exact-integer
    * sum / count, broadcast back as a 1-row table. */
  def wep(weights: DataFrame): DataFrame = {
    val mean = weights.agg(
      (sum(col("cbs")).cast("double") / count(lit(1)).cast("double")).as("mean_cbs"))
    weights.crossJoin(broadcast(mean))
      .filter(col("cbs").cast("double") >= col("mean_cbs"))
      .select("left_id", "right_id", "cbs", "jacc")
  }

  /** Cardinality-node pruning: top-k neighbors per left record by
    * Jaccard (cbs, right_id tie-breaks keep it deterministic). */
  def cnp(weights: DataFrame, k: Int): DataFrame = {
    val w = Window.partitionBy(col("left_id"))
      .orderBy(col("jacc").desc, col("cbs").desc, col("right_id").asc)
    weights.withColumn("rn", row_number().over(w))
      .filter(col("rn") <= k)
      .select("left_id", "right_id", "cbs", "jacc")
  }

  // -------------------------------------------------------------------
  // DuckDB mirrors
  // -------------------------------------------------------------------

  /** CTE chain from normalized sides `ln(id, t)` / `rn(id, t)` to
    * `mw(left_id, right_id, cbs, jacc)` — mirror of [[pairWeights]]. */
  def pairWeightsCteDuck(cfg: MbConfig = MbConfig()): String =
    s"""lmem AS (SELECT DISTINCT id, tok FROM
       |  (SELECT id, unnest(string_split(t, ' ')) AS tok FROM ln) WHERE tok <> ''),
       |rmem AS (SELECT DISTINCT id, tok FROM
       |  (SELECT id, unnest(string_split(t, ' ')) AS tok FROM rn) WHERE tok <> ''),
       |surv AS (
       |  SELECT s.tok FROM
       |    (SELECT tok, count(*) AS nl FROM lmem GROUP BY 1) s
       |    JOIN (SELECT tok, count(*) AS nr FROM rmem GROUP BY 1) z ON s.tok = z.tok
       |  WHERE s.nl <= (SELECT floor(CAST(${cfg.maxBlockFrac} AS DOUBLE) * count(*)) FROM ln)
       |    AND z.nr <= (SELECT floor(CAST(${cfg.maxBlockFrac} AS DOUBLE) * count(*)) FROM rn)),
       |lmem2 AS (SELECT l.* FROM lmem l JOIN surv s ON l.tok = s.tok),
       |rmem2 AS (SELECT r.* FROM rmem r JOIN surv s ON r.tok = s.tok),
       |blc AS (SELECT id AS left_id, count(*) AS bl FROM lmem2 GROUP BY 1),
       |brc AS (SELECT id AS right_id, count(*) AS br FROM rmem2 GROUP BY 1),
       |mw AS (
       |  SELECT c.left_id, c.right_id, c.cbs,
       |         CAST(c.cbs AS DOUBLE) / CAST(b1.bl + b2.br - c.cbs AS DOUBLE) AS jacc
       |  FROM (SELECT l.id AS left_id, r.id AS right_id, count(*) AS cbs
       |        FROM lmem2 l JOIN rmem2 r ON l.tok = r.tok GROUP BY 1, 2) c
       |  JOIN blc b1 ON c.left_id = b1.left_id
       |  JOIN brc b2 ON c.right_id = b2.right_id)""".stripMargin

  /** Mirror of [[wep]] over the `mw` CTE. */
  def wepSelectSqlDuck: String =
    """SELECT left_id, right_id, cbs, jacc FROM mw
      |WHERE CAST(cbs AS DOUBLE) >=
      |  (SELECT CAST(sum(cbs) AS DOUBLE) / CAST(count(*) AS DOUBLE) FROM mw)"""
      .stripMargin.replaceAll("\n\\s*", " ")

  /** Mirror of [[cnp]] over the `mw` CTE. */
  def cnpSelectSqlDuck(k: Int): String =
    s"""SELECT left_id, right_id, cbs, jacc FROM
       |  (SELECT *, row_number() OVER (PARTITION BY left_id
       |     ORDER BY jacc DESC, cbs DESC, right_id ASC) AS rn
       |   FROM mw) WHERE rn <= $k""".stripMargin.replaceAll("\n\\s*", " ")
}
