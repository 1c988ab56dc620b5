package graft.temporal

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Binned range join (T3) — point-in-interval join at scale. Spark
  * plans a raw `l.key = r.key AND lo <= pt AND pt <= hi` as an
  * equi-join with the range as a post-join filter, which degenerates
  * to per-key all-pairs (O(|P|·|I|) per key — the same hot-key blowup
  * the matcher's salting exists for, but unsalvageable when one user's
  * points and intervals both number in the millions). The standard
  * scale formulation bins the time axis instead: every point lands in
  * exactly ONE fixed-width bin, every interval explodes into the bins
  * it covers, and the join key becomes `(key, bin)` — per-pair cost is
  * met exactly once (no dedup pass), the exchange is an ordinary hash
  * shuffle, and fan-out is bounded by `interval length / binWidth`,
  * a constant the caller picks to match the interval distribution
  * (bin ≈ typical interval ⇒ ~2 bins per interval).
  *
  * Inner-join semantics, both endpoints inclusive. Exact integer
  * microsecond arithmetic end to end — bin ids are `floorDiv` of
  * `unix_micros`, so results are partitioning-independent and
  * DuckDB-hashable against a plain range-predicate join.
  */
object RangeJoin {

  /** Points × intervals of the same key, point within `[loCol, hiCol]`
    * (inclusive). `intervals`' non-key columns (no collisions with
    * `points`' — rename first) become payload columns on the output.
    *
    * @param binSeconds bin width; fan-out per interval is
    *                   `len/binWidth + 1` exploded rows
    */
  def pointInInterval(
      points: DataFrame,
      intervals: DataFrame,
      keyCol: String,
      ptCol: String,
      loCol: String,
      hiCol: String,
      binSeconds: Long = 3600L): DataFrame = {
    val ptCols = points.columns.filterNot(_ == keyCol).toSeq
    val payCols = intervals.columns.filterNot(_ == keyCol).toSeq
    val collide = ptCols.toSet.intersect(payCols.toSet)
    require(collide.isEmpty, s"rename interval columns colliding with points: $collide")
    val binUs = binSeconds * 1000000L
    def us(c: String) = unix_micros(col(c).cast("timestamp"))
    def bin(c: String) = floor(us(c) / binUs).cast("long")
    val p = points.withColumn("__bin", bin(ptCol))
    val iv = intervals
      .withColumn("__bin", explode(sequence(bin(loCol), bin(hiCol))))
    p.join(iv, Seq(keyCol, "__bin"))
      .filter(us(ptCol) >= us(loCol) && us(ptCol) <= us(hiCol))
      .select(col(keyCol) +: (ptCols ++ payCols).map(col): _*)
  }

  /** Binned INTERVAL-overlap join (T5): intervals × intervals of the
    * same key that overlap — `a.lo <= b.hi AND b.lo <= a.hi`, both
    * endpoints inclusive. Same degenerate-plan hazard as
    * [[pointInInterval]] (Spark plans the raw predicate as per-key
    * all-pairs), same cure: both sides explode into the fixed-width
    * bins they cover and the join runs on `(key, bin)`.
    *
    * Exactly-once without a dedup pass: an overlapping pair co-occurs
    * in every bin of the overlap region, so only the RESPONSIBLE bin —
    * `bin(max(a.lo, b.lo))`, the overlap region's first bin — emits it.
    * That bin is covered by both sides (overlap gives `a.lo <= b.hi`
    * and `b.lo <= a.hi`; bins are monotone, so `bin(max(lo)) <=
    * bin(min(hi))` ≤ each side's last bin), and `max` of two fixed
    * endpoints is unique per pair — one emission, no distinct(), no
    * extra shuffle. Exact integer microsecond arithmetic end to end;
    * DuckDB-hashable against the plain overlap-predicate join.
    */
  def intervalOverlap(
      left: DataFrame,
      right: DataFrame,
      keyCol: String,
      leftLoCol: String,
      leftHiCol: String,
      rightLoCol: String,
      rightHiCol: String,
      binSeconds: Long = 3600L): DataFrame = {
    val lCols = left.columns.filterNot(_ == keyCol).toSeq
    val rCols = right.columns.filterNot(_ == keyCol).toSeq
    val collide = lCols.toSet.intersect(rCols.toSet)
    require(collide.isEmpty, s"rename right columns colliding with left: $collide")
    val binUs = binSeconds * 1000000L
    def us(c: String) = unix_micros(col(c).cast("timestamp"))
    def bin(c: String) = floor(us(c) / binUs).cast("long")
    val l = left.withColumn("__bin", explode(sequence(bin(leftLoCol), bin(leftHiCol))))
    val r = right.withColumn("__bin", explode(sequence(bin(rightLoCol), bin(rightHiCol))))
    l.join(r, Seq(keyCol, "__bin"))
      .filter(us(leftLoCol) <= us(rightHiCol) && us(rightLoCol) <= us(leftHiCol))
      // responsible-bin gate: emit in the overlap region's first bin only
      .filter(col("__bin") ===
        floor(greatest(us(leftLoCol), us(rightLoCol)) / binUs).cast("long"))
      .select(col(keyCol) +: (lCols ++ rCols).map(col): _*)
  }

  // -------------------------------------------------------------------
  // DuckDB mirror
  // -------------------------------------------------------------------

  /** Independent-formulation oracle: the plain range-predicate join
    * (no bins) over table/CTE names `ptSrc` / `ivSrc`. */
  def pointInIntervalSqlDuck(
      ptSrc: String,
      ivSrc: String,
      keyCol: String,
      ptCol: String,
      loCol: String,
      hiCol: String,
      ptCols: Seq[String],
      payCols: Seq[String]): String = {
    val sel = (s"p.$keyCol" +: (ptCols.map("p." + _) ++ payCols.map("i." + _))).mkString(", ")
    s"""SELECT $sel FROM $ptSrc p JOIN $ivSrc i
       |ON p.$keyCol = i.$keyCol
       |AND p.$ptCol >= i.$loCol AND p.$ptCol <= i.$hiCol""".stripMargin
  }

  /** Independent-formulation oracle for [[intervalOverlap]]: the plain
    * overlap-predicate join (no bins, no responsible-bin gate) over
    * table/CTE names `lSrc` / `rSrc`. */
  def intervalOverlapSqlDuck(
      lSrc: String,
      rSrc: String,
      keyCol: String,
      leftLoCol: String,
      leftHiCol: String,
      rightLoCol: String,
      rightHiCol: String,
      lCols: Seq[String],
      rCols: Seq[String]): String = {
    val sel = (s"a.$keyCol" +: (lCols.map("a." + _) ++ rCols.map("b." + _))).mkString(", ")
    s"""SELECT $sel FROM $lSrc a JOIN $rSrc b
       |ON a.$keyCol = b.$keyCol
       |AND a.$leftLoCol <= b.$rightHiCol AND b.$rightLoCol <= a.$leftHiCol""".stripMargin
  }
}
