package graft.blocking

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Exact edit-distance threshold join (J30) — every cross-side pair
  * with `levenshtein ≤ k`, by q-gram prefix filtering (Gravano et al.,
  * "Approximate String Joins in a Database (Almost) for Free", VLDB
  * 2001, count filtering; Xiao, Wang & Lin, "Ed-Join", VLDB 2008,
  * prefix refinement). The string-edit counterpart to [[SetSimJoin]]:
  * one edit operation destroys at most `q` of a string's distinct
  * positional q-grams, so `ed(a,b) ≤ k` forces at most `k·q` of `a`'s
  * distinct grams to be absent from `b` — among any `k·q + 1` of `a`'s
  * grams at least one is shared. Order all grams by one global
  * (document-frequency-ascending) total order and keep each record's
  * `k·q + 1` rarest grams as its PREFIX: for a qualifying pair, its
  * order-minimal shared gram w₀ must sit inside BOTH prefixes (were it
  * outside `a`'s, the `k·q + 1` prefix grams — all before w₀, hence
  * all unshared — would exceed the `k·q` absence budget), so the
  * prefix equi-join has NO false negatives and exact verification
  * makes the join exact end to end.
  *
  * Records with ≤ `k·q` distinct grams (shorter than ~`q + k·q` chars)
  * can lose every gram within budget, so the prefix argument does not
  * cover them: they fall back to a broadcast length-band cross join —
  * a tiny set by construction (the fallback is empty on normal text).
  *
  * Scale shape mirrors [[SetSimJoin]]: rare-first prefixes keep the
  * candidate join keyed on COLD grams, one df aggregation + one
  * id-partitioned window build the prefixes, the length filter
  * (`|len(a) − len(b)| ≤ k`, sound since each edit changes length by
  * ≤ 1) prunes before verification, and the verifier is Spark's
  * codegen'd `levenshtein` on pre-joined texts — never an all-pairs
  * stage on the main path.
  */
object EdJoin {

  /** Exact threshold join: (left_id, right_id, ed) for every pair with
    * `levenshtein(left text, right text) ≤ k`. */
  def edJoin(
      left: DataFrame,
      right: DataFrame,
      k: Int,
      q: Int = 2,
      idCol: String = "id",
      textCol: String = "text"): DataFrame = {
    require(k >= 0 && q >= 1)
    val prefixLen = k * q + 1
    def base(df: DataFrame) =
      df.select(col(idCol).as("id"), col(textCol).as("t"))
        .withColumn("len", length(col("t")))
        .withColumn("grams", distinctGrams(col("t"), q))
    val lb = base(left)
    val rb = base(right)

    // gram-poor records: the prefix bound cannot cover them (doc above)
    def poor(df: DataFrame) = df.filter(size(col("grams")) <= k * q)
    def rich(df: DataFrame) = df.filter(size(col("grams")) > k * q)

    val lg = rich(lb).select(col("id"), col("len"), explode(col("grams")).as("g"))
    val rg = rich(rb).select(col("id"), col("len"), explode(col("grams")).as("g"))
    val dfq = lg.select("g").unionAll(rg.select("g"))
      .groupBy("g").agg(count(lit(1)).as("cnt"))
    def prefix(g: DataFrame) = {
      val byRank = Window.partitionBy("id").orderBy(col("cnt").asc, col("g").asc)
      g.join(dfq, Seq("g"))
        .withColumn("pos", row_number().over(byRank))
        .filter(col("pos") <= prefixLen)
        .select("id", "len", "g")
    }
    val candMain = prefix(lg).select(col("id").as("left_id"), col("len").as("ll"), col("g"))
      .join(prefix(rg).select(col("id").as("right_id"), col("len").as("rl"), col("g")),
        Seq("g"))
      .filter(abs(col("ll") - col("rl")) <= k)
      .select("left_id", "right_id")
      .distinct()
    // broadcast fallbacks: gram-poor side × everything in the length band
    def bandPairs(a: DataFrame, b: DataFrame) =
      broadcast(a.select(col("id").as("left_id"), col("len").as("ll")))
        .join(b.select(col("id").as("right_id"), col("len").as("rl")),
          abs(col("ll") - col("rl")) <= k)
        .select("left_id", "right_id")
    val cand = candMain
      .unionAll(bandPairs(poor(lb), rb))
      .unionAll(broadcast(poor(rb).select(col("id").as("right_id"), col("len").as("rl")))
        .join(lb.select(col("id").as("left_id"), col("len").as("ll")),
          abs(col("ll") - col("rl")) <= k)
        .select("left_id", "right_id"))
      .distinct()
    // exact verification on pre-joined texts (codegen'd levenshtein)
    cand
      .join(lb.select(col("id").as("left_id"), col("t").as("lt")), Seq("left_id"))
      .join(rb.select(col("id").as("right_id"), col("t").as("rt")), Seq("right_id"))
      .select(col("left_id"), col("right_id"),
        levenshtein(col("lt"), col("rt")).as("ed"))
      .filter(col("ed") <= k)
  }

  /** Distinct positional q-grams of `t` (empty array when len < q). */
  private[blocking] def distinctGrams(t: Column, q: Int): Column =
    when(length(t) >= q,
      array_distinct(transform(sequence(lit(0), length(t) - q),
        i => t.substr(i + lit(1), lit(q)))))
      .otherwise(array().cast("array<string>"))

  // -------------------------------------------------------------------
  // DuckDB mirror
  // -------------------------------------------------------------------

  /** Independent-formulation oracle: the plain length-banded
    * `levenshtein ≤ k` join over CTEs `ln(id, t)` / `rn(id, t)` — no
    * q-grams, no prefixes. */
  def edJoinSqlDuck(k: Int): String =
    s"""SELECT l.id AS left_id, r.id AS right_id,
       |       CAST(levenshtein(l.t, r.t) AS INT) AS ed
       |FROM ln l, rn r
       |WHERE abs(length(l.t) - length(r.t)) <= $k
       |  AND levenshtein(l.t, r.t) <= $k""".stripMargin
}
