package graft.eda

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** EDA / profiling aggregations — Spark rebuild of the reference's
  * DeepEDA module (SURVEY.md §2.7 A1-A7). All single-shuffle groupBy
  * aggregations; map-side partial aggregation applies everywhere.
  */
object Profiler {

  /** A1 (DeepEDA.py:107-121): value_counts with deterministic order. */
  def valueCounts(df: DataFrame, c: String): DataFrame =
    df.groupBy(col(c)).agg(count(lit(1)).as("cnt"))
      .orderBy(col("cnt").desc, col(c).asc)

  /** A2 (DeepEDA.py:67-72): per-column null counts. */
  def missingProfile(df: DataFrame): DataFrame = {
    val aggs = df.columns.map(c => sum(col(c).isNull.cast("long")).as(s"${c}_nulls"))
    df.agg(aggs.head, aggs.tail: _*)
  }

  /** A3 (DeepEDA.py:77-87): length stats — count/min/max/sum (exact
    * integer aggregates; mean/stddev left out of the oracle-compared
    * surface because engines differ in summation algorithms). */
  def lengthStats(df: DataFrame, c: String): DataFrame =
    df.agg(
      count(lit(1)).as("n"),
      min(length(col(c))).as("min_len"),
      max(length(col(c))).as("max_len"),
      sum(length(col(c)).cast("long")).as("sum_len"))

  /** A4 (DeepEDA.py:90-101): fixed-width histogram buckets. */
  def histogram(df: DataFrame, c: Column, width: Int): DataFrame =
    df.select(floor(c / width).cast("long").as("bucket"))
      .groupBy("bucket").agg(count(lit(1)).as("cnt"))

  /** A5 (DeepEDA.py:114): Gini-like diversity 1 - sum(p^2), computed
    * integer-exactly (sum of squared counts as bigint, one double
    * division at the end) so the value is bit-identical across engines
    * regardless of float summation order. */
  def giniDiversity(df: DataFrame, c: String): DataFrame =
    df.groupBy(col(c)).agg(count(lit(1)).as("cnt"))
      .agg(
        sum(col("cnt") * col("cnt")).as("sum_sq"),
        sum(col("cnt")).as("t"))
      .select((lit(1.0) - col("sum_sq").cast("double") /
        (col("t") * col("t")).cast("double")).as("gini"))

  /** A3 companion: EXACT quantiles via `percentile` (linear
    * interpolation at rank p·(n−1), the same definition as DuckDB's
    * `quantile_cont`, so the result is oracle-able). Exact percentile
    * buffers the value multiset per partition — fine for bounded
    * domains (lengths, counts), memory-bound on high-cardinality
    * columns at corpus scale, which is what [[approxQuantiles]] is
    * for. Output: (i, q) per requested quantile, rounded to 6 dp to
    * absorb engine-level float-summation differences. */
  def quantiles(df: DataFrame, c: Column, ps: Seq[Double]): DataFrame =
    df.agg(percentile(c, typedlit(ps)).as("qs"))
      .select(posexplode(col("qs")))
      .select(col("pos").cast("int").as("i"), round(col("col"), 6).as("q"))

  /** The 100-TB quantile path: `percentile_approx` (Greenwald–Khanna
    * sketch) — fixed-size state per partition regardless of
    * cardinality, mergeable map-side, rank error ≤ 1/accuracy. Not
    * oracle-able bit-for-bit (sketch internals are engine-specific);
    * spec-gated against the exact quantiles with a rank-error bound
    * instead (ProfilerSpec). */
  def approxQuantiles(
      df: DataFrame, c: Column, ps: Seq[Double], accuracy: Int = 10000): DataFrame =
    df.agg(percentile_approx(c, typedlit(ps), lit(accuracy)).as("qs"))
      .select(posexplode(col("qs")))
      .select(col("pos").cast("int").as("i"), col("col").cast("double").as("q"))

  /** A6 (DeepEDA.py:199-226): token frequency via explode. */
  def tokenFrequency(df: DataFrame, c: String, topN: Int): DataFrame =
    df.select(explode(filter(split(lower(col(c)), "\\s+"), t => t =!= "")).as("token"))
      .groupBy("token").agg(count(lit(1)).as("cnt"))
      .orderBy(col("cnt").desc, col("token").asc)
      .limit(topN)

  /** A6 bigrams: adjacent-token pairs via arrays_zip+slice. */
  def bigramFrequency(df: DataFrame, c: String, topN: Int): DataFrame = {
    val toks = filter(split(lower(col(c)), "\\s+"), t => t =!= "")
    df.select(explode(zip_with(
      slice(toks, lit(1), greatest(size(toks) - 1, lit(0))),
      slice(toks, lit(2), greatest(size(toks) - 1, lit(0))),
      (a, b) => concat(a, lit(" "), b))).as("bigram"))
      .groupBy("bigram").agg(count(lit(1)).as("cnt"))
      .orderBy(col("cnt").desc, col("bigram").asc)
      .limit(topN)
  }

  /** A7 (DeepEDA.py:143-176): keyword-presence counts (`\b kw \b`). */
  def keywordPresence(df: DataFrame, c: String, keywords: Seq[String]): DataFrame = {
    val aggs = keywords.map(kw =>
      sum(col(c).rlike(s"\\b$kw\\b").cast("long")).as(s"kw_$kw"))
    df.agg(aggs.head, aggs.tail: _*)
  }
}
