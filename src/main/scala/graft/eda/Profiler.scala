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
