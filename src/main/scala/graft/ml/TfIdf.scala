package graft.ml

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Relational TF-IDF + cosine nearest-neighbor — the Spark rebuild of
  * the reference's ML linkage baseline (char-n-gram TfidfVectorizer +
  * brute cosine NearestNeighbors, string_similarity.py:5-20,
  * match_baseline.py:22-31). No ml.feature sparse vectors: TF-IDF is
  * expressed as the classic explode → (doc, term, tf) → idf join →
  * l2-normalize → term-equi-join cosine — every step a plain
  * shuffle-friendly relational operator, so Catalyst plans it like any
  * other join/agg and it scales with the term shuffle, not with a
  * driver-side vocabulary.
  *
  * idf follows sklearn's smooth default: ln((1+N)/(1+df)) + 1, l2 norm.
  */
object TfIdf {

  /** Character n-grams (with multiplicity) of a string column. Strings
    * shorter than n yield an EMPTY array (guarded: Spark's
    * sequence(1, 0) is the descending [1, 0], which would fabricate a
    * spurious whole-string gram where DuckDB's generate_series(1, 0)
    * yields none). */
  def charNgrams(c: Column, n: Int): Column =
    when(length(c) >= n,
      transform(sequence(lit(1), length(c) - (n - 1)), i => c.substr(i, lit(n))))
      .otherwise(lit(Array.empty[String]))

  private def termCounts(df: DataFrame, idCol: String, textCol: String, n: Int): DataFrame =
    df.select(col(idCol).as("id"), explode(charNgrams(col(textCol), n)).as("term"))
      .groupBy("id", "term").agg(count(lit(1)).cast("double").as("tf"))

  /** idf fit on a corpus: sklearn smooth ln((1+N)/(1+df)) + 1, with
    * sklearn-style document-frequency pruning (`min_df` absolute,
    * `max_df` a corpus ratio — TfidfVectorizer's own mitigation, used by
    * the reference via min_df in train_baseline.py:71-89).
    *
    * maxDfRatio is the SCALE guard: without it one stop-term appearing
    * in every document makes the downstream term equi-join quadratic in
    * corpus size (every test doc × every train doc through that term);
    * capping df bounds the per-term join fan-out at maxDfRatio·N. */
  def fitIdf(df: DataFrame, idCol: String, textCol: String, n: Int,
      minDf: Long = 1L, maxDfRatio: Double = 1.0): DataFrame = {
    val nDocs = df.count()
    val maxDf = math.floor(maxDfRatio * nDocs).toLong
    termCounts(df, idCol, textCol, n)
      .groupBy("term").agg(countDistinct("id").as("df"))
      .filter(col("df") >= minDf && col("df") <= maxDf)
      .withColumn("idf",
        log((lit(1.0) + nDocs.toDouble) / (lit(1.0) + col("df"))) + 1.0)
      .select("term", "idf")
  }

  /** Transform: tf * (train-fit) idf, l2-normalized; terms unseen at fit
    * time drop out (sklearn transform semantics). */
  def transformTfIdf(df: DataFrame, idf: DataFrame,
      idCol: String, textCol: String, n: Int): DataFrame = {
    val weighted = termCounts(df, idCol, textCol, n).join(idf, "term")
      .withColumn("w", col("tf") * col("idf"))
    val norms = weighted.groupBy("id")
      .agg(sqrt(sum(col("w") * col("w"))).as("norm"))
    weighted.join(norms, "id")
      .select(col("id"), col("term"), (col("w") / col("norm")).as("weight"))
  }

  /** Cosine 1-NN: fit idf on train, transform both sides, then the best
    * train doc per test doc by cosine over shared-term weights (the term
    * equi-join only materializes pairs sharing a term — the relational
    * analogue of sparse-vector pruning). Deterministic tie-break on
    * train id. */
  def cosineTopK(
      train: DataFrame, test: DataFrame,
      idCol: String, textCol: String, n: Int, k: Int,
      minDf: Long = 1L, maxDfRatio: Double = 1.0): DataFrame = {
    val idf = fitIdf(train, idCol, textCol, n, minDf, maxDfRatio)
    val trainV = transformTfIdf(train, idf, idCol, textCol, n)
      .withColumnRenamed("id", "train_id").withColumnRenamed("weight", "tw")
    val testV = transformTfIdf(test, idf, idCol, textCol, n)
      .withColumnRenamed("id", "test_id").withColumnRenamed("weight", "qw")
    val scored = testV.join(trainV, "term")
      .groupBy("test_id", "train_id")
      .agg(round(sum(col("qw") * col("tw")), 6).as("cos"))
    val w = Window.partitionBy("test_id").orderBy(col("cos").desc, col("train_id").asc)
    scored.withColumn("rank", row_number().over(w))
      .filter(col("rank") <= k)
      .select(col("test_id"), col("train_id"), col("rank"), col("cos"))
  }
}
