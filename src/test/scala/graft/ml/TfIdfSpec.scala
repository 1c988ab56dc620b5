package graft.ml

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** Document-frequency pruning bounds the cosine term-join fan-out —
  * the scale guard for the TF-IDF family (a stop-term in every doc
  * would otherwise make the equi-join quadratic in corpus size). */
class TfIdfSpec extends SparkSpec {
  import spark.implicits._

  // every doc shares the hot trigram "zzz"; the rest is unique per doc
  private lazy val corpus = (0 until 20)
    .map(i => (i.toLong, s"zzzuniq${i}a"))
    .toDF("id", "text")

  test("max_df drops the every-doc stop-term from the vocabulary") {
    val idf = TfIdf.fitIdf(corpus, "id", "text", n = 3, minDf = 2L, maxDfRatio = 0.9)
    val terms = idf.select("term").as[String].collect().toSet
    assert(!terms.contains("zzz"), "stop-term survived the max_df cap")
    // df("zzu") = 20 > cap as well; a mid-frequency term must survive:
    // "uni"/"niq" appear in all docs too — craft one shared by only half
    val mixed = ((0 until 10).map(i => (i.toLong, s"abc$i")) ++
      (10 until 20).map(i => (i.toLong, s"xyz$i"))).toDF("id", "text")
    val idf2 = TfIdf.fitIdf(mixed, "id", "text", n = 3, minDf = 2L, maxDfRatio = 0.6)
    val t2 = idf2.select("term").as[String].collect().toSet
    assert(t2.contains("abc") && t2.contains("xyz"), s"mid-df terms pruned: $t2")
  }

  test("term-join fan-out is bounded by the df cap") {
    val idf = TfIdf.fitIdf(corpus, "id", "text", n = 3, minDf = 1L, maxDfRatio = 0.5)
    val v = TfIdf.transformTfIdf(corpus, idf, "id", "text", n = 3)
    // with the every-doc trigrams capped out, each doc's surviving terms
    // are its unique ones -> the pair join through shared terms is empty
    val pairs = v.as("q").join(v.as("t"), "term")
      .filter(col("q.id") < col("t.id")).count()
    assert(pairs == 0L, s"capped vocabulary still fans out: $pairs pairs")
    // sanity: without the cap the same join is quadratic-ish
    val idfAll = TfIdf.fitIdf(corpus, "id", "text", n = 3)
    val vAll = TfIdf.transformTfIdf(corpus, idfAll, "id", "text", n = 3)
    val pairsAll = vAll.as("q").join(vAll.as("t"), "term")
      .filter(col("q.id") < col("t.id")).count()
    assert(pairsAll > 100L)
  }
}
