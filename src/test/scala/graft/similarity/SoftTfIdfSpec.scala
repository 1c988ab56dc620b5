package graft.similarity

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** Soft-TF-IDF (J38): weight formula against a hand computation,
  * self-similarity = 1, soft alignment across typos, theta
  * monotonicity, partitioning invariance. */
class SoftTfIdfSpec extends SparkSpec {

  private def corpus(rows: (String, String)*) = {
    import spark.implicits._
    rows.toDF("id", "text")
  }
  private def pairs(rows: (String, String)*) = {
    import spark.implicits._
    rows.map { case (l, r) => (l, r, 100.0) }.toDF("left_id", "right_id", "score")
  }

  private def score(c: org.apache.spark.sql.DataFrame,
      p: org.apache.spark.sql.DataFrame, theta: Double = 0.9): Map[(String, String), Double] = {
    val w = SoftTfIdf.weights(c)
    SoftTfIdf.enrich(p, w, theta).collect()
      .map(r => ((r.getString(0), r.getString(1)), r.getDouble(3))).toMap
  }

  test("weights match the hand formula (ln-tf * smooth idf, L2-normalized)") {
    // N=3 docs; "ankara" in 2 docs, "merkez"/"izmir"/"cadde" in 1
    val c = corpus("d1" -> "ankara merkez", "d2" -> "ankara cadde", "d3" -> "izmir")
    val got = SoftTfIdf.weights(c).collect()
      .map(r => ((r.getString(0), r.getString(1)), r.getDouble(2))).toMap
    def idf(df: Int) = math.log(4.0 / (1 + df)) + 1
    val wA = math.log(2.0) * idf(2) // tf=1 everywhere: ln(1+1)
    val wM = math.log(2.0) * idf(1)
    val n1 = math.sqrt(wA * wA + wM * wM)
    assert(math.abs(got(("d1", "ankara")) - wA / n1) < 1e-12)
    assert(math.abs(got(("d1", "merkez")) - wM / n1) < 1e-12)
    // single-token doc: weight exactly 1 after normalization
    assert(math.abs(got(("d3", "izmir")) - 1.0) < 1e-12)
  }

  test("identical records score exactly 1; disjoint records score 0") {
    val c = corpus(
      "l1" -> "ankara merkez cadde", "r1" -> "ankara merkez cadde",
      "l2" -> "izmir konak", "r2" -> "bursa osmangazi")
    val got = score(c, pairs("l1" -> "r1", "l2" -> "r2"))
    // each token self-aligns at jw=1, so the sum is Σ V(w)² = 1 (L2)
    assert(got(("l1", "r1")) == 1.0)
    assert(got(("l2", "r2")) == 0.0)
  }

  test("soft alignment: a typo'd token still contributes, weighted by jw") {
    val c = corpus("l1" -> "ankara merkez", "r1" -> "ankr merkez")
    val got = score(c, pairs("l1" -> "r1"))
    // "merkez" aligns exactly; "ankara"~"ankr" clears theta=0.9 with
    // jw < 1, so the score lands strictly between the exact-only
    // fraction and 1
    assert(got(("l1", "r1")) > 0.4 && got(("l1", "r1")) < 1.0,
      s"unexpected soft score ${got(("l1", "r1"))}")
    // at an impossible theta the typo pair drops out and only
    // "merkez" contributes
    val hi = score(c, pairs("l1" -> "r1"), theta = 0.999)
    assert(hi(("l1", "r1")) < got(("l1", "r1")))
  }

  test("theta monotonicity on the fixture: lower theta never lowers the score") {
    val recs = graft.SparkEntry.addrNorm(
        graft.fixtures.AddressFixture.left(spark, sf0001))
      .unionAll(graft.SparkEntry.addrNorm(
        graft.fixtures.AddressFixture.rightAll(spark, sf0001)))
      .select(col("id"), col("address_norm").as("text"))
    val p = graft.SparkEntry.addrMatchLev(spark, sf0001).limit(200)
      .localCheckpoint(true)
    val w = SoftTfIdf.weights(recs)
    def m(theta: Double) = SoftTfIdf.enrich(p, w, theta).collect()
      .map(r => ((r.getString(0), r.getString(1)), r.getDouble(3))).toMap
    val lo = m(0.8); val hi = m(0.95)
    assert(lo.keySet == hi.keySet)
    assert(lo.forall { case (k, v) => v >= hi(k) - 1e-9 },
      "lowering theta reduced a soft-tfidf score")
    graft.util.CheckpointHygiene.free(p)
  }

  test("partitioning-independent") {
    val rows = (1 to 30).map(i => (s"d$i", s"tok${i % 7} tok${i % 5} common"))
    val ps = (1 to 14).map(i => (s"d$i", s"d${i + 15}"))
    import spark.implicits._
    val a = score(rows.toDF("id", "text").repartition(1),
      ps.map { case (l, r) => (l, r, 100.0) }.toDF("left_id", "right_id", "score").repartition(1))
    val b = score(rows.toDF("id", "text").repartition(7),
      ps.map { case (l, r) => (l, r, 100.0) }.toDF("left_id", "right_id", "score").repartition(3))
    assert(a == b)
  }
}
