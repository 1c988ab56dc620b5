package graft.cluster

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** Star (hub-assignment) clustering: hand-built graphs, determinism,
  * and the chaining-vs-splitting contrast with connected components. */
class StarClusteringSpec extends SparkSpec {

  import org.apache.spark.sql.DataFrame

  private def edges(pairs: (String, String)*): DataFrame = {
    import spark.implicits._
    pairs.toDF("left_id", "right_id")
  }

  private def toMap(df: DataFrame): Map[String, String] =
    df.collect().map(r => r.getString(0) -> r.getString(1)).toMap

  test("path graph: everyone attaches to the middle hub") {
    // a-b, b-c: deg(b)=2, deg(a)=deg(c)=1 -> all three pick b
    val out = toMap(StarClustering.assign(edges("a" -> "b", "b" -> "c")))
    assert(out == Map("a" -> "b", "b" -> "b", "c" -> "b"))
  }

  test("triangle: degree tie broken by smallest id, one cluster") {
    val out = toMap(StarClustering.assign(
      edges("a" -> "b", "b" -> "c", "a" -> "c")))
    assert(out == Map("a" -> "a", "b" -> "a", "c" -> "a"))
  }

  test("two stars joined by a bridge split; CC chains them") {
    // hub1 {h1,x1,x2,x3}, hub2 {h2,y1,y2,y3}, bridge x1-y1.
    val e = edges(
      "h1" -> "x1", "h1" -> "x2", "h1" -> "x3",
      "h2" -> "y1", "h2" -> "y2", "h2" -> "y3",
      "x1" -> "y1")
    val star = toMap(StarClustering.assign(e))
    // deg: h1=h2=3, x1=y1=2, rest 1. x1's best = h1 (deg 3); y1's = h2.
    assert(star("x1") == "h1" && star("y1") == "h2")
    assert(Set("x2", "x3").forall(star(_) == "h1"))
    assert(Set("y2", "y3").forall(star(_) == "h2"))
    assert(star.values.toSet == Set("h1", "h2")) // bridge did NOT chain
    val cc = ConnectedComponents.run(e, "left_id", "right_id")
    assert(cc.select("component").distinct().count() == 1) // CC chains
  }

  test("coverage, duplicate/orientation invariance, determinism") {
    val e = edges("a" -> "b", "b" -> "a", "a" -> "b", "b" -> "c", "c" -> "d")
    val out = StarClustering.assign(e)
    val ids = out.select("id").as[String](org.apache.spark.sql.Encoders.STRING)
      .collect().sorted
    assert(ids.toSeq == Seq("a", "b", "c", "d")) // one row per vertex
    val again = toMap(StarClustering.assign(e.repartition(7)))
    assert(toMap(out) == again) // partitioning-independent
  }

  test("fixture match graph: hub assignment recovers entity clusters") {
    // Accepted address matches are hub-shaped (left record <-> its r/s
    // variants), so star should agree with the labeled entity exactly.
    val dir = "/root/testdata/sf0.001"
    val m = graft.SparkEntry.queries("a_match_lev")(spark, dir).cache()
    val star = StarClustering.assign(m)
      .withColumn("entity", regexp_extract(col("id"), "([0-9]+)", 1))
    val metrics = ClusterMetrics.metrics(
      star.select(col("id"), col("cluster").as("component"), col("entity")))
      .collect()(0)
    assert(metrics.getAs[Double]("pair_f1") >= 0.99,
      s"star pair F1 = ${metrics.getAs[Double]("pair_f1")}")
  }
}
