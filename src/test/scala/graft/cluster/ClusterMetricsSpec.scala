package graft.cluster

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** Cluster-quality metrics (A13): hand-computed vectors + the perfect-
  * clustering identity + behavior on the fixture pipeline. */
class ClusterMetricsSpec extends SparkSpec {

  test("hand-computed vector: pred {1,2},{3,4} vs gold {1,2,3},{4}") {
    import spark.implicits._
    // contingency: (c1,g1)=2, (c2,g1)=1, (c2,g2)=1
    // sum_cells=1, sum_rows=2, sum_cols=3, tot=6
    // pairP=1/2, pairR=1/3, F1=0.4; expected=1 -> ARI=0
    // B³P = (1+1+.5+.5)/4 = 0.75; B³R = (2/3+2/3+1/3+1)/4 = 2/3
    val assign = Seq(
      ("1", "c1", "g1"), ("2", "c1", "g1"),
      ("3", "c2", "g1"), ("4", "c2", "g2")).toDF("id", "component", "entity")
    val r = ClusterMetrics.metrics(assign).collect()(0)
    assert(r.getAs[Long]("n_records") == 4)
    assert(r.getAs[Long]("n_clusters") == 2 && r.getAs[Long]("n_entities") == 2)
    assert(r.getAs[Double]("pair_precision") == 0.5)
    assert(math.abs(r.getAs[Double]("pair_recall") - 1.0 / 3) < 1e-15)
    assert(math.abs(r.getAs[Double]("pair_f1") - 0.4) < 1e-15)
    assert(r.getAs[Double]("ari") == 0.0)
    assert(r.getAs[Double]("bcubed_precision") == 0.75)
    assert(math.abs(r.getAs[Double]("bcubed_recall") - 2.0 / 3) < 1e-5)
  }

  test("perfect clustering scores 1.0 everywhere") {
    import spark.implicits._
    val assign = (1 to 30).map(i => (i.toString, s"c${i % 5}", s"g${i % 5}"))
      .toDF("id", "component", "entity")
    val r = ClusterMetrics.metrics(assign).collect()(0)
    Seq("pair_precision", "pair_recall", "pair_f1", "ari",
      "bcubed_precision", "bcubed_recall", "bcubed_f1").foreach { f =>
      assert(r.getAs[Double](f) == 1.0, s"$f = ${r.getAs[Double](f)}")
    }
  }

  test("fixture pipeline: CC clustering scores near-perfect vs gold entities") {
    val r = graft.SparkEntry.addrClusterMetrics(spark, sf0001).collect()(0)
    info(s"ari=${r.getAs[Double]("ari")} bcubedF1=${r.getAs[Double]("bcubed_f1")}")
    assert(r.getAs[Double]("ari") >= 0.99)
    assert(r.getAs[Double]("bcubed_f1") >= 0.99)
    assert(r.getAs[Double]("pair_f1") >= 0.99)
  }

  test("degenerate guards: all-singleton clusterings") {
    import spark.implicits._
    // every record its own cluster AND its own entity: no pairs on
    // either side -> P/R/F1 0 by convention, ARI 1 (identical trivial
    // partitions); ANSI mode would otherwise raise DIVIDE_BY_ZERO
    val assign = (1 to 10).map(i => (i.toString, s"c$i", s"g$i"))
      .toDF("id", "component", "entity")
    val r = ClusterMetrics.metrics(assign).collect()(0)
    assert(r.getAs[Double]("pair_precision") == 0.0)
    assert(r.getAs[Double]("pair_recall") == 0.0)
    assert(r.getAs[Double]("pair_f1") == 0.0)
    assert(r.getAs[Double]("ari") == 1.0)
    assert(r.getAs[Double]("bcubed_precision") == 1.0)
    assert(r.getAs[Double]("bcubed_recall") == 1.0)
  }

  test("determinism: identical metric bits under different partitionings") {
    import spark.implicits._
    val assign = (1 to 500)
      .map(i => (i.toString, s"c${i % 7}", s"g${(i * 3) % 5}"))
      .toDF("id", "component", "entity")
    val a = ClusterMetrics.metrics(assign.repartition(3)).collect()(0)
    val b = ClusterMetrics.metrics(assign.repartition(17)).collect()(0)
    a.schema.fieldNames.filter(f => a.getAs[Any](f).isInstanceOf[Double]).foreach { f =>
      assert(java.lang.Double.doubleToLongBits(a.getAs[Double](f)) ==
        java.lang.Double.doubleToLongBits(b.getAs[Double](f)), f)
    }
  }
}
