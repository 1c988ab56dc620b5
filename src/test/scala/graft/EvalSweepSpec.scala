package graft

import org.apache.spark.sql.functions._

/** Driver-query specs for the A17 threshold sweep and the D4
  * single-table self-match. */
class EvalSweepSpec extends SparkSpec {

  test("threshold sweep: full grid, counts monotone, metrics consistent") {
    val rows = SparkEntry.thresholdSweep(spark, sf0001)
      .orderBy("t").collect()
    assert(rows.length == 10)
    assert(rows.map(_.getAs[Double]("t")).toSeq == (0 until 10).map(50.0 + 5.0 * _))
    // raising the threshold can only shrink the accepted set
    val tps = rows.map(_.getAs[Long]("tp"))
    val fps = rows.map(_.getAs[Long]("fp"))
    assert(tps.zip(tps.tail).forall { case (a, b) => b <= a }, tps.toSeq.toString)
    assert(fps.zip(fps.tail).forall { case (a, b) => b <= a }, fps.toSeq.toString)
    rows.foreach { r =>
      val (tp, fp, fn) = (r.getAs[Long]("tp"), r.getAs[Long]("fp"), r.getAs[Long]("fn"))
      val p = r.getAs[Double]("precision")
      val rec = r.getAs[Double]("recall")
      assert(fn >= 0 && p >= 0.0 && p <= 1.0 && rec >= 0.0 && rec <= 1.0)
      if (tp + fp > 0)
        assert(math.abs(p - tp.toDouble / (tp + fp)) == 0.0)
      assert(math.abs(rec - tp.toDouble / (tp + fn)) == 0.0)
    }
    // the curve is informative on the fixture: not all rows identical
    assert(tps.distinct.length > 1 || fps.distinct.length > 1)
  }

  test("self-match: canonical pairs, no self-pairs, recovers variant dup pairs") {
    val m = SparkEntry.addrSelfMatch(spark, sf0001).cache()
    assert(m.filter(col("left_id") >= col("right_id")).count() == 0)
    // the r-/s-variants of the same entity are true in-table dups;
    // r<i> sorts before s<i> so the gold pair is (r<i>, s<i>)
    val gold = m.filter(
      regexp_extract(col("left_id"), "^r([0-9]+)$", 1) =!= lit("") &&
        col("right_id") === concat(lit("s"),
          regexp_extract(col("left_id"), "^r([0-9]+)$", 1))).count()
    val nEnt = graft.fixtures.AddressFixture.left(spark, sf0001).count()
    info(s"self-match gold dup pairs: $gold / $nEnt (total pairs ${m.count()})")
    assert(gold >= (nEnt * 0.9).toLong,
      s"self-match recovered only $gold of $nEnt variant dup pairs")
    m.unpersist()
  }
}
