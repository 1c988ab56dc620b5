package graft.matching

import graft.SparkSpec
import graft.fixtures.AddressFixture
import graft.normalize.Normalizer
import graft.similarity.FuzzFunctions
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Fellegi-Sunter EM linkage (J27): unsupervised parameter learning on
  * the labeled address fixture, posterior match quality vs gold, and
  * the determinism contract (quantized responsibilities → identical
  * params under any partitioning). */
class FellegiSunterSpec extends SparkSpec {

  import FellegiSunter.FsConfig

  private val cfg = FsConfig()

  private def norm(df: DataFrame): DataFrame =
    df.withColumn("address_norm", Normalizer.normalizeAddress(col("address")))

  private def gammas(sf: String): DataFrame =
    FellegiSunter.gammaPairs(
      norm(AddressFixture.left(spark, sf)),
      norm(AddressFixture.rightAll(spark, sf)),
      cfg, blockBy = "prefix4",
      scorer = FuzzFunctions.scorers("dl_ratio"),
      idCol = "id", textCol = "address_norm", hasGeo = true)

  test("EM learns a separating model: agreement levels likelier under match") {
    val params = FellegiSunter.emFit(FellegiSunter.gammaCounts(gammas(sf0001)), cfg)
      .collect()(0)
    def p(n: String): Double = params.getAs[Double](n)
    val lambda = p("lambda")
    assert(lambda > 0.0 && lambda < 1.0, s"lambda=$lambda")
    // strong text agreement: overwhelming match evidence
    assert(p("m_t2") > 100 * p("u_t2"), s"m_t2=${p("m_t2")} u_t2=${p("u_t2")}")
    // digit agreement and near geo: likelier under match than non-match
    assert(p("m_d1") > p("u_d1"), s"m_d1=${p("m_d1")} u_d1=${p("u_d1")}")
    assert(p("m_g1") > 100 * p("u_g1"), s"m_g1=${p("m_g1")} u_g1=${p("u_g1")}")
    // text/geo DISagreement: likelier under non-match
    assert(p("u_t0") > p("m_t0"), s"u_t0=${p("u_t0")} m_t0=${p("m_t0")}")
    assert(p("u_g0") > p("m_g0"), s"u_g0=${p("u_g0")} m_g0=${p("m_g0")}")
  }

  test("posterior matches: full recall on gold pairs, precision >= 0.85") {
    val g = gammas(sf0001).cache()
    val params = FellegiSunter.emFit(FellegiSunter.gammaCounts(g), cfg)
    val m = FellegiSunter.matchPosteriors(g, params, cfg.posteriorThreshold).cache()
    val nLeft = AddressFixture.left(spark, sf0001).count()
    val tp = m.filter(col("right_id") === concat(lit("r"), col("left_id")) ||
      col("right_id") === concat(lit("s"), col("left_id"))).count()
    val fp = m.count() - tp
    val gold = 2 * nLeft // every left matches its r- and s-variant
    info(s"gold=$gold tp=$tp fp=$fp precision=${tp.toDouble / (tp + fp)}")
    assert(tp == gold, s"recall ${tp.toDouble / gold} below 1.0")
    assert(tp.toDouble / (tp + fp) >= 0.85, s"precision ${tp.toDouble / (tp + fp)}")
    // posteriors are probabilities
    val bad = m.filter(col("posterior") < 0.5 || col("posterior") > 1.0).count()
    assert(bad == 0)
    g.unpersist(); m.unpersist()
  }

  test("determinism: identical params under different partitionings") {
    val g = gammas(sf0001)
    val a = FellegiSunter.emFit(FellegiSunter.gammaCounts(g.repartition(3)), cfg)
      .collect()(0)
    val b = FellegiSunter.emFit(FellegiSunter.gammaCounts(g.repartition(13)), cfg)
      .collect()(0)
    a.schema.fieldNames.foreach { f =>
      val (x, y) = (a.getAs[Double](f), b.getAs[Double](f))
      assert(java.lang.Double.doubleToLongBits(x) == java.lang.Double.doubleToLongBits(y),
        s"$f: $x != $y (bit-level)")
    }
  }

  test("three-zone rule: ordered zones, monotone in ratio, review queue consistent") {
    val g = gammas(sf0001).cache()
    val counts = FellegiSunter.gammaCounts(g)
    val params = FellegiSunter.emFit(counts, cfg)
    val zones = FellegiSunter.decisionZones(counts, params).cache()
    val rows = zones.collect()
    // total partition: every observed pattern gets exactly one zone
    assert(rows.map(_.getAs[String]("zone")).forall(
      Set("link", "possible", "nonlink")))
    assert(zones.count() == counts.count())
    // zones are ratio-ordered bands: min(link) >= max(possible) >= ...
    def ratios(z: String): Seq[Double] =
      rows.filter(_.getAs[String]("zone") == z).map(_.getAs[Double]("ratio")).toSeq
    val (lk, ps, nl) = (ratios("link"), ratios("possible"), ratios("nonlink"))
    assert(lk.nonEmpty && ps.nonEmpty && nl.nonEmpty,
      s"expected all three zones on the fixture: link=${lk.size} possible=${ps.size} nonlink=${nl.size}")
    if (lk.nonEmpty && ps.nonEmpty) assert(lk.min >= ps.max)
    if (ps.nonEmpty && nl.nonEmpty) assert(ps.min >= nl.max)
    // link zone captures the gold pairs (strong-agreement patterns)
    val gold = 2 * AddressFixture.left(spark, sf0001).count()
    val linked = FellegiSunter.reviewQueue(g,
      zones.withColumn("zone",
        when(col("zone") === "link", "possible").otherwise("x")))
    val tp = linked.filter(col("right_id") === concat(lit("r"), col("left_id")) ||
      col("right_id") === concat(lit("s"), col("left_id"))).count()
    info(s"gold=$gold link-zone tp=$tp of ${linked.count()}")
    assert(tp >= (gold * 0.95).toLong, s"link-zone recall ${tp.toDouble / gold}")
    // review queue == pairs whose pattern is 'possible'
    val queue = FellegiSunter.reviewQueue(g, zones)
    val expected = rows.filter(_.getAs[String]("zone") == "possible")
      .map(_.getAs[Long]("cnt")).sum
    assert(queue.count() == expected)
    // determinism under partitioning
    val z2 = FellegiSunter.decisionZones(
      FellegiSunter.gammaCounts(g.repartition(13)), params).collect()
    assert(z2.map(r => (r.getAs[Int]("g_t"), r.getAs[Int]("g_d"),
      r.getAs[Int]("g_g"), r.getAs[String]("zone"))).sortBy(_.toString).toSeq ==
      rows.map(r => (r.getAs[Int]("g_t"), r.getAs[Int]("g_d"),
        r.getAs[Int]("g_g"), r.getAs[String]("zone"))).sortBy(_.toString).toSeq)
    g.unpersist(); zones.unpersist()
  }

  test("gamma binning levels") {
    import spark.implicits._
    val rows = Seq(
      (90.0, 100.0, Some(85.0)), // strong everything
      (70.0, 0.0, Some(50.0)), // weak text, digit disagree, mid geo
      (10.0, 100.0, None) // text disagree, null geo -> level 0
    ).toDF("ts", "ds", "gs")
    val out = rows.select(FellegiSunter.gammasFromScores(
      col("ts"), col("ds"), col("gs"), cfg): _*).collect()
    assert(out(0).toSeq == Seq(2, 1, 2))
    assert(out(1).toSeq == Seq(1, 0, 1))
    assert(out(2).toSeq == Seq(0, 1, 0))
  }
}
