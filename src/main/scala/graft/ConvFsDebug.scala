package graft

import graft.matching.{FellegiSunter, MatchConfig, Matcher}
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Scratch runner for tuning the FS pipeline stage's γ bins on the
  * transcript corpus: dumps the TSR score distribution of ALL blocked
  * candidate pairs split by gold label, plus the gamma-pattern counts
  * and decision zones a given (textLo, textHi, mu) would produce. */
object ConvFsDebug {
  def main(args: Array[String]): Unit = {
    val dir = args.headOption.getOrElse("/root/testdata/sf0.001")
    val (lo, hi) = (args.lift(1).map(_.toDouble).getOrElse(60.0),
      args.lift(2).map(_.toDouble).getOrElse(85.0))
    val scorerName = args.lift(3).getOrElse("token_set_ratio")
    val spark = SparkSession.builder().master("local[8]")
      .config("spark.sql.shuffle.partitions", 8)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val conv = SparkEntry.convNorm(spark, dir).cache()
    val cfg = MatchConfig.reference.copy(scorer = scorerName)
    val scored = Matcher.scoredPairs(
      conv.filter(col("variant") === 0), conv.filter(col("variant") > 0),
      cfg.copy(threshold = 0.0), idCol = "conv_id", textCol = "text_norm")
    val g = scored.withColumn("gold",
      (regexp_extract(col("left_id"), "c([0-9]+)_", 1) ===
        regexp_extract(col("right_id"), "c([0-9]+)_", 1)).cast("int"))
    g.groupBy("gold").agg(count(lit(1)).as("n"), min("score"),
      expr("percentile(score, 0.05)").as("p05"),
      expr("percentile(score, 0.5)").as("p50"),
      expr("percentile(score, 0.95)").as("p95"), max("score")).show(false)
    g.groupBy(col("gold"), floor(col("score") / lit(5)).as("bin5"))
      .count().orderBy("gold", "bin5").show(60, false)
    // zones at the candidate bins
    val fsCfg = FellegiSunter.FsConfig(textLo = lo, textHi = hi)
    val gam = FellegiSunter.gammaPairsText(
      conv.filter(col("variant") === 0), conv.filter(col("variant") > 0),
      fsCfg, cfg.blockBy, graft.similarity.FuzzFunctions.scorer(cfg.scorer),
      idCol = "conv_id", textCol = "text_norm")
    val counts = FellegiSunter.gammaCounts(gam)
    val params = FellegiSunter.emFit(counts, fsCfg)
    params.show(false)
    val mu = args.lift(4).map(_.toDouble).getOrElse(0.01)
    FellegiSunter.decisionZones(counts, params, mu = mu).show(false)
    spark.stop()
  }
}
