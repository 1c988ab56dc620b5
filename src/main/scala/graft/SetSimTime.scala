package graft

import org.apache.spark.sql.functions._

/** Throwaway diagnostic: times the exact set-similarity join family
  * standalone at any SF (prefix-filtered Jaccard, weighted Jaccard,
  * absolute overlap) — decides whether a variant is cheap enough for
  * the bench suite and documents its sf0.1 cost on the record. */
object SetSimTime {
  def main(args: Array[String]): Unit = {
    Bench.sweepStaleTemp(includeOurs = false)
    val dir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val s = org.apache.spark.sql.SparkSession.builder()
      .master("local[32]")
      .config("spark.sql.shuffle.partitions", 32)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    s.sparkContext.setLogLevel("WARN")
    val conv = SparkEntry.convNorm(s, dir).cache()
    conv.count() // materialize once, outside the timings
    val l = conv.filter(col("variant") === 0)
    val r = conv.filter(col("variant") > 0)
    def time(tag: String)(f: => Long): Unit = for (i <- 1 to 2) {
      val t0 = System.nanoTime(); val n = f
      System.err.println(f"[setsimtime] $tag run$i: ${(System.nanoTime() - t0) / 1e9}%.2fs ($n rows)")
    }
    time("setsim_pf_0.5")(
      blocking.SetSimJoin.jaccardJoin(l, r, 0.5, "conv_id", "text_norm").count())
    time("setsim_wjac_0.97")(
      blocking.SetSimJoin.weightedJaccardJoin(l, r, 0.97, "conv_id", "text_norm").count())
    time("setsim_overlap_30")(
      blocking.SetSimJoin.overlapJoin(l, r, 30, "conv_id", "text_norm").count())
    Runtime.getRuntime.halt(0)
  }
}
