package graft

import org.apache.spark.sql.functions._

/** Throwaway diagnostic: times the ANN suite queries standalone (the
  * round-3 driver bench spent 256.5s in ann_brute — this isolates the
  * fix's effect at any SF without running the whole bench). */
object AnnTime {
  def main(args: Array[String]): Unit = {
    // halt(0) below skips Spark's disk-cleanup shutdown hooks, so each
    // run leaks blockmgr-*/spark-* scratch; sweep prior runs' stale
    // Spark dirs at startup. includeOurs=false: a concurrent in-flight
    // Bench owns the graft-scaling*/graft-leg* artifacts — only the
    // bench itself may delete those ungated.
    Bench.sweepStaleTemp(includeOurs = false)
    val dir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val s = org.apache.spark.sql.SparkSession.builder()
      .master("local[32]")
      .config("spark.sql.shuffle.partitions", 256)
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    s.sparkContext.setLogLevel("WARN")
    for (q <- Seq("v_ann_brute", "v_ann_lsh", "v_ann_ivf", "d_embed_neardup"); i <- 1 to 2) {
      val t0 = System.nanoTime()
      val n = ExtraQueries.queries(q)(s, dir).count()
      System.err.println(f"[anntime] $q run$i: ${(System.nanoTime() - t0) / 1e9}%.2fs ($n rows)")
    }
    Runtime.getRuntime.halt(0)
  }
}
