package graft.eda

import graft.SparkSpec
import org.apache.spark.sql.functions._

class ProfilerSpec extends SparkSpec {
  import spark.implicits._

  test("approx quantiles stay within the sketch's rank-error bound of exact") {
    // uniform 1..n: a value IS its rank, so the GK guarantee
    // (rank error <= n/accuracy) translates directly to value distance
    val df = (1 to 10000).map(_.toLong).toDF("v")
    val ps = Seq(0.25, 0.5, 0.75, 0.95)
    val exact = Profiler.quantiles(df, col("v"), ps)
      .collect().map(r => r.getInt(0) -> r.getDouble(1)).toMap
    val approx = Profiler.approxQuantiles(df, col("v"), ps, accuracy = 1000)
      .collect().map(r => r.getInt(0) -> r.getDouble(1)).toMap
    // n/accuracy = 10 ranks, +1 for exact's interpolation step
    ps.indices.foreach { i =>
      assert(math.abs(approx(i) - exact(i)) <= 11.0,
        s"quantile $i: approx ${approx(i)} vs exact ${exact(i)}")
    }
    // exact quantiles on 1..n are the closed-form interpolated ranks
    assert(exact(0) == 2500.75 && exact(1) == 5000.5 && exact(3) == 9500.05)
  }
}
