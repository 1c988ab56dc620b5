package graft.similarity

import graft.SparkSpec
import org.apache.spark.sql.Row
import org.apache.spark.sql.functions._

/** The codegen'd [[DotProduct]] must be a drop-in for the interpreted
  * `aggregate(zip_with(a, b, _*_), 0.0, _+_)` HOF chain it replaced on
  * the ANN hot path: bit-identical values (same accumulation order)
  * and identical null semantics (null array, length mismatch, null
  * element). */
class VectorOpsSpec extends SparkSpec {
  import org.scalacheck.Gen

  private def hofDot = (a: org.apache.spark.sql.Column, b: org.apache.spark.sql.Column) =>
    aggregate(zip_with(a, b, (x, y) => x * y), lit(0.0), (acc, x) => acc + x)

  test("dot_product == interpreted HOF dot, bit-for-bit, on random vectors") {
    val vec = Gen.choose(1, 8).flatMap(n => Gen.listOfN(n, Gen.choose(-10.0, 10.0)))
    val cases = Gen.listOfN(40, Gen.zip(vec, vec)).sample.get
    import spark.implicits._
    val df = cases.toDF("a", "b")
    val got = df.select(
      VectorFunctions.dot_product(col("a"), col("b")).as("fast"),
      hofDot(col("a"), col("b")).as("ref")).collect()
    got.foreach { r =>
      val (fast, ref) = (r.get(0), r.get(1))
      if (ref == null) assert(fast == null)
      else assert(
        java.lang.Double.doubleToRawLongBits(r.getDouble(0)) ==
          java.lang.Double.doubleToRawLongBits(r.getDouble(1)),
        s"fast=$fast ref=$ref")
    }
    // length mismatch and equal length both appear in the sample
    assert(got.exists(_.get(1) == null), "no length-mismatch case sampled")
    assert(got.exists(_.get(1) != null), "no equal-length case sampled")
  }

  test("dot_product null semantics: null array, null element") {
    val rows = java.util.Arrays.asList(
      Row(Seq(1.0, 2.0), null),
      Row(Seq(1.0, 2.0), Seq(3.0, null)),
      Row(Seq(1.0, 2.0), Seq(3.0, 4.0)))
    val schema = org.apache.spark.sql.types.StructType.fromDDL(
      "a array<double>, b array<double>")
    val df = spark.createDataFrame(rows, schema)
    val got = df.select(VectorFunctions.dot_product(col("a"), col("b"))).collect()
    assert(got(0).isNullAt(0))
    assert(got(1).isNullAt(0))
    assert(got(2).getDouble(0) == 11.0)
  }

  test("static-plane LSH bucket is bit-identical to the dynamic HOF form") {
    import graft.ann.SimilaritySearch.{lshBucket, lshBucketStatic}
    val e = spark.read.parquet(s"$sf0001/embeddings.parquet")
      .select(col("vec_id"), col("embedding").cast("array<double>").as("e"))
    val got = e.select(
      lshBucket(col("e"), 6).as("dyn"),
      lshBucketStatic(col("e"), 6, 64).as("stat")).collect()
    assert(got.nonEmpty)
    got.foreach(r => assert(r.getLong(0) == r.getLong(1),
      s"dyn=${r.getLong(0)} stat=${r.getLong(1)}"))
    // and the driver-side plane constant replicates Spark's md5 derivation
    val sparkPlane = e.sparkSession.range(1).select(
      (conv(substring(md5(lit("plane3:17")), 1, 8), 16, 10)
        .cast("double") / lit(2147483648.0) - 1.0).as("p")).head().getDouble(0)
    assert(java.lang.Double.doubleToRawLongBits(sparkPlane) ==
      java.lang.Double.doubleToRawLongBits(
        graft.ann.SimilaritySearch.planeComponentConst(3, 17)))
    // a vector of the WRONG dimensionality must fail loudly, not
    // silently collapse into bucket 0 via the null dot product
    val bad = spark.createDataFrame(Seq(Tuple1(Seq(1.0, 2.0, 3.0))))
      .toDF("e")
    val err = intercept[Exception] {
      bad.select(lshBucketStatic(col("e"), 6, 64)).collect()
    }
    assert(err.getMessage.contains("lshBucketStatic") ||
      Option(err.getCause).exists(_.getMessage.contains("lshBucketStatic")))
  }

  test("ANN scored plan keeps the dot product inside whole-stage codegen") {
    val e = spark.read.parquet(s"$sf0001/embeddings.parquet")
    val topk = graft.ann.SimilaritySearch.bruteTopK(
      e, e.filter(col("vec_id") % 100 === 0), k = 3)
    topk.collect()
    val p = topk.queryExecution.executedPlan.toString
    assert(p.contains("dot_product"), s"dot_product missing from plan:\n$p")
    // the scoring projection must not fall back to interpreted HOFs
    assert(!p.contains("zip_with"), s"interpreted zip_with on the pair path:\n$p")
  }
}
