package graft.blocking

import graft.SparkSpec
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Exact edit-distance threshold join (J30): equality with brute force
  * (the no-false-negative guarantee end to end), gram-poor fallback,
  * k=0 degenerate, no cartesian on the main path, partitioning
  * invariance. */
class EdJoinSpec extends SparkSpec {

  private def df(rows: (String, String)*): DataFrame = {
    import spark.implicits._
    rows.toDF("id", "text")
  }

  private def brute(l: DataFrame, r: DataFrame, k: Int): Set[(String, String, Int)] =
    l.select(col("id").as("left_id"), col("text").as("lt"))
      .crossJoin(r.select(col("id").as("right_id"), col("text").as("rt")))
      .select(col("left_id"), col("right_id"), levenshtein(col("lt"), col("rt")).as("ed"))
      .filter(col("ed") <= k)
      .collect().map(x => (x.getString(0), x.getString(1), x.getInt(2))).toSet

  private def run(l: DataFrame, r: DataFrame, k: Int, q: Int = 2): Set[(String, String, Int)] =
    EdJoin.edJoin(l, r, k, q).collect()
      .map(x => (x.getString(0), x.getString(1), x.getInt(2))).toSet

  test("equals brute force incl. gram-poor and empty strings") {
    val l = df("l1" -> "ankara merkez mah", "l2" -> "izmir", "l3" -> "ab",
      "l4" -> "", "l5" -> "x")
    val r = df("r1" -> "ankara merkes mah", "r2" -> "izmit", "r3" -> "ba",
      "r4" -> "a", "r5" -> "ankara merkez mahx", "r6" -> "totally different text")
    for (k <- Seq(0, 1, 2, 3); q <- Seq(2, 3)) {
      assert(run(l, r, k, q) == brute(l, r, k), s"k=$k q=$q")
    }
  }

  test("equals brute force on random typo'd strings across k") {
    val rnd = new scala.util.Random(53)
    val base = (0 until 40).map(i => s"mahalle ${rnd.alphanumeric.take(12).mkString} no ${i % 30}")
    def typo(s: String): String = {
      val i = 1 + rnd.nextInt(s.length - 2)
      rnd.nextInt(3) match {
        case 0 => s.substring(0, i) + "z" + s.substring(i + 1) // substitute
        case 1 => s.substring(0, i) + s.substring(i + 1)       // delete
        case _ => s.substring(0, i) + "q" + s.substring(i)     // insert
      }
    }
    val l = df(base.zipWithIndex.map { case (s, i) => (s"l$i", s) }: _*)
    val r = df(base.zipWithIndex.flatMap { case (s, i) =>
      Seq((s"r$i", typo(s)), (s"rr$i", typo(typo(typo(s))))) }: _*)
    for (k <- Seq(1, 2, 3)) {
      val got = run(l, r, k)
      val want = brute(l, r, k)
      assert((want -- got).isEmpty, s"k=$k FALSE NEGATIVES: ${want -- got}")
      assert(got == want, s"k=$k extras: ${got -- want}")
    }
  }

  test("fixture subset: matches brute force") {
    val keep = expr("try_cast(id AS BIGINT) % 25 = 0")
    val l = graft.SparkEntry.addrNorm(
        graft.fixtures.AddressFixture.left(spark, sf0001)).filter(keep)
      .select(col("id"), col("address_norm").as("text"))
    val r = graft.SparkEntry.addrNorm(
        graft.fixtures.AddressFixture.rightAll(spark, sf0001))
      .select(col("id"), col("address_norm").as("text"))
    val got = run(l, r, 3)
    assert(got == brute(l, r, 3))
    assert(got.nonEmpty, "fixture should contain pairs within ed 3")
    // this sf0.001 id-subset happens to hold only exact-normalizing
    // variants; nonzero distances are exercised by the random-typo test
  }

  test("partitioning-independent") {
    val l = df((0 until 30).map(i => (s"l$i", s"sokak ${i % 7} blok ${i % 3}")): _*)
    val r = df((0 until 30).map(i => (s"r$i", s"sokak ${i % 5} blok ${i % 4}")): _*)
    assert(run(l.repartition(11), r.repartition(3), 2) == run(l, r, 2))
  }
}
