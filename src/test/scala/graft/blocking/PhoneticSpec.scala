package graft.blocking

import graft.SparkSpec
import graft.fixtures.AddressFixture
import graft.normalize.Normalizer
import org.apache.spark.sql.functions._

/** Phonetic (Soundex) blocking key (J36): classic-algorithm golden
  * vectors (the canonical published examples, including every h/w and
  * vowel-separator edge), dispatcher wiring, and the sound-alike
  * blocking property on the address fixture. */
class PhoneticSpec extends SparkSpec {

  private def keyOf(ss: Seq[String]): Seq[String] = {
    import spark.implicits._
    ss.toDF("s").select(BlockKeys.phoneticKey(col("s"))).collect()
      .map(_.getString(0)).toSeq
  }

  test("classic Soundex golden vectors") {
    val cases = Seq(
      "robert" -> "R163", // vanilla
      "rupert" -> "R163", // sound-alike of robert
      "ashcraft" -> "A261", // s,c same code separated by h: coded ONCE
      "ashcroft" -> "A261",
      "tymczak" -> "T522", // c,z adjacent same code collapse; y separates
      "pfister" -> "P236", // p,f same code as the FIRST group: one drop
      "honeyman" -> "H555", // h head carries no code: nothing dropped
      "washington" -> "W252", // w head, interior vowel separators
      "jackson" -> "J250", // c,k,s triple run collapses
      "euler" -> "E460", // vowel head carries no code
      "gutierrez" -> "G362", // r,r collapse
      "lloyd" -> "L300", // l,l collapse into the head group
      "istanbul" -> "I235",
      "istambul" -> "I235", // m/n same group: sound-alike spelling
      "a" -> "A000", // pad
      "42 main st" -> "M500", // leading digits: first ALPHA run keys
      "123" -> "", // no alphabetic run -> empty key
      "" -> "")
    assert(keyOf(cases.map(_._1)) == cases.map(_._2),
      keyOf(cases.map(_._1)).zip(cases).toString)
  }

  test("dispatcher mode 'phonetic' routes to phoneticKey") {
    import spark.implicits._
    val df = Seq("kadikoy mah 12", "kadykoi mah 7").toDF("s")
    val a = df.select(BlockKeys.blockKey(col("s"), "phonetic")).collect().map(_.getString(0))
    val b = df.select(BlockKeys.phoneticKey(col("s"))).collect().map(_.getString(0))
    assert(a.sameElements(b))
    assert(a(0) == a(1), s"sound-alike spellings should share a key: ${a.toSeq}")
  }

  test("fixture: phonetic blocks recover the gold pairs' first tokens") {
    val left = AddressFixture.left(spark, sf0001)
      .withColumn("t", Normalizer.normalizeAddress(col("address")))
      .select(col("id"), BlockKeys.phoneticKey(col("t")).as("k"))
    val right = AddressFixture.rightAll(spark, sf0001)
      .withColumn("t", Normalizer.normalizeAddress(col("address")))
      .select(col("id"), BlockKeys.phoneticKey(col("t")).as("k"))
    // gold pair (i, r<i>/s<i>): how many land in the same phonetic block?
    val hits = left.join(right, "k")
      .filter(right("id") === concat(lit("r"), left("id")) ||
        right("id") === concat(lit("s"), left("id")))
      .select(left("id"), right("id")).distinct().count()
    val gold = 2 * left.count()
    info(s"phonetic block recall: $hits / $gold")
    assert(hits >= (gold * 0.8).toLong,
      s"phonetic blocking recall ${hits.toDouble / gold} too low")
    // and it actually partitions: more than a handful of distinct keys
    val nKeys = left.select("k").distinct().count()
    info(s"distinct phonetic keys on left: $nKeys")
    assert(nKeys > 3)
  }
}
