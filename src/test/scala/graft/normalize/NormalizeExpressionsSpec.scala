package graft.normalize

import graft.SparkSpec
import org.apache.spark.sql.functions._
import org.scalacheck.{Gen, Prop}

/** The fused normalize expressions must be BIT-IDENTICAL to the Column
  * regex chains they replace — every declared query hash (t_conv_norm,
  * a_left_norm, the whole match family) rides on it. Strategy: evaluate
  * both formulations in one Spark projection over adversarial and
  * random inputs and require equality row by row, so the comparison is
  * against Spark's actual lower/regexp_replace semantics, not a
  * re-implementation. */
class NormalizeExpressionsSpec extends SparkSpec {

  private def assertParity(inputs: Seq[String],
      fused: org.apache.spark.sql.Column => org.apache.spark.sql.Column,
      chain: org.apache.spark.sql.Column => org.apache.spark.sql.Column): Unit = {
    import spark.implicits._
    val rows = inputs.toDF("s")
      .select(col("s"), fused(col("s")).as("fused"), chain(col("s")).as("chain"))
      .collect()
    rows.foreach { r =>
      assert(r.getString(1) == r.getString(2),
        s"input=${r.getString(0)} fused=${r.getString(1)} chain=${r.getString(2)}")
    }
  }

  /** The order-sensitive and boundary cases reasoned about in
    * NormalizeOps' scaladoc — each one pinned. */
  private val graftAdversarial = Seq(
    "", " ", ".", "...", "_", "__a__b__",
    "mrg", "mrg.", "mrg..", "mrg.x", "MRG.WND", "xmrg", "mrg5", "mrg_",
    "mrg.wnd",        // pass-1 dot consumption glues wnd -> no expansion
    "cust.mrg",       // mrg expanded in pass 1 BEFORE cust consumes the dot
    "cust.cust",      // same-key adjacency: both expand
    "mrg.mrg.wnd",    // chain: both mrg expand, wnd glued
    "wnd.mrg.wnd",    // mixed order: window + merge + glued wnd
    "strm.cust",      // later key glued by earlier replacement
    "mrg. wnd",       // dot consumed but space separates: wnd expands
    "mrg..wnd",       // only ONE dot consumed: wnd keeps its boundary
    "d 5 k 2 no:12",
    "the mrg. of strm and wnd for cust.",
    "  leading and trailing  ", "a,b;c:d.e", "tab\tsep", "line\nbreak",
    "über mrg. straße",              // non-ASCII -> fallback path
    "mrg. çğı wnd",                  // fallback with abbrevs present
    "MiXeD CaSe MRG. And WND")

  test("TextNormalize equals the 6-regex chain on adversarial cases") {
    assertParity(graftAdversarial,
      Normalizer.normalize, Normalizer.normalizeColumnChain)
  }

  test("TextNormalize equals the chain on random strings (property)") {
    val chars = Gen.frequency(
      (8, Gen.oneOf("abcdefgmrwnstcu".toSeq)),
      (3, Gen.oneOf(" ._,;:/".toSeq)),
      (2, Gen.oneOf("0123456789".toSeq)),
      (2, Gen.oneOf("MRGWNDSTRMCUST".toSeq)),
      (1, Gen.oneOf("çğıüöé€".toSeq)))
    val word = Gen.oneOf("mrg", "wnd", "strm", "cust", "mrg.", "wnd.",
      "strm.", "cust.", ".", " ", "x", "_", "the")
    val composed = Gen.listOf(word).map(_.mkString(""))
    val random = Gen.chooseNum(0, 120).flatMap(n => Gen.stringOfN(n, chars))
    val str = Gen.oneOf(composed, random)
    val batch = Gen.listOfN(50, str)
    val p = Prop.forAll(batch) { ss: List[String] =>
      assertParity(ss, Normalizer.normalize, Normalizer.normalizeColumnChain)
      true
    }
    val res = org.scalacheck.Test.check(
      org.scalacheck.Test.Parameters.default.withMinSuccessfulTests(40), p)
    assert(res.passed, res.status.toString)
  }

  private val addrAdversarial = Seq(
    "", " ", "/", "a/b", "1/2", "a/1", "1/b", "a/b/c", "//a", "a//b",
    "mah.", "mah", "mh", "mahallesi", "sokagi", "yildiz mah. 850 sk. no:12 d:3 k:2 kadikoy/istanbul",
    "d 5", "d  5", "d 5d 6", "k 2", "xk 2", "K 2", "D:3", "no:12.",
    "a.b,c:d;e", "a..", "..a", "bulv blv apt", "cad cd caddesi",
    "sok sk sokak", "UPPER MAH. SK.", "tab\there", "d\t5",
    "çankaya mah. ışık sk.",          // non-ASCII -> fallback
    "  spaces   everywhere  ", "a-b_c", "12/3 kat 5")

  test("AddressNormalize equals the 16-regex chain on adversarial cases") {
    assertParity(addrAdversarial,
      Normalizer.normalizeAddress, Normalizer.normalizeAddressColumnChain)
  }

  test("AddressNormalize equals the chain on random strings (property)") {
    val word = Gen.oneOf("mah", "mh", "mahallesi", "cad", "cd", "sk", "sok",
      "bulv", "apt", "d", "k", "no", ".", ":", "/", " ", "12", "3", "x", "_")
    val composed = Gen.listOf(word).map(_.mkString(""))
    val chars = Gen.frequency(
      (8, Gen.oneOf("abcdhkmnos".toSeq)),
      (4, Gen.oneOf(" ./:,;".toSeq)),
      (2, Gen.oneOf("0123456789".toSeq)),
      (1, Gen.oneOf("ÇĞIŞçğış".toSeq)))
    val random = Gen.chooseNum(0, 100).flatMap(n => Gen.stringOfN(n, chars))
    val str = Gen.oneOf(composed, random)
    val batch = Gen.listOfN(50, str)
    val p = Prop.forAll(batch) { ss: List[String] =>
      assertParity(ss, Normalizer.normalizeAddress,
        Normalizer.normalizeAddressColumnChain)
      true
    }
    val res = org.scalacheck.Test.check(
      org.scalacheck.Test.Parameters.default.withMinSuccessfulTests(40), p)
    assert(res.passed, res.status.toString)
  }

  test("fused expressions preserve null semantics") {
    import spark.implicits._
    val rows = Seq[Option[String]](None, Some("mrg."), Some("mah."))
      .toDF("s")
      .select(
        Normalizer.normalize(col("s")).as("g"),
        Normalizer.normalizeAddress(col("s")).as("a"))
      .collect()
    assert(rows(0).isNullAt(0) && rows(0).isNullAt(1))
    assert(rows(1).getString(0) == "merge")
    assert(rows(2).getString(1) == "mahalle")
  }
}
