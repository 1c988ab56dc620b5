package graft.similarity

import graft.SparkSpec
import org.apache.spark.sql.functions._
import org.scalacheck.{Gen, Prop}

/** The fused per-row prep expressions (digit runs, sorted token set)
  * must match their Column formulations element for element — they
  * feed every matcher score. */
class RowPrepExpressionsSpec extends SparkSpec {

  private def assertParity(inputs: Seq[String]): Unit = {
    import spark.implicits._
    val rows = inputs.toDF("s")
      .select(col("s"),
        graft.similarity.Scores.digitRuns(col("s")).as("dr_fused"),
        graft.similarity.Scores.digitRunsColumn(col("s")).as("dr_chain"),
        FuzzFunctions.sortedTokenSet(col("s")).as("ts_fused"),
        FuzzFunctions.sortedTokenSetColumns(col("s")).as("ts_chain"))
      .collect()
    rows.foreach { r =>
      assert(r.getSeq[String](1) == r.getSeq[String](2),
        s"digitRuns(${r.getString(0)}): ${r.getSeq[String](1)} vs ${r.getSeq[String](2)}")
      assert(r.getSeq[String](3) == r.getSeq[String](4),
        s"sortedTokenSet(${r.getString(0)}): ${r.getSeq[String](3)} vs ${r.getSeq[String](4)}")
    }
  }

  test("fused digitRuns / sortedTokenSet equal the Column chains (pinned)") {
    assertParity(Seq(
      "", " ", "12", "a12b34", "007", "1 2  3\t4\n5", "no12 d3 k2",
      "ascii and 42 numbers 42 007 42",   // duplicate tokens collapse
      "zz aa zz aa",                       // sort order
      "çğı 12 über 34",                    // multi-byte around digits
      "tab\ttokens\nnewlinevt\ffeed\rcr",
      "  leading", "trailing  ", "a", "0", "ıİiI"))
  }

  test("fused digitRuns / sortedTokenSet equal the Column chains (property)") {
    val chars = Gen.frequency(
      (6, Gen.oneOf("abcz".toSeq)),
      (4, Gen.oneOf("0123456789".toSeq)),
      (3, Gen.oneOf(" \t\n".toSeq)),
      (1, Gen.oneOf("çğüé".toSeq)))
    val str = Gen.chooseNum(0, 80).flatMap(n => Gen.stringOfN(n, chars))
    val batch = Gen.listOfN(60, str)
    val p = Prop.forAll(batch) { ss: List[String] => assertParity(ss); true }
    val res = org.scalacheck.Test.check(
      org.scalacheck.Test.Parameters.default.withMinSuccessfulTests(40), p)
    assert(res.passed, res.status.toString)
  }

  test("spaceOnly token set equals the membership aggregation formulation") {
    import spark.implicits._
    val inputs = Seq("", " ", "a b a", "zz aa  zz", "tab\tkeeps together",
      "çğ ü é", "x", "a  b   c", " lead trail ")
    val spaceSet = (c: org.apache.spark.sql.Column) =>
      org.apache.spark.sql.GraftShim.column(SortedTokenSet(
        org.apache.spark.sql.GraftShim.expression(c), spaceOnly = true))
    val chain = (c: org.apache.spark.sql.Column) =>
      array_sort(array_distinct(filter(split(c, " "), t => t =!= "")))
    val rows = inputs.toDF("s")
      .select(col("s"), spaceSet(col("s")).as("f"), chain(col("s")).as("c"))
      .collect()
    rows.foreach { r =>
      assert(r.getSeq[String](1) == r.getSeq[String](2), s"input='${r.getString(0)}'")
    }
  }

  test("null semantics") {
    import spark.implicits._
    val r = Seq[Option[String]](None).toDF("s")
      .select(graft.similarity.Scores.digitRuns(col("s")),
        FuzzFunctions.sortedTokenSet(col("s")))
      .collect()(0)
    assert(r.isNullAt(0) && r.isNullAt(1))
  }
}
